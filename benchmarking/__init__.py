"""Benchmarking suite for the TPU-native VBN framework.

Capability parity with the reference's ``benchmarking/`` application
(SURVEY.md §2.8): a staged pipeline

    I    acquire networks      (benchmarking/networks.py — builtin + random
                                generators; the reference downloads bnlearn
                                BIF archives, which a zero-egress TPU pod
                                cannot, so networks are also loadable from
                                local .bif files)
    II   generate queries      (benchmarking/query_gen.py + exact ground
                                truth via variable elimination)
    III  generate data         (benchmarking/data_gen.py — exact ancestral
                                sampling from the CPTs)
    IIII run benchmark         (benchmarking/runner.py — per problem x model,
                                skeleton-batched inference, JSONL records,
                                streaming timing stats, error taxonomy)
    V    report                (benchmarking/report.py — KL/JS/WS vs ground
                                truth, IQM robust aggregation, markdown)

driven by ``benchmarking/scripts/bench_cli.py`` over versioned bundle
directories (benchmarking/bundles.py).
"""
