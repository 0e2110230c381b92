"""RDS serialization + bn.fit ingestion (benchmarking/rds.py).

No R interop exists in this image (the reference needs rds2py/pyreadr),
so correctness is pinned by (a) byte-level reading of hand-authored
R-serialization streams, (b) writer/reader round-trips over the SEXP
subset bn.fit uses, and (c) semantic equivalence: a DiscreteBN exported
via ``bnfit_bytes`` and re-ingested via ``read_bnfit`` must produce the
identical network — and its exact posteriors must match.
"""

import gzip
import struct

import numpy as np
import pytest

from benchmarking.exact import exact_posterior
from benchmarking.midsize import insurance
from benchmarking.networks import asia
from benchmarking.rds import (
    RDSReadError,
    RObj,
    bnfit_bytes,
    read_bnfit,
    read_rds,
    write_rds,
)


def test_roundtrip_scalars_and_vectors():
    payload = {
        "ints": np.arange(5, dtype=np.int64),
        "reals": np.linspace(0, 1, 4),
        "strings": ["a", "bc", "def"],
        "flag": np.asarray([True, False]),
        "nested": {"x": np.asarray([1.5]), "y": ["z"]},
        "matrix": np.arange(6, dtype=np.float64).reshape(2, 3),
    }
    obj = read_rds(write_rds(payload))
    assert obj.names == list(payload)
    np.testing.assert_array_equal(obj["ints"].value, payload["ints"])
    np.testing.assert_allclose(obj["reals"].value, payload["reals"])
    assert obj["strings"].value == payload["strings"]
    assert obj["flag"].value == [True, False]
    assert obj["nested"]["y"].value == ["z"]
    m = obj["matrix"]
    assert list(m.attr("dim")) == [2, 3]
    np.testing.assert_allclose(
        np.asarray(m.value).reshape(2, 3, order="F"), payload["matrix"]
    )
    # uncompressed payloads parse too
    obj2 = read_rds(write_rds(payload, compress=False))
    assert obj2.names == list(payload)


def test_reads_version3_header_and_altrep_compact_seq():
    """Hand-authored stream: v3 header + ALTREP compact_intseq (what
    R >= 3.5 writes for 1:n) must decode to the materialized range."""
    out = bytearray()
    out += b"X\n"
    out += struct.pack(">i", 3)  # version 3
    out += struct.pack(">i", 0x040100)
    out += struct.pack(">i", 0x030500)
    enc = b"UTF-8"
    out += struct.pack(">i", len(enc)) + enc
    # ALTREP: info pairlist (tag-less) carrying the class symbol chain
    out += struct.pack(">i", 238)  # ALTREP_SXP
    out += struct.pack(">i", 2 | 0x400)  # LISTSXP with tag
    out += struct.pack(">i", 1)  # SYMSXP (tag)
    out += struct.pack(">i", 9)  # CHARSXP
    name = b"compact_intseq"
    out += struct.pack(">i", len(name)) + name
    out += struct.pack(">i", 1)  # car: SYMSXP
    out += struct.pack(">i", 9)
    out += struct.pack(">i", len(name)) + name
    out += struct.pack(">i", 254)  # cdr: NILVALUE
    # state: REALSXP [n, start, step]
    out += struct.pack(">i", 14)
    out += struct.pack(">i", 3)
    for v in (4.0, 2.0, 1.0):
        out += struct.pack(">d", v)
    out += struct.pack(">i", 254)  # fos/attr slot: NIL
    obj = read_rds(gzip.compress(bytes(out)))
    np.testing.assert_array_equal(obj.value, [2, 3, 4, 5])


def test_rejects_non_xdr_and_truncation():
    with pytest.raises(RDSReadError):
        read_rds(b"A\n" + b"\x00" * 16)
    good = write_rds({"x": np.asarray([1.0])}, compress=False)
    with pytest.raises(RDSReadError):
        read_rds(good[: len(good) - 3])


@pytest.mark.parametrize("mk", [asia, insurance])
def test_bnfit_export_import_identity(mk):
    bn = mk()
    bn2 = read_bnfit(bnfit_bytes(bn), name=bn.name)
    assert bn2.nodes == bn.nodes  # same topological order
    for node in bn.nodes:
        assert bn2.parents[node] == bn.parents[node]
        assert bn2.states[node] == bn.states[node]
        np.testing.assert_allclose(
            bn2.cpts[node], bn.cpts[node], atol=1e-12
        )
    # semantics: exact posteriors agree
    tgt = bn.nodes[-1]
    ev = {bn.nodes[0]: 1 % bn.card(bn.nodes[0])}
    np.testing.assert_allclose(
        exact_posterior(bn2, tgt, ev), exact_posterior(bn, tgt, ev),
        atol=1e-12,
    )


def test_bnfit_gaussian_ingestion():
    """Gaussian bn.fit (coefficients/sd) -> GaussianBN."""
    fit = {
        "x": {
            "node": "x",
            "parents": RObj(16, []),
            "children": ["y"],
            "coefficients": RObj(
                14, np.asarray([0.5]),
                attributes={"names": RObj(16, ["(Intercept)"])},
            ),
            "sd": np.asarray([1.0]),
        },
        "y": {
            "node": "y",
            "parents": ["x"],
            "children": RObj(16, []),
            "coefficients": RObj(
                14, np.asarray([-0.2, 0.8]),
                attributes={"names": RObj(16, ["(Intercept)", "x"])},
            ),
            "sd": np.asarray([0.3]),
        },
    }
    # write with the bn.fit class attribute like R would
    from benchmarking.rds import _Writer

    w = _Writer()
    w.header()
    w.item(fit, attributes={"class": ["bn.fit", "bn.fit.gnet"]})
    gbn = read_bnfit(gzip.compress(w.out.getvalue()), name="g")
    assert gbn.nodes == ["x", "y"]
    assert gbn.parents["y"] == ["x"]
    assert gbn.bias["y"] == pytest.approx(-0.2)
    assert gbn.weights["y"] == [pytest.approx(0.8)]
    assert gbn.sigma["y"] == pytest.approx(0.3)


def test_rds_dir_source(tmp_path):
    """End-to-end: an .rds bn.fit dropped in a directory is acquirable
    as a benchmark network source (stage-I parity for the RDS artifact
    class)."""
    from benchmarking.networks import acquire
    from benchmarking.rds import bnfit_bytes

    bn = asia()
    (tmp_path / "asia.rds").write_bytes(bnfit_bytes(bn))
    nets = acquire("rds_dir", path=str(tmp_path))
    assert len(nets) == 1 and nets[0].nodes == bn.nodes
    np.testing.assert_allclose(
        nets[0].cpts["dysp"], bn.cpts["dysp"], atol=1e-12
    )


def test_bnfit_clgaussian_roundtrip():
    """clgaussian bn.fit (cgnet: dnode CPTs + cgnode per-config
    coefficient matrices) -> CLGaussianBN, via the exporter inverse."""
    from benchmarking.clg_bn import random_clgaussian
    from benchmarking.rds import clg_bnfit_bytes, read_bnfit

    clg = random_clgaussian(10, seed=3)
    clg2 = read_bnfit(clg_bnfit_bytes(clg), name=clg.name)
    assert clg2.kind == "clgaussian"
    assert set(clg2.nodes) == set(clg.nodes)
    for node in clg.nodes:
        assert clg2.parents[node] == clg.parents[node]
        assert clg2.types[node] == clg.types[node]
        if clg.types[node] == "discrete":
            np.testing.assert_allclose(
                clg2.cpts[node], clg.cpts[node], atol=1e-12
            )
        else:
            np.testing.assert_allclose(
                clg2.bias[node], clg.bias[node], atol=1e-12
            )
            np.testing.assert_allclose(
                clg2.weights[node], clg.weights[node], atol=1e-12
            )
            np.testing.assert_allclose(
                clg2.sigma[node], clg.sigma[node], atol=1e-12
            )
    # semantics: exact posteriors agree for a discrete and a continuous
    # target with mixed evidence
    disc = [n for n in clg.nodes if clg.types[n] == "discrete"]
    cont = [n for n in clg.nodes if clg.types[n] == "continuous"]
    ev = {disc[0]: 0, cont[0]: 0.3}
    for tgt in (disc[-1], cont[-1]):
        if tgt in ev:
            continue
        a = clg.posterior(tgt, ev)
        b = clg2.posterior(tgt, ev)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=1e-10)


def test_bnfit_cgnode_expand_grid_order():
    """The R expand.grid config order (FIRST discrete parent varies
    fastest) maps onto regime_index (first parent most significant)."""
    from benchmarking.clg_bn import CLGaussianBN
    from benchmarking.rds import clg_bnfit_bytes, read_bnfit

    clg = CLGaussianBN(name="t")
    clg.nodes = ["a", "b", "y"]
    clg.types = {"a": "discrete", "b": "discrete", "y": "continuous"}
    clg.parents = {"a": [], "b": [], "y": ["a", "b"]}
    clg.cards = {"a": 2, "b": 3}
    clg.cpts = {
        "a": [0.4, 0.6],
        "b": [0.2, 0.3, 0.5],
    }
    # bias encodes the regime id so any shuffle is detectable
    clg.bias = {"y": [float(10 * r) for r in range(6)]}
    clg.weights = {"y": [[] for _ in range(6)]}
    clg.sigma = {"y": [1.0 + 0.1 * r for r in range(6)]}
    clg2 = read_bnfit(clg_bnfit_bytes(clg), name="t")
    assert clg2.bias["y"] == clg.bias["y"]
    assert clg2.sigma["y"] == clg.sigma["y"]


def test_rds_dir_clgaussian_pipeline(tmp_path):
    """End-to-end clgaussian RDS ingestion: a cgnet .rds dropped in a
    directory flows through the FULL pipeline (networks -> clg query
    gen + exact ground truth -> data gen -> run -> report) — the last
    bn.fit format class (round-4 roadmap #4)."""
    import json

    from benchmarking.bundles import BenchmarkBundleSpec
    from benchmarking.clg_bn import random_clgaussian
    from benchmarking.pipeline import run_pipeline
    from benchmarking.rds import clg_bnfit_bytes

    clg = random_clgaussian(6, seed=2)
    (tmp_path / "toy_clg.rds").write_bytes(clg_bnfit_bytes(clg))
    spec = BenchmarkBundleSpec(
        mode="inference",
        source="rds_dir",
        source_kwargs={"path": str(tmp_path)},
        n_queries=6,
        n_rows=512,
        seed=0,
    )
    bundle = run_pipeline(
        str(tmp_path / "out"), ["vbn_clg_gnn_lw_dyn"], spec
    )
    res_dir = bundle.dir("results", "toy_clg")
    import os

    files = [f for f in os.listdir(res_dir) if f.endswith(".jsonl")]
    assert files, "no result records written"
    ok = 0
    with open(os.path.join(res_dir, files[0])) as f:
        for line in f:
            rec = json.loads(line)
            assert rec["result"]["ok"], rec
            ok += 1
    assert ok >= 6
