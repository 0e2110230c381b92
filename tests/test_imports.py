"""Import hygiene (parity: reference tests/test_imports.py, test_import_local.py)."""

import importlib
import pkgutil

import vectorizedbayesiannetwork_tpu as vt


def test_all_submodules_import():
    failures = []
    for mod in pkgutil.walk_packages(
        vt.__path__, prefix="vectorizedbayesiannetwork_tpu."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # noqa: BLE001
            failures.append((mod.name, repr(exc)))
    assert not failures, failures


def test_public_exports():
    for name in vt.__all__:
        assert hasattr(vt, name), name


def test_registries_complete():
    assert set(vt.CPD_REGISTRY) == {
        "linear_gaussian", "gaussian_nn", "mdn", "rff_gaussian", "kde",
        "softmax_nn", "categorical_table", "categorical_embedded_softmax",
    }
    assert set(vt.INFERENCE_REGISTRY) == {
        "monte_carlo_marginalization", "importance_sampling",
        "likelihood_weighting", "resampled_importance_sampling", "lbp",
        "gaussian_exact", "categorical_exact",
        "rao_blackwellized_marginalization", "amortized",
    }
    assert set(vt.SAMPLING_REGISTRY) == {"ancestral", "gibbs", "hmc", "nuts"}
    assert set(vt.UPDATE_REGISTRY) == {
        "streaming_stats", "online_sgd", "ema", "replay_buffer",
    }
    assert set(vt.LEARNING_REGISTRY) == {"node_wise", "amortized"}


def test_benchmarking_imports():
    for name in [
        "benchmarking.bif", "benchmarking.exact", "benchmarking.networks",
        "benchmarking.query_gen", "benchmarking.data_gen",
        "benchmarking.runner", "benchmarking.report", "benchmarking.metrics",
        "benchmarking.errors", "benchmarking.pipeline",
        "benchmarking.models", "benchmarking.scripts.bench_cli",
        "stress_test.run",
    ]:
        importlib.import_module(name)


def test_amortized_is_real():
    # The reference stubs amortized learning with NotImplementedError
    # (vbn/learning/amortized.py:6-14); here it actually fits — a tiny
    # single-node net must train and produce an amortizer.
    import networkx as nx
    import numpy as np

    from vectorizedbayesiannetwork_tpu import VBN

    g = nx.DiGraph()
    g.add_node("a")
    v = VBN(g, seed=0)
    v.set_learning_method("amortized", epochs=2, batch_size=32)
    v.fit({"a": np.random.default_rng(0).normal(size=(64, 1))})
    assert v.amortized is not None


def test_temporal_dag_placeholders():
    import pytest

    with pytest.raises(NotImplementedError):
        vt.TemporalDAG()
    with pytest.raises(NotImplementedError):
        vt.DynamicDAG()
