"""Sharded serving on a ('data','particle') device mesh.

One switch — ``vbn.set_mesh(make_mesh(...))`` — shards every serving
path: query-batch rows over the 'data' axis, particles over 'particle'.
The fused Pallas sweep runs per shard under ``jax.shard_map`` with
independent seed folds, and the in-kernel posterior reductions combine
across particle shards with a pmax/psum pair (SURVEY.md §5.8 reduction
points). The reference has no distributed backend at all (SURVEY.md §2).

Off-TPU this demo forces the interpret-mode kernel on a virtual CPU
mesh (the same trick the test suite and the multichip dryrun use); on a
real pod slice the identical code spans chips over ICI.
"""

import os

# Virtual 8-device CPU mesh by default (single-chip hosts). On a real
# pod slice run with VBN_DEMO_REAL_MESH=1 to use the actual devices.
if not os.environ.get("VBN_DEMO_REAL_MESH"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    os.environ.setdefault("VBN_FUSED_SWEEP", "always")

import numpy as np

from _common import print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults
from vectorizedbayesiannetwork_tpu.parallel.mesh import make_mesh


def main() -> None:
    print_env_header("10_sharded_serving")
    import jax
    import networkx as nx

    from benchmarking.data_gen import generate_dataset
    from benchmarking.exact import exact_posterior
    from benchmarking.networks import asia

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")
    mesh = make_mesh(n_data=2, devices=devices[:8])
    print(f"mesh: {dict(mesh.shape)}")

    bn = asia()
    data = generate_dataset(bn, 4096, seed=0)
    g = nx.DiGraph()
    g.add_nodes_from(bn.nodes)
    g.add_edges_from(bn.edges())
    vbn = VBN(g, seed=0)
    conf = {}
    for node in bn.nodes:
        c = dict(defaults.cpd("categorical_table"), n_classes=bn.card(node))
        if bn.parents[node]:
            c["parent_n_classes"] = [bn.card(p) for p in bn.parents[node]]
        conf[node] = c
    vbn.set_learning_method("node_wise", nodes_cpds=conf)
    vbn.fit(
        {
            k: np.asarray(v, np.float32).reshape(-1, 1)
            for k, v in data.items()
        }
    )

    vbn.set_mesh(mesh)
    n_part = mesh.shape["particle"]
    s = 4096 * n_part  # particles shard over the 'particle' axis
    b = 2 * mesh.shape["data"]  # rows shard over the 'data' axis
    vbn.set_inference_method("likelihood_weighting", n_samples=s)
    ev = {
        "smoke": np.ones((b, 1), np.float32),
        "asia": np.zeros((b, 1), np.float32),
    }
    out = vbn.infer_posterior_pmf(
        [{"target": "dysp", "evidence": ev}], n_classes=2
    )
    assert out is not None, "fused pmf must serve under the mesh"
    pmf, _ = out
    pmf = pmf / pmf.sum(axis=1, keepdims=True)
    exact = exact_posterior(bn, "dysp", {"smoke": 1, "asia": 0})
    print(
        f"p(dysp=1 | smoke=1, asia=0): sharded kernel {pmf[0, 1]:.4f} "
        f"vs exact {float(exact[1]):.4f} "
        f"({s} particles across {n_part} shards)"
    )
    assert abs(pmf[0, 1] - float(exact[1])) < 0.05

    # the stream path shards too: [B, S] weights as P('data','particle')
    w, smp = vbn.infer_posterior({"target": "dysp", "evidence": ev})
    print(f"stream outputs: weights {np.asarray(w).shape}, "
          f"samples {np.asarray(smp).shape}")
    vbn.set_mesh(None)


if __name__ == "__main__":
    main()
