"""Checkpoint save/load roundtrip (parity: examples/05_save_load.py)."""

import tempfile

import numpy as np

from _common import make_linear_df, make_linear_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    print_env_header("05_save_load")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={k: defaults.cpd("linear_gaussian") for k in ["x0", "x1", "x2"]},
    )
    vbn.fit(make_linear_df())
    vbn.set_inference_method("likelihood_weighting", n_samples=256)
    vbn.set_sampling_method("ancestral")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/model"
        vbn.save(path)
        vbn2 = VBN.load(path)
        q = {"target": "x2", "evidence": {"x0": [[0.3]], "x1": [[-0.2]]}}
        pdf, s = vbn2.infer_posterior(q)
        print("reloaded model posterior mean:",
              float(np.mean(np.asarray(s))))
        for node in vbn.dag.nodes():
            a = np.asarray(vbn.params[node]["bias"])
            b = np.asarray(vbn2.params[node]["bias"])
            assert np.allclose(a, b)
        print("parameters identical after roundtrip: True")


if __name__ == "__main__":
    main()
