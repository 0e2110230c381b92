"""Prediction vs diagnosis on a discrete net with exact CPT comparison
(parity: examples/06_prediction_vs_diagnosis.py:75-205)."""

import numpy as np

from _common import make_discrete_df, make_discrete_graph, print_env_header

from vectorizedbayesiannetwork_tpu import VBN, defaults


def exact_cpt(df):
    """Hand-rolled exact conditional p(c | a, b) from the generative law."""
    # c = (a + 2b + Bernoulli(0.5)) % 4
    cpt = np.zeros((3, 2, 4))
    for a in range(3):
        for b in range(2):
            for noise in (0, 1):
                cpt[a, b, (a + 2 * b + noise) % 4] += 0.5
    return cpt


def main() -> None:
    print_env_header("06_prediction_vs_diagnosis")
    df = make_discrete_df(5000)
    vbn = VBN(make_discrete_graph(), seed=0)
    vbn.set_learning_method(
        "node_wise",
        nodes_cpds={
            "a": {**defaults.cpd("categorical_table"), "n_classes": 3},
            "b": {**defaults.cpd("categorical_table"), "n_classes": 2},
            "c": {**defaults.cpd("categorical_table"), "n_classes": 4,
                  "parent_n_classes": [3, 2]},
        },
    )
    vbn.fit(df)
    cpt = exact_cpt(df)

    # PREDICTION: p(c | a=1, b=1) -- evidence upstream of target
    vbn.set_inference_method("categorical_exact")
    probs, support = vbn.infer_posterior(
        {"target": "c", "evidence": {"a": [[1.0]], "b": [[1.0]]}}
    )
    print("prediction p(c|a=1,b=1) learned:", np.round(np.asarray(probs)[0], 3))
    print("prediction p(c|a=1,b=1) exact:  ", cpt[1, 1])

    # DIAGNOSIS: p(a | c=3) -- evidence downstream of target
    vbn.set_inference_method("likelihood_weighting", n_samples=4096)
    w, s = vbn.infer_posterior({"target": "a", "evidence": {"c": [[3.0]]}})
    w, s = np.asarray(w), np.asarray(s)[..., 0].astype(int)
    pmf = np.zeros(3)
    for k in range(3):
        pmf[k] = w[0, s[0] == k].sum()
    pmf /= pmf.sum()
    # exact diagnosis via Bayes over the known CPT and uniform-ish priors
    pa = np.bincount(df["a"].astype(int), minlength=3) / len(df)
    pb = np.bincount(df["b"].astype(int), minlength=2) / len(df)
    joint = (
        pa[:, None] * pb[None, :] * cpt[:, :, 3]
    )
    exact = joint.sum(axis=1) / joint.sum()
    print("diagnosis p(a|c=3) learned:", np.round(pmf, 3))
    print("diagnosis p(a|c=3) exact:  ", np.round(exact, 3))


if __name__ == "__main__":
    main()
