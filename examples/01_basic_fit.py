"""Basic fit: heterogeneous CPDs on a 3-node DAG (parity: examples/01_basic_fit.py)."""

from _common import make_linear_df, make_linear_graph, print_env_header, seed_all

from vectorizedbayesiannetwork_tpu import VBN, defaults


def main() -> None:
    seed_all(0)
    print_env_header("01_basic_fit")
    vbn = VBN(make_linear_graph(), seed=0)
    vbn.set_learning_method(
        defaults.learning("node_wise"),
        nodes_cpds={
            "x0": defaults.cpd("gaussian_nn"),
            "x1": defaults.cpd("gaussian_nn"),
            "x2": {**defaults.cpd("mdn"), "n_components": 3},
        },
    )
    vbn.fit(make_linear_df())
    for node in ["x0", "x1", "x2"]:
        print(node, vbn.get_cpd(node).summary())


if __name__ == "__main__":
    main()
