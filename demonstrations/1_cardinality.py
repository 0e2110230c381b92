"""CPT parameter count & exact-inference cost vs cardinality.

Analytic complexity demo (parity: demonstrations/1_cardinality.py): for the
reward DAG (state, action) -> reward, how table size and variable-
elimination cost scale with cardinality k, vs the fixed per-particle cost of
the Monte-Carlo path.
"""

def main() -> None:
    print(f"{'k':>6} {'CPT params':>12} {'VE cost':>12} {'MC cost/particle':>18}")
    n_actions = 4
    for k in [10, 50, 200, 1000, 2000]:
        n_rewards = min(k, 50)
        cpt_params = k * n_actions * n_rewards
        ve_cost = k * n_actions * n_rewards  # single elimination here
        mc_cost = 3  # one categorical draw per node, independent of k on TPU
        print(f"{k:>6} {cpt_params:>12} {ve_cost:>12} {mc_cost:>18}")
    print("\nMC marginalization cost per particle is O(nodes), independent of"
          " cardinality;\nexact methods grow with the CPT size (see"
          " stress_test/run.py for measured curves).")


if __name__ == "__main__":
    main()
