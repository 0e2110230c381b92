"""Network acquisition: builtin classics, random generators, local BIF files.

Stage-I analogue of the reference's bnlearn downloader
(``benchmarking/I_data_download``). The reference fetches 31 networks from
bnlearn.com (``metadata/bnlearn.json``); a zero-egress TPU pod cannot, so
this stage provides:
  * builtin textbook networks (sprinkler, cancer, asia-style chains) whose
    structures/CPTs are standard textbook material;
  * a seeded random discrete-network generator with controllable node
    count, max in-degree and cardinality (covers the benchmark's
    5..1041-node scaling axis);
  * a loader for any locally provided ``.bif``/``.bif.gz`` files.

A registry keyed by source name mirrors ``I_data_download/registry.py``.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

from .bif import DiscreteBN, load_bif

DOWNLOADER_REGISTRY: Dict[str, Callable] = {}


def register_source(name: str):
    def deco(fn):
        if name in DOWNLOADER_REGISTRY:
            raise KeyError(f"Duplicate network source {name!r}")
        DOWNLOADER_REGISTRY[name] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# Builtin textbook networks
# ---------------------------------------------------------------------------

def sprinkler() -> DiscreteBN:
    """Classic cloudy/sprinkler/rain/wet-grass network."""
    bn = DiscreteBN(name="sprinkler")
    for node in ["cloudy", "sprinkler", "rain", "wet"]:
        bn.nodes.append(node)
        bn.states[node] = ["no", "yes"]
    bn.parents = {
        "cloudy": [],
        "sprinkler": ["cloudy"],
        "rain": ["cloudy"],
        "wet": ["sprinkler", "rain"],
    }
    bn.cpts = {
        "cloudy": np.array([0.5, 0.5]),
        "sprinkler": np.array([[0.5, 0.5], [0.9, 0.1]]),
        "rain": np.array([[0.8, 0.2], [0.2, 0.8]]),
        "wet": np.array(
            [
                [[1.0, 0.0], [0.1, 0.9]],
                [[0.1, 0.9], [0.01, 0.99]],
            ]
        ),
    }
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def cancer() -> DiscreteBN:
    """Pollution/Smoker -> Cancer -> Xray/Dyspnoea (Korb & Nicholson)."""
    bn = DiscreteBN(name="cancer")
    spec = {
        "pollution": (["low", "high"], [], np.array([0.9, 0.1])),
        "smoker": (["false", "true"], [], np.array([0.7, 0.3])),
        "cancer": (
            ["false", "true"],
            ["pollution", "smoker"],
            np.array(
                [[[0.999, 0.001], [0.97, 0.03]], [[0.98, 0.02], [0.95, 0.05]]]
            ),
        ),
        "xray": (
            ["negative", "positive"],
            ["cancer"],
            np.array([[0.8, 0.2], [0.1, 0.9]]),
        ),
        "dyspnoea": (
            ["false", "true"],
            ["cancer"],
            np.array([[0.7, 0.3], [0.35, 0.65]]),
        ),
    }
    for node, (states, parents, cpt) in spec.items():
        bn.nodes.append(node)
        bn.states[node] = states
        bn.parents[node] = parents
        bn.cpts[node] = cpt
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def random_bn(
    n_nodes: int = 10,
    max_indegree: int = 3,
    max_card: int = 3,
    seed: int = 0,
    alpha: float = 0.8,
    name: Optional[str] = None,
) -> DiscreteBN:
    """Seeded random discrete BN with Dirichlet CPTs."""
    rng = np.random.default_rng(seed)
    bn = DiscreteBN(name=name or f"random_{n_nodes}n_s{seed}")
    names = [f"v{i}" for i in range(n_nodes)]
    for i, node in enumerate(names):
        card = int(rng.integers(2, max_card + 1))
        bn.nodes.append(node)
        bn.states[node] = [f"s{k}" for k in range(card)]
        n_par = int(rng.integers(0, min(max_indegree, i) + 1))
        parent_ids = (
            rng.choice(i, size=n_par, replace=False) if n_par else []
        )
        bn.parents[node] = [names[j] for j in sorted(parent_ids)]
    for node in names:
        p_cards = tuple(bn.card(p) for p in bn.parents[node])
        card = bn.card(node)
        cpt = rng.dirichlet([alpha] * card, size=p_cards or (1,))
        bn.cpts[node] = cpt.reshape(p_cards + (card,)) if p_cards else cpt[0]
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def random_bn_treewidth(
    n_nodes: int = 100,
    max_indegree: int = 3,
    max_card: int = 4,
    seed: int = 0,
    alpha: float = 0.8,
    max_clique_states: int = 4096,
    hub_bias: float = 0.35,
    name: Optional[str] = None,
) -> DiscreteBN:
    """Seeded random discrete BN with BOUNDED TREEWIDTH by construction.

    Partial-k-tree wiring: each node's parents are drawn from ONE
    existing clique, so every family (parents + child) is a clique of the
    moralized graph with product-of-cards <= ``max_clique_states``, and
    eliminating nodes in reverse construction order is a PERFECT
    elimination order (no fill-in: when node i is eliminated, all its
    later neighbors are gone and its earlier neighbors already form a
    clique). Consequence: treewidth <= max_indegree regardless of size,
    so exact junction-tree / VE ground truth is tractable at the
    reference suite's link (724n) / munin (1041n) scale — matching the
    real networks, which are jtree-tractable (the reference computes
    their GT by exact inference,
    ``/root/reference/benchmarking/II_query_generation/bnlearn.py:1201-1326``),
    where an unconstrained ``random_bn`` at that size generally is not.

    ``hub_bias`` mixes clique selection between uniform and
    recency-weighted, yielding the hub-plus-chain shape of the real
    link/munin topologies (long causal chains with local fan-in).
    """
    rng = np.random.default_rng(seed)
    bn = DiscreteBN(name=name or f"randomtw_{n_nodes}n_s{seed}")
    names = [f"v{i}" for i in range(n_nodes)]
    cards = [int(rng.integers(2, max_card + 1)) for _ in range(n_nodes)]
    cliques: List[List[int]] = [[0]]
    bn.nodes.append(names[0])
    bn.states[names[0]] = [f"s{k}" for k in range(cards[0])]
    bn.parents[names[0]] = []
    for i in range(1, n_nodes):
        node = names[i]
        bn.nodes.append(node)
        bn.states[node] = [f"s{k}" for k in range(cards[i])]
        n_par = int(rng.integers(0, min(max_indegree, i) + 1))
        parents: List[int] = []
        if n_par > 0:
            if rng.random() < hub_bias:
                ci = len(cliques) - 1 - int(
                    rng.integers(0, min(8, len(cliques)))
                )
            else:
                ci = int(rng.integers(0, len(cliques)))
            base = list(cliques[ci])
            rng.shuffle(base)
            states = cards[i]
            for p in base:
                if len(parents) >= n_par:
                    break
                if states * cards[p] <= max_clique_states:
                    parents.append(p)
                    states *= cards[p]
        bn.parents[node] = [names[j] for j in sorted(parents)]
        cliques.append(sorted(parents) + [i])
    for i, node in enumerate(names):
        p_cards = tuple(cards[j] for j in sorted(
            names.index(p) for p in bn.parents[node]
        ))
        cpt = rng.dirichlet([alpha] * cards[i], size=p_cards or (1,))
        bn.cpts[node] = (
            cpt.reshape(p_cards + (cards[i],)) if p_cards else cpt[0]
        )
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def asia() -> DiscreteBN:
    """Lauritzen & Spiegelhalter's classic 8-node chest-clinic network."""
    bn = DiscreteBN(name="asia")
    spec = {
        "asia": (["yes", "no"], [], np.array([0.01, 0.99])),
        "smoke": (["yes", "no"], [], np.array([0.5, 0.5])),
        "tub": (["yes", "no"], ["asia"],
                np.array([[0.05, 0.95], [0.01, 0.99]])),
        "lung": (["yes", "no"], ["smoke"],
                 np.array([[0.1, 0.9], [0.01, 0.99]])),
        "bronc": (["yes", "no"], ["smoke"],
                  np.array([[0.6, 0.4], [0.3, 0.7]])),
        "either": (["yes", "no"], ["lung", "tub"],
                   np.array([[[1.0, 0.0], [1.0, 0.0]],
                             [[1.0, 0.0], [0.0, 1.0]]])),
        "xray": (["yes", "no"], ["either"],
                 np.array([[0.98, 0.02], [0.05, 0.95]])),
        "dysp": (["yes", "no"], ["bronc", "either"],
                 np.array([[[0.9, 0.1], [0.8, 0.2]],
                           [[0.7, 0.3], [0.1, 0.9]]])),
    }
    for node, (states, parents, cpt) in spec.items():
        bn.nodes.append(node)
        bn.states[node] = states
        bn.parents[node] = parents
        bn.cpts[node] = cpt
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def earthquake() -> DiscreteBN:
    """Russell & Norvig's burglary/earthquake alarm network (bnlearn's
    'earthquake'): B, E -> Alarm -> JohnCalls, MaryCalls. Canonical CPTs
    from AIMA §14 (the same parameterization bnlearn distributes)."""
    bn = DiscreteBN(name="earthquake")
    spec = {
        "burglary": (["true", "false"], [], np.array([0.01, 0.99])),
        "earthquake": (["true", "false"], [], np.array([0.02, 0.98])),
        "alarm": (
            ["true", "false"],
            ["burglary", "earthquake"],
            np.array(
                [
                    [[0.95, 0.05], [0.94, 0.06]],
                    [[0.29, 0.71], [0.001, 0.999]],
                ]
            ),
        ),
        "johncalls": (
            ["true", "false"],
            ["alarm"],
            np.array([[0.90, 0.10], [0.05, 0.95]]),
        ),
        "marycalls": (
            ["true", "false"],
            ["alarm"],
            np.array([[0.70, 0.30], [0.01, 0.99]]),
        ),
    }
    for node, (states, parents, cpt) in spec.items():
        bn.nodes.append(node)
        bn.states[node] = states
        bn.parents[node] = parents
        bn.cpts[node] = cpt
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def survey() -> DiscreteBN:
    """Scutari's 6-node 'survey' network (Bayesian Networks with Examples
    in R, ch. 1): Age, Sex -> Education -> Occupation, Residence ->
    Travel. Canonical structure; CPT values follow the book's
    parameterization (ground truth is computed from THIS encoding, so the
    benchmark is self-consistent regardless of rounding)."""
    bn = DiscreteBN(name="survey")
    spec = {
        "age": (["young", "adult", "old"], [], np.array([0.30, 0.50, 0.20])),
        "sex": (["m", "f"], [], np.array([0.60, 0.40])),
        "education": (
            ["high", "uni"],
            ["age", "sex"],
            np.array(
                [
                    [[0.75, 0.25], [0.64, 0.36]],
                    [[0.72, 0.28], [0.70, 0.30]],
                    [[0.88, 0.12], [0.90, 0.10]],
                ]
            ),
        ),
        "occupation": (
            ["emp", "self"],
            ["education"],
            np.array([[0.96, 0.04], [0.92, 0.08]]),
        ),
        "residence": (
            ["small", "big"],
            ["education"],
            np.array([[0.25, 0.75], [0.20, 0.80]]),
        ),
        "travel": (
            ["car", "train", "other"],
            ["occupation", "residence"],
            np.array(
                [
                    [[0.48, 0.42, 0.10], [0.58, 0.24, 0.18]],
                    [[0.56, 0.36, 0.08], [0.70, 0.21, 0.09]],
                ]
            ),
        ),
    }
    for node, (states, parents, cpt) in spec.items():
        bn.nodes.append(node)
        bn.states[node] = states
        bn.parents[node] = parents
        bn.cpts[node] = cpt
    bn.nodes = bn.topological_order()
    bn.validate()
    return bn


def _midsize(name):
    def make():
        from .midsize import alarm, insurance

        return {"insurance": insurance, "alarm": alarm}[name]()

    return make


def _large(name):
    def make():
        from .large_discrete import hailfinder, hepar2, win95pts

        return {
            "hailfinder": hailfinder,
            "hepar2": hepar2,
            "win95pts": win95pts,
        }[name]()

    return make


def _highcard(name):
    def make():
        from .highcard import barley, mildew, pathfinder

        return {
            "barley": barley,
            "mildew": mildew,
            "pathfinder": pathfinder,
        }[name]()

    return make


BUILTIN_NETWORKS: Dict[str, Callable[[], DiscreteBN]] = {
    "sprinkler": sprinkler,
    "cancer": cancer,
    "asia": asia,
    "earthquake": earthquake,
    "survey": survey,
    # canonical mid-size structures, seeded CPTs (see midsize.py)
    "insurance": _midsize("insurance"),
    "alarm": _midsize("alarm"),
    # large discrete regime, seeded CPTs (see large_discrete.py for
    # per-network structure provenance)
    "hailfinder": _large("hailfinder"),
    "hepar2": _large("hepar2"),
    "win95pts": _large("win95pts"),
    # high-cardinality regime, cards up to 100 (see highcard.py)
    "barley": _highcard("barley"),
    "mildew": _highcard("mildew"),
    "pathfinder": _highcard("pathfinder"),
}

# Remaining named discrete corpus members (seeded reconstructions with
# exact-GT-tractable wiring; see corpus.py for per-network provenance).


def _corpus(name):
    def make():
        from .corpus import CORPUS

        return CORPUS[name]()

    return make


for _name in (
    "sachs", "child", "water", "munin_sub1", "andes", "pigs", "diabetes"
):
    BUILTIN_NETWORKS[_name] = _corpus(_name)


@register_source("builtin")
def acquire_builtin(names: Optional[List[str]] = None, **_kw) -> List[DiscreteBN]:
    names = names or sorted(BUILTIN_NETWORKS)
    return [BUILTIN_NETWORKS[n]() for n in names]


@register_source("random")
def acquire_random(
    sizes: Optional[List[int]] = None, seed: int = 0, max_card: int = 3, **_kw
) -> List[DiscreteBN]:
    sizes = sizes or [5, 10, 20]
    return [
        random_bn(n, seed=seed + i, max_card=max_card)
        for i, n in enumerate(sizes)
    ]


@register_source("random_tw")
def acquire_random_tw(
    sizes: Optional[List[int]] = None,
    seed: int = 0,
    max_card: int = 4,
    max_indegree: int = 3,
    **_kw,
) -> List[DiscreteBN]:
    """Bounded-treewidth link/munin-class networks (exact-GT tractable at
    any size; see ``random_bn_treewidth``)."""
    sizes = sizes or [724, 1041]
    return [
        random_bn_treewidth(
            n, seed=seed + i, max_card=max_card, max_indegree=max_indegree
        )
        for i, n in enumerate(sizes)
    ]


@register_source("random_gaussian")
def acquire_random_gaussian(
    sizes: Optional[List[int]] = None, seed: int = 0, **_kw
):
    """Seeded random linear-Gaussian nets (the reference suite's *gaussian*
    class, ``metadata/bnlearn.json``; see ``gaussian_bn.py``)."""
    from .gaussian_bn import random_gaussian

    sizes = sizes or [8, 16, 32]
    return [random_gaussian(n, seed=seed + i) for i, n in enumerate(sizes)]


@register_source("random_clg")
def acquire_random_clg(
    sizes: Optional[List[int]] = None, seed: int = 0, **_kw
):
    """Seeded random conditional-linear-Gaussian nets (the reference
    suite's *clgaussian* class; see ``clg_bn.py``)."""
    from .clg_bn import random_clgaussian

    sizes = sizes or [8, 16]
    return [random_clgaussian(n, seed=seed + i) for i, n in enumerate(sizes)]


@register_source("bif_dir")
def acquire_bif_dir(path: str = ".", **_kw) -> List[DiscreteBN]:
    """Load all .bif/.bif.gz files from a local directory (e.g. a manually
    provisioned bnlearn mirror)."""
    out = []
    for fname in sorted(os.listdir(path)):
        if fname.endswith((".bif", ".bif.gz")):
            out.append(load_bif(os.path.join(path, fname)))
    return out


@register_source("rds_dir")
def acquire_rds_dir(path: str = ".", **_kw):
    """Load all .rds bn.fit files from a local directory — the reference
    suite's gaussian/clgaussian networks ship ONLY as R bn.fit RDS files
    (``/root/reference/benchmarking/bnlearn_bnfit.py``); the pure-Python
    reader (``rds.py``) ingests them with no R interop installed."""
    from .rds import read_bnfit

    out = []
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".rds"):
            out.append(
                read_bnfit(
                    os.path.join(path, fname), name=fname[: -len(".rds")]
                )
            )
    return out


def acquire(source: str, **kwargs) -> List[DiscreteBN]:
    if source not in DOWNLOADER_REGISTRY:
        raise ValueError(
            f"Unknown network source {source!r}. "
            f"Available: {sorted(DOWNLOADER_REGISTRY)}"
        )
    return DOWNLOADER_REGISTRY[source](**kwargs)
