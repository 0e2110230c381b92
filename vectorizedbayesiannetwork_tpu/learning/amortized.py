"""Amortized inference: a masked-evidence posterior network.

The reference registers ``amortized`` learning as a NotImplementedError
placeholder (``/root/reference/vbn/learning/amortized.py:6-14``). Here it is
real: after the usual node-wise CPD fit, a single MLP is trained on
randomly-masked rows of the training data to predict every node's
conditional distribution given any observed subset — so a posterior query
``p(target | evidence)`` becomes ONE feed-forward GEMM chain instead of a
Monte-Carlo sweep. This is the classic amortized-inference recipe
(masked-evidence conditional density estimation), and it is the most
TPU-friendly serving path in the framework: a fixed-shape batched matmul
per query batch, no per-node traversal at all.

Training objective: for each row, draw a random observation mask; the
network sees ``[x * mask, mask]`` and pays NLL on the *unobserved* nodes —
Gaussian NLL (standardized units) for continuous nodes, cross-entropy over
the fitted class support for categorical nodes. The (epochs x minibatch)
loop reuses the shared jit-scanned trainer (``models/_train.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import register_learning
from ..core.rng import fold
from ..core.utils import resolve_verbosity
from ..models._mlp import check_activation, mlp_apply, mlp_init
from ..models._train import fit_minibatch_nll
from ..ops.gauss import diag_gaussian_log_prob, safe_softplus
from .node_wise import NodeWiseLearner

_CATEGORICAL_CPDS = {"categorical_table", "categorical_embedded_softmax"}


@dataclass(frozen=True)
class AmortizedSpec:
    """Static (hashable, JSON-serializable) layout of the amortized net."""

    topo: Tuple[str, ...]
    dims: Tuple[int, ...]
    offsets: Tuple[int, ...]
    total_dim: int
    kinds: Tuple[str, ...]  # "gaussian" | "categorical"
    n_classes: Tuple[int, ...]  # 0 for gaussian nodes
    head_offsets: Tuple[int, ...]
    head_dims: Tuple[int, ...]
    hidden_dims: Tuple[int, ...]
    activation: str
    min_scale: float
    # True when the net was trained with a do-mask channel on
    # model-generated mutilated-graph samples, so it can answer
    # p(target | evidence, do(...)) directly.
    interventional: bool = False

    @property
    def n_nodes(self) -> int:
        return len(self.topo)

    @property
    def input_dim(self) -> int:
        extra = 2 if self.interventional else 1
        return self.total_dim + extra * self.n_nodes

    @property
    def head_total(self) -> int:
        return sum(self.head_dims)

    def signature(self) -> tuple:
        return (
            self.topo,
            self.dims,
            self.kinds,
            self.n_classes,
            self.hidden_dims,
            self.activation,
            self.min_scale,
            self.interventional,
        )

    def node_index(self, node: str) -> int:
        return self.topo.index(node)

    def to_dict(self) -> Dict:
        return {
            "topo": list(self.topo),
            "dims": list(self.dims),
            "offsets": list(self.offsets),
            "total_dim": self.total_dim,
            "kinds": list(self.kinds),
            "n_classes": list(self.n_classes),
            "head_offsets": list(self.head_offsets),
            "head_dims": list(self.head_dims),
            "hidden_dims": list(self.hidden_dims),
            "activation": self.activation,
            "min_scale": self.min_scale,
            "interventional": self.interventional,
        }

    @classmethod
    def from_dict(cls, d: Dict) -> "AmortizedSpec":
        return cls(
            topo=tuple(d["topo"]),
            dims=tuple(int(v) for v in d["dims"]),
            offsets=tuple(int(v) for v in d["offsets"]),
            total_dim=int(d["total_dim"]),
            kinds=tuple(d["kinds"]),
            n_classes=tuple(int(v) for v in d["n_classes"]),
            head_offsets=tuple(int(v) for v in d["head_offsets"]),
            head_dims=tuple(int(v) for v in d["head_dims"]),
            hidden_dims=tuple(int(v) for v in d["hidden_dims"]),
            activation=str(d["activation"]),
            min_scale=float(d["min_scale"]),
            interventional=bool(d.get("interventional", False)),
        )


def build_spec(
    vbn,
    hidden_dims: Sequence[int],
    activation: str,
    min_scale: float,
    interventional: bool = False,
) -> AmortizedSpec:
    topo = tuple(vbn.dag.topological_order())
    dims = tuple(int(vbn.cpd_spec(n).output_dim) for n in topo)
    offsets, total = [], 0
    for d in dims:
        offsets.append(total)
        total += d
    kinds, n_classes = [], []
    for n, d in zip(topo, dims):
        cpd = vbn.cpd_spec(n)
        if cpd.registry_key in _CATEGORICAL_CPDS and d == 1:
            support = np.asarray(cpd.support_values(vbn.params[n]))
            kinds.append("categorical")
            n_classes.append(int(support.shape[-1]))
        else:
            kinds.append("gaussian")
            n_classes.append(0)
    head_offsets, head_dims = [], []
    h_off = 0
    for d, kind, k in zip(dims, kinds, n_classes):
        hd = k if kind == "categorical" else 2 * d
        head_offsets.append(h_off)
        head_dims.append(hd)
        h_off += hd
    return AmortizedSpec(
        topo=topo,
        dims=dims,
        offsets=tuple(offsets),
        total_dim=total,
        kinds=tuple(kinds),
        n_classes=tuple(n_classes),
        head_offsets=tuple(head_offsets),
        head_dims=tuple(head_dims),
        hidden_dims=tuple(int(h) for h in hidden_dims),
        activation=check_activation(str(activation)),
        min_scale=float(min_scale),
        interventional=bool(interventional),
    )


_EXPAND_CACHE: Dict[tuple, np.ndarray] = {}


def _mask_expand_matrix(spec: AmortizedSpec) -> np.ndarray:
    """[n_nodes, total_dim] constant: node mask -> per-dim mask."""
    sig = spec.signature()
    e = _EXPAND_CACHE.get(sig)
    if e is None:
        e = np.zeros((spec.n_nodes, spec.total_dim), np.float32)
        for i, (off, d) in enumerate(zip(spec.offsets, spec.dims)):
            e[i, off : off + d] = 1.0
        _EXPAND_CACHE[sig] = e
    return e


def amortized_forward(
    spec: AmortizedSpec,
    net: Dict,
    rows: jax.Array,
    mask: jax.Array,
    do_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Trunk forward. rows [M, total_dim] RAW values, mask [M, n_nodes]
    (1 = value visible: evidence OR intervention), do_mask [M, n_nodes]
    (1 = the visible value is a do-intervention, so upstream inference
    must not flow). Returns head activations [M, head_total].
    """
    xn = (rows - net["mean"]) / net["std"]
    expand = jnp.asarray(_mask_expand_matrix(spec))
    parts = [xn * (mask @ expand), mask]
    if spec.interventional:
        if do_mask is None:
            do_mask = jnp.zeros_like(mask)
        parts.append(do_mask)
    x_in = jnp.concatenate(parts, axis=-1)
    return mlp_apply(net["mlp"], x_in, spec.activation)


def node_distribution(
    spec: AmortizedSpec, net: Dict, heads: jax.Array, idx: int
):
    """Decode node ``idx``'s predicted conditional from the head block.

    Gaussian -> (loc, scale) in RAW units; categorical -> (probs, values).
    """
    ho = heads[:, spec.head_offsets[idx] : spec.head_offsets[idx] + spec.head_dims[idx]]
    off, d = spec.offsets[idx], spec.dims[idx]
    if spec.kinds[idx] == "categorical":
        k = spec.n_classes[idx]
        probs = jax.nn.softmax(ho, axis=-1)
        values = net["support"][idx, :k]
        return probs, values
    mean = net["mean"][off : off + d]
    std = net["std"][off : off + d]
    loc = ho[:, :d] * std + mean
    scale = safe_softplus(ho[:, d:], spec.min_scale) * std
    return loc, scale


class _AmortizedModule:
    """Adapter exposing the masked NLL to the shared scan trainer."""

    def __init__(self, spec: AmortizedSpec) -> None:
        self.spec = spec

    def static_signature(self) -> tuple:
        return ("amortized", self.spec.signature())

    def _nll(self, net: Dict, mask: jax.Array, rows: jax.Array) -> jax.Array:
        spec = self.spec
        # Interventional nets receive [obs_mask | do_mask] stacked on the
        # mask argument (the shared trainer passes exactly two arrays).
        do_mask = None
        if spec.interventional:
            mask, do_mask = (
                mask[:, : spec.n_nodes],
                mask[:, spec.n_nodes :],
            )
        # amortized_forward masks the normalized inputs, so unobserved dims
        # enter the trunk as exactly 0 (the standardized mean) — no leak.
        heads = amortized_forward(spec, net, rows, mask, do_mask)
        total = jnp.zeros((), jnp.float32)
        count = jnp.zeros((), jnp.float32)
        xn = (rows - net["mean"]) / net["std"]
        for i in range(spec.n_nodes):
            off, d = spec.offsets[i], spec.dims[i]
            unobs = 1.0 - mask[:, i]
            ho = heads[
                :, spec.head_offsets[i] : spec.head_offsets[i] + spec.head_dims[i]
            ]
            if spec.kinds[i] == "categorical":
                k = spec.n_classes[i]
                vals = net["support"][i, :k]
                x_val = rows[:, off]
                idx = jnp.argmin(
                    jnp.abs(x_val[:, None] - vals[None, :]), axis=1
                )
                logp = jax.nn.log_softmax(ho, axis=-1)
                nll_row = -jnp.take_along_axis(logp, idx[:, None], axis=1)[:, 0]
            else:
                loc = ho[:, :d]
                scale = safe_softplus(ho[:, d:], spec.min_scale)
                target = xn[:, off : off + d]
                nll_row = -diag_gaussian_log_prob(target, loc, scale)
            total = total + jnp.sum(unobs * nll_row)
            count = count + jnp.sum(unobs)
        return total / jnp.maximum(count, 1.0)


@register_learning("amortized")
class AmortizedLearner:
    """node_wise fit + amortized posterior network (see module docstring)."""

    def __init__(
        self,
        default_cpd: str = "gaussian_nn",
        hidden_dims: Sequence[int] = (128, 128),
        activation: str = "relu",
        epochs: int = 150,
        batch_size: int = 512,
        lr: float = 1e-3,
        weight_decay: float = 0.0,
        n_mask_samples: int = 4,
        min_scale: float = 1e-3,
        interventional: bool = True,
        n_do_sets: int = 12,
        n_obs_sets: int = 4,
        **_kwargs,
    ) -> None:
        self.default_cpd = default_cpd
        self.hidden_dims = tuple(int(h) for h in hidden_dims)
        self.activation = check_activation(str(activation))
        self.epochs = int(epochs)
        self.batch_size = int(batch_size)
        self.lr = float(lr)
        self.weight_decay = float(weight_decay)
        self.n_mask_samples = max(1, int(n_mask_samples))
        self.min_scale = float(min_scale)
        # Train a do-mask channel on model-generated mutilated-graph
        # samples so do-queries are served amortized too (single-node
        # graphs have nothing to intervene on).
        self.interventional = bool(interventional)
        self.n_do_sets = max(1, int(n_do_sets))
        # Model-generated OBSERVATIONAL rows (do-free ancestral samples of
        # the fitted model) decouple the amortizer's coverage from the
        # training set's evidence distribution: rare evidence patterns the
        # data never exhibits still appear in the model's own samples.
        self.n_obs_sets = max(0, int(n_obs_sets))
        self._node_wise = NodeWiseLearner(default_cpd=default_cpd)

    def _model_rows(self, vbn, spec, rows, rng, n_int_sets, n_obs_sets):
        """Model-generated training rows: (values, obs_masks, do_masks).

        The first ``n_int_sets`` blocks are mutilated-graph samples with
        per-row random do-sets; the last ``n_obs_sets`` blocks are plain
        observational ancestral samples (all-zero do masks). ALL rows ride
        ONE mask-dynamic sweep (per-row do masks,
        inference/_dynamic_sweep.py) — a single compile instead of one
        per random do-set, and every row gets its own do-set. Do values
        are bootstrapped from the data marginals so they stay on-support.
        """
        import jax

        from ..core.base import Query
        from ..core.plan import get_plan
        from ..core.rng import fold
        from ..inference._dynamic_sweep import dynamic_sweep_trace

        plan = get_plan(
            vbn, Query(target=spec.topo[0], evidence={}, do={})
        )
        cpds = tuple(vbn.cpd_spec(n) for n in plan.topo_order)
        params_tuple = tuple(vbn.params[n] for n in plan.topo_order)
        n = rows.shape[0]
        m_int = min(1024, n) * n_int_sets
        m = m_int + min(1024, n) * n_obs_sets
        # per-row do-sets for the interventional block; the observational
        # block keeps an all-zero do mask (plain ancestral model samples)
        p_do = rng.uniform(0.1, 0.5, size=(m, 1)).astype(np.float32)
        do_mask = (rng.random((m, spec.n_nodes)) < p_do).astype(np.float32)
        do_mask[m_int:] = 0.0
        # bootstrap do VALUES per node from the observed marginals
        fixed = np.zeros((m, spec.total_dim), np.float32)
        for i in range(spec.n_nodes):
            off, d = spec.offsets[i], spec.dims[i]
            picks = rng.integers(0, n, size=m)
            fixed[:, off : off + d] = rows[picks, off : off + d]

        def sweep(params, key, fx, dom):
            packed, _ = dynamic_sweep_trace(
                plan, cpds, params, key, fx, jnp.zeros_like(dom), dom, 1
            )
            return packed[:, 0, :]

        vals = np.asarray(
            jax.jit(sweep)(
                params_tuple, fold(vbn.root_key, 999), fixed, do_mask
            ),
            np.float32,
        )
        p_obs = rng.uniform(0.1, 0.9, size=(m, 1)).astype(np.float32)
        obs = (rng.random((m, spec.n_nodes)) < p_obs).astype(np.float32)
        obs = np.maximum(obs, do_mask)  # do'd values are always given
        return vals, obs, do_mask

    def fit(
        self,
        vbn,
        data: Dict[str, np.ndarray],
        verbose: Optional[int] = None,
        **kwargs,
    ):
        verbosity = resolve_verbosity(verbose)
        # Stage 1: the generative model (exact parity with node_wise).
        self._node_wise.fit(vbn, data, verbose=verbose, **kwargs)

        # Stage 2: the amortizer, trained on randomly-masked data rows.
        interventional = self.interventional and len(vbn.dag) > 1
        spec = build_spec(
            vbn, self.hidden_dims, self.activation, self.min_scale,
            interventional=interventional,
        )
        rows = np.concatenate(
            [np.asarray(data[n], np.float32) for n in spec.topo], axis=-1
        )
        n = rows.shape[0]
        rng = np.random.default_rng(vbn.seed + 17)
        reps, masks = [], []
        for _ in range(self.n_mask_samples):
            p_obs = rng.uniform(0.1, 0.9, size=(n, 1)).astype(np.float32)
            masks.append(
                (rng.random((n, spec.n_nodes)) < p_obs).astype(np.float32)
            )
            reps.append(rows)
        rows_rep = np.concatenate(reps, axis=0)
        masks_rep = np.concatenate(masks, axis=0)
        do_rep = np.zeros_like(masks_rep)

        n_int_sets = self.n_do_sets if interventional else 0
        if n_int_sets or self.n_obs_sets:
            # Stage 2b: model-generated rows. Interventional blocks
            # bootstrap do VALUES from the observed marginals and
            # ancestral-sample the remaining nodes from the fitted model's
            # MUTILATED graph (do severs parents inside the sweep);
            # observational blocks are do-free ancestral samples that
            # widen evidence coverage beyond the data distribution. The
            # net sees the do flag as its own channel; the loss still
            # covers only unobserved nodes.
            mod_rows, mod_masks, mod_dos = self._model_rows(
                vbn, spec, rows, rng, n_int_sets, self.n_obs_sets
            )
            rows_rep = np.concatenate([rows_rep, mod_rows], axis=0)
            masks_rep = np.concatenate([masks_rep, mod_masks], axis=0)
            do_rep = np.concatenate([do_rep, mod_dos], axis=0)
        if spec.interventional:
            masks_rep = np.concatenate([masks_rep, do_rep], axis=1)

        mean = rows.mean(axis=0)
        std = np.maximum(rows.std(axis=0), 1e-6)
        k_max = max([1] + [k for k in spec.n_classes if k > 0])
        support = np.zeros((spec.n_nodes, k_max), np.float32)
        for i, node in enumerate(spec.topo):
            if spec.kinds[i] == "categorical":
                vals = np.asarray(
                    vbn.cpd_spec(node).support_values(vbn.params[node])
                ).reshape(-1)[: spec.n_classes[i]]
                support[i, : vals.size] = vals

        key = fold(vbn.root_key, 777)
        net = {
            "mlp": mlp_init(
                key, spec.input_dim, spec.hidden_dims, spec.head_total
            ),
            "mean": jnp.asarray(mean),
            "std": jnp.asarray(std),
            "support": jnp.asarray(support),
        }
        module = _AmortizedModule(spec)
        # Only the MLP trains; stats/support ride along as frozen leaves —
        # keep them out of the optimizer by training the "mlp" subtree.
        frozen = {k: net[k] for k in ("mean", "std", "support")}

        def nll(mlp_params, mask, rows_):
            return module._nll({**frozen, "mlp": mlp_params}, mask, rows_)

        module_adapter = _TrainAdapter(spec, nll)
        mlp_params, _opt = fit_minibatch_nll(
            module_adapter,
            "_nll",
            net["mlp"],
            None,
            fold(key, 1),
            masks_rep,
            rows_rep,
            epochs=self.epochs,
            batch_size=self.batch_size,
            lr=self.lr,
            weight_decay=self.weight_decay,
        )
        net["mlp"] = mlp_params
        vbn.amortized = {"net": net, "spec": spec}
        if verbosity >= 1:
            print(
                f"[amortized] trained posterior net "
                f"({spec.input_dim}->{spec.hidden_dims}->{spec.head_total})"
            )
        return vbn.nodes


class _TrainAdapter:
    """Bind a closure-form NLL into the shared trainer's (obj, name) API."""

    def __init__(self, spec: AmortizedSpec, nll) -> None:
        self.spec = spec
        self._nll = nll

    def static_signature(self) -> tuple:
        return ("amortized_adapter", self.spec.signature())
