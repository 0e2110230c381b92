"""The four online update policies.

Capability parity with ``/root/reference/vbn/update/`` (SURVEY.md §2.6):
  * ``streaming_stats`` — delegate to each CPD's update (closed-form CPDs
    refit sufficient statistics) (streaming_stats.py:13-26);
  * ``online_sgd`` — delegate to each CPD's update (gradient CPDs run
    n_steps of Adam on the persisted optimizer state) (online_sgd.py:13-35);
  * ``ema`` — gradient update with per-minibatch shadow averaging
    ``p <- (1-a)·old + a·new``; raises on non-gradient CPDs (ema.py:13-69);
  * ``replay_buffer`` — per-node FIFO buffer mixing ``replay_ratio·batch``
    random replayed rows into each update; buffer serialized in checkpoints
    (replay_buffer.py:13-81).

All policies operate on the functional params store (``vbn.params[node]``)
rather than mutating modules.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..core.registry import register_update
from ..core.rng import fold
from .base_update import BaseUpdatePolicy, node_update_inputs, resolve_node_update


def _update_all_nodes(vbn, data, *, extra: Optional[Dict] = None,
                      require_nll: bool = False):
    """Per-node updates in topo order — as ONE compiled dispatch when every
    CPD provides a pure ``update_program`` (the streaming-update serving
    path: milliseconds per small batch instead of a per-node eager op
    stream), falling back to the eager loop otherwise. Both paths consume
    the key stream identically (node i uses ``fold(fold_in(root, c0+i),
    i)``), so fused and eager draws are bit-identical."""
    topo = list(vbn.dag.topological_order())
    confs, progs, inputs = [], [], []
    for node in topo:
        conf = resolve_node_update(vbn, node)
        if extra:
            conf = {**conf, **extra}
        cpd = vbn.cpd_spec(node)
        if require_nll and not hasattr(cpd, "_nll"):
            raise NotImplementedError(
                "CPD has no trainable parameters for EMA update"
            )
        confs.append(conf)
        progs.append(cpd.update_program(conf))
        inputs.append(node_update_inputs(vbn, data, node))

    if topo and all(p is not None for p in progs):
        for node, (parents, x) in zip(topo, inputs):
            vbn.cpd_spec(node).update_host_precheck(
                vbn.params[node], parents, x
            )
        cache = vbn.__dict__.setdefault("_update_prog_cache", {})
        sig = (
            vbn.structure_fingerprint(),
            tuple(tuple(sorted(c.items())) for c in confs),
            tuple(
                (None if p is None else p.shape, x.shape)
                for p, x in inputs
            ),
        )
        fn = cache.get(sig)
        if fn is None:
            progs_t = tuple(progs)

            def whole(params_list, key_spec, flat_inputs, _p=progs_t):
                root, c0 = key_spec
                out = []
                for i, prog in enumerate(_p):
                    k = fold(jax.random.fold_in(root, c0 + i), i)
                    parents, x = flat_inputs[i]
                    out.append(prog(params_list[i], k, parents, x))
                return tuple(out)

            fn = jax.jit(whole)
            cache[sig] = fn
        c0 = vbn._keys.state()
        vbn._keys.set_state(c0 + len(topo))  # same stream as the eager loop
        new_params = fn(
            tuple(vbn.params[n] for n in topo),
            (vbn._keys._root, np.uint32(c0)),
            tuple(inputs),
        )
        for node, p in zip(topo, new_params):
            vbn.params[node] = p
    else:
        for node_idx, (node, conf, (parents, x)) in enumerate(
            zip(topo, confs, inputs)
        ):
            key = fold(vbn.next_key(), node_idx)
            vbn.params[node] = vbn.cpd_spec(node).update(
                vbn.params[node], key, parents, x, **conf
            )
    vbn._plan_cache.clear()  # static spec fields may have been refined
    return vbn.nodes


@register_update("streaming_stats")
class StreamingStatsUpdate(BaseUpdatePolicy):
    def update(self, vbn, data, **kwargs):
        kwargs.pop("verbosity", None)
        return _update_all_nodes(vbn, data)


@register_update("online_sgd")
class OnlineSGDUpdate(BaseUpdatePolicy):
    def update(self, vbn, data, **kwargs):
        kwargs.pop("verbosity", None)
        return _update_all_nodes(vbn, data)


@register_update("ema")
class EMAUpdate(BaseUpdatePolicy):
    def __init__(self, alpha: float = 0.1, **_kwargs) -> None:
        self.alpha = float(alpha)

    def update(self, vbn, data, alpha=None, **kwargs):
        kwargs.pop("verbosity", None)
        a = float(alpha if alpha is not None else self.alpha)
        return _update_all_nodes(
            vbn, data, extra={"ema_alpha": a}, require_nll=True
        )


@register_update("replay_buffer")
class ReplayBufferUpdate(BaseUpdatePolicy):
    def __init__(self, max_size: int = 2000, replay_ratio: float = 0.5) -> None:
        self.max_size = int(max_size)
        self.replay_ratio = float(replay_ratio)
        self._buffer: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self._rng = np.random.default_rng(0)

    def update(self, vbn, data, **kwargs):
        kwargs.pop("verbosity", None)
        for node_idx, node in enumerate(vbn.dag.topological_order()):
            conf = resolve_node_update(vbn, node)
            parents, x = node_update_inputs(vbn, data, node)
            self._update_buffer(node, parents, x)
            parents_mix, x_mix = self._mix_with_replay(node, parents, x)
            key = fold(vbn.next_key(), node_idx)
            vbn.params[node] = vbn.cpd_spec(node).update(
                vbn.params[node], key, parents_mix, x_mix, **conf
            )
        vbn._plan_cache.clear()
        return vbn.nodes

    def _update_buffer(self, node, parents, x) -> None:
        x = np.asarray(x, np.float32)
        parents = (
            np.zeros((x.shape[0], 0), np.float32)
            if parents is None
            else np.asarray(parents, np.float32)
        )
        if node not in self._buffer:
            self._buffer[node] = (parents.copy(), x.copy())
            return
        p_buf, x_buf = self._buffer[node]
        p_buf = np.concatenate([p_buf, parents], axis=0)
        x_buf = np.concatenate([x_buf, x], axis=0)
        if p_buf.shape[0] > self.max_size:
            p_buf = p_buf[-self.max_size :]
            x_buf = x_buf[-self.max_size :]
        self._buffer[node] = (p_buf, x_buf)

    def _mix_with_replay(self, node, parents, x):
        x = np.asarray(x, np.float32)
        parents = (
            np.zeros((x.shape[0], 0), np.float32)
            if parents is None
            else np.asarray(parents, np.float32)
        )
        if node not in self._buffer:
            return (parents if parents.shape[1] else None), x
        p_buf, x_buf = self._buffer[node]
        if p_buf.shape[0] == 0:
            return (parents if parents.shape[1] else None), x
        n_replay = int(max(1, self.replay_ratio * x.shape[0]))
        idx = self._rng.integers(0, p_buf.shape[0], size=n_replay)
        p_mix = np.concatenate([parents, p_buf[idx]], axis=0)
        x_mix = np.concatenate([x, x_buf[idx]], axis=0)
        return (p_mix if p_mix.shape[1] else None), x_mix

    def get_state(self):
        meta = {"nodes": sorted(self._buffer)}
        arrays = {}
        for node, (p_buf, x_buf) in self._buffer.items():
            arrays[f"buffer_p/{node}"] = p_buf
            arrays[f"buffer_x/{node}"] = x_buf
        return meta, arrays

    def set_state(self, meta, arrays) -> None:
        self._buffer = {}
        for node in meta.get("nodes", []):
            p = arrays.get(f"buffer_p/{node}")
            x = arrays.get(f"buffer_x/{node}")
            if p is not None and x is not None:
                self._buffer[node] = (
                    np.asarray(p, np.float32),
                    np.asarray(x, np.float32),
                )
