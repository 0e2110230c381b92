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

from typing import Dict, Tuple

import numpy as np

from ..core.registry import register_update
from ..core.rng import fold
from .base_update import BaseUpdatePolicy, node_update_inputs, resolve_node_update


def _update_all_nodes(vbn, data, apply_fn):
    for node_idx, node in enumerate(vbn.dag.topological_order()):
        params_conf = resolve_node_update(vbn, node)
        parents, x = node_update_inputs(vbn, data, node)
        key = fold(vbn.next_key(), node_idx)
        vbn.params[node] = apply_fn(
            vbn.cpd_spec(node), vbn.params[node], key, parents, x, params_conf
        )
    vbn._plan_cache.clear()  # static spec fields may have been refined
    return vbn.nodes


@register_update("streaming_stats")
class StreamingStatsUpdate(BaseUpdatePolicy):
    def update(self, vbn, data, **kwargs):
        kwargs.pop("verbosity", None)
        return _update_all_nodes(
            vbn,
            data,
            lambda cpd, p, k, par, x, conf: cpd.update(p, k, par, x, **conf),
        )


@register_update("online_sgd")
class OnlineSGDUpdate(BaseUpdatePolicy):
    def update(self, vbn, data, **kwargs):
        kwargs.pop("verbosity", None)
        return _update_all_nodes(
            vbn,
            data,
            lambda cpd, p, k, par, x, conf: cpd.update(p, k, par, x, **conf),
        )


@register_update("ema")
class EMAUpdate(BaseUpdatePolicy):
    def __init__(self, alpha: float = 0.1, **_kwargs) -> None:
        self.alpha = float(alpha)

    def update(self, vbn, data, alpha=None, **kwargs):
        kwargs.pop("verbosity", None)
        a = float(alpha if alpha is not None else self.alpha)

        def apply(cpd, p, k, par, x, conf):
            if not hasattr(cpd, "_nll"):
                raise NotImplementedError(
                    "CPD has no trainable parameters for EMA update"
                )
            return cpd.update(p, k, par, x, ema_alpha=a, **conf)

        return _update_all_nodes(vbn, data, apply)


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
