"""Shared jit-scanned minibatch NLL training loop for neural CPDs.

TPU-first replacement for the reference's per-CPD torch DataLoader/Adam
loops (``vbn/cpds/gaussian_nn.py:121-171``, ``vbn/cpds/mdn.py:92-141``): the
entire (epochs x minibatches) optimization runs as one compiled
``lax.scan`` program — per-epoch random permutations, batch gathers, value
-and-grad, and Adam updates all on device with zero host round-trips.

Compiled trainers are cached by the CPD's static signature + data/loop
shape, so fitting many same-family nodes of one DAG reuses a single XLA
program (the level-batching analogue at fit time).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ._optim import adam_init, adam_step

_TRAINER_CACHE: Dict[tuple, Callable] = {}


def _make_run(
    nll_fn: Callable,
    n: int,
    epochs: int,
    batch_size: int,
    lr: float,
    weight_decay: float,
    max_grad_norm: Optional[float],
    has_aux: bool,
    ema_alpha: Optional[float],
):
    bs = min(int(batch_size), n)
    n_batches = -(-n // bs)
    n_pad = n_batches * bs

    def run(net, opt, key, parents, x, aux):
        if has_aux:
            grad_fn = jax.value_and_grad(
                lambda net_, bp, bx: nll_fn(net_, bp, bx, aux)
            )
        else:
            grad_fn = jax.value_and_grad(nll_fn)

        def epoch_body(carry, ekey):
            net, opt = carry
            perm = jax.random.permutation(ekey, jnp.arange(n_pad) % n)

            def batch_body(carry, b_idx):
                net, opt = carry
                idx = jax.lax.dynamic_slice(perm, (b_idx * bs,), (bs,))
                bp = jnp.take(parents, idx, axis=0)
                bx = jnp.take(x, idx, axis=0)
                loss, grads = grad_fn(net, bp, bx)
                old_net = net
                net, opt = adam_step(
                    net, grads, opt, lr, weight_decay, max_grad_norm
                )
                if ema_alpha is not None:
                    # Per-minibatch shadow averaging (parity: the reference
                    # EMA policy's p <- (1-a)*old + a*new after each step,
                    # vbn/update/ema.py:42-69).
                    net = jax.tree_util.tree_map(
                        lambda old, new: (1.0 - ema_alpha) * old
                        + ema_alpha * new,
                        old_net,
                        net,
                    )
                return (net, opt), loss

            (net, opt), losses = jax.lax.scan(
                batch_body, (net, opt), jnp.arange(n_batches)
            )
            return (net, opt), jnp.mean(losses)

        ekeys = jax.random.split(key, epochs)
        (net, opt), losses = jax.lax.scan(epoch_body, (net, opt), ekeys)
        return net, opt, losses

    return run


def _build_trainer(*args):
    return jax.jit(_make_run(*args))


def _build_trainer_many(*args):
    """G same-signature nodes trained as ONE vmapped scan program.

    The per-node (epochs x minibatch) loops run lockstep: G small GEMMs per
    step become one batched GEMM on the MXU, and G sequential scan programs
    become a single dispatch — the fit-time analogue of the level-grouped
    inference sweep.
    """
    run = _make_run(*args)
    return jax.jit(
        jax.vmap(run, in_axes=(0, 0, 0, 0, 0, None))
    )


def fit_minibatch_nll(
    cpd,
    nll_name: str,
    net,
    opt,
    key: jax.Array,
    parents: Optional[jax.Array],
    x: jax.Array,
    *,
    epochs: int,
    batch_size: int,
    lr: float,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    aux=None,
    ema_alpha: Optional[float] = None,
) -> Tuple[Dict, Dict]:
    """Run the compiled training loop; returns (net_params, opt_state).

    ``nll_name`` is the name of a method on the CPD spec with signature
    ``(net_params, parents2d, x2d) -> scalar mean NLL``; it must depend only
    on the spec's static fields, which makes cross-node trainer reuse safe.
    """
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[:, None]
    n = int(x.shape[0])
    if parents is None:
        parents = jnp.zeros((n, 0), jnp.float32)
    else:
        parents = jnp.asarray(parents, jnp.float32)
    if opt is None:
        opt = adam_init(net)
    epochs = max(1, int(epochs))
    sig = (
        type(cpd).__name__,
        cpd.static_signature(),
        nll_name,
        n,
        int(x.shape[1]),
        int(parents.shape[1]),
        epochs,
        int(batch_size),
        float(lr),
        float(weight_decay),
        None if max_grad_norm is None else float(max_grad_norm),
        aux is None,
        None if ema_alpha is None else float(ema_alpha),
    )
    trainer = _TRAINER_CACHE.get(sig)
    if trainer is None:
        nll_fn = getattr(cpd, nll_name)
        trainer = _build_trainer(
            nll_fn,
            n,
            epochs,
            int(batch_size),
            float(lr),
            float(weight_decay),
            max_grad_norm,
            aux is not None,
            None if ema_alpha is None else float(ema_alpha),
        )
        _TRAINER_CACHE[sig] = trainer
    net, opt, _losses = trainer(net, opt, key, parents, x, aux)
    return net, opt


def fit_minibatch_nll_many(
    cpd,
    nll_name: str,
    nets,  # pytree stacked on leading axis G
    keys: jax.Array,  # [G] keys (stacked)
    parents: jax.Array,  # [G, N, Din]
    x: jax.Array,  # [G, N, Dout]
    *,
    epochs: int,
    batch_size: int,
    lr: float,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
) -> Tuple[Dict, Dict]:
    """Train G same-signature nodes in one vmapped program.

    Returns (nets, opts) stacked on axis 0. Optimizer state starts fresh
    (callers use this for initial fits, where every node's opt is None).
    """
    g = int(x.shape[0])
    n = int(x.shape[1])
    opts = {
        "m": jax.tree_util.tree_map(jnp.zeros_like, nets),
        "v": jax.tree_util.tree_map(jnp.zeros_like, nets),
        "step": jnp.zeros((g,), jnp.float32),
    }
    epochs = max(1, int(epochs))
    sig = (
        "many",
        g,
        type(cpd).__name__,
        cpd.static_signature(),
        nll_name,
        n,
        int(x.shape[2]),
        int(parents.shape[2]),
        epochs,
        int(batch_size),
        float(lr),
        float(weight_decay),
        None if max_grad_norm is None else float(max_grad_norm),
    )
    trainer = _TRAINER_CACHE.get(sig)
    if trainer is None:
        trainer = _build_trainer_many(
            getattr(cpd, nll_name),
            n,
            epochs,
            int(batch_size),
            float(lr),
            float(weight_decay),
            max_grad_norm,
            False,
            None,
        )
        _TRAINER_CACHE[sig] = trainer
    nets, opts, _losses = trainer(nets, opts, keys, parents, x, None)
    return nets, opts
