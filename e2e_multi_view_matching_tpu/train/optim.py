"""Optimizer and schedule semantics of the reference training loop, in optax.

Reproduces (SURVEY.md section 7.3 item 7 -- these must match or stage 2 diverges):
- `scale_lr` (`/root/reference/train.py:23-34`): lr *= sqrt(fact),
  decay_rate **= fact, start/end decay steps /= fact, with
  fact = tuple*batch*n_devices / (2 * 64) (megadepth base batch 16).
- Exponential decay stepped only while start_decay < step < end_decay
  (`train.py:434-435`).
- Two parameter groups: conf_mlp at fixed lr 1e-4, everything else on the
  schedule (`train.py:360-362`).
- Gradient value clipping at 0.1 only in the pose-loss stage (`train.py:256-260,
  423-425`).
- Non-finite-gradient steps are skipped entirely (`train.py:422`,
  `helpers.py:284-288`) -- though our geometry layer clamps the singularities
  that caused them, the guard is kept as defense in depth.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def scale_lr(tuple_size, batch_size, n_devices, lr, decay_rate, start_decay,
             end_decay, dataset):
    """Learning-rate scaling law (`train.py:23-34`)."""
    orig_batch_size = 16.0 if "megadepth" in dataset else 64.0
    orig_tuple_size = 2.0
    fact = float(tuple_size * batch_size * n_devices) / (orig_tuple_size * orig_batch_size)
    return (
        math.sqrt(fact) * lr,
        decay_rate**fact,
        int(start_decay / fact),
        int(end_decay / fact),
    )


def windowed_exponential_schedule(base_lr, decay_rate, start_decay, end_decay):
    """lr(step) = base * decay_rate^clip(step - start, 0, end - start)."""

    def schedule(step):
        exponent = jnp.clip(step - start_decay, 0, max(end_decay - start_decay, 0))
        return base_lr * jnp.power(decay_rate, exponent.astype(jnp.float32))

    return schedule


class SkipIfNonFiniteState(NamedTuple):
    inner: optax.OptState
    skipped: jnp.ndarray  # int32 count of skipped updates


def skip_if_nonfinite(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Skip the whole update when any gradient entry is non-finite.

    Matches `has_finite_gradients` gating (`train.py:422-426`): the optimizer
    state (incl. Adam moments) is not advanced on skipped steps.
    """

    def init(params):
        return SkipIfNonFiniteState(inner.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        flat = jax.tree_util.tree_leaves(grads)
        finite = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in flat])
        )
        updates, new_inner = inner.update(grads, state.inner, params)
        zero_updates = jax.tree.map(jnp.zeros_like, updates)
        updates = jax.tree.map(
            lambda u, z: jnp.where(finite, u, z), updates, zero_updates
        )
        new_inner = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if isinstance(n, jnp.ndarray) and n.shape == o.shape else n,
            new_inner,
            state.inner,
        )
        return updates, SkipIfNonFiniteState(
            new_inner, state.skipped + jnp.where(finite, 0, 1)
        )

    return optax.GradientTransformation(init, update)


def build_optimizer(
    base_lr,
    decay_rate,
    start_decay,
    end_decay,
    pose_loss=False,
    conf_mlp_lr=1e-4,
    grad_clip=0.1,
):
    """The full reference optimizer: grouped Adam + windowed decay + guards.

    Returns an optax transformation whose `update` expects the matcher's params
    pytree (flax `params` collection). Parameters under a module path containing
    "conf_mlp" form the fixed-lr group.
    """
    schedule = windowed_exponential_schedule(base_lr, decay_rate, start_decay, end_decay)
    main_opt = optax.adam(learning_rate=schedule)
    conf_opt = optax.adam(learning_rate=conf_mlp_lr)

    def label_fn(params):
        def label(path, _):
            return "conf_mlp" if any("conf_mlp" in str(k) for k in path) else "main"

        return jax.tree_util.tree_map_with_path(label, params)

    tx = optax.multi_transform({"main": main_opt, "conf_mlp": conf_opt}, label_fn)
    chain = []
    if pose_loss and grad_clip > 0:
        chain.append(optax.clip(grad_clip))  # clip_grad_value_ semantics
    chain.append(tx)
    opt = optax.chain(*chain)
    if pose_loss:
        opt = skip_if_nonfinite(opt)
    return opt
