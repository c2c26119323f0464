"""Loss scalers (static + dynamic), kept for capability parity.

Parity target: reference ``loss_scaler.py:3-80`` and the fp16 master-weights
optimizer it serves (fp16_optimizer.py).  On TPU the training dtype is
bfloat16, which shares float32's exponent range, so loss scaling is
unnecessary — the default config never engages these.  They are provided
(and tested) for ``fp16_run=True`` completeness: scale the loss before
gradients, unscale after, skip the step on overflow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossScaler:
    """Static loss scaler (reference loss_scaler.py:3-32)."""

    def __init__(self, scale: float = 1.0):
        self.loss_scale = float(scale)

    def scale_loss(self, loss):
        return loss * self.loss_scale

    def unscale_grads(self, grads):
        inv = 1.0 / self.loss_scale
        return jax.tree_util.tree_map(lambda g: g * inv, grads)

    @staticmethod
    def has_overflow(grads) -> bool:
        leaves = jax.tree_util.tree_leaves(grads)
        total = sum(jnp.sum(jnp.abs(g)) for g in leaves)
        return not bool(jnp.isfinite(total))

    def update_scale(self, overflow: bool) -> None:
        pass


class DynamicScalerState(NamedTuple):
    scale: jnp.ndarray          # float32 scalar
    iters_since_rescale: jnp.ndarray  # int32 scalar


class DynamicLossScaler:
    """Dynamic scaler: x2 every `scale_window` clean steps, /2 on overflow
    with a floor of 1 (reference loss_scaler.py:35-80)."""

    def __init__(self, init_scale: float = 2 ** 32, scale_factor: float = 2.0,
                 scale_window: int = 1000):
        self.scale_factor = scale_factor
        self.scale_window = scale_window
        self.init_scale = init_scale

    def init(self) -> DynamicScalerState:
        return DynamicScalerState(
            scale=jnp.asarray(self.init_scale, jnp.float32),
            iters_since_rescale=jnp.zeros((), jnp.int32),
        )

    def update(self, state: DynamicScalerState, overflow) -> DynamicScalerState:
        """Pure (jit-able) update."""
        grew = state.iters_since_rescale + 1 >= self.scale_window
        new_scale = jnp.where(
            overflow,
            jnp.maximum(state.scale / self.scale_factor, 1.0),
            jnp.where(grew, state.scale * self.scale_factor, state.scale),
        )
        new_iters = jnp.where(
            overflow | grew, jnp.zeros((), jnp.int32),
            state.iters_since_rescale + 1,
        )
        return DynamicScalerState(new_scale, new_iters)


def scaled_value_and_grad(loss_fn, scale):
    """value_and_grad of ``scale * loss_fn`` with grads unscaled back.

    Use with DynamicLossScaler for an fp16_run-equivalent training step:
        (value, aux), grads, overflow = scaled_value_and_grad(f, state.scale)(x)
    """

    def wrapped(*args, **kwargs):
        def scaled(*a, **k):
            out = loss_fn(*a, **k)
            if isinstance(out, tuple):
                return out[0] * scale, out[1]
            return out * scale

        has_aux = True
        try:
            (val, aux), grads = jax.value_and_grad(scaled, has_aux=True)(
                *args, **kwargs
            )
        except TypeError:
            val, grads = jax.value_and_grad(scaled)(*args, **kwargs)
            aux, has_aux = None, False
        inv = 1.0 / scale
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        total = sum(
            jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads)
        )
        overflow = ~jnp.isfinite(total)
        return ((val * inv, aux) if has_aux else val * inv), grads, overflow

    return wrapped
