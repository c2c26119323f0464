"""Train state and the jitted train/eval steps.

Replaces the reference's torch Adam + clip_grad_norm loop body
(train.py:204-232); on TPU the default matmul dtype is bfloat16 — which has
fp32 exponent range — so no loss scaling is needed; parameters and optimizer
moments stay fp32.

``fp16_run=True`` engages the reference's true-fp16 path
(fp16_optimizer.py:51-383, loss_scaler.py:35-80): compute dtype float16,
loss scaled by a (dynamic) loss scale, grads unscaled, and a non-finite
gradient skips the whole update and halves the scale (x2 after every
``scale_window`` clean steps) — same overflow-skip semantics as
fp16_optimizer.py:255-260.

Optimizer semantics match torch.optim.Adam(lr, weight_decay) exactly:
gradient clip (1.0 global norm) -> L2 weight decay added to the gradient ->
Adam moments -> step (reference train.py:171-175,223-229).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import tacotron2
from .loss import tacotron2_vae_loss
from .loss_scaler import DynamicLossScaler, DynamicScalerState


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any
    model_state: Any           # batchnorm running stats
    opt_state: Any
    # fp16_run only: DynamicScalerState (None otherwise — an empty pytree
    # node, so every tree_map/jit over TrainState is unaffected).
    scaler: Any = None


def make_optimizer(hp, learning_rate=None):
    """torch.optim.Adam-equivalent chain with global-norm clipping."""
    lr = hp.learning_rate if learning_rate is None else learning_rate
    return optax.chain(
        optax.clip_by_global_norm(hp.grad_clip_thresh),
        optax.add_decayed_weights(hp.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def make_loss_scaler(hp) -> DynamicLossScaler | None:
    """fp16_run's scaler (reference loss_scaler.py): dynamic by default
    (init 2^32, /2 on overflow with floor 1, x2 every 1000 clean steps);
    ``dynamic_loss_scaling=False`` falls back to a static scale of 1
    (reference fp16_optimizer.py default static_loss_scale=1.0), expressed
    here as a dynamic scaler whose scale never moves off its floor."""
    if not hp.fp16_run:
        return None
    if hp.dynamic_loss_scaling:
        return DynamicLossScaler()
    return DynamicLossScaler(init_scale=1.0, scale_factor=1.0, scale_window=2 ** 31)


def create_train_state(rng, hp, learning_rate=None) -> TrainState:
    params, model_state = tacotron2.init(rng, hp)
    opt = make_optimizer(hp, learning_rate)
    scaler = make_loss_scaler(hp)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=opt.init(params),
        scaler=scaler.init() if scaler is not None else None,
    )


def make_train_step(hp, learning_rate=None):
    """Returns a pure (state, batch, rng) -> (state, metrics) step function.

    With ``grad_accum_steps = a > 1`` the batch splits into ``a``
    micro-batches run sequentially under one update, with gradients that
    match the single big-batch step (up to batchnorm batch statistics and
    per-micro RNG draws): the mel/gate terms are means (mean of equal-size
    micro-means == big-batch mean) while the reference's KL term is a SUM
    over the batch (loss_function.py:39), so each micro-batch's KL
    contribution is scaled by ``a`` before the 1/a gradient average.
    Reported metrics follow the same convention (kl_loss = sum over the
    full batch).  Batchnorm running stats chain through the micro-batches
    sequentially."""
    opt = make_optimizer(hp, learning_rate)
    scaler = make_loss_scaler(hp)
    accum = max(1, int(getattr(hp, "grad_accum_steps", 1)))
    if hp.fp16_run:
        hp = hp.replace(compute_dtype="float16")

    def train_step(ts: TrainState, batch, rng):
        scale = ts.scaler.scale if scaler is not None else jnp.float32(1.0)

        def loss_fn(params):
            out, new_mstate = tacotron2.forward(
                params, ts.model_state, batch, hp, train=True, rng=rng
            )
            total, aux = tacotron2_vae_loss(
                out, batch["mel"], batch["gate"], ts.step, hp
            )
            return total * scale, (total, aux, new_mstate)

        if accum > 1:
            def split(x):
                if x.shape[0] % accum != 0:
                    raise ValueError(
                        f"batch dim {x.shape[0]} not divisible by "
                        f"grad_accum_steps={accum}"
                    )
                return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

            micro_batches = jax.tree_util.tree_map(split, batch)
            micro_rngs = jax.random.split(rng, accum)

            def micro_loss(params, mstate, b, r):
                out, new_m = tacotron2.forward(
                    params, mstate, b, hp, train=True, rng=r
                )
                total_m, aux_m = tacotron2_vae_loss(
                    out, b["mel"], b["gate"], ts.step, hp
                )
                # big-batch-equivalent objective: KL is summed over the
                # batch, so weight each micro-batch's KL by `accum` before
                # the 1/accum gradient average
                grad_total = (
                    aux_m["recon_loss"]
                    + aux_m["kl_weight"] * accum * aux_m["kl_loss"]
                )
                return grad_total * scale, (aux_m, new_m)

            def body(carry, inp):
                g_acc, sums, mstate = carry
                b, r = inp
                (_, (aux_m, new_m)), g = jax.value_and_grad(
                    micro_loss, has_aux=True
                )(ts.params, mstate, b, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                new_sums = {
                    k: sums[k] + aux_m[k]
                    for k in ("recon_loss", "mel_loss", "gate_loss", "kl_loss")
                }
                new_sums["kl_weight"] = aux_m["kl_weight"]
                return (g_acc, new_sums, new_m), None

            g0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), ts.params
            )
            sums0 = {k: jnp.float32(0.0) for k in
                     ("recon_loss", "mel_loss", "gate_loss", "kl_loss",
                      "kl_weight")}
            (g_sum, sums, new_mstate), _ = jax.lax.scan(
                body, (g0, sums0, ts.model_state),
                (micro_batches, micro_rngs),
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            kl_weight = sums["kl_weight"]
            aux = {
                "recon_loss": sums["recon_loss"] / accum,
                "mel_loss": sums["mel_loss"] / accum,
                "gate_loss": sums["gate_loss"] / accum,
                "kl_loss": sums["kl_loss"],  # summed-KL big-batch convention
                "kl_weight": kl_weight,
            }
            total = aux["recon_loss"] + kl_weight * aux["kl_loss"]
        else:
            (_, (total, aux, new_mstate)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(ts.params)
        if scaler is not None:
            # fp16 grads can overflow to inf; pin them to ONE materialization
            # so the overflow check and the optimizer see the same values
            # (without the barrier XLA may recompute a consumer's copy with
            # different fusion, letting a poisoned update slip past the
            # finite-looking grad norm).
            grads = jax.lax.optimization_barrier(grads)
            grads = jax.tree_util.tree_map(lambda g: g / scale, grads)

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = opt.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)

        # Overflow/NaN guard: a non-finite loss or gradient skips the whole
        # update (reference fp16_optimizer.py:255-260 skips the step on grad
        # overflow; train.py:233 skips logging on NaN loss).
        ok = jnp.isfinite(total) & jnp.isfinite(grad_norm)
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_params, ts.params
        )
        new_mstate = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_mstate, ts.model_state
        )
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, ts.opt_state
        )

        metrics = {"loss": total, "grad_norm": grad_norm, **aux}
        new_scaler = ts.scaler
        if scaler is not None:
            new_scaler = scaler.update(ts.scaler, ~ok)
            metrics["loss_scale"] = ts.scaler.scale
        new_ts = TrainState(
            ts.step + 1, new_params, new_mstate, new_opt_state, new_scaler
        )
        return new_ts, metrics

    return train_step


def make_eval_step(hp):
    """Validation step: eval-mode forward + loss (reference train.py:122-147).

    Uses running batchnorm stats; the VAE returns mu (no sampling); prenet
    dropout stays ON, as in the reference's model.eval() semantics
    (F.dropout(training=True) ignores eval mode, model.py:101).
    """
    if hp.fp16_run:
        hp = hp.replace(compute_dtype="float16")

    def eval_step(ts: TrainState, batch, rng):
        out, _ = tacotron2.forward(
            ts.params, ts.model_state, batch, hp, train=False, rng=rng
        )
        total, aux = tacotron2_vae_loss(
            out, batch["mel"], batch["gate"], ts.step, hp
        )
        return total, aux, out

    return eval_step
