"""Train state and the jitted train/eval steps.

Replaces the reference's torch Adam + clip_grad_norm loop body
(train.py:204-232) and the entire fp16 master-weights stack
(fp16_optimizer.py, loss_scaler.py): on TPU the matmuls run in bfloat16 —
which has fp32 exponent range — so no loss scaling is needed; parameters and
optimizer moments stay fp32.

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


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any
    model_state: Any           # batchnorm running stats
    opt_state: Any


def make_optimizer(hp, learning_rate=None):
    """torch.optim.Adam-equivalent chain with global-norm clipping."""
    lr = hp.learning_rate if learning_rate is None else learning_rate
    return optax.chain(
        optax.clip_by_global_norm(hp.grad_clip_thresh),
        optax.add_decayed_weights(hp.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def create_train_state(rng, hp, learning_rate=None) -> TrainState:
    params, model_state = tacotron2.init(rng, hp)
    opt = make_optimizer(hp, learning_rate)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=opt.init(params),
    )


def make_train_step(hp, learning_rate=None):
    """Returns a pure (state, batch, rng) -> (state, metrics) step function."""
    opt = make_optimizer(hp, learning_rate)

    def train_step(ts: TrainState, batch, rng):
        def loss_fn(params):
            out, new_mstate = tacotron2.forward(
                params, ts.model_state, batch, hp, train=True, rng=rng
            )
            total, aux = tacotron2_vae_loss(
                out, batch["mel"], batch["gate"], ts.step, hp
            )
            return total, (aux, new_mstate)

        (total, (aux, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = opt.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)

        # NaN guard (reference train.py:233 skips logging/stepping on overflow
        # via the fp16 path; here a non-finite loss skips the whole update).
        ok = jnp.isfinite(total)
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
        new_ts = TrainState(ts.step + 1, new_params, new_mstate, new_opt_state)
        return new_ts, metrics

    return train_step


def make_eval_step(hp):
    """Validation step: eval-mode forward + loss (reference train.py:122-147).

    Uses running batchnorm stats; the VAE returns mu (no sampling); prenet
    dropout stays ON, as in the reference's model.eval() semantics
    (F.dropout(training=True) ignores eval mode, model.py:101).
    """

    def eval_step(ts: TrainState, batch, rng):
        out, _ = tacotron2.forward(
            ts.params, ts.model_state, batch, hp, train=False, rng=rng
        )
        total, aux = tacotron2_vae_loss(
            out, batch["mel"], batch["gate"], ts.step, hp
        )
        return total, aux, out

    return eval_step
