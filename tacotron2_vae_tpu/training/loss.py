"""Tacotron2-VAE loss with KL annealing.

Parity target: reference ``Tacotron2Loss_VAE`` (loss_function.py:6-45):
MSE(mel) + MSE(mel_postnet) + BCEWithLogits(gate) + kl_weight * KL,
with KL summed (not meaned) over batch and latent dims, and three anneal
schedules (logistic / linear / constant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_anneal_weight(anneal_function: str, lag, step, k, x0, upper):
    """KL weight schedule (loss_function.py:15-24). `step` may be traced."""
    step = jnp.asarray(step, jnp.float32)
    if anneal_function == "logistic":
        return upper / (upper + jnp.exp(-k * (step - x0)))
    if anneal_function == "linear":
        return jnp.where(step > lag, jnp.minimum(upper, step / x0), 0.0)
    if anneal_function == "constant":
        return jnp.asarray(0.001, jnp.float32)
    raise ValueError(f"unknown anneal_function {anneal_function!r}")


def bce_with_logits(logits, targets):
    """Numerically stable sigmoid cross-entropy, meaned."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def tacotron2_vae_loss(outputs, mel_target, gate_target, step, hp):
    """Returns (total, aux) with aux = dict(recon_loss, mel_loss, gate_loss,
    kl_loss, kl_weight) matching the reference's logged quantities."""
    mel_out = outputs.mel_outputs
    mel_post = outputs.mel_outputs_postnet
    gate_out = outputs.gate_outputs

    mel_loss = jnp.mean((mel_out - mel_target) ** 2) + jnp.mean(
        (mel_post - mel_target) ** 2
    )
    # Per-frame gate targets vs per-step logits: at n_frames_per_step=r>1
    # the decoder emits one gate per r-frame group — compare against the
    # target at each group's LAST frame (targets are 1 from the final real
    # frame on, data_utils.py:133, so the stop group still carries a 1).
    if gate_target.shape[1] != gate_out.shape[1]:
        r = gate_target.shape[1] // gate_out.shape[1]
        gate_target = gate_target[:, r - 1 :: r]
    gate_loss = bce_with_logits(gate_out.reshape(-1), gate_target.reshape(-1))

    kl_loss = -0.5 * jnp.sum(
        1.0 + outputs.logvar - outputs.mu ** 2 - jnp.exp(outputs.logvar)
    )
    kl_weight = kl_anneal_weight(
        hp.anneal_function, hp.anneal_lag, step, hp.anneal_k,
        hp.anneal_x0, hp.anneal_upper,
    )

    recon_loss = mel_loss + gate_loss
    total = recon_loss + kl_weight * kl_loss
    aux = {
        "recon_loss": recon_loss,
        "mel_loss": mel_loss,
        "gate_loss": gate_loss,
        "kl_loss": kl_loss,
        "kl_weight": kl_weight,
    }
    return total, aux
