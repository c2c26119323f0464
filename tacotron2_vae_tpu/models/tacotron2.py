"""Tacotron2-VAE top-level model (pure-functional JAX).

Parity target: reference ``Tacotron2`` (model.py:467-547).  Composition:
symbol embedding -> transcript encoder -> (+ broadcast VAE-GST prosody
embedding) -> attention decoder -> postnet residual, with output masking
identical to reference ``parse_output`` (model.py:509-520).

Params/state are nested dicts; all forward fns are jit-able with static
shapes.  ``speaker_embedding``/``emotion_embedding`` are initialized for
checkpoint parity but, exactly like the reference (model.py:476-479), never
used in the forward pass — emotion one-hots pass through for logging.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import embedding, embedding_init, linear, linear_init
from . import decoder as decoder_mod
from . import encoder as encoder_mod
from . import postnet as postnet_mod
from . import vae_gst as vae_mod


class Tacotron2Output(NamedTuple):
    """Reference output list order (model.py:546)."""

    mel_outputs: jnp.ndarray          # (B, n_mel, T)
    mel_outputs_postnet: jnp.ndarray  # (B, n_mel, T)
    gate_outputs: jnp.ndarray         # (B, T)
    alignments: jnp.ndarray           # (B, T, S)
    mu: jnp.ndarray                   # (B, z)
    logvar: jnp.ndarray               # (B, z)
    z: jnp.ndarray                    # (B, z)
    emotions: jnp.ndarray             # pass-through one-hots


def init(key, hp) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    k_emb, k_spk, k_emo, k_enc, k_dec, k_post, k_vae = jax.random.split(key, 7)
    enc_p, enc_s = encoder_mod.init(k_enc, hp)
    post_p, post_s = postnet_mod.init(k_post, hp)
    vae_p, vae_s = vae_mod.init(k_vae, hp)
    params = {
        "embedding": embedding_init(k_emb, hp.n_symbols, hp.symbols_embedding_dim),
        "speaker_embedding": linear_init(
            k_spk, hp.n_speakers, hp.speaker_embedding_dim, w_init_gain="tanh"
        ),
        "emotion_embedding": linear_init(
            k_emo, hp.n_emotions, hp.emotion_embedding_dim, w_init_gain="tanh"
        ),
        "encoder": enc_p,
        "decoder": decoder_mod.init(k_dec, hp),
        "postnet": post_p,
        "vae_gst": vae_p,
    }
    state = {"encoder": enc_s, "postnet": post_s, "vae_gst": vae_s}
    return params, state


def _mask_outputs(mel, mel_postnet, gate, output_lengths, n_mel):
    """Zero padded mel frames; set padded gate energies to 1e3
    (reference parse_output, model.py:509-520).

    gate is per decoder step — (B, T) at n_frames_per_step=1, (B, T/r)
    otherwise; a step is padded iff its first frame is past the length."""
    if output_lengths is None:
        return mel, mel_postnet, gate
    T = mel.shape[2]
    r = T // gate.shape[1]
    valid = jnp.arange(T)[None, :] < output_lengths[:, None]  # (B, T)
    mel = jnp.where(valid[:, None, :], mel, 0.0)
    mel_postnet = jnp.where(valid[:, None, :], mel_postnet, 0.0)
    valid_step = (jnp.arange(gate.shape[1]) * r)[None, :] < output_lengths[:, None]
    gate = jnp.where(valid_step, gate, 1e3)
    return mel, mel_postnet, gate


def forward(
    params,
    state,
    batch: Dict[str, jnp.ndarray],
    hp,
    *,
    train: bool,
    rng,
    prenet_dropout_enabled: bool = True,
) -> Tuple[Tacotron2Output, Dict[str, Any]]:
    """Teacher-forced forward (reference model.py:522-547).

    batch keys: text (B, S) int32, input_lengths (B,), mel (B, n_mel, T),
    output_lengths (B,), speakers, emotions.

    prenet_dropout_enabled=False disables the always-on prenet dropout for
    deterministic parity testing (reference keeps it on, model.py:101).
    """
    dtype = jnp.dtype(hp.compute_dtype) if hp.compute_dtype != "float32" else None
    r_enc, r_vae, r_dec, r_post = jax.random.split(rng, 4)

    embedded = embedding(params["embedding"], batch["text"])  # (B, S, D)
    transcript, enc_state = encoder_mod.apply(
        params["encoder"], state["encoder"], embedded,
        batch["input_lengths"], train=train, rng=r_enc, dtype=dtype,
    )

    (prosody, mu, logvar, z), vae_state = vae_mod.apply(
        params["vae_gst"], state["vae_gst"], batch["mel"],
        train=train, rng=r_vae, dtype=dtype,
        raw_reshape=getattr(hp, "ref_enc_raw_reshape", False),
    )
    memory = transcript + prosody[:, None, :]  # broadcast add (model.py:535-537)

    if hp.decoder_scan_dtype == "auto":
        # Measured regimes on v5e (see decoder_bptt._recompute_attn): large
        # B*S scans are HBM-bound and want bf16 streams; small XLA scans
        # are latency-bound and the casts only add per-step ops.  When the
        # Pallas training-scan kernels will engage, bf16 wins at EVERY
        # batch size (B=6: 27.5 vs 28.0 ms, B=1: 23.2 vs 24.0) AND halves
        # the VMEM weight pin, so small batches get bf16 too.
        B, S = batch["text"].shape
        from . import decoder_bptt

        use_bf16 = hp.compute_dtype != "float32" and (
            B * S >= 2048
            or (hp.use_custom_bptt
                and decoder_bptt.pallas_train_scan_will_engage(hp, B, S, 2))
        )
        scan_dtype = jnp.dtype(hp.compute_dtype) if use_bf16 else None
    else:
        scan_dtype = (
            None if hp.decoder_scan_dtype == "float32"
            else jnp.dtype(hp.decoder_scan_dtype)
        )
    if hp.use_custom_bptt:
        from . import decoder_bptt

        mel_outputs, gate_outputs, alignments = decoder_bptt.teacher_forced(
            params["decoder"], memory, batch["mel"], batch["input_lengths"],
            hp, train=train, rng=r_dec, dtype=scan_dtype,
            prenet_dropout_enabled=prenet_dropout_enabled,
        )
    else:
        mel_outputs, gate_outputs, alignments = decoder_mod.teacher_forced(
            params["decoder"], memory, batch["mel"], batch["input_lengths"],
            hp, train=train, rng=r_dec, dtype=dtype,
            prenet_dropout_enabled=prenet_dropout_enabled,
        )

    residual, post_state = postnet_mod.apply(
        params["postnet"], state["postnet"], mel_outputs,
        train=train, rng=r_post, dtype=dtype,
    )
    mel_outputs_postnet = mel_outputs + residual

    if hp.mask_padding:
        mel_outputs, mel_outputs_postnet, gate_outputs = _mask_outputs(
            mel_outputs, mel_outputs_postnet, gate_outputs,
            batch.get("output_lengths"), hp.n_mel_channels,
        )

    out = Tacotron2Output(
        mel_outputs, mel_outputs_postnet, gate_outputs, alignments,
        mu, logvar, z, batch.get("emotions", jnp.zeros((embedded.shape[0], 0))),
    )
    new_state = {"encoder": enc_state, "postnet": post_state, "vae_gst": vae_state}
    return out, new_state


def infer(
    params,
    state,
    text: jnp.ndarray,
    style_embed: jnp.ndarray,
    hp,
    *,
    rng,
    max_steps: int | None = None,
    gate_threshold: float | None = None,
    prenet_dropout_enabled: bool = True,
    use_pallas: bool | None = None,
    text_lengths=None,
):
    """Autoregressive synthesis from token ids + a style embedding.

    Mirrors the reference serving path (synthesizer.py:112-159): encoder
    inference, style broadcast-add, decoder loop, postnet.  Passing
    `text_lengths` masks the encoder BiLSTM and the attention over padded
    positions, so text can be bucket-padded to a few static lengths (one XLA
    compilation per bucket instead of one per utterance).
    Returns (mel, mel_postnet, gate, alignments, lengths).
    """
    dtype = jnp.dtype(hp.compute_dtype) if hp.compute_dtype != "float32" else None
    r_enc, r_dec, r_post = jax.random.split(rng, 3)

    embedded = embedding(params["embedding"], text)
    transcript, _ = encoder_mod.apply(
        params["encoder"], state["encoder"], embedded, text_lengths,
        train=False, rng=r_enc, dtype=dtype, mask_conv_inputs=True,
    )
    if style_embed.ndim == 1:
        style_embed = style_embed[None]
    memory = transcript + style_embed[:, None, :]

    mel, gate, align, lengths = decoder_mod.infer(
        params["decoder"], memory, hp, rng=r_dec,
        max_steps=max_steps, gate_threshold=gate_threshold, dtype=dtype,
        prenet_dropout_enabled=prenet_dropout_enabled, use_pallas=use_pallas,
        memory_lengths=text_lengths,
    )
    residual, _ = postnet_mod.apply(
        params["postnet"], state["postnet"], mel, train=False, rng=r_post,
        dtype=dtype,
    )
    return mel, mel + residual, gate, align, lengths
