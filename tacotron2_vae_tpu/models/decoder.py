"""Autoregressive attention decoder (location-sensitive attention + 2 LSTMs).

Parity targets: reference ``Decoder`` (model.py:206-464), ``Attention`` /
``LocationLayer`` (model.py:12-88), ``Prenet`` (model.py:91-102).

TPU-first restructuring (this is the hot path, reference model.py:346-389):

* Teacher-forced training runs as ONE ``lax.scan`` over time.  Everything
  that does not participate in the recurrence is hoisted out of the scan
  into large batched MXU matmuls: the prenet over all frames, the memory
  projection, and — because teacher forcing breaks the output->input feedback
  — the final mel/gate projections, computed post-scan on the stacked
  (B*T, 1536) hidden/context matrix.
* Autoregressive inference is a bounded ``lax.while_loop`` with gate-based
  early exit writing into preallocated buffers (static shapes for XLA).
* The prenet keeps dropout ON at inference (deliberate Tacotron2 trait,
  reference model.py:101) with explicit PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.layers import conv1d, conv1d_init, dropout, linear, linear_init
from ..ops.rnn import lstm_cell, lstm_init

PRENET_DROP = 0.5  # reference model.py:11,101


def init(key, hp):
    ks = jax.random.split(key, 10)
    enc_dim = hp.encoder_embedding_dim
    n_mel = hp.n_mel_channels * hp.n_frames_per_step
    return {
        "prenet": [
            linear_init(ks[0], n_mel, hp.prenet_dim, bias=False),
            linear_init(ks[1], hp.prenet_dim, hp.prenet_dim, bias=False),
        ],
        "attention_rnn": lstm_init(
            ks[2], hp.prenet_dim + enc_dim, hp.attention_rnn_dim
        ),
        "attention": {
            "query": linear_init(
                ks[3], hp.attention_rnn_dim, hp.attention_dim,
                bias=False, w_init_gain="tanh",
            ),
            "memory": linear_init(
                ks[4], enc_dim, hp.attention_dim, bias=False, w_init_gain="tanh"
            ),
            "v": linear_init(ks[5], hp.attention_dim, 1, bias=False),
            "loc_conv": conv1d_init(
                ks[6], 2, hp.attention_location_n_filters,
                hp.attention_location_kernel_size, bias=False,
            ),
            "loc_dense": linear_init(
                ks[7], hp.attention_location_n_filters, hp.attention_dim,
                bias=False, w_init_gain="tanh",
            ),
        },
        "decoder_rnn": lstm_init(
            ks[8], hp.attention_rnn_dim + enc_dim, hp.decoder_rnn_dim
        ),
        "proj": linear_init(
            jax.random.split(ks[9])[0], hp.decoder_rnn_dim + enc_dim, n_mel
        ),
        "gate": linear_init(
            jax.random.split(ks[9])[1], hp.decoder_rnn_dim + enc_dim, 1,
            w_init_gain="sigmoid",
        ),
    }


def prenet(params, x, rng, dropout_enabled: bool = True, dtype=None):
    """2x (linear -> relu -> dropout 0.5); dropout is always on by default."""
    for i, lp in enumerate(params):
        rng, sub = jax.random.split(rng)
        x = jax.nn.relu(linear(lp, x, dtype=dtype))
        x = dropout(sub, x, PRENET_DROP, enabled=dropout_enabled)
    return x


def group_frames(mels: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, n_mel, T) -> (B, T//r, r*n_mel) frame groups (T divisible by r).

    With ``n_frames_per_step = r > 1`` the decoder consumes/emits r mel
    frames per step (the reference only plumbs r through its layer dims and
    declares r>1 unsupported, hparams.py:87 — here it is fully supported:
    the scan shortens to T/r steps, a large training-throughput lever since
    the sequential scan dominates the step time)."""
    B, n_mel, T = mels.shape
    if T % r != 0:
        raise ValueError(
            f"mel length T={T} must be a multiple of n_frames_per_step={r} "
            "(data.dataset.collate pads to this)"
        )
    return jnp.swapaxes(mels, 1, 2).reshape(B, T // r, r * n_mel)


def ungroup_mel(mel_out: jnp.ndarray, n_mel: int, r: int) -> jnp.ndarray:
    """(Tg, B, r*n_mel) time-major groups -> (B, n_mel, Tg*r) frames."""
    Tg, B, _ = mel_out.shape
    g = mel_out.reshape(Tg, B, r, n_mel)
    return jnp.transpose(g, (1, 3, 0, 2)).reshape(B, n_mel, Tg * r)


class DecoderState(NamedTuple):
    h_att: jnp.ndarray  # (B, attention_rnn_dim)
    c_att: jnp.ndarray
    h_dec: jnp.ndarray  # (B, decoder_rnn_dim)
    c_dec: jnp.ndarray
    attn_w: jnp.ndarray      # (B, S)
    attn_w_cum: jnp.ndarray  # (B, S)
    context: jnp.ndarray     # (B, enc_dim)


def initial_state(memory: jnp.ndarray, hp) -> DecoderState:
    B, S, enc_dim = memory.shape
    z = lambda *shape: jnp.zeros(shape, jnp.float32)
    return DecoderState(
        h_att=z(B, hp.attention_rnn_dim), c_att=z(B, hp.attention_rnn_dim),
        h_dec=z(B, hp.decoder_rnn_dim), c_dec=z(B, hp.decoder_rnn_dim),
        attn_w=z(B, S), attn_w_cum=z(B, S), context=z(B, enc_dim),
    )


def _attend(ap, h_att, memory, processed_memory, attn_w, attn_w_cum,
            mask, dtype=None):
    """Location-sensitive additive attention (reference model.py:45-88)."""
    q = linear(ap["query"], h_att, dtype=dtype)  # (B, A)
    loc_feats = jnp.stack([attn_w, attn_w_cum], axis=-1)  # (B, S, 2)
    loc = conv1d(ap["loc_conv"], loc_feats, padding="SAME", dtype=dtype)
    loc = linear(ap["loc_dense"], loc, dtype=dtype)  # (B, S, A)
    energies = linear(
        ap["v"], jnp.tanh(q[:, None, :] + loc + processed_memory), dtype=dtype
    )[..., 0]  # (B, S)
    if mask is not None:
        energies = jnp.where(mask, energies, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(energies, axis=1)
    context = jnp.einsum(
        "bs,bsd->bd", weights, memory, preferred_element_type=jnp.float32
    )
    return context, weights


def decode_step(params, state: DecoderState, prenet_out, memory,
                processed_memory, mask, *, train: bool, rng,
                p_attention_dropout: float, p_decoder_dropout: float,
                dtype=None):
    """One decoder step (reference ``Decoder.decode``, model.py:346-389).

    Returns (new_state, (h_dec, context)) — mel/gate projection is the
    caller's job (hoisted out for MXU efficiency).
    """
    cell_input = jnp.concatenate([prenet_out, state.context], axis=-1)
    h_att, c_att = lstm_cell(
        params["attention_rnn"], cell_input, state.h_att, state.c_att, dtype=dtype
    )
    if train and p_attention_dropout > 0:
        rng, k1, k2 = jax.random.split(rng, 3)
        h_att = dropout(k1, h_att, p_attention_dropout)
        c_att = dropout(k2, c_att, p_attention_dropout)

    context, attn_w = _attend(
        params["attention"], h_att, memory, processed_memory,
        state.attn_w, state.attn_w_cum, mask, dtype=dtype,
    )
    attn_w_cum = state.attn_w_cum + attn_w

    dec_input = jnp.concatenate([h_att, context], axis=-1)
    h_dec, c_dec = lstm_cell(
        params["decoder_rnn"], dec_input, state.h_dec, state.c_dec, dtype=dtype
    )
    if train and p_decoder_dropout > 0:
        rng, k1, k2 = jax.random.split(rng, 3)
        h_dec = dropout(k1, h_dec, p_decoder_dropout)
        c_dec = dropout(k2, c_dec, p_decoder_dropout)

    new_state = DecoderState(h_att, c_att, h_dec, c_dec, attn_w, attn_w_cum, context)
    return new_state, (h_dec, context, attn_w)


def teacher_forced(params, memory, mels, memory_lengths, hp, *,
                   train: bool, rng, dtype=None,
                   prenet_dropout_enabled: bool = True,
                   unroll: int = 1, remat: bool = False):
    """Teacher-forced decoding (reference ``Decoder.forward``, model.py:391-426).

    memory: (B, S, enc_dim); mels: (B, n_mel, T) ground truth, T divisible
    by r = hp.n_frames_per_step.
    Returns (mel_outputs (B, n_mel, T), gate (B, T/r), alignments
    (B, T/r, S)) — gate/alignments are per decoder step (= per r-frame
    group; identical to per-frame at the default r=1).
    """
    B, S, _ = memory.shape
    T = mels.shape[2]
    n_mel = hp.n_mel_channels
    r = hp.n_frames_per_step

    # Hoisted, batched prenet over [go, group_0 .. group_{Tg-2}].
    groups = group_frames(mels, r)  # (B, Tg, r*n_mel)
    decoder_inputs = jnp.concatenate(
        [jnp.zeros((B, 1, r * n_mel), groups.dtype), groups[:, :-1]], axis=1
    )
    rng, pk = jax.random.split(rng)
    prenet_out = prenet(
        params["prenet"], decoder_inputs, pk,
        dropout_enabled=prenet_dropout_enabled, dtype=dtype,
    )  # (B, T, prenet_dim)

    processed_memory = linear(params["attention"]["memory"], memory, dtype=dtype)
    mask = None
    if memory_lengths is not None:
        mask = jnp.arange(S)[None, :] < memory_lengths[:, None]

    step_keys = jax.random.split(rng, T // r)

    def step(state, inp):
        pn_t, key_t = inp
        new_state, ys = decode_step(
            params, state, pn_t, memory, processed_memory, mask,
            train=train, rng=key_t,
            p_attention_dropout=hp.p_attention_dropout,
            p_decoder_dropout=hp.p_decoder_dropout, dtype=dtype,
        )
        return new_state, ys

    if remat:
        step = jax.checkpoint(step)
    _, (h_dec, context, attn_w) = jax.lax.scan(
        step, initial_state(memory, hp),
        (jnp.swapaxes(prenet_out, 0, 1), step_keys),
        unroll=unroll,
    )
    # h_dec/context: (Tg, B, *) -> batched output projection on the MXU.
    hidden_ctx = jnp.concatenate([h_dec, context], axis=-1)  # (Tg, B, 1536)
    mel_out = linear(params["proj"], hidden_ctx, dtype=dtype)  # (Tg, B, r*n_mel)
    gate_out = linear(params["gate"], hidden_ctx, dtype=dtype)[..., 0]  # (Tg, B)

    mel_outputs = ungroup_mel(mel_out, n_mel, r)  # (B, n_mel, T)
    gate_outputs = jnp.swapaxes(gate_out, 0, 1)  # (B, Tg)
    alignments = jnp.swapaxes(attn_w, 0, 1)  # (B, Tg, S)
    return mel_outputs, gate_outputs, alignments


def infer(params, memory, hp, *, rng, max_steps=None, gate_threshold=None,
          dtype=None, prenet_dropout_enabled: bool = True,
          memory_lengths=None, use_pallas: bool | None = None):
    """Autoregressive inference (reference ``Decoder.inference``,
    model.py:428-464) as a bounded while_loop with gate early exit.

    Returns (mel (B, n_mel, max_steps*r), gate (B, max_steps),
    alignments (B, max_steps, S), lengths (B,)) — frames beyond an item's
    stop step are zeros; `lengths` counts FRAMES and includes the full
    group in which the gate fired.  max_steps counts decoder steps (each
    emits r = hp.n_frames_per_step frames); gate/alignments are per step.
    """
    B, S, _ = memory.shape
    n_mel = hp.n_mel_channels
    r = hp.n_frames_per_step
    max_steps = max_steps or hp.max_decoder_steps
    gate_threshold = gate_threshold or hp.gate_threshold

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and B == 1:
        from ..ops.pallas import decoder_loop as _dl

        kw = _dl.prepare_weights(params, dtype=dtype or jnp.float32)
        pmem = linear(params["attention"]["memory"], memory)
        mask = None
        if memory_lengths is not None:
            mask = jnp.arange(S)[None, :] < memory_lengths[:, None]
        seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
        return _dl.decode_loop(
            kw, memory, pmem, mask,
            max_steps=max_steps, gate_threshold=float(gate_threshold),
            seed=seed, dropout_on=prenet_dropout_enabled,
            dtype_name=jnp.dtype(dtype or jnp.float32).name, r=r,
        )
    if use_pallas and B > 1:
        from ..ops.pallas import decoder_loop as _dl

        dt = jnp.dtype(dtype or jnp.float32)
        if _dl.batched_decode_supported(
            B, S, hp.attention_dim, memory.shape[2], hp.attention_rnn_dim,
            dt.itemsize,
        ):
            pmem = linear(params["attention"]["memory"], memory)
            mask = None
            if memory_lengths is not None:
                mask = jnp.arange(S)[None, :] < memory_lengths[:, None]
            seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1)
            return _dl.decode_loop_batched(
                params, memory, pmem, mask,
                max_steps=max_steps, gate_threshold=float(gate_threshold),
                seed=seed, dropout_on=prenet_dropout_enabled,
                dtype_name=dt.name, r=r,
            )

    processed_memory = linear(params["attention"]["memory"], memory, dtype=dtype)
    mask = None
    if memory_lengths is not None:
        mask = jnp.arange(S)[None, :] < memory_lengths[:, None]

    mel_buf = jnp.zeros((max_steps, B, r * n_mel), jnp.float32)
    gate_buf = jnp.zeros((max_steps, B), jnp.float32)
    align_buf = jnp.zeros((max_steps, B, S), jnp.float32)
    finished0 = jnp.zeros((B,), bool)
    prev_frame0 = jnp.zeros((B, r * n_mel), jnp.float32)

    def cond(carry):
        t, _, _, finished, _, _, _ = carry
        return jnp.logical_and(t < max_steps, ~jnp.all(finished))

    def body(carry):
        t, state, prev_frame, finished, mel_buf, gate_buf, align_buf = carry
        key_t = jax.random.fold_in(rng, t)
        k_pre, k_step = jax.random.split(key_t)
        pn = prenet(
            params["prenet"], prev_frame, k_pre,
            dropout_enabled=prenet_dropout_enabled, dtype=dtype,
        )
        state, (h_dec, context, attn_w) = decode_step(
            params, state, pn, memory, processed_memory, mask,
            train=False, rng=k_step,
            p_attention_dropout=hp.p_attention_dropout,
            p_decoder_dropout=hp.p_decoder_dropout, dtype=dtype,
        )
        hidden_ctx = jnp.concatenate([h_dec, context], axis=-1)
        mel_t = linear(params["proj"], hidden_ctx, dtype=dtype)
        gate_t = linear(params["gate"], hidden_ctx, dtype=dtype)[..., 0]

        active = ~finished
        mel_buf = mel_buf.at[t].set(jnp.where(active[:, None], mel_t, 0.0))
        gate_buf = gate_buf.at[t].set(jnp.where(active, gate_t, 0.0))
        align_buf = align_buf.at[t].set(jnp.where(active[:, None], attn_w, 0.0))

        finished = finished | (jax.nn.sigmoid(gate_t) > gate_threshold)
        return (t + 1, state, mel_t, finished, mel_buf, gate_buf, align_buf)

    t, _, _, finished, mel_buf, gate_buf, align_buf = jax.lax.while_loop(
        cond, body,
        (0, initial_state(memory, hp), prev_frame0, finished0,
         mel_buf, gate_buf, align_buf),
    )

    # Per-item length: first step whose gate fired (inclusive), else t;
    # reported in frames (r per step).
    fired = jax.nn.sigmoid(gate_buf) > gate_threshold  # (max_steps, B)
    any_fired = jnp.any(fired, axis=0)
    first_fire = jnp.argmax(fired, axis=0)
    lengths = jnp.where(any_fired, first_fire + 1, t) * r

    return (
        ungroup_mel(mel_buf, n_mel, r),
        jnp.swapaxes(gate_buf, 0, 1),
        jnp.transpose(align_buf, (1, 0, 2)),
        lengths,
    )
