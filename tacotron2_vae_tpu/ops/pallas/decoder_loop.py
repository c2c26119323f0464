"""Fused autoregressive decode loop as a single Pallas TPU kernel.

The entire batch-1 inference loop (reference model.py:428-464 /
synthesizer.py:135-154 — prenet -> attention LSTM -> location-sensitive
attention -> decoder LSTM -> mel/gate projection, looped until the gate
fires) runs inside ONE kernel invocation:

  * every weight matrix is pinned in VMEM for the whole decode (v5e has
    128 MiB VMEM; the full-size decoder is ~36 MB in bf16), so each step
    costs compute + VPU latency instead of re-streaming weights from HBM —
    the XLA while_loop path measures ~87 us/step on a v5e;
  * the location conv (k=31 over [prev, cum] attention weights) runs in
    transposed (channels, S) orientation as 31 lane-rolls + tiny K=2 MXU
    matmuls accumulated into an (F, S) tile — no runtime transposes, no
    offset-slice concats (which Mosaic rejects);
  * row<->column vector flips go through the MXU via a ones-(1,1) matmul;
  * prenet dropout (always on at inference, reference model.py:101) uses the
    on-core PRNG (pltpu.prng_random_bits);
  * the gate early-exit is a lax.while_loop inside the kernel; output
    buffers are zero-initialized and written with dynamic stores.

``decode_loop`` is the B=1 serving kernel.  ``decode_loop_batched`` (round
4) extends the fused decode to 1 < B <= 8 concurrent streams for the
serving micro-batch queue (serving/app.py): it swaps the B=1 transposed
attention orientation for the training-scan kernel's batched layout
(teacher_fwd.py — banded-Toeplitz location matmul into (B, S*A), energies
via kron(I_S, v), context via a block-diagonal-masked tile matmul) and
exits as soon as EVERY row's gate has fired.  Callers fall back to the XLA
while_loop beyond the supported (B, S) envelope
(``batched_decode_supported``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOC_K = 31  # attention_location_kernel_size
LOC_PAD = (LOC_K - 1) // 2


def prepare_weights(dec_params, dtype=jnp.bfloat16):
    """Host-side packing of decoder params for the kernel.

    Combines the two LSTM biases, lays attention weights out for the
    transposed in-kernel formulation: loc conv as (62, F) rows of (dk, c),
    loc_dense transposed to (A, F), v as a (1, A) row.
    """
    att = dec_params["attention"]
    loc_w = att["loc_conv"]["w"]  # (31, 2, F)
    F = loc_w.shape[-1]
    loc_patch = loc_w.reshape(LOC_K * 2, F)  # row = dk*2 + channel

    def cast(x):
        return jnp.asarray(x, dtype)

    # Fuse input+hidden projections into one matmul per LSTM, and mel+gate
    # into one output projection.
    attn_w_full = jnp.concatenate(
        [dec_params["attention_rnn"]["wi"], dec_params["attention_rnn"]["wh"]],
        axis=0,
    )  # (P+E+H, 4H)
    dec_w_full = jnp.concatenate(
        [dec_params["decoder_rnn"]["wi"], dec_params["decoder_rnn"]["wh"]],
        axis=0,
    )  # (H+E+H, 4H)
    proj_gate_w = jnp.concatenate(
        [dec_params["proj"]["w"], dec_params["gate"]["w"]], axis=1
    )  # (H+E, n_mel+1)
    proj_gate_b = jnp.concatenate(
        [dec_params["proj"]["b"], dec_params["gate"]["b"]]
    )  # (n_mel+1,)

    return {
        "prenet_w1": cast(dec_params["prenet"][0]["w"]),  # (80, P)
        "prenet_w2": cast(dec_params["prenet"][1]["w"]),  # (P, P)
        "attn_w": cast(attn_w_full),
        "attn_b": jnp.asarray(
            dec_params["attention_rnn"]["bi"] + dec_params["attention_rnn"]["bh"],
            jnp.float32,
        )[None, :],
        "dec_w": cast(dec_w_full),
        "dec_b": jnp.asarray(
            dec_params["decoder_rnn"]["bi"] + dec_params["decoder_rnn"]["bh"],
            jnp.float32,
        )[None, :],
        "query_w": cast(dec_params["attention"]["query"]["w"]),  # (H, A)
        "loc_patch_w": cast(loc_patch),  # (62, F)
        "loc_dense_wT": cast(att["loc_dense"]["w"].T),  # (A, F)
        "v_row": cast(att["v"]["w"].T),  # (1, A)
        "proj_gate_w": cast(proj_gate_w),
        "proj_gate_b": jnp.asarray(proj_gate_b, jnp.float32)[None, :],
        # kept for API compatibility with callers that inspect shapes
        "proj_w": cast(dec_params["proj"]["w"]),
    }


def _row_to_col(x):
    """(1, N) -> (N, 1) through the MXU (contract the size-1 row dim)."""
    ones = jnp.ones((1, 1), jnp.float32)
    return jax.lax.dot_general(
        x.astype(jnp.float32), ones, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    dropout_on,   # static (bound via functools.partial)
    # scalar prefetch
    scalars_ref,  # SMEM (4,): [max_steps, seed, S, unused]
    # inputs (VMEM unless noted)
    memory_ref,        # (S, E)
    pmemT_ref,         # (A, S) processed memory, transposed
    mask_ref,          # (1, S) additive mask (0 valid / -inf invalid)
    prenet_w1_ref, prenet_w2_ref,
    attn_w_ref, attn_b_ref,
    dec_w_ref, dec_b_ref,
    query_w_ref, loc_patch_w_ref, loc_dense_wT_ref, v_row_ref,
    proj_gate_w_ref, proj_gate_b_ref,
    gate_threshold_ref,  # SMEM (1, 1) float32
    # outputs
    mel_out_ref,    # (max_steps, n_mel) VMEM
    gate_out_ref,   # (max_steps, 128) VMEM (col 0 is the logit)
    align_out_ref,  # (max_steps, S) VMEM
    steps_out_ref,  # SMEM (1,) int32
    # scratch
    patches_ref,    # (64, S) VMEM — location-conv patch matrix staging
):
    max_steps = scalars_ref[0]
    seed = scalars_ref[1]
    gate_threshold = gate_threshold_ref[0, 0]

    S = memory_ref.shape[0]
    E = memory_ref.shape[1]
    H4 = attn_w_ref.shape[1]
    H = H4 // 4
    n_mel = mel_out_ref.shape[1]
    F = loc_patch_w_ref.shape[1]

    if dropout_on:
        pltpu.prng_seed(seed)

    mel_out_ref[:] = jnp.zeros_like(mel_out_ref)
    gate_out_ref[:] = jnp.zeros_like(gate_out_ref)
    align_out_ref[:] = jnp.zeros_like(align_out_ref)

    io_dtype = memory_ref.dtype
    memory = memory_ref[:]                        # (S, E)
    pmemT = pmemT_ref[:].astype(jnp.float32)      # (A, S)
    mask = mask_ref[:]                            # (1, S)

    def dropout_keep(x):
        if not dropout_on:
            return x
        bits = pltpu.prng_random_bits(x.shape)
        keep = (bits.astype(jnp.uint32) < jnp.uint32(2147483648)).astype(
            jnp.float32
        )
        return x * keep * 2.0

    def lstm(xh_cat, w_ref, b, c):
        """xh_cat = concat([inputs, h]) -> fused single-matmul LSTM step."""
        gates = (
            jnp.dot(xh_cat, w_ref[:], preferred_element_type=jnp.float32) + b
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def location_term(attn_w, attn_cum):
        """[prev; cum] (2, S) -> loc_dense(loc_conv(.)) transposed: (A, S)."""
        x = jnp.concatenate([attn_w, attn_cum], axis=0)  # (2, S)
        x = jnp.pad(x, ((0, 0), (LOC_PAD, LOC_PAD)))     # (2, S + 30)
        L = x.shape[1]
        # Patch matrix (62, S): row (dk*2 + c) = x[c, dk : dk + S].  Rolled
        # slices carry lane-offset layouts Mosaic can't concat, so stage them
        # through a VMEM scratch (stores force materialization), then do ONE
        # (62, F)^T x (62, S) MXU matmul.
        for dk in range(LOC_K):
            rolled = pltpu.roll(x, shift=(L - dk) % L, axis=1)[:, :S]
            patches_ref[2 * dk : 2 * dk + 2, :] = rolled.astype(
                patches_ref.dtype
            )
        patches = patches_ref[: 2 * LOC_K, :]
        acc = jax.lax.dot_general(
            loc_patch_w_ref[:], patches, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.dot(loc_dense_wT_ref[:], acc.astype(io_dtype),
                       preferred_element_type=jnp.float32)  # (A, S)

    def cond(carry):
        t, finished = carry[0], carry[1]
        return jnp.logical_and(t < max_steps, jnp.logical_not(finished))

    def body(carry):
        (t, finished, prev_mel, h_att, c_att, h_dec, c_dec,
         attn_w, attn_cum, context) = carry

        # Prenet (2x linear+relu+dropout).
        x = jnp.maximum(
            jnp.dot(prev_mel.astype(io_dtype), prenet_w1_ref[:],
                    preferred_element_type=jnp.float32), 0.0)
        x = dropout_keep(x)
        x = jnp.maximum(
            jnp.dot(x.astype(io_dtype), prenet_w2_ref[:],
                    preferred_element_type=jnp.float32), 0.0)
        x = dropout_keep(x)

        # Attention LSTM (input and hidden projections fused).
        cell_in = jnp.concatenate([x, context, h_att], axis=1).astype(io_dtype)
        h_att_new, c_att_new = lstm(cell_in, attn_w_ref, attn_b_ref[:], c_att)

        # Location-sensitive additive attention, transposed orientation.
        locT = location_term(attn_w, attn_cum)  # (A, S)
        q = jnp.dot(h_att_new.astype(io_dtype), query_w_ref[:],
                    preferred_element_type=jnp.float32)  # (1, A)
        q_col = _row_to_col(q)  # (A, 1)
        pre = jnp.tanh(q_col + locT + pmemT)  # (A, S)
        energies = jnp.dot(v_row_ref[:], pre.astype(io_dtype),
                           preferred_element_type=jnp.float32)  # (1, S)
        energies = energies + mask
        emax = jnp.max(energies, axis=1, keepdims=True)
        ex = jnp.exp(energies - emax)
        w = ex / jnp.sum(ex, axis=1, keepdims=True)  # (1, S)

        context_new = jnp.dot(w.astype(io_dtype), memory,
                              preferred_element_type=jnp.float32)  # (1, E)
        attn_cum_new = attn_cum + w

        # Decoder LSTM (fused), then fused mel+gate projection.
        dec_in = jnp.concatenate(
            [h_att_new, context_new, h_dec], axis=1
        ).astype(io_dtype)
        h_dec_new, c_dec_new = lstm(dec_in, dec_w_ref, dec_b_ref[:], c_dec)

        hc = jnp.concatenate([h_dec_new, context_new], axis=1).astype(io_dtype)
        out_t = (
            jnp.dot(hc, proj_gate_w_ref[:], preferred_element_type=jnp.float32)
            + proj_gate_b_ref[:]
        )  # (1, n_mel + 1)
        mel_t = out_t[:, :n_mel]
        gate_t = out_t[0, n_mel]

        mel_out_ref[pl.ds(t, 1), :] = mel_t
        gate_row = jnp.full((1, gate_out_ref.shape[1]), gate_t, jnp.float32)
        gate_out_ref[pl.ds(t, 1), :] = gate_row
        align_out_ref[pl.ds(t, 1), :] = w

        finished_new = jax.nn.sigmoid(gate_t) > gate_threshold
        return (t + 1, finished_new, mel_t, h_att_new, c_att_new,
                h_dec_new, c_dec_new, w, attn_cum_new, context_new)

    init = (
        jnp.int32(0),
        jnp.bool_(False),
        jnp.zeros((1, n_mel), jnp.float32),
        jnp.zeros((1, H), jnp.float32),
        jnp.zeros((1, H), jnp.float32),
        jnp.zeros((1, H), jnp.float32),
        jnp.zeros((1, H), jnp.float32),
        jnp.zeros((1, S), jnp.float32),
        jnp.zeros((1, S), jnp.float32),
        jnp.zeros((1, E), jnp.float32),
    )
    final = jax.lax.while_loop(cond, body, init)
    steps_out_ref[0] = final[0]


@functools.partial(
    jax.jit,
    static_argnames=("max_steps", "interpret", "dtype_name", "dropout_on",
                     "r"),
)
def decode_loop(
    kernel_weights,
    memory,            # (1, S, E)
    processed_memory,  # (1, S, A)
    mask,              # (1, S) bool, or None for all-valid
    *,
    max_steps: int,
    gate_threshold: float,
    seed,
    dropout_on: bool = True,
    interpret: bool = False,
    dtype_name: str = "bfloat16",
    r: int = 1,
):
    """Run the fused decode loop. Returns (mel (1, n_mel, max_steps*r),
    gate (1, max_steps), align (1, max_steps, S), lengths (1,) in FRAMES) —
    the decoder.infer contract.  With ``n_frames_per_step = r > 1`` each
    kernel step emits r frames through the widened projection (the kernel
    body is r-agnostic: every dimension is read off the weight shapes) and
    the mel rows are ungrouped here, outside the kernel (Mosaic has no
    general reshape)."""
    dtype = jnp.dtype(dtype_name)
    S = memory.shape[1]
    # proj emits r*n_mel lanes per step; the kernel treats that as one row
    n_mel = kernel_weights["proj_w"].shape[1]

    mem = memory[0].astype(dtype)
    pmemT = processed_memory[0].T.astype(dtype)  # (A, S)
    add_mask = jnp.where(
        mask[0] if mask is not None else jnp.ones((S,), bool),
        0.0, jnp.float32(np.finfo(np.float32).min)
    )[None, :]

    scalars = jnp.asarray(
        [max_steps, jnp.asarray(seed, jnp.int32), S, 0], jnp.int32
    )
    gate_thr = jnp.asarray([[gate_threshold]], jnp.float32)

    kw = kernel_weights
    inputs = (
        mem, pmemT, add_mask,
        kw["prenet_w1"].astype(dtype), kw["prenet_w2"].astype(dtype),
        kw["attn_w"].astype(dtype), kw["attn_b"],
        kw["dec_w"].astype(dtype), kw["dec_b"],
        kw["query_w"].astype(dtype), kw["loc_patch_w"].astype(dtype),
        kw["loc_dense_wT"].astype(dtype), kw["v_row"].astype(dtype),
        kw["proj_gate_w"].astype(dtype), kw["proj_gate_b"],
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((64, S), dtype)],
    )

    mel, gate, align, steps = pl.pallas_call(
        functools.partial(_kernel, bool(dropout_on)),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((max_steps, n_mel), jnp.float32),
            jax.ShapeDtypeStruct((max_steps, 128), jnp.float32),
            jax.ShapeDtypeStruct((max_steps, S), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, *inputs, gate_thr)

    gate_vec = gate[:, 0]
    fired = jax.nn.sigmoid(gate_vec) > gate_threshold
    valid = jnp.arange(max_steps) < steps[0]
    any_fired = jnp.any(fired & valid)
    first_fire = jnp.argmax(fired & valid)
    lengths = jnp.where(any_fired, first_fire + 1, steps[0])[None] * r

    if r > 1:
        from ...models.decoder import ungroup_mel

        mel_out = ungroup_mel(mel[:, None, :], n_mel // r, r)  # (1, nm, T*r)
    else:
        mel_out = mel.T[None]    # (1, n_mel, max_steps)

    return (
        mel_out,                 # (1, n_mel, max_steps*r)
        gate_vec[None],          # (1, max_steps)
        align[None],             # (1, max_steps, S)
        lengths,
    )


# ---------------------------------------------------------------------------
# Batched fused decode (1 < B <= 8) for the serving micro-batch queue.
# ---------------------------------------------------------------------------


def batched_decode_supported(B: int, S: int, A: int, E: int, H: int,
                             itemsize: int = 2,
                             loc_k: int = LOC_K) -> bool:
    """Envelope for the batched kernel: B <= 8 (the micro-batch queue's cap)
    and a pinned-VMEM estimate within budget.  The dominant pins are the
    banded location matrix (2L, S*A) and the two fused LSTM weights; long
    text buckets blow the band — S<=160 at reference dims (A=128) fits,
    S=256 does not."""
    if not 1 < B <= 8:
        return False
    L = S + loc_k - 1
    band = 2 * L * S * A * itemsize
    v_exp = S * A * S * itemsize
    mem = B * S * E * itemsize + B * S * A * itemsize
    weights = ((256 + E + H) * 4 * H + (H + E + H) * 4 * H
               + H * A + (H + E) * 256) * itemsize
    return band + v_exp + mem + weights <= 80 * 1024 * 1024


def _kernel_batched(
    dropout_on,   # static bool
    S,            # static int
    # scalar prefetch
    scalars_ref,  # SMEM (4,): [max_steps, seed, S, B]
    # inputs (all VMEM, pinned for the whole decode)
    memory_flat_ref,   # (B*S, E)   stream dtype
    pmem2_ref,         # (B, S*A)   stream dtype
    add_mask_ref,      # (B, S)     f32 additive mask
    band_f_ref,        # (2L, S*A)  stream dtype (loc conv+dense folded)
    v_exp_ref,         # (S*A, S)   stream dtype (kron(I_S, v))
    mask_bd_ref,       # (B, B*S)   f32 block-diagonal 0/1
    prenet_w1_ref, prenet_w2_ref,
    attn_w_ref, attn_b_ref,
    dec_w_ref, dec_b_ref,
    query_w_ref,
    proj_gate_w_ref, proj_gate_b_ref,
    gate_threshold_ref,  # SMEM (1, 1) f32
    # outputs
    out_ref,        # (max_steps, B, n_out + 1) f32: mel lanes then gate
    align_out_ref,  # (max_steps, B, S) f32
    steps_out_ref,  # SMEM (1,) int32
):
    max_steps = scalars_ref[0]
    seed = scalars_ref[1]
    gate_threshold = gate_threshold_ref[0, 0]

    B = add_mask_ref.shape[0]
    E = memory_flat_ref.shape[1]
    H4 = attn_w_ref.shape[1]
    H = H4 // 4
    n_out = out_ref.shape[2] - 1  # r * n_mel
    L2 = band_f_ref.shape[0]
    PAD = (L2 // 2 - S) // 2
    wdt = memory_flat_ref.dtype

    if dropout_on:
        pltpu.prng_seed(seed)

    out_ref[:] = jnp.zeros_like(out_ref)
    align_out_ref[:] = jnp.zeros_like(align_out_ref)

    def dropout_keep(x):
        if not dropout_on:
            return x
        bits = pltpu.prng_random_bits(x.shape)
        keep = (bits.astype(jnp.uint32) < jnp.uint32(2147483648)).astype(
            jnp.float32
        )
        return x * keep * 2.0

    def lstm(xh_cat, w_ref_, b_ref_, c):
        g = (
            jnp.dot(xh_cat.astype(wdt), w_ref_[:],
                    preferred_element_type=jnp.float32)
            + b_ref_[:]
        )
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c_new = f * c + i * gg
        return o * jnp.tanh(c_new), c_new

    def cond(carry):
        t, finished = carry[0], carry[1]
        return jnp.logical_and(t < max_steps, jnp.min(finished) < 0.5)

    def body(carry):
        (t, finished, prev_mel, h_att, c_att, h_dec, c_dec,
         attn_w, attn_cum, context) = carry
        active = 1.0 - finished  # (B, 1) f32

        # Prenet (2x linear+relu+dropout) from the previous emitted group.
        x = jnp.maximum(
            jnp.dot(prev_mel.astype(wdt), prenet_w1_ref[:],
                    preferred_element_type=jnp.float32), 0.0)
        x = dropout_keep(x)
        x = jnp.maximum(
            jnp.dot(x.astype(wdt), prenet_w2_ref[:],
                    preferred_element_type=jnp.float32), 0.0)
        x = dropout_keep(x)

        # Attention LSTM.
        cell_in = jnp.concatenate([x, context, h_att], axis=1)
        h_att_new, c_att_new = lstm(cell_in, attn_w_ref, attn_b_ref[:], c_att)

        # Location-sensitive attention, batched layout (teacher_fwd.py).
        xpad = jnp.concatenate(
            [jnp.pad(attn_w, ((0, 0), (PAD, PAD))),
             jnp.pad(attn_cum, ((0, 0), (PAD, PAD)))],
            axis=1,
        )  # (B, 2L)
        locd2 = jnp.dot(xpad.astype(wdt), band_f_ref[:],
                        preferred_element_type=jnp.float32)  # (B, S*A)
        q = jnp.dot(h_att_new.astype(wdt), query_w_ref[:],
                    preferred_element_type=jnp.float32)  # (B, A)
        q_rep = pltpu.repeat(q, S, axis=1)  # (B, S*A)
        tanh_arg = jnp.tanh(q_rep + locd2 + pmem2_ref[:].astype(jnp.float32))
        e = (
            jnp.dot(tanh_arg.astype(wdt), v_exp_ref[:],
                    preferred_element_type=jnp.float32)
            + add_mask_ref[:]
        )  # (B, S)
        emax = jnp.max(e, axis=1, keepdims=True)
        ex = jnp.exp(e - emax)
        w = ex / jnp.sum(ex, axis=1, keepdims=True)  # (B, S)

        w_tiled = pltpu.repeat(w, B, axis=1)          # (B, B*S)
        w_bd = w_tiled * mask_bd_ref[:]
        context_new = jnp.dot(w_bd.astype(wdt), memory_flat_ref[:],
                              preferred_element_type=jnp.float32)  # (B, E)
        attn_cum_new = attn_cum + w

        # Decoder LSTM + fused mel/gate projection.
        dec_in = jnp.concatenate([h_att_new, context_new, h_dec], axis=1)
        h_dec_new, c_dec_new = lstm(dec_in, dec_w_ref, dec_b_ref[:], c_dec)
        hc = jnp.concatenate([h_dec_new, context_new], axis=1)
        out_t = (
            jnp.dot(hc.astype(wdt), proj_gate_w_ref[:],
                    preferred_element_type=jnp.float32)
            + proj_gate_b_ref[:]
        )  # (B, n_out + 1)
        mel_t = out_t[:, :n_out]
        gate_col = out_t[:, n_out:]  # (B, 1)

        # Finished rows emit zeros (same contract as the XLA while_loop).
        out_ref[pl.ds(t, 1), :, :] = (out_t * active)[None]
        align_out_ref[pl.ds(t, 1), :, :] = (w * active)[None]

        fired = (jax.nn.sigmoid(gate_col) > gate_threshold).astype(jnp.float32)
        finished_new = jnp.maximum(finished, fired)
        return (t + 1, finished_new, mel_t, h_att_new, c_att_new,
                h_dec_new, c_dec_new, w, attn_cum_new, context_new)

    init = (
        jnp.int32(0),
        jnp.zeros((B, 1), jnp.float32),
        jnp.zeros((B, n_out), jnp.float32),
        jnp.zeros((B, H), jnp.float32),
        jnp.zeros((B, H), jnp.float32),
        jnp.zeros((B, H), jnp.float32),
        jnp.zeros((B, H), jnp.float32),
        jnp.zeros((B, S), jnp.float32),
        jnp.zeros((B, S), jnp.float32),
        jnp.zeros((B, E), jnp.float32),
    )
    final = jax.lax.while_loop(cond, body, init)
    steps_out_ref[0] = final[0]


@functools.partial(
    jax.jit,
    static_argnames=("max_steps", "interpret", "dtype_name", "dropout_on",
                     "r"),
)
def decode_loop_batched(
    dec_params,
    memory,            # (B, S, E)
    processed_memory,  # (B, S, A)
    mask,              # (B, S) bool, or None for all-valid
    *,
    max_steps: int,
    gate_threshold: float,
    seed,
    dropout_on: bool = True,
    interpret: bool = False,
    dtype_name: str = "bfloat16",
    r: int = 1,
):
    """Fused batched decode: same return contract as models.decoder.infer
    ((B, n_mel, max_steps*r) mel, (B, max_steps) gate, (B, max_steps, S)
    alignments, (B,) frame lengths).  Takes the RAW decoder params (not
    prepare_weights output — the batched layout packs differently)."""
    from .teacher_fwd import build_loc_band

    dtype = jnp.dtype(dtype_name)
    B, S, E = memory.shape
    A = processed_memory.shape[2]
    n_out = dec_params["proj"]["w"].shape[1]  # r * n_mel

    att = dec_params["attention"]
    band_f = build_loc_band(att["loc_conv"]["w"], att["loc_dense"]["w"],
                            S).astype(dtype)
    v_exp = jnp.kron(
        jnp.eye(S, dtype=jnp.float32), att["v"]["w"].astype(jnp.float32)
    ).astype(dtype)  # (S*A, S)
    mask_bd = jnp.kron(
        jnp.eye(B, dtype=jnp.float32), jnp.ones((1, S), jnp.float32)
    )  # (B, B*S)

    memory_flat = memory.reshape(B * S, E).astype(dtype)
    pmem2 = processed_memory.reshape(B, S * A).astype(dtype)
    add_mask = jnp.where(
        mask if mask is not None else jnp.ones((B, S), bool),
        0.0, jnp.float32(np.finfo(np.float32).min)
    )

    attn_w_full = jnp.concatenate(
        [dec_params["attention_rnn"]["wi"], dec_params["attention_rnn"]["wh"]],
        axis=0,
    )
    dec_w_full = jnp.concatenate(
        [dec_params["decoder_rnn"]["wi"], dec_params["decoder_rnn"]["wh"]],
        axis=0,
    )
    proj_gate_w = jnp.concatenate(
        [dec_params["proj"]["w"], dec_params["gate"]["w"]], axis=1
    )
    proj_gate_b = jnp.concatenate(
        [dec_params["proj"]["b"], dec_params["gate"]["b"]]
    )

    scalars = jnp.asarray(
        [max_steps, jnp.asarray(seed, jnp.int32), S, B], jnp.int32
    )
    gate_thr = jnp.asarray([[gate_threshold]], jnp.float32)

    inputs = (
        memory_flat, pmem2, add_mask, band_f, v_exp, mask_bd,
        dec_params["prenet"][0]["w"].astype(dtype),
        dec_params["prenet"][1]["w"].astype(dtype),
        attn_w_full.astype(dtype),
        jnp.asarray(
            dec_params["attention_rnn"]["bi"]
            + dec_params["attention_rnn"]["bh"], jnp.float32,
        )[None, :],
        dec_w_full.astype(dtype),
        jnp.asarray(
            dec_params["decoder_rnn"]["bi"] + dec_params["decoder_rnn"]["bh"],
            jnp.float32,
        )[None, :],
        att["query"]["w"].astype(dtype),
        proj_gate_w.astype(dtype),
        jnp.asarray(proj_gate_b, jnp.float32)[None, :],
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )

    out, align, steps = pl.pallas_call(
        functools.partial(_kernel_batched, bool(dropout_on), S),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((max_steps, B, n_out + 1), jnp.float32),
            jax.ShapeDtypeStruct((max_steps, B, S), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, *inputs, gate_thr)

    mel = out[..., :n_out]      # (max_steps, B, n_out)
    gate = out[..., n_out]      # (max_steps, B)

    fired = jax.nn.sigmoid(gate) > gate_threshold      # (max_steps, B)
    valid = (jnp.arange(max_steps) < steps[0])[:, None]
    fired = fired & valid
    any_fired = jnp.any(fired, axis=0)
    first_fire = jnp.argmax(fired, axis=0)
    lengths = jnp.where(any_fired, first_fire + 1, steps[0]) * r

    from ...models.decoder import ungroup_mel

    return (
        ungroup_mel(mel, n_out // r, r),   # (B, n_mel, max_steps*r)
        jnp.swapaxes(gate, 0, 1),          # (B, max_steps)
        jnp.transpose(align, (1, 0, 2)),   # (B, max_steps, S)
        lengths,
    )
