"""Teacher-forced decoder FORWARD as one Pallas kernel (grid over time).

EXPERIMENTAL (off by default — enable with ScanConfig.use_pallas_fwd, or
T2V_PALLAS_FWD=1 for perf bisection via tools/bench_step.py).
Numerically verified against the XLA scan (tests/test_bptt.py) but currently
speed-neutral on v5e at small batch: Mosaic supports no general major-dim
shape casts, so the (B, S)<->(B*S, ·) conversions around the attention math
fall back to per-example loops (B x [loc matmul, energy transpose, context
matvec]) whose op count cancels the VMEM-pinned-weights win. At large batch
it does not fit at all: everything-pinned-in-VMEM needs ~212MB at B=64/S=128
(cap 128MB on v5e) — measured 2026-08, so the XLA scan (which streams
weights per step and hits ~307k frames/s at B=64) remains the training path.
Revisit if/when Mosaic gains relayout shape casts or batched dot_general.

Structure: every weight stays pinned in VMEM across all T grid steps, the
location-sensitive conv is a matmul against a precomputed banded Toeplitz
matrix, and attention runs in flattened (B*S, A) space so all math is rank-2.
Emits exactly the ys + residuals the hand-written backward consumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_loc_band(loc_w: np.ndarray, loc_dense_w: np.ndarray, S: int,
                   fold_dense: bool = False) -> np.ndarray:
    """Banded Toeplitz matrix for the location conv as one matmul.

    loc_w: (K, 2, F). Returns (2*(S+K-1), S*F) with
    band[(c, u), (s, f)] = loc_w[u - s, c, f] for 0 <= u - s < K, so that
    loc[b, s, f] = xpad[b, c, u] @ band — xpad being the per-channel padded
    attention features laid out (B, 2*(S+K-1)).
    """
    K, C, F = loc_w.shape
    L = S + K - 1
    band = np.zeros((C * L, S * F), np.float32)
    for c in range(C):
        for s in range(S):
            for dk in range(K):
                u = s + dk
                band[c * L + u, s * F : (s + 1) * F] = loc_w[dk, c, :]
    return band


def _kernel(
    train_dropout,  # static bool
    # inputs
    memory_flat_ref,   # (B*S, E)
    pmem_flat_ref,     # (B*S, A)
    add_mask_ref,      # (B, S)
    q_expand_ref,      # (B*S, B) one-hot row-expansion matrix
    attn_w_ref,        # (P+E+H, 4H)
    attn_b_ref,        # (1, 4H)
    dec_w_ref,         # (H+E+H, 4H)
    dec_b_ref,         # (1, 4H)
    query_w_ref,       # (H, A)
    loc_band_ref,      # (2L, S*F)
    loc_dense_w_ref,   # (F, A)
    v_w_ref,           # (A, 1)
    pn_ref,            # (1, B, P) block at step t
    m1_ref, m2_ref, m3_ref, m4_ref,  # (1, B, H) mask blocks
    # outputs (blocks at step t)
    h_dec_ref, ctx_ref, w_ref, g_att_ref, g_dec_ref, h_att_ref,
    c_att_ref, c_dec_ref,  # post-dropout cell states (bwd needs c_prev)
    # scratch (persist across the sequential grid)
    s_h_att, s_c_att, s_h_dec, s_c_dec, s_w, s_wc, s_ctx,
    s_loc,  # (B*S, F) staging — Mosaic can't shape-cast (B, S*F)->(B*S, F)
    s_e,    # (B, S) staging for per-example energy rows
):
    t = pl.program_id(0)
    B, S = add_mask_ref.shape
    H4 = attn_w_ref.shape[1]
    H = H4 // 4
    E = memory_flat_ref.shape[1]
    A = pmem_flat_ref.shape[1]
    F = loc_dense_w_ref.shape[0]
    L2 = loc_band_ref.shape[0]
    L = L2 // 2
    K_m1 = L - S  # kernel-1 (pad total)
    PAD = K_m1 // 2

    @pl.when(t == 0)
    def _init():
        s_h_att[:] = jnp.zeros_like(s_h_att)
        s_c_att[:] = jnp.zeros_like(s_c_att)
        s_h_dec[:] = jnp.zeros_like(s_h_dec)
        s_c_dec[:] = jnp.zeros_like(s_c_dec)
        s_w[:] = jnp.zeros_like(s_w)
        s_wc[:] = jnp.zeros_like(s_wc)
        s_ctx[:] = jnp.zeros_like(s_ctx)

    def lstm(xh, w_ref_, b_ref_, c):
        g = jnp.dot(xh, w_ref_[:], preferred_element_type=jnp.float32) + b_ref_[:]
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return g, h_new, c_new

    pn = pn_ref[0]  # (B, P)
    h_att = s_h_att[:]
    ctx = s_ctx[:]

    # attention LSTM (fused input+hidden matmul)
    x_att = jnp.concatenate([pn, ctx, h_att], axis=1)
    g_att, h_att_new, c_att_new = lstm(x_att, attn_w_ref, attn_b_ref, s_c_att[:])
    if train_dropout:
        h_att_new = h_att_new * m1_ref[0]
        c_att_new = c_att_new * m2_ref[0]

    # location term via the banded matmul, staged per example (Mosaic has
    # no general major-dim shape casts; (1, N) -> (R, C) reshape is fine)
    w_prev = s_w[:]
    w_cum = s_wc[:]
    # static lane-concat padding (dynamic_update_slice is not lowerable)
    xpad = jnp.concatenate(
        [jnp.pad(w_prev, ((0, 0), (PAD, PAD))),
         jnp.pad(w_cum, ((0, 0), (PAD, PAD)))],
        axis=1,
    )  # (B, 2L)
    # F is padded to a multiple of 128 host-side: Mosaic only supports
    # (1, N) -> (R, C) shape casts when C is lane-aligned.
    for b in range(B):
        lb = jnp.dot(xpad[b : b + 1], loc_band_ref[:],
                     preferred_element_type=jnp.float32)  # (1, S*F)
        s_loc[b * S : (b + 1) * S, :] = lb.reshape(S, F)
    loc_flat = s_loc[:]
    locd = jnp.dot(loc_flat, loc_dense_w_ref[:],
                   preferred_element_type=jnp.float32)  # (B*S, A)

    q = jnp.dot(h_att_new, query_w_ref[:],
                preferred_element_type=jnp.float32)  # (B, A)
    # row (b*S+s) = q[b] via a one-hot matmul (pltpu.repeat tiles, not
    # row-repeats, so it can't express this)
    q_rep = jnp.dot(q_expand_ref[:], q,
                    preferred_element_type=jnp.float32)  # (B*S, A)
    tanh_arg = jnp.tanh(q_rep + locd + pmem_flat_ref[:])
    e_col = jnp.dot(tanh_arg, v_w_ref[:],
                    preferred_element_type=jnp.float32)  # (B*S, 1)
    ones11 = jnp.ones((1, 1), jnp.float32)
    for b in range(B):
        # (S, 1) -> (1, S) through the MXU (contract the size-1 col)
        s_e[b : b + 1, :] = jax.lax.dot_general(
            ones11, e_col[b * S : (b + 1) * S],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    e = s_e[:] + add_mask_ref[:]
    emax = jnp.max(e, axis=1, keepdims=True)
    ex = jnp.exp(e - emax)
    w = ex / jnp.sum(ex, axis=1, keepdims=True)  # (B, S)

    # context per example: ctx[b] = w[b] @ memory[b]
    ctx_rows = [
        jnp.dot(w[b : b + 1], memory_flat_ref[b * S : (b + 1) * S, :],
                preferred_element_type=jnp.float32)
        for b in range(B)
    ]
    ctx_new = jnp.concatenate(ctx_rows, axis=0)  # (B, E)
    wc_new = w_cum + w

    # decoder LSTM
    x_dec = jnp.concatenate([h_att_new, ctx_new, s_h_dec[:]], axis=1)
    g_dec, h_dec_new, c_dec_new = lstm(x_dec, dec_w_ref, dec_b_ref, s_c_dec[:])
    if train_dropout:
        h_dec_new = h_dec_new * m3_ref[0]
        c_dec_new = c_dec_new * m4_ref[0]

    # outputs
    h_dec_ref[0] = h_dec_new
    ctx_ref[0] = ctx_new
    w_ref[0] = w
    g_att_ref[0] = g_att
    g_dec_ref[0] = g_dec
    h_att_ref[0] = h_att_new
    c_att_ref[0] = c_att_new
    c_dec_ref[0] = c_dec_new

    # update state
    s_h_att[:] = h_att_new
    s_c_att[:] = c_att_new
    s_h_dec[:] = h_dec_new
    s_c_dec[:] = c_dec_new
    s_w[:] = w
    s_wc[:] = wc_new
    s_ctx[:] = ctx_new


@functools.partial(jax.jit, static_argnames=("train_dropout", "interpret"))
def fwd_pallas(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks,
               loc_band, *, train_dropout: bool, interpret: bool = False):
    """Pallas forward for the BPTT scan core.

    Returns (ys, resids) with the same contents as decoder_bptt._fwd_impl
    (the backward recomputes tanh_arg/loc from these, so they are not saved).
    """
    T, B, P = prenet_seq.shape
    S, E = memory.shape[1], memory.shape[2]
    A = pmem.shape[2]
    H = scan_params["attn_w"].shape[1] // 4
    F = scan_params["loc_dense_w"].shape[0]
    F_PAD = 128  # loc features padded to lane width (shape-cast constraint)
    loc_dense_pad = jnp.zeros((F_PAD, A), jnp.float32).at[:F].set(
        scan_params["loc_dense_w"]
    )

    memory_flat = memory.reshape(B * S, E)
    pmem_flat = pmem.reshape(B * S, A)
    q_expand = jnp.asarray(
        np.kron(np.eye(B, dtype=np.float32), np.ones((S, 1), np.float32))
    )  # (B*S, B)

    m1, m2, m3, m4 = drop_masks
    if m1.shape[1] == 1:  # disabled-dropout dummies -> broadcast to (T,B,H)
        m1 = jnp.broadcast_to(m1, (T, B, H))
        m2 = jnp.broadcast_to(m2, (T, B, H))
        m3 = jnp.broadcast_to(m3, (T, B, H))
        m4 = jnp.broadcast_to(m4, (T, B, H))

    step_block = lambda t: (t, 0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # memory_flat
        pl.BlockSpec(memory_space=pltpu.VMEM),  # pmem_flat
        pl.BlockSpec(memory_space=pltpu.VMEM),  # add_mask
        pl.BlockSpec(memory_space=pltpu.VMEM),  # q_expand
        pl.BlockSpec(memory_space=pltpu.VMEM),  # attn_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # attn_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # dec_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # dec_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # query_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # loc_band
        pl.BlockSpec(memory_space=pltpu.VMEM),  # loc_dense
        pl.BlockSpec(memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, B, P), step_block, memory_space=pltpu.VMEM),  # pn
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),  # m1
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),  # m2
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),  # m3
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),  # m4
    ]
    out_specs = (
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, E), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, S), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, 4 * H), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, 4 * H), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), step_block, memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, E), jnp.float32),
        jax.ShapeDtypeStruct((T, B, S), jnp.float32),
        jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, 4 * H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        jax.ShapeDtypeStruct((T, B, H), jnp.float32),
    )

    outs = pl.pallas_call(
        functools.partial(_kernel, bool(train_dropout)),
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, S), jnp.float32),
            pltpu.VMEM((B, S), jnp.float32),
            pltpu.VMEM((B, E), jnp.float32),
            pltpu.VMEM((B * S, F_PAD), jnp.float32),
            pltpu.VMEM((B, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        memory_flat, pmem_flat, add_mask, q_expand,
        scan_params["attn_w"], scan_params["attn_b"][None, :],
        scan_params["dec_w"], scan_params["dec_b"][None, :],
        scan_params["query_w"], loc_band, loc_dense_pad,
        scan_params["v_w"], prenet_seq, m1, m2, m3, m4,
    )
    h_dec, ctx, w, g_att, g_dec, h_att, c_att, c_dec = outs
    ys = (h_dec, ctx, w)
    # bwd consumes the PREVIOUS step's (post-dropout) cell states
    zh = jnp.zeros((1, B, H), jnp.float32)
    c_att_prev = jnp.concatenate([zh, c_att[:-1]], axis=0)
    c_dec_prev = jnp.concatenate([zh, c_dec[:-1]], axis=0)
    resids = (g_att, g_dec, c_att_prev, c_dec_prev, h_att)
    return ys, resids
