"""Hand-written BPTT for the teacher-forced decoder scan (custom VJP).

Why: jax.grad of the decoder `lax.scan` spends ~2.5x the forward time in the
backward pass.  The structural waste is the per-step dW handling — every scan
step touches weight-gradient accumulators.  This module restructures the
backward so that

  * the reverse-time scan carries ONLY activation gradients (the sequential
    part streams exactly the same weight bytes as the forward: dx = dg @ W^T);
  * per-step LSTM gate gradients are stacked and the weight gradients become
    TWO large MXU matmuls after the scan:  dW = X_cat^T @ dGates  over the
    flattened (T*B) axis (the classic "RNN backward as one big matmul");
  * attention intermediates (location conv, energies) are recomputed in the
    backward from tiny saved residuals instead of being stored;
  * dropout masks are regenerated from the same fold_in keys, not stored.

Numerical contract: identical outputs and gradients to autodiff of the same
forward (verified in tests/test_bptt.py), which itself matches
``decoder.teacher_forced`` step math (reference model.py:346-426).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ScanConfig(NamedTuple):
    n_half_keep_att: float  # 1 - p_attention_dropout
    n_half_keep_dec: float  # 1 - p_decoder_dropout
    train: bool
    compute_dtype: str = "float32"  # dtype for the big recurrent matmuls
    use_pallas_fwd: bool = False    # run the forward as one Pallas kernel
    use_pallas_bwd: bool = False    # run the backward as one Pallas kernel
    pallas_interpret: bool = False  # interpreter mode (tests on CPU)


def _cdot(a, b, cfg):
    """Matmul in cfg.compute_dtype with fp32 accumulation."""
    if cfg.compute_dtype != "float32":
        dt = jnp.dtype(cfg.compute_dtype)
        a, b = a.astype(dt), b.astype(dt)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _cast_w(w, cfg):
    """Cast a loop-invariant weight to the compute dtype OUTSIDE the scan.

    `_cdot` inside a scan body re-casts its operands every time step; XLA
    does not reliably hoist the (fp32 -> bf16) convert of the ~36MB fused
    LSTM weights out of the loop, which costs an extra HBM pass per step.
    Pre-cast once so the in-scan astype is a no-op."""
    if cfg.compute_dtype != "float32":
        return w.astype(jnp.dtype(cfg.compute_dtype))
    return w


def _recompute_attn(B, S, cfg):
    """Static-shape heuristic separating two measured BPTT regimes (v5e).

    Large scans (big B*S) are HBM-bound: recompute tanh_arg/loc in the
    backward instead of saving them, and contract dx = dg @ W^T against the
    UNTRANSPOSED weights so the same VMEM-resident buffer serves both
    directions (23% faster step at B=64).  Small scans are latency-bound:
    the extra per-step recompute ops cost more than the residual HBM traffic
    they save (+32% step time at B=6), so save the intermediates and
    precompute transposed weight copies.  The Pallas forward always uses the
    slim residual contract.
    """
    return cfg.use_pallas_fwd or cfg.use_pallas_bwd or B * S >= 2048


def _split_gates(g, H):
    return g[:, :H], g[:, H:2 * H], g[:, 2 * H:3 * H], g[:, 3 * H:]


def _lstm_fwd(g, c_prev, H):
    """Pre-activation gates + previous cell -> (h, c, residual acts)."""
    gi, gf, gg, go = _split_gates(g, H)
    i = jax.nn.sigmoid(gi)
    f = jax.nn.sigmoid(gf)
    gg = jnp.tanh(gg)
    o = jax.nn.sigmoid(go)
    c = f * c_prev + i * gg
    h = o * jnp.tanh(c)
    return h, c


def _lstm_bwd(g, c_prev, c, dh, dc, H):
    """Backward through one LSTM cell given pre-activation gates."""
    gi, gf, gg, go = _split_gates(g, H)
    i = jax.nn.sigmoid(gi)
    f = jax.nn.sigmoid(gf)
    gt = jnp.tanh(gg)
    o = jax.nn.sigmoid(go)
    tc = jnp.tanh(c)
    do = dh * tc
    dc_total = dc + dh * o * (1.0 - tc * tc)
    di = dc_total * gt
    df = dc_total * c_prev
    dgt = dc_total * i
    dc_prev = dc_total * f
    dgates = jnp.concatenate(
        [di * i * (1 - i), df * f * (1 - f), dgt * (1 - gt * gt),
         do * o * (1 - o)],
        axis=-1,
    )
    return dgates, dc_prev


def _dropout_mask(key, shape, keep, dtype=jnp.float32):
    """Pre-scaled (1/keep) dropout mask in the STREAM dtype: masks are scanned
    from HBM every step in both directions, so bf16 halves their traffic."""
    return (jax.random.bernoulli(key, keep, shape).astype(dtype)
            / jnp.asarray(keep, dtype))


def _cdot_t(a, w, cfg):
    """a @ w.T contraction WITHOUT materializing a transposed weight copy.

    The backward streams dx = dg @ W^T; expressing it as a dot_general over
    W's output axis lets XLA keep the SAME loop-invariant W buffer the
    forward pins in VMEM instead of allocating (and re-streaming from HBM) a
    36MB transposed copy per scan step."""
    if cfg.compute_dtype != "float32":
        dt = jnp.dtype(cfg.compute_dtype)
        a, w = a.astype(dt), w.astype(dt)
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _loc_conv(w_prev, w_cum, loc_w):
    """Location conv: (B,S) x2 -> (B, S, F).  loc_w: (K, 2, F)."""
    feats = jnp.stack([w_prev, w_cum], axis=-1)  # (B, S, 2)
    K = loc_w.shape[0]
    pad = (K - 1) // 2
    return jax.lax.conv_general_dilated(
        feats, loc_w, (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _loc_conv_input_grad(dloc, loc_w):
    """Gradient of _loc_conv wrt its (B, S, 2) input: transposed conv."""
    K = loc_w.shape[0]
    pad = (K - 1) // 2
    w_flip = jnp.flip(loc_w, axis=0).swapaxes(1, 2)  # (K, F, 2)
    return jax.lax.conv_general_dilated(
        dloc, w_flip, (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _loc_conv_weight_grad(w_prev, w_cum, dloc, K):
    """Gradient wrt loc_w: correlation of inputs with dloc -> (K, 2, F).

    dW[k, c, f] = sum_{b,s} feats[b, s + k - pad, c] * dloc[b, s, f].
    Expressed as ONE conv contraction with the (huge, T*B) batch axis as the
    conv *feature* axis — materializing K shifted copies of the inputs (the
    naive stack-and-einsum form) costs ~0.5GB of HBM at the flagship batch.
    """
    feats = jnp.stack([w_prev, w_cum], axis=-1)  # (B, S, 2)
    pad = (K - 1) // 2
    B, S, _ = feats.shape
    fp = jnp.pad(feats, ((0, 0), (pad, pad), (0, 0)))  # (B, L=S+K-1, 2)
    # out[n=c, w=k, o=f] = sum_{s, ci=b} lhs[c, k+s, b] * rhs[s, b, f]
    # with lhs = fp laid out (batch=c: dim2, feature=b: dim0, spatial: dim1)
    # and rhs = dloc laid out (spatial=s: dim1, in=b: dim0, out=f: dim2) —
    # both natural layouts, no transposes.
    if B < 16384:
        # Small flattened batch: K shifted copies are cheap; the explicit
        # stack + einsum beats the conv contraction by ~7ms at T*B=3072
        # (XLA's conv path pays fixed layout costs that only amortize at
        # large feature counts).
        slices = [
            jax.lax.dynamic_slice_in_dim(fp, k, S, axis=1) for k in range(K)
        ]
        stacked = jnp.stack(slices, axis=0)
        return jnp.einsum(
            "kbsc,bsf->kcf", stacked, dloc,
            preferred_element_type=jnp.float32)
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(2, 0, 1),   # (batch=C, feature=B, spatial=L)
        rhs_spec=(2, 0, 1),   # (out=F, in=B, spatial=S)
        out_spec=(0, 2, 1),   # (batch=C, feature=F, spatial=K) -> (C, K, F)
    )
    out = jax.lax.conv_general_dilated(
        fp, dloc, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )  # (C, K, F)
    return jnp.swapaxes(out, 0, 1)  # (K, C, F)


# ---------------------------------------------------------------------------
# The custom-VJP scan core
# ---------------------------------------------------------------------------
#
# scan_params pytree:
#   attn_w  (P+E+H, 4H)   fused input+hidden weights, attention LSTM
#   attn_b  (4H,)
#   dec_w   (H+E+H, 4H)   fused, decoder LSTM
#   dec_b   (4H,)
#   query_w (H, A)
#   loc_w   (K, 2, F)
#   loc_dense_w (F, A)
#   v_w     (A, 1)
#
# inputs:
#   prenet_seq (T, B, P), memory (B, S, E), pmem (B, S, A),
#   add_mask (B, S) additive (0 / -inf), keys (T, 2) uint32


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def scan_core(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg):
    """drop_masks: (m1, m2, m3, m4) pre-scaled (bernoulli/keep) dropout masks
    with leading time dim — (T, B, H) when dropout is active, (T, 1, 1) ones
    otherwise. Precomputed in bulk: in-scan RNG costs ~20% of the train step."""
    ys, _saved = _fwd_rule(
        scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg
    )
    return ys


def _fwd_impl(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg):
    T, B, P = prenet_seq.shape
    S, E = memory.shape[1], memory.shape[2]
    H = scan_params["attn_w"].shape[1] // 4
    attn_w_c = _cast_w(scan_params["attn_w"], cfg)
    dec_w_c = _cast_w(scan_params["dec_w"], cfg)
    sdt = jnp.dtype(cfg.compute_dtype)
    recompute = _recompute_attn(B, S, cfg)

    def step(carry, inp):
        h_att, c_att, h_dec, c_dec, w_prev, w_cum, ctx = carry
        pn_t, m1, m2, m3, m4 = inp

        x_att = jnp.concatenate([pn_t, ctx, h_att], axis=-1)
        g_att = _cdot(x_att, attn_w_c, cfg) + scan_params["attn_b"]
        h_att_new, c_att_new = _lstm_fwd(g_att, c_att, H)
        if cfg.train and cfg.n_half_keep_att < 1.0:
            h_att_new = h_att_new * m1
            c_att_new = c_att_new * m2

        loc = _loc_conv(w_prev, w_cum, scan_params["loc_w"])  # (B,S,F)
        locd = jnp.dot(loc, scan_params["loc_dense_w"],
                       preferred_element_type=jnp.float32)  # (B,S,A)
        q = jnp.dot(h_att_new, scan_params["query_w"],
                    preferred_element_type=jnp.float32)  # (B,A)
        tanh_arg = jnp.tanh(q[:, None, :] + locd + pmem)
        e = jnp.dot(tanh_arg, scan_params["v_w"],
                    preferred_element_type=jnp.float32)[..., 0]  # (B,S)
        e = e + add_mask
        w = jax.nn.softmax(e, axis=1)
        ctx_new = jnp.einsum("bs,bse->be", w, memory,
                             preferred_element_type=jnp.float32)
        w_cum_new = w_cum + w

        x_dec = jnp.concatenate([h_att_new, ctx_new, h_dec], axis=-1)
        g_dec = _cdot(x_dec, dec_w_c, cfg) + scan_params["dec_b"]
        h_dec_new, c_dec_new = _lstm_fwd(g_dec, c_dec, H)
        if cfg.train and cfg.n_half_keep_dec < 1.0:
            h_dec_new = h_dec_new * m3
            c_dec_new = c_dec_new * m4

        new_carry = (h_att_new, c_att_new, h_dec_new, c_dec_new,
                     w, w_cum_new, ctx_new)
        # Residuals are stored in the compute dtype (bf16 storage is a
        # bf16-remat under bf16 training, exact under fp32).  In the
        # large-scan regime tanh_arg/loc — the two biggest per-step HBM
        # writes, >30% of the forward scan — are NOT saved: the backward
        # recomputes them exactly from h_att_new and the reconstructed
        # (w_prev, w_cum_prev) for a few cheap MXU ops (_recompute_attn).
        resid = (g_att.astype(sdt), g_dec.astype(sdt), c_att, c_dec,
                 h_att_new)
        if not recompute:
            resid = resid + (tanh_arg.astype(sdt), loc.astype(sdt))
        return new_carry, ((h_dec_new, ctx_new, w), resid)

    z = lambda *s: jnp.zeros(s, jnp.float32)
    init = (z(B, H), z(B, H), z(B, H), z(B, H), z(B, S), z(B, S), z(B, E))
    _, (ys, resids) = jax.lax.scan(step, init, (prenet_seq, *drop_masks))
    return ys, resids


def _fwd_rule(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg):
    if cfg.use_pallas_fwd:
        from ..ops.pallas.teacher_fwd import fwd_pallas

        dropout_on = cfg.train and (
            cfg.n_half_keep_att < 1.0 or cfg.n_half_keep_dec < 1.0
        )
        ys, resids = fwd_pallas(
            scan_params, prenet_seq, memory, pmem, add_mask, drop_masks,
            train_dropout=dropout_on,
            interpret=cfg.pallas_interpret,
            dtype_name=cfg.compute_dtype,
        )
        # match the XLA path's residual contract: gates in the stream dtype
        sdt = jnp.dtype(cfg.compute_dtype)
        resids = (resids[0].astype(sdt), resids[1].astype(sdt), *resids[2:])
    else:
        ys, resids = _fwd_impl(
            scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg
        )
    saved = (scan_params, prenet_seq, memory, pmem, add_mask, drop_masks,
             ys, resids)
    return ys, saved


def _bwd_rule(cfg, saved, dys):
    (scan_params, prenet_seq, memory, pmem, add_mask, drop_masks,
     ys, resids) = saved
    dh_dec_seq, dctx_seq, dw_seq = dys
    h_dec_seq, ctx_seq, w_seq = ys
    T, B, P = prenet_seq.shape
    S = memory.shape[1]
    recompute = _recompute_attn(B, S, cfg)
    if recompute:
        (g_att_seq, g_dec_seq, c_att_prev_seq, c_dec_prev_seq,
         h_att_seq) = resids
        tanh_arg_seq = loc_seq = None
    else:
        (g_att_seq, g_dec_seq, c_att_prev_seq, c_dec_prev_seq,
         h_att_seq, tanh_arg_seq, loc_seq) = resids

    E = memory.shape[2]
    H = scan_params["attn_w"].shape[1] // 4
    A = scan_params["query_w"].shape[1]
    K = scan_params["loc_w"].shape[0]
    sdt = jnp.dtype(cfg.compute_dtype)
    if recompute:
        attn_w_b = _cast_w(scan_params["attn_w"], cfg)
        dec_w_b = _cast_w(scan_params["dec_w"], cfg)
        dx_from_dg_att = lambda dg: _cdot_t(dg, attn_w_b, cfg)
        dx_from_dg_dec = lambda dg: _cdot_t(dg, dec_w_b, cfg)
    else:
        attn_wT_c = _cast_w(scan_params["attn_w"].T, cfg)
        dec_wT_c = _cast_w(scan_params["dec_w"].T, cfg)
        dx_from_dg_att = lambda dg: _cdot(dg, attn_wT_c, cfg)
        dx_from_dg_dec = lambda dg: _cdot(dg, dec_wT_c, cfg)

    # Reconstruct per-step (w_prev, w_cum_prev, ctx_prev, h_prev) sequences.
    zrow = jnp.zeros((1, B, S), jnp.float32)
    w_prev_seq = jnp.concatenate([zrow, w_seq[:-1]], axis=0)
    w_cum_seq = jnp.cumsum(w_seq, axis=0)
    w_cum_prev_seq = jnp.concatenate([zrow, w_cum_seq[:-1]], axis=0)
    zctx = jnp.zeros((1, B, E), jnp.float32)
    ctx_prev_seq = jnp.concatenate([zctx, ctx_seq[:-1]], axis=0)
    zh = jnp.zeros((1, B, H), jnp.float32)
    h_att_prev_seq = jnp.concatenate([zh, h_att_seq[:-1]], axis=0)
    h_dec_prev_seq = jnp.concatenate([zh, h_dec_seq[:-1]], axis=0)

    if cfg.use_pallas_bwd and recompute:
        # Reverse-grid Pallas kernel: weights pinned in VMEM, tanh_arg
        # recomputed in-kernel; emits the same per-step streams the XLA
        # reverse scan produces, so everything below the scan is shared.
        from ..ops.pallas.teacher_fwd import bwd_pallas

        dropout_on = cfg.train and (
            cfg.n_half_keep_att < 1.0 or cfg.n_half_keep_dec < 1.0
        )
        (dg_att_seq, dg_dec_seq, dpn_seq, dctx_tot_seq, dlf_seq, dWld,
         dv_k, dWq, dpmem) = bwd_pallas(
            scan_params, memory, pmem, drop_masks, dys,
            (g_att_seq, g_dec_seq, c_att_prev_seq, c_dec_prev_seq,
             h_att_seq),
            w_prev_seq, w_cum_prev_seq, w_seq,
            train_dropout=dropout_on, interpret=cfg.pallas_interpret,
            dtype_name=cfg.compute_dtype,
        )
        dv = dv_k.T  # (A, 1)
        # d loc_dense_w (dWld) accumulates in-kernel as G = sum locd^T@dta
        # and is recovered by an exact FxF solve inside bwd_pallas; d
        # loc_w is the conv-weight-grad correlation of (w_prev, w_cum)
        # with the F-width dlf stream the kernel emits (dlf = dtanh @
        # loc_dense^T computed in VMEM) — the A-width dtanh stream never
        # leaves the kernel, so the old 1 GB HBM round trips and the
        # caller-side location-conv recompute are gone (round 5,
        # ~7 ms/step at B=64).
        dWloc = _loc_conv_weight_grad(
            w_prev_seq.reshape(T * B, S).astype(dlf_seq.dtype),
            w_cum_prev_seq.reshape(T * B, S).astype(dlf_seq.dtype),
            dlf_seq.reshape(T * B, S, -1), K,
        )
        x_att_seq = jnp.concatenate(
            [prenet_seq.astype(sdt), ctx_prev_seq.astype(sdt),
             h_att_prev_seq.astype(sdt)], axis=-1
        ).reshape(T * B, -1)
        d_attn_w = _cdot(x_att_seq.T, dg_att_seq.reshape(T * B, -1), cfg)
        d_attn_b = jnp.sum(dg_att_seq, axis=(0, 1), dtype=jnp.float32)
        x_dec_seq = jnp.concatenate(
            [h_att_seq.astype(sdt), ctx_seq.astype(sdt),
             h_dec_prev_seq.astype(sdt)], axis=-1
        ).reshape(T * B, -1)
        d_dec_w = _cdot(x_dec_seq.T, dg_dec_seq.reshape(T * B, -1), cfg)
        d_dec_b = jnp.sum(dg_dec_seq, axis=(0, 1), dtype=jnp.float32)
        dmemory = jnp.einsum("tbs,tbe->bse", w_seq, dctx_tot_seq,
                             preferred_element_type=jnp.float32)
        d_scan_params = {
            "attn_w": d_attn_w, "attn_b": d_attn_b,
            "dec_w": d_dec_w, "dec_b": d_dec_b,
            "query_w": dWq, "loc_w": dWloc, "loc_dense_w": dWld, "v_w": dv,
        }
        d_add_mask = jnp.zeros_like(add_mask)
        d_masks = tuple(jnp.zeros_like(m) for m in drop_masks)
        return (d_scan_params, dpn_seq, dmemory, dpmem, d_add_mask, d_masks)

    def step(carry, inp):
        (dh_att_c, dc_att_c, dh_dec_c, dc_dec_c, dw_prev_c, dwcum_c,
         dctx_c, dv_acc, dWq_acc, dWld_acc) = carry
        (dh_dec_out, dctx_out, dw_out, g_att, g_dec, c_att_prev, c_dec_prev,
         h_att_d, w_prev, w_cum_prev, ctx_prev, h_dec_prev, w_t,
         m1, m2, m3, m4) = inp[:17]
        g_att = g_att.astype(jnp.float32)
        g_dec = g_dec.astype(jnp.float32)

        if recompute:
            # ---- recompute the attention forward intermediates (exact) ----
            # Same ops and inputs as the forward step: loc from the previous
            # attention weights, locd/q projections, tanh energies.
            loc = _loc_conv(w_prev, w_cum_prev,
                            scan_params["loc_w"])  # (B,S,F)
            locd = jnp.dot(loc, scan_params["loc_dense_w"],
                           preferred_element_type=jnp.float32)  # (B,S,A)
            q = jnp.dot(h_att_d, scan_params["query_w"],
                        preferred_element_type=jnp.float32)  # (B,A)
            tanh_arg = jnp.tanh(q[:, None, :] + locd + pmem)  # (B,S,A)
        else:
            tanh_arg = inp[17].astype(jnp.float32)
            loc = inp[18].astype(jnp.float32)

        # ---- decoder LSTM backward ----
        dh_dec_d = dh_dec_out + dh_dec_c
        dc_dec_d = dc_dec_c
        if cfg.train and cfg.n_half_keep_dec < 1.0:
            dh_dec = dh_dec_d * m3
            dc_dec = dc_dec_d * m4
        else:
            dh_dec, dc_dec = dh_dec_d, dc_dec_d
        # recompute c_dec (pre-dropout) for the o-gate term
        gi, gf, gg, _ = _split_gates(g_dec, H)
        c_dec = (jax.nn.sigmoid(gf) * c_dec_prev
                 + jax.nn.sigmoid(gi) * jnp.tanh(gg))
        dg_dec, dc_dec_prev = _lstm_bwd(g_dec, c_dec_prev, c_dec,
                                        dh_dec, dc_dec, H)
        dx_dec = dx_from_dg_dec(dg_dec)
        dh_att_d = dx_dec[:, :H] + dh_att_c
        dctx = dx_dec[:, H:H + E] + dctx_out + dctx_c
        dh_dec_prev = dx_dec[:, H + E:]

        # ---- attention backward ----
        # context = w @ memory
        dw = (dw_out + dw_prev_c + dwcum_c
              + jnp.einsum("be,bse->bs", dctx, memory,
                           preferred_element_type=jnp.float32))
        dwcum_new = dwcum_c  # passes through w_cum recurrence (see below)

        # softmax backward
        dsum = jnp.sum(dw * w_t, axis=1, keepdims=True)
        de = w_t * (dw - dsum)  # (B, S)

        dtanh = (de[:, :, None] * scan_params["v_w"][None, None, :, 0]
                 ) * (1.0 - tanh_arg * tanh_arg)  # (B,S,A)
        dq = jnp.sum(dtanh, axis=1)  # (B, A)
        dh_att_d = dh_att_d + jnp.dot(dq, scan_params["query_w"].T,
                                      preferred_element_type=jnp.float32)
        dloc = jnp.dot(dtanh, scan_params["loc_dense_w"].T,
                       preferred_element_type=jnp.float32)  # (B,S,F)
        # Accumulate the small attention weight grads in-scan (tiny fp32
        # accumulators stay in VMEM) instead of re-reading the (T,B,S,A)
        # tanh_arg/dtanh streams in post-scan einsums.  dpmem still rides
        # the dtanh scan output: a (B,S,A) carry accumulator is a per-step
        # HBM read-modify-write that measures slower than the extra pass.
        dv_acc = dv_acc + jnp.einsum(
            "bsa,bs->a", tanh_arg, de, preferred_element_type=jnp.float32)
        dWq_acc = dWq_acc + jnp.dot(
            h_att_d.T, dq, preferred_element_type=jnp.float32)
        dWld_acc = dWld_acc + jnp.einsum(
            "bsf,bsa->fa", loc, dtanh, preferred_element_type=jnp.float32)
        dfeats = _loc_conv_input_grad(dloc, scan_params["loc_w"])  # (B,S,2)
        dw_prev_new = dfeats[..., 0]
        dwcum_prev_ch = dfeats[..., 1]
        # w_cum_prev feeds both the conv (channel grad) and w_cum recurrence
        dwcum_prev = dwcum_prev_ch + dwcum_new

        # ---- attention LSTM backward ----
        if cfg.train and cfg.n_half_keep_att < 1.0:
            dh_att = dh_att_d * m1
            dc_att = dc_att_c * m2
        else:
            dh_att, dc_att = dh_att_d, dc_att_c
        gi, gf, gg, _ = _split_gates(g_att, H)
        c_att = (jax.nn.sigmoid(gf) * c_att_prev
                 + jax.nn.sigmoid(gi) * jnp.tanh(gg))
        dg_att, dc_att_prev = _lstm_bwd(g_att, c_att_prev, c_att,
                                        dh_att, dc_att, H)
        dx_att = dx_from_dg_att(dg_att)
        dpn = dx_att[:, :P]
        dctx_prev = dx_att[:, P:P + E]
        dh_att_prev = dx_att[:, P + E:]

        new_carry = (dh_att_prev, dc_att_prev, dh_dec_prev, dc_dec_prev,
                     dw_prev_new, dwcum_prev, dctx_prev,
                     dv_acc, dWq_acc, dWld_acc)
        # Stream the big per-step outputs in the compute dtype: they are
        # either consumed by bf16 matmuls (dg -> dW) or f32-accumulated
        # reductions (dtanh -> dpmem, dloc -> dWloc), so fp32 storage buys
        # nothing but HBM traffic.
        outs = (dg_att.astype(sdt), dg_dec.astype(sdt), dpn, dctx,
                dtanh.astype(sdt), dloc.astype(sdt))
        return new_carry, outs

    zmat = lambda *s: jnp.zeros(s, jnp.float32)
    F = scan_params["loc_dense_w"].shape[0]
    carry0 = (
        zmat(B, H), zmat(B, H), zmat(B, H), zmat(B, H),
        zmat(B, S), zmat(B, S), zmat(B, E),
        zmat(A), zmat(H, A), zmat(F, A),
    )
    xs = (dh_dec_seq, dctx_seq, dw_seq, g_att_seq, g_dec_seq,
          c_att_prev_seq, c_dec_prev_seq, h_att_seq, w_prev_seq,
          w_cum_prev_seq, ctx_prev_seq, h_dec_prev_seq, w_seq,
          *drop_masks)
    if not recompute:
        xs = xs + (tanh_arg_seq, loc_seq)
    final, (dg_att_seq, dg_dec_seq, dpn_seq, dctx_tot_seq,
            dtanh_seq, dloc_seq) = jax.lax.scan(
        step, carry0, xs, reverse=True
    )

    # ---- attention weight gradients (accumulated in-scan) ----
    dv = final[7][:, None]
    dWq = final[8]
    dWld = final[9]
    dpmem = jnp.sum(dtanh_seq, axis=0, dtype=jnp.float32)
    # conv weight grad over the flattened (T*B) batch
    dWloc = _loc_conv_weight_grad(
        w_prev_seq.reshape(T * B, S).astype(dloc_seq.dtype),
        w_cum_prev_seq.reshape(T * B, S).astype(dloc_seq.dtype),
        dloc_seq.reshape(T * B, S, -1), K,
    )

    # ---- batched weight gradients: two big MXU matmuls ----
    x_att_seq = jnp.concatenate(
        [prenet_seq.astype(sdt), ctx_prev_seq.astype(sdt),
         h_att_prev_seq.astype(sdt)], axis=-1
    ).reshape(T * B, -1)
    d_attn_w = _cdot(x_att_seq.T, dg_att_seq.reshape(T * B, -1), cfg)
    d_attn_b = jnp.sum(dg_att_seq, axis=(0, 1), dtype=jnp.float32)
    x_dec_seq = jnp.concatenate(
        [h_att_seq.astype(sdt), ctx_seq.astype(sdt),
         h_dec_prev_seq.astype(sdt)], axis=-1
    ).reshape(T * B, -1)
    d_dec_w = _cdot(x_dec_seq.T, dg_dec_seq.reshape(T * B, -1), cfg)
    d_dec_b = jnp.sum(dg_dec_seq, axis=(0, 1), dtype=jnp.float32)

    # memory cotangent: from context matmuls (one einsum over all steps)
    dmemory = jnp.einsum("tbs,tbe->bse", w_seq, dctx_tot_seq,
                         preferred_element_type=jnp.float32)

    d_scan_params = {
        "attn_w": d_attn_w, "attn_b": d_attn_b,
        "dec_w": d_dec_w, "dec_b": d_dec_b,
        "query_w": dWq, "loc_w": dWloc, "loc_dense_w": dWld, "v_w": dv,
    }
    d_add_mask = jnp.zeros_like(add_mask)  # mask derives from int lengths
    d_masks = tuple(jnp.zeros_like(m) for m in drop_masks)  # constants
    return (d_scan_params, dpn_seq, dmemory, dpmem, d_add_mask, d_masks)


scan_core.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Drop-in teacher-forced decoder using the custom-VJP core
# ---------------------------------------------------------------------------


def _env_flag(name: str, default: bool) -> bool:
    """Env override for the Pallas kernel switches: unset -> ``default``
    (the hp-resolved value), "1"/"0" force on/off (perf bisection)."""
    v = os.environ.get(name)
    if v is None:
        return default
    return v == "1"


# Trace-time dp-mesh scope: parallel.mesh.make_parallel_train_step enters it
# around the jitted step so teacher_forced knows it is being traced under a
# multi-chip mesh.  GSPMD cannot partition a Mosaic kernel, so under a mesh
# the Pallas training scan must run per-device inside shard_map over 'data'
# (weights replicated; the transpose of that replication psums the weight
# grads — exactly the dp gradient all-reduce).
_DP_TRACE_MESH = None


class dp_mesh_scope:
    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        global _DP_TRACE_MESH
        self._prev = _DP_TRACE_MESH
        _DP_TRACE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _DP_TRACE_MESH
        _DP_TRACE_MESH = self._prev
        return False


def _shard_mapped_scan_core(mesh, cfg):
    """scan_core wrapped per-device over the mesh's 'data' axis.

    Weights/add_mask replicated, batch dims split; Pallas kernels inside see
    the per-device batch.  AD is transparent: shard_map's transpose inserts
    the psum for replicated-weight grads (= dp grad all-reduce)."""
    from jax.sharding import PartitionSpec as P

    def f(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks):
        return scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg
        )

    def call(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks):
        w_specs = {k: P() for k in scan_params}
        mask_specs = tuple(
            P(None, "data", None) if m.shape[1] != 1 else P()
            for m in drop_masks
        )
        return jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(w_specs, P(None, "data", None), P("data", None, None),
                      P("data", None, None), P("data", None), mask_specs),
            out_specs=(P(None, "data", None),) * 3,
            check_vma=False,
        )(scan_params, prenet_seq, memory, pmem, add_mask, drop_masks)

    return call


def _pallas_vmem_estimate(hp, B: int, S: int, itemsize: int = 2) -> int:
    """Bytes the fused training-scan kernel pins in VMEM (loop-invariant
    buffers only; per-step streamed blocks are small).  Mirrors the arrays
    fwd_pallas/bwd_pallas materialize — band_f and v_exp grow ~S^2 and are
    what rules out very long text at large A.  ``itemsize`` is the stream
    dtype's (2 for bf16, 4 when the scan runs fp32)."""
    E = hp.encoder_embedding_dim
    A = hp.attention_dim
    H = hp.attention_rnn_dim
    P = hp.prenet_dim
    K = hp.attention_location_kernel_size
    bf16 = itemsize
    pinned = (
        2 * (S + K - 1) * S * A          # band_f (C=2 channels folded)
        + S * A * S                      # v_exp = kron(I_S, v)
        + B * S * E                      # memory_flat
        + B * S * A                      # pmem2
        + (P + E + H) * 4 * H            # attn_w
        + (2 * H + E) * 4 * H            # dec_w
        + H * A                          # query_w
        + S * S * A                      # rep_mat = kron(I_S, ones(1, A))
        + S * A * A                      # fold_a = kron(ones(S,1), I_A)
        + B * S * S                      # fold_s = kron(ones(B,1), I_S)
        + B * S * A                      # dta retile scratch
        + B * S * A                      # locd retile scratch
    ) * bf16
    pinned += 4 * B * B * S              # mask_bd (fp32)
    pinned += 4 * B * S * A              # dpmem accumulator output (f32)
    pinned += 4 * A * A                  # G accumulator output (f32)
    pinned += 4 * 7 * B * max(H, S, E)   # fp32 state scratch (upper bound)
    return pinned


def pallas_train_scan_enabled(hp, B: int, S: int, itemsize: int = 2,
                              sharded: bool = False) -> bool:
    """Resolve hp.use_pallas_train_scan ("auto"/"on"/"off") for this call.

    "auto" turns the fused fwd+bwd Pallas kernels on when they are the
    measured win: a real TPU backend (Mosaic; CPU tests use interpret mode
    explicitly), Mosaic-friendly model dims (lane-aligned attention/LSTM
    widths — the reference dims qualify), and a pinned-buffer VMEM
    estimate comfortably inside the kernel's 120MB budget.  The kernels
    win at EVERY batch size (v5e, S=128, T=512): B=1 24.0 vs 36.0 ms,
    B=2 24.5 vs 38.5, B=6 28.1 vs 32.7, B=64 79 vs 107 — pinning the
    ~36 MB of scan weights in VMEM pays in both the latency-bound and
    HBM-bound regimes, so there is no batch threshold.

    ``sharded=True`` means the caller runs the kernel per-device inside
    shard_map with ``B`` already the per-device batch; plain multi-device
    jit (sharded=False, >1 device) keeps the XLA scan because GSPMD cannot
    partition a Mosaic kernel — it would silently all-gather the
    dp-sharded batch onto every chip.
    """
    mode = getattr(hp, "use_pallas_train_scan", "off")
    if mode == "on":
        return True
    if mode != "auto":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        if not sharded and jax.device_count() != 1:
            return False
    except Exception:  # pragma: no cover - backend probe never fatal
        return False
    # Mosaic-friendly dims: the kernels lay attention out in (B, S*A) and
    # pin (·, 4H) weight tiles — lane-misaligned A/H (custom tiny configs)
    # are untested on hardware, so auto stays conservative there ("on"
    # still forces, and interpret-mode tests cover odd dims).
    if hp.attention_dim % 128 != 0 or hp.attention_rnn_dim % 128 != 0:
        return False
    # fp16_run streams float16 — hardware-pinned: Mosaic REJECTS the
    # f16-stream kernel at reference dims on v5e (tools/fp16_kernel_probe.py,
    # remote-compile exit 1) while the same shape compiles at bf16; keep
    # auto off there (the XLA scan handles fp16 fine).
    if getattr(hp, "fp16_run", False) or hp.compute_dtype == "float16":
        return False
    # Ceiling calibrated on v5e hardware at reference dims, bf16 streams:
    # S=128/B=64 estimates 79.9 MiB and compiles+wins; S=160/B=64
    # estimates 96.5 MiB and the BACKWARD kernel fails Mosaic compile
    # (the estimate under-counts Mosaic's double-buffered step blocks
    # against the 120 MiB vmem limit).  88 MiB splits the two observed
    # outcomes; long-text buckets beyond it keep the XLA scan.
    return _pallas_vmem_estimate(hp, B, S, itemsize) <= 88 * 1024 * 1024


def pallas_train_scan_will_engage(hp, B: int, S: int, itemsize: int = 2):
    """Mesh-aware resolve of ``pallas_train_scan_enabled``: when a dp trace
    mesh is active (teacher_forced routes per-device via shard_map), probe
    with the PER-DEVICE batch and ``sharded=True`` — so callers deciding
    dtype/kernel policy (e.g. the scan-dtype "auto" rule in
    models/tacotron2.py) resolve identically on single-chip and mesh runs."""
    mesh = _DP_TRACE_MESH
    if mesh is not None:
        dp = int(mesh.shape.get("data", 1))
        return B % dp == 0 and pallas_train_scan_enabled(
            hp, B // dp, S, itemsize, sharded=True
        )
    return pallas_train_scan_enabled(hp, B, S, itemsize)


def teacher_forced(params, memory, mels, memory_lengths, hp, *,
                   train: bool, rng, dtype=None,
                   prenet_dropout_enabled: bool = True):
    """API-compatible with decoder.teacher_forced, using hand-written BPTT.

    `dtype` selects the compute dtype for the recurrent matmuls in BOTH
    directions (fp32 accumulation always).
    """
    from .decoder import group_frames, prenet as prenet_fn, ungroup_mel
    from ..ops.layers import linear

    B, S, E = memory.shape
    n_mel = hp.n_mel_channels
    r = hp.n_frames_per_step
    T = mels.shape[2] // r  # scan steps (r frames per step)

    groups = group_frames(mels, r)  # (B, T, r*n_mel)
    decoder_inputs = jnp.concatenate(
        [jnp.zeros((B, 1, r * n_mel), groups.dtype), groups[:, :-1]], axis=1
    )
    rng, pk = jax.random.split(rng)
    prenet_out = prenet_fn(
        params["prenet"], decoder_inputs, pk,
        dropout_enabled=prenet_dropout_enabled, dtype=dtype,
    )
    prenet_seq = jnp.swapaxes(prenet_out, 0, 1)  # (T, B, P)

    pmem = linear(params["attention"]["memory"], memory)  # (B, S, A)
    if memory_lengths is not None:
        valid = jnp.arange(S)[None, :] < memory_lengths[:, None]
        add_mask = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
    else:
        add_mask = jnp.zeros((B, S), jnp.float32)

    # Bulk-generate dropout masks (pre-scaled): in-scan RNG is ~20% of the
    # step; one big bernoulli is nearly free.
    H = hp.attention_rnn_dim
    if train and (hp.p_attention_dropout > 0 or hp.p_decoder_dropout > 0):
        # rbg keys lower to the TPU's hardware bit generator — ~2x faster
        # than threefry for the ~0.5G mask bits per step.  Recurrent-dropout
        # masks need no cross-platform bit stability (the model RNG paths
        # that do — VAE sampling, prenet — stay on threefry).
        try:
            rng = jax.random.wrap_key_data(
                jnp.tile(jax.random.key_data(rng), 2), impl="rbg"
            )
        except Exception:  # pragma: no cover - older jax fallback
            pass
        km = jax.random.split(rng, 4)
        keep_a = 1.0 - hp.p_attention_dropout
        keep_d = 1.0 - hp.p_decoder_dropout
        mdt = jnp.dtype(dtype) if dtype is not None else jnp.float32
        drop_masks = (
            _dropout_mask(km[0], (T, B, H), keep_a, mdt),
            _dropout_mask(km[1], (T, B, H), keep_a, mdt),
            _dropout_mask(km[2], (T, B, hp.decoder_rnn_dim), keep_d, mdt),
            _dropout_mask(km[3], (T, B, hp.decoder_rnn_dim), keep_d, mdt),
        )
    else:
        ones = jnp.ones((T, 1, 1), jnp.float32)
        drop_masks = (ones, ones, ones, ones)

    scan_params = {
        "attn_w": jnp.concatenate(
            [params["attention_rnn"]["wi"], params["attention_rnn"]["wh"]],
            axis=0,
        ),
        "attn_b": params["attention_rnn"]["bi"] + params["attention_rnn"]["bh"],
        "dec_w": jnp.concatenate(
            [params["decoder_rnn"]["wi"], params["decoder_rnn"]["wh"]], axis=0
        ),
        "dec_b": params["decoder_rnn"]["bi"] + params["decoder_rnn"]["bh"],
        "query_w": params["attention"]["query"]["w"],
        "loc_w": params["attention"]["loc_conv"]["w"],
        "loc_dense_w": params["attention"]["loc_dense"]["w"],
        "v_w": params["attention"]["v"]["w"],
    }
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 4
    mesh = _DP_TRACE_MESH
    mesh_splits = True
    if mesh is not None:
        mesh_splits = B % int(mesh.shape.get("data", 1)) == 0
        # Per-device kernel via shard_map over 'data'; the batch must split
        # evenly.  A tp ('model') axis is fine: the scan weights are
        # replicated across it (the recurrent cells are deliberately not
        # tensor-parallel, parallel/mesh.py), so the kernel runs replicated
        # on model ranks — same compute GSPMD would emit for a
        # replicated-weight scan — and shard_map's transpose yields exactly
        # the single-device weight grads (tp=2 parity test-pinned; the tiny
        # tp-sharded query_w is all-gathered by its P() in_spec).
    pallas_on = bool(mesh_splits) and pallas_train_scan_will_engage(
        hp, B, S, itemsize
    )
    # Under a mesh whose 'data' axis does not divide B, shard_map cannot
    # split the batch — the kernels are unavailable there, and even the
    # T2V_PALLAS_* force-flags must not route into a trace-time error.
    forcible = mesh is None or mesh_splits
    cfg = ScanConfig(
        n_half_keep_att=1.0 - hp.p_attention_dropout,
        n_half_keep_dec=1.0 - hp.p_decoder_dropout,
        train=train,
        compute_dtype=jnp.dtype(dtype).name if dtype is not None else "float32",
        use_pallas_fwd=forcible and _env_flag("T2V_PALLAS_FWD", pallas_on),
        use_pallas_bwd=forcible and _env_flag("T2V_PALLAS_BWD", pallas_on),
        pallas_interpret=_env_flag("T2V_PALLAS_INTERPRET", False),
    )
    if mesh is not None and (cfg.use_pallas_fwd or cfg.use_pallas_bwd):
        h_dec_seq, ctx_seq, w_seq = _shard_mapped_scan_core(mesh, cfg)(
            scan_params, prenet_seq, memory, pmem, add_mask, drop_masks
        )
    else:
        h_dec_seq, ctx_seq, w_seq = scan_core(
            scan_params, prenet_seq, memory, pmem, add_mask, drop_masks, cfg
        )
    # Layout firewall: without it, XLA propagates the FINAL (B, n_mel, T)
    # transpose's layout back through the projections INTO the scan, so
    # every step's h_dec/ctx DUS writes scatter across a T-major buffer
    # (profiled at ~6ms/step at B=64).  The barrier keeps the scan outputs
    # time-major and pays one bulk transpose outside the loop instead.
    h_dec_seq, ctx_seq = jax.lax.optimization_barrier((h_dec_seq, ctx_seq))

    hidden_ctx = jnp.concatenate([h_dec_seq, ctx_seq], axis=-1)  # (T, B, ·)
    mel_out = linear(params["proj"], hidden_ctx, dtype=dtype)
    gate_out = linear(params["gate"], hidden_ctx, dtype=dtype)[..., 0]

    return (
        ungroup_mel(mel_out, n_mel, r),
        jnp.swapaxes(gate_out, 0, 1),
        jnp.swapaxes(w_seq, 0, 1),
    )
