"""Core parameterized ops: linear, conv, batchnorm — pure-functional JAX.

Parameters are plain nested dicts (pytrees); weights use JAX-native layouts
(linear: (in, out); conv1d: (width, in, out) / NWC; conv2d: (h, w, in, out) /
NHWC).  Initializers reproduce the reference's distributions:
xavier-uniform with `torch.nn.init.calculate_gain` gains (reference
layers.py:7-51) and PyTorch's default RNN/Linear uniform fan-in init.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

GAINS = {
    "linear": 1.0,
    "relu": math.sqrt(2.0),
    "tanh": 5.0 / 3.0,
    "sigmoid": 1.0,
}


def xavier_uniform(key, shape, fan_in, fan_out, gain=1.0, dtype=jnp.float32):
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def fanin_uniform(key, shape, fan_in, dtype=jnp.float32):
    """PyTorch default nn.Linear / RNN init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)


# --- Linear --------------------------------------------------------------------


def linear_init(key, in_dim, out_dim, bias=True, w_init_gain="linear"):
    """Xavier-uniform linear (reference LinearNorm, layers.py:7-17)."""
    p = {
        "w": xavier_uniform(
            key, (in_dim, out_dim), in_dim, out_dim, GAINS[w_init_gain]
        )
    }
    if bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def torch_linear_init(key, in_dim, out_dim, bias=True):
    """PyTorch default nn.Linear init (used for the VAE fc heads)."""
    kw, kb = jax.random.split(key)
    p = {"w": fanin_uniform(kw, (in_dim, out_dim), in_dim)}
    if bias:
        p["b"] = fanin_uniform(kb, (out_dim,), in_dim)
    return p


def linear(p, x, dtype=None):
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


# --- Conv1d (NWC) ---------------------------------------------------------------


def conv1d_init(key, in_ch, out_ch, kernel_size, bias=True, w_init_gain="linear"):
    """Xavier-uniform 1-D conv (reference ConvNorm, layers.py:20-36)."""
    fan_in = in_ch * kernel_size
    fan_out = out_ch * kernel_size
    p = {
        "w": xavier_uniform(
            key, (kernel_size, in_ch, out_ch), fan_in, fan_out, GAINS[w_init_gain]
        )
    }
    if bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def conv1d(p, x, stride=1, padding="SAME", dtype=None):
    """x: (B, T, C_in) -> (B, T', C_out).

    The stride-1 SAME small-K big-batch path (the encoder/postnet k=5
    convs, which dominate conv time in training) runs as K shifted
    MATMULS accumulated in fp32 — y[t] = sum_k x[t+k-pad] @ W[k] — instead
    of lax.conv: XLA's TPU conv *backward* (dW contraction over the big
    B*T batch) profiled at ~35% of the MXU rate the equivalent matmul
    transpose achieves, and the forward fuses the same.  Gated to K <= 7
    and B*T >= 1024: at K=31 (the location conv inside the serving
    while-loop) 31 slice+matmul ops would be pure latency, and lax.conv
    wins.  Numerics: fp32 accumulation across taps (closer to the MXU's
    internal conv accumulation than per-tap rounding) and an fp32 bias
    add fused into the same epilogue, then ONE cast back to the compute
    dtype.  Under a bf16 compute dtype the conv OUTPUT stream is bf16 —
    round-4 profiling showed the old fp32-promoting bias add made every
    interstitial encoder/postnet tensor (conv -> BN -> act -> dropout ->
    next conv, fwd and bwd cotangents alike) a 67 MB fp32 stream plus a
    convert pass per layer, ~3-4 ms/step of pure HBM traffic at B=64.
    """
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    K = w.shape[0]
    pad_l = pad_r = None
    if padding == "SAME":
        pad_l, pad_r = (K - 1) // 2, K - 1 - (K - 1) // 2
    elif isinstance(padding, int):
        pad_l = pad_r = padding
    if (stride == 1 and pad_l is not None and pad_l + pad_r == K - 1
            and K <= 7 and x.shape[0] * x.shape[1] >= 1024):
        # K shifted matmuls beat the im2col single-matmul form on v5e
        # (72.5 vs 76.1 ms full step at B=64): the stack materializes a
        # K x larger activation stream, and XLA fuses the K-term
        # accumulation into the matmul epilogues anyway.
        T = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
        y = None
        for k in range(K):
            xk = jax.lax.dynamic_slice_in_dim(xp, k, T, axis=1)
            term = jnp.einsum("bti,io->bto", xk, w[k],
                              preferred_element_type=jnp.float32)
            y = term if y is None else y + term
        if "b" in p:
            y = y + p["b"]          # fp32 add, fused into the accumulation
        return y.astype(x.dtype)    # one cast; bf16 stream under bf16 compute
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = (y + p["b"]).astype(y.dtype) if dtype is not None else y + p["b"]
    return y


# --- Conv2d (NHWC) --------------------------------------------------------------


def conv2d_init(key, in_ch, out_ch, kernel_size, bias=True):
    """PyTorch-default-init 2-D conv (reference ReferenceEncoder convs)."""
    kh, kw_ = kernel_size
    fan_in = in_ch * kh * kw_
    k1, k2 = jax.random.split(key)
    p = {"w": fanin_uniform(k1, (kh, kw_, in_ch, out_ch), fan_in)}
    if bias:
        p["b"] = fanin_uniform(k2, (out_ch,), fan_in)
    return p


def conv2d(p, x, stride=(1, 1), padding=((1, 1), (1, 1)), dtype=None):
    """x: (B, H, W, C_in) -> (B, H', W', C_out)."""
    w = p["w"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = (y + p["b"]).astype(y.dtype) if dtype is not None else y + p["b"]
    return y


# --- BatchNorm ------------------------------------------------------------------


def batchnorm_init(ch):
    params = {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))}
    state = {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}
    return params, state


def batchnorm(params, state, x, train: bool, momentum=0.1, eps=1e-5):
    """Channel-last batchnorm; `momentum` follows PyTorch semantics.

    Returns (y, new_state).  x: (..., C); stats over all non-channel axes.
    Statistics/params/state are always fp32, but the OUTPUT keeps x's
    dtype: under a bf16 compute dtype the normalize is a bf16-in/bf16-out
    elementwise pass (fp32 math fused in-register), not an fp32
    materialization — the standard mixed-precision BN contract (and what
    keeps the encoder/postnet interstitial streams bf16, see conv1d).
    """
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    if train:
        # One-pass stats: E[x] and E[x*x] fuse into a single read of the
        # conv-output stream (jnp.var's mean-then-moment form re-reads it).
        mean = jnp.mean(xf, axis=axes)
        var = jnp.maximum(jnp.mean(xf * xf, axis=axes) - mean * mean, 0.0)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = ((xf - mean) * inv + params["bias"]).astype(x.dtype)
    return y, new_state


# --- Dropout --------------------------------------------------------------------


def dropout(key, x, rate: float, enabled: bool = True):
    if not enabled or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# --- Embedding ------------------------------------------------------------------


def embedding_init(key, n_symbols, dim):
    """Uniform ±sqrt(3)·sqrt(2/(n+d)) (reference model.py:480-482)."""
    std = math.sqrt(2.0 / (n_symbols + dim))
    val = math.sqrt(3.0) * std
    return {"table": jax.random.uniform(key, (n_symbols, dim), jnp.float32, -val, val)}


def embedding(p, ids):
    return jnp.take(p["table"], ids, axis=0)
