"""Recurrent cells and scans (LSTM / BiLSTM / GRU) — lax.scan, TPU-friendly.

Gate ordering and parameter layout follow PyTorch conventions (LSTM: i,f,g,o;
GRU: r,z,n) so reference checkpoints convert by transposition only.  Replaces
the reference's cuDNN nn.LSTM/nn.LSTMCell/nn.GRU (model.py:171-173,224-235,
modules.py:60-62) with XLA-compiled scans; per-step input/hidden projections
are fused into single MXU matmuls.

Variable-length handling reproduces `pack_padded_sequence` semantics
(model.py:183-190): state updates are masked off at padded steps and padded
outputs are zero.  For the backward direction we scan the time-reversed
sequence; padded steps (which come first in reversed order) keep the initial
zero state, which is exactly what packing computes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import fanin_uniform


def lstm_init(key, in_dim, hidden):
    """PyTorch LSTM/LSTMCell init: all tensors U(-1/sqrt(H), 1/sqrt(H))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wi": fanin_uniform(k1, (in_dim, 4 * hidden), hidden),
        "wh": fanin_uniform(k2, (hidden, 4 * hidden), hidden),
        "bi": fanin_uniform(k3, (4 * hidden,), hidden),
        "bh": fanin_uniform(k4, (4 * hidden,), hidden),
    }


def lstm_cell(p, x, h, c, dtype=None):
    """One LSTM step. x: (B, D), h/c: (B, H) -> (h', c')."""
    if dtype is not None:
        x, h = x.astype(dtype), h.astype(dtype)
        wi, wh = p["wi"].astype(dtype), p["wh"].astype(dtype)
    else:
        wi, wh = p["wi"], p["wh"]
    gates = (
        jnp.dot(x, wi, preferred_element_type=jnp.float32)
        + jnp.dot(h, wh, preferred_element_type=jnp.float32)
        + p["bi"] + p["bh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(p, xs, lengths=None, reverse=False, dtype=None):
    """Unidirectional LSTM over (B, T, D) -> (B, T, H) outputs.

    With `lengths`, packed-sequence semantics: padded steps don't update the
    state and produce zero outputs.
    """
    B, T, _ = xs.shape
    H = p["wh"].shape[0]
    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)

    ts = jnp.arange(T)
    if reverse:
        xs = xs[:, ::-1]
        ts = ts[::-1]

    def step(carry, inp):
        h, c = carry
        x, t = inp
        h_new, c_new = lstm_cell(p, x, h, c, dtype=dtype)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            h_new = jnp.where(valid, h_new, h)
            c_new = jnp.where(valid, c_new, c)
            out = jnp.where(valid, h_new, 0.0)
        else:
            out = h_new
        return (h_new, c_new), out

    xs_t = jnp.swapaxes(xs, 0, 1)  # (T, B, D)
    (_, _), outs = jax.lax.scan(step, (h0, c0), (xs_t, ts))
    outs = jnp.swapaxes(outs, 0, 1)  # (B, T, H)
    if reverse:
        outs = outs[:, ::-1]
    return outs


def bilstm_init(key, in_dim, hidden):
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_init(kf, in_dim, hidden), "bwd": lstm_init(kb, in_dim, hidden)}


def bilstm(p, xs, lengths=None, dtype=None):
    """Bidirectional LSTM: (B, T, D) -> (B, T, 2H)."""
    fwd = lstm_scan(p["fwd"], xs, lengths, reverse=False, dtype=dtype)
    bwd = lstm_scan(p["bwd"], xs, lengths, reverse=True, dtype=dtype)
    return jnp.concatenate([fwd, bwd], axis=-1)


def gru_init(key, in_dim, hidden):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "wi": fanin_uniform(k1, (in_dim, 3 * hidden), hidden),
        "wh": fanin_uniform(k2, (hidden, 3 * hidden), hidden),
        "bi": fanin_uniform(k3, (3 * hidden,), hidden),
        "bh": fanin_uniform(k4, (3 * hidden,), hidden),
    }


def gru_cell(p, x, h, dtype=None):
    """One GRU step, PyTorch gate order (r, z, n) and bias placement."""
    if dtype is not None:
        x, h = x.astype(dtype), h.astype(dtype)
        wi, wh = p["wi"].astype(dtype), p["wh"].astype(dtype)
    else:
        wi, wh = p["wi"], p["wh"]
    gi = jnp.dot(x, wi, preferred_element_type=jnp.float32) + p["bi"]
    gh = jnp.dot(h, wh, preferred_element_type=jnp.float32) + p["bh"]
    ir, iz, in_ = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1.0 - z) * n + z * h.astype(n.dtype)


def gru_scan(p, xs, lengths=None, dtype=None):
    """GRU over (B, T, D); returns (outputs (B, T, H), final state (B, H))."""
    B, T, _ = xs.shape
    H = p["wh"].shape[0]
    h0 = jnp.zeros((B, H), jnp.float32)
    ts = jnp.arange(T)

    def step(h, inp):
        x, t = inp
        h_new = gru_cell(p, x, h, dtype=dtype)
        if lengths is not None:
            valid = (t < lengths)[:, None]
            h_new = jnp.where(valid, h_new, h)
        return h_new, h_new

    h_final, outs = jax.lax.scan(step, h0, (jnp.swapaxes(xs, 0, 1), ts))
    return jnp.swapaxes(outs, 0, 1), h_final
