"""Postnet: 5x (conv5 512ch + BN + tanh + dropout) residual mel refiner.

Parity target: reference ``Postnet`` (model.py:105-148) — including dropout
applied after the final (linear-gain) conv as well (model.py:146).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import batchnorm, batchnorm_init, conv1d, conv1d_init, dropout

DROP_RATE = 0.5


def init(key, hp):
    n = hp.postnet_n_convolutions
    keys = jax.random.split(key, n)
    convs, bns, bn_state = [], [], []
    dims = (
        [hp.n_mel_channels]
        + [hp.postnet_embedding_dim] * (n - 1)
        + [hp.n_mel_channels]
    )
    for i in range(n):
        gain = "tanh" if i < n - 1 else "linear"
        convs.append(
            conv1d_init(keys[i], dims[i], dims[i + 1], hp.postnet_kernel_size,
                        w_init_gain=gain)
        )
        bn_p, bn_s = batchnorm_init(dims[i + 1])
        bns.append(bn_p)
        bn_state.append(bn_s)
    return {"convs": convs, "bns": bns}, {"bns": bn_state}


def apply(params, state, mel, *, train: bool, rng, dtype=None):
    """mel: (B, n_mel, T) -> residual (B, n_mel, T)."""
    x = jnp.swapaxes(mel, 1, 2)  # NWC
    n = len(params["convs"])
    new_bns = []
    for i, (cp, bp) in enumerate(zip(params["convs"], params["bns"])):
        x = conv1d(cp, x, padding="SAME", dtype=dtype)
        x, bn_s = batchnorm(bp, state["bns"][i], x, train)
        if i < n - 1:
            x = jnp.tanh(x)
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, DROP_RATE, enabled=train)
        new_bns.append(bn_s)
    return jnp.swapaxes(x, 1, 2), {"bns": new_bns}
