"""Transcript encoder: 3x (conv5 + BN + ReLU + dropout) -> BiLSTM.

Parity target: reference ``Encoder`` (model.py:151-203).  The BiLSTM
reproduces pack_padded_sequence semantics via masked scans (see ops/rnn.py);
`inference` (no length masking) is the `lengths=None` path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import batchnorm, batchnorm_init, conv1d, conv1d_init, dropout
from ..ops.rnn import bilstm, bilstm_init

DROP_RATE = 0.5  # reference model.py:11


def init(key, hp):
    dim = hp.encoder_embedding_dim
    keys = jax.random.split(key, hp.encoder_n_convolutions + 1)
    convs, bns, bn_state = [], [], []
    for i in range(hp.encoder_n_convolutions):
        convs.append(
            conv1d_init(keys[i], dim, dim, hp.encoder_kernel_size,
                        w_init_gain="relu")
        )
        bn_p, bn_s = batchnorm_init(dim)
        bns.append(bn_p)
        bn_state.append(bn_s)
    lstm = bilstm_init(keys[-1], dim, dim // 2)
    return {"convs": convs, "bns": bns, "lstm": lstm}, {"bns": bn_state}


def apply(params, state, x, lengths, *, train: bool, rng, dtype=None,
          mask_conv_inputs: bool = False):
    """x: (B, T, encoder_dim) embedded text -> (B, T, encoder_dim).

    lengths=None gives the reference's `.inference()` path (model.py:194-203).
    mask_conv_inputs=True zeroes padded positions before every conv so a
    bucket-padded sequence produces bit-identical valid outputs to the
    unpadded run (a conv's zero boundary == zeroed padding); training keeps
    the reference semantics (pad embeddings leak into the conv receptive
    field, model.py:175-178).
    """
    mask = None
    if mask_conv_inputs and lengths is not None:
        mask = (jnp.arange(x.shape[1])[None, :] < lengths[:, None])[..., None]
    new_bns = []
    for i, (cp, bp) in enumerate(zip(params["convs"], params["bns"])):
        if mask is not None:
            x = jnp.where(mask, x, 0.0)
        x = conv1d(cp, x, padding="SAME", dtype=dtype)
        x, bn_s = batchnorm(bp, state["bns"][i], x, train)
        x = jax.nn.relu(x)
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, DROP_RATE, enabled=train)
        new_bns.append(bn_s)
    outputs = bilstm(params["lstm"], x, lengths, dtype=dtype)
    return outputs, {"bns": new_bns}
