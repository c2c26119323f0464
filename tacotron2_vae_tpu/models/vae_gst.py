"""VAE-GST style encoder: CoordConv reference encoder + GRU + VAE heads.

Parity targets: reference ``VAE_GST`` (modules.py:8-31), ``ReferenceEncoder``
(modules.py:34-85), ``AddCoords``/``CoordConv2d`` rank-2 with_r=True
(CoordConv.py:8-74,108-135).

The CoordConv's coordinate planes are just broadcast iotas concatenated as
channels — computed inline, no special layer needed on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    linear,
    torch_linear_init,
)
from ..ops.rnn import gru_init, gru_scan


def _conv_out_len(L: int, n_convs: int, kernel=3, stride=2, pad=1) -> int:
    for _ in range(n_convs):
        L = (L - kernel + 2 * pad) // stride + 1
    return L


def init(key, hp):
    K = len(hp.ref_enc_filters)
    filters = [1] + list(hp.ref_enc_filters)
    keys = jax.random.split(key, K + 4)

    convs, bns, bn_state = [], [], []
    for i in range(K):
        in_ch = filters[i]
        if i == 0:
            in_ch += 3  # CoordConv with_r: +x, +y, +r channels
        convs.append(conv2d_init(keys[i], in_ch, filters[i + 1], (3, 3)))
        bn_p, bn_s = batchnorm_init(filters[i + 1])
        bns.append(bn_p)
        bn_state.append(bn_s)

    out_freq = _conv_out_len(hp.n_mel_channels, K)
    gru = gru_init(keys[K], hp.ref_enc_filters[-1] * out_freq, hp.E // 2)

    fc1 = torch_linear_init(keys[K + 1], hp.ref_enc_gru_size, hp.z_latent_dim)
    fc2 = torch_linear_init(keys[K + 2], hp.ref_enc_gru_size, hp.z_latent_dim)
    fc3 = torch_linear_init(keys[K + 3], hp.z_latent_dim, hp.E)
    params = {"convs": convs, "bns": bns, "gru": gru,
              "fc1": fc1, "fc2": fc2, "fc3": fc3}
    return params, {"bns": bn_state}


def add_coords_2d(x: jnp.ndarray, lengths=None) -> jnp.ndarray:
    """Append normalized row/col/radius channels (NHWC).

    Matches reference AddCoords rank-2 with_r=True (CoordConv.py:37-74):
    row index scaled by H-1 to [-1,1], col index by W-1, radius about the
    post-scaling 0.5 point.

    With ``lengths`` (B,), rows are normalized by each item's OWN valid
    height (the per-item H the reference would see for an unpadded clip),
    so bucket-padded batches reproduce per-item coordinates exactly;
    rows >= length are zeroed (the caller re-zeroes them anyway).
    """
    B, H, W, _ = x.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (B, H, W, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (B, H, W, 1), 2)
    if lengths is None:
        rows = rows / jnp.maximum(H - 1, 1) * 2.0 - 1.0
    else:
        den = jnp.maximum(lengths - 1, 1).astype(jnp.float32)
        rows = rows / den[:, None, None, None] * 2.0 - 1.0
    cols = cols / jnp.maximum(W - 1, 1) * 2.0 - 1.0
    r = jnp.sqrt((rows - 0.5) ** 2 + (cols - 0.5) ** 2)
    out = jnp.concatenate([x, rows, cols, r], axis=-1)
    if lengths is not None:
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, H, 1, 1), 1)
            < lengths[:, None, None, None]
        )
        out = jnp.where(valid, out, 0.0)
    return out


def add_coords_1d(x: jnp.ndarray, with_r: bool = False) -> jnp.ndarray:
    """Rank-1 CoordConv coordinates (NWC): append a position channel in
    [-1,1]; ``with_r`` adds |pos - 0.5|.

    Parity with reference AddCoords rank-1 (CoordConv.py:19-35) — defined
    there but never instantiated (only rank-2 is used); provided for API
    completeness.
    """
    B, W, _ = x.shape
    pos = jax.lax.broadcasted_iota(jnp.float32, (B, W, 1), 1)
    pos = pos / jnp.maximum(W - 1, 1) * 2.0 - 1.0
    out = jnp.concatenate([x, pos], axis=-1)
    if with_r:
        out = jnp.concatenate([out, jnp.abs(pos - 0.5)], axis=-1)
    return out


def add_coords_3d(x: jnp.ndarray, with_r: bool = False) -> jnp.ndarray:
    """Rank-3 CoordConv coordinates (NDHWC): append normalized depth/row/col
    channels in [-1,1]; ``with_r`` adds the radius about the 0.5 point.

    The reference's rank-3 branch (CoordConv.py:77-120) is vestigial (never
    instantiated) and emits unnormalized integer ramps; this implementation
    uses the normalized form consistent with its rank-1/2 branches.
    """
    B, D, H, W, _ = x.shape
    ds = jax.lax.broadcasted_iota(jnp.float32, (B, D, H, W, 1), 1)
    rs = jax.lax.broadcasted_iota(jnp.float32, (B, D, H, W, 1), 2)
    cs = jax.lax.broadcasted_iota(jnp.float32, (B, D, H, W, 1), 3)
    ds = ds / jnp.maximum(D - 1, 1) * 2.0 - 1.0
    rs = rs / jnp.maximum(H - 1, 1) * 2.0 - 1.0
    cs = cs / jnp.maximum(W - 1, 1) * 2.0 - 1.0
    out = jnp.concatenate([x, ds, rs, cs], axis=-1)
    if with_r:
        r = jnp.sqrt((ds - 0.5) ** 2 + (rs - 0.5) ** 2 + (cs - 0.5) ** 2)
        out = jnp.concatenate([out, r], axis=-1)
    return out


def reference_encoder(params, state, mel, *, train: bool, dtype=None,
                      raw_reshape: bool = False, mel_lengths=None):
    """mel: (B, n_mels, T) -> (B, E//2) prosody summary.

    Reference modules.py:65-80: view as (B,1,T,n_mels) image, 6 stride-2
    convs (first CoordConv), BN+ReLU, flatten freq x channel, GRU, final state.

    Input layout (documented deviation, see config.ref_enc_raw_reshape):
    the reference's ``inputs.contiguous().view(N, 1, -1, n_mels)``
    (modules.py:67) is a RAW-MEMORY reshape of the (B, n_mel, T) mel — each
    image row is n_mels consecutive time samples of one mel channel, NOT a
    (time, frequency) patch.  The default here is the corrected true
    transpose; ``raw_reshape=True`` reproduces the reference layout
    bit-for-bit for converted upstream checkpoints (whose conv weights were
    trained on the scrambled image).

    With ``mel_lengths`` (B,), mels may be zero-padded along time to a
    shared static length and the result is EXACT for each item: invalid
    time rows are re-zeroed after every conv+BN+ReLU level (BN's bias makes
    conv-of-zeros nonzero, which would otherwise bleed into the next
    level's boundary — same invariant as the transcript encoder's masked
    convs), and the GRU freezes its state past each item's valid step
    count.  This is what lets the serving centroid precompute batch
    hundreds of variable-length reference clips into a few bucketed jit
    calls instead of one eager forward per clip.
    """
    if raw_reshape:
        if mel_lengths is not None:
            raise ValueError(
                "mel_lengths masking is undefined for the raw_reshape "
                "compat layout (time is scrambled across image rows)"
            )
        # numpy/jax row-major == torch contiguous: same buffer reinterpretation
        x = mel.reshape(mel.shape[0], -1, mel.shape[1])[..., None]  # NHWC
    else:
        x = jnp.swapaxes(mel, 1, 2)[..., None]  # (B, T, n_mels, 1) NHWC
    valid_len = None
    if mel_lengths is not None:
        valid_len = jnp.asarray(mel_lengths, jnp.int32)
        x = jnp.where(
            (jnp.arange(x.shape[1])[None, :] < valid_len[:, None])
            [:, :, None, None],
            x, 0.0,
        )
    new_bns = []
    for i, (cp, bp) in enumerate(zip(params["convs"], params["bns"])):
        if i == 0:
            x = add_coords_2d(x, lengths=valid_len)
        x = conv2d(cp, x, stride=(2, 2), padding=((1, 1), (1, 1)), dtype=dtype)
        x, bn_s = batchnorm(bp, state["bns"][i], x, train)
        x = jax.nn.relu(x)
        if valid_len is not None:
            # stride-2 k=3 pad-1 output count for a length-L input
            valid_len = (valid_len - 1) // 2 + 1
            x = jnp.where(
                (jnp.arange(x.shape[1])[None, :] < valid_len[:, None])
                [:, :, None, None],
                x, 0.0,
            )
        new_bns.append(bn_s)
    B, T, F, C = x.shape
    # Match reference flattening order: NCHW out is transposed to
    # [N, T, C, F'] before the view (modules.py:73-76), i.e. channel-major.
    x = jnp.swapaxes(x, 2, 3).reshape(B, T, C * F)
    _, h_final = gru_scan(params["gru"], x, lengths=valid_len, dtype=dtype)
    return h_final, {"bns": new_bns}


def apply(params, state, mel, *, train: bool, rng=None, dtype=None,
          raw_reshape: bool = False, mel_lengths=None):
    """VAE forward: mel (B, n_mels, T) -> (style_embed, mu, logvar, z), state.

    Training samples z = mu + eps*std; eval returns mu (modules.py:16-22).
    ``raw_reshape`` selects the reference-compatible input layout and
    ``mel_lengths`` enables exact bucket-padded batching (see
    ``reference_encoder``).
    """
    enc, new_state = reference_encoder(params, state, mel, train=train,
                                       dtype=dtype, raw_reshape=raw_reshape,
                                       mel_lengths=mel_lengths)
    mu = linear(params["fc1"], enc)
    logvar = linear(params["fc2"], enc)
    if train:
        if rng is None:
            raise ValueError("rng required for VAE sampling in training")
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, std.dtype)
        z = mu + eps * std
    else:
        z = mu
    style_embed = linear(params["fc3"], z)
    return (style_embed, mu, logvar, z), new_state
