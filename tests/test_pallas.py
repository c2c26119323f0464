"""Pallas fused decode-loop kernel: interpret-mode parity vs the XLA path.

The same kernel is compiled for real on TPU (exercised by bench.py and the
serving path); on CPU CI it runs through the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.models import decoder as dec
from tacotron2_vae_tpu.ops.layers import linear
from tacotron2_vae_tpu.ops.pallas import decoder_loop as dl

TINY = (
    "symbols_embedding_dim=64,encoder_embedding_dim=64,attention_rnn_dim=64,"
    "decoder_rnn_dim=64,prenet_dim=32,attention_dim=32,postnet_embedding_dim=64,"
    "E=64,ref_enc_gru_size=32,z_latent_dim=8,ref_enc_filters=[2,2,4,4,8,8],"
    "attention_location_n_filters=8,compute_dtype='float32'"
)


@pytest.fixture(scope="module")
def setup():
    hp = create_hparams(TINY)
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(0)
    S = 16
    memory = jnp.asarray(
        rng.randn(1, S, hp.encoder_embedding_dim).astype(np.float32) * 0.3
    )
    pmem = linear(params["attention"]["memory"], memory)
    return hp, params, memory, pmem


def test_kernel_matches_xla_path(setup):
    hp, params, memory, pmem = setup
    mel_x, gate_x, align_x, len_x = dec.infer(
        params, memory, hp, rng=jax.random.PRNGKey(0), max_steps=20,
        gate_threshold=1.1, dtype=None, prenet_dropout_enabled=False,
        use_pallas=False,
    )
    kw = dl.prepare_weights(params, dtype=jnp.float32)
    mel_p, gate_p, align_p, len_p = dl.decode_loop(
        kw, memory, pmem, None, max_steps=20, gate_threshold=1.1,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32",
    )
    assert int(len_p[0]) == int(len_x[0])
    np.testing.assert_allclose(np.asarray(mel_p), np.asarray(mel_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_p), np.asarray(gate_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(align_p), np.asarray(align_x), atol=1e-5)


def test_kernel_respects_memory_mask(setup):
    hp, params, memory, pmem = setup
    S = memory.shape[1]
    lengths = jnp.asarray([S - 6])
    mask = jnp.arange(S)[None, :] < lengths[:, None]
    kw = dl.prepare_weights(params, dtype=jnp.float32)
    _, _, align, _ = dl.decode_loop(
        kw, memory, pmem, mask, max_steps=8, gate_threshold=1.1,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32",
    )
    align = np.asarray(align)[0]
    assert np.all(align[:, S - 6 :] < 1e-6)
    np.testing.assert_allclose(align.sum(-1), 1.0, atol=1e-5)


def test_kernel_gate_early_exit(setup):
    hp, params, memory, pmem = setup
    kw = dl.prepare_weights(params, dtype=jnp.float32)
    # threshold -1 => sigmoid always above => stops after the first frame
    mel, gate, align, lengths = dl.decode_loop(
        kw, memory, pmem, None, max_steps=20, gate_threshold=-1.0,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32",
    )
    assert int(lengths[0]) == 1
    # frames beyond the stop step stay zero
    assert np.all(np.asarray(mel)[0, :, 1:] == 0.0)


def test_prepared_weights_shapes(setup):
    hp, params, *_ = setup
    kw = dl.prepare_weights(params)
    H = hp.attention_rnn_dim
    assert kw["attn_w"].shape == (hp.prenet_dim + hp.encoder_embedding_dim + H, 4 * H)
    assert kw["proj_gate_w"].shape == (
        hp.decoder_rnn_dim + hp.encoder_embedding_dim, hp.n_mel_channels + 1
    )
    assert kw["loc_patch_w"].shape == (62, hp.attention_location_n_filters)


def test_kernel_matches_xla_path_r2():
    """r=2: each kernel step emits 2 frames through the widened projection;
    outputs must match the XLA while_loop path frame-for-frame."""
    hp = create_hparams(TINY + ",n_frames_per_step=2")
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(0)
    S = 16
    memory = jnp.asarray(
        rng.randn(1, S, hp.encoder_embedding_dim).astype(np.float32) * 0.3
    )
    pmem = linear(params["attention"]["memory"], memory)
    mel_x, gate_x, align_x, len_x = dec.infer(
        params, memory, hp, rng=jax.random.PRNGKey(0), max_steps=12,
        gate_threshold=1.1, dtype=None, prenet_dropout_enabled=False,
        use_pallas=False,
    )
    kw = dl.prepare_weights(params, dtype=jnp.float32)
    assert kw["proj_gate_w"].shape[-1] == 2 * hp.n_mel_channels + 1
    mel_p, gate_p, align_p, len_p = dl.decode_loop(
        kw, memory, pmem, None, max_steps=12, gate_threshold=1.1,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32", r=2,
    )
    assert mel_p.shape == (1, hp.n_mel_channels, 24)
    assert int(len_p[0]) == int(len_x[0])  # frames (multiple of r)
    np.testing.assert_allclose(np.asarray(mel_p), np.asarray(mel_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_p), np.asarray(gate_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(align_p), np.asarray(align_x),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Batched fused decode (decode_loop_batched, 1 < B <= 8)
# ---------------------------------------------------------------------------


def _batched_setup(B=3, S=16, r=1):
    hp = create_hparams(TINY + (f",n_frames_per_step={r}" if r > 1 else ""))
    params = dec.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(1)
    memory = jnp.asarray(
        rng.randn(B, S, hp.encoder_embedding_dim).astype(np.float32) * 0.3
    )
    pmem = linear(params["attention"]["memory"], memory)
    return hp, params, memory, pmem


def test_batched_kernel_matches_xla_path():
    """decode_loop_batched must equal the XLA while_loop row-for-row,
    including per-row memory masks (ragged text lengths in one batch)."""
    B, S = 3, 16
    hp, params, memory, pmem = _batched_setup(B, S)
    lengths = jnp.asarray([S, S - 5, S - 9], jnp.int32)
    mask = jnp.arange(S)[None, :] < lengths[:, None]
    mel_x, gate_x, align_x, len_x = dec.infer(
        params, memory, hp, rng=jax.random.PRNGKey(0), max_steps=14,
        gate_threshold=1.1, dtype=None, prenet_dropout_enabled=False,
        use_pallas=False, memory_lengths=lengths,
    )
    mel_p, gate_p, align_p, len_p = dl.decode_loop_batched(
        params, memory, pmem, mask, max_steps=14, gate_threshold=1.1,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32",
    )
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_x))
    np.testing.assert_allclose(np.asarray(mel_p), np.asarray(mel_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_p), np.asarray(gate_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(align_p), np.asarray(align_x),
                               atol=1e-5)
    # masked positions get zero attention in every row
    a = np.asarray(align_p)
    assert np.all(a[1, :, S - 5:] < 1e-6) and np.all(a[2, :, S - 9:] < 1e-6)


def test_batched_kernel_matches_xla_path_r2():
    B, S = 4, 16
    hp, params, memory, pmem = _batched_setup(B, S, r=2)
    mel_x, gate_x, align_x, len_x = dec.infer(
        params, memory, hp, rng=jax.random.PRNGKey(0), max_steps=9,
        gate_threshold=1.1, dtype=None, prenet_dropout_enabled=False,
        use_pallas=False,
    )
    mel_p, gate_p, align_p, len_p = dl.decode_loop_batched(
        params, memory, pmem, None, max_steps=9, gate_threshold=1.1,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32", r=2,
    )
    assert mel_p.shape == (B, hp.n_mel_channels, 18)
    np.testing.assert_array_equal(np.asarray(len_p), np.asarray(len_x))
    np.testing.assert_allclose(np.asarray(mel_p), np.asarray(mel_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gate_p), np.asarray(gate_x), atol=1e-5)


def test_batched_kernel_gate_early_exit():
    B, S = 2, 16
    hp, params, memory, pmem = _batched_setup(B, S)
    mel, gate, align, lengths = dl.decode_loop_batched(
        params, memory, pmem, None, max_steps=20, gate_threshold=-1.0,
        seed=0, dropout_on=False, interpret=True, dtype_name="float32",
    )
    assert np.all(np.asarray(lengths) == 1)
    assert np.all(np.asarray(mel)[:, :, 1:] == 0.0)


def test_batched_decode_supported_envelope():
    """B gate (2..8 only) and the VMEM envelope: reference dims fit at
    S<=160, blow up by S=256 (the banded location matrix is O(S^2 A))."""
    A, E, H = 128, 512, 1024
    assert not dl.batched_decode_supported(1, 64, A, E, H)
    assert not dl.batched_decode_supported(9, 64, A, E, H)
    assert dl.batched_decode_supported(4, 128, A, E, H)
    assert dl.batched_decode_supported(8, 160, A, E, H)
    assert not dl.batched_decode_supported(4, 256, A, E, H)
