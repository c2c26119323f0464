"""Bucket-padding invariants for the serving path: padding text (with
masking) must not change the synthesized mel; mel padding must not change
the vocoded audio prefix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_vae_tpu.config import create_hparams
from tacotron2_vae_tpu.models import tacotron2
from tacotron2_vae_tpu.models import waveglow as wg

TINY = (
    "symbols_embedding_dim=32,encoder_embedding_dim=32,attention_rnn_dim=32,"
    "decoder_rnn_dim=32,prenet_dim=16,attention_dim=16,postnet_embedding_dim=32,"
    "E=32,ref_enc_gru_size=16,z_latent_dim=4,ref_enc_filters=[2,2,4,4,8,8],"
    "attention_location_n_filters=4,compute_dtype='float32'"
)


def test_padded_text_matches_unpadded():
    hp = create_hparams(TINY)
    params, state = tacotron2.init(jax.random.PRNGKey(0), hp)
    rng = np.random.RandomState(0)
    n = 13
    text = rng.randint(2, hp.n_symbols, size=(1, n)).astype(np.int32)
    text_padded = np.pad(text, ((0, 0), (0, 19)))  # bucket to 32
    style = jnp.zeros((1, hp.E))

    kw = dict(rng=jax.random.PRNGKey(1), max_steps=12,
              gate_threshold=1.1, prenet_dropout_enabled=False,
              use_pallas=False)
    mel_a, post_a, gate_a, align_a, len_a = tacotron2.infer(
        params, state, jnp.asarray(text), style, hp,
        text_lengths=jnp.asarray([n]), **kw,
    )
    mel_b, post_b, gate_b, align_b, len_b = tacotron2.infer(
        params, state, jnp.asarray(text_padded), style, hp,
        text_lengths=jnp.asarray([n]), **kw,
    )
    np.testing.assert_allclose(np.asarray(mel_b), np.asarray(mel_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(post_b), np.asarray(post_a), atol=1e-5)
    # attention over padded positions is fully masked
    assert np.all(np.asarray(align_b)[0, :, n:] < 1e-6)


def test_padded_mel_vocodes_same_prefix():
    cfg = wg.WaveGlowConfig(n_flows=4, n_group=8, n_early_every=2,
                            n_early_size=2, n_layers=2, n_channels=8)
    params = wg.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    mel = rng.randn(1, 80, 40).astype(np.float32)
    mel_padded = np.pad(mel, ((0, 0), (0, 0), (0, 24)),
                        constant_values=np.log(1e-5))
    key = jax.random.PRNGKey(7)
    # Same key, longer z: the first 40 groups of noise coincide only if we
    # draw per-length... instead compare determinism via the `inverse` API.
    z = jnp.asarray(rng.randn(1, 64, 8).astype(np.float32))
    wav_a = np.asarray(wg.inverse(params, z[:, :40], jnp.asarray(mel), cfg))
    wav_b = np.asarray(wg.inverse(params, z, jnp.asarray(mel_padded), cfg))
    n = wav_a.shape[1]
    # WaveGlow conditioning is local (dilated convs, receptive field ~ few
    # frames): all but the trailing receptive-field region must match.
    guard = 8 * 2 ** cfg.n_layers * cfg.n_flows  # conservative
    np.testing.assert_allclose(
        wav_b[0, : n - guard], wav_a[0, : n - guard], atol=1e-4
    )
