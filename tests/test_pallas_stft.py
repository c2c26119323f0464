"""Fused Pallas STFT+mel kernel: interpret-mode parity vs the XLA rFFT path."""

import jax
import jax.experimental.pallas as pl
import numpy as np
import pytest

import tacotron2_vae_tpu.ops.pallas.stft_mel as sm
from tacotron2_vae_tpu.dsp import TacotronSTFT


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(sm.pl, "pallas_call", patched)


def test_fused_stft_mel_parity(interpret_pallas):
    rng = np.random.RandomState(0)
    wav = np.clip(
        0.4 * np.sin(2 * np.pi * 440 * np.arange(9000) / 16000)
        + 0.01 * rng.randn(9000),
        -1, 1,
    ).astype(np.float32)
    ref = np.asarray(
        TacotronSTFT(1024, 256, 1024, 80, 16000, 0.0, 8000.0,
                     use_pallas=False).mel_spectrogram(wav[None])
    )
    out = np.asarray(sm.mel_spectrogram_pallas(wav))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_stft_respects_frame_count(interpret_pallas):
    wav = np.zeros(256 * 7, np.float32)
    out = np.asarray(sm.mel_spectrogram_pallas(wav))
    assert out.shape == (1, 80, 8)  # T//hop + 1
    # silence -> log(1e-5) everywhere
    np.testing.assert_allclose(out, np.log(1e-5), atol=1e-4)
