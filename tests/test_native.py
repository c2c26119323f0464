"""Native C++ data-IO core tests (builds native/libdataio.so with g++)."""

import numpy as np
import pytest

from tacotron2_vae_tpu.data import native
from tacotron2_vae_tpu.dsp.audio import save_wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    wav = np.clip(0.5 * np.sin(2 * np.pi * 440 * np.arange(5000) / 16000)
                  + 0.01 * rng.randn(5000), -1, 1).astype(np.float32)
    path = str(d / "test.wav")
    save_wav(path, wav, 16000)
    return path, wav


def test_native_builds():
    assert native.available(), "g++ build of native/dataio.cpp failed"


def test_wav_read_matches_scipy(wav_file):
    path, _ = wav_file
    from scipy.io import wavfile

    sr_ref, data_ref = wavfile.read(path)
    out, sr = native.load_wav(path, scale=32768.0)
    assert sr == sr_ref
    np.testing.assert_allclose(
        out, data_ref.astype(np.float32) / 32768.0, atol=1e-7
    )


def test_collate_mels_matches_python(wav_file):
    rng = np.random.RandomState(1)
    mels = [rng.randn(80, t).astype(np.float32) for t in (13, 29, 7)]
    t_max = 32
    mel_n, gate_n, lengths = native.collate_mels(mels, t_max)
    assert mel_n.shape == (3, 80, 32)
    for i, m in enumerate(mels):
        T = m.shape[1]
        np.testing.assert_array_equal(mel_n[i, :, :T], m)
        assert np.all(mel_n[i, :, T:] == 0.0)
        assert np.all(gate_n[i, T - 1 :] == 1.0)
        assert np.all(gate_n[i, : T - 1] == 0.0)
    np.testing.assert_array_equal(lengths, [13, 29, 7])


def test_collate_text(wav_file):
    seqs = [np.arange(1, 6, dtype=np.int32), np.arange(1, 3, dtype=np.int32)]
    out, lengths = native.collate_text(seqs, 8)
    np.testing.assert_array_equal(out[0], [1, 2, 3, 4, 5, 0, 0, 0])
    np.testing.assert_array_equal(out[1], [1, 2, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(lengths, [5, 2])
