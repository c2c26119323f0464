"""Audio file IO (scipy-based; replaces reference's scipy read + librosa write).

Reference: ``utils.py:16-18`` (load_wav_to_torch) and ``synthesizer.py:168``.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float32 samples in native int range, sample_rate)."""
    sampling_rate, data = wavfile.read(path)
    return data.astype(np.float32), sampling_rate


def save_wav(path: str, wav: np.ndarray, sampling_rate: int) -> None:
    """Write float waveform in [-1, 1] as 16-bit PCM."""
    wav = np.asarray(wav, dtype=np.float32)
    peak = np.max(np.abs(wav))
    if peak > 1.0:
        wav = wav / peak
    wavfile.write(path, sampling_rate, (wav * 32767.0).astype(np.int16))
