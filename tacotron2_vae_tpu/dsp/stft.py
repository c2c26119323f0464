"""JAX STFT / mel front-end (TPU-native).

Behavioral parity with the reference mel pipeline (reference stft.py:77-105
conv-as-DFT transform; layers.py:54-92 TacotronSTFT): reflect padding of
n_fft//2 on both sides, periodic Hann window, magnitude spectrum, slaney mel
filterbank matmul, log dynamic-range compression with a 1e-5 clamp.

Instead of the reference's Conv1d against a precomputed Fourier basis, we
frame with a gather and use XLA's native rFFT, then hit the MXU with a single
(B*T, n_freq) x (n_freq, n_mels) matmul.  Everything is jittable with static
shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, as scipy.signal.get_window."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _padded_window(win_length: int, n_fft: int) -> np.ndarray:
    win = hann_window(win_length)
    if n_fft > win_length:
        pad = (n_fft - win_length) // 2
        win = np.pad(win, (pad, n_fft - win_length - pad))
    return win


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Reflect-pad and frame: (B, T) -> (B, n_frames, n_fft).

    n_frames = T // hop + 1, matching the reference conv stride arithmetic.
    """
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (y.shape[1] - n_fft) // hop_length + 1
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    return y[:, idx]


@partial(jax.jit, static_argnums=(1, 2, 3))
def stft_magnitude(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> jnp.ndarray:
    """Magnitude STFT: (B, T) -> (B, 1 + n_fft//2, n_frames)."""
    window = jnp.asarray(_padded_window(win_length, n_fft))
    frames = frame_signal(y, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec).swapaxes(1, 2)


@partial(jax.jit, static_argnums=(1, 2, 3))
def stft_complex(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
):
    """(magnitude, phase) like reference STFT.transform (stft.py:77-105)."""
    window = jnp.asarray(_padded_window(win_length, n_fft))
    frames = frame_signal(y, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1).swapaxes(1, 2)
    return jnp.abs(spec), jnp.angle(spec)


def dynamic_range_compression(x, C: float = 1.0, clip_val: float = 1e-5):
    """log(clamp(x, 1e-5) * C) — reference audio_processing.py:77-83."""
    return jnp.log(jnp.clip(x, clip_val, None) * C)


def dynamic_range_decompression(x, C: float = 1.0):
    return jnp.exp(x) / C


class TacotronSTFT:
    """Waveform -> log-mel spectrogram (reference layers.py:54-92 API).

    >>> stft = TacotronSTFT(1024, 256, 1024, 80, 16000, 0.0, 8000.0)
    >>> mel = stft.mel_spectrogram(wav)   # (B, 80, T)
    """

    def __init__(
        self,
        filter_length: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        n_mel_channels: int = 80,
        sampling_rate: int = 22050,
        mel_fmin: float = 0.0,
        mel_fmax: float = 8000.0,
        use_pallas: bool | None = None,
    ):
        self.filter_length = filter_length
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.mel_fmax = mel_fmax
        self.mel_basis = jnp.asarray(
            mel_filterbank(
                sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax
            )
        )
        self._mel_fn = jax.jit(self._mel_impl)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    def _mel_impl(self, y: jnp.ndarray) -> jnp.ndarray:
        mag = stft_magnitude(
            y, self.filter_length, self.hop_length, self.win_length
        )
        mel = jnp.einsum(
            "mf,bft->bmt", self.mel_basis, mag,
            preferred_element_type=jnp.float32,
        )
        return dynamic_range_compression(mel)

    def spectral_normalize(self, magnitudes):
        return dynamic_range_compression(magnitudes)

    def spectral_de_normalize(self, magnitudes):
        return dynamic_range_decompression(magnitudes)

    def mel_spectrogram(self, y) -> jnp.ndarray:
        """(B, T) waveform in [-1, 1] -> (B, n_mels, n_frames) log-mel."""
        y = jnp.asarray(y)
        if y.ndim == 1:
            y = y[None]
        if self.use_pallas and y.shape[0] == 1:
            from ..ops.pallas.stft_mel import mel_spectrogram_pallas

            return mel_spectrogram_pallas(
                y, self.filter_length, self.hop_length, self.win_length,
                self.n_mel_channels, self.sampling_rate, self.mel_fmax,
            )
        return self._mel_fn(y)
