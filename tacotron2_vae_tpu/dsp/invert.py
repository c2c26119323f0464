"""Inverse STFT and Griffin-Lim phase recovery (JAX, TPU-native).

Parity targets: reference ``stft.py:107-135`` (inverse via transposed conv +
window-sumsquare correction) and ``audio_processing.py:59-75`` (30-iteration
Griffin-Lim).  We use irfft + scatter-add overlap-add instead of
conv_transpose1d; the window-sumsquare correction is identical math
(audio_processing.py:7-56).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stft import _padded_window, stft_complex

_TINY = 1.1754944e-38  # smallest normal float32


def window_sumsquare(
    n_frames: int, n_fft: int, hop_length: int, win_length: int
) -> np.ndarray:
    """Sum of squared, hop-shifted windows over the output length."""
    n = n_fft + hop_length * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)
    win_sq = _padded_window(win_length, n_fft).astype(np.float64) ** 2
    for i in range(n_frames):
        sample = i * hop_length
        x[sample : sample + n_fft] += win_sq
    return x


@partial(jax.jit, static_argnums=(2, 3, 4))
def istft(
    magnitude: jnp.ndarray,
    phase: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """Inverse STFT: (B, F, T) mag/phase -> (B, samples) waveform."""
    spec = magnitude * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(spec.swapaxes(1, 2), n=n_fft, axis=-1)
    window = jnp.asarray(_padded_window(win_length, n_fft))
    frames = frames * window

    n_frames = frames.shape[1]
    out_len = n_fft + hop_length * (n_frames - 1)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    wav = jnp.zeros((frames.shape[0], out_len), frames.dtype)
    wav = wav.at[:, idx.reshape(-1)].add(frames.reshape(frames.shape[0], -1))

    wss = window_sumsquare(n_frames, n_fft, hop_length, win_length)
    correction = np.where(wss > _TINY, 1.0 / np.maximum(wss, _TINY), 0.0)
    wav = wav * jnp.asarray(correction, frames.dtype)

    pad = n_fft // 2
    return wav[:, pad:-pad]


def griffin_lim(
    magnitudes: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_iters: int = 30,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery: (B, F, T) magnitudes -> (B, samples)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(
        key, magnitudes.shape, minval=-np.pi, maxval=np.pi
    )

    def body(_, angles):
        wav = istft(magnitudes, angles, n_fft, hop_length, win_length)
        _, new_angles = stft_complex(wav, n_fft, hop_length, win_length)
        # Keep shapes static: stft(istft(x)) has the same frame count.
        return new_angles[:, :, : magnitudes.shape[2]]

    angles = jax.lax.fori_loop(0, n_iters, body, angles)
    return istft(magnitudes, angles, n_fft, hop_length, win_length)
