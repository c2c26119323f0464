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
    return frame_signal_prepadded(y, n_fft, hop_length)


def frame_signal_prepadded(
    y: jnp.ndarray, n_fft: int, hop_length: int
) -> jnp.ndarray:
    """Frame an ALREADY-padded signal: (B, T + n_fft) -> (B, n_frames, n_fft).

    Used by the bulk featurizer (data.dataset.TextMelDataset.warm_mel_cache):
    each item is reflect-padded with its OWN boundary samples on the host,
    then zero-extended to a shared bucket length — so every frame inside an
    item's valid range is computed from exactly the samples the per-item
    path would use, and the caller trims the tail frames that read the
    zero extension.

    When hop divides n_fft (the 1024/256 default), overlapping frames are
    materialized as n_fft//hop strided RESHAPES interleaved by a stack —
    XLA compiles the equivalent big gather pathologically slowly on TPU
    (~40 s+ per new shape, measured; the reshape form is ~1 s).
    """
    B, L = y.shape
    n_frames = (L - n_fft) // hop_length + 1
    if n_fft % hop_length == 0:
        q = n_fft // hop_length
        M = -(-n_frames // q)  # frames per strided sub-series (ceil)
        need = (q - 1) * hop_length + M * n_fft
        if need > L:
            y = jnp.pad(y, ((0, 0), (0, need - L)))
        subs = [
            y[:, j * hop_length : j * hop_length + M * n_fft].reshape(
                B, M, n_fft
            )
            for j in range(q)
        ]
        # frame k = m*q + j starts at m*n_fft + j*hop == k*hop
        frames = jnp.stack(subs, axis=2).reshape(B, M * q, n_fft)
        return frames[:, :n_frames]
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


def featurize_wavs_chunked(stft: "TacotronSTFT", audios,
                           chunk_frames: int = 128,
                           batch_chunks: int = 64):
    """log-mels for a list of variable-length waveforms via FIXED-SHAPE
    chunk batches (one XLA compile total, ever).

    Each waveform is reflect-padded with its own boundary (bit-matching the
    serial ``mel_spectrogram`` framing), sliced into overlapping chunks of
    exactly ``chunk_frames`` frames, and featurized ``batch_chunks`` chunks
    per device call across waveform boundaries.  Returns a list of
    (n_mels, n_frames) arrays.  This is the engine behind both the
    training mel cache warmer (data.dataset.warm_mel_cache) and the
    serving centroid precompute — per-item device dispatch through the
    remote tunnel costs ~1 s/clip, chunk batching ~2 s per *thousand*.
    """
    n_fft, hop = stft.filter_length, stft.hop_length
    pad = n_fft // 2
    stride = chunk_frames * hop
    width = (chunk_frames - 1) * hop + n_fft

    rows, meta = [], []  # meta: (item_idx, chunk_idx)
    counts = []
    for i, audio in enumerate(audios):
        audio = np.asarray(audio, np.float32)
        if len(audio) <= pad:
            raise ValueError(
                f"waveform {i} shorter than n_fft//2 = {pad} samples"
            )
        padded = np.pad(audio, pad, mode="reflect")
        n_frames = (len(audio) + 2 * pad - n_fft) // hop + 1
        n_chunks = -(-n_frames // chunk_frames)
        need = (n_chunks - 1) * stride + width
        if need > len(padded):
            padded = np.pad(padded, (0, need - len(padded)))
        counts.append((n_frames, n_chunks))
        for c in range(n_chunks):
            rows.append(padded[c * stride : c * stride + width])
            meta.append((i, c))

    parts = {}
    for b in range(0, len(rows), batch_chunks):
        take = rows[b : b + batch_chunks]
        buf = np.zeros((batch_chunks, width), np.float32)
        for j, row in enumerate(take):
            buf[j] = row
        mels = np.asarray(stft.mel_spectrogram_prepadded(buf))
        for j, (i, c) in enumerate(meta[b : b + batch_chunks]):
            parts.setdefault(i, {})[c] = mels[j]

    out = []
    for i, (n_frames, n_chunks) in enumerate(counts):
        mel = np.concatenate(
            [parts[i][c] for c in range(n_chunks)], axis=1
        )[:, :n_frames]
        out.append(mel.astype(np.float32))
    return out


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

    def _mel_prepadded_impl(self, y: jnp.ndarray) -> jnp.ndarray:
        # DFT as two MXU matmuls against a precomputed Fourier basis (the
        # reference's conv-as-DFT formulation, stft.py:53-61) rather than
        # jnp.fft.rfft: XLA's TPU rfft lowering compiles pathologically
        # slowly for new batched shapes (~7 min measured for one
        # (16, 64k-sample) shape vs ~1 s for the matmul form), and the
        # basis matmul fuses with the window + mel matmuls anyway.
        n = self.filter_length
        cos_b, sin_b = self._dft_basis()
        window = jnp.asarray(_padded_window(self.win_length, n))
        frames = (
            frame_signal_prepadded(y, n, self.hop_length) * window
        )  # (B, T, n)
        re = jnp.dot(frames, cos_b, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_b, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im).swapaxes(1, 2)  # (B, F, T)
        mel = jnp.einsum(
            "mf,bft->bmt", self.mel_basis, mag,
            preferred_element_type=jnp.float32,
        )
        return dynamic_range_compression(mel)

    def _dft_basis(self):
        if not hasattr(self, "_dft_basis_arrays"):
            n = self.filter_length
            k = np.arange(n // 2 + 1)[None, :]
            t = np.arange(n)[:, None]
            ang = 2.0 * np.pi * k * t / n
            self._dft_basis_arrays = (
                jnp.asarray(np.cos(ang).astype(np.float32)),
                jnp.asarray((-np.sin(ang)).astype(np.float32)),
            )
        return self._dft_basis_arrays

    def mel_spectrogram_prepadded(self, y) -> jnp.ndarray:
        """Bulk path: (B, T + n_fft) HOST-padded waveforms -> log-mel.

        Each row must carry its own n_fft//2 reflect padding (np.pad
        mode='reflect') followed by any zero extension to the shared batch
        length; the caller trims each item to its true n_samples//hop + 1
        frames.  One device call featurizes a whole batch of utterances —
        the per-utterance dispatch latency of the serial path is what makes
        a cold (uncached) epoch starve the chip."""
        self._dft_basis()  # materialize eagerly: a jnp array created while
        # tracing would leak the tracer through the self._dft_basis_arrays
        # cache into later traces
        if not hasattr(self, "_mel_prepadded_fn"):
            self._mel_prepadded_fn = jax.jit(self._mel_prepadded_impl)
        return self._mel_prepadded_fn(jnp.asarray(y))

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
