"""Fused STFT + mel-filterbank + log-compression Pallas TPU kernel.

One kernel does, per block of frames: overlapped framing (strided chunk
staging through VMEM scratch), Hann windowing, DFT as TWO MXU matmuls against
the real/imag Fourier bases (the reference computes its STFT exactly this way
with a Conv1d, stft.py:53-95 — on TPU the basis matmul IS the systolic-array
native formulation), magnitude, mel projection, and log dynamic-range
compression — the intermediate (frames, 1024) patch matrix and (frames, 513)
magnitudes never touch HBM.

Used by TacotronSTFT(use_pallas=True) on TPU; numerically parity-tested
against the XLA rFFT path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...dsp.mel import mel_filterbank
from ...dsp.stft import _padded_window

FRAME_BLOCK = 128  # frames per grid step


def _kernel(n_fft, hop, wav_ref, window_ref, basis_ref, melfb_ref, out_ref,
            patches_ref):
    """Grid over frame blocks; frame windows overlap, so the wav stays whole
    in VMEM and each program slices its own overlapped span.

    wav_ref: (1, total); window_ref: (1, n_fft);
    basis_ref: (n_fft, 2*n_freq_pad); melfb_ref: (n_freq_pad, n_mels);
    out block: (FRAME_BLOCK, n_mels).
    """
    i = pl.program_id(0)
    base = i * (FRAME_BLOCK * hop)
    chunks_per_frame = n_fft // hop  # 4 for 1024/256
    # Stage the overlapped patch matrix: column band c of frame f holds
    # wav[base + f*hop + c*hop : ... + hop].
    for c in range(chunks_per_frame):
        block = wav_ref[:, pl.ds(base + c * hop, FRAME_BLOCK * hop)]
        patches_ref[:, c * hop : (c + 1) * hop] = block.reshape(
            FRAME_BLOCK, hop
        )
    frames = patches_ref[:] * window_ref[:]  # (FB, n_fft)

    # HIGHEST precision: the 1024-tap DFT reduction needs full fp32 on the
    # MXU (default precision truncates operands to bf16).
    spec = jnp.dot(frames, basis_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (FB, 2*n_freq_pad)
    n2 = basis_ref.shape[1] // 2
    re = spec[:, :n2]
    im = spec[:, n2:]
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, melfb_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.log(jnp.clip(mel, 1e-5, None))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _mel_impl(wav, n_fft, hop, win_length, n_mels, sampling_rate, fmax):
    n = wav.shape[-1]
    pad = n_fft // 2
    wavp = jnp.pad(wav.reshape(-1), (pad, pad), mode="reflect")
    n_frames = n // hop + 1
    blocks = -(-n_frames // FRAME_BLOCK)
    # pad so every block's overlapped slice is in range
    need = blocks * FRAME_BLOCK * hop + n_fft
    wavp = jnp.pad(wavp, (0, max(0, need - wavp.shape[0])))[None, :]

    n_freq = n_fft // 2 + 1
    n_freq_pad = ((n_freq + 127) // 128) * 128
    basis = np.fft.fft(np.eye(n_fft))[:, :n_freq]
    basis_ri = np.zeros((n_fft, 2 * n_freq_pad), np.float32)
    basis_ri[:, :n_freq] = np.real(basis)
    basis_ri[:, n_freq_pad : n_freq_pad + n_freq] = np.imag(basis)
    window = _padded_window(win_length, n_fft)[None, :]
    fb = mel_filterbank(sampling_rate, n_fft, n_mels, 0.0, fmax)  # (M, F)
    fbp = np.zeros((n_freq_pad, n_mels), np.float32)
    fbp[:n_freq] = fb.T

    grid = (blocks,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_fft, hop),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole wav (overlaps)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FRAME_BLOCK, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((blocks * FRAME_BLOCK, n_mels),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((FRAME_BLOCK, n_fft), jnp.float32)],
    )(wavp, jnp.asarray(window), jnp.asarray(basis_ri), jnp.asarray(fbp))
    return out[:n_frames].T[None]  # (1, n_mels, n_frames)


def mel_spectrogram_pallas(wav, n_fft=1024, hop=256, win_length=1024,
                           n_mels=80, sampling_rate=16000, fmax=8000.0):
    """(T,) or (1, T) waveform -> (1, n_mels, frames) log-mel (fused kernel)."""
    wav = jnp.asarray(wav)
    if wav.ndim == 2:
        wav = wav[0]
    return _mel_impl(wav, n_fft, hop, win_length, n_mels, sampling_rate,
                     float(fmax))
