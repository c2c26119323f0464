"""ctypes bindings for the native data-IO core (native/dataio.cpp).

Auto-builds ``native/libdataio.so`` with g++ on first use (cached); every
entry point has a pure-NumPy fallback, so the package works without a
toolchain.  ``available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libdataio.so")

_lib = None
_lock = threading.Lock()
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "dataio.cpp")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
                     "-o", _SO_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
        ]
        lib.wav_read.restype = ctypes.c_int
        lib.collate_mels.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.collate_mels.restype = ctypes.c_int
        lib.collate_text.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.collate_text.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def load_wav(path: str, scale: float = 1.0):
    """Read PCM16 wav -> (float32 array scaled by 1/scale, sample_rate).

    Falls back to scipy when the native library is unavailable or the file
    isn't plain PCM16.
    """
    lib = _load()
    if lib is not None:
        n = ctypes.c_int64()
        sr = ctypes.c_int32()
        if lib.wav_info(path.encode(), ctypes.byref(n), ctypes.byref(sr)) == 0:
            out = np.empty(n.value, np.float32)
            if lib.wav_read(path.encode(), _fptr(out), n.value,
                            ctypes.c_float(scale)) == 0:
                return out, int(sr.value)
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.ndim > 1:
        data = data[:, 0]
    return data.astype(np.float32) / (scale or 1.0), int(sr)


def collate_mels(mels: list[np.ndarray], t_max: int):
    """[(n_mel, T_i) float32] -> (mel (B, n_mel, t_max), gate (B, t_max))."""
    B = len(mels)
    n_mel = mels[0].shape[0]
    lengths = np.asarray([m.shape[1] for m in mels], np.int32)
    lib = _load()
    mel_out = np.empty((B, n_mel, t_max), np.float32)
    gate_out = np.empty((B, t_max), np.float32)
    if lib is not None:
        flat = np.concatenate(
            [np.ascontiguousarray(m, np.float32).reshape(-1) for m in mels]
        )
        offsets = np.zeros(B, np.int64)
        np.cumsum([m.size for m in mels[:-1]], out=offsets[1:])
        rc = lib.collate_mels(
            _fptr(flat), _i64ptr(offsets), _i32ptr(lengths),
            B, n_mel, t_max, _fptr(mel_out), _fptr(gate_out),
        )
        if rc == 0:
            return mel_out, gate_out, lengths
    mel_out[:] = 0.0
    gate_out[:] = 0.0
    for i, m in enumerate(mels):
        T = m.shape[1]
        mel_out[i, :, :T] = m
        gate_out[i, T - 1 :] = 1.0
    return mel_out, gate_out, lengths


def collate_text(seqs: list[np.ndarray], s_max: int):
    """[(S_i,) int32] -> (B, s_max) zero-padded."""
    B = len(seqs)
    lengths = np.asarray([len(s) for s in seqs], np.int32)
    out = np.empty((B, s_max), np.int32)
    lib = _load()
    if lib is not None:
        flat = np.concatenate([np.ascontiguousarray(s, np.int32) for s in seqs])
        offsets = np.zeros(B, np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        rc = lib.collate_text(
            _i32ptr(flat), _i64ptr(offsets), _i32ptr(lengths), B, s_max,
            _i32ptr(out),
        )
        if rc == 0:
            return out, lengths
    out[:] = 0
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out, lengths
