"""ctypes bindings for the native wavio library, with Python fallbacks."""
from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional, Tuple

import numpy as np

from .build import LIBRARY, build

logger = logging.getLogger(__name__)

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = LIBRARY if os.path.exists(LIBRARY) else build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        logger.warning("failed to load %s: %s", path, e)
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_ubyte)
    lib.wav_read.restype = ctypes.c_long
    lib.wav_read.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_long, ctypes.POINTER(ctypes.c_int)
    ]
    lib.frame_energies.restype = ctypes.c_long
    lib.frame_energies.argtypes = [f32p, ctypes.c_long, ctypes.c_int, f32p]
    lib.endpoint_frames.restype = ctypes.c_long
    lib.endpoint_frames.argtypes = [
        f32p, ctypes.c_long, ctypes.c_float, ctypes.c_float, ctypes.c_int, u8p
    ]
    _lib = lib
    return lib


HAS_NATIVE = _load() is not None


def native_read_wav(path: str, max_seconds: float = 120.0) -> Tuple[int, np.ndarray]:
    """(sample_rate, float32 signal); falls back to scipy on any failure."""
    lib = _load()
    if lib is not None:
        max_len = int(max_seconds * 96000)
        out = np.empty(max_len, np.float32)
        rate = ctypes.c_int(0)
        n = lib.wav_read(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_len, ctypes.byref(rate),
        )
        if n >= 0:
            return rate.value, out[:n].copy()
        logger.warning("native wav_read(%s) failed with %d; scipy fallback", path, n)
    import scipy.io.wavfile

    rate_v, signal = scipy.io.wavfile.read(path)
    if signal.ndim > 1:
        signal = signal[:, 0]
    return rate_v, np.asarray(signal, np.float32)


def native_frame_energies(signal: np.ndarray, frame_size: int) -> np.ndarray:
    """Mean |x| per frame, incl. trailing partial frame."""
    signal = np.ascontiguousarray(signal, np.float32)
    n = len(signal)
    n_frames = n // frame_size + (1 if n % frame_size else 0)
    lib = _load()
    if lib is not None and n:
        out = np.empty(max(n_frames, 1), np.float32)
        got = lib.frame_energies(
            signal.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, frame_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out[:got]
    # Python fallback
    n_full = n // frame_size
    full = np.abs(signal[: n_full * frame_size]).reshape(-1, frame_size).mean(1)
    rem = signal[n_full * frame_size:]
    if len(rem):
        return np.concatenate([full, [np.abs(rem).mean()]]).astype(np.float32)
    return full.astype(np.float32)


def native_endpoint_frames(
    energies: np.ndarray, high: float, low: float, max_silence: int
) -> Tuple[int, np.ndarray]:
    """(done_frame_count or 0, per-frame flags: bit0 result, bit1 noise)."""
    energies = np.ascontiguousarray(energies, np.float32)
    n = len(energies)
    lib = _load()
    if lib is not None:
        labels = np.zeros(max(n, 1), np.uint8)
        done = lib.endpoint_frames(
            energies.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            high, low, max_silence,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return int(done), labels[:n]
    # Python fallback mirrors wavio.cpp / audio/endpointing.py
    labels = np.zeros(n, np.uint8)
    counter, between, ever = 0, False, False
    done = 0
    for t, e in enumerate(energies):
        fin = False
        lab = 0
        if between:
            if e > low:
                counter = 0
            else:
                between = False
                counter += 1
                fin = counter >= max_silence
        else:
            if e > high:
                between, ever, counter = True, True, 0
            else:
                lab |= 2
                if ever:
                    counter += 1
                    fin = counter >= max_silence
        if ever:
            lab |= 1
        labels[t] = lab
        if fin:
            done = t + 1
            break
    return done, labels
