"""Native C++ wavio tier vs Python/scipy fallbacks."""
import numpy as np
import pytest

from cs304_tpu.audio.wav import write_wav_int16
from cs304_tpu.native import (
    HAS_NATIVE,
    native_endpoint_frames,
    native_frame_energies,
    native_read_wav,
)


def test_native_library_built():
    assert HAS_NATIVE, "g++ is available in this image; the native tier must build"


def test_wav_read_matches_scipy(tmp_path, rng):
    import scipy.io.wavfile

    sig = (rng.normal(0, 5000, 7919)).astype(np.int16)
    path = str(tmp_path / "t.wav")
    write_wav_int16(path, sig, 16000)
    rate, native = native_read_wav(path)
    rate2, ref = scipy.io.wavfile.read(path)
    assert rate == rate2 == 16000
    np.testing.assert_array_equal(native, ref.astype(np.float32))


def test_frame_energies_match_python(rng):
    sig = rng.normal(0, 100, 3251).astype(np.float32)
    got = native_frame_energies(sig, 160)
    n_full = len(sig) // 160
    want = np.abs(sig[: n_full * 160]).reshape(-1, 160).mean(1)
    tail = np.abs(sig[n_full * 160 :]).mean()
    want = np.concatenate([want, [tail]]).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_endpoint_frames_semantics():
    # silence(3) speech(5) silence(3): high=10, low=2, max_silence=2
    e = np.array([0.5, 0.6, 0.4, 20, 25, 15, 12, 18, 0.5, 0.4, 0.6], np.float32)
    done, labels = native_endpoint_frames(e, high=10.0, low=2.0, max_silence=2)
    assert done == 10  # ends after two trailing silence frames (frames 8, 9)
    # Pre-speech frames: noise only.
    assert list(labels[:3]) == [2, 2, 2]
    # Speech frames: result only.
    assert list(labels[3:8]) == [1, 1, 1, 1, 1]
    # Trailing silence inside the result region: result + noise bits.
    assert labels[8] == 1  # drop-below-low frame: result, not noise
    assert labels[9] == 3  # fully silent frame: result + noise


def test_wav_read_truncated_data_chunk(tmp_path, rng):
    """A data chunk shorter than its header claims must return an error code
    (-5), not the full frame count over an uninitialized buffer (advisor
    finding r1: silent garbage audio)."""
    import ctypes

    from cs304_tpu.native.loader import _load

    lib = _load()
    if lib is None:
        pytest.skip("native library unavailable")
    path = tmp_path / "trunc.wav"
    sig = (rng.normal(0, 3000, 4000)).astype(np.int16)
    write_wav_int16(str(path), sig, 16000)
    raw = path.read_bytes()
    path.write_bytes(raw[: len(raw) - 1000])  # chop the tail

    out = np.empty(96000, np.float32)
    rate = ctypes.c_int(0)
    n = lib.wav_read(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        96000, ctypes.byref(rate),
    )
    assert n == -5, n
