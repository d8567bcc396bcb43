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


def test_frame_energies_bitwise_numpy_parity(rng):
    """The native energy uses NumPy's exact float32 pairwise reduction
    structure, so native and NumPy hysteresis machines see IDENTICAL
    energies at threshold boundaries (advisor finding r3: a double-
    accumulated energy can differ by 1 ulp and flip a decision)."""
    if not HAS_NATIVE:
        pytest.skip("native library unavailable")
    for frame_size in (7, 64, 160, 320, 400):
        sig = np.abs(rng.normal(0, 3000, frame_size * 37 + 5)).astype(np.float32)
        got = native_frame_energies(sig, frame_size)
        n_full = len(sig) // frame_size
        ref_full = np.abs(sig[: n_full * frame_size]).reshape(
            -1, frame_size
        ).mean(1)
        ref = np.concatenate(
            [ref_full, [np.abs(sig[n_full * frame_size:]).mean()]]
        ).astype(np.float32)
        # Bitwise, not approximate: the point is threshold-boundary parity.
        assert got.tobytes() == ref.tobytes(), frame_size


def test_endpoint_feed_energy_bitwise_parity(rng):
    """endpoint_feed's internal energies must match the Python fallback's
    float32 pairwise mean bit-for-bit: pin via a threshold set exactly AT a
    computed energy value, where any 1-ulp divergence flips the decision."""
    import ctypes

    from cs304_tpu.native.loader import _load, native_endpoint_feed

    lib = _load()
    if lib is None or not hasattr(lib, "endpoint_feed"):
        pytest.skip("native endpoint_feed unavailable")
    frame_size = 320
    frames = np.abs(rng.normal(0, 3000, (40, frame_size))).astype(np.float32)
    energies = frames.mean(1)  # NumPy float32 pairwise — the fallback's view
    # Thresholds straddling exact energy values: e > high is FALSE when the
    # native energy equals NumPy's bit-for-bit, TRUE if it lands 1 ulp high.
    high = float(energies[0])
    low = float(np.min(energies)) - 1.0
    state_native = np.zeros(3, np.int32)
    done_n = lib.endpoint_feed(
        state_native.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        frames.reshape(-1).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        40, frame_size, high, low, 5,
        np.zeros(40, np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    # Python fallback path (force it by driving _endpoint_py via energies)
    from cs304_tpu.native.loader import _endpoint_py

    labels = np.zeros(40, np.uint8)
    done_p, counter, between, ever = _endpoint_py(
        energies, high, low, 5, labels, 0, False, False, noise_bit=False
    )
    assert int(done_n) == int(done_p)
    assert tuple(state_native[1:]) == (int(between), int(ever))
