"""Independent NumPy/SciPy oracle for the reference MFCC pipeline.

librosa is not installed in this environment, so this module re-derives the
exact librosa operations the reference invokes (mfcc.py:31-43) from their
published definitions, using scipy for STFT-free primitives (FFT, DCT,
Savitzky-Golay). It is used ONLY to validate cs304_tpu.ops.mfcc.

Chain: stft(center=True, hann periodic, pad_mode='constant') -> |.|^2 ->
slaney mel (norm='slaney') -> power_to_db(ref=max, amin=1e-10, top_db=80) ->
DCT-II ortho [:13] -> savgol deltas (width 9, mode='interp') ->
concat([per-frame-normalized mfcc, d1, d2]).
"""
import numpy as np
import scipy.fft
import scipy.signal


def hz_to_mel(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-20) / min_log_hz) / logstep,
        mels,
    )


def mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), m * f_sp
    )


def mel_fb(sr, n_fft, n_mels, fmin, fmax):
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(pts)
    ramps = pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    w = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (pts[2:] - pts[:n_mels])
    return w * enorm[:, None]


def stft_power(y, n_fft=320, hop=160):
    pad = n_fft // 2
    ypad = np.pad(y, (pad, pad))
    n_frames = 1 + len(y) // hop
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack(
        [ypad[t * hop : t * hop + n_fft] * window for t in range(n_frames)]
    )
    spec = np.fft.rfft(frames, axis=-1)
    return (np.abs(spec) ** 2).T  # (bins, T) like librosa


def power_to_db(s, amin=1e-10, top_db=80.0):
    ref = np.max(s)
    log_spec = 10.0 * np.log10(np.maximum(amin, s))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    return np.maximum(log_spec, log_spec.max() - top_db)


def reference_mfcc_features(signal, sr=16000):
    """Returns (T, 39) features exactly like the reference MFCC.feature_vector.T."""
    power = stft_power(np.asarray(signal, np.float64))
    melspec = mel_fb(sr, 320, 40, 133.33, 6855.4976) @ power  # (40, T)
    log_mel = power_to_db(melspec)
    mfccs = scipy.fft.dct(log_mel, axis=-2, type=2, norm="ortho")[:13]  # (13, T)
    d1 = scipy.signal.savgol_filter(mfccs, 9, polyorder=1, deriv=1, axis=-1, mode="interp")
    d2 = scipy.signal.savgol_filter(mfccs, 9, polyorder=2, deriv=2, axis=-1, mode="interp")
    mean = mfccs.mean(axis=0, keepdims=True)
    std = mfccs.std(axis=0, keepdims=True)
    norm = (mfccs - mean) / (std + 1e-8)
    return np.concatenate([norm, d1, d2], axis=0).T
