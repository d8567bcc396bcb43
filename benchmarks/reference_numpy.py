"""NumPy/SciPy re-implementation of the reference's decode pipeline, used ONLY
as the benchmark denominator (the reference publishes no speed numbers —
BASELINE.md — so we measure its algorithm: per-clip librosa-style MFCC followed
by the per-frame-scipy-logpdf Python-loop composite Viterbi of
hidden_markov_model.py:481-581)."""
from __future__ import annotations

import numpy as np
import scipy.fft
import scipy.signal
import scipy.stats


def _mel_fb(sr, n_fft, n_mels, fmin, fmax):
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        min_log_hz, logstep = 1000.0, np.log(6.4) / 27.0
        return np.where(
            f >= min_log_hz,
            min_log_hz / f_sp + np.log(np.maximum(f, 1e-20) / min_log_hz) / logstep,
            f / f_sp,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        min_log_mel, logstep = 1000.0 / f_sp, np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel, 1000.0 * np.exp(logstep * (m - min_log_mel)), m * f_sp
        )

    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(pts)
    ramps = pts[:, None] - fftfreqs[None, :]
    w = np.maximum(0, np.minimum(-ramps[:-2] / fdiff[:-1, None], ramps[2:] / fdiff[1:, None]))
    return w * (2.0 / (pts[2:] - pts[:n_mels]))[:, None]


_MEL = _mel_fb(16000, 320, 40, 133.33, 6855.4976)


def numpy_mfcc(signal: np.ndarray) -> np.ndarray:
    """Per-clip 39-dim features, the reference MFCC chain (mfcc.py:24-44)."""
    y = np.asarray(signal, np.float64)
    pad = 160
    ypad = np.pad(y, (pad, pad))
    n_frames = 1 + len(y) // 160
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(320) / 320)
    frames = np.lib.stride_tricks.sliding_window_view(ypad, 320)[::160][:n_frames]
    spec = np.fft.rfft(frames * window, axis=-1)
    power = (np.abs(spec) ** 2).T
    mel = _MEL @ power
    ref = np.max(mel)
    db = 10 * np.log10(np.maximum(1e-10, mel)) - 10 * np.log10(np.maximum(1e-10, ref))
    db = np.maximum(db, db.max() - 80.0)
    mfccs = scipy.fft.dct(db, axis=-2, type=2, norm="ortho")[:13]
    d1 = scipy.signal.savgol_filter(mfccs, 9, polyorder=1, deriv=1, axis=-1, mode="interp")
    d2 = scipy.signal.savgol_filter(mfccs, 9, polyorder=2, deriv=2, axis=-1, mode="interp")
    norm = (mfccs - mfccs.mean(0, keepdims=True)) / (mfccs.std(0, keepdims=True) + 1e-8)
    return np.concatenate([norm, d1, d2], axis=0).T


def numpy_composite_viterbi(feats, gaussians, log_a, lowers, uppers, penalty):
    """Python-loop composite Viterbi with per-(t,state) scipy logpdf calls —
    the reference's exact computational pattern (hidden_markov_model.py:504-563)."""
    t_total = feats.shape[0]
    s = len(gaussians)
    lower_of = np.zeros(s, np.int64)
    for lo in lowers:
        lower_of[lo:] = lo
    lowers_set = set(int(x) for x in lowers)

    alpha = np.full(s, -np.inf)
    for lo in lowers:
        alpha[lo] = gaussians[lo].logpdf(feats[0]) + log_a[lo, lo]
    tracer = np.full((t_total, s), -1, np.int64)
    for t in range(1, t_total):
        new_alpha = np.full(s, -np.inf)
        for ns in range(s):
            if ns in lowers_set:
                continue
            cand = np.full(s, -np.inf)
            for os_ in range(max(ns - 2, lower_of[ns]), ns + 1):
                cand[os_] = log_a[os_, ns] + alpha[os_]
            tracer[t, ns] = int(np.argmax(cand))
            new_alpha[ns] = np.max(cand) + gaussians[ns].logpdf(feats[t])
        for ns in lowers_set:
            cand = np.full(len(uppers) + 1, -np.inf)
            cand[-1] = log_a[ns, ns] + alpha[ns]
            for idx, os_ in enumerate(uppers):
                cand[idx] = penalty + alpha[os_]
            k = int(np.argmax(cand))
            tracer[t, ns] = ns if k == len(uppers) else uppers[k]
            new_alpha[ns] = np.max(cand) + gaussians[ns].logpdf(feats[t])
        alpha = new_alpha
    best = uppers[int(np.argmax(alpha[uppers]))]
    prev = tracer[-1, best]
    path = np.zeros(t_total, np.int64)
    path[-1] = prev
    for t in range(t_total - 2, -1, -1):
        path[t] = prev
        prev = tracer[t, prev]
    return float(np.max(alpha[uppers])), path
