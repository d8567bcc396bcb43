"""Streaming MFCC front-end: feed raw samples, emit feature frames online.

The reference front-end is utterance-global in exactly one place that matters:
`power_to_db(ref=np.max)` normalizes against the WHOLE utterance's peak mel
power (mfcc.py:35) — unknowable online. This streamer takes an explicit
`ref_power` (from mic calibration or the endpointer's peak estimate) instead;
when `ref_power` equals the true utterance max, the emitted frames match the
offline features exactly. The other stages are already causal or finitely
latent: framing/DFT/mel/DCT are per-frame, the per-frame coefficient
normalization (the reference's quirk) has no time dependence, and the
Savitzky-Golay deltas need ±4 frames of context — so frames are emitted with a
4-frame delay and `finalize()` flushes the tail with the offline 'interp'
edge handling.

Together with ops.streaming.StreamingComposite this closes the loop:
samples -> features -> partial hypotheses, all online.
"""
from __future__ import annotations

from functools import lru_cache
from typing import List

import numpy as np

from .mfcc import MFCCConfig, _cached_constants


class StreamingMFCC:
    """Online 39-dim feature extraction with a fixed dB reference.

    >>> sm = StreamingMFCC(ref_power=calibrated_peak)
    >>> for chunk in mic:                    # arbitrary-size sample chunks
    ...     feats = sm.feed(chunk)            # (k, 39) newly finalized frames
    >>> feats_tail = sm.finalize()            # last frames with edge handling
    """

    def __init__(
        self, cfg: MFCCConfig = MFCCConfig(), ref_power: float = 1.0
    ) -> None:
        if cfg.normalization != "per_frame":
            # CMVN needs whole-utterance statistics — unknowable online.
            # Decode streams against per_frame-trained checkpoints only.
            raise ValueError(
                "StreamingMFCC supports normalization='per_frame' only; "
                f"got {cfg.normalization!r} (CMVN is utterance-global)"
            )
        self.cfg = cfg
        self.ref_power = float(ref_power)
        _hann, dft_cos, dft_sin, mel_fb, dct_m, d1, d2 = _cached_constants(cfg)
        self._dft_cos = np.asarray(dft_cos)
        self._dft_sin = np.asarray(dft_sin)
        self._mel_fb = np.asarray(mel_fb)
        self._dct_m = np.asarray(dct_m)
        self._d1 = d1
        self._d2 = d2
        self._half = cfg.delta_width // 2
        self.reset()

    def reset(self) -> None:
        hop = self.cfg.hop_length
        # Center padding: the first frame is centered at sample 0.
        self._buffer = np.zeros(hop, np.float32)  # leading zero block
        self._mfcc: List[np.ndarray] = []  # raw (un-normalized) mfcc frames
        self._emitted = 0

    # -- internals -----------------------------------------------------------
    def _mfcc_frame(self, frame: np.ndarray) -> np.ndarray:
        re = frame @ self._dft_cos
        im = frame @ self._dft_sin
        power = re * re + im * im
        mel = power @ self._mel_fb.T
        amin = self.cfg.amin
        db = 10 * np.log10(np.maximum(amin, mel)) - 10 * np.log10(
            np.maximum(amin, self.ref_power)
        )
        # Online top_db clamp uses the fixed reference (= the peak when
        # calibrated), i.e. max(db, -top_db).
        db = np.maximum(db, -self.cfg.top_db)
        return db @ self._dct_m.T

    def _features_for(self, idx: int, tail: bool = False) -> np.ndarray:
        """Assemble the 39-dim vector for frame idx (requires idx+4 frames,
        or tail=True for edge handling)."""
        w = self.cfg.delta_width
        interior1, el1, er1 = self._d1
        interior2, el2, er2 = self._d2
        n = len(self._mfcc)

        # Stack only the <= w frames each window needs: stacking the WHOLE
        # history here made long utterances quadratic (profiled dominant in
        # the serving host loop at 1024 sessions).
        def window_of(lo, hi):
            return np.stack(self._mfcc[lo:hi])

        def delta(ops_interior, edge_left, edge_right, i):
            if i < self._half:
                window = window_of(0, w)
                if len(window) < w:  # ultra-short utterance: pad by repeat
                    window = np.pad(window, ((0, w - len(window)), (0, 0)), "edge")
                return edge_left[i] @ window
            if tail and i >= n - self._half:
                window = window_of(max(n - w, 0), n)
                if len(window) < w:
                    window = np.pad(window, ((w - len(window), 0), (0, 0)), "edge")
                return edge_right[i - (n - self._half)] @ window
            return ops_interior @ window_of(i - self._half, i + self._half + 1)

        mfcc = self._mfcc[idx]
        mean = mfcc.mean()
        std = mfcc.std()
        norm = (mfcc - mean) / (std + self.cfg.normalize_eps)
        d1 = delta(interior1, el1, er1, idx)
        d2 = delta(interior2, el2, er2, idx)
        return np.concatenate([norm, d1, d2]).astype(np.float32)

    # -- public ---------------------------------------------------------------
    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Feed raw samples; returns newly available (k, 39) frames (frames
        are released once 4 future frames exist)."""
        hop, n_fft = self.cfg.hop_length, self.cfg.n_fft
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(samples, np.float32)]
        )
        while len(self._buffer) >= n_fft:
            self._mfcc.append(self._mfcc_frame(self._buffer[:n_fft]))
            self._buffer = self._buffer[hop:]
        out = []
        # Frame i needs frames up to i+half for its deltas (4-frame latency);
        # left-edge frames additionally need a full first window.
        while (
            self._emitted + self._half < len(self._mfcc)
            and len(self._mfcc) >= self.cfg.delta_width
        ):
            out.append(self._features_for(self._emitted))
            self._emitted += 1
        return np.stack(out) if out else np.zeros((0, 3 * self.cfg.n_mfcc), np.float32)

    def finalize(self) -> np.ndarray:
        """Flush remaining frames with the offline right-edge handling.
        Matches offline features when ref_power equals the utterance's true
        mel-power max."""
        # Trailing center pad (the offline STFT pads n_fft//2 zeros at the
        # end too): flushes the final frame(s).
        pad = self.cfg.n_fft - self.cfg.hop_length
        self._buffer = np.concatenate([self._buffer, np.zeros(pad, np.float32)])
        hop, n_fft = self.cfg.hop_length, self.cfg.n_fft
        while len(self._buffer) >= n_fft:
            self._mfcc.append(self._mfcc_frame(self._buffer[:n_fft]))
            self._buffer = self._buffer[hop:]
        out = []
        n = len(self._mfcc)
        while self._emitted < n:
            out.append(self._features_for(self._emitted, tail=True))
            self._emitted += 1
        return np.stack(out) if out else np.zeros((0, 3 * self.cfg.n_mfcc), np.float32)


def mel_peak(samples: np.ndarray, cfg: MFCCConfig = MFCCConfig()) -> float:
    """Peak mel power of the given samples — the dB reference calibrator.

    When this equals the true utterance-wide peak, StreamingMFCC's frames
    match the offline front-end exactly (power_to_db ref=max); a live system
    calibrates from mic setup or the first speech frames instead. The
    framing/window/filterbank conventions here must stay identical to the
    offline pipeline's (ops/mfcc.py) — the one shared implementation is the
    point (it had been duplicated in two demo scripts and the serving layer).
    """
    sig = np.asarray(samples, np.float64)
    n_fft, hop = cfg.n_fft, cfg.hop_length
    padded = np.pad(sig, (n_fft // 2, n_fft // 2))
    window, fb = _mel_peak_constants(
        cfg.sample_rate, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
    )
    peak = 1e-10
    for t in range(1 + len(sig) // hop):
        frame = padded[t * hop : t * hop + n_fft]
        if len(frame) < n_fft:
            break
        p = np.abs(np.fft.rfft(frame * window)) ** 2
        peak = max(peak, float((fb @ p).max()))
    return peak


@lru_cache(maxsize=8)
def _mel_peak_constants(sr: float, n_fft: int, n_mels: int,
                        fmin: float, fmax: float):
    """Window + filterbank for mel_peak — cached: serving calls mel_peak per
    session per chunk and rebuilding the filterbank dominated its cost."""
    from .mfcc import mel_filterbank

    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    fb = np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    return window, fb
