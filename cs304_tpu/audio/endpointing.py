"""Offline energy-based endpointing (silence removal + noise harvesting).

Re-implements the reference's SignalSeparation (signal_separation.py:44-165):
per-frame mean |amplitude| energies gated by a high/low hysteresis state
machine with thresholds relative to the clip's max volume (:71-76), a
silence-duration counter that ends the segment, collection of the non-speech
frames as noise clips for silence-model training (:139-151), and rejection of
results shorter than 9 frames (the MFCC delta width, :95-97).

Frame energies are computed vectorized; the state machine itself is inherently
sequential, tiny, and host-side (it gates which clips reach the device, it is
not device compute).

Divergence from the reference (documented): the reference leaks `_noise`
accumulation across failed clips (it only resets on success,
signal_separation.py:92-94); here noise state is reset per clip.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class FailToProcess(RuntimeError):
    """Clip could not be segmented (never ended, or result too short)."""


@dataclass
class SignalSeparation:
    sample_rate: int = 16000
    frame_time: float = 0.01
    speech_high_threshold: float = 0.08  # fraction of clip max volume
    speech_low_threshold: float = 0.01
    silence_duration_threshold: float = 0.02  # seconds

    _noises: List[np.ndarray] = field(default_factory=list)

    @property
    def frame_size(self) -> int:
        return int(self.sample_rate * self.frame_time)

    @property
    def maximum_silence_frames(self) -> int:
        return int(self.silence_duration_threshold / self.frame_time)

    def _frames(self, signal: np.ndarray) -> List[np.ndarray]:
        """Full frames plus the trailing partial frame (reference :104-110)."""
        fs = self.frame_size
        n_full = len(signal) // fs
        frames = list(signal[: n_full * fs].reshape(-1, fs))
        frames.append(signal[n_full * fs :])
        return frames

    def _segment(self, signal: np.ndarray) -> Tuple[Optional[np.ndarray], np.ndarray]:
        """Run the hysteresis state machine over one clip.

        Returns (speech or None, noise). None means segmentation never
        completed (no trailing silence long enough).
        """
        signal = np.asarray(signal, np.float32)
        max_volume = float(np.max(np.abs(signal))) if len(signal) else 0.0
        high = self.speech_high_threshold * max_volume
        low = self.speech_low_threshold * max_volume
        max_silence = self.maximum_silence_frames

        result: List[np.ndarray] = []
        noise: List[np.ndarray] = []
        counter = 0
        ever_high = False
        between = False

        for frame in self._frames(signal):
            energy = float(np.mean(np.abs(frame))) if len(frame) else 0.0
            done = False
            if between:
                if energy > low:
                    counter = 0
                else:
                    between = False
                    counter += 1
                    done = counter >= max_silence
            else:
                if energy > high:
                    between = True
                    ever_high = True
                    counter = 0
                else:
                    noise.append(frame)
                    if ever_high:
                        counter += 1
                        done = counter >= max_silence
            if ever_high:
                result.append(frame)
            if done:
                noise_sig = (
                    np.concatenate(noise, dtype=np.float32) if noise else np.zeros(0, np.float32)
                )
                return np.concatenate(result, dtype=np.float32), noise_sig
        noise_sig = (
            np.concatenate(noise, dtype=np.float32) if noise else np.zeros(0, np.float32)
        )
        return None, noise_sig

    def remove_empty(self, signal: np.ndarray) -> np.ndarray:
        """Strip leading/trailing silence from one clip; harvest its noise.

        Raises FailToProcess like the reference (:88-100) when segmentation
        never completes or the result is shorter than 9 frames.
        """
        speech, noise = self._segment(signal)
        if speech is None:
            raise FailToProcess("segmentation never completed")
        if len(noise):
            self._noises.append(noise)
        if len(speech) < 9 * self.frame_size:
            raise FailToProcess(f"result too short: {len(speech)} samples")
        return speech

    def remove_empty_batch(self, signals) -> List[np.ndarray]:
        """Silence-strip a clip list, skipping failures with a warning
        (reference :78-86)."""
        results = []
        for signal in signals:
            try:
                results.append(self.remove_empty(signal))
            except FailToProcess as e:
                logger.warning(
                    "skipping clip (len %d, max %.1f): %s",
                    len(signal), float(np.max(np.abs(signal))) if len(signal) else 0.0, e,
                )
        return results

    def get_all_noises(self) -> List[np.ndarray]:
        return list(self._noises)
