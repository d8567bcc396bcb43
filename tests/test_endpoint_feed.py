"""Streaming endpointer parity: feed_frames vs the per-frame routine() path.

The serving hot path (cs304_tpu/serving.py:_feed_session) advances the
hysteresis machine a whole chunk per call through the native streaming
automaton (native/wavio.cpp:endpoint_feed). These tests pin that the batched
path — native AND Python fallback — is event-for-event, sample-for-sample,
state-for-state identical to the reference-semantics per-frame machine
(reference segmentation.py:154-197), across arbitrary chunk boundaries.
"""
import numpy as np
import pytest

from cs304_tpu.audio.capture import Segmentation, SegmentationDone
from cs304_tpu.native import loader

FS = 320
SR = 16000


def _make_audio(seed: int) -> np.ndarray:
    r = np.random.default_rng(seed)
    pieces = [
        r.normal(0, r.uniform(5, 900), int(r.uniform(0.1, 1.2) * SR))
        .astype(np.float32)
        for _ in range(20)
    ]
    return np.concatenate(pieces)


def _drive_routine(audio: np.ndarray):
    """Reference path: one queue put + routine() per 320-sample frame."""
    seg = Segmentation(stream=None, silence_duration_threshold=0.2)
    events = []
    n = len(audio) // FS
    for i in range(n):
        seg.audio_cache.put(audio[i * FS : (i + 1) * FS])
        try:
            seg.routine()
        except SegmentationDone:
            events.append(seg.result_signal().tobytes())
            seg = Segmentation(stream=None, silence_duration_threshold=0.2)
    return events, seg


def _drive_feed_frames(audio: np.ndarray, chunk_seed: int):
    """Batched path: random full-frame chunk sizes across utterances."""
    seg = Segmentation(stream=None, silence_duration_threshold=0.2)
    events = []
    r = np.random.default_rng(chunk_seed)
    n = len(audio) // FS
    off = 0
    while off < n * FS:
        chunk = audio[off : min(off + int(r.integers(1, 9)) * FS, n * FS)]
        off += len(chunk)
        coff = 0
        while coff < len(chunk):
            done, consumed = seg.feed_frames(chunk[coff:])
            assert consumed > 0
            coff += consumed
            if done:
                events.append(seg.result_signal().tobytes())
                seg = Segmentation(
                    stream=None, silence_duration_threshold=0.2
                )
    return events, seg


def _tail_state(seg: Segmentation):
    residual = (
        np.concatenate([np.asarray(f).reshape(-1) for f in seg._results])
        if seg._results
        else np.zeros(0, np.float32)
    )
    return (
        seg._end_counter._counter,
        seg._between,
        seg._ever_high,
        residual.tobytes(),
    )


@pytest.mark.parametrize("seed", range(6))
def test_feed_frames_matches_routine(seed):
    audio = _make_audio(seed)
    events_a, seg_a = _drive_routine(audio)
    events_b, seg_b = _drive_feed_frames(audio, chunk_seed=100 + seed)
    assert events_a == events_b
    assert _tail_state(seg_a) == _tail_state(seg_b)


def test_python_fallback_matches_native(monkeypatch):
    """Force the Python fallback and require identical events/state."""
    audio = _make_audio(3)
    events_native, seg_native = _drive_feed_frames(audio, chunk_seed=7)
    monkeypatch.setattr(loader, "_load", lambda: None)
    events_py, seg_py = _drive_feed_frames(audio, chunk_seed=7)
    assert events_native == events_py
    assert _tail_state(seg_native) == _tail_state(seg_py)


def test_feed_frames_rejects_partial_frames():
    seg = Segmentation(stream=None)
    with pytest.raises(ValueError, match="whole 320-sample frames"):
        seg.feed_frames(np.zeros(FS + 1, np.float32))


def test_feed_frames_interleaves_with_routine():
    """Both entry points share state: alternating them equals either alone."""
    audio = _make_audio(5)
    events_ref, seg_ref = _drive_routine(audio)

    seg = Segmentation(stream=None, silence_duration_threshold=0.2)
    events = []
    n = len(audio) // FS
    i = 0
    while i < n:
        use_routine = (i // 4) % 2 == 0
        if use_routine:
            seg.audio_cache.put(audio[i * FS : (i + 1) * FS])
            i += 1
            try:
                seg.routine()
            except SegmentationDone:
                events.append(seg.result_signal().tobytes())
                seg = Segmentation(
                    stream=None, silence_duration_threshold=0.2
                )
        else:
            chunk = audio[i * FS : min((i + 4) * FS, n * FS)]
            done, consumed = seg.feed_frames(chunk)
            i += consumed // FS
            if done:
                events.append(seg.result_signal().tobytes())
                seg = Segmentation(
                    stream=None, silence_duration_threshold=0.2
                )
    assert events == events_ref
    assert _tail_state(seg) == _tail_state(seg_ref)
