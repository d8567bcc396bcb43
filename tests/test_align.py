"""Forced alignment (models/align.py).

The reference aligns transcripts internally during embedded training
(hidden_markov_model.py:584-664) but exposes no timing API; these tests gate
the user-facing aligner: structural invariants, batch==single parity,
ground-truth boundary accuracy on the synthetic corpus (whose true word
segments are known exactly — data/synthetic.py sentence_audio_with_segments),
and GMM-model support.
"""
import numpy as np
import pytest

from cs304_tpu.models.align import ForcedAligner
from cs304_tpu.ops.mfcc import mfcc_batch

HOP = 160
SR = 16000


def _feats(corpus, transcript, speaker, take=0):
    sig = corpus.sentence_audio(transcript, speaker, jitter_seed=take)
    return mfcc_batch([sig])[0]


def test_structural_invariants(trained_system):
    corpus = trained_system["corpus"]
    aligner = ForcedAligner(trained_system["embedded_models"])
    transcript = "375"
    feats = _feats(corpus, transcript, speaker=0)
    res = aligner.align(feats, transcript)

    assert res.transcript == transcript
    assert res.sentence == "S3S7S5S"
    assert np.isfinite(res.score)
    assert res.num_frames == feats.shape[0]

    # Segments partition [0, T) in order.
    assert res.words[0].start_frame == 0
    assert res.words[-1].end_frame == res.num_frames
    for a, b in zip(res.words, res.words[1:]):
        assert a.end_frame == b.start_frame
        assert a.position < b.position
    # Non-silence words come back in transcript order.
    assert [w.word for w in res.word_segments()] == list(transcript)
    # Second timestamps are frame times under the 10 ms hop.
    for w in res.words:
        assert w.start_s == pytest.approx(w.start_frame * HOP / SR)
        assert w.end_s == pytest.approx(w.end_frame * HOP / SR)
        # State runs partition the word segment monotonically.
        assert w.states[0].start_frame == w.start_frame
        assert w.states[-1].end_frame == w.end_frame
        for sa, sb in zip(w.states, w.states[1:]):
            assert sa.end_frame == sb.start_frame
            assert sb.state > sa.state


def test_matches_ground_truth_segments(trained_system):
    """Aligned word midpoints must land inside the TRUE synthetic segments
    (with 50 ms slack for the attack/decay envelope edges)."""
    corpus = trained_system["corpus"]
    aligner = ForcedAligner(trained_system["embedded_models"])
    slack = int(0.05 * SR)
    checked = 0
    for transcript in ("375", "186Z"):
        for speaker in (0, 1):
            sig, truth = corpus.sentence_audio_with_segments(
                transcript, speaker, jitter_seed=0
            )
            feats = mfcc_batch([sig])[0]
            res = aligner.align(feats, transcript)
            hyp = res.word_segments()
            assert [w.word for w in hyp] == [t[0] for t in truth]
            for w, (_, t_start, t_end) in zip(hyp, truth):
                mid = (w.start_frame + w.end_frame) / 2 * HOP
                assert t_start - slack <= mid <= t_end + slack, (
                    transcript, speaker, w,
                )
                checked += 1
    assert checked >= 14


def test_batch_matches_single(trained_system):
    corpus = trained_system["corpus"]
    aligner = ForcedAligner(trained_system["embedded_models"])
    transcript = "54321"
    feats = [
        _feats(corpus, transcript, speaker=s, take=t)
        for s in (0, 1) for t in (0, 1)
    ]
    batch = aligner.align_batch(feats, transcript)
    singles = [aligner.align(f, transcript) for f in feats]
    for b, s in zip(batch, singles):
        assert b.score == pytest.approx(s.score)
        assert [(w.word, w.start_frame, w.end_frame) for w in b.words] == [
            (w.word, w.start_frame, w.end_frame) for w in s.words
        ]


def test_align_signals_end_to_end(trained_system):
    corpus = trained_system["corpus"]
    aligner = ForcedAligner(trained_system["embedded_models"])
    sigs = [corpus.sentence_audio("12", s, jitter_seed=0) for s in (0, 1)]
    results = aligner.align_signals(sigs, "12")
    assert len(results) == 2
    for r in results:
        assert [w.word for w in r.word_segments()] == ["1", "2"]


def test_no_silence_interleave(trained_system):
    corpus = trained_system["corpus"]
    models = {
        l: m for l, m in trained_system["embedded_models"].items() if l != "S"
    }
    aligner = ForcedAligner(models, insert_sil=False)
    feats = _feats(corpus, "375", speaker=0)
    res = aligner.align(feats, "375")
    assert res.sentence == "375"
    assert [w.word for w in res.words] == ["3", "7", "5"]
    assert res.words[0].start_frame == 0
    assert res.words[-1].end_frame == res.num_frames


def test_single_word_transcript(trained_system):
    corpus = trained_system["corpus"]
    aligner = ForcedAligner(trained_system["embedded_models"])
    feats = mfcc_batch([corpus.isolated_clip("7", speaker=0)])[0]
    res = aligner.align(feats, "7")
    words = res.word_segments()
    assert [w.word for w in words] == ["7"]
    # The digit should not be aligned to a trivial sliver.
    assert words[0].end_frame - words[0].start_frame >= 3


def test_gmm_models(trained_system):
    from cs304_tpu.models.train_continuous_gmm import promote_to_gmm

    corpus = trained_system["corpus"]
    gmm_models = promote_to_gmm(trained_system["embedded_models"], 2)
    aligner = ForcedAligner(gmm_models)
    feats = _feats(corpus, "12", speaker=0)
    res = aligner.align(feats, "12")
    assert [w.word for w in res.word_segments()] == ["1", "2"]
    assert np.isfinite(res.score)


def test_validation_errors(trained_system):
    models = trained_system["embedded_models"]
    aligner = ForcedAligner(models)
    feats = np.zeros((20, 39), np.float32)
    with pytest.raises(ValueError, match="unknown words"):
        aligner.align(feats, "3X")
    with pytest.raises(ValueError, match="empty"):
        aligner.align(feats, "")
    no_sil = {l: m for l, m in models.items() if l != "S"}
    with pytest.raises(ValueError, match="silence model"):
        ForcedAligner(no_sil)
    with pytest.raises(ValueError, match="cross_word"):
        ForcedAligner(models, cross_word="nope")
