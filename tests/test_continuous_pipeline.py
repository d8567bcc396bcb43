"""Project5 equivalents: endpointing, silence model, continuous n-digit decode.

Uses the session-trained system (see conftest.trained_system). Accuracy gates
run on the embedded-trained models (the reference's own 85% headline also comes
after continuous training, README.md:9); the boot-model tests check decode
mechanics.
"""
import numpy as np
import pytest

from cs304_tpu.audio.endpointing import FailToProcess, SignalSeparation
from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.data.ti_digits import DIGIT_LABELS
from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.ops.mfcc import mfcc_batch

TRANSCRIPTS = ["12", "4Z", "375", "9O2", "186Z", "54321"]


def _sentences(corpus, speakers, seed=33):
    truths, clips = [], []
    for tr in TRANSCRIPTS:
        for spk in speakers:
            truths.append(tr)
            clips.append(corpus.sentence_audio(tr, spk, jitter_seed=seed))
    return truths, clips


def test_endpointing_strips_silence(trained_system):
    corpus = trained_system["corpus"]
    sep = SignalSeparation()
    clip = corpus.isolated_clip("5", 0, 0)
    speech = sep.remove_empty(clip)
    assert len(speech) < len(clip)
    assert len(speech) >= 9 * sep.frame_size
    assert sep.get_all_noises(), "noise should be harvested"


def test_endpointing_rejects_pure_noise():
    sep = SignalSeparation()
    rng = np.random.default_rng(0)
    with pytest.raises(FailToProcess):
        sep.remove_empty(rng.normal(0, 30.0, 4000).astype(np.float32))


def test_silence_model_has_3_states(trained_system):
    assert trained_system["boot_models"]["S"].num_states == 3
    assert trained_system["embedded_models"]["S"].num_states == 3


def test_continuous_decode_with_silence(trained_system):
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    truths, clips = _sentences(corpus, range(6))
    preds = decoder.predict_batch(mfcc_batch(clips))
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.85, f"with-silence accuracy {acc:.2%}: {list(zip(truths, preds))}"


def test_continuous_decode_unseen_speakers(trained_system):
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    truths, clips = _sentences(corpus, (6, 7))
    preds = decoder.predict_batch(mfcc_batch(clips))
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.75, f"unseen-speaker accuracy {acc:.2%}: {list(zip(truths, preds))}"


def test_silence_skipped_in_labels(trained_system):
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    _, clips = _sentences(corpus, (0,))
    feats = mfcc_batch(clips[:3])
    preds = decoder.predict_batch(feats)
    assert all("S" not in p for p in preds)
    with_sil = decoder.predict_batch(feats, skip_silence=False)
    assert any("S" in p for p in with_sil)
    # Stripping the silence labels recovers the plain decode.
    assert [p.replace("S", "") for p in with_sil] == preds


def test_decode_batch_matches_single(trained_system):
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    _, clips = _sentences(corpus, (1,))
    feats = mfcc_batch(clips[:4])
    batch_preds = decoder.predict_batch(feats)
    single_preds = [decoder.predict(f) for f in feats]
    assert batch_preds == single_preds


def test_single_digit_continuous(trained_system):
    """Continuous decoder on isolated digit clips (project5_test_1digit.py)."""
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    truths, clips = [], []
    for label in DIGIT_LABELS:
        truths.append(label)
        clips.append(corpus.isolated_clip(label, 2, 7))
    preds = decoder.predict_batch(mfcc_batch(clips))
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.8, f"1-digit continuous accuracy {acc:.2%}: {preds}"


def test_penalty_controls_insertions(trained_system):
    """A huge penalty must forbid multi-word decodes entirely."""
    corpus = trained_system["corpus"]
    models = {
        l: m for l, m in trained_system["embedded_models"].items() if l != "S"
    }
    decoder = ContinuousDecoder(models, penalty=-1e9)
    _, clips = _sentences(corpus, (0,))
    preds = decoder.predict_batch(mfcc_batch(clips[:3]))
    assert all(len(p) == 1 for p in preds), preds
