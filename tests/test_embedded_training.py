"""Project6 equivalents: embedded continuous training mechanics + accuracy.

The north-star gate mirrors the reference's 85% exact-sequence accuracy after
continuous training (README.md:9), here on the synthetic corpus with held-out
speakers AND held-out takes.
"""
import numpy as np

from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.train_continuous import insert_silence
from cs304_tpu.ops.mfcc import mfcc_batch


def test_insert_silence():
    assert insert_silence("4Z2Z1") == "S4SZS2SZS1S"
    assert insert_silence("7") == "S7S"


def test_training_ran(trained_system):
    assert trained_system["iterations"] >= 1
    em = trained_system["embedded_models"]
    boot = trained_system["boot_models"]
    assert set(em) == set(boot)
    # Embedded training must have actually changed the digit models.
    assert not np.allclose(em["1"].means, boot["1"].means)
    for label, m in em.items():
        assert np.isfinite(m.means).all()
        assert np.isfinite(m.covariances).all()


def test_embedded_accuracy_seen_speakers(trained_system):
    """Seen speakers, novel takes — the 85% north star."""
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    truths, clips = [], []
    for tr in trained_system["train_transcripts"]:
        for spk in range(6):
            truths.append(tr)
            clips.append(corpus.sentence_audio(tr, spk, jitter_seed=51))
    preds = decoder.predict_batch(mfcc_batch(clips))
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.85, f"accuracy {acc:.2%}: {[x for x in zip(truths, preds) if x[0] != x[1]]}"


def test_embedded_accuracy_unseen_transcripts(trained_system):
    """The decoder is unrestricted: word sequences never seen in training
    must still decode (this is what 'unrestricted continuous HMM' means)."""
    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    truths, clips = [], []
    for tr in ["73", "2891", "1OZ"]:
        for spk in range(6):
            truths.append(tr)
            clips.append(corpus.sentence_audio(tr, spk, jitter_seed=5))
    preds = decoder.predict_batch(mfcc_batch(clips))
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.7, f"unseen-transcript accuracy {acc:.2%}: {list(zip(truths, preds))}"
