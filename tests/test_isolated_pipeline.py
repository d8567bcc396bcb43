"""End-to-end project3 equivalent: MFCC -> segmental k-means -> isolated argmax.

Mirrors scripts/project3_train.py + project3_predict_simple.py on the synthetic
corpus (no licensed TI-Digits in CI).
"""
import numpy as np
import pytest

from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.data.ti_digits import DIGIT_LABELS
from cs304_tpu.models.collection import ModelCollection
from cs304_tpu.models.train_kmeans import (
    SegmentalKMeansConfig,
    train_digit_models,
)
from cs304_tpu.ops.mfcc import mfcc_batch


@pytest.fixture(scope="module")
def corpus():
    return SyntheticTIDigits(num_train_speakers=4, num_test_speakers=2, takes_per_digit=2)


@pytest.fixture(scope="module")
def trained_models(corpus):
    cfg = SegmentalKMeansConfig(num_states=5, max_iterations=12, length_multiple=32)
    feats = {
        label: mfcc_batch(corpus.train_dataset[label]) for label in DIGIT_LABELS
    }
    return train_digit_models(feats, cfg)


def test_training_produces_valid_models(trained_models):
    assert set(trained_models) == set(DIGIT_LABELS)
    for label, m in trained_models.items():
        assert m.num_states == 5
        assert m.dim == 39
        assert np.all(np.isfinite(m.means))
        # Left-to-right: no backward transitions.
        assert np.all(m.log_a[np.tril_indices(m.num_states, -1)] == -np.inf)
        # Rows with observed transitions are normalized in prob space.
        probs = np.exp(np.where(np.isfinite(m.log_a), m.log_a, -np.inf))
        row_sums = probs.sum(axis=1)
        ok = row_sums > 0
        np.testing.assert_allclose(row_sums[ok], 1.0, rtol=1e-4)


def test_isolated_accuracy(corpus, trained_models):
    mc = ModelCollection.from_models([trained_models[l] for l in DIGIT_LABELS])
    truths, clips = [], []
    for label in DIGIT_LABELS:
        for clip in corpus.test_dataset[label]:
            truths.append(label)
            clips.append(clip)
    feats = mfcc_batch(clips)
    preds = mc.predict_batch(feats)
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    # Held-out speakers on the synthetic corpus: the pipeline must be
    # essentially perfect here if alignment/training/decoding are correct.
    assert acc >= 0.9, f"isolated accuracy {acc:.2%}, preds={preds}"


def test_train_accuracy_near_perfect(corpus, trained_models):
    mc = ModelCollection.from_models([trained_models[l] for l in DIGIT_LABELS])
    truths, clips = [], []
    for label in DIGIT_LABELS:
        for clip in corpus.train_dataset[label][:4]:
            truths.append(label)
            clips.append(clip)
    feats = mfcc_batch(clips)
    preds = mc.predict_batch(feats)
    acc = np.mean([p == t for p, t in zip(preds, truths)])
    assert acc >= 0.95, f"train accuracy {acc:.2%}"
