"""Stacked multi-model trainer == per-label trainer."""
import numpy as np

from cs304_tpu.models.train_kmeans import (
    SegmentalKMeansConfig,
    train_digit_models,
    train_digit_models_batched,
    train_word_hmm,
)


def make_label_data(rng, centers, n_clips=6, states=3, d=4):
    seqs = []
    for _ in range(n_clips):
        frames = []
        for s in range(states):
            for _ in range(rng.integers(3, 7)):
                frames.append(centers[s] + rng.normal(0, 0.3, d))
        seqs.append(np.asarray(frames, np.float32))
    return seqs


def test_batched_matches_serial(rng):
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=8, length_multiple=8)
    data = {}
    for label in ["A", "B", "C"]:
        centers = rng.normal(size=(3, 4)) * 4
        # Ragged clip counts across labels exercise the dummy padding.
        data[label] = make_label_data(rng, centers, n_clips=4 + len(label) % 3)
    data["C"] = data["C"][:3]

    serial = {
        l: train_word_hmm(l, feats, cfg).model for l, feats in data.items()
    }
    batched = train_digit_models_batched(data, cfg)
    for label in data:
        np.testing.assert_allclose(
            batched[label].means, serial[label].means, rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            batched[label].covariances, serial[label].covariances,
            rtol=1e-3, atol=1e-4,
        )
        a_b = batched[label].log_a
        a_s = serial[label].log_a
        np.testing.assert_allclose(
            np.where(np.isfinite(a_b), a_b, 0.0),
            np.where(np.isfinite(a_s), a_s, 0.0),
            rtol=1e-4, atol=1e-5,
        )


def test_train_digit_models_dispatches_to_batched(rng):
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=5, length_multiple=8)
    data = {
        l: make_label_data(rng, rng.normal(size=(3, 4)) * 4) for l in ["X", "Y"]
    }
    models = train_digit_models(data, cfg)
    assert set(models) == {"X", "Y"}
