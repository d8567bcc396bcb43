"""GMM-HMM training (segmental k-means + Baum-Welch) on synthetic data."""
import numpy as np
import pytest

from cs304_tpu.models.gmm_hmm import (
    GMMWordHMM,
    train_gmm_hmm,
    train_gmm_hmm_baum_welch,
)
from cs304_tpu.models.train_kmeans import SegmentalKMeansConfig, train_word_hmm


def make_sequences(rng, n=12, states=3, d=4):
    """Left-to-right sequences with per-state bimodal emissions."""
    seqs = []
    centers = rng.normal(size=(states, 2, d)) * 4
    for _ in range(n):
        frames = []
        for s in range(states):
            for _ in range(rng.integers(4, 8)):
                mode = rng.integers(0, 2)
                frames.append(centers[s, mode] + rng.normal(0, 0.3, d))
        seqs.append(np.asarray(frames, np.float32))
    return seqs, centers


def test_gmm_kmeans_trains(rng):
    seqs, centers = make_sequences(rng)
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=10, length_multiple=8)
    model = train_gmm_hmm("X", seqs, num_mixtures=2, cfg=cfg, seed=1)
    assert model.means.shape == (3, 2, 4)
    assert np.isfinite(model.means).all()
    w = model.weights
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-4)
    # Scores its own data better than noise.
    good = model.forward_score(seqs[0])
    noise = rng.normal(size=seqs[0].shape).astype(np.float32) * 5
    assert good > model.forward_score(noise)


def test_gmm_k1_close_to_single_gaussian(rng):
    seqs, _ = make_sequences(rng, states=3)
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=10, length_multiple=8)
    gmm = train_gmm_hmm("X", seqs, num_mixtures=1, cfg=cfg)
    single = train_word_hmm("X", seqs, cfg).model
    # K=1 means must match the plain trainer's means (same algorithm).
    np.testing.assert_allclose(gmm.means[:, 0], single.means, rtol=1e-3, atol=1e-3)


def test_baum_welch_improves_likelihood(rng):
    seqs, _ = make_sequences(rng)
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=5, length_multiple=8)
    km = train_gmm_hmm("X", seqs, num_mixtures=2, cfg=cfg, seed=1)
    bw = train_gmm_hmm_baum_welch(
        "X", seqs, num_mixtures=2,
        cfg=SegmentalKMeansConfig(num_states=3, max_iterations=8, length_multiple=8),
        init=km,
    )
    ll_km = sum(km.forward_score(s) for s in seqs)
    ll_bw = sum(bw.forward_score(s) for s in seqs)
    assert ll_bw >= ll_km - 1e-3 * abs(ll_km), (ll_km, ll_bw)
