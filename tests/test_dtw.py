"""DTW recognizer: brute-force oracle parity + recognition sanity."""
import numpy as np
import pytest

from cs304_tpu.ops.dtw import DTWRecognizer, pairwise_euclidean


def brute_force_dtw(template, sample):
    """Single-template DTW with moves {level, diag, superdiag}, start at
    (0, 0), no pruning."""
    h, l = len(template), len(sample)
    dist = np.sqrt(
        ((template[:, None, :] - sample[None, :, :]) ** 2).sum(-1)
    )
    c = np.full((h, l), np.inf)
    c[0, 0] = dist[0, 0]
    for j in range(1, l):
        for i in range(h):
            best = c[i, j - 1]
            if i >= 1:
                best = min(best, c[i - 1, j - 1])
            if i >= 2:
                best = min(best, c[i - 2, j - 1])
            c[i, j] = dist[i, j] + best
    return c[h - 1, l - 1]


def test_pairwise_euclidean(rng):
    a = rng.normal(size=(7, 5)).astype(np.float32)
    b = rng.normal(size=(9, 5)).astype(np.float32)
    got = np.asarray(pairwise_euclidean(a, b))
    want = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_single_template_matches_brute_force(rng):
    template = rng.normal(size=(6, 4)).astype(np.float32)
    sample = rng.normal(size=(10, 4)).astype(np.float32)
    rec = DTWRecognizer.from_features([template], pruning=False)
    d = rec.distances(sample)
    want = brute_force_dtw(template.astype(np.float64), sample.astype(np.float64))
    assert np.allclose(d[0], want, rtol=1e-4)


def test_multi_template_matches_individual(rng):
    templates = [rng.normal(size=(n, 4)).astype(np.float32) for n in (5, 8, 6)]
    sample = rng.normal(size=(12, 4)).astype(np.float32)
    multi = DTWRecognizer.from_features(templates, pruning=False)
    d_multi = multi.distances(sample)
    for i, tpl in enumerate(templates):
        single = DTWRecognizer.from_features([tpl], pruning=False)
        assert np.allclose(d_multi[i], single.distances(sample)[0], rtol=1e-4)


def test_recognizes_matching_template(rng):
    templates = [rng.normal(size=(8, 4)).astype(np.float32) * 3 for _ in range(4)]
    # Sample = template 2 with mild noise and time warping (frame repeats).
    warped = np.repeat(templates[2], 2, axis=0)
    sample = warped + rng.normal(0, 0.1, warped.shape).astype(np.float32)
    rec = DTWRecognizer.from_features(templates)
    idx, dist = rec.search(sample)
    assert idx == 2
    assert np.isfinite(dist)


def test_pruning_keeps_best_path(rng):
    templates = [rng.normal(size=(8, 4)).astype(np.float32) * 3 for _ in range(4)]
    # Full time-warped coverage of template 1 so its end row stays on-beam.
    warped = np.repeat(templates[1], 2, axis=0)
    sample = warped + rng.normal(0, 0.05, warped.shape).astype(np.float32)
    pruned = DTWRecognizer.from_features(templates, pruning=True)
    exact = DTWRecognizer.from_features(templates, pruning=False)
    assert pruned.search(sample)[0] == exact.search(sample)[0]
    # The winning word's cost must survive pruning unchanged.
    assert np.allclose(
        pruned.distances(sample)[1], exact.distances(sample)[1], rtol=1e-4
    )
