"""Alignment debug views + single-Gaussian Baum-Welch wrapper."""
import numpy as np

from cs304_tpu.models.gmm_hmm import train_word_hmm_baum_welch
from cs304_tpu.models.hmm import WordHMM
from cs304_tpu.models.train_kmeans import SegmentalKMeansConfig, train_word_hmm
from cs304_tpu.utils.alignment_debug import (
    count_table,
    histogram,
    path_string,
    run_length,
    state_counts,
)


def test_run_length_and_string():
    path = [0, 0, 0, 1, 2, 2]
    assert run_length(path) == [(0, 3), (1, 1), (2, 2)]
    assert path_string(path) == "0x3 1x1 2x2"
    assert run_length([]) == []


def test_state_counts_and_renders():
    paths = [[0, 0, 1], [1, 2, 2, 2]]
    counts = state_counts(paths, 3)
    np.testing.assert_array_equal(counts, [2, 2, 3])
    table = count_table(paths, 3)
    assert "State" in table and "3" in table
    bars = histogram(paths, 3)
    assert bars.count("\n") == 2


def test_single_gaussian_baum_welch(rng):
    centers = rng.normal(size=(3, 4)) * 4
    seqs = []
    for _ in range(8):
        frames = []
        for s in range(3):
            for _ in range(rng.integers(4, 8)):
                frames.append(centers[s] + rng.normal(0, 0.3, 4))
        seqs.append(np.asarray(frames, np.float32))
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=6, length_multiple=8)
    km = train_word_hmm("X", seqs, cfg).model
    bw = train_word_hmm_baum_welch("X", seqs, cfg=cfg, init=km)
    assert isinstance(bw, WordHMM)
    assert bw.means.shape == km.means.shape
    # BW refinement should keep the states near the k-means solution.
    np.testing.assert_allclose(bw.means, km.means, atol=1.0)
