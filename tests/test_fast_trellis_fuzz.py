"""Randomized fuzz: fast composite trellis == dense scan, many topologies."""
import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.models.hmm import uniform_forward_log_a
from cs304_tpu.ops.viterbi import (
    viterbi_composite_batch,
    viterbi_composite_batch_fast,
)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_fast_matches_scan_random_topologies(seed):
    rng = np.random.default_rng(seed)
    n_words = int(rng.integers(2, 6))
    state_counts = [int(rng.integers(2, 6)) for _ in range(n_words)]
    s_total = sum(state_counts)
    log_a = np.full((s_total, s_total), -np.inf, np.float32)
    lowers, uppers, base = [], [], 0
    for n in state_counts:
        # Random row-normalized transitions, some rows with exact zeros.
        block = np.zeros((n, n))
        for i in range(n):
            row = rng.random(n - i)
            if rng.random() < 0.3 and n - i > 1:
                row[rng.integers(0, n - i)] = 0.0
            block[i, i:] = row / max(row.sum(), 1e-9)
        with np.errstate(divide="ignore"):
            log_a[base : base + n, base : base + n] = np.log(block)
        lowers.append(base)
        uppers.append(base + n - 1)
        base += n
    lower_of = np.zeros(s_total, np.int32)
    for lo in lowers:
        lower_of[lo:] = lo
    entry = np.zeros(s_total, bool)
    entry[lowers] = True
    exit_ = np.zeros(s_total, bool)
    exit_[uppers] = True

    b, t = 5, int(rng.integers(8, 30))
    log_b = (rng.normal(size=(b, t, s_total)) * 3).astype(np.float32)
    lengths = rng.integers(max(t // 2, 2), t + 1, size=b).astype(np.int32)
    penalty = float(-rng.uniform(1, 50))

    args = (
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), penalty, jnp.asarray(lengths),
    )
    want_scores, want_paths = viterbi_composite_batch(*args)
    got_scores, got_paths = viterbi_composite_batch_fast(*args)
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores), rtol=1e-6, atol=1e-5
    )
    for i in range(b):
        live = np.arange(t) < lengths[i]
        np.testing.assert_array_equal(
            np.asarray(got_paths[i])[live], np.asarray(want_paths[i])[live]
        )
