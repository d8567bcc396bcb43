"""Associative-scan Viterbi vs the sequential scan implementation."""
import jax.numpy as jnp
import numpy as np

from cs304_tpu.models.hmm import uniform_forward_log_a
from cs304_tpu.ops.viterbi import (
    banded_transition_matrix,
    viterbi_banded,
)
from cs304_tpu.ops.viterbi_assoc import viterbi_alphas_assoc, viterbi_assoc


def test_alphas_match_sequential(rng):
    s, t = 6, 33
    log_a = uniform_forward_log_a(s)
    trans = np.asarray(banded_transition_matrix(jnp.asarray(log_a)))
    log_b = (rng.normal(size=(t, s)) * 2).astype(np.float32)
    alpha0 = np.full(s, -np.inf, np.float32)
    alpha0[0] = log_b[0, 0] + log_a[0, 0]

    alphas = np.asarray(
        viterbi_alphas_assoc(jnp.asarray(log_b), jnp.asarray(trans), jnp.asarray(alpha0))
    )
    # Sequential recursion for comparison.
    seq = np.full((t, s), -np.inf, np.float64)
    seq[0] = alpha0
    for i in range(1, t):
        for j in range(s):
            seq[i, j] = np.max(seq[i - 1] + trans[:, j]) + log_b[i, j]
    finite = np.isfinite(seq)
    np.testing.assert_allclose(alphas[finite], seq[finite], rtol=1e-4, atol=1e-3)
    assert np.array_equal(np.isfinite(alphas), finite)


def test_full_viterbi_matches_banded(rng):
    s, t = 5, 41
    log_a = uniform_forward_log_a(s)
    trans = np.asarray(banded_transition_matrix(jnp.asarray(log_a)))
    log_b = (rng.normal(size=(t, s)) * 2).astype(np.float32)
    alpha0 = np.full(s, -np.inf, np.float32)
    alpha0[0] = log_b[0, 0] + log_a[0, 0]
    final_mask = np.zeros(s, bool)
    final_mask[-1] = True

    score, path = viterbi_assoc(
        jnp.asarray(log_b), jnp.asarray(trans), jnp.asarray(alpha0),
        jnp.asarray(final_mask),
    )
    want_score, want_path = viterbi_banded(
        jnp.asarray(log_b), jnp.asarray(log_a), quirk_backtrace=False
    )
    assert np.allclose(float(score), float(want_score), rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(want_path))


def test_composite_assoc_matches_sequential(rng):
    from cs304_tpu.ops.viterbi import viterbi_composite
    from cs304_tpu.ops.viterbi_assoc import viterbi_composite_assoc

    state_counts = [5, 3, 4]
    s_total = sum(state_counts)
    log_a = np.full((s_total, s_total), -np.inf, np.float32)
    lowers, uppers, base = [], [], 0
    for n in state_counts:
        log_a[base : base + n, base : base + n] = uniform_forward_log_a(n)
        lowers.append(base)
        uppers.append(base + n - 1)
        base += n
    lower_of = np.zeros(s_total, np.int32)
    for lo in lowers:
        lower_of[lo:] = lo
    entry = np.zeros(s_total, bool); entry[lowers] = True
    exit_ = np.zeros(s_total, bool); exit_[uppers] = True
    t = 37
    log_b = (rng.normal(size=(t, s_total)) * 2).astype(np.float32)

    score_a, path_a = viterbi_composite_assoc(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), -7.0,
    )
    score_s, path_s = viterbi_composite(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), -7.0, quirk_backtrace=False,
    )
    assert np.allclose(float(score_a), float(score_s), rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(path_a), np.asarray(path_s))
