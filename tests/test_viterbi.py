"""Viterbi kernels vs the NumPy reference-semantics oracle and brute force."""
import numpy as np
import jax.numpy as jnp

from cs304_tpu.ops.viterbi import (
    banded_transition_matrix,
    composite_transition_matrix,
    viterbi_banded,
    viterbi_banded_batch,
    viterbi_composite,
)
from oracles import brute_force_best_path, ref_viterbi_banded, ref_viterbi_composite


def left_right_log_a(s, rng):
    """Random upper-triangular transition matrix in log space."""
    probs = np.zeros((s, s))
    for i in range(s):
        row = rng.random(s - i)
        probs[i, i:] = row / row.sum()
    with np.errstate(divide="ignore"):
        return np.log(probs).astype(np.float32)


def test_banded_matches_reference_oracle(rng):
    s, t = 5, 17
    log_a = left_right_log_a(s, rng)
    log_b = rng.normal(size=(t, s)).astype(np.float32) * 3

    want_score, want_path = ref_viterbi_banded(log_b, log_a)
    score, path = viterbi_banded(jnp.asarray(log_b), jnp.asarray(log_a))
    assert np.allclose(float(score), want_score, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(path), want_path)


def test_banded_standard_backtrace_is_brute_force_optimal(rng):
    s, t = 4, 6
    log_a = left_right_log_a(s, rng)
    log_b = rng.normal(size=(t, s)).astype(np.float32)

    trans = np.asarray(banded_transition_matrix(jnp.asarray(log_a)))
    init = np.full(s, -np.inf)
    init[0] = log_b[0, 0] + log_a[0, 0]
    want_score, want_path = brute_force_best_path(log_b, trans, init, {s - 1})

    score, path = viterbi_banded(
        jnp.asarray(log_b), jnp.asarray(log_a), quirk_backtrace=False
    )
    assert np.allclose(float(score), want_score, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(path), want_path)


def test_banded_padding_invariance(rng):
    s, t, pad = 5, 23, 41
    log_a = left_right_log_a(s, rng)
    log_b = rng.normal(size=(t, s)).astype(np.float32)
    log_b_padded = np.concatenate(
        [log_b, rng.normal(size=(pad - t, s)).astype(np.float32) * 100]
    )

    score, path = viterbi_banded(jnp.asarray(log_b), jnp.asarray(log_a))
    score_p, path_p = viterbi_banded(
        jnp.asarray(log_b_padded), jnp.asarray(log_a), length=t
    )
    assert np.allclose(float(score), float(score_p), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(path_p)[:t])


def test_banded_batch(rng):
    s = 5
    log_a = left_right_log_a(s, rng)
    lengths = np.array([13, 20, 7], np.int32)
    t_max = 20
    log_b = rng.normal(size=(3, t_max, s)).astype(np.float32)

    scores, paths = viterbi_banded_batch(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lengths)
    )
    for i, l in enumerate(lengths):
        want_score, want_path = ref_viterbi_banded(log_b[i, :l], log_a)
        assert np.allclose(float(scores[i]), want_score, rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(paths[i])[:l], want_path)


def _composite_setup(rng, state_counts):
    s = sum(state_counts)
    lowers, uppers, lo = [], [], 0
    for n in state_counts:
        lowers.append(lo)
        uppers.append(lo + n - 1)
        lo += n
    log_a = np.full((s, s), -np.inf, np.float32)
    base = 0
    for n in state_counts:
        log_a[base : base + n, base : base + n] = left_right_log_a(n, rng)
        base += n
    lower_of = np.zeros(s, np.int32)
    for l in lowers:
        lower_of[l:] = l
    is_entry = np.zeros(s, bool)
    is_entry[lowers] = True
    is_exit = np.zeros(s, bool)
    is_exit[uppers] = True
    return s, lowers, uppers, log_a, lower_of, is_entry, is_exit


def test_composite_matches_reference_oracle(rng):
    state_counts = [5, 3, 4]
    s, lowers, uppers, log_a, lower_of, is_entry, is_exit = _composite_setup(
        rng, state_counts
    )
    t = 19
    penalty = -7.5
    log_b = (rng.normal(size=(t, s)) * 2).astype(np.float32)

    want_score, want_path = ref_viterbi_composite(
        log_b, log_a, lowers, uppers, penalty
    )
    score, path = viterbi_composite(
        jnp.asarray(log_b),
        jnp.asarray(log_a),
        jnp.asarray(lower_of),
        jnp.asarray(is_entry),
        jnp.asarray(is_exit),
        penalty,
    )
    assert np.allclose(float(score), want_score, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(path), want_path)


def test_composite_standard_is_brute_force_optimal(rng):
    state_counts = [2, 3]
    s, lowers, uppers, log_a, lower_of, is_entry, is_exit = _composite_setup(
        rng, state_counts
    )
    t = 5
    penalty = -1.5
    log_b = rng.normal(size=(t, s)).astype(np.float32)

    trans = np.asarray(
        composite_transition_matrix(
            jnp.asarray(log_a),
            jnp.asarray(lower_of),
            jnp.asarray(is_entry),
            jnp.asarray(is_exit),
            penalty,
        )
    )
    init = np.full(s, -np.inf)
    for lo in lowers:
        init[lo] = log_b[0, lo] + log_a[lo, lo]
    want_score, want_path = brute_force_best_path(log_b, trans, init, set(uppers))

    score, path = viterbi_composite(
        jnp.asarray(log_b),
        jnp.asarray(log_a),
        jnp.asarray(lower_of),
        jnp.asarray(is_entry),
        jnp.asarray(is_exit),
        penalty,
        quirk_backtrace=False,
    )
    assert np.allclose(float(score), want_score, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(path), want_path)
