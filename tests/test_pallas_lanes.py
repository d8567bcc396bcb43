"""States-in-lanes fast kernel (v3) vs the fast scan path (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from cs304_tpu.models.hmm import uniform_forward_log_a
from cs304_tpu.ops.pallas.trellis_lanes import viterbi_lanes_forward_pallas
from cs304_tpu.ops.viterbi import _backtrace, viterbi_composite_batch_fast


def test_lanes_kernel_matches_fast_scan(rng):
    state_counts = [5, 3, 4]
    s_total = sum(state_counts)
    log_a = np.full((s_total, s_total), -np.inf, np.float32)
    lowers, uppers, base = [], [], 0
    for n in state_counts:
        log_a[base : base + n, base : base + n] = uniform_forward_log_a(n)
        lowers.append(base); uppers.append(base + n - 1); base += n
    lower_of = np.zeros(s_total, np.int32)
    for lo in lowers:
        lower_of[lo:] = lo
    entry = np.zeros(s_total, bool); entry[lowers] = True
    exit_ = np.zeros(s_total, bool); exit_[uppers] = True

    b, t = 5, 26
    log_b = (rng.normal(size=(b, t, s_total)) * 2).astype(np.float32)
    lengths = rng.integers(t // 2, t + 1, size=b).astype(np.int32)
    penalty = -4.0

    want_scores, want_paths = viterbi_composite_batch_fast(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), penalty, jnp.asarray(lengths),
    )
    alpha, bp = viterbi_lanes_forward_pallas(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), penalty, jnp.asarray(lengths),
        t_blk=8, interpret=True,
    )
    exit_scores = np.where(exit_[None, :], np.asarray(alpha), -np.inf)
    np.testing.assert_allclose(
        exit_scores.max(axis=1), np.asarray(want_scores), rtol=1e-6
    )
    best = exit_scores.argmax(axis=1).astype(np.int32)
    paths = jax.vmap(lambda b_, s_, l: _backtrace(b_, s_, l, True))(
        jnp.asarray(bp), jnp.asarray(best), jnp.asarray(lengths)
    )
    for i in range(b):
        live = np.arange(t) < lengths[i]
        np.testing.assert_array_equal(
            np.asarray(paths[i])[live], np.asarray(want_paths[i])[live]
        )
