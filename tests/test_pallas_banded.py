"""Exactness of the scan-free banded training trellis (ops/pallas/
trellis_banded.py) against train_fused._banded_trellis_batch — scores
bitwise, paths identical, over randomized topologies, ragged lengths, exact
ties, and degenerate entry self-loops. Runs in interpreter mode on CPU."""
import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.models.train_fused import _banded_trellis_batch
from cs304_tpu.ops.pallas.trellis_banded import viterbi_banded_batch_scanfree

NEG = -np.inf


def _random_problem(rng, b=8, t=12, s=9, quantize=False, degenerate=False):
    log_b = rng.normal(size=(b, t, s)).astype(np.float32)
    if quantize:
        log_b = np.round(log_b)  # force exact ties in the max-plus updates
    c0 = rng.normal(size=(b, s)).astype(np.float32) * 0.5
    c1 = rng.normal(size=(b, s)).astype(np.float32) * 0.5
    c2 = rng.normal(size=(b, s)).astype(np.float32) * 0.5
    if quantize:
        c0, c1, c2 = np.round(c0), np.round(c1), np.round(c2)
    c1[:, 0] = NEG
    c2[:, :2] = NEG
    # Random -inf sprinkling (unreachable transitions, padded states).
    for c in (c0, c1, c2):
        mask = rng.random(c.shape) < 0.15
        c[mask] = NEG
    if degenerate:
        c0[:, 0] = NEG  # zero-probability entry self-loop (init must survive)
    n_states = rng.integers(3, s + 1, size=b).astype(np.int32)
    lengths = rng.integers(2, t + 1, size=b).astype(np.int32)
    lengths[0] = t  # at least one full-length utterance
    return (
        jnp.asarray(log_b), jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2),
        jnp.asarray(lengths), jnp.asarray(n_states),
    )


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("quantize", [False, True])
def test_scanfree_banded_matches_scan(seed, quantize):
    rng = np.random.default_rng(seed)
    prob = _random_problem(rng, quantize=quantize)
    s_scan, p_scan = _banded_trellis_batch(*prob)
    s_pal, p_pal = viterbi_banded_batch_scanfree(*prob, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_pal))
    # Only frames within each utterance's length are meaningful.
    lengths = np.asarray(prob[4])
    for b in range(lengths.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(p_scan)[b, : lengths[b]],
            np.asarray(p_pal)[b, : lengths[b]],
            err_msg=f"utterance {b}",
        )


def test_scanfree_banded_degenerate_entry():
    rng = np.random.default_rng(42)
    prob = _random_problem(rng, degenerate=True)
    s_scan, p_scan = _banded_trellis_batch(*prob)
    s_pal, p_pal = viterbi_banded_batch_scanfree(*prob, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_pal))
    lengths = np.asarray(prob[4])
    for b in range(lengths.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(p_scan)[b, : lengths[b]],
            np.asarray(p_pal)[b, : lengths[b]],
        )


def test_scanfree_banded_fallback_large_s():
    """S > 128 must fall back to the scan (identical results trivially)."""
    rng = np.random.default_rng(7)
    b, t, s = 8, 6, 130
    log_b = jnp.asarray(rng.normal(size=(b, t, s)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))
    c1 = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))
    c2 = jnp.asarray(rng.normal(size=(b, s)).astype(np.float32))
    lengths = jnp.full((b,), t, jnp.int32)
    n_states = jnp.full((b,), s, jnp.int32)
    s_scan, p_scan = _banded_trellis_batch(log_b, c0, c1, c2, lengths, n_states)
    s_pal, p_pal = viterbi_banded_batch_scanfree(
        log_b, c0, c1, c2, lengths, n_states, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(s_scan), np.asarray(s_pal))
    np.testing.assert_array_equal(np.asarray(p_scan), np.asarray(p_pal))
