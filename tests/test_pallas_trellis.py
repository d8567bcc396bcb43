"""Pallas trellis kernel vs the lax.scan reference (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from cs304_tpu.ops.pallas.trellis import viterbi_forward_pallas
from cs304_tpu.ops.viterbi import _scan_trellis, banded_transition_matrix
from cs304_tpu.models.hmm import uniform_forward_log_a


def test_forward_matches_scan(rng):
    b, t, s = 5, 20, 7
    log_a = uniform_forward_log_a(s)
    trans = np.asarray(banded_transition_matrix(jnp.asarray(log_a)))
    log_b = rng.normal(size=(b, t, s)).astype(np.float32) * 2
    alpha0 = np.full((b, s), -np.inf, np.float32)
    alpha0[:, 0] = log_b[:, 0, 0] + log_a[0, 0]
    lengths = np.array([20, 13, 7, 20, 16], np.int32)

    pal_alpha, pal_bp = viterbi_forward_pallas(
        jnp.asarray(log_b), jnp.asarray(trans), jnp.asarray(alpha0),
        jnp.asarray(lengths), block_b=4, interpret=True,
    )
    for i in range(b):
        want_alpha, want_bp = _scan_trellis(
            jnp.asarray(log_b[i]), jnp.asarray(trans), jnp.asarray(alpha0[i]),
            lengths[i],
        )
        np.testing.assert_allclose(
            np.asarray(pal_alpha[i]), np.asarray(want_alpha), rtol=1e-6
        )
        # Backpointers must agree on live steps (t < length).
        live = np.arange(t) < lengths[i]
        np.testing.assert_array_equal(
            np.asarray(pal_bp[i])[live], np.asarray(want_bp)[live]
        )
