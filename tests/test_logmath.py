"""Log-domain primitive unit tests."""
import numpy as np
import jax.numpy as jnp
import scipy.special

from cs304_tpu.ops.logmath import (
    log_plus_vecmat,
    logsumexp,
    max_plus_vecmat,
    safe_log,
)


def test_logsumexp_matches_scipy(rng):
    x = rng.normal(size=(5, 7)).astype(np.float32) * 4
    np.testing.assert_allclose(
        np.asarray(logsumexp(jnp.asarray(x), axis=1)),
        scipy.special.logsumexp(x, axis=1), rtol=1e-5, atol=1e-6,
    )


def test_logsumexp_all_neg_inf():
    x = jnp.full((3,), -jnp.inf)
    assert float(logsumexp(x, axis=0)) == -np.inf


def test_max_plus_vecmat_first_max(rng):
    alpha = np.array([1.0, 3.0, 3.0], np.float32)
    m = np.zeros((3, 3), np.float32)
    vals, idx = max_plus_vecmat(jnp.asarray(alpha), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(vals), [3.0, 3.0, 3.0])
    # first-max tie-break, like np.argmax
    np.testing.assert_array_equal(np.asarray(idx), [1, 1, 1])


def test_log_plus_vecmat(rng):
    alpha = rng.normal(size=4).astype(np.float32)
    m = rng.normal(size=(4, 3)).astype(np.float32)
    got = np.asarray(log_plus_vecmat(jnp.asarray(alpha), jnp.asarray(m)))
    want = scipy.special.logsumexp(alpha[:, None] + m, axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_safe_log():
    x = jnp.asarray([0.0, 1.0, np.e], jnp.float32)
    out = np.asarray(safe_log(x))
    assert out[0] == -np.inf
    np.testing.assert_allclose(out[1:], [0.0, 1.0], rtol=1e-6)
