"""Forward-backward vs brute-force enumeration on tiny HMMs."""
import itertools

import jax.numpy as jnp
import numpy as np

from cs304_tpu.ops.forward_backward import backward, forward, forward_backward


def brute_force(log_b, log_a, log_init):
    """Exact enumeration of all state sequences."""
    t_total, s = log_b.shape
    seq_probs = {}
    for seq in itertools.product(range(s), repeat=t_total):
        lp = log_init[seq[0]] + log_b[0, seq[0]]
        for t in range(1, t_total):
            lp += log_a[seq[t - 1], seq[t]] + log_b[t, seq[t]]
        seq_probs[seq] = lp
    total = np.logaddexp.reduce(list(seq_probs.values()))
    gamma = np.zeros((t_total, s))
    xi = np.zeros((s, s))
    for seq, lp in seq_probs.items():
        p = np.exp(lp - total)
        for t, st in enumerate(seq):
            gamma[t, st] += p
        for t in range(t_total - 1):
            xi[seq[t], seq[t + 1]] += p
    return gamma, xi, total


def setup(rng, s=3, t=5):
    probs = rng.dirichlet(np.ones(s), size=s)
    log_a = np.log(probs).astype(np.float32)
    log_b = rng.normal(size=(t, s)).astype(np.float32)
    init = rng.dirichlet(np.ones(s))
    log_init = np.log(init).astype(np.float32)
    return log_b, log_a, log_init


def test_forward_likelihood_matches_brute_force(rng):
    log_b, log_a, log_init = setup(rng)
    _, _, want = brute_force(log_b, log_a, log_init)
    _, got = forward(jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(log_init))
    assert np.allclose(float(got), want, rtol=1e-4)


def test_posteriors_match_brute_force(rng):
    log_b, log_a, log_init = setup(rng)
    want_gamma, want_xi, want_ll = brute_force(log_b, log_a, log_init)
    gamma, xi, ll = forward_backward(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(log_init)
    )
    assert np.allclose(float(ll), want_ll, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gamma), want_gamma, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xi), want_xi, rtol=1e-3, atol=1e-5)
    # gamma rows sum to 1
    np.testing.assert_allclose(np.asarray(gamma).sum(1), 1.0, rtol=1e-4)


def test_padding_invariance(rng):
    log_b, log_a, log_init = setup(rng, t=6)
    padded = np.concatenate([log_b, rng.normal(size=(4, 3)).astype(np.float32) * 50])
    g0, x0, l0 = forward_backward(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(log_init)
    )
    g1, x1, l1 = forward_backward(
        jnp.asarray(padded), jnp.asarray(log_a), jnp.asarray(log_init), length=6
    )
    assert np.allclose(float(l0), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1)[:6], rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(g1)[6:] == 0)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x1), rtol=1e-4, atol=1e-6)
