"""Log-space forward / backward recursions and posterior statistics.

The reference's live code only uses Viterbi; its deprecated tier carries the
forward algorithm for likelihood scoring (deprecated/hidden_markov_model.py:181-206)
and GMM forward likelihoods (deprecated/gaussian_mixture_model.py:223-239).
Here both directions run as lax.scans over log-semiring vector-matrix products,
giving exact Baum-Welch posteriors (gamma, xi) for soft EM training — the
capability BASELINE.json's north star asks for alongside segmental k-means.

Padded frames are handled as no-ops: steps with t >= length pass the carry
through, so a padded batch produces identical posteriors to its contents.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .logmath import logsumexp


@partial(jax.jit, static_argnames=())
def forward(log_b: jax.Array, log_a: jax.Array, log_init: jax.Array, length=None,
            log_final: jax.Array | None = None):
    """Forward recursion. Returns (log_alpha (T, S), log_likelihood).

    log_init: (S,) initial state log-probs WITHOUT the t=0 emission
    (it is added here). The likelihood sums over states at t = length-1,
    weighted by log_final when given (e.g. pin termination to the last state
    of a left-to-right sentence HMM, mirroring the Viterbi trainer's
    end-at-final-state semantics — reference hidden_markov_model.py:198).
    """
    t_total, s = log_b.shape
    if length is None:
        length = t_total
    length = jnp.asarray(length, jnp.int32)
    alpha0 = log_init + log_b[0]

    def step(alpha, inputs):
        t, log_b_t = inputs
        new_alpha = logsumexp(alpha[:, None] + log_a, axis=0) + log_b_t
        alpha = jnp.where(t < length, new_alpha, alpha)
        return alpha, alpha

    ts = jnp.arange(1, t_total, dtype=jnp.int32)
    alpha_last, alphas = jax.lax.scan(step, alpha0, (ts, log_b[1:]))
    log_alpha = jnp.concatenate([alpha0[None], alphas], axis=0)
    if log_final is not None:
        alpha_last = alpha_last + log_final
    return log_alpha, logsumexp(alpha_last, axis=0)


@partial(jax.jit, static_argnames=())
def backward(log_b: jax.Array, log_a: jax.Array, length=None,
             log_final: jax.Array | None = None):
    """Backward recursion. Returns log_beta (T, S) with
    beta[length-1] = log_final (zeros when not given)."""
    t_total, s = log_b.shape
    if length is None:
        length = t_total
    length = jnp.asarray(length, jnp.int32)
    beta_end = (jnp.zeros((s,), log_b.dtype) if log_final is None
                else jnp.asarray(log_final, log_b.dtype))

    def step(beta, inputs):
        t, log_b_next = inputs
        # beta[t] = logsum_s' a[s, s'] + b[t+1, s'] + beta[t+1, s']
        new_beta = logsumexp(log_a + (log_b_next + beta)[None, :], axis=1)
        # Frames at/after length-1 restart from the final-state weights.
        beta = jnp.where(t + 1 < length, new_beta, beta_end)
        return beta, beta

    ts = jnp.arange(t_total - 2, -1, -1, dtype=jnp.int32)
    _, betas = jax.lax.scan(step, beta_end, (ts, log_b[:0:-1]))
    return jnp.concatenate([betas[::-1], beta_end[None]], axis=0)


def forward_backward(log_b: jax.Array, log_a: jax.Array, log_init: jax.Array,
                     length=None, log_final: jax.Array | None = None):
    """Full posteriors for one sequence.

    Returns (gamma (T, S), xi_sum (S, S), log_likelihood):
      gamma[t, s]  = P(state_t = s | obs)        (zero for padded frames)
      xi_sum[s,s'] = sum_t P(state_t=s, state_{t+1}=s' | obs)
    log_final conditions on the terminal state distribution (see forward).
    """
    t_total, s = log_b.shape
    if length is None:
        length = t_total
    length = jnp.asarray(length, jnp.int32)
    log_alpha, loglik = forward(log_b, log_a, log_init, length, log_final)
    log_beta = backward(log_b, log_a, length, log_final)

    frame_mask = jnp.arange(t_total)[:, None] < length
    log_gamma = log_alpha + log_beta - loglik
    gamma = jnp.where(frame_mask, jnp.exp(log_gamma), 0.0)

    # xi[t, s, s'] over transitions t -> t+1 with t+1 < length.
    log_xi = (
        log_alpha[:-1, :, None]
        + log_a[None, :, :]
        + (log_b[1:] + log_beta[1:])[:, None, :]
        - loglik
    )
    pair_mask = (jnp.arange(1, t_total)[:, None, None]) < length
    xi_sum = jnp.sum(jnp.where(pair_mask, jnp.exp(log_xi), 0.0), axis=0)
    return gamma, xi_sum, loglik


def forward_log_likelihood(log_b, log_a, log_init, length=None) -> jax.Array:
    """Sequence log-likelihood under the model (the deprecated tier's
    log_likelihood, deprecated/hidden_markov_model.py:181-206)."""
    _, loglik = forward(log_b, log_a, log_init, length)
    return loglik
