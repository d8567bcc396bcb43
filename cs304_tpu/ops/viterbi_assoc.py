"""Viterbi via associative scan over max-plus matrix products.

The sequential trellis has O(T) depth. Viterbi is a tropical-semiring matrix
chain — alpha_T = alpha_0 (x) M_1 (x) ... (x) M_{T-1} with
M_t[i, j] = trans[i, j] + log_b[t, j] and (A (x) B)[i, j] = max_k A[i,k]+B[k,j]
— so the whole forward pass parallelizes to O(log T) depth with
jax.lax.associative_scan (the HMM analogue of blockwise long-context
techniques; see PAPERS.md "Temporal Parallelization of Inference in Hidden
Markov Models"). Work grows to O(T S^3 log T), a good trade for long
utterances with the reference's tiny state spaces (S <= 58, one 64x64
max-plus matmul per combine).

The path is recovered from the per-step alphas with the standard backward
argmax pass (cheap O(T) gathers, vectorized over the batch).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _maxplus_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """(…, S, S) tropical product: out[i, j] = max_k a[i, k] + b[k, j]."""
    return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)


@partial(jax.jit, static_argnames=())
def viterbi_alphas_assoc(log_b: jax.Array, trans: jax.Array, alpha0: jax.Array):
    """All forward alphas in O(log T) depth.

    log_b (T, S), trans (S, S), alpha0 (S,) -> alphas (T, S) where
    alphas[t] equals the sequential max-plus recursion's alpha at step t.
    """
    t_total, s = log_b.shape
    # M_t for t = 1..T-1: (T-1, S, S)
    steps = trans[None, :, :] + log_b[1:, None, :]
    prefix = jax.lax.associative_scan(_maxplus_matmul, steps)  # (T-1, S, S)
    alphas_rest = jnp.max(alpha0[None, :, None] + prefix, axis=1)  # (T-1, S)
    return jnp.concatenate([alpha0[None], alphas_rest], axis=0)


@partial(jax.jit, static_argnames=())
def viterbi_assoc(log_b: jax.Array, trans: jax.Array, alpha0: jax.Array,
                  final_mask: jax.Array):
    """Full Viterbi with associative-scan forward pass.

    final_mask (S,) bool marks admissible final states. Returns
    (score, path (T,) int32) with the standard (non-quirk) backtrace.
    """
    t_total, s = log_b.shape
    alphas = viterbi_alphas_assoc(log_b, trans, alpha0)
    final_scores = jnp.where(final_mask, alphas[-1], -jnp.inf)
    score = jnp.max(final_scores)
    last = jnp.argmax(final_scores).astype(jnp.int32)

    # state[t-1] = argmax_i alphas[t-1, i] + trans[i, state[t]]
    def back(state, alpha_prev):
        prev = jnp.argmax(alpha_prev + trans[:, state]).astype(jnp.int32)
        return prev, state

    first, path_rest = jax.lax.scan(back, last, alphas[:-1], reverse=True)
    path = jnp.concatenate([jnp.array([first], jnp.int32), path_rest])
    return score, path.astype(jnp.int32)


def viterbi_composite_assoc(
    log_b: jax.Array,
    log_a: jax.Array,
    lower_of_state: jax.Array,
    is_entry: jax.Array,
    is_exit: jax.Array,
    penalty,
):
    """Composite continuous decoding with the O(log T)-depth forward pass.

    Same topology as ops.viterbi.viterbi_composite (entry seeding, exit
    termination, standard backtrace); the forward recursion is the
    associative scan. Intended for long utterances where the sequential scan's
    O(T) depth dominates; identical results up to float-tie argmax order.
    """
    from .viterbi import composite_transition_matrix

    trans = composite_transition_matrix(
        log_a, lower_of_state, is_entry, is_exit, penalty
    )
    diag = jnp.diagonal(log_a)
    diag = jnp.where(jnp.isfinite(diag), diag, 0.0)
    alpha0 = jnp.where(is_entry, log_b[0] + diag, -jnp.inf)
    return viterbi_assoc(log_b, trans, alpha0, is_exit)
