"""Duration-constrained composite Viterbi: min/max state-duration modeling.

The plain HMM's implicit geometric duration model (a self-loop probability)
puts no floor on how briefly a state may be visited — a single noisy frame
can transit a whole word, which is where spurious insertions come from. This
module composes the composite trellis (ops/viterbi.py; reference recursion
hidden_markov_model.py:481-581) with explicit per-state duration counters:

  alpha[s, d] = best score of paths currently in state s for (d+1)
                consecutive frames (d saturates at the static cap D-1)

  stay     alpha'[s, d+1]  <- alpha[s, d] + log_a[s, s]      while d+2 <= max_dur[s]
  advance  alpha'[s2, 0]   <- max_{d+1 >= min_dur[s]} alpha[s, d] + M[s, s2]
  finish   score = max over exit states s, d+1 >= min_dur[s]

where M is the composite advance rule: banded word-internal transitions plus
word-exit -> word-entry moves with the inter-word penalty. A state may only
be LEFT (and only end the utterance) after min_dur completed frames, and may
not be stayed in past max_dur. min_dur = 1, max_dur = inf reproduces the
unconstrained decoder exactly (tests/test_duration.py asserts this and
brute-force-verifies the constrained semantics on tiny HMMs).

This is the masked-band extension the max-plus semiring makes cheap: one
scan step is O(S * D) vector work instead of O(S) — D is small (a duration
floor of 2-4 frames needs D >= 4) — and the whole lattice stays a lax.scan
with static shapes. Backpointers pack (state, duration) into one int32.

Caveat: the diagonal of the ADVANCE matrix is -inf (a same-state "advance"
is a stay), so a repeated single-state word (exit == entry, re-entered via
the penalty on its own diagonal) cannot be expressed — rejected up front.
Real vocabularies (3+-state words, 3-state silence) are unaffected.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .viterbi import composite_transition_matrix

UNBOUNDED = np.int32(2**30)  # max_dur sentinel: no upper duration limit


def _advance_matrix(log_a, lower_of_state, is_entry, is_exit, penalty):
    """Composite transition rule with the diagonal (stay moves) removed."""
    m = composite_transition_matrix(
        log_a, lower_of_state, is_entry, is_exit, penalty
    )
    s = m.shape[0]
    eye = jnp.eye(s, dtype=bool)
    return jnp.where(eye, -jnp.inf, m)


@partial(jax.jit, static_argnames=("d_cap", "quirk_backtrace"))
def viterbi_composite_duration(
    log_b: jax.Array,
    log_a: jax.Array,
    lower_of_state: jax.Array,
    is_entry: jax.Array,
    is_exit: jax.Array,
    penalty,
    min_dur: jax.Array,
    max_dur: jax.Array,
    length=None,
    d_cap: int = 8,
    quirk_backtrace: bool = True,
):
    """One utterance: (score, path (T,) int32) under duration constraints.

    log_b (T, S); min_dur/max_dur (S,) int32 (max_dur may be UNBOUNDED).
    d_cap: static duration-lattice depth; must exceed every FINITE max_dur
    and be >= every min_dur (validated by the wrapper below).
    """
    t_total, s = log_b.shape
    if length is None:
        length = t_total
    length = jnp.asarray(length, jnp.int32)
    min_dur = jnp.asarray(min_dur, jnp.int32)
    max_dur = jnp.asarray(max_dur, jnp.int32)
    d = d_cap
    neg = jnp.float32(-jnp.inf)

    m_adv = _advance_matrix(log_a, lower_of_state, is_entry, is_exit,
                            jnp.asarray(penalty, log_b.dtype))
    diag = jnp.diagonal(log_a)
    diag_init = jnp.where(jnp.isfinite(diag), diag, 0.0)

    durs = jnp.arange(d, dtype=jnp.int32)  # run length = durs + 1
    # A visit of run length d+1 is "complete" (may advance/terminate).
    complete = (durs[None, :] + 1) >= min_dur[:, None]          # (S, D)
    # Staying INTO slot d (run length d+1) is allowed while <= max_dur;
    # slot D-1 additionally accepts saturated stays only when unbounded.
    stay_ok = (durs[None, :] + 1) <= max_dur[:, None]           # (S, D)
    unbounded = (max_dur >= UNBOUNDED)[:, None]                 # (S, 1)

    # alpha (S, D); bp packs (prev_state * D + prev_dur) per new cell.
    alpha0 = jnp.full((s, d), neg).at[:, 0].set(
        jnp.where(is_entry, log_b[0] + diag_init, neg)
    )

    def step(carry, inputs):
        alpha = carry
        t, log_b_t = inputs

        # Advance moves: best completed score per source state.
        comp_scores = jnp.where(complete, alpha, neg)            # (S, D)
        best_comp = jnp.max(comp_scores, axis=1)                 # (S,)
        best_comp_d = jnp.argmax(comp_scores, axis=1)            # (S,)
        adv = best_comp[:, None] + m_adv                         # (S_from, S_to)
        adv_val = jnp.max(adv, axis=0)                           # (S,)
        adv_src = jnp.argmax(adv, axis=0).astype(jnp.int32)      # (S,)
        adv_bp = adv_src * d + best_comp_d[adv_src].astype(jnp.int32)

        # Stay moves: shift along the duration axis (+ saturation at D-1).
        stay_shift = jnp.concatenate(
            [jnp.full((s, 1), neg), alpha[:, :-1]], axis=1
        )
        sat = jnp.where(unbounded[:, 0], alpha[:, d - 1], neg)
        stay_shift = stay_shift.at[:, d - 1].set(
            jnp.maximum(stay_shift[:, d - 1], sat)
        )
        stay_val = jnp.where(stay_ok, stay_shift + diag[:, None], neg)
        # Saturated-stay backpointer: did slot D-1 come from D-2 or D-1?
        from_sat = unbounded[:, 0] & (alpha[:, d - 1] > jnp.concatenate(
            [jnp.full((s, 1), neg), alpha[:, :-1]], axis=1
        )[:, d - 1])
        states = jnp.arange(s, dtype=jnp.int32)
        stay_bp = states[:, None] * d + jnp.maximum(durs[None, :] - 1, 0)
        stay_bp = stay_bp.at[:, d - 1].set(
            jnp.where(from_sat, states * d + (d - 1), states * d + (d - 2))
        )

        # d = 0 column is advance-only; d > 0 columns are stay-only.
        new_alpha = stay_val.at[:, 0].set(adv_val)
        bp = stay_bp.at[:, 0].set(adv_bp)
        new_alpha = new_alpha + log_b_t[:, None]

        live = t < length
        alpha = jnp.where(live, new_alpha, alpha)
        return alpha, bp.astype(jnp.int32)

    ts = jnp.arange(1, t_total, dtype=jnp.int32)
    alpha, bps = jax.lax.scan(step, alpha0, (ts, log_b[1:]))
    backptrs = jnp.concatenate(
        [jnp.full((1, s, d), -1, jnp.int32), bps], axis=0
    )  # (T, S, D)

    # Terminate: best exit state with a completed final visit.
    final_ok = is_exit[:, None] & complete
    final_scores = jnp.where(final_ok, alpha, neg)
    flat = final_scores.reshape(-1)
    best_cell = jnp.argmax(flat).astype(jnp.int32)
    score = flat[best_cell]

    # Backtrace through packed (state, dur) cells; emit states only.
    def rev_step(cell, inputs):
        t, bp_t = inputs
        live = t <= length - 1
        emit = cell // d
        new_cell = jnp.where(live, bp_t.reshape(-1)[cell], cell)
        return new_cell, emit

    ts_rev = jnp.arange(t_total - 1, 0, -1, dtype=jnp.int32)
    final_cell, emitted = jax.lax.scan(
        rev_step, best_cell, (ts_rev, backptrs[t_total - 1 : 0 : -1])
    )
    path = jnp.concatenate([jnp.array([final_cell // d]), emitted[::-1]])
    if quirk_backtrace:
        last = jnp.maximum(length - 1, 0)
        second = jnp.maximum(length - 2, 0)
        path = path.at[last].set(path[second])
    return score, path.astype(jnp.int32)


def viterbi_composite_duration_batch(
    log_b, log_a, lower_of_state, is_entry, is_exit, penalty,
    min_dur, max_dur, lengths, d_cap: int = 8, quirk_backtrace: bool = True,
):
    """vmap over a padded batch: log_b (B, T, S), lengths (B,)."""
    fn = lambda b, l: viterbi_composite_duration(
        b, log_a, lower_of_state, is_entry, is_exit, penalty,
        min_dur, max_dur, l, d_cap=d_cap, quirk_backtrace=quirk_backtrace,
    )
    return jax.vmap(fn)(log_b, lengths)


def duration_arrays(composite, min_duration, max_duration=None,
                    constrain_silence: bool = False):
    """Per-state (min_dur, max_dur, d_cap) from scalar-or-dict knobs.

    min_duration/max_duration: int applied to every state of every word, or
    {label: int} per word. Silence states stay unconstrained unless
    constrain_silence (silence legitimately spans 1 frame at utterance
    edges). Validates the single-state-word caveat and returns the minimal
    static d_cap.
    """
    s = composite.num_states
    min_dur = np.ones(s, np.int32)
    max_dur = np.full(s, UNBOUNDED, np.int32)

    def per_label(knob, label, default):
        if knob is None:
            return default
        if isinstance(knob, dict):
            return int(knob.get(label, default))
        return int(knob)

    single = [
        l for l, n in zip(composite.labels, composite.state_counts) if n == 1
    ]
    if single:
        raise ValueError(
            f"single-state words {single} cannot use the duration decoder: "
            "their repeat (exit == entry) is a diagonal move the duration "
            "lattice reads as a stay (module caveat)"
        )
    for w, label in enumerate(composite.labels):
        if label == "S" and not constrain_silence:
            continue
        lo, hi = int(composite.lowers[w]), int(composite.uppers[w]) + 1
        min_dur[lo:hi] = per_label(min_duration, label, 1)
        max_dur[lo:hi] = per_label(max_duration, label, UNBOUNDED)
    if (min_dur < 1).any():
        raise ValueError("min durations must be >= 1")
    if (max_dur < min_dur).any():
        raise ValueError("max_duration below min_duration")
    finite = max_dur[max_dur < UNBOUNDED]
    d_cap = int(max(
        int(min_dur.max()),
        int(finite.max()) if finite.size else 1,
        2,
    ))
    return min_dur, max_dur, d_cap
