"""Pure-NumPy oracles replicating the reference algorithms' observable semantics.

These are independent re-implementations (from the behavioral analysis in
SURVEY.md §2/§3), structured as plain functions over dense arrays, used only to
verify the JAX kernels. They intentionally preserve the reference's quirks:
initial self-loop transition at t=0, first-max argmax tie-breaking, and the
backtrace that drops the true final state (hidden_markov_model.py:200-208).
"""
import numpy as np


def ref_viterbi_banded(log_b, log_a, skip=2):
    """Oracle for the single-word Viterbi (hidden_markov_model.py:160-208)."""
    t_total, s = log_b.shape
    alpha = np.full(s, -np.inf, np.float64)
    alpha[0] = log_b[0, 0] + log_a[0, 0]
    tracer = np.full((t_total, s), -1, np.int64)
    for t in range(1, t_total):
        new_alpha = np.full(s, -np.inf, np.float64)
        for ns in range(s):
            cand = np.full(s, -np.inf, np.float64)
            for os_ in range(max(ns - skip, 0), ns + 1):
                cand[os_] = log_a[os_, ns] + alpha[os_]
            tracer[t, ns] = int(np.argmax(cand))
            new_alpha[ns] = np.max(cand) + log_b[t, ns]
        alpha = new_alpha
    score = alpha[-1]
    # Reference backtrace quirk: path[-1] = tracer[-1, best]
    prev = tracer[-1, s - 1]
    path = np.zeros(t_total, np.int64)
    path[-1] = prev
    for t in range(t_total - 2, -1, -1):
        path[t] = prev
        prev = tracer[t, prev]
    return score, path


def ref_viterbi_composite(log_b, log_a, lowers, uppers, penalty, skip=2):
    """Oracle for the composite decoder (hidden_markov_model.py:481-581)."""
    t_total, s = log_b.shape
    lowers = list(lowers)
    uppers = list(uppers)
    lower_of = np.zeros(s, np.int64)
    for lo in lowers:
        lower_of[lo:] = lo

    alpha = np.full(s, -np.inf, np.float64)
    for lo in lowers:
        alpha[lo] = log_b[0, lo] + log_a[lo, lo]
    tracer = np.full((t_total, s), -1, np.int64)

    for t in range(1, t_total):
        new_alpha = np.full(s, -np.inf, np.float64)
        for ns in range(s):
            if ns in lowers:
                continue
            lo = lower_of[ns]
            cand = np.full(s, -np.inf, np.float64)
            for os_ in range(max(ns - skip, lo), ns + 1):
                cand[os_] = log_a[os_, ns] + alpha[os_]
            tracer[t, ns] = int(np.argmax(cand))
            new_alpha[ns] = np.max(cand) + log_b[t, ns]
        for ns in lowers:
            cand = np.full(len(uppers) + 1, -np.inf, np.float64)
            cand[-1] = log_a[ns, ns] + alpha[ns]
            for idx, os_ in enumerate(uppers):
                cand[idx] = penalty + alpha[os_]
            k = int(np.argmax(cand))
            tracer[t, ns] = ns if k == len(uppers) else uppers[k]
            new_alpha[ns] = np.max(cand) + log_b[t, ns]
        alpha = new_alpha

    scores = alpha[uppers]
    best = uppers[int(np.argmax(scores))]
    prev = tracer[-1, best]
    path = np.zeros(t_total, np.int64)
    path[-1] = prev
    for t in range(t_total - 2, -1, -1):
        path[t] = prev
        prev = tracer[t, prev]
    return float(np.max(scores)), path


def brute_force_best_path(log_b, allowed, init_alpha, final_states):
    """Exhaustive enumeration of all state sequences on tiny problems.

    allowed: (S, S) log scores of s'->s (-inf = forbidden).
    init_alpha: (S,) initial scores (already including log_b[0]).
    Returns (best score, best standard path).
    """
    t_total, s = log_b.shape
    import itertools

    best_score, best_path = -np.inf, None
    for seq in itertools.product(range(s), repeat=t_total):
        if not np.isfinite(init_alpha[seq[0]]):
            continue
        if seq[-1] not in final_states:
            continue
        score = init_alpha[seq[0]]
        for t in range(1, t_total):
            score += allowed[seq[t - 1], seq[t]] + log_b[t, seq[t]]
        if np.isfinite(score) and score > best_score:
            best_score, best_path = score, list(seq)
    return best_score, best_path


def ref_viterbi_composite_beam(
    log_b, log_a, lowers, uppers, penalty, beam, skip=2
):
    """Beam-pruned composite Viterbi oracle: the ref_viterbi_composite
    recursion with classic per-frame relative pruning — after each frame's
    update (and the t=0 init), states scoring more than `beam` below the
    frame's best drop to -inf (the relative-threshold rule the reference
    applies to its DTW trellis, dynamic_time_wrapping.py:89-95)."""
    t_total, s = log_b.shape
    lowers = list(lowers)
    uppers = list(uppers)
    lower_of = np.zeros(s, np.int64)
    for lo in lowers:
        lower_of[lo:] = lo

    def prune(a):
        return np.where(a >= np.max(a) - beam, a, -np.inf)

    alpha = np.full(s, -np.inf, np.float64)
    for lo in lowers:
        alpha[lo] = log_b[0, lo] + log_a[lo, lo]
    alpha = prune(alpha)
    tracer = np.full((t_total, s), -1, np.int64)

    for t in range(1, t_total):
        new_alpha = np.full(s, -np.inf, np.float64)
        for ns in range(s):
            if ns in lowers:
                continue
            lo = lower_of[ns]
            cand = np.full(s, -np.inf, np.float64)
            for os_ in range(max(ns - skip, lo), ns + 1):
                cand[os_] = log_a[os_, ns] + alpha[os_]
            tracer[t, ns] = int(np.argmax(cand))
            new_alpha[ns] = np.max(cand) + log_b[t, ns]
        for ns in lowers:
            cand = np.full(len(uppers) + 1, -np.inf, np.float64)
            cand[-1] = log_a[ns, ns] + alpha[ns]
            for idx, os_ in enumerate(uppers):
                cand[idx] = penalty + alpha[os_]
            k = int(np.argmax(cand))
            tracer[t, ns] = ns if k == len(uppers) else uppers[k]
            new_alpha[ns] = np.max(cand) + log_b[t, ns]
        alpha = prune(new_alpha)

    scores = alpha[uppers]
    best = uppers[int(np.argmax(scores))]
    prev = tracer[-1, best]
    path = np.zeros(t_total, np.int64)
    path[-1] = prev
    for t in range(t_total - 2, -1, -1):
        path[t] = prev
        prev = tracer[t, prev]
    return float(np.max(scores)), path
