"""K-best Viterbi vs brute-force path enumeration on tiny composites."""
import itertools

import jax.numpy as jnp
import numpy as np

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.nbest import kbest_composite_forward, nbest_decode, nbest_paths
from cs304_tpu.ops.viterbi import composite_transition_matrix


def setup(rng, state_counts=(2, 3)):
    s_total = sum(state_counts)
    log_a = np.full((s_total, s_total), -np.inf, np.float32)
    lowers, uppers, base = [], [], 0
    for n in state_counts:
        log_a[base : base + n, base : base + n] = uniform_forward_log_a(n)
        lowers.append(base)
        uppers.append(base + n - 1)
        base += n
    lower_of = np.zeros(s_total, np.int32)
    for lo in lowers:
        lower_of[lo:] = lo
    entry = np.zeros(s_total, bool); entry[lowers] = True
    exit_ = np.zeros(s_total, bool); exit_[uppers] = True
    return s_total, lowers, uppers, log_a, lower_of, entry, exit_


def brute_force_topn(log_b, trans, init, exits, n):
    t_total, s = log_b.shape
    scored = []
    for seq in itertools.product(range(s), repeat=t_total):
        if not np.isfinite(init[seq[0]]) or seq[-1] not in exits:
            continue
        score = init[seq[0]]
        for t in range(1, t_total):
            score += trans[seq[t - 1], seq[t]] + log_b[t, seq[t]]
        if np.isfinite(score):
            scored.append((score, seq))
    scored.sort(key=lambda x: -x[0])
    return scored[:n]


def test_kbest_matches_brute_force(rng):
    s_total, lowers, uppers, log_a, lower_of, entry, exit_ = setup(rng)
    t, penalty, k = 5, -1.0, 4
    log_b = rng.normal(size=(t, s_total)).astype(np.float32)
    trans = np.asarray(
        composite_transition_matrix(
            jnp.asarray(log_a), jnp.asarray(lower_of), jnp.asarray(entry),
            jnp.asarray(exit_), penalty,
        )
    )
    init = np.full(s_total, -np.inf)
    for lo in lowers:
        d = log_a[lo, lo]
        init[lo] = log_b[0, lo] + (d if np.isfinite(d) else 0.0)
    want = brute_force_topn(log_b, trans, init, set(uppers), k)

    alpha, bp = kbest_composite_forward(
        jnp.asarray(log_b), jnp.asarray(log_a), jnp.asarray(lower_of),
        jnp.asarray(entry), jnp.asarray(exit_), penalty, k=k,
    )
    got = nbest_paths(np.asarray(alpha), np.asarray(bp), exit_, t, k)
    assert len(got) == len(want)
    for (gs, gp), (ws, wp) in zip(got, want):
        assert np.allclose(gs, ws, rtol=1e-5, atol=1e-4), (gs, ws)
    # Score multisets must match even if equal-scoring paths reorder.
    np.testing.assert_allclose(
        sorted(g[0] for g in got), sorted(w[0] for w in want), rtol=1e-5, atol=1e-4
    )
    # The 1-best path must match exactly.
    np.testing.assert_array_equal(got[0][1], np.asarray(want[0][1]))


def test_nbest_decode_strings(rng):
    def mk(label, s):
        return WordHMM(
            label=label,
            means=rng.normal(size=(s, 4)).astype(np.float32) * 3,
            covariances=np.tile(np.eye(4, dtype=np.float32), (s, 1, 1)),
            log_a=uniform_forward_log_a(s),
        )

    comp = stack_word_models([mk("A", 3), mk("B", 3)], penalty=-2.0)
    feats = (rng.normal(size=(14, 4)) * 2).astype(np.float32)
    hyps = nbest_decode(comp, feats, n=3)
    assert 1 <= len(hyps) <= 3
    scores = [h[0] for h in hyps]
    assert scores == sorted(scores, reverse=True)
    texts = [h[1] for h in hyps]
    assert len(set(texts)) == len(texts)  # deduped
    # 1-best string equals the plain (1-best) decoder's output.
    score, path = comp.viterbi(feats)
    best_text = "".join(comp.path_to_labels(np.asarray(path)[: feats.shape[0]]))
    assert hyps[0][1] == best_text
