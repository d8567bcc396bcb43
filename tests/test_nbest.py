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


def test_nbest_top1_matches_decoder_paths():
    """The n-best top-1 STATE PATH must equal ContinuousDecoder.predict's
    path frame-for-frame, including the reference backtrace quirk at the
    final frame (advisor finding r1)."""
    import jax.numpy as jnp
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
    from cs304_tpu.ops.nbest import kbest_composite_forward, nbest_paths

    rng = np.random.default_rng(11)
    models = {}
    for lab in ("1", "2", "S"):
        s = 3 if lab == "S" else 5
        models[lab] = WordHMM(
            label=lab, means=rng.normal(size=(s, 8)).astype(np.float32) * 2,
            covariances=np.tile(np.eye(8, dtype=np.float32), (s, 1, 1)),
            log_a=uniform_forward_log_a(s),
        )
    dec = ContinuousDecoder(models, penalty=-40.0)
    comp = dec.composite
    feats = rng.normal(size=(30, 8)).astype(np.float32)
    _scores, paths, _lengths = dec.viterbi_batch([feats])
    log_b = comp.log_likelihoods(feats)
    alpha, bps = kbest_composite_forward(
        log_b, jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
        jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
        comp.penalty, k=4,
    )
    hyps = nbest_paths(np.asarray(alpha), np.asarray(bps), comp.is_exit, 30, 1)
    np.testing.assert_array_equal(hyps[0][1], paths[0, :30])


def test_nbest_single_state_word_no_duplicate_prefixes():
    """Single-state words (entry == exit) must not fill two beam slots with
    the identical path prefix via the penalty and self-loop candidates."""
    import jax.numpy as jnp
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
    from cs304_tpu.ops.nbest import kbest_composite_forward, nbest_paths

    rng = np.random.default_rng(3)
    models = {
        "A": WordHMM(label="A", means=rng.normal(size=(1, 6)).astype(np.float32),
                     covariances=np.eye(6, dtype=np.float32)[None],
                     log_a=uniform_forward_log_a(1)),
        "B": WordHMM(label="B", means=rng.normal(size=(2, 6)).astype(np.float32),
                     covariances=np.tile(np.eye(6, dtype=np.float32), (2, 1, 1)),
                     log_a=uniform_forward_log_a(2)),
    }
    dec = ContinuousDecoder(models, penalty=-5.0)
    comp = dec.composite
    feats = rng.normal(size=(12, 6)).astype(np.float32)
    log_b = comp.log_likelihoods(feats)
    alpha, bps = kbest_composite_forward(
        log_b, jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
        jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
        comp.penalty, k=4,
    )
    # quirk_backtrace=False: the quirk legitimately maps distinct state paths
    # onto the same final-frame-overwritten sequence; duplicates must be
    # absent on the raw paths.
    hyps = nbest_paths(np.asarray(alpha), np.asarray(bps), comp.is_exit, 12, 8,
                       quirk_backtrace=False)
    seen = set()
    for _score, path in hyps:
        key = tuple(path.tolist())
        assert key not in seen, f"duplicate state path in beam: {key}"
        seen.add(key)
