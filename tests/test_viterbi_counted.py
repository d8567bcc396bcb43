"""Word-count-constrained decoding (ops/viterbi_counted.py):
brute-force verification on tiny composites, exact-count guarantees,
consistency with the unconstrained decoder, silence-free counting.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.viterbi import composite_transition_matrix, viterbi_composite
from cs304_tpu.ops.viterbi_counted import (
    viterbi_composite_counted,
    viterbi_composite_counted_batch,
)


def mk(label, s, rng, d=3):
    a = rng.normal(size=(s, d, 2)).astype(np.float32)
    covs = a @ a.transpose(0, 2, 1) + np.eye(d, dtype=np.float32)
    return WordHMM(
        label=label,
        means=rng.normal(size=(s, d)).astype(np.float32) * 3,
        covariances=covs,
        log_a=uniform_forward_log_a(s),
    )


@pytest.fixture
def tiny(rng):
    return stack_word_models(
        [mk("A", 2, rng), mk("B", 2, rng), mk("S", 2, rng)], penalty=-2.0
    )


def brute_force_counted(comp, log_b, n_words):
    """Enumerate every legal composite state path, count non-silence word
    instances via the span rules, and return the best score among paths
    with exactly n_words counted words ending at a word exit."""
    t_total, s = log_b.shape
    trans = np.asarray(composite_transition_matrix(
        jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
        jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit), comp.penalty,
    ))
    diag = np.diagonal(np.asarray(comp.log_a)).copy()
    diag[~np.isfinite(diag)] = 0.0
    from cs304_tpu.ops.lattice import path_word_spans

    sil = comp._silence_word
    best = -np.inf
    stack = [
        ((e,), log_b[0, e] + diag[e])
        for e in np.flatnonzero(comp.is_entry)
    ]
    while stack:
        path, score = stack.pop()
        t = len(path)
        if t == t_total:
            if not comp.is_exit[path[-1]]:
                continue
            spans = path_word_spans(comp, np.asarray(path))
            count = sum(1 for _s, _e, w in spans if w != sil)
            if count == n_words:
                best = max(best, score)
            continue
        for nxt in range(s):
            a = trans[path[-1], nxt]
            if np.isfinite(a):
                stack.append((path + (nxt,), score + a + log_b[t, nxt]))
    return best


def test_counted_matches_brute_force(rng, tiny):
    t_total = 6
    log_b = (rng.normal(size=(t_total, tiny.num_states)) * 2).astype(np.float32)
    args = (
        jnp.asarray(log_b), jnp.asarray(tiny.log_a),
        jnp.asarray(tiny.lower_of_state), jnp.asarray(tiny.is_entry),
        jnp.asarray(tiny.is_exit),
        jnp.asarray(tiny.word_of_state != tiny._silence_word),
    )
    for n in (0, 1, 2, 3):
        score, path = viterbi_composite_counted(
            *args, tiny.penalty, n, quirk_backtrace=False
        )
        want = brute_force_counted(tiny, log_b, n)
        if np.isinf(want):
            assert np.isinf(float(score)), (n, float(score))
            continue
        assert float(score) == pytest.approx(want, rel=1e-5), n
        # The decoded path itself must carry exactly n counted words.
        labels = tiny.path_to_labels(np.asarray(path), skip_silence=True)
        assert len(labels) == n


def test_counted_agrees_with_unconstrained_at_its_count(rng, tiny):
    """Constraining to the unconstrained decode's own word count must
    reproduce its score and path."""
    t_total = 30
    log_b = (rng.normal(size=(t_total, tiny.num_states)) * 2).astype(np.float32)
    u_score, u_path = viterbi_composite(
        jnp.asarray(log_b), jnp.asarray(tiny.log_a),
        jnp.asarray(tiny.lower_of_state), jnp.asarray(tiny.is_entry),
        jnp.asarray(tiny.is_exit), tiny.penalty, quirk_backtrace=False,
    )
    n = len(tiny.path_to_labels(np.asarray(u_path), skip_silence=True))
    c_score, c_path = viterbi_composite_counted(
        jnp.asarray(log_b), jnp.asarray(tiny.log_a),
        jnp.asarray(tiny.lower_of_state), jnp.asarray(tiny.is_entry),
        jnp.asarray(tiny.is_exit),
        jnp.asarray(tiny.word_of_state != tiny._silence_word),
        tiny.penalty, n, quirk_backtrace=False,
    )
    assert float(c_score) == pytest.approx(float(u_score), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(c_path), np.asarray(u_path))


def test_counted_forces_different_count(rng, tiny):
    """Asking for a different count than the unconstrained winner yields a
    path with exactly that count at a lower (or equal) score."""
    t_total = 30
    log_b = (rng.normal(size=(t_total, tiny.num_states)) * 2).astype(np.float32)
    u_score, u_path = viterbi_composite(
        jnp.asarray(log_b), jnp.asarray(tiny.log_a),
        jnp.asarray(tiny.lower_of_state), jnp.asarray(tiny.is_entry),
        jnp.asarray(tiny.is_exit), tiny.penalty, quirk_backtrace=False,
    )
    n = len(tiny.path_to_labels(np.asarray(u_path), skip_silence=True))
    for target in (max(n - 1, 1), n + 1):
        if target == n:
            continue
        c_score, c_path = viterbi_composite_counted(
            jnp.asarray(log_b), jnp.asarray(tiny.log_a),
            jnp.asarray(tiny.lower_of_state), jnp.asarray(tiny.is_entry),
            jnp.asarray(tiny.is_exit),
            jnp.asarray(tiny.word_of_state != tiny._silence_word),
            tiny.penalty, target, quirk_backtrace=False,
        )
        labels = tiny.path_to_labels(np.asarray(c_path), skip_silence=True)
        assert len(labels) == target
        assert float(c_score) <= float(u_score) + 1e-4


def test_counted_batch_padding(rng, tiny):
    """Batched counted decode with ragged lengths matches per-utterance."""
    feats_lens = (20, 14, 20)
    t_max = max(feats_lens)
    log_bs = np.full((3, t_max, tiny.num_states), 0.0, np.float32)
    singles = []
    for i, l in enumerate(feats_lens):
        lb = (rng.normal(size=(l, tiny.num_states)) * 2).astype(np.float32)
        log_bs[i, :l] = lb
        singles.append(lb)
    args = (
        jnp.asarray(tiny.log_a), jnp.asarray(tiny.lower_of_state),
        jnp.asarray(tiny.is_entry), jnp.asarray(tiny.is_exit),
        jnp.asarray(tiny.word_of_state != tiny._silence_word),
    )
    b_scores, b_paths = viterbi_composite_counted_batch(
        jnp.asarray(log_bs), *args, tiny.penalty, 2,
        jnp.asarray(np.array(feats_lens, np.int32)), quirk_backtrace=False,
    )
    for i, (lb, l) in enumerate(zip(singles, feats_lens)):
        s1, p1 = viterbi_composite_counted(
            jnp.asarray(lb), *args, tiny.penalty, 2, quirk_backtrace=False,
        )
        assert float(b_scores[i]) == pytest.approx(float(s1), rel=1e-6)
        np.testing.assert_array_equal(
            np.asarray(b_paths[i, :l]), np.asarray(p1)
        )


def test_decoder_counted_api(rng):
    """ContinuousDecoder.predict_batch_counted returns exactly-n strings
    (falling back when impossible)."""
    from cs304_tpu.models.decoder import ContinuousDecoder

    models = {l: mk(l, 3, rng, d=4) for l in ("A", "B", "S")}
    dec = ContinuousDecoder(models, penalty=-4.0)
    feats = [
        (rng.normal(size=(t, 4)) * 2).astype(np.float32) for t in (30, 41)
    ]
    for n in (1, 2, 3):
        preds = dec.predict_batch_counted(feats, n)
        for p in preds:
            assert len(p) == n
    # Impossible constraint (too many words for the frames) falls back.
    short = [(rng.normal(size=(4, 4)) * 2).astype(np.float32)]
    preds = dec.predict_batch_counted(short, 10)
    assert len(preds) == 1  # unconstrained fallback string, no crash


def test_decoder_counted_gmm(rng):
    """predict_batch_counted scores with the GMM densities on K-mixture
    checkpoints (via the decoder's shared emission path)."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.gmm_hmm import GMMWordHMM

    def mkg(label, s, k=2):
        a = rng.normal(size=(s, k, 4, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 1, 3, 2) + np.eye(4, dtype=np.float32)
        return GMMWordHMM(
            label=label,
            means=rng.normal(size=(s, k, 4)).astype(np.float32) * 3,
            covariances=covs,
            weights=np.full((s, k), 1.0 / k, np.float32),
            log_a=uniform_forward_log_a(s),
        )

    models = {m.label: m for m in (mkg("A", 3), mkg("B", 3), mkg("S", 2))}
    dec = ContinuousDecoder(models, penalty=-4.0)
    feats = [(rng.normal(size=(28, 4)) * 2).astype(np.float32)]
    for n in (1, 2):
        preds = dec.predict_batch_counted(feats, n)
        assert len(preds[0]) == n


def test_count_range(rng, tiny):
    """Range constraint [lo, hi] returns the best of the exact-count
    decodes in that window and a path whose count lies inside it."""
    t_total = 12
    log_b = (rng.normal(size=(t_total, tiny.num_states)) * 2).astype(np.float32)
    args = (
        jnp.asarray(log_b), jnp.asarray(tiny.log_a),
        jnp.asarray(tiny.lower_of_state), jnp.asarray(tiny.is_entry),
        jnp.asarray(tiny.is_exit),
        jnp.asarray(tiny.word_of_state != tiny._silence_word),
    )
    exact = {}
    for n in (1, 2, 3, 4):
        sc, _p = viterbi_composite_counted(
            *args, tiny.penalty, n, quirk_backtrace=False
        )
        exact[n] = float(sc)
    for lo, hi in ((1, 3), (2, 4), (1, 4)):
        sc, path = viterbi_composite_counted(
            *args, tiny.penalty, hi, n_words_min=lo, quirk_backtrace=False
        )
        want = max(exact[n] for n in range(lo, hi + 1))
        assert float(sc) == pytest.approx(want, rel=1e-6), (lo, hi)
        count = len(tiny.path_to_labels(np.asarray(path), skip_silence=True))
        assert lo <= count <= hi
