"""Word-bigram LM (ops/lm.py): training, per-pair trellis penalties,
lm_weight=0 parity with the flat-penalty decoder, steering, rescoring.

The reference's inter-word model is one flat penalty
(hidden_markov_model.py:419,541-544); the bigram generalizes it through the
same dense composite transition matrix.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.lm import (
    WordBigram,
    pair_penalty_matrix,
    rescore_nbest,
    train_word_bigram,
)
from cs304_tpu.ops.viterbi import viterbi_composite


def _models(rng, labels=("A", "B"), s=3, d=4):
    out = {}
    for label in labels:
        a = rng.normal(size=(s, d, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 2, 1) + np.eye(d, dtype=np.float32)
        out[label] = WordHMM(
            label=label,
            means=rng.normal(size=(s, d)).astype(np.float32) * 3,
            covariances=covs,
            log_a=uniform_forward_log_a(s),
        )
    return out


def test_trained_bigram_is_a_distribution():
    bg = train_word_bigram(["AB", "ABA", "BA", "A"], ["A", "B"])
    # Each row's continuations (words + </s>) sum to 1.
    for i in range(2):
        total = np.exp(bg.log_p[i]).sum() + np.exp(bg.log_p_final[i])
        assert total == pytest.approx(1.0, rel=1e-6)
    assert np.exp(bg.log_p_init).sum() == pytest.approx(1.0, rel=1e-6)
    # "AB" appears twice, "AA" never: P(B|A) > P(A|A) with light smoothing.
    assert bg.log_p[0, 1] > bg.log_p[0, 0]


def test_insert_silence_vocab():
    bg = train_word_bigram(["AB", "AA"], ["A", "B", "S"], insert_silence=True)
    i = bg.index
    # Silence-interleaved sentences (S A S B S / S A S A S): every word is
    # followed by S, never directly by another word.
    assert bg.log_p[i["A"], i["S"]] > bg.log_p[i["A"], i["B"]]
    # Word frequency flows through the S rows: A (3 occurrences) outweighs
    # B (1) after silence, so the all-A sentence beats the all-B one.
    assert bg.log_p[i["S"], i["A"]] > bg.log_p[i["S"], i["B"]]
    assert bg.sequence_log_prob(list("SASAS")) > bg.sequence_log_prob(list("SBSBS"))


def test_lm_weight_zero_matches_flat_penalty(rng):
    """The log-linear combination keeps the flat penalty as the insertion
    penalty, so lm_weight=0 must decode identically to no LM at all."""
    models = _models(rng, labels=("A", "B", "S"))
    bg = train_word_bigram(["AB", "BA"], ["A", "B", "S"], insert_silence=True)
    feats = [
        (rng.normal(size=(t, 4)) * 2).astype(np.float32) for t in (30, 41, 25)
    ]
    for backend in ("scan", "fast"):
        plain = ContinuousDecoder(models, penalty=-4.0, backend=backend)
        lm0 = ContinuousDecoder(models, penalty=-4.0, bigram=bg,
                                lm_weight=0.0, backend=backend)
        p_scores, p_paths, _ = plain.viterbi_batch(feats)
        l_scores, l_paths, _ = lm0.viterbi_batch(feats)
        np.testing.assert_array_equal(p_paths, l_paths)
        np.testing.assert_allclose(p_scores, l_scores, rtol=1e-6)
        assert plain.predict_batch(feats) == lm0.predict_batch(feats)


def test_lm_fast_backend_matches_scan(rng):
    """The banded step's (W, W) tropical-matvec entry update must decode
    identically to the dense scan with the expanded (S, S) matrix."""
    models = _models(rng, labels=("A", "B", "S"))
    bg = train_word_bigram(
        ["AB", "BA", "AAB", "BS"], ["A", "B", "S"], insert_silence=False
    )
    feats = [
        (rng.normal(size=(t, 4)) * 2).astype(np.float32) for t in (36, 21, 44)
    ]
    for w in (0.5, 3.0):
        scan = ContinuousDecoder(models, penalty=-3.0, bigram=bg,
                                 lm_weight=w, backend="scan")
        fast = ContinuousDecoder(models, penalty=-3.0, bigram=bg,
                                 lm_weight=w, backend="fast")
        s_scores, s_paths, _ = scan.viterbi_batch(feats)
        f_scores, f_paths, _ = fast.viterbi_batch(feats)
        np.testing.assert_allclose(s_scores, f_scores, rtol=1e-6)
        np.testing.assert_array_equal(s_paths, f_paths)


def test_bigram_steers_ambiguous_decode(rng):
    """With near-ambiguous acoustics a strong bigram flips the decoded word
    sequence toward the LM-favored continuation."""
    models = _models(rng, labels=("A", "B"))
    comp = stack_word_models(list(models.values()), penalty=-1.0)
    # Synthetic emissions that force REPEATED word instances: the favored
    # A-state cycles 0 -> 1 -> 2 every two frames, so the acoustically best
    # path re-enters word A once per 6-frame cycle (decoding "AAAA"); B
    # states are everywhere mediocre (-2.5), a cheap detour but never the
    # acoustic favorite.
    t, s = 24, comp.num_states
    log_b = np.full((t, s), -5.0, np.float32)
    a_lo, _a_hi = comp.word_state_range("A")
    b_lo, b_hi = comp.word_state_range("B")
    log_b[:, b_lo:b_hi + 1] = -2.5
    for tt in range(t):
        log_b[tt, a_lo + (tt // 2) % 3] = 0.0
    # LM: A is never followed by A, always by B.
    w = 2
    log_p = np.log(np.full((w, w), 1e-6, np.float32))
    log_p[0, 1] = np.log(0.999)   # A -> B
    log_p[1, 0] = np.log(0.5)
    log_p[1, 1] = np.log(0.5 - 1e-6)
    bg = WordBigram(
        labels=["A", "B"], log_p=log_p.astype(np.float32),
        log_p_init=np.log(np.full(w, 0.5, np.float32)),
        log_p_final=np.log(np.full(w, 1e-6, np.float32)),
    )
    flat_args = (
        jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
        jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
    )
    _, flat_path = viterbi_composite(jnp.asarray(log_b), *flat_args, -1.0)
    pair = pair_penalty_matrix(comp, bg, lm_weight=12.0, penalty=-1.0)
    _, lm_path = viterbi_composite(
        jnp.asarray(log_b), *flat_args, jnp.asarray(pair)
    )
    flat_words = comp.path_to_labels(np.asarray(flat_path), skip_silence=False)
    lm_words = comp.path_to_labels(np.asarray(lm_path), skip_silence=False)
    # Flat decode indulges the acoustic tilt (A repeated); the LM forbids
    # A->A, so no decoded A is immediately followed by another A.
    assert any(x == y == "A" for x, y in zip(flat_words, flat_words[1:]))
    assert not any(x == y == "A" for x, y in zip(lm_words, lm_words[1:]))


def test_oov_words_fall_back_to_flat_penalty(rng):
    models = _models(rng, labels=("A", "B", "S"))
    comp = ContinuousDecoder(models, penalty=-7.0).composite
    bg = train_word_bigram(["AB"], ["A", "B"])  # no "S" in the LM vocab
    pair = pair_penalty_matrix(comp, bg, lm_weight=1.0)
    sa, _ = comp.word_state_range("S")
    aa, _ = comp.word_state_range("A")
    ba, _ = comp.word_state_range("B")
    # Edges touching the OOV silence word carry exactly the flat penalty.
    assert pair[sa, aa] == pytest.approx(-7.0)
    assert pair[aa, sa] == pytest.approx(-7.0)
    # Known pairs carry penalty + lm log-prob.
    assert pair[aa, ba] == pytest.approx(-7.0 + bg.log_p[0, 1], rel=1e-5)


def test_rescore_nbest_reorders():
    bg = train_word_bigram(["12", "12", "12", "21"], ["1", "2"], smoothing=0.1)
    hyps = [(-10.0, "21"), (-10.5, "12")]
    rescored = rescore_nbest(hyps, bg, lm_weight=5.0)
    assert rescored[0][1] == "12"  # LM prefers the frequent sequence
    assert rescored[0][0] > rescored[1][0]
    # Zero weight preserves the acoustic order.
    plain = rescore_nbest(hyps, bg, lm_weight=0.0)
    assert plain[0][1] == "21"
