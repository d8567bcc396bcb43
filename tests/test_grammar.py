"""Grammar-constrained decoding (ops/grammar.py).

Cross-checked three ways: the exact_count grammar must reproduce the counted
trellis (ops/viterbi_counted.py) bit-for-bit; a finite string-set grammar
must pick the argmax over its members' individually-constrained scores; and
the end-to-end decoder path must conform to position patterns on the trained
synthetic system.
"""
import numpy as np
import pytest

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.grammar import (
    WordDFA,
    viterbi_composite_grammar,
    viterbi_composite_grammar_batch,
)
from cs304_tpu.ops.viterbi_counted import viterbi_composite_counted


def _tiny_composite(seed=0, labels=("1", "2", "3", "S")):
    rng = np.random.default_rng(seed)
    models = []
    for label in sorted(labels):
        s = 2 if label == "S" else 3
        means = rng.normal(size=(s, 4)).astype(np.float32)
        covs = np.tile(np.eye(4, dtype=np.float32), (s, 1, 1))
        models.append(WordHMM(label=label, means=means, covariances=covs,
                              log_a=uniform_forward_log_a(s)))
    return stack_word_models(models, penalty=-5.0)


def _random_log_b(comp, t, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(t, comp.num_states)).astype(np.float32) * 3.0


def _grammar_args(comp):
    return (
        np.asarray(comp.log_a), np.asarray(comp.lower_of_state),
        np.asarray(comp.is_entry), np.asarray(comp.is_exit),
        np.asarray(comp.word_of_state, np.int32),
    )


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n", [1, 2, 3])
def test_exact_count_grammar_matches_counted_trellis(seed, n):
    comp = _tiny_composite()
    log_b = _random_log_b(comp, t=24, seed=seed)
    dfa = WordDFA.exact_count(n, comp.labels)
    g_score, g_path = viterbi_composite_grammar(
        log_b, *_grammar_args(comp), dfa.next_state, dfa.accept, comp.penalty,
    )
    counted = np.asarray(
        [comp.labels[comp.word_of_state[i]] != "S"
         for i in range(comp.num_states)]
    )
    c_score, c_path = viterbi_composite_counted(
        log_b, np.asarray(comp.log_a), np.asarray(comp.lower_of_state),
        np.asarray(comp.is_entry), np.asarray(comp.is_exit), counted,
        comp.penalty, n,
    )
    assert float(g_score) == pytest.approx(float(c_score))
    if np.isfinite(float(c_score)):
        np.testing.assert_array_equal(np.asarray(g_path), np.asarray(c_path))


def test_count_range_grammar_matches_counted(rng):
    comp = _tiny_composite()
    log_b = _random_log_b(comp, t=30, seed=11)
    dfa = WordDFA.exact_count(3, comp.labels, n_words_min=1)
    g_score, _ = viterbi_composite_grammar(
        log_b, *_grammar_args(comp), dfa.next_state, dfa.accept, comp.penalty,
    )
    counted = np.asarray(
        [comp.labels[w] != "S" for w in comp.word_of_state]
    )
    c_score, _ = viterbi_composite_counted(
        log_b, np.asarray(comp.log_a), np.asarray(comp.lower_of_state),
        np.asarray(comp.is_entry), np.asarray(comp.is_exit), counted,
        comp.penalty, 3, n_words_min=1,
    )
    assert float(g_score) == pytest.approx(float(c_score))


def test_string_set_picks_argmax_member():
    """The multi-string grammar's score equals the max over singleton-string
    grammar scores, and the decoded word sequence is that argmax member."""
    comp = _tiny_composite(seed=3)
    log_b = _random_log_b(comp, t=28, seed=5)
    candidates = ["12", "21", "331", "2"]
    args = _grammar_args(comp)

    member_scores = {}
    for text in candidates:
        dfa = WordDFA.from_strings([text], comp.labels)
        s, _ = viterbi_composite_grammar(
            log_b, *args, dfa.next_state, dfa.accept, comp.penalty,
        )
        member_scores[text] = float(s)

    dfa_all = WordDFA.from_strings(candidates, comp.labels)
    score, path = viterbi_composite_grammar(
        log_b, *args, dfa_all.next_state, dfa_all.accept, comp.penalty,
    )
    best = max(member_scores, key=member_scores.get)
    assert float(score) == pytest.approx(member_scores[best])
    decoded = "".join(comp.path_to_labels(np.asarray(path)))
    assert decoded == best


def test_position_pattern_structure():
    comp = _tiny_composite(seed=7)
    args = _grammar_args(comp)
    dfa = WordDFA.from_positions([("1", "2"), ("3",)], comp.labels)
    for seed in range(5):
        log_b = _random_log_b(comp, t=26, seed=100 + seed)
        score, path = viterbi_composite_grammar(
            log_b, *args, dfa.next_state, dfa.accept, comp.penalty,
        )
        assert np.isfinite(float(score))
        decoded = "".join(comp.path_to_labels(np.asarray(path)))
        assert len(decoded) == 2 and decoded[0] in "12" and decoded[1] == "3"


def test_no_accepted_path_is_minus_inf():
    comp = _tiny_composite()
    # 5 words cannot fit in 6 frames (3 states each, min 3 frames/word).
    log_b = _random_log_b(comp, t=6, seed=0)
    dfa = WordDFA.exact_count(5, comp.labels)
    score, _ = viterbi_composite_grammar(
        log_b, *_grammar_args(comp), dfa.next_state, dfa.accept, comp.penalty,
    )
    assert np.isneginf(float(score))


def test_batch_matches_single():
    comp = _tiny_composite(seed=1)
    args = _grammar_args(comp)
    dfa = WordDFA.from_strings(["12", "321"], comp.labels)
    t = 32
    log_bs = np.stack([_random_log_b(comp, t, seed=s) for s in range(3)])
    lengths = np.array([32, 20, 27], np.int32)
    b_scores, b_paths = viterbi_composite_grammar_batch(
        log_bs, *args, dfa.next_state, dfa.accept, comp.penalty, lengths,
    )
    for i in range(3):
        s, p = viterbi_composite_grammar(
            log_bs[i], *args, dfa.next_state, dfa.accept, comp.penalty,
            lengths[i],
        )
        assert float(b_scores[i]) == pytest.approx(float(s))
        np.testing.assert_array_equal(np.asarray(b_paths[i]), np.asarray(p))


def test_builder_validation():
    labels = ["1", "2", "S"]
    with pytest.raises(ValueError, match="not in the vocabulary"):
        WordDFA.from_strings(["9"], labels)
    with pytest.raises(ValueError, match="silence"):
        WordDFA.from_strings(["1S"], labels)
    with pytest.raises(ValueError, match="empty"):
        WordDFA.from_positions([], labels)
    with pytest.raises(ValueError, match="empty"):
        WordDFA.from_strings([], labels)
    with pytest.raises(ValueError, match="silence"):
        WordDFA.from_positions([("S",)], labels)
    dfa = WordDFA.from_strings(["12"], labels)
    # Silence column is the identity (grammar-transparent).
    np.testing.assert_array_equal(
        dfa.next_state[:, labels.index("S")],
        np.arange(dfa.num_planes, dtype=np.int32),
    )


def test_decoder_grammar_end_to_end(trained_system):
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.ops.mfcc import mfcc_batch

    corpus = trained_system["corpus"]
    decoder = ContinuousDecoder(trained_system["embedded_models"], penalty=-100.0)
    labels = decoder.composite.labels

    feats = mfcc_batch(
        [corpus.sentence_audio("375", s, jitter_seed=0) for s in (0, 1)]
    )
    # A menu containing the truth: must decode to a member (the truth, since
    # the system decodes this corpus essentially perfectly).
    menu = WordDFA.from_strings(["375", "186Z", "54321"], labels)
    preds = decoder.predict_batch_grammar(feats, menu)
    assert preds == ["375", "375"]

    # A pattern excluding the truth's length: output must still conform.
    pattern = WordDFA.from_positions([tuple("123456789OZ")] * 2, labels)
    constrained = decoder.predict_batch_grammar(feats, pattern)
    assert all(len(p) == 2 for p in constrained)

    # Vocabulary mismatch is a loud error.
    with pytest.raises(ValueError, match="vocabulary"):
        bad = WordDFA.from_strings(["12"], ["1", "2", "S"])
        decoder.predict_batch_grammar(feats, bad)
