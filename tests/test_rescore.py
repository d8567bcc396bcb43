"""Lattice rescoring + confusion networks (ops/rescore.py).

Exactness strategy: arc-local acoustic scores must make path scores
ADDITIVE — so (1) re-summing the 1-best's own segmentation reproduces the
dense Viterbi score, and (2) rescoring an EXHAUSTIVE lattice (every possible
arc) IS full search, and must match first-pass decoding bit-for-bit both
under the flat penalty and under a bigram LM."""
import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.models.hmm import (
    WordHMM,
    stack_word_models,
    uniform_forward_log_a,
)
from cs304_tpu.ops.lattice import forward_lattice, path_word_spans
from cs304_tpu.ops.lm import pair_penalty_matrix, train_word_bigram
from cs304_tpu.ops.rescore import (
    arc_acoustic_scores,
    cn_decode,
    confusion_network,
    exhaustive_lattice,
    lattice_rescore,
)
from cs304_tpu.ops.viterbi import viterbi_composite


@pytest.fixture
def composite(rng):
    def mk(label, s):
        a = rng.normal(size=(s, 4, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 2, 1) + np.eye(4, dtype=np.float32)
        return WordHMM(
            label=label,
            means=rng.normal(size=(s, 4)).astype(np.float32) * 3,
            covariances=covs,
            log_a=uniform_forward_log_a(s),
        )

    return stack_word_models([mk("A", 3), mk("B", 3), mk("S", 2)],
                             penalty=-4.0)


def _first_pass(composite, feats, penalty):
    log_b = composite.log_likelihoods(feats)
    score, path = viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state),
        jnp.asarray(composite.is_entry), jnp.asarray(composite.is_exit),
        penalty, quirk_backtrace=False,
    )
    text = "".join(composite.path_to_labels(np.asarray(path)))
    return float(score), text, np.asarray(path)


def test_arc_decomposition_matches_viterbi(rng, composite):
    """Summing arc-local acoustics along the 1-best's own segmentation plus
    one penalty per arc boundary == the dense Viterbi score."""
    from cs304_tpu.ops.lattice import LatticeArc

    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    score, _text, path = _first_pass(composite, feats, composite.penalty)
    spans = path_word_spans(composite, path)
    arcs = [
        LatticeArc(start=st, end=en, label=composite.labels[w], score=0.0)
        for st, en, w in spans
    ]
    acoustic = arc_acoustic_scores(composite, arcs, features=feats)
    total = float(acoustic.sum()) + composite.penalty * (len(arcs) - 1)
    np.testing.assert_allclose(total, score, rtol=1e-5)


def test_exhaustive_rescore_is_full_search_flat(rng, composite):
    """Rescoring the exhaustive lattice with no LM == plain Viterbi."""
    feats = (rng.normal(size=(12, 4)) * 2).astype(np.float32)
    want_score, want_text, _ = _first_pass(composite, feats,
                                           composite.penalty)
    lat = exhaustive_lattice(composite, 12)
    score, text, path_arcs = lattice_rescore(composite, lat, features=feats)
    np.testing.assert_allclose(score, want_score, rtol=1e-5)
    assert text == want_text
    assert path_arcs[0].start == 0 and path_arcs[-1].end == 12
    for a, b in zip(path_arcs, path_arcs[1:]):
        assert a.end == b.start


def test_exhaustive_rescore_equals_first_pass_lm(rng, composite):
    """Rescoring the exhaustive lattice under a bigram == first-pass bigram
    decoding (the identical pair-penalty matrix through the dense trellis)."""
    bigram = train_word_bigram(
        ["AB", "ABA", "BA", "AA"], labels=["A", "B", "S"]
    )
    feats = (rng.normal(size=(12, 4)) * 2).astype(np.float32)
    pair = pair_penalty_matrix(composite, bigram, lm_weight=2.0)
    want_score, want_text, _ = _first_pass(
        composite, feats, jnp.asarray(pair)
    )
    lat = exhaustive_lattice(composite, 12)
    score, text, _arcs = lattice_rescore(
        composite, lat, features=feats, bigram=bigram, lm_weight=2.0
    )
    np.testing.assert_allclose(score, want_score, rtol=1e-5)
    assert text == want_text


def test_forward_lattice_flat_rescore_matches_onebest(rng, composite):
    """The 1-best's own arcs are always in the forward lattice, and no
    lattice path can beat full search — so flat rescoring of ANY forward
    lattice reproduces the 1-best exactly."""
    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    want_score, want_text, _ = _first_pass(composite, feats,
                                           composite.penalty)
    for beam in (10.0, 60.0):
        lat = forward_lattice(composite, feats, beam=beam)
        score, text, _arcs = lattice_rescore(composite, lat, features=feats)
        np.testing.assert_allclose(score, want_score, rtol=1e-5)
        assert text == want_text


def test_lm_rescoring_can_flip_the_winner(rng, composite):
    """A bigram that forbids the flat-penalty winner's word pairs must
    change the rescored output on an ambiguous utterance (and the rescored
    sequence must score at least as high under the combined measure)."""
    feats = (rng.normal(size=(12, 4)) * 2).astype(np.float32)
    lat = exhaustive_lattice(composite, 12)
    _sc0, text0, _ = lattice_rescore(composite, lat, features=feats)
    # LM trained on sequences that avoid text0's bigrams entirely.
    avoid = "B" if "A" in text0 else "A"
    bigram = train_word_bigram(
        [avoid * 3], labels=["A", "B", "S"], smoothing=1e-4
    )
    _sc1, text1, _ = lattice_rescore(
        composite, lat, features=feats, bigram=bigram, lm_weight=200.0,
        boundaries=True,  # a 1-word path has no pair edges; <s> term needed
    )
    assert text1 != text0
    assert set(text1) <= {avoid}


def test_boundaries_terms(rng, composite):
    """boundaries=True adds exactly the <s>/</s> terms of the winning
    sequence when the winner is unchanged."""
    bigram = train_word_bigram(["AB", "BA"], labels=["A", "B", "S"])
    feats = (rng.normal(size=(12, 4)) * 2).astype(np.float32)
    lat = exhaustive_lattice(composite, 12)
    sc, text, arcs = lattice_rescore(
        composite, lat, features=feats, bigram=bigram, lm_weight=0.01
    )
    sc_b, text_b, arcs_b = lattice_rescore(
        composite, lat, features=feats, bigram=bigram, lm_weight=0.01,
        boundaries=True,
    )
    if [a.label for a in arcs] == [a.label for a in arcs_b]:
        idx = bigram.index
        first, last = arcs_b[0].label, arcs_b[-1].label
        want = sc + 0.01 * (
            float(bigram.log_p_init[idx[first]])
            + float(bigram.log_p_final[idx[last]])
        )
        np.testing.assert_allclose(sc_b, want, rtol=1e-6)


def _confident_feats(composite, words, frames_per_state, rng):
    """Frames sampled tightly around the state means of a planned path."""
    out = []
    for lab in words:
        w = composite.labels.index(lab)
        lo, up = composite.lowers[w], composite.uppers[w]
        for s in range(lo, up + 1):
            mean = composite.means[s]
            out += [
                mean + rng.normal(size=4).astype(np.float32) * 0.05
                for _ in range(frames_per_state)
            ]
    return np.asarray(out, np.float32)


def test_cn_decode_matches_onebest_when_confident(rng, composite):
    feats = _confident_feats(composite, ["A", "S", "B"], 4, rng)
    _score, text, _ = _first_pass(composite, feats, composite.penalty)
    slots = confusion_network(composite, feats, beam=30.0)
    assert cn_decode(slots) == text
    # Pivot slots carry the 1-best words with dominant posteriors.
    pivot_words = [s.pivot for s in slots if s.pivot is not None]
    assert "".join(pivot_words) == text
    for s in slots:
        if s.pivot is not None:
            assert s.hyps[s.pivot] > 0.5


def test_cn_slots_well_formed(rng, composite):
    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    slots = confusion_network(composite, feats, beam=60.0)
    labels = set(composite.labels)
    prev = (-1, -1)
    for s in slots:
        assert (s.start, s.end) >= prev
        prev = (s.start, s.end)
        assert 0 <= s.start < s.end <= 40
        assert set(s.hyps) <= labels
        for p in s.hyps.values():
            assert 0.0 <= p <= 1.0
        assert 0.0 <= s.eps() <= 1.0


def test_rescore_disconnected_lattice_raises(composite):
    from cs304_tpu.ops.lattice import Lattice, LatticeArc

    lat = Lattice(num_frames=10, arcs=[
        LatticeArc(start=0, end=4, label="A", score=0.0),
        LatticeArc(start=5, end=10, label="B", score=0.0),  # gap at 4..5
    ])
    with pytest.raises(ValueError, match="spans"):
        lattice_rescore(composite, lat, features=np.zeros((10, 4), np.float32))


# ---- trigram second pass (ops/lm.WordTrigram) ---------------------------

def test_trigram_rows_normalize():
    from cs304_tpu.ops.lm import train_word_trigram

    tg = train_word_trigram(["112", "211", "12"], labels=["1", "2"])
    p = np.exp(tg.log_p)              # (W+1, W+1, W)
    p_final = np.exp(tg.log_p_final)  # (W+1, W+1)
    np.testing.assert_allclose(
        p.sum(axis=2) + p_final, 1.0, atol=1e-6
    )


def test_trigram_hand_computed():
    """One transcript '12', smoothing 0.5, labels {1,2}: every count is
    known exactly, so sequence_log_prob must match the closed form."""
    from cs304_tpu.ops.lm import train_word_trigram

    tg = train_word_trigram(["12"], labels=["1", "2"], smoothing=0.5)
    s = tg.boundary
    # history (<s>,<s>): counts [1.5, 0.5], final 0.5, total 2.5
    assert np.exp(tg.log_p[s, s, 0]) == pytest.approx(1.5 / 2.5)
    # history (<s>, 1): counts [0.5, 1.5], final 0.5, total 2.5
    assert np.exp(tg.log_p[s, 0, 1]) == pytest.approx(1.5 / 2.5)
    # history (1, 2): counts [0.5, 0.5], final 1.5, total 2.5
    assert np.exp(tg.log_p_final[0, 1]) == pytest.approx(1.5 / 2.5)
    want = np.log(1.5 / 2.5) * 3
    assert tg.sequence_log_prob("12") == pytest.approx(want, abs=1e-6)


def test_trigram_captures_order3_context():
    """The word BEFORE last flips the preferred continuation — pure
    order-3 signal a bigram cannot express: corpus {'121', '222'} puts
    P(1 | 1 2) high and P(2 | 2 2) high, while the bigram, seeing only the
    final '2', prefers '2' in BOTH contexts."""
    from cs304_tpu.ops.lm import train_word_bigram, train_word_trigram

    corpus = ["121", "222"] * 5
    bg = train_word_bigram(corpus, labels=["1", "2"], smoothing=0.5)
    tg = train_word_trigram(corpus, labels=["1", "2"], smoothing=0.5)
    one, two = 0, 1
    # Trigram: context (1, 2) -> 1; context (2, 2) -> 2.
    assert tg.log_p[one, two, one] > tg.log_p[one, two, two] + 1.0
    assert tg.log_p[two, two, two] > tg.log_p[two, two, one] + 1.0
    # Bigram: after '2' it must pick one answer for both contexts.
    assert bg.log_p[two, two] > bg.log_p[two, one]


def test_rescore_nbest_accepts_trigram():
    from cs304_tpu.ops.lm import rescore_nbest, train_word_trigram

    tg = train_word_trigram(["121", "212"] * 5, labels=["1", "2"])
    hyps = [(0.0, "1212"), (0.0, "121")]  # equal acoustics
    out = rescore_nbest(hyps, tg, lm_weight=1.0)
    assert out[0][1] == "121"


def test_lattice_trigram_matches_brute_force(rng, composite):
    """lattice_rescore_trigram on the exhaustive lattice == host
    enumeration of every arc chain under the same measure."""
    import itertools

    from cs304_tpu.ops.lm import train_word_trigram
    from cs304_tpu.ops.rescore import (
        arc_acoustic_scores,
        exhaustive_lattice,
        lattice_rescore_trigram,
    )

    t = 10
    feats = (rng.normal(size=(t, 4)) * 2).astype(np.float32)
    lat = exhaustive_lattice(composite, t)
    tg = train_word_trigram(["AB", "BA", "ABA"], labels=["A", "B", "S"])
    lm_weight = 0.7
    penalty = composite.penalty

    score, text, path_arcs = lattice_rescore_trigram(
        composite, lat, tg, features=feats, lm_weight=lm_weight,
    )

    arcs = lat.sorted_arcs()
    acoustic = np.asarray(
        arc_acoustic_scores(composite, arcs, features=feats)
    )
    lm_idx = tg.index
    bnd = tg.boundary

    def chain_score(chain):
        sc, hist = 0.0, (bnd, bnd)
        first = True
        for i in chain:
            a = arcs[i]
            w = lm_idx.get(a.label, bnd)
            # Penalty per inter-word EDGE (none on the first arc) — the
            # bigram lattice_rescore contract.
            sc += float(acoustic[i]) + (0.0 if first else penalty)
            if a.label in lm_idx and not first:
                sc += lm_weight * float(tg.log_p[hist[0], hist[1], w])
            hist = (hist[1], w)
            first = False
        return sc

    # Enumerate all chains 0 -> t by DFS over arc starts.
    by_start = {}
    for i, a in enumerate(arcs):
        by_start.setdefault(a.start, []).append(i)

    best = [-np.inf]

    def dfs(frame, chain):
        if frame == t:
            best[0] = max(best[0], chain_score(chain))
            return
        for i in by_start.get(frame, []):
            dfs(arcs[i].end, chain + [i])

    dfs(0, [])
    assert score == pytest.approx(best[0], abs=1e-3)
    # The returned arc path's own score reproduces the optimum too.
    ids = [arcs.index(a) for a in path_arcs]
    assert chain_score(ids) == pytest.approx(best[0], abs=1e-3)
