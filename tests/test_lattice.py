"""Pruned word lattices (ops/lattice.py): span segmentation parity with
path_to_labels, 1-best containment, arc well-formedness, GMM emissions."""
import numpy as np
import jax.numpy as jnp
import pytest

from cs304_tpu.models.hmm import WordHMM, stack_word_models, uniform_forward_log_a
from cs304_tpu.ops.lattice import nbest_lattice, path_word_spans
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

    return stack_word_models([mk("A", 3), mk("B", 3), mk("S", 2)], penalty=-4.0)


def test_span_segmentation_matches_path_to_labels(rng, composite):
    """The frame-span walk must emit exactly the words path_to_labels emits,
    in order, with contiguous spans covering every frame."""
    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    log_b = composite.log_likelihoods(feats)
    _score, path = viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state), jnp.asarray(composite.is_entry),
        jnp.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=False,
    )
    path = np.asarray(path)
    spans = path_word_spans(composite, path)
    assert spans[0][0] == 0 and spans[-1][1] == len(path)
    for (s0, e0, _w0), (s1, _e1, _w1) in zip(spans, spans[1:]):
        assert e0 == s1, "spans must abut"
    want = composite.path_to_labels(path, skip_silence=False)
    got = [composite.labels[w] for _s, _e, w in spans]
    assert got == want


def test_lattice_contains_one_best(rng, composite):
    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    log_b = composite.log_likelihoods(feats)
    _score, path = viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state), jnp.asarray(composite.is_entry),
        jnp.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=True,
    )
    one_best = composite.path_to_labels(np.asarray(path), skip_silence=True)
    lat = nbest_lattice(composite, feats, n=6)
    assert lat.contains(one_best)
    assert not lat.contains(list("ABABABABAB"))  # absurd string not spelled
    assert lat.num_frames == 40
    # Arc sanity: within bounds, positive length, finite scores.
    for a in lat.arcs:
        assert 0 <= a.start < a.end <= 40
        assert np.isfinite(a.score)
    dot = lat.to_dot()
    assert dot.startswith("digraph") and "->" in dot


def test_lattice_wider_beam_is_superset(rng, composite):
    """More hypotheses can only add arcs (same paths stay in the pool)."""
    feats = (rng.normal(size=(32, 4)) * 2).astype(np.float32)
    small = nbest_lattice(composite, feats, n=2, beam_k=8)
    big = nbest_lattice(composite, feats, n=8, beam_k=8)
    small_keys = {(a.start, a.end, a.label) for a in small.arcs}
    big_keys = {(a.start, a.end, a.label) for a in big.arcs}
    assert small_keys <= big_keys


def test_lattice_gmm_emissions(rng):
    """GMM checkpoints build lattices through the decoder's densities."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.gmm_hmm import GMMWordHMM
    from cs304_tpu.ops.gaussian import gmm_log_pdf, make_gmm_params

    def mk(label, s, k=2):
        a = rng.normal(size=(s, k, 4, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 1, 3, 2) + np.eye(4, dtype=np.float32)
        return GMMWordHMM(
            label=label,
            means=rng.normal(size=(s, k, 4)).astype(np.float32) * 3,
            covariances=covs,
            weights=np.full((s, k), 1.0 / k, np.float32),
            log_a=uniform_forward_log_a(s),
        )

    models = {m.label: m for m in (mk("A", 3), mk("B", 3), mk("S", 2))}
    feats = (rng.normal(size=(30, 4)) * 2).astype(np.float32)
    dec = ContinuousDecoder(models, penalty=-4.0)
    means, covs, weights = dec._gmm
    params = make_gmm_params(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(weights)
    )
    log_b = gmm_log_pdf(params, jnp.asarray(feats))
    lat = nbest_lattice(dec.composite, feats, n=4, log_b=log_b)
    assert lat.contains(list(dec.predict(feats)))


def test_forward_lattice_contains_and_scores(rng, composite):
    """True lattice generation: the 1-best chain is contained, oracle edit
    distance to it is 0, and the best arc score equals the Viterbi total."""
    from cs304_tpu.ops.lattice import forward_lattice

    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    log_b = composite.log_likelihoods(feats)
    score, path = viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state), jnp.asarray(composite.is_entry),
        jnp.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=False,
    )
    one_best = composite.path_to_labels(np.asarray(path), skip_silence=True)
    lat = forward_lattice(composite, feats, beam=30.0)
    assert lat.contains(one_best)
    assert lat.oracle_edits(one_best) == 0
    assert np.isclose(max(a.score for a in lat.arcs), float(score), rtol=1e-5)
    for a in lat.arcs:
        assert 0 <= a.start < a.end <= 40
        assert a.score <= float(score) + 1e-3  # complete-path scores only


def test_forward_lattice_has_best_path_arcs(rng, composite):
    """Every word span of the Viterbi path is an arc scoring the Viterbi
    total (the 1-best rides the lattice at full score)."""
    from cs304_tpu.ops.lattice import forward_lattice

    feats = (rng.normal(size=(36, 4)) * 2).astype(np.float32)
    log_b = composite.log_likelihoods(feats)
    score, path = viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state), jnp.asarray(composite.is_entry),
        jnp.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=False,
    )
    lat = forward_lattice(composite, feats, beam=25.0)
    arcset = {(a.start, a.end, a.label): a.score for a in lat.arcs}
    for st, en, w in path_word_spans(composite, np.asarray(path)):
        key = (st, en, composite.labels[w])
        assert key in arcset, f"best-path span {key} missing"
        assert np.isclose(arcset[key], float(score), rtol=1e-4)


def test_forward_lattice_beam_monotone(rng, composite):
    from cs304_tpu.ops.lattice import forward_lattice

    feats = (rng.normal(size=(32, 4)) * 2).astype(np.float32)
    narrow = forward_lattice(composite, feats, beam=5.0)
    wide = forward_lattice(composite, feats, beam=40.0)
    nk = {(a.start, a.end, a.label) for a in narrow.arcs}
    wk = {(a.start, a.end, a.label) for a in wide.arcs}
    assert nk <= wk
    assert len(wk) > len(nk)  # a 35-nat-wider beam must admit more word-ends


def test_forward_lattice_gmm_emissions(rng):
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.gmm_hmm import GMMWordHMM
    from cs304_tpu.ops.gaussian import gmm_log_pdf, make_gmm_params
    from cs304_tpu.ops.lattice import forward_lattice

    def mk(label, s, k=2):
        a = rng.normal(size=(s, k, 4, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 1, 3, 2) + np.eye(4, dtype=np.float32)
        return GMMWordHMM(
            label=label,
            means=rng.normal(size=(s, k, 4)).astype(np.float32) * 3,
            covariances=covs,
            weights=np.full((s, k), 1.0 / k, np.float32),
            log_a=uniform_forward_log_a(s),
        )

    models = {m.label: m for m in (mk("A", 3), mk("B", 3), mk("S", 2))}
    feats = (rng.normal(size=(30, 4)) * 2).astype(np.float32)
    dec = ContinuousDecoder(models, penalty=-4.0)
    means, covs, weights = dec._gmm
    params = make_gmm_params(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(weights)
    )
    log_b = gmm_log_pdf(params, jnp.asarray(feats))
    lat = forward_lattice(dec.composite, feats, beam=30.0, log_b=log_b)
    assert lat.contains(list(dec.predict(feats)))


def test_oracle_edits_counts(rng, composite):
    """oracle_edits measures word edits against the best lattice chain."""
    from cs304_tpu.ops.lattice import Lattice, LatticeArc, forward_lattice

    # Hand-built two-word lattice: A[0,10) then (B|A)[10,20).
    lat = Lattice(num_frames=20, arcs=[
        LatticeArc(0, 10, "A", -1.0),
        LatticeArc(10, 20, "B", -2.0),
        LatticeArc(10, 20, "A", -3.0),
    ], silence_label="S")
    assert lat.oracle_edits(["A", "B"]) == 0
    assert lat.oracle_edits(["A", "A"]) == 0      # via the alternative arc
    assert lat.oracle_edits(["B", "B"]) == 1      # one substitution
    assert lat.oracle_edits(["A"]) == 1           # one insertion forced
    assert lat.oracle_edits(["A", "B", "A"]) == 1  # one deletion
    assert lat.oracle_edits([]) == 2
    # Disconnected lattice: no chain spans the utterance.
    gap = Lattice(num_frames=20, arcs=[LatticeArc(0, 8, "A", -1.0)])
    assert gap.oracle_edits(["A"]) is None

    # On a real lattice the oracle can only improve with beam width.
    feats = (rng.normal(size=(32, 4)) * 2).astype(np.float32)
    wide = forward_lattice(composite, feats, beam=40.0)
    narrow = forward_lattice(composite, feats, beam=5.0)
    truth = ["A", "B"]
    w_edits = wide.oracle_edits(truth)
    n_edits = narrow.oracle_edits(truth)
    if w_edits is not None and n_edits is not None:
        assert w_edits <= n_edits


def test_word_end_posteriors_are_probabilities(rng, composite):
    """At any frame the word-end events are mutually exclusive: each row of
    exp(posteriors) sums to at most 1; every entry is a probability."""
    from cs304_tpu.ops.lattice import word_end_log_posteriors

    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    lam = word_end_log_posteriors(composite, feats)
    assert lam.shape == (40, 3)
    p = np.exp(lam)
    assert (p >= 0).all() and (p <= 1 + 1e-5).all()
    assert (p.sum(axis=1) <= 1 + 1e-4).all()


def test_word_confidences_match_decode(rng, composite):
    from cs304_tpu.ops.lattice import word_confidences

    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    log_b = composite.log_likelihoods(feats)
    _score, path = viterbi_composite(
        log_b, jnp.asarray(composite.log_a),
        jnp.asarray(composite.lower_of_state), jnp.asarray(composite.is_entry),
        jnp.asarray(composite.is_exit), composite.penalty,
        quirk_backtrace=False,
    )
    want = composite.path_to_labels(np.asarray(path), skip_silence=True)
    got = word_confidences(composite, feats)
    assert [label for label, _s, _e, _c in got] == want
    for _label, st, en, conf in got:
        assert 0 <= st < en <= 40
        assert 0.0 <= conf <= 1.0


def test_confident_on_separated_acoustics(rng):
    """When the acoustics match one word sequence overwhelmingly, every
    decoded word's posterior confidence approaches 1."""
    from cs304_tpu.ops.lattice import word_confidences

    d = 4
    def mk(label, center):
        means = np.stack([np.full(d, center + 10.0 * k) for k in range(3)])
        return WordHMM(
            label=label, means=means.astype(np.float32),
            covariances=np.tile(np.eye(d, dtype=np.float32), (3, 1, 1)),
            log_a=uniform_forward_log_a(3),
        )

    comp = stack_word_models([mk("A", 0.0), mk("B", 100.0)], penalty=-2.0)
    # Trajectory: word A states 0,1,2 then word B states 0,1,2 (4 frames each).
    traj = [0.0, 10.0, 20.0, 100.0, 110.0, 120.0]
    feats = np.concatenate([
        np.full((4, d), c, np.float32) + rng.normal(size=(4, d)).astype(np.float32) * 0.05
        for c in traj
    ])
    confs = word_confidences(comp, feats)
    assert [label for label, _s, _e, _c in confs] == ["A", "B"]
    for _label, _s, _e, conf in confs:
        assert conf > 0.95, confs


def test_word_occupancy_rows_sum_to_one(rng, composite):
    """Every path occupies exactly one state per frame, so the per-frame
    word occupancies must sum to exactly 1."""
    from cs304_tpu.ops.lattice import word_occupancy_posteriors

    feats = (rng.normal(size=(40, 4)) * 2).astype(np.float32)
    occ = word_occupancy_posteriors(composite, feats)
    assert occ.shape == (40, 3)
    assert (occ >= -1e-6).all() and (occ <= 1 + 1e-4).all()
    np.testing.assert_allclose(occ.sum(axis=1), 1.0, rtol=2e-4)


def test_word_occupancy_tracks_separated_acoustics(rng):
    """On sharply separated acoustics the occupancy follows the true word."""
    from cs304_tpu.ops.lattice import word_occupancy_posteriors

    d = 4
    def mk(label, center):
        means = np.stack([np.full(d, center + 10.0 * k) for k in range(3)])
        return WordHMM(
            label=label, means=means.astype(np.float32),
            covariances=np.tile(np.eye(d, dtype=np.float32), (3, 1, 1)),
            log_a=uniform_forward_log_a(3),
        )

    comp = stack_word_models([mk("A", 0.0), mk("B", 100.0)], penalty=-2.0)
    traj = [0.0, 10.0, 20.0, 100.0, 110.0, 120.0]
    feats = np.concatenate([
        np.full((4, d), c, np.float32)
        + rng.normal(size=(4, d)).astype(np.float32) * 0.05
        for c in traj
    ])
    occ = word_occupancy_posteriors(comp, feats)
    a_idx = comp.labels.index("A")
    b_idx = comp.labels.index("B")
    assert (occ[:12, a_idx] > 0.95).all()   # first half lives in word A
    assert (occ[12:, b_idx] > 0.95).all()   # second half in word B


def test_word_confidences_batch_matches_single(rng, composite):
    """The vmapped masked-sum batch path must reproduce the per-utterance
    confidences exactly, across ragged lengths."""
    from cs304_tpu.ops.lattice import word_confidences, word_confidences_batch

    feats = [
        (rng.normal(size=(t, 4)) * 2).astype(np.float32)
        for t in (40, 23, 31, 40)
    ]
    batch = word_confidences_batch(composite, feats)
    for f, got in zip(feats, batch):
        want = word_confidences(composite, f)
        assert [g[:3] for g in got] == [w[:3] for w in want]
        for (_l1, _s1, _e1, c1), (_l2, _s2, _e2, c2) in zip(got, want):
            assert c1 == pytest.approx(c2, rel=1e-4, abs=1e-5)


def test_decoder_batch_confidence_gmm(rng):
    """Decoder wrapper: GMM-aware batched confidences agree with predict."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.gmm_hmm import GMMWordHMM

    def mk(label, s, k=2):
        a = rng.normal(size=(s, k, 4, 2)).astype(np.float32)
        covs = a @ a.transpose(0, 1, 3, 2) + np.eye(4, dtype=np.float32)
        return GMMWordHMM(
            label=label,
            means=rng.normal(size=(s, k, 4)).astype(np.float32) * 3,
            covariances=covs,
            weights=np.full((s, k), 1.0 / k, np.float32),
            log_a=uniform_forward_log_a(s),
        )

    models = {m.label: m for m in (mk("A", 3), mk("B", 3), mk("S", 2))}
    dec = ContinuousDecoder(models, penalty=-4.0)
    feats = [
        (rng.normal(size=(t, 4)) * 2).astype(np.float32) for t in (30, 22)
    ]
    confs = dec.predict_batch_with_confidence(feats)
    preds = dec.predict_batch(feats)
    for per_utt, pred in zip(confs, preds):
        assert "".join(label for label, _s, _e, _c in per_utt) == pred
        for _label, st, en, c in per_utt:
            assert 0 <= st < en and 0.0 <= c <= 1.0


def test_spot_keyword(rng):
    """Posterior keyword spotting on separated acoustics: finds each word
    once with near-1 posterior, at the right frames, and rejects absent
    words; overlapping detections are suppressed."""
    from cs304_tpu.ops.lattice import forward_lattice, spot_keyword

    d = 4
    def mk(label, center):
        means = np.stack([np.full(d, center + 10.0 * k) for k in range(3)])
        return WordHMM(
            label=label, means=means.astype(np.float32),
            covariances=np.tile(np.eye(d, dtype=np.float32), (3, 1, 1)),
            log_a=uniform_forward_log_a(3),
        )

    comp = stack_word_models(
        [mk("A", 0.0), mk("B", 100.0), mk("C", -100.0)], penalty=-2.0
    )
    traj = [0.0, 10.0, 20.0, 100.0, 110.0, 120.0]  # word A then word B
    feats = np.concatenate([
        np.full((4, d), c, np.float32)
        + rng.normal(size=(4, d)).astype(np.float32) * 0.05
        for c in traj
    ])
    hits_a = spot_keyword(comp, feats, "A", threshold=0.5)
    hits_b = spot_keyword(comp, feats, "B", threshold=0.5)
    assert len(hits_a) == 1 and len(hits_b) == 1
    st, en, p = hits_a[0]
    assert p > 0.95 and st == 0 and 10 <= en <= 14
    st, en, p = hits_b[0]
    assert p > 0.95 and 10 <= st <= 14 and en == 24
    assert spot_keyword(comp, feats, "C", threshold=0.5) == []
    with pytest.raises(ValueError):
        spot_keyword(comp, feats, "X")
    # posterior-annotated lattice arcs are probabilities.
    lat = forward_lattice(comp, feats, beam=30.0, posteriors=True)
    for a in lat.arcs:
        assert a.posterior is not None and 0.0 <= a.posterior <= 1.0


def test_padded_lattice_and_posteriors_match_unpadded(rng, composite):
    """length-masked passes: padding frames must not change the lattice,
    the posteriors, or the confidences (bucketed serving correctness)."""
    from cs304_tpu.ops.lattice import (
        forward_lattice,
        word_end_log_posteriors,
        word_occupancy_posteriors,
    )

    t = 37
    feats = (rng.normal(size=(t, 4)) * 2).astype(np.float32)
    padded = np.concatenate(
        [feats, np.full((27, 4), 7.7, np.float32)]  # junk padding
    )
    lat = forward_lattice(composite, feats, beam=30.0, posteriors=True)
    lat_p = forward_lattice(
        composite, padded, beam=30.0, posteriors=True, length=t
    )
    assert lat_p.num_frames == t
    want = [(a.start, a.end, a.label, a.score, a.posterior)
            for a in lat.sorted_arcs()]
    got = [(a.start, a.end, a.label, a.score, a.posterior)
           for a in lat_p.sorted_arcs()]
    assert len(want) == len(got)
    for w_arc, g_arc in zip(want, got):
        assert w_arc[:3] == g_arc[:3]
        assert np.isclose(w_arc[3], g_arc[3], rtol=1e-5)
        assert np.isclose(w_arc[4], g_arc[4], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        word_end_log_posteriors(composite, feats),
        word_end_log_posteriors(composite, padded, length=t),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        word_occupancy_posteriors(composite, feats),
        word_occupancy_posteriors(composite, padded, length=t),
        rtol=1e-4, atol=1e-6,
    )


def test_consensus_decode(rng):
    """Consensus (min-frame-error) decoding matches 1-best on separated
    acoustics and tolerates padding."""
    from cs304_tpu.ops.lattice import consensus_decode

    d = 4
    def mk(label, center):
        means = np.stack([np.full(d, center + 10.0 * k) for k in range(3)])
        return WordHMM(
            label=label, means=means.astype(np.float32),
            covariances=np.tile(np.eye(d, dtype=np.float32), (3, 1, 1)),
            log_a=uniform_forward_log_a(3),
        )

    comp = stack_word_models([mk("A", 0.0), mk("B", 100.0)], penalty=-2.0)
    traj = [0.0, 10.0, 20.0, 100.0, 110.0, 120.0]
    feats = np.concatenate([
        np.full((4, d), c, np.float32)
        + rng.normal(size=(4, d)).astype(np.float32) * 0.05
        for c in traj
    ])
    assert consensus_decode(comp, feats, skip_silence=False) == "AB"
    padded = np.concatenate([feats, np.zeros((8, d), np.float32)])
    assert consensus_decode(
        comp, padded, length=24, skip_silence=False
    ) == "AB"
