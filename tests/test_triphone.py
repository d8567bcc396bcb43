"""Triphone units (models/triphone.py).

Structure tests (naming, derived lexicon, clone equivalence, the
triphone -> biphone -> monophone back-off chain) plus the payoff test:
ANTICIPATORY coarticulation — words distinguishable only by how a shared
phone realizes BEFORE different successors — which left-biphones provably
cannot express (their shared left context pools the realizations) and
triphones separate.
"""
import numpy as np
import pytest

from cs304_tpu.models.biphone import biphone_label, clone_biphone_models
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.lexicon import Lexicon, compose_word_models
from cs304_tpu.models.triphone import (
    backoff_table_tri,
    clone_triphone_models,
    compose_word_models_triphone,
    observed_units_tri,
    split_triphone,
    train_triphone_models,
    triphone_label,
    triphone_lexicon,
    word_units_tri,
)


def _phone(label, center, dim=3, states=3):
    means = np.zeros((states, dim), np.float32)
    means[:, 0] = center
    means[:, 1] = np.arange(states)
    return WordHMM(
        label=label, means=means,
        covariances=np.tile(np.eye(dim, dtype=np.float32) * 0.3,
                            (states, 1, 1)),
        log_a=uniform_forward_log_a(states),
    )


def test_unit_naming():
    assert triphone_label("pA", "pB", "pC") == "pA-pB+pC"
    assert split_triphone("pA-pB+pC") == ("pA", "pB", "pC")
    assert split_triphone("S-pB+S") == ("S", "pB", "S")
    with pytest.raises(ValueError):
        triphone_label("pA", "p+B", "pC")
    with pytest.raises(ValueError):
        split_triphone("pA-pB")  # a biphone is not a triphone
    with pytest.raises(ValueError):
        split_triphone("pA")


def test_word_units_and_derived_lexicon():
    assert word_units_tri(("pA",)) == ("S-pA+S",)
    assert word_units_tri(("pA", "pB", "pC")) == (
        "S-pA+pB", "pA-pB+pC", "pB-pC+S"
    )
    lex = Lexicon({"ab": ("pA", "pB")})
    tlex = triphone_lexicon(lex)
    assert tlex["ab"] == ("S-pA+pB", "pA-pB+S")
    assert tlex.expand_transcript(("ab",)) == (
        "S", "S-pA+pB", "pA-pB+S", "S"
    )
    assert observed_units_tri(lex) == {"S-pA+pB", "pA-pB+S"}


def test_clone_equivalence_before_training():
    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    lex = Lexicon({"ab": ("pA", "pB"), "ba": ("pB", "pA")})
    clones = clone_triphone_models(phones, observed_units_tri(lex))
    mono = compose_word_models(lex, phones)
    tri = compose_word_models_triphone(lex, clones, phones)
    for w in lex.words:
        np.testing.assert_array_equal(mono[w].means, tri[w].means)
        np.testing.assert_array_equal(mono[w].log_a, tri[w].log_a)
    with pytest.raises(ValueError):
        clone_triphone_models(phones, {"pA-pZ+pB"})


def test_backoff_chain():
    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    tri = clone_triphone_models(phones, {"S-pA+pB"})
    tri["S-pA+pB"].means[:] += 1.0
    bi = clone_biphone_models(phones, {biphone_label("pA", "pB")})
    bi["pA-pB"].means[:] += 2.0

    units = {"S-pA+pB", "pA-pB+S", "S-pB+pA", "pB-pA+S"}
    table, to_bi, to_mono = backoff_table_tri(tri, bi, phones, units)
    assert (to_bi, to_mono) == (1, 2)
    # Trained triphone used directly.
    assert table["S-pA+pB"].means[0, 0] == 1.0
    # pA-pB+S falls to the trained left-biphone pA-pB.
    assert table["pA-pB+S"].means[0, 0] == 8.0
    # The rest fall to their center monophones.
    np.testing.assert_array_equal(table["S-pB+pA"].means,
                                  phones["pB"].means)
    with pytest.raises(ValueError):
        backoff_table_tri({}, {}, phones, {"pA-pZ+S"})

    # Without a biphone rung everything misses to monophone.
    _, to_bi2, to_mono2 = backoff_table_tri(tri, {}, phones, units)
    assert (to_bi2, to_mono2) == (0, 3)


def _anticipatory_corpus(rng, reps=4, frames_per_state=4):
    """Minimal pairs split only by ANTICIPATORY coarticulation: words
    "xa" = (pX, pA) and "xc" = (pX, pC), where pA and pC realize
    IDENTICALLY (center 0) but pX realizes at 3 before pA and at 9 before
    pC. Monophones pool pX to 6; left-biphones share the unit S-pX across
    both words (left context cannot see ahead) — both collapse the pair.
    Triphones S-pX+pA / S-pX+pC separate it."""
    lex = Lexicon({"xa": ("pX", "pA"), "xc": ("pX", "pC")})
    realized_x = {"xa": 3.0, "xc": 9.0}

    def utt(word):
        frames = [[-12.0, st, 0.0] for st in range(3)
                  for _ in range(frames_per_state)]
        for center in (realized_x[word], 0.0):
            frames += [[center, st, 0.0] for st in range(3)
                       for _ in range(frames_per_state)]
        frames += [[-12.0, st, 0.0] for st in range(3)
                   for _ in range(frames_per_state)]
        f = np.asarray(frames, np.float32)
        return f + rng.normal(0, 0.05, f.shape).astype(np.float32)

    labeled = {(w,): [utt(w) for _ in range(reps)] for w in lex.words}
    boot = {
        "pX": _phone("pX", 6.0), "pA": _phone("pA", 0.0),
        "pC": _phone("pC", 0.0), "S": _phone("S", -12.0),
    }
    return lex, boot, labeled, utt


def test_anticipatory_context_separation(rng):
    from cs304_tpu.models.biphone import (
        compose_word_models_biphone,
        train_biphone_models,
    )
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig

    lex, boot, labeled, utt = _anticipatory_corpus(rng)
    cfg = ContinuousTrainConfig(max_iterations=4, cov_reg=0.05,
                                length_multiple=32)
    bi, _ = train_biphone_models(dict(boot), labeled, lex, config=cfg)
    tri, _ = train_triphone_models(dict(boot), labeled, lex, config=cfg)

    # Triphone units learned the anticipatory realizations...
    assert abs(tri["S-pX+pA"].means[:, 0].mean() - 3.0) < 0.8
    assert abs(tri["S-pX+pC"].means[:, 0].mean() - 9.0) < 0.8
    # ...while the left-biphone's shared S-pX unit pooled them.
    assert abs(bi["S-pX"].means[:, 0].mean() - 6.0) < 1.5

    dec_tri = ContinuousDecoder(
        compose_word_models_triphone(lex, tri, boot), penalty=-5.0
    )
    dec_bi = ContinuousDecoder(
        compose_word_models_biphone(lex, bi, boot), penalty=-5.0
    )
    truths = [w for w in lex.words for _ in range(4)]
    clips = [utt(w) for w in truths]
    acc_tri = np.mean([p == t for p, t in
                       zip(dec_tri.predict_batch(clips), truths)])
    acc_bi = np.mean([p == t for p, t in
                      zip(dec_bi.predict_batch(clips), truths)])
    assert acc_tri == 1.0, acc_tri
    assert acc_tri >= acc_bi
    assert acc_bi < 1.0, "corpus failed to defeat left-biphones"


def test_anticipatory_coarticulation_synthesis():
    """The anticipatory knob glides each phone's OFFSET toward the next
    phone's target; zero is bit-identical, word-final phones hold their
    targets, and onsets are untouched (up to the trajectory branch's
    float-ulp drift — cumsum(f*vib) vs f*cumsum(vib))."""
    from cs304_tpu.data.synthetic import SyntheticTIDigits
    from cs304_tpu.data.wordvocab import make_word_corpus

    kw = dict(num_train_speakers=2, num_test_speakers=1, takes_per_digit=2)
    c0 = make_word_corpus(6, **kw)
    ca = make_word_corpus(6, **kw, anticipatory_coarticulation=0.3)
    czero = make_word_corpus(6, **kw, anticipatory_coarticulation=0.0)
    w = c0.labels[0]
    a0 = c0.digit_audio(w, 0, 1)
    aa = ca.digit_audio(w, 0, 1)
    np.testing.assert_array_equal(a0, czero.digit_audio(w, 0, 1))
    bounds = c0.digit_audio_with_phone_segments(w, 0, 1)[1]
    s0, e0 = bounds[0]
    n_ant = int((e0 - s0) * 0.3)
    # Onset numerically unchanged (float-ulp only, signal RMS is ~5e3)...
    np.testing.assert_allclose(a0[s0 : e0 - n_ant], aa[s0 : e0 - n_ant],
                               atol=1e-5)
    # ...while the offset carries a REAL glide toward the next phone.
    assert np.abs(a0[e0 - n_ant : e0] - aa[e0 - n_ant : e0]).max() > 1.0
    # Word-final phone holds its target: bit-identical (legacy branch).
    sl, el = bounds[-1]
    np.testing.assert_array_equal(a0[sl:el], aa[sl:el])

    with pytest.raises(ValueError, match="anticipatory"):
        SyntheticTIDigits(anticipatory_coarticulation=1.2)
    with pytest.raises(ValueError, match="overlap"):
        SyntheticTIDigits(coarticulation=0.6,
                          anticipatory_coarticulation=0.6)


def test_checkpoint_chain_detection(tmp_path):
    """load_unit_table prefers triphones/ and routes its back-off through
    biphones/ when both directories exist; compose_from_checkpoint
    reports the tier it used."""
    from cs304_tpu.models.biphone import (
        compose_from_checkpoint,
        load_unit_table,
    )
    from cs304_tpu.utils.checkpoint import save_models

    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    lex = Lexicon({"ab": ("pA", "pB"), "ba": ("pB", "pA")})
    ck = tmp_path / "ck"
    save_models(phones, str(ck))
    lex.save(str(ck / "lexicon.json"))

    # Partial triphone coverage + a biphone middle rung.
    tri = clone_triphone_models(phones, {"S-pA+pB"})
    tri["S-pA+pB"].means[:] += 1.0
    bi = clone_biphone_models(phones, {"pA-pB"})
    bi["pA-pB"].means[:] += 2.0
    save_models(bi, str(ck / "biphones"))
    save_models(tri, str(ck / "triphones"))

    _, unit_lex, table, desc = load_unit_table(
        str(ck / "lexicon.json"), phones
    )
    assert desc.startswith("1 triphone units")
    assert unit_lex["ab"] == ("S-pA+pB", "pA-pB+S")
    assert table["S-pA+pB"].means[0, 0] == 1.0  # trained triphone
    assert table["pA-pB+S"].means[0, 0] == 8.0  # biphone rung
    np.testing.assert_array_equal(table["S-pB+pA"].means,
                                  phones["pB"].means)  # monophone rung

    _, composed, desc2 = compose_from_checkpoint(
        str(ck / "lexicon.json"), phones
    )
    assert desc2 == desc
    assert composed["ab"].means[0, 0] == 1.0
    assert composed["ab"].means[3, 0] == 8.0


def test_cluster_triphone_units(rng):
    """Data-driven tying groups acoustically-equal contexts and keeps
    genuinely different realizations apart."""
    from cs304_tpu.models.triphone import cluster_triphone_units

    lex, boot, labeled, utt = _anticipatory_corpus(rng)
    seed, _ = train_triphone_models(dict(boot), labeled, lex,
                                    smooth_tau=1.0)
    mapping = cluster_triphone_units(seed, max_per_phone=2)
    # The two pX realizations (3 before pA, 9 before pC) stay separate.
    assert mapping["S-pX+pA"] != mapping["S-pX+pC"]
    # Cluster labels preserve the center phone.
    assert mapping["S-pX+pA"].startswith("pX~")
    # max_per_phone=1 pools every context of a phone into one cluster.
    one = cluster_triphone_units(seed, max_per_phone=1)
    assert one["S-pX+pA"] == one["S-pX+pC"]
    with pytest.raises(ValueError):
        cluster_triphone_units(seed, max_per_phone=0)


def test_tie_and_train_triphones(rng):
    """Generalized triphones: tied models keep the anticipatory contrast
    at max_per_phone=2 (full-triphone accuracy with shared models) and
    provably lose it when forced into one cluster per phone."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig
    from cs304_tpu.models.triphone import tie_and_train_triphones

    lex, boot, labeled, utt = _anticipatory_corpus(rng)
    cfg = ContinuousTrainConfig(max_iterations=4, cov_reg=0.05,
                                length_multiple=32)
    tied, tied_lex, mapping = tie_and_train_triphones(
        dict(boot), labeled, lex, max_per_phone=2, config=cfg
    )
    dec = ContinuousDecoder(compose_word_models(tied_lex, tied),
                            penalty=-5.0)
    truths = [w for w in lex.words for _ in range(4)]
    clips = [utt(w) for w in truths]
    acc = np.mean([p == t for p, t in zip(dec.predict_batch(clips),
                                          truths)])
    assert acc == 1.0, acc
    # Tying shares models: distinct model objects <= distinct units.
    assert len(set(mapping.values())) <= len(mapping)

    # One cluster per phone erases the contrast (the sanity direction).
    tied1, lex1, _ = tie_and_train_triphones(
        dict(boot), labeled, lex, max_per_phone=1, config=cfg
    )
    dec1 = ContinuousDecoder(compose_word_models(lex1, tied1),
                             penalty=-5.0)
    acc1 = np.mean([p == t for p, t in zip(dec1.predict_batch(clips),
                                           truths)])
    assert acc1 < 1.0, "max_per_phone=1 should collapse the contrast"


def test_tied_lexicon_covers_oov(rng):
    """Words added to the lexicon before tying but absent from training
    fall back to monophone labels inside the tied lexicon and compose."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig
    from cs304_tpu.models.triphone import tie_and_train_triphones

    lex, boot, labeled, utt = _anticipatory_corpus(rng)
    bigger = lex.with_words({"ca": ("pC", "pA")})  # never trained
    cfg = ContinuousTrainConfig(max_iterations=3, cov_reg=0.05,
                                length_multiple=32)
    tied, tied_lex, _ = tie_and_train_triphones(
        dict(boot), labeled, bigger, max_per_phone=2, config=cfg
    )
    assert "ca" in tied_lex
    models = compose_word_models(tied_lex, tied)
    dec = ContinuousDecoder(models, penalty=-5.0)
    frames = [[-12.0, st, 0.0] for st in range(3) for _ in range(4)]
    for center in (0.0, 0.0):  # pC then pA, both realize at 0
        frames += [[center, st, 0.0] for st in range(3) for _ in range(4)]
    frames += [[-12.0, st, 0.0] for st in range(3) for _ in range(4)]
    clip = (np.asarray(frames, np.float32)
            + rng.normal(0, 0.05, (len(frames), 3)).astype(np.float32))
    assert dec.predict(clip) in bigger.words


def test_map_smoothed_triphones(rng):
    lex, boot, labeled, utt = _anticipatory_corpus(rng)
    tied, iters = train_triphone_models(
        dict(boot), labeled, lex, smooth_tau=1e6
    )
    assert iters == 1
    np.testing.assert_allclose(
        tied["S-pX+pA"].means, boot["pX"].means, atol=0.05
    )
    sep, _ = train_triphone_models(dict(boot), labeled, lex, smooth_tau=1.0)
    assert abs(sep["S-pX+pA"].means[:, 0].mean() - 3.0) < 1.0
    assert abs(sep["S-pX+pC"].means[:, 0].mean() - 9.0) < 1.0
    with pytest.raises(ValueError, match="smooth_tau"):
        train_triphone_models(
            dict(boot), labeled, lex, smooth_tau=1.0, gmm_mixtures=2
        )
