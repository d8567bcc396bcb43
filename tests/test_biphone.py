"""Left-context biphones (models/biphone.py).

Structure tests (unit naming, derived lexicon, clone equivalence, monophone
back-off) plus the payoff test: a corpus built so that context-SWAPPED
phone realizations make the tied monophones collapse into identical models
(the classic failure of context-independent tying) while the biphone units
separate the contexts and decode perfectly.
"""
import numpy as np
import pytest

from cs304_tpu.models.biphone import (
    backoff_table,
    biphone_label,
    biphone_lexicon,
    clone_biphone_models,
    compose_word_models_biphone,
    observed_units,
    split_biphone,
    train_biphone_models,
    word_units,
)
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.lexicon import Lexicon, compose_word_models


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
    assert biphone_label("pA", "pB") == "pA-pB"
    assert split_biphone("pA-pB") == ("pA", "pB")
    assert split_biphone("S-pB") == ("S", "pB")
    with pytest.raises(ValueError):
        biphone_label("pA", "p-B")
    with pytest.raises(ValueError):
        split_biphone("pA")


def test_word_units_and_derived_lexicon():
    # Word-initial context is silence — what actually precedes a word.
    assert word_units(("pA", "pB", "pA")) == ("S-pA", "pA-pB", "pB-pA")
    lex = Lexicon({"ab": ("pA", "pB"), "ba": ("pB", "pA")})
    blex = biphone_lexicon(lex)
    assert blex["ab"] == ("S-pA", "pA-pB")
    assert blex["ba"] == ("S-pB", "pB-pA")
    # The derived lexicon expands transcripts exactly like the phone one:
    # silence between words, units inside.
    assert blex.expand_transcript(("ab", "ba")) == (
        "S", "S-pA", "pA-pB", "S", "S-pB", "pB-pA", "S"
    )
    assert observed_units(lex) == {"S-pA", "pA-pB", "S-pB", "pB-pA"}
    assert observed_units(lex, ["ab"]) == {"S-pA", "pA-pB"}


def test_clone_equivalence_before_training():
    """Untrained biphone clones compose to EXACTLY the monophone words —
    context-dependent init changes nothing until training diverges it."""
    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    lex = Lexicon({"ab": ("pA", "pB"), "ba": ("pB", "pA")})
    clones = clone_biphone_models(phones, observed_units(lex))
    mono = compose_word_models(lex, phones)
    bi = compose_word_models_biphone(lex, clones, phones)
    assert sorted(mono) == sorted(bi)
    for w in lex.words:
        np.testing.assert_array_equal(mono[w].means, bi[w].means)
        np.testing.assert_array_equal(mono[w].covariances,
                                      bi[w].covariances)
        np.testing.assert_array_equal(mono[w].log_a, bi[w].log_a)
    # Clones are copies, not views.
    clones["pA-pB"].means[:] = 99.0
    assert phones["pB"].means[0, 0] == 6.0

    with pytest.raises(ValueError):
        clone_biphone_models(phones, {"pA-pZ"})


def test_backoff_to_monophone():
    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    trained = clone_biphone_models(phones, {"S-pA", "pA-pB"})
    trained["pA-pB"].means[:] += 1.0  # pretend training moved it
    # "ba" needs S-pB and pB-pA — neither trained: both back off.
    lex = Lexicon({"ab": ("pA", "pB"), "ba": ("pB", "pA")})
    table, backed_off = backoff_table(
        trained, phones, observed_units(lex)
    )
    assert backed_off == 2
    np.testing.assert_array_equal(table["pB-pA"].means, phones["pA"].means)
    np.testing.assert_array_equal(table["pA-pB"].means,
                                  trained["pA-pB"].means)

    composed = compose_word_models_biphone(lex, trained, phones)
    # "ba" is pure back-off: identical to the monophone composition.
    mono = compose_word_models(lex, phones)
    np.testing.assert_array_equal(composed["ba"].means, mono["ba"].means)
    # "ab" carries the trained unit.
    assert composed["ab"].means[3, 0] == phones["pB"].means[0, 0] + 1.0

    with pytest.raises(ValueError):
        backoff_table({}, phones, {"pA-pZ"})


def test_train_biphone_models_validates_lexicon():
    phones = {"pA": _phone("pA", 0.0), "S": _phone("S", -12.0)}
    lex = Lexicon({"aa": ("pA",)})
    with pytest.raises(ValueError, match="missing from lexicon"):
        train_biphone_models(
            phones, {("zz",): [np.zeros((30, 3), np.float32)]}, lex
        )


def _context_corpus(rng, reps=4, frames_per_state=4):
    """The classic tying failure: pX realizes at 3 after pA but at 9 after
    pC, while pY realizes at 9 after pA but at 3 after pC. Monophone
    training pools both contexts, so pX and pY converge to the SAME model
    (center 6) and words differing only in that slot become
    indistinguishable; biphones keep the contexts apart."""
    lex = Lexicon({
        "ax": ("pA", "pX"), "ay": ("pA", "pY"),
        "cx": ("pC", "pX"), "cy": ("pC", "pY"),
    })
    centers = {"pA": 0.0, "pC": -6.0, "S": -12.0}
    realized = {
        ("pA", "pX"): 3.0, ("pA", "pY"): 9.0,
        ("pC", "pX"): 9.0, ("pC", "pY"): 3.0,
    }

    def utt(word):
        p1, p2 = lex[word]
        frames = [[centers["S"], st, 0.0] for st in range(3)
                  for _ in range(frames_per_state)]
        for center, phone in ((centers[p1], p1), (realized[(p1, p2)], p2)):
            del phone
            frames += [[center, st, 0.0] for st in range(3)
                       for _ in range(frames_per_state)]
        frames += [[centers["S"], st, 0.0] for st in range(3)
                   for _ in range(frames_per_state)]
        f = np.asarray(frames, np.float32)
        return f + rng.normal(0, 0.05, f.shape).astype(np.float32)

    labeled = {(w,): [utt(w) for _ in range(reps)] for w in lex.words}
    boot = {
        "pA": _phone("pA", 0.0), "pC": _phone("pC", -6.0),
        "pX": _phone("pX", 6.0), "pY": _phone("pY", 6.0),
        "S": _phone("S", -12.0),
    }
    return lex, boot, labeled, utt


def test_context_separation_end_to_end(rng):
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.lexicon import train_phone_models
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig

    lex, boot, labeled, utt = _context_corpus(rng)
    cfg = ContinuousTrainConfig(max_iterations=4, cov_reg=0.05,
                                length_multiple=32)

    mono, _ = train_phone_models(dict(boot), labeled, lex, config=cfg)
    bi, _ = train_biphone_models(dict(boot), labeled, lex, config=cfg)

    # The units learned their context-specific realizations...
    assert abs(bi["pA-pX"].means[:, 0].mean() - 3.0) < 0.8
    assert abs(bi["pC-pX"].means[:, 0].mean() - 9.0) < 0.8
    assert abs(bi["pA-pY"].means[:, 0].mean() - 9.0) < 0.8
    # ...while the tied monophone pooled them into the middle.
    assert abs(mono["pX"].means[:, 0].mean() - 6.0) < 1.5

    dec_bi = ContinuousDecoder(
        compose_word_models_biphone(lex, bi, mono), penalty=-5.0
    )
    dec_mono = ContinuousDecoder(compose_word_models(lex, mono),
                                 penalty=-5.0)
    truths = [w for w in lex.words for _ in range(3)]
    clips = [utt(w) for w in truths]
    acc_bi = np.mean([p == t for p, t in
                      zip(dec_bi.predict_batch(clips), truths)])
    acc_mono = np.mean([p == t for p, t in
                        zip(dec_mono.predict_batch(clips), truths)])
    assert acc_bi == 1.0, acc_bi
    # The monophone tier cannot express the contrast (ax vs ay and cx vs
    # cy are coin flips for it); at minimum the biphone tier dominates.
    assert acc_bi >= acc_mono
    assert acc_mono < 1.0, "corpus failed to defeat the tied monophones"


def test_coarticulation_glide_properties():
    """The synthetic corpus's coarticulation knob: left-context formant
    glides confined to phone onsets; coarticulation=0 is bit-identical to
    the legacy piecewise-constant synthesis (no rng draws added)."""
    from cs304_tpu.data.wordvocab import make_word_corpus

    kw = dict(num_train_speakers=2, num_test_speakers=1, takes_per_digit=2)
    c0 = make_word_corpus(6, **kw)
    c1 = make_word_corpus(6, **kw, coarticulation=0.35)
    czero = make_word_corpus(6, **kw, coarticulation=0.0)
    w = c0.labels[0]
    a0 = c0.digit_audio(w, 0, 1)
    a1 = c1.digit_audio(w, 0, 1)
    np.testing.assert_array_equal(a0, czero.digit_audio(w, 0, 1))
    assert a0.shape == a1.shape  # durations draw from the same rng stream
    bounds = c0.digit_audio_with_phone_segments(w, 0, 1)[1]
    s0, e0 = bounds[0]
    # Word-initial phone has no left context: identical.
    np.testing.assert_array_equal(a0[s0:e0], a1[s0:e0])
    # Later phones glide from the previous phone's formants at onset.
    s1, e1 = bounds[1]
    n_tr = int((e1 - s1) * 0.35)
    assert not np.array_equal(a0[s1 : s1 + n_tr], a1[s1 : s1 + n_tr])


def test_compose_from_checkpoint_roundtrip(tmp_path, rng):
    """transcribe.py's load path: a checkpoint with a biphones/ directory
    composes context-dependent words; without one it composes monophones."""
    from cs304_tpu.models.biphone import compose_from_checkpoint
    from cs304_tpu.utils.checkpoint import save_models

    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    lex = Lexicon({"ab": ("pA", "pB")})
    units = clone_biphone_models(phones, observed_units(lex))
    units["pA-pB"].means[:] += 1.0

    ck = tmp_path / "ck"
    save_models(phones, str(ck))
    lex.save(str(ck / "lexicon.json"))
    _, mono_composed, desc = compose_from_checkpoint(
        str(ck / "lexicon.json"), phones
    )
    assert desc == ""
    np.testing.assert_array_equal(
        mono_composed["ab"].means, compose_word_models(lex, phones)["ab"].means
    )

    save_models(units, str(ck / "biphones"))
    _, bi_composed, desc = compose_from_checkpoint(
        str(ck / "lexicon.json"), phones
    )
    assert desc.startswith("2 biphone units")
    assert bi_composed["ab"].means[3, 0] == 7.0  # the shifted trained unit


def test_map_smoothed_biphones(rng):
    """smooth_tau interpolates units between the monophone prior and full
    context specialization: huge tau pins units at the prior; small tau
    with ample data separates the contexts like full re-estimation."""
    lex, boot, labeled, utt = _context_corpus(rng)
    # Enormous tau: the aligned frames barely move the prior.
    tied, iters = train_biphone_models(
        dict(boot), labeled, lex, smooth_tau=1e6
    )
    assert iters == 1
    np.testing.assert_allclose(
        tied["pA-pX"].means, boot["pX"].means, atol=0.05
    )
    # Small tau: units reach their context realizations (pX: 3 after pA,
    # 9 after pC) in ONE MAP pass.
    sep, _ = train_biphone_models(dict(boot), labeled, lex, smooth_tau=1.0)
    assert abs(sep["pA-pX"].means[:, 0].mean() - 3.0) < 1.0
    assert abs(sep["pC-pX"].means[:, 0].mean() - 9.0) < 1.0

    with pytest.raises(ValueError, match="smooth_tau"):
        train_biphone_models(
            dict(boot), labeled, lex, smooth_tau=1.0, gmm_mixtures=2
        )


def test_biphone_forced_alignment(rng):
    """Forced alignment against biphone UNITS (align.py --lexicon with a
    biphones/ checkpoint): expansion through the derived lexicon, unit
    models with monophone back-off, silence pre-interleaved."""
    from cs304_tpu.models.align import ForcedAligner
    from cs304_tpu.models.lexicon import train_phone_models
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig

    lex, boot, labeled, utt = _context_corpus(rng)
    cfg = ContinuousTrainConfig(max_iterations=4, cov_reg=0.05,
                                length_multiple=32)
    mono, _ = train_phone_models(dict(boot), labeled, lex, config=cfg)
    bi, _ = train_biphone_models(dict(boot), labeled, lex, config=cfg)

    blex = biphone_lexicon(lex)
    table, _ = backoff_table(bi, mono, observed_units(lex))
    table["S"] = bi["S"]
    aligner = ForcedAligner(table, insert_sil=False)
    clip = utt("ax")
    res = aligner.align(clip, blex.expand_transcript(("ax",)))
    segs = res.word_segments(include_silence=False)
    assert [s.word for s in segs] == ["S-pA", "pA-pX"]
    # The context-shifted phone's frames sit in the second half of speech.
    assert segs[1].start_frame > segs[0].start_frame
    assert res.num_frames == len(clip)


def test_composed_biphone_words_stream(rng):
    """Composed biphone words are ordinary WordHMMs: the batched streaming
    pool serves them with offline-exact finals (the serving stack needs no
    biphone awareness)."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.lexicon import train_phone_models
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig
    from cs304_tpu.ops.streaming_batch import BatchedStreamingComposite

    lex, boot, labeled, utt = _context_corpus(rng)
    cfg = ContinuousTrainConfig(max_iterations=3, cov_reg=0.05,
                                length_multiple=32)
    mono, _ = train_phone_models(dict(boot), labeled, lex, config=cfg)
    bi, _ = train_biphone_models(dict(boot), labeled, lex, config=cfg)
    dec = ContinuousDecoder(
        compose_word_models_biphone(lex, bi, mono), penalty=-5.0
    )
    pool = BatchedStreamingComposite(
        dec.composite, num_slots=2, chunk_size=8, max_frames=128
    )
    utts = [utt("ax"), utt("cy")]
    slots = [pool.start() for _ in utts]
    for i, s in enumerate(slots):
        for lo in range(0, len(utts[i]), 8):
            pool.step({s: utts[i][lo : lo + 8]})
    streamed = pool.finalize(slots)
    offline = dec.predict_batch(utts)
    for i, s in enumerate(slots):
        assert streamed[s][1] == offline[i]
    assert offline == ["ax", "cy"]


def test_biphone_oov_word_decodes(rng):
    """A word added to the lexicon AFTER biphone training decodes through
    trained units where its pairs were observed and monophone back-off
    where they were not — context dependence keeps the OOV guarantee."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.lexicon import train_phone_models
    from cs304_tpu.models.train_continuous import ContinuousTrainConfig

    lex, boot, labeled, utt = _context_corpus(rng)
    cfg = ContinuousTrainConfig(max_iterations=4, cov_reg=0.05,
                                length_multiple=32)
    mono, _ = train_phone_models(dict(boot), labeled, lex, config=cfg)
    bi, _ = train_biphone_models(dict(boot), labeled, lex, config=cfg)

    # New word "ca" = (pC, pA): S-pC is trained, pC-pA never occurred.
    bigger = lex.with_words({"ca": ("pC", "pA")})
    models = compose_word_models_biphone(bigger, bi, mono)
    dec = ContinuousDecoder(models, penalty=-5.0)

    frames = [[-12.0, st, 0.0] for st in range(3) for _ in range(4)]
    for center in (-6.0, 0.0):  # pC then pA at their monophone centers
        frames += [[center, st, 0.0] for st in range(3) for _ in range(4)]
    frames += [[-12.0, st, 0.0] for st in range(3) for _ in range(4)]
    clip = (np.asarray(frames, np.float32)
            + rng.normal(0, 0.05, (len(frames), 3)).astype(np.float32))
    assert dec.predict(clip) == "ca"


def test_manifest_tier_dispatch(tmp_path, rng):
    """Checkpoints self-describe their unit tier via the manifest's
    unit_tier field (utils/checkpoint.py:save_models): load_unit_table
    dispatches on it even for a directory with a NON-conventional name,
    and still falls back to the historical name probe for manifest-less
    trees (old checkpoints load unchanged)."""
    from cs304_tpu.models.biphone import compose_from_checkpoint
    from cs304_tpu.utils.checkpoint import load_manifest, save_models

    phones = {"pA": _phone("pA", 0.0), "pB": _phone("pB", 6.0),
              "S": _phone("S", -12.0)}
    lex = Lexicon({"ab": ("pA", "pB")})
    units = clone_biphone_models(phones, observed_units(lex))
    units["pA-pB"].means[:] += 1.0

    ck = tmp_path / "ck"
    save_models(phones, str(ck), tier="monophones",
                provenance={"script": "test"})
    lex.save(str(ck / "lexicon.json"))
    assert load_manifest(str(ck))["unit_tier"] == "monophones"
    assert load_manifest(str(ck))["provenance"]["script"] == "test"

    # Manifest dispatch: unit dir under a name the probe chain never knew.
    save_models(units, str(ck / "units_v2"), tier="biphones")
    _, composed, desc = compose_from_checkpoint(
        str(ck / "lexicon.json"), phones
    )
    assert desc.startswith("2 biphone units"), desc
    assert composed["ab"].means[3, 0] == 7.0

    # Old-layout fallback: manifest-less conventional directory name.
    import json
    import os

    man = str(ck / "units_v2" / "manifest.json")
    with open(man) as f:
        m = json.load(f)
    del m["unit_tier"]
    with open(man, "w") as f:
        json.dump(m, f)
    _, _, desc2 = compose_from_checkpoint(str(ck / "lexicon.json"), phones)
    assert desc2 == "", "tier-less unconventional dir must not dispatch"
    os.rename(str(ck / "units_v2"), str(ck / "biphones"))
    _, composed3, desc3 = compose_from_checkpoint(
        str(ck / "lexicon.json"), phones
    )
    assert desc3.startswith("2 biphone units"), desc3
    assert composed3["ab"].means[3, 0] == 7.0
