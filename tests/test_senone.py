"""Senones: phonetic-decision-tree state tying (models/senone.py).

The decisive capability over unit-level tying (generalized triphones,
models/triphone.py): two contexts of one phone can share SOME states and
split others — and unseen triphones classify through the trees into
proper senones instead of backing off to the monophone.
"""
import numpy as np
import pytest

from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.lexicon import Lexicon
from cs304_tpu.models.senone import (
    SenoneTying,
    build_senone_tying,
    collect_state_stats,
    compose_word_models_senone,
    phone_classes,
    senone_unit_table,
    train_senone_models,
)
from cs304_tpu.models.train_continuous import ContinuousTrainConfig


def _phone(label, center, dim=3, states=3):
    means = np.array(
        [[center, st, 0.0] for st in range(states)], np.float32
    )
    covs = np.tile(np.eye(dim, dtype=np.float32) * 0.2, (states, 1, 1))
    return WordHMM(label=label, means=means, covariances=covs,
                   log_a=uniform_forward_log_a(states))


def _items(groups):
    """groups: [(unit, prev, nxt, n, mu_scalar)] -> tree-growth items."""
    out = []
    for unit, prev, nxt, n, mu in groups:
        out.append({
            "unit": unit, "prev": prev, "nxt": nxt, "n": float(n),
            "mu": np.array([mu, 0.0], np.float64),
            "var": np.array([0.3, 0.3], np.float64),
        })
    return out


def test_phone_classes_structure():
    phones = {
        "pA": _phone("pA", 0.0), "pB": _phone("pB", 0.5),
        "pC": _phone("pC", 9.0), "S": _phone("S", -12.0),
    }
    classes = phone_classes(phones)
    # All singletons present...
    for p in phones:
        assert (p,) in classes
    # ...plus merge nodes; acoustic neighbors pA/pB merge first.
    assert ("pA", "pB") in classes
    # The full set never appears (it cannot split anything).
    assert tuple(sorted(phones)) not in classes


def test_tree_splits_on_the_distinguishing_question():
    from cs304_tpu.models.senone import _grow_tree

    items = _items([
        ("S-pX+pA", "S", "pA", 20, 3.0),
        ("pB-pX+pA", "pB", "pA", 20, 3.0),
        ("S-pX+pC", "S", "pC", 20, 9.0),
        ("pB-pX+pC", "pB", "pC", 20, 9.0),
    ])
    classes = [("pA",), ("pB",), ("pC",), ("S",), ("pA", "pB")]
    tree = _grow_tree(items, classes, max_leaves=4, min_gain=1.0,
                      min_count=2.0)
    # One split suffices and it must be on the RIGHT context pA vs pC
    # (left context carries no signal, and further splits gain ~nothing).
    assert tree["side"] == "R"
    assert set(classes[tree["class"]]) in ({"pA"}, {"pC"})
    assert "leaf" in tree["yes"] and "leaf" in tree["no"]

    # min_gain above the separation forces a single leaf.
    flat = _grow_tree(items, classes, max_leaves=4, min_gain=1e9,
                      min_count=2.0)
    assert flat == {"leaf": 0}

    # min_count can make the split infeasible.
    tiny = _grow_tree(items, classes, max_leaves=4, min_gain=1.0,
                      min_count=50.0)
    assert tiny == {"leaf": 0}


def test_tying_roundtrip_and_unseen_classification(tmp_path):
    items = _items([
        ("S-pX+pA", "S", "pA", 20, 3.0),
        ("S-pX+pC", "S", "pC", 20, 9.0),
    ])
    from cs304_tpu.models.senone import _grow_tree

    classes = [("pA",), ("pC",)]
    tying = SenoneTying(
        classes=classes,
        trees={"pX/0": _grow_tree(items, classes, 4, 1.0, 2.0)},
        num_states={"pX": 1},
        senone_of={"S-pX+pA/0": "", "S-pX+pC/0": ""},
    )
    tying.senone_of = {
        "S-pX+pA/0": tying.classify("S-pX+pA", 0),
        "S-pX+pC/0": tying.classify("S-pX+pC", 0),
    }
    # An UNSEEN unit with the pA context lands in the pA-side senone.
    assert tying.classify("pB-pX+pA", 0) == tying.senone_of["S-pX+pA/0"]
    assert tying.classify("pB-pX+pC", 0) == tying.senone_of["S-pX+pC/0"]

    path = str(tmp_path / "tying.json")
    tying.save(path)
    loaded = SenoneTying.load(path)
    assert loaded.classify("pB-pX+pA", 0) == tying.classify("pB-pX+pA", 0)
    assert loaded.num_senones() == tying.num_senones() == 2


# ---------------------------------------------------------------------------
# End-to-end: the anticipatory corpus (shared shape with test_triphone.py)
# ---------------------------------------------------------------------------

def _anticipatory_corpus(rng, reps=4, frames_per_state=4, per_state=False):
    """Minimal pairs split only by anticipatory coarticulation: "xa" and
    "xc" share phone pX, realized at 3 before pA and 9 before pC (pA and
    pC themselves realize identically). per_state=True confines the
    anticipatory shift to pX's LAST state only — the state-granularity
    case unit-level tying cannot express."""
    lex = Lexicon({"xa": ("pX", "pA"), "xc": ("pX", "pC")})
    realized_x = {"xa": 3.0, "xc": 9.0}

    def utt(word):
        frames = [[-12.0, st, 0.0] for st in range(3)
                  for _ in range(frames_per_state)]
        x = realized_x[word]
        for st in range(3):
            center = x if (not per_state or st == 2) else 6.0
            frames += [[center, st, 0.0]] * frames_per_state
        frames += [[0.0, st, 0.0] for st in range(3)
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


def _train(rng, per_state=False, **kw):
    lex, boot, labeled, utt = _anticipatory_corpus(rng, per_state=per_state)
    cfg = ContinuousTrainConfig(max_iterations=4, cov_reg=0.05,
                                length_multiple=32)
    models, tying, _ = train_senone_models(
        boot, labeled, lex, config=cfg, min_count=4.0, **kw
    )
    return lex, boot, labeled, utt, models, tying


def test_senones_keep_the_anticipatory_contrast(rng):
    from cs304_tpu.models.decoder import ContinuousDecoder

    lex, boot, labeled, utt, models, tying = _train(
        rng, max_per_state=2, min_gain=5.0
    )
    # The anticipatory phone's states split by right context...
    assert (tying.senone_of["S-pX+pA/1"] != tying.senone_of["S-pX+pC/1"])
    # ...and the tied unit models carry the realized acoustics.
    assert abs(models["S-pX+pA"].means[:, 0].mean() - 3.0) < 0.8
    assert abs(models["S-pX+pC"].means[:, 0].mean() - 9.0) < 0.8

    dec = ContinuousDecoder(
        compose_word_models_senone(lex, models, tying, boot), penalty=-5.0
    )
    truths = [w for w in lex.words for _ in range(4)]
    preds = dec.predict_batch([utt(w) for w in truths])
    assert np.mean([p == t for p, t in zip(preds, truths)]) == 1.0

    # One leaf per state provably collapses the pair (the monophone limit).
    *_s, models1, tying1 = _train(rng, max_per_state=1)
    assert (tying1.senone_of["S-pX+pA/1"] == tying1.senone_of["S-pX+pC/1"])
    dec1 = ContinuousDecoder(
        compose_word_models_senone(lex, models1, tying1, boot), penalty=-5.0
    )
    preds1 = dec1.predict_batch([utt(w) for w in truths])
    assert np.mean([p == t for p, t in zip(preds1, truths)]) < 1.0


def test_state_level_granularity(rng):
    """The senone-only win: when contexts differ in ONE state, the shared
    states tie into one senone while the differing state splits — and the
    tied slots are bitwise-shared in the trained models."""
    # min_gain sits between alignment-boundary leakage (a stray shifted
    # frame in a shared state's pool, gain ~O(10)) and the true state-2
    # separation (gain ~130 for means 3 vs 9 at this occupancy).
    lex, boot, labeled, utt, models, tying = _train(
        rng, per_state=True, max_per_state=2, min_gain=25.0
    )
    shared0 = tying.senone_of["S-pX+pA/0"] == tying.senone_of["S-pX+pC/0"]
    shared1 = tying.senone_of["S-pX+pA/1"] == tying.senone_of["S-pX+pC/1"]
    split2 = tying.senone_of["S-pX+pA/2"] != tying.senone_of["S-pX+pC/2"]
    assert shared0 and shared1 and split2, tying.senone_of
    a, c = models["S-pX+pA"], models["S-pX+pC"]
    np.testing.assert_array_equal(a.means[0], c.means[0])
    np.testing.assert_array_equal(a.covariances[1], c.covariances[1])
    assert abs(a.means[2, 0] - 3.0) < 0.8
    assert abs(c.means[2, 0] - 9.0) < 0.8
    # Transition tying: one matrix per center phone.
    np.testing.assert_array_equal(a.log_a, c.log_a)


def test_unseen_units_synthesize_through_the_trees(rng):
    """An OOV word's unseen triphones get tree-classified senones — the
    synthesized unit equals the trained unit with the same tree routing,
    not the context-free monophone."""
    lex, boot, labeled, utt, models, tying = _train(
        rng, max_per_state=2, min_gain=5.0
    )
    # "ax" introduces pA-pX+pA: never trained, right context pA.
    lex2 = lex.with_words({"ax": ("pA", "pX", "pA")})
    table, synthesized = senone_unit_table(
        lex2, models, tying, boot, unseen="synthesize"
    )
    assert synthesized >= 1
    unseen = table["pA-pX+pA"]
    trained = models["S-pX+pA"]
    for st in range(3):
        if tying.classify("pA-pX+pA", st) == tying.classify("S-pX+pA", st):
            np.testing.assert_array_equal(unseen.means[st], trained.means[st])
    assert not np.allclose(unseen.means, boot["pX"].means)


def test_senone_checkpoint_detection(rng, tmp_path):
    """A senones/ directory wins the load_unit_table chain; unseen units
    of an OOV word back off to monophones (the measured default), and the
    composed models decode the original pair."""
    from cs304_tpu.models.biphone import (
        compose_from_checkpoint,
        load_unit_table,
    )
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.utils.checkpoint import save_models

    lex, boot, labeled, utt, models, tying = _train(
        rng, max_per_state=2, min_gain=5.0
    )
    ck = tmp_path / "ck"
    save_models(boot, str(ck))
    lex2 = lex.with_words({"ax": ("pA", "pX", "pA")})
    lex2.save(str(ck / "lexicon.json"))
    sen_dir = ck / "senones"
    save_models(models, str(sen_dir))
    tying.save(str(sen_dir / "senone_tying.json"))

    _, unit_lex, table, desc = load_unit_table(
        str(ck / "lexicon.json"), boot
    )
    assert "senone" in desc and "backed off" in desc
    assert unit_lex["xa"] == ("S-pX+pA", "pX-pA+S")
    assert "pA-pX+pA" in table  # the OOV word's unseen middle unit
    # The default materializes unseen units as their center monophone;
    # unseen="synthesize" routes them through the trees instead.
    np.testing.assert_array_equal(
        table["pA-pX+pA"].means, boot["pX"].means
    )
    _, _, table_syn, desc_syn = load_unit_table(
        str(ck / "lexicon.json"), boot, unseen_senones="synthesize"
    )
    assert "synthesized" in desc_syn
    assert not np.allclose(table_syn["pA-pX+pA"].means, boot["pX"].means)

    _, composed, desc2 = compose_from_checkpoint(
        str(ck / "lexicon.json"), boot
    )
    assert desc2 == desc
    dec = ContinuousDecoder(
        {w: composed[w] for w in ("xa", "xc", "S")}, penalty=-5.0
    )
    truths = ["xa", "xc"] * 3
    preds = dec.predict_batch([utt(w) for w in truths])
    assert np.mean([p == t for p, t in zip(preds, truths)]) == 1.0


def test_collect_state_stats_shapes(rng):
    lex, boot, labeled, utt = _anticipatory_corpus(rng, reps=2)
    expanded = {("S", "pX", "pA", "S"): labeled[("xa",)]}
    stats = collect_state_stats(boot, expanded)
    assert set(stats.labels) == {"S", "pX", "pA", "pC"}
    i = stats.labels.index("pX")
    assert stats.counts[i].sum() > 0
    assert np.isfinite(stats.means[i]).all()
    assert (stats.vars[i] > 0).all()


def test_composed_senone_words_stream(rng):
    """Composed senone words are ordinary WordHMMs: the batched streaming
    pool serves them with offline-exact finals — the serving stack needs no
    senone awareness (VERDICT r3 item #7, feature-level half; the raw-audio
    half is test_senone_serving_sessions_offline_parity)."""
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.ops.streaming_batch import BatchedStreamingComposite

    lex, boot, labeled, utt, models, tying = _train(rng)
    dec = ContinuousDecoder(
        compose_word_models_senone(lex, models, tying, boot), penalty=-5.0
    )
    pool = BatchedStreamingComposite(
        dec.composite, num_slots=2, chunk_size=8, max_frames=256
    )
    utts = [utt("xa"), utt("xc")]
    slots = [pool.start() for _ in utts]
    for i, s in enumerate(slots):
        for lo in range(0, len(utts[i]), 8):
            pool.step({s: utts[i][lo : lo + 8]})
    streamed = pool.finalize(slots)
    offline = dec.predict_batch(utts)
    for i, s in enumerate(slots):
        assert streamed[s][1] == offline[i]
    assert offline == ["xa", "xc"]


def test_senone_serving_sessions_offline_parity(rng):
    """Raw-audio serving sessions on a SENONE checkpoint: endpointing +
    partials + finals through ServingSessionPool, with finals equal to the
    offline ContinuousDecoder on the same composed senone models (the
    streamed==offline parity contract, VERDICT r3 item #7)."""
    from cs304_tpu.audio.endpointing import SignalSeparation
    from cs304_tpu.data.wordvocab import make_lexicon, make_word_corpus
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.lexicon import train_phone_models, uniform_phone_boot
    from cs304_tpu.models.train_kmeans import (
        SegmentalKMeansConfig,
        train_word_hmm,
    )
    from cs304_tpu.ops.mfcc import mfcc_batch
    from cs304_tpu.serving import ServingSessionPool

    corpus = make_word_corpus(
        6, num_train_speakers=2, num_test_speakers=1, takes_per_digit=2,
        phones_per_word=(2, 3),
    )
    lex = make_lexicon(6, phones_per_word=(2, 3))
    words = corpus.labels
    sep = SignalSeparation()
    stripped = {
        w: mfcc_batch(sep.remove_empty_batch(corpus.train_dataset[w]))
        for w in words
    }
    noises = [x for x in sep.get_all_noises() if len(x) >= 9 * sep.frame_size]
    silence = train_word_hmm(
        "S", mfcc_batch(noises),
        SegmentalKMeansConfig(num_states=3, max_iterations=6,
                              length_multiple=32),
    ).model
    boot = uniform_phone_boot(stripped, lex)
    boot["S"] = silence
    labeled = {(w,): mfcc_batch(corpus.train_dataset[w]) for w in words}
    cfg = ContinuousTrainConfig(max_iterations=3, cov_reg=0.1,
                                length_multiple=32)
    mono, _ = train_phone_models(boot, labeled, lex, cfg)
    units, tying, _ = train_senone_models(
        mono, labeled, lex, max_per_state=2, min_count=4.0, config=cfg
    )
    composed = compose_word_models_senone(lex, units, tying, mono)

    dec = ContinuousDecoder(composed, penalty=-100.0)
    pool = ServingSessionPool(composed, num_slots=2)
    sess = pool.open()

    word = words[0]
    speech = corpus.sentence_audio((word,), 2, jitter_seed=3)
    noise = np.random.default_rng(0).normal(0, 20.0, 12000).astype(np.float32)
    audio = np.concatenate([noise[:8000], speech, noise])
    results = []
    for lo in range(0, len(audio), 1600):
        done = pool.feed({sess: audio[lo : lo + 1600]})
        results.extend(done.get(sess, ()))
    assert len(results) == 1
    final = results[0]
    assert final.num_samples > 0

    # Offline parity: the pool decodes the endpointed signal — reconstruct
    # it with the same segmentation machine and predict on those samples.
    from cs304_tpu.audio.capture import Segmentation, SegmentationDone

    seg = Segmentation(stream=None)
    seg.audio_cache.put(audio)
    with pytest.raises(SegmentationDone):
        seg.routine()
    endpointed = seg.result_signal()
    assert final.text == dec.predict(mfcc_batch([endpointed])[0])
