#!/usr/bin/env python
"""Word-tier vs tied-phone-tier: parameters, accuracy, and OOV support.

The reference trains one HMM per word (hidden_markov_model.py:211-410);
models/lexicon.py adds the standard large-vocabulary alternative — a shared
phone inventory + pronunciation lexicon with statistics tied per phone.
This benchmark trains BOTH tiers on the same corpus with the last
--oov-words words HELD OUT of all training data, then measures:

  - parameter counts (the phone tier stays O(phones) as vocabulary grows)
  - in-vocabulary held-out-speaker exact-sequence accuracy (parity check)
  - OOV decoding: sentences containing the held-out words, decodable by the
    phone tier the moment the lexicon lists them — structurally impossible
    for the word tier (no model exists; its OOV accuracy is 0 by
    construction, not measurement)
  - optionally (--biphones) the CONTEXT-DEPENDENT tier (models/biphone.py):
    left-biphone units trained on top of the monophones (full
    re-estimation, or one MAP-smoothing pass with --smooth-tau), composed
    with monophone back-off so the OOV line still runs. Pair with
    --coarticulation (formant glides in the synthesis) and --hard to
    reproduce the measured context-dependence ladder in ROADMAP.md —
    without coarticulation the corpus gives biphones nothing to win.

JSON line per stage; gates at the end unless --no-gates (absolute gates
apply only at default difficulty — --hard runs are difficulty studies).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num-words", type=int, default=30)
    ap.add_argument("--oov-words", type=int, default=3)
    ap.add_argument("--train-speakers", type=int, default=4)
    ap.add_argument("--test-speakers", type=int, default=2)
    ap.add_argument("--takes", type=int, default=3)
    ap.add_argument("--train-sentences", type=int, default=12)
    ap.add_argument("--eval-sentences", type=int, default=10)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--penalty", type=float, default=-100.0)
    ap.add_argument("--coarticulation", type=float, default=0.0,
                    help="formant-glide fraction at phone onsets (0 = the "
                         "legacy piecewise-constant synthesis)")
    ap.add_argument("--anticipatory", type=float, default=0.0,
                    help="formant-glide fraction at phone OFFSETS toward "
                         "the next phone — the cue only triphones model")
    ap.add_argument("--hard", action="store_true",
                    help="hardened corpus degradations (absolute gates are "
                         "then skipped — difficulty study, not a gate run)")
    ap.add_argument("--phones-per-word", type=int, nargs=2, default=(3, 5),
                    metavar=("LO", "HI"))
    ap.add_argument("--biphones", action="store_true",
                    help="also train + evaluate the left-biphone tier")
    ap.add_argument("--triphones", action="store_true",
                    help="also train + evaluate the triphone tier (backs "
                         "off through the biphone tier when both are on)")
    ap.add_argument("--smooth-tau", type=float, default=None,
                    help="with --biphones/--triphones: MAP-smoothing pass "
                         "instead of full unit re-estimation")
    ap.add_argument("--senones", type=int, default=None, metavar="N",
                    help="also train + evaluate the SENONE tier (models/"
                         "senone.py): decision-tree state tying with at "
                         "most N leaves per (phone, state); unseen "
                         "triphones synthesize through the trees")
    ap.add_argument("--senone-min-gain", type=float, default=0.0)
    ap.add_argument("--senone-min-count", type=float, default=8.0)
    ap.add_argument("--tie-triphones", type=int, default=None, metavar="M",
                    help="also train + evaluate the GENERALIZED-triphone "
                         "tier (models/triphone.py:tie_and_train_triphones)"
                         ": data-driven UNIT tying to at most M clusters "
                         "per center phone — the whole-unit-tying baseline "
                         "senones are judged against at matched parameter "
                         "counts")
    ap.add_argument("--seed", type=int, default=5,
                    help="replication seed: drives the train/eval sentence "
                         "draws and every jitter base (the corpus "
                         "vocabulary stays fixed), so K seeds = K "
                         "independent sentence+speech realizations of the "
                         "same task — the noise model behind "
                         "senone_ladder.py's mean +/- stderr rows")
    ap.add_argument("--no-gates", action="store_true")
    return ap


def main() -> None:
    ap = build_parser()
    args = ap.parse_args()
    if args.smooth_tau is not None and not (args.biphones or args.triphones):
        ap.error("--smooth-tau only applies with --biphones/--triphones")
    run(args)


def run(args) -> list:
    """The full tier study; returns the emitted JSON lines (also printed)."""
    lines = []

    def emit(obj):
        lines.append(obj)
        print(json.dumps(obj))

    from cs304_tpu.audio.endpointing import SignalSeparation
    from cs304_tpu.data.wordvocab import make_lexicon, make_word_corpus
    from cs304_tpu.models.decoder import ContinuousDecoder
    from cs304_tpu.models.lexicon import (
        compose_word_models,
        train_phone_models,
        uniform_phone_boot,
    )
    from cs304_tpu.models.train_continuous import (
        ContinuousTrainConfig,
        ContinuousTrainer,
    )
    from cs304_tpu.models.train_kmeans import (
        SegmentalKMeansConfig,
        train_digit_models,
        train_word_hmm,
    )
    from cs304_tpu.ops.mfcc import mfcc_batch

    corpus = make_word_corpus(
        args.num_words, num_train_speakers=args.train_speakers,
        num_test_speakers=args.test_speakers, takes_per_digit=args.takes,
        hard=args.hard, coarticulation=args.coarticulation,
        anticipatory_coarticulation=args.anticipatory,
        phones_per_word=tuple(args.phones_per_word),
    )
    lex = make_lexicon(args.num_words,
                       phones_per_word=tuple(args.phones_per_word))
    labels = corpus.labels
    oov = labels[-args.oov_words:] if args.oov_words else []
    train_words = [l for l in labels if l not in oov]
    oov_phones = {p for w in oov for p in lex[w]}
    covered = oov_phones <= {p for w in train_words for p in lex[w]}
    emit(dict({
        "stage": "setup", "words": len(train_words), "oov": oov,
        "phones": len(lex.phones), "oov_phones_covered": covered,
    }))

    sep = SignalSeparation()
    stripped = {
        l: mfcc_batch(sep.remove_empty_batch(corpus.train_dataset[l]))
        for l in train_words
    }
    raw = {l: mfcc_batch(corpus.train_dataset[l]) for l in train_words}
    noises = [x for x in sep.get_all_noises() if len(x) >= 9 * sep.frame_size]
    silence = train_word_hmm(
        "S", mfcc_batch(noises),
        SegmentalKMeansConfig(num_states=3, max_iterations=12,
                              length_multiple=32),
    ).model

    rng = np.random.default_rng(args.seed)
    sentences = []
    seen = set()
    while len(sentences) < args.train_sentences:
        tr = tuple(str(x) for x in rng.choice(train_words, size=3))
        if tr not in seen:
            seen.add(tr)
            sentences.append(tr)
    sentence_feats = {
        tr: mfcc_batch([
            corpus.sentence_audio(tr, spk, jitter_seed=args.seed * 1000 + k)
            for spk in range(args.train_speakers) for k in range(1)
        ])
        for tr in sentences
    }

    def params_of(models):
        return int(sum(
            m.means.size + m.covariances.size
            + np.isfinite(m.log_a).sum() for m in models.values()
        ))

    # ---- word tier -------------------------------------------------------
    t0 = time.perf_counter()
    word_models = train_digit_models(
        stripped,
        SegmentalKMeansConfig(num_states=5, max_iterations=12,
                              length_multiple=32),
    )
    word_models["S"] = silence
    wt = ContinuousTrainer(
        word_models,
        ContinuousTrainConfig(max_iterations=args.iterations, cov_reg=0.1),
    )
    # Same training data as the phone tier below: the multi-word sentences
    # PLUS the isolated clips as single-word transcripts — the comparison
    # is architecture vs architecture, not data vs data.
    word_labeled = {(w,): raw[w] for w in train_words}
    word_labeled.update(sentence_feats)
    wt.train(word_labeled)
    word_final = wt.models()
    t_word = time.perf_counter() - t0

    # ---- phone tier ------------------------------------------------------
    t0 = time.perf_counter()
    boot = uniform_phone_boot(stripped, lex)
    boot["S"] = silence
    labeled = {(w,): raw[w] for w in train_words}
    labeled.update(sentence_feats)
    phone_final, _ = train_phone_models(
        boot, labeled, lex,
        ContinuousTrainConfig(max_iterations=args.iterations, cov_reg=0.1),
    )
    composed = compose_word_models(lex, phone_final)  # ALL words incl. OOV
    t_phone = time.perf_counter() - t0

    bi_composed = None
    t_bi = None
    bi_units = None
    if args.biphones:
        from cs304_tpu.models.biphone import (
            compose_word_models_biphone,
            train_biphone_models,
        )

        t0 = time.perf_counter()
        bi_units, _ = train_biphone_models(
            phone_final, labeled, lex,
            ContinuousTrainConfig(max_iterations=args.iterations,
                                  cov_reg=0.1),
            smooth_tau=args.smooth_tau,
        )
        # ALL words: OOV pairs back off to the trained monophones.
        bi_composed = compose_word_models_biphone(lex, bi_units, phone_final)
        t_bi = time.perf_counter() - t0

    tri_composed = None
    t_tri = None
    tri_units = None
    if args.triphones:
        from cs304_tpu.models.triphone import (
            compose_word_models_triphone,
            train_triphone_models,
        )

        t0 = time.perf_counter()
        tri_units, _ = train_triphone_models(
            phone_final, labeled, lex,
            ContinuousTrainConfig(max_iterations=args.iterations,
                                  cov_reg=0.1),
            smooth_tau=args.smooth_tau,
        )
        tri_composed = compose_word_models_triphone(
            lex, tri_units, phone_final, biphone_models=bi_units
        )
        t_tri = time.perf_counter() - t0

    tied_composed = None
    t_tied = None
    tied_models = None
    tied_lex = None
    tied_mapping = None
    if args.tie_triphones is not None:
        from cs304_tpu.models.triphone import tie_and_train_triphones

        t0 = time.perf_counter()
        tied_models, tied_lex, tied_mapping = tie_and_train_triphones(
            phone_final, labeled, lex,
            max_per_phone=args.tie_triphones,
            config=ContinuousTrainConfig(max_iterations=args.iterations,
                                         cov_reg=0.1),
        )
        # ALL words: the tied lexicon covers the full vocabulary (unseen
        # contexts fall back to their center monophone's label).
        tied_composed = compose_word_models(tied_lex, tied_models)
        t_tied = time.perf_counter() - t0

    sen_composed = None
    t_sen = None
    sen_units = None
    sen_tying = None
    if args.senones is not None:
        from cs304_tpu.models.senone import (
            compose_word_models_senone,
            train_senone_models,
        )

        t0 = time.perf_counter()
        sen_units, sen_tying, _ = train_senone_models(
            phone_final, labeled, lex,
            max_per_state=args.senones,
            min_gain=args.senone_min_gain,
            min_count=args.senone_min_count,
            config=ContinuousTrainConfig(max_iterations=args.iterations,
                                         cov_reg=0.1),
        )
        # ALL words: unseen triphones synthesize through the trees.
        sen_composed = compose_word_models_senone(
            lex, sen_units, sen_tying, phone_final
        )
        t_sen = time.perf_counter() - t0

    training_line = {
        "stage": "training",
        "word_tier_params": params_of(word_final),
        "phone_tier_params": params_of(
            {p: m for p, m in phone_final.items()}
        ),
        "word_tier_wall_s": round(t_word, 1),
        "phone_tier_wall_s": round(t_phone, 1),
    }
    if bi_units is not None:
        training_line["biphone_tier_params"] = params_of(bi_units)
        training_line["biphone_units"] = sum(
            1 for u in bi_units if u != "S"
        )
        training_line["biphone_tier_wall_s"] = round(t_bi, 1)
    if tri_units is not None:
        training_line["triphone_tier_params"] = params_of(tri_units)
        training_line["triphone_units"] = sum(
            1 for u in tri_units if u != "S"
        )
        training_line["triphone_tier_wall_s"] = round(t_tri, 1)
    if bi_units is not None or tri_units is not None:
        training_line["context_mode"] = (
            "map_smoothed" if args.smooth_tau is not None else "untied"
        )
    if tied_models is not None:
        # Tied-tier parameters: DISTINCT models the tied lexicon reaches
        # (cluster models + back-off monophones) — copies share nothing.
        reachable = {lab for seq in tied_lex.entries.values() for lab in seq}
        training_line["tied_triphone_tier_params"] = params_of(
            {lab: tied_models[lab] for lab in reachable}
        )
        training_line["tied_triphone_clusters"] = len(
            set(tied_mapping.values())
        )
        training_line["tied_triphone_tier_wall_s"] = round(t_tied, 1)
    if sen_units is not None:
        # Senone-tier parameters: distinct senones + one transition matrix
        # per center phone (the materialized per-unit copies share them).
        from cs304_tpu.models.senone import senone_table

        sen_params = senone_table(sen_units, sen_tying)
        d = next(iter(sen_units.values())).dim
        training_line["senone_tier_params"] = int(
            len(sen_params) * (d + d * d)
            + sum(np.isfinite(phone_final[p].log_a).sum()
                  for p in lex.phones)
        )
        training_line["senones"] = sen_tying.num_senones()
        training_line["senone_units"] = sum(
            1 for u in sen_units if u != "S"
        )
        training_line["senone_tier_wall_s"] = round(t_sen, 1)
    emit(training_line)

    # ---- in-vocab eval ---------------------------------------------------
    test_speakers = range(args.train_speakers,
                          args.train_speakers + args.test_speakers)
    truths, clips = [], []
    k = 0
    while len(truths) < args.eval_sentences * len(list(test_speakers)):
        tr = tuple(str(x) for x in rng.choice(train_words, size=3))
        for spk in test_speakers:
            truths.append("".join(tr))
            clips.append(corpus.sentence_audio(tr, spk, jitter_seed=args.seed * 1000 + 200 + k))
        k += 1
    feats = mfcc_batch(clips)
    tiers = [("word_tier", word_final), ("phone_tier", composed)]
    if bi_composed is not None:
        tiers.append(("biphone_tier", bi_composed))
    if tri_composed is not None:
        tiers.append(("triphone_tier", tri_composed))
    if tied_composed is not None:
        tiers.append(("tied_triphone_tier", tied_composed))
    if sen_composed is not None:
        tiers.append(("senone_tier", sen_composed))
    accs = {}
    for name, models in tiers:
        dec = ContinuousDecoder(models, penalty=args.penalty)
        preds = dec.predict_batch(feats)
        accs[name] = float(np.mean([p == t for p, t in zip(preds, truths)]))
    emit(dict({
        "stage": "in_vocab",
        "utterances": len(feats),
        **{f"{name}_acc": round(a, 4) for name, a in accs.items()},
    }))

    # ---- OOV eval (phone tier only; word tier has no model AT ALL) -------
    oov_acc = None
    if oov:
        truths2, clips2 = [], []
        for k in range(args.eval_sentences):
            tr = (str(rng.choice(oov)), str(rng.choice(train_words)),
                  str(rng.choice(oov)))
            for spk in test_speakers:
                truths2.append("".join(tr))
                clips2.append(
                    corpus.sentence_audio(tr, spk, jitter_seed=args.seed * 1000 + 300 + k)
                )
        feats2 = mfcc_batch(clips2)
        dec = ContinuousDecoder(composed, penalty=args.penalty)
        preds2 = dec.predict_batch(feats2)
        oov_acc = float(np.mean([p == t for p, t in zip(preds2, truths2)]))
        oov_wer_pairs = [
            ([t[i:i+3] for i in range(0, len(t), 3)],
             [p[i:i+3] for i in range(0, len(p), 3)])
            for t, p in zip(truths2, preds2)
        ]
        from cs304_tpu.reporting.metrics import corpus_wer

        oov_line = {
            "stage": "oov",
            "utterances": len(clips2),
            "phone_tier_oov_exact": round(oov_acc, 4),
            "phone_tier_oov_wer": round(corpus_wer(oov_wer_pairs)["wer"], 4),
            "word_tier_oov_exact": 0.0,
            "note": "word tier cannot express unseen words — 0 by "
                    "construction",
        }
        for name, m in (("biphone", bi_composed), ("triphone", tri_composed),
                        ("tied_triphone", tied_composed),
                        ("senone", sen_composed)):
            if m is None:
                continue
            preds_cd = ContinuousDecoder(
                m, penalty=args.penalty
            ).predict_batch(feats2)
            oov_line[f"{name}_tier_oov_exact"] = round(float(np.mean(
                [p == t for p, t in zip(preds_cd, truths2)]
            )), 4)
        if sen_composed is not None:
            # Ablation isolating TREE SYNTHESIS: the same trained senone
            # units with unseen contexts synthesized through the trees
            # instead of the default monophone back-off (the default IS
            # back-off because this ablation measured synthesis WORSE at
            # every corpus scale tried — see senone_unit_table).
            from cs304_tpu.models.senone import senone_unit_table

            _, n_synth = senone_unit_table(
                lex, sen_units, sen_tying, phone_final,
                unseen="synthesize",
            )
            sen_synth = compose_word_models_senone(
                lex, sen_units, sen_tying, phone_final,
                unseen="synthesize",
            )
            preds_syn = ContinuousDecoder(
                sen_synth, penalty=args.penalty
            ).predict_batch(feats2)
            oov_line["senone_tier_oov_exact_tree_synthesis"] = round(
                float(np.mean(
                    [p == t for p, t in zip(preds_syn, truths2)]
                )), 4)
            oov_line["senone_synthesized_units"] = int(n_synth)
        emit(oov_line)

    emit(dict({
        "metric": f"phone-tier OOV exact-sequence accuracy "
                  f"({len(train_words)}+{len(oov)} words)",
        "value": oov_acc if oov_acc is not None else accs["phone_tier"],
        "unit": "accuracy",
        **{f"in_vocab_{name}": round(a, 4) for name, a in accs.items()},
    }))
    if not args.no_gates:
        if args.hard or args.coarticulation > 0 or args.anticipatory > 0:
            emit(dict({
                "gates": "skipped",
                "note": "--hard/--coarticulation/--anticipatory are "
                        "difficulty studies; absolute gates apply at "
                        "default difficulty only",
            }))
        else:
            assert accs["phone_tier"] >= 0.85, accs
            assert oov_acc is None or oov_acc >= 0.3, oov_acc
            for tier in ("biphone_tier", "triphone_tier",
                         "tied_triphone_tier", "senone_tier"):
                if tier in accs:
                    assert accs[tier] >= 0.85, accs
            emit(dict({"gates": "pass"}))
    return lines


if __name__ == "__main__":
    main()
