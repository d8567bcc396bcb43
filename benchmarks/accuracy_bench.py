#!/usr/bin/env python
"""Accuracy benchmark: the full reference pipeline on the synthetic corpus.

Runs project3 boot -> project5 silence model -> project6 embedded training ->
continuous decoding, and prints exact-sequence accuracy per digit count and
split as JSON lines. This is the accuracy analogue of bench.py (the
reference's only published number is 85% exact-sequence accuracy after
continuous training, its README.md:9). Takes several minutes end to end.

Default corpus is the *hardened* synthetic corpus (SyntheticTIDigits.hard():
10-20 dB SNR, per-speaker channel coloration, wide speaker spread, confusable
templates), calibrated so accuracy on held-out speakers lands below saturation
— a gate that cannot fail is not a gate. `--easy` reproduces the legacy
near-clean corpus (saturates at 100%).

Config divergence from the reference (explicit, also noted in
ContinuousTrainConfig): embedded training here uses cov_reg=0.1 by default
instead of the reference's 0.001 (hidden_markov_model.py:341-345). The
synthetic corpus has far fewer takes per transcript than real TI-Digits, so
per-state covariances need heavier regularization to stay well-conditioned;
on a real-sized corpus use the reference's 0.001.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cs304_tpu.audio.endpointing import SignalSeparation
from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.data.ti_digits import DIGIT_LABELS
from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.train_continuous import ContinuousTrainConfig, ContinuousTrainer
from cs304_tpu.models.train_kmeans import (
    SegmentalKMeansConfig,
    train_digit_models,
    train_word_hmm,
)
from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_batch

# North-star gates (reference README.md:9: 85% exact-sequence on TI-Digits
# test). Held-out-speaker gate mirrors that; seen-speaker decoding should
# stay above it.
GATE_TEST = 0.85
GATE_TRAIN = 0.90


def prepare(corpus: SyntheticTIDigits, mcfg: MFCCConfig):
    """Shared front half of every config: silence-stripped isolated k-means
    boot models + the labeled embedded-training features. Factored out so
    --ladder runs its five configs off ONE boot/feature pass per front-end."""
    sep = SignalSeparation()
    feats = {
        l: mfcc_batch(sep.remove_empty_batch(corpus.train_dataset[l]), cfg=mcfg)
        for l in DIGIT_LABELS
    }
    boot = train_digit_models(
        feats, SegmentalKMeansConfig(num_states=5, max_iterations=15,
                                     length_multiple=32),
    )
    noises = [n for n in sep.get_all_noises() if len(n) >= 9 * sep.frame_size]
    boot["S"] = train_word_hmm(
        "S", mfcc_batch(noises, cfg=mcfg),
        SegmentalKMeansConfig(num_states=3, max_iterations=15, length_multiple=32),
    ).model

    labeled = {}
    for n in (2, 4, 7):
        for tr, utts in corpus.train_dataset.get_all_n_digits(n).items():
            labeled[tr] = mfcc_batch(utts, cfg=mcfg)
    return boot, labeled


def evaluate(decoder: ContinuousDecoder, corpus: SyntheticTIDigits,
             mcfg: MFCCConfig, known_count: bool = False,
             min_duration: int | None = None) -> dict:
    """Exact-sequence accuracy per (digit count, split) + pooled WER."""
    from cs304_tpu.reporting.metrics import corpus_wer

    results = {}
    wer_pairs = {"train": [], "test": []}
    for n in (2, 4, 7):
        for split, ds in (("train", corpus.train_dataset),
                          ("test", corpus.test_dataset)):
            truths, clips = [], []
            for tr, utts in ds.get_all_n_digits(n).items():
                for u in utts:
                    truths.append(tr)
                    clips.append(u)
            feats = mfcc_batch(clips, cfg=mcfg)
            if known_count:
                preds = decoder.predict_batch_counted(feats, n)
            elif min_duration is not None:
                preds = decoder.predict_batch_duration(
                    feats, min_duration=min_duration
                )
            else:
                preds = decoder.predict_batch(feats)
            acc = float(np.mean([p == t for p, t in zip(preds, truths)]))
            results[f"exact_seq_acc_n{n}_{split}"] = round(acc, 4)
            wer_pairs[split] += [
                (list(t), list(p)) for t, p in zip(truths, preds)
            ]
    for split, pairs in wer_pairs.items():
        results[f"wer_{split}"] = round(corpus_wer(pairs)["wer"], 4)
    return results


def run(corpus: SyntheticTIDigits, max_iterations: int = 5,
        cov_reg: float = 0.1, penalty: float = -100.0,
        update: str = "viterbi", gmm_mixtures: int = 0,
        known_count: bool = False, min_duration: int | None = None,
        mcfg: MFCCConfig = MFCCConfig(), prepared=None) -> dict:
    boot, labeled = prepared if prepared is not None else prepare(corpus, mcfg)
    trainer = ContinuousTrainer(
        boot, ContinuousTrainConfig(max_iterations=max_iterations,
                                    cov_reg=cov_reg, update=update)
    )
    iters = trainer.train(labeled)
    final_models = trainer.models()
    if gmm_mixtures > 1:
        from cs304_tpu.models.train_continuous_gmm import (
            GMMContinuousTrainConfig,
            GMMContinuousTrainer,
            promote_to_gmm,
        )

        gtr = GMMContinuousTrainer(
            promote_to_gmm(final_models, gmm_mixtures),
            GMMContinuousTrainConfig(max_iterations=max_iterations,
                                     cov_reg=cov_reg),
        )
        gtr.train(labeled)
        final_models = gtr.models()
    decoder = ContinuousDecoder(final_models, penalty=penalty)

    results = {"embedded_iterations": iters}
    results.update(evaluate(decoder, corpus, mcfg, known_count=known_count,
                            min_duration=min_duration))
    return results, decoder, final_models


def lattice_stats(decoder, corpus, n_digits: int = 4,
                  beam: float = 40.0, mcfg: MFCCConfig = MFCCConfig()) -> dict:
    """Lattice quality on the held-out split: forward-lattice oracle WER vs
    the 1-best WER, with mean arc counts (density). The oracle should sit
    at or below the 1-best error — that margin is what downstream
    rescoring could recover. Features are bucketed to 128-frame multiples
    (length-masked passes) so the sweep compiles once per bucket."""
    comp = decoder.composite
    truths, feats_list = [], []
    for tr, utts in corpus.test_dataset.get_all_n_digits(n_digits).items():
        for u in utts:
            truths.append(tr)
            feats_list.append(np.asarray(mfcc_batch([u], cfg=mcfg)[0]))
    from cs304_tpu.ops.lattice import forward_lattice
    from cs304_tpu.reporting.metrics import corpus_wer

    preds = decoder.predict_batch(feats_list)
    onebest = corpus_wer([(list(t), list(p)) for t, p in zip(truths, preds)])

    def emissions(padded):
        # Computed ONCE per utterance and passed to every second-pass
        # consumer (each would otherwise recompute it internally). On a GMM
        # checkpoint the composite's own log_likelihoods would be the
        # mixture-0 view and the oracle-vs-1-best comparison would mix
        # acoustic models.
        import jax.numpy as jnp

        if decoder._gmm is None:
            return comp.log_likelihoods(jnp.asarray(padded))
        from cs304_tpu.ops.gaussian import gmm_log_pdf, make_gmm_params

        means, covs, weights = decoder._gmm
        params = make_gmm_params(
            jnp.asarray(means), jnp.asarray(covs), jnp.asarray(weights)
        )
        return gmm_log_pdf(params, jnp.asarray(padded))

    oracle_edits_total = 0
    ref_words = 0
    arc_counts = []
    unreachable = 0
    for tr, f in zip(truths, feats_list):
        t = f.shape[0]
        t_pad = -(-t // 128) * 128
        padded = np.zeros((t_pad, f.shape[1]), np.float32)
        padded[:t] = f
        lat = forward_lattice(
            comp, padded, beam=beam, length=t, log_b=emissions(padded)
        )
        arc_counts.append(len(lat.arcs))
        edits = lat.oracle_edits(list(tr))
        if edits is None:
            unreachable += 1
            edits = len(tr)  # count a dead lattice as all-wrong
        oracle_edits_total += edits
        ref_words += len(tr)
    return {
        "lattice_beam": beam,
        "lattice_n_digits": n_digits,
        "lattice_utts": len(truths),
        "lattice_mean_arcs": round(float(np.mean(arc_counts)), 1),
        "lattice_oracle_wer_test": round(oracle_edits_total / ref_words, 4),
        "lattice_onebest_wer_test": round(onebest["wer"], 4),
        "lattice_unreachable": unreachable,
    }


def rescore_stats(decoder, models, corpus, n_digits: int = 4,
                  beam: float = 40.0, lm_weight: float = 1.0,
                  mcfg: MFCCConfig = MFCCConfig()) -> dict:
    """Measured WER deltas of every second-pass method on the held-out split
    (VERDICT r2 #4): flat 1-best vs first-pass bigram decoding vs lattice
    LM rescoring (ops/rescore.lattice_rescore) vs n-best LM rescoring vs
    confusion-network decoding vs frame-level consensus.

    LM conventions (ops/lm.py docstring): edge-level methods (first-pass,
    lattice rescore) use the silence-interleaved bigram matching the decode
    topology, as project5_test_ndigits --bigram-lm does; sequence-level
    n-best rescoring uses the plain bigram (silence never appears in the
    hypothesis strings it scores)."""
    import jax.numpy as jnp

    from cs304_tpu.models.decoder import ContinuousDecoder as _Dec
    from cs304_tpu.ops.lattice import consensus_decode, forward_lattice
    from cs304_tpu.ops.lm import (
        rescore_nbest,
        train_word_bigram,
        train_word_trigram,
    )
    from cs304_tpu.ops.rescore import (
        cn_decode,
        confusion_network,
        lattice_rescore,
        lattice_rescore_trigram,
    )
    from cs304_tpu.reporting.metrics import corpus_wer

    comp = decoder.composite
    vocab = set(comp.labels)
    transcripts = [
        t for t in sorted(corpus.train_dataset.labels) if set(t) <= vocab
    ]
    bigram_edge = train_word_bigram(
        transcripts, sorted(comp.labels), insert_silence="S" in vocab
    )
    bigram_seq = train_word_bigram(
        transcripts, sorted(l for l in comp.labels if l != "S")
    )
    trigram_edge = train_word_trigram(
        transcripts, sorted(comp.labels), insert_silence="S" in vocab
    )
    trigram_seq = train_word_trigram(
        transcripts, sorted(l for l in comp.labels if l != "S")
    )

    truths, feats_list = [], []
    for tr, utts in corpus.test_dataset.get_all_n_digits(n_digits).items():
        for u in utts:
            truths.append(tr)
            feats_list.append(np.asarray(mfcc_batch([u], cfg=mcfg)[0]))

    def emissions(padded):
        # Once per utterance; every consumer below takes log_b.
        if decoder._gmm is None:
            return comp.log_likelihoods(jnp.asarray(padded))
        from cs304_tpu.ops.gaussian import gmm_log_pdf, make_gmm_params

        means, covs, weights = decoder._gmm
        return gmm_log_pdf(
            make_gmm_params(jnp.asarray(means), jnp.asarray(covs),
                            jnp.asarray(weights)),
            jnp.asarray(padded),
        )

    preds = {
        "onebest": decoder.predict_batch(feats_list),
        "firstpass_lm": _Dec(
            models, penalty=decoder.composite.penalty,
            bigram=bigram_edge, lm_weight=lm_weight,
        ).predict_batch(feats_list),
        "lattice_lm": [], "lattice_lm3": [], "nbest_lm": [],
        "nbest_lm3": [], "cn": [], "consensus": [],
    }
    unreachable = 0
    for f in feats_list:
        t = f.shape[0]
        t_pad = -(-t // 128) * 128
        padded = np.zeros((t_pad, f.shape[1]), np.float32)
        padded[:t] = f
        log_b = emissions(padded)
        lat = forward_lattice(comp, padded, beam=beam, length=t, log_b=log_b)
        try:
            _sc, text, _arcs = lattice_rescore(
                comp, lat, features=padded, log_b=log_b,
                bigram=bigram_edge, lm_weight=lm_weight,
            )
        except ValueError:
            unreachable += 1
            text = ""
        preds["lattice_lm"].append(text)
        try:
            _sc3, text3, _a3 = lattice_rescore_trigram(
                comp, lat, trigram_edge, features=padded, log_b=log_b,
                lm_weight=lm_weight,
            )
        except ValueError:
            text3 = ""
        preds["lattice_lm3"].append(text3)
        hyps = decoder.predict_nbest(f, n=8)
        preds["nbest_lm"].append(
            rescore_nbest(hyps, bigram_seq, lm_weight)[0][1]
        )
        preds["nbest_lm3"].append(
            rescore_nbest(hyps, trigram_seq, lm_weight)[0][1]
        )
        preds["cn"].append(cn_decode(confusion_network(
            comp, padded, beam=beam, log_b=log_b, length=t
        )))
        preds["consensus"].append(
            consensus_decode(comp, padded, log_b=log_b, length=t)
        )
    out = {
        "rescore_n_digits": n_digits,
        "rescore_utts": len(truths),
        "rescore_beam": beam,
        "rescore_lm_weight": lm_weight,
        "rescore_unreachable": unreachable,
    }
    for name, p in preds.items():
        out[f"rescore_{name}_wer_test"] = round(corpus_wer(
            [(list(t), list(x)) for t, x in zip(truths, p)]
        )["wer"], 4)
        out[f"rescore_{name}_acc_test"] = round(float(np.mean(
            [x == t for t, x in zip(truths, p)]
        )), 4)
    return out


def adaptation_study(models, corpus: SyntheticTIDigits, mcfg: MFCCConfig,
                     n_enroll: int = 3, tau: float = 20.0,
                     penalty: float = -100.0, shift: float = 0.0) -> dict:
    """Per-held-out-speaker MAP adaptation gain (models/adapt.py).

    For each test speaker: MAP-adapt the trained models on n_enroll fresh
    transcribed sentences from that speaker (jitter seeds disjoint from every
    split), then decode a fresh per-speaker eval set (4- and 7-digit
    transcripts) with the speaker-independent vs the adapted models.

    shift > 0 adds a fixed random per-speaker offset of that scale to the 13
    STATIC cepstra (a linear channel is a near-constant static-cepstral
    offset; the deltas of a constant are zero) of both enrollment and eval —
    the mismatch scenario adaptation exists for. Measured at shift=1.2,
    tau=5: exact 37.5%->46.9%, WER 0.199->0.148. With shift=0 the held-out
    speakers' channels are inside the training distribution (the trainer saw
    6 speakers' colorations), so there is little to absorb and adaptation is
    measured neutral-to-slightly-negative (variance for no bias win); prefer
    a larger tau there, or simply don't adapt in-distribution speakers."""
    from cs304_tpu.models.adapt import map_adapt

    base_decoder = ContinuousDecoder(models, penalty=penalty)
    enroll_transcripts = ["1234", "567Z", "89O2", "Z5O1", "3O86"][:n_enroll]
    eval_transcripts = [
        tr for n in (4, 7)
        for tr in corpus.test_dataset.get_all_n_digits(n)
    ]
    test_speakers = range(
        corpus.num_train_speakers,
        corpus.num_train_speakers + corpus.num_test_speakers,
    )
    per_speaker = {}
    base_hits = adapted_hits = total = 0
    for spk in test_speakers:
        if shift > 0:
            off = np.zeros(39, np.float32)
            off[:13] = np.random.default_rng(spk).normal(0, shift, 13)
        else:
            off = 0.0
        enroll = {
            tr: [
                np.asarray(f) + off for f in mfcc_batch(
                    [corpus.sentence_audio(tr, spk, jitter_seed=9001 + i)],
                    cfg=mcfg,
                )
            ]
            for i, tr in enumerate(enroll_transcripts)
        }
        adapted = map_adapt(models, enroll, tau=tau)
        adapted_decoder = ContinuousDecoder(adapted, penalty=penalty)
        truths, clips = [], []
        for tr in eval_transcripts:
            for take in range(2):
                truths.append(tr)
                clips.append(
                    corpus.sentence_audio(tr, spk, jitter_seed=555 + take)
                )
        feats = [np.asarray(f) + off for f in mfcc_batch(clips, cfg=mcfg)]
        base_preds = base_decoder.predict_batch(feats)
        adapted_preds = adapted_decoder.predict_batch(feats)
        b = sum(p == t for p, t in zip(base_preds, truths))
        a = sum(p == t for p, t in zip(adapted_preds, truths))
        per_speaker[spk] = {
            "base_acc": round(b / len(truths), 4),
            "adapted_acc": round(a / len(truths), 4),
        }
        base_hits += b
        adapted_hits += a
        total += len(truths)
    return {
        "adapt_n_enroll": n_enroll,
        "adapt_tau": tau,
        "adapt_shift": shift,
        "adapt_eval_utts_per_speaker": total // max(len(per_speaker), 1),
        "adapt_per_speaker": per_speaker,
        "adapt_base_acc": round(base_hits / total, 4),
        "adapt_adapted_acc": round(adapted_hits / total, 4),
    }


# Per-config ladder gates: the round-2 measured held-out values (README
# "accuracy ladder": 93.1 / 94.5 / 95.8 / 97.2 / 100%) minus ~2-3 points of
# headroom for cross-backend f32 drift. A flagship config regressing below
# its OWN gate now fails the one-command ladder run, not just the 85% floor.
LADDER_GATES = {
    "viterbi_k1": 0.90,
    "baum_welch": 0.92,
    "gmm_k2": 0.93,
    "gmm_k2_known_count": 0.95,
    "cmn": 0.99,
}


def _mean_test_acc(results: dict) -> float:
    return float(np.mean([
        v for k, v in results.items()
        if k.startswith("exact_seq") and k.endswith("_test")
    ]))


def ladder(corpus: SyntheticTIDigits, no_gates: bool = False) -> None:
    """One command, five gates: run every flagship config of the README
    accuracy ladder and gate each at its own measured level (VERDICT r2 #5).
    Shares one boot/feature pass per front-end; the GMM stage refines the
    Viterbi stage's models (exactly what `--gmm-mixtures 2` does internally)
    and known-count reuses the GMM decoder."""
    from cs304_tpu.models.train_continuous_gmm import (
        GMMContinuousTrainConfig,
        GMMContinuousTrainer,
        promote_to_gmm,
    )

    mcfg = MFCCConfig()
    prep = prepare(corpus, mcfg)
    labeled = prep[1]
    accs: dict = {}

    r_vit, _, m_vit = run(corpus, mcfg=mcfg, prepared=prep)
    accs["viterbi_k1"] = _mean_test_acc(r_vit)
    print(json.dumps({"config": "viterbi_k1", **r_vit}))
    # Anti-saturation: the hardened corpus must keep the baseline config
    # below 100% somewhere, or the ladder's gates are vacuous.
    vit_all = [v for k, v in r_vit.items() if k.startswith("exact_seq")]
    if not no_gates:
        assert min(vit_all) < 1.0, (
            "hardened corpus saturated at 100% everywhere — raise difficulty"
        )

    r_bw, _, _ = run(corpus, update="baum_welch", mcfg=mcfg, prepared=prep)
    accs["baum_welch"] = _mean_test_acc(r_bw)
    print(json.dumps({"config": "baum_welch", **r_bw}))

    gtr = GMMContinuousTrainer(
        promote_to_gmm(m_vit, 2),
        GMMContinuousTrainConfig(max_iterations=5, cov_reg=0.1),
    )
    gtr.train(labeled)
    gmm_decoder = ContinuousDecoder(gtr.models(), penalty=-100.0)
    r_gmm = evaluate(gmm_decoder, corpus, mcfg)
    accs["gmm_k2"] = _mean_test_acc(r_gmm)
    print(json.dumps({"config": "gmm_k2", **r_gmm}))

    r_kc = evaluate(gmm_decoder, corpus, mcfg, known_count=True)
    accs["gmm_k2_known_count"] = _mean_test_acc(r_kc)
    print(json.dumps({"config": "gmm_k2_known_count", **r_kc}))

    mcfg_cmn = MFCCConfig(normalization="cmn")
    r_cmn, _, _ = run(corpus, mcfg=mcfg_cmn)
    accs["cmn"] = _mean_test_acc(r_cmn)
    print(json.dumps({"config": "cmn", **r_cmn}))

    failures = {
        k: (round(accs[k], 4), LADDER_GATES[k])
        for k in LADDER_GATES if accs[k] < LADDER_GATES[k]
    }
    print(json.dumps({
        "gates": ("skipped" if no_gates
                  else "fail" if failures else "pass"),
        "ladder": {k: round(v, 4) for k, v in accs.items()},
        "gate_levels": LADDER_GATES,
    }))
    if not no_gates:
        assert not failures, f"ladder gates failed (got, gate): {failures}"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ladder", action="store_true",
                    help="run ALL five flagship configs (viterbi K=1, "
                         "baum_welch, GMM K=2, GMM+known-count, CMN) and "
                         "gate each at its own measured level")
    ap.add_argument("--easy", action="store_true",
                    help="legacy near-clean corpus (saturates at 100%%)")
    ap.add_argument("--no-gates", action="store_true",
                    help="print results without asserting the accuracy gates")
    ap.add_argument("--update", default="viterbi",
                    choices=["viterbi", "baum_welch"],
                    help="embedded-training statistics (fused either way)")
    ap.add_argument("--gmm-mixtures", type=int, default=0,
                    help="refine with K-mixture embedded GMM training after "
                         "the K=1 stage before decoding")
    ap.add_argument("--known-count", action="store_true",
                    help="decode each n-digit split constrained to exactly "
                         "n words (word-count automaton)")
    ap.add_argument("--min-duration", type=int, default=0, metavar="N",
                    help="decode with explicit state-duration floors: every "
                         "word state must persist >= N frames "
                         "(ops/viterbi_duration.py; 0 = unconstrained)")
    ap.add_argument("--lattice-stats", action="store_true",
                    help="also measure forward-lattice oracle WER and arc "
                         "density on the held-out 4-digit split")
    ap.add_argument("--rescore-stats", action="store_true",
                    help="also measure WER of every second-pass method on "
                         "the held-out 4-digit split: first-pass bigram, "
                         "lattice LM rescoring, n-best rescoring, "
                         "confusion-network decode, consensus")
    ap.add_argument("--lm-weight", type=float, default=1.0,
                    help="LM weight for --rescore-stats")
    ap.add_argument("--adapt", type=int, default=0, metavar="N",
                    help="also measure per-held-out-speaker MAP adaptation "
                         "with N enrollment sentences (models/adapt.py)")
    ap.add_argument("--adapt-tau", type=float, default=20.0)
    ap.add_argument("--adapt-shift", type=float, default=0.0,
                    help="inject an unseen per-speaker channel offset of "
                         "this scale into the adaptation study (the mismatch "
                         "scenario adaptation exists for)")
    ap.add_argument("--normalization", default="per_frame",
                    choices=["per_frame", "cmn", "cmvn"],
                    help="front-end normalization: per_frame (reference "
                         "quirk), cmn (per-utterance mean subtraction — "
                         "cancels channel coloration), cmvn (mean+variance; "
                         "measured to collapse embedded training: whitens "
                         "away the level cues the silence model needs)")
    args = ap.parse_args()

    mk = SyntheticTIDigits if args.easy else SyntheticTIDigits.hard
    corpus = mk(
        num_train_speakers=6, num_test_speakers=2, takes_per_digit=3,
        with_sentences=True,
    )
    if args.ladder:
        if args.easy:
            raise SystemExit("--ladder gates are calibrated to the hardened "
                             "corpus; drop --easy")
        ladder(corpus, no_gates=args.no_gates)
        return
    mcfg = MFCCConfig(normalization=args.normalization)
    results, decoder, final_models = run(
        corpus, update=args.update, gmm_mixtures=args.gmm_mixtures,
        known_count=args.known_count,
        min_duration=args.min_duration or None, mcfg=mcfg,
    )
    if args.known_count:
        results["known_count"] = True
    if args.min_duration:
        results["min_duration"] = args.min_duration
    if args.lattice_stats:
        results.update(lattice_stats(decoder, corpus, mcfg=mcfg))
    if args.rescore_stats:
        results.update(rescore_stats(
            decoder, final_models, corpus, lm_weight=args.lm_weight,
            mcfg=mcfg,
        ))
    if args.adapt > 0:
        if args.gmm_mixtures > 1:
            raise SystemExit("--adapt supports single-Gaussian models "
                             "(adapt first, then promote)")
        results.update(adaptation_study(
            final_models, corpus, mcfg,
            n_enroll=args.adapt, tau=args.adapt_tau, shift=args.adapt_shift,
        ))
    results["corpus"] = "easy" if args.easy else "hard"
    results["normalization"] = mcfg.normalization
    results["update"] = args.update
    if args.gmm_mixtures > 1:
        results["gmm_mixtures"] = args.gmm_mixtures
    print(json.dumps(results))

    if args.no_gates:
        return
    test_accs = [v for k, v in results.items() if k.endswith("_test")
                 and k.startswith("exact_seq") and isinstance(v, float)]
    train_accs = [v for k, v in results.items() if k.endswith("_train")
                  and k.startswith("exact_seq") and isinstance(v, float)]
    overall_test = float(np.mean(test_accs))
    overall_train = float(np.mean(train_accs))
    assert overall_test >= GATE_TEST, (
        f"held-out exact-sequence accuracy {overall_test:.2%} < {GATE_TEST:.0%}"
    )
    assert overall_train >= GATE_TRAIN, (
        f"seen-speaker exact-sequence accuracy {overall_train:.2%} < {GATE_TRAIN:.0%}"
    )
    if not args.easy and args.normalization == "per_frame":
        # A saturated gate cannot regress: the hardened corpus must keep at
        # least one split below 100% under the reference-parity front-end.
        # (CMN legitimately saturates it — the corpus's main difficulty is
        # channel coloration, which mean subtraction cancels exactly; the
        # measured ladder is per_frame 93.1% -> cmn 100% held-out.)
        assert min(test_accs + train_accs) < 1.0, (
            "hardened corpus saturated at 100% everywhere — raise difficulty"
        )
    print(json.dumps({
        "gates": "pass",
        "overall_test": round(overall_test, 4),
        "overall_train": round(overall_train, 4),
    }))


if __name__ == "__main__":
    main()
