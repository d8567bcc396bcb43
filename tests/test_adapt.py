"""MAP speaker adaptation (models/adapt.py).

Key behavioural gate: a constant cepstral-domain shift applied to a
speaker's features breaks (or strains) the speaker-independent decode;
MAP-adapting on ONE shifted enrollment sentence must recover it, while
barely moving states the enrollment never visited.
"""
import numpy as np
import pytest

from cs304_tpu.models.adapt import map_adapt
from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.ops.mfcc import mfcc_batch


def _offset(scale, seed=42):
    """A fixed random offset on the 13 STATIC cepstra (the physical channel
    model: a linear channel is a near-constant static-cepstral offset and
    the deltas of a constant are zero). A uniform all-dim shift would be
    invisible — it degrades every word model's likelihood equally, so the
    argmax structure survives (measured in round 2)."""
    off = np.zeros(39, np.float32)
    off[:13] = np.random.default_rng(seed).normal(0, scale, 13)
    return off


def test_recovers_shifted_speaker(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    decoder = ContinuousDecoder(models, penalty=-100.0)

    enroll_raw = {
        tr: mfcc_batch(
            [corpus.sentence_audio(tr, 0, jitter_seed=t) for t in (0, 1)]
        )
        for tr in ("186Z", "375", "54321")
    }
    eval_truth = ["186Z", "186Z", "375", "375", "54321", "54321"]
    eval_raw = mfcc_batch(
        [corpus.sentence_audio(t, 0, jitter_seed=2 + i % 2)
         for i, t in enumerate(eval_truth)]
    )

    def errs(preds):
        return sum(p != t for p, t in zip(preds, eval_truth))

    # Escalate the channel offset. Adaptation has an operating window: at
    # mild offsets the baseline doesn't break (nothing to recover); at
    # extreme ones even the topology-constrained forced alignment collapses,
    # so the enrollment statistics themselves are garbage. The capability
    # gate: there exists a breaking offset where adaptation reduces errors.
    # (tau=1: six clean enrollment sentences per speaker dominate the prior —
    # probed on this exact fixture: scale 3.0 recovers 3 errors to 0.)
    broke = False
    outcomes = []
    for scale in (2.5, 3.0, 3.5):
        off = _offset(scale)
        eval_feats = [np.asarray(f) + off for f in eval_raw]
        base_errs = errs(decoder.predict_batch(eval_feats))
        if base_errs < 2:
            continue
        broke = True
        enroll = {
            tr: [np.asarray(f) + off for f in feats]
            for tr, feats in enroll_raw.items()
        }
        adapted = map_adapt(models, enroll, tau=1.0)
        adapted_errs = errs(ContinuousDecoder(
            adapted, penalty=-100.0
        ).predict_batch(eval_feats))
        outcomes.append((scale, base_errs, adapted_errs))
        if adapted_errs < base_errs:
            return
    assert broke, "no offset up to scale 3.5 broke the unadapted decode"
    pytest.fail(f"adaptation never reduced errors: {outcomes}")


def test_unseen_states_stay_near_prior(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    enroll = {"12": mfcc_batch(
        [corpus.sentence_audio("12", 0, jitter_seed=0)]
    )}
    adapted = map_adapt(models, enroll, tau=20.0)
    # Words absent from the enrollment transcript are untouched (count 0).
    for label in ("7", "9", "O"):
        np.testing.assert_allclose(
            adapted[label].means, models[label].means, atol=1e-6
        )
    # Enrolled words moved; so did silence (adapted by default — measured
    # necessary: words moving while silence stays skews the boundary
    # competition, see map_adapt's docstring).
    assert not np.allclose(adapted["1"].means, models["1"].means, atol=1e-4)
    assert not np.allclose(adapted["S"].means, models["S"].means, atol=1e-4)
    # adapt_silence=False pins silence to the prior.
    frozen = map_adapt(models, enroll, tau=20.0, adapt_silence=False)
    np.testing.assert_allclose(frozen["S"].means, models["S"].means)
    # Covariances and transitions are never adapted.
    np.testing.assert_allclose(
        adapted["1"].covariances, models["1"].covariances
    )
    np.testing.assert_allclose(adapted["1"].log_a, models["1"].log_a)


def test_tau_limits(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    enroll = {"375": mfcc_batch(
        [corpus.sentence_audio("375", 0, jitter_seed=0)]
    )}
    # Huge tau -> prior wins; the adapted means barely move.
    heavy = map_adapt(models, enroll, tau=1e6)
    np.testing.assert_allclose(
        heavy["3"].means, models["3"].means, atol=1e-2
    )
    # Small tau moves further than large tau (monotone in tau).
    light = map_adapt(models, enroll, tau=1.0)
    mid = map_adapt(models, enroll, tau=50.0)
    d_light = np.abs(light["3"].means - models["3"].means).sum()
    d_mid = np.abs(mid["3"].means - models["3"].means).sum()
    assert d_light > d_mid


def test_self_adapt_mild_mismatch(trained_system):
    """Unsupervised adaptation in its operating envelope: a mild channel
    offset (decode mostly right), pseudo-labels from the decoder's own
    confident predictions, errors go down."""
    from cs304_tpu.models.adapt import self_adapt

    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    decoder = ContinuousDecoder(models, penalty=-100.0)

    eval_truth = ["186Z", "186Z", "375", "375", "54321", "54321",
                  "12", "12", "4Z", "9O2"]
    eval_raw = mfcc_batch(
        [corpus.sentence_audio(t, 0, jitter_seed=2 + i % 2)
         for i, t in enumerate(eval_truth)]
    )
    unlabeled_raw = mfcc_batch(
        [corpus.sentence_audio(t, 0, jitter_seed=7 + i)
         for i, t in enumerate(["375", "186Z", "54321", "12", "9O2", "4Z"])]
    )

    def errs(preds):
        return sum(p != t for p, t in zip(preds, eval_truth))

    improved = False
    for scale in (2.0, 2.5):
        off = _offset(scale)
        eval_feats = [np.asarray(f) + off for f in eval_raw]
        base_errs = errs(decoder.predict_batch(eval_feats))
        if base_errs == 0:
            continue
        adapted, kept = self_adapt(
            models, [np.asarray(f) + off for f in unlabeled_raw]
        )
        assert kept >= 3  # confident pseudo-labels survive the filter
        adapted_errs = errs(ContinuousDecoder(
            adapted, penalty=-100.0
        ).predict_batch(eval_feats))
        assert adapted_errs <= base_errs, (scale, base_errs, adapted_errs)
        improved = improved or adapted_errs < base_errs
    assert improved, "self-adaptation never reduced errors in its envelope"

    # Nothing clears an impossible confidence bar: models pass through.
    same, kept = self_adapt(models, unlabeled_raw, min_confidence=1.01)
    assert kept == 0 and same is models

    # adapt_silence=False pins silence to the prior in unsupervised mode
    # too (advisor finding: the flag used to be silently dropped).
    frozen, kept = self_adapt(models, unlabeled_raw, adapt_silence=False)
    assert kept >= 1
    np.testing.assert_array_equal(frozen["S"].means, models["S"].means)


def test_gmm_adaptation_k1_equals_gaussian(trained_system):
    """The GMM path with K=1 must reproduce the single-Gaussian MAP update
    exactly (one mixture takes responsibility 1 for every aligned frame)."""
    from cs304_tpu.models.gmm_hmm import GMMWordHMM

    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    k1 = {
        l: GMMWordHMM(
            label=m.label, means=m.means[:, None],
            covariances=m.covariances[:, None],
            weights=np.ones((m.num_states, 1), np.float32), log_a=m.log_a,
        )
        for l, m in models.items()
    }
    enroll = {"375": mfcc_batch(
        [corpus.sentence_audio("375", 0, jitter_seed=0)]
    )}
    plain = map_adapt(models, enroll, tau=5.0)
    gmm = map_adapt(k1, enroll, tau=5.0)
    for label in models:
        np.testing.assert_allclose(
            gmm[label].means[:, 0], plain[label].means,
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            gmm[label].covariances[:, 0], plain[label].covariances
        )


def test_gmm_adaptation_k2(trained_system):
    """K=2 adaptation: enrolled states move (per-mixture), unseen words and
    weights/covariances stay at the prior, decode still works."""
    from cs304_tpu.models.train_continuous_gmm import promote_to_gmm

    corpus = trained_system["corpus"]
    gmm_models = promote_to_gmm(trained_system["embedded_models"], 2)
    enroll = {"375": mfcc_batch(
        [corpus.sentence_audio("375", 0, jitter_seed=t) for t in (0, 1)]
    )}
    adapted = map_adapt(gmm_models, enroll, tau=2.0)
    assert not np.allclose(adapted["3"].means, gmm_models["3"].means,
                           atol=1e-4)
    np.testing.assert_allclose(adapted["7"].weights, gmm_models["7"].weights)
    np.testing.assert_allclose(
        adapted["3"].covariances, gmm_models["3"].covariances
    )
    for label in ("9", "O", "1"):
        np.testing.assert_allclose(
            adapted[label].means, gmm_models[label].means, atol=1e-6
        )
    feats = mfcc_batch([corpus.sentence_audio("375", 0, jitter_seed=2)])
    pred = ContinuousDecoder(adapted, penalty=-100.0).predict_batch(feats)
    assert pred == ["375"]


def test_validation(trained_system):
    models = trained_system["embedded_models"]
    feats = [np.zeros((20, 39), np.float32)]
    with pytest.raises(ValueError, match="tau"):
        map_adapt(models, {"1": feats}, tau=0.0)
    with pytest.raises(ValueError, match="unknown words"):
        map_adapt(models, {"X": feats})
    with pytest.raises(ValueError, match="no enrollment"):
        map_adapt(models, {})
    no_sil = {l: m for l, m in models.items() if l != "S"}
    with pytest.raises(ValueError, match="silence"):
        map_adapt(no_sil, {"1": feats})

    from cs304_tpu.models.train_continuous_gmm import promote_to_gmm

    gmm = promote_to_gmm(models, 2)
    mixed = dict(gmm)
    mixed["1"] = models["1"]
    with pytest.raises(ValueError, match="uniform"):
        map_adapt(mixed, {"1": feats})
