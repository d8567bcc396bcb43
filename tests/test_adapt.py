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
    """A fixed random per-dimension feature offset (a uniform shift would be
    invisible: it degrades every word model's likelihood equally, so the
    argmax structure survives — measured in round 2)."""
    return np.random.default_rng(seed).normal(0, scale, 39).astype(np.float32)


def test_recovers_shifted_speaker(trained_system):
    corpus = trained_system["corpus"]
    models = trained_system["embedded_models"]
    decoder = ContinuousDecoder(models, penalty=-100.0)

    enroll_raw = {
        tr: mfcc_batch(
            [corpus.sentence_audio(tr, 0, jitter_seed=t) for t in (0, 1)]
        )
        for tr in ("186Z", "375")
    }
    eval_truth = ["186Z", "186Z", "375", "375"]
    eval_raw = mfcc_batch(
        [corpus.sentence_audio("186Z", 0, jitter_seed=2),
         corpus.sentence_audio("186Z", 1, jitter_seed=2),
         corpus.sentence_audio("375", 0, jitter_seed=2),
         corpus.sentence_audio("375", 1, jitter_seed=2)]
    )

    def errs(preds):
        return sum(p != t for p, t in zip(preds, eval_truth))

    # Escalate the channel-like per-dim offset until the speaker-independent
    # decode clearly breaks (>= 2 of 4 wrong), then require MAP adaptation
    # (forced alignment is topology-constrained, so the enrollment stats
    # survive the offset) to reduce the errors.
    for scale in (1.5, 2.0, 3.0, 5.0):
        off = _offset(scale)
        eval_feats = [np.asarray(f) + off for f in eval_raw]
        base_errs = errs(decoder.predict_batch(eval_feats))
        if base_errs < 2:
            continue
        enroll = {
            tr: [np.asarray(f) + off for f in feats]
            for tr, feats in enroll_raw.items()
        }
        adapted = map_adapt(models, enroll, tau=2.0)
        adapted_preds = ContinuousDecoder(
            adapted, penalty=-100.0
        ).predict_batch(eval_feats)
        assert errs(adapted_preds) < base_errs, (scale, adapted_preds)
        return
    pytest.fail("no offset up to scale 5.0 broke the unadapted decode")


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
    # Enrolled words moved.
    assert not np.allclose(adapted["1"].means, models["1"].means, atol=1e-4)
    # Silence stays at the prior by default.
    np.testing.assert_allclose(adapted["S"].means, models["S"].means)
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
    with pytest.raises(ValueError, match="GMM"):
        map_adapt(gmm, {"1": feats})
