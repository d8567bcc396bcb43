"""CMVN normalization mode of the MFCC front-end.

The reference normalizes the static coefficients ACROSS coefficients per frame
(its mfcc.py:62-66 quirk, replicated as normalization="per_frame").
normalization="cmvn" is proper per-utterance cepstral mean/variance
normalization over time of all 39 dims — the textbook channel-robustness
technique the reference lacks.
"""
import numpy as np
import jax.numpy as jnp

from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_batch, mfcc_features

CMVN = MFCCConfig(normalization="cmvn")
CMN = MFCCConfig(normalization="cmn")


def _clip(rng, n=4000):
    return (rng.normal(size=n) * 0.1).astype(np.float32)


def test_cmvn_zero_mean_unit_var_over_valid_frames(rng):
    sig = _clip(rng)
    feats, t = mfcc_features(jnp.asarray(sig), cfg=CMVN)
    valid = np.asarray(feats)[: int(t)]
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-3)


def test_cmn_zero_mean_keeps_scale(rng):
    """CMN subtracts the per-dim mean but must NOT touch the variance (the
    level/dynamics cues the silence model depends on)."""
    sig = _clip(rng)
    feats, t = mfcc_features(jnp.asarray(sig), cfg=CMN)
    raw_cmvn, _ = mfcc_features(jnp.asarray(sig), cfg=CMVN)
    valid = np.asarray(feats)[: int(t)]
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    # scales differ across dims (not whitened)
    stds = valid.std(axis=0)
    assert stds.max() / max(stds.min(), 1e-6) > 2.0


def test_cmvn_padding_invariant(rng):
    sig = _clip(rng)
    for cfg in (CMVN, CMN):
        feats_a, t_a = mfcc_features(jnp.asarray(sig), cfg=cfg)
        padded = np.concatenate([sig, np.zeros(1600, np.float32)])
        feats_b, t_b = mfcc_features(
            jnp.asarray(padded), num_samples=len(sig), cfg=cfg
        )
        assert int(t_a) == int(t_b)
        np.testing.assert_allclose(
            np.asarray(feats_b)[: int(t_a)], np.asarray(feats_a)[: int(t_a)],
            atol=1e-5,
        )
        assert np.all(np.asarray(feats_b)[int(t_b):] == 0.0)


def test_cmvn_cancels_channel_coloration(rng):
    """A linear channel adds a near-constant per-coefficient offset in the
    log-mel/cepstral domain; CMVN's mean subtraction removes it while the
    reference's per-frame normalization cannot."""
    from scipy.signal import lfilter

    sig = _clip(rng, 8000)
    colored = lfilter([1.0], [1.0, -0.7], sig).astype(np.float32)

    def statics_dist(cfg):
        a = np.asarray(mfcc_batch([sig], cfg=cfg)[0])
        b = np.asarray(mfcc_batch([colored], cfg=cfg)[0])
        # compare the c1.. statics (drop c0, dominated by overall level)
        return float(np.mean(np.abs(a[:, 1:13] - b[:, 1:13])))

    # The cancellation is approximate — power_to_db's ref=max and top_db
    # clamp couple frames nonuniformly — but must be a clear improvement.
    d_ref = statics_dist(MFCCConfig())
    d_cmvn = statics_dist(CMVN)
    d_cmn = statics_dist(CMN)
    assert d_cmvn < 0.6 * d_ref, (d_cmvn, d_ref)
    assert d_cmn < 0.6 * d_ref, (d_cmn, d_ref)


def test_per_frame_default_unchanged(rng):
    sig = _clip(rng)
    default, _ = mfcc_features(jnp.asarray(sig))
    explicit, _ = mfcc_features(
        jnp.asarray(sig), cfg=MFCCConfig(normalization="per_frame")
    )
    np.testing.assert_array_equal(np.asarray(default), np.asarray(explicit))


def test_streaming_rejects_cmvn():
    import pytest

    from cs304_tpu.ops.streaming_mfcc import StreamingMFCC

    with pytest.raises(ValueError, match="per_frame"):
        StreamingMFCC(cfg=CMVN)
