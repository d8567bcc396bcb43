"""Cross-option integration coverage: decode backends agree end-to-end; the
reference-parity cross_word='band' training mode still runs; fast-mode MFCC
config is accepted end to end."""
import numpy as np
import pytest

from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.train_continuous import (
    ContinuousTrainConfig,
    ContinuousTrainer,
)
from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_features

import jax.numpy as jnp


def mk(label, s, seed):
    r = np.random.default_rng(seed)
    return WordHMM(
        label=label,
        means=r.normal(size=(s, 5)).astype(np.float32) * 2,
        covariances=np.tile(np.eye(5, dtype=np.float32), (s, 1, 1)),
        log_a=uniform_forward_log_a(s),
    )


@pytest.fixture
def models():
    return {"A": mk("A", 5, 1), "B": mk("B", 4, 2), "S": mk("S", 3, 3)}


def test_backends_agree_on_predictions(models, rng):
    feats = [
        (rng.normal(size=(t, 5)) * 2).astype(np.float32) for t in (30, 55, 18)
    ]
    outs = {}
    for backend in ("scan", "fast", "pallas"):
        dec = ContinuousDecoder(dict(models), penalty=-8.0, backend=backend)
        outs[backend] = dec.predict_batch(feats)
    assert outs["scan"] == outs["fast"] == outs["pallas"]


def test_band_parity_training_mode(models, rng):
    labeled = {
        "AB": [(rng.normal(size=(40, 5)) * 2).astype(np.float32) for _ in range(4)]
    }
    trainer = ContinuousTrainer(
        dict(models),
        ContinuousTrainConfig(
            max_iterations=2, length_multiple=8, silence_bootstrap=False,
            cross_word="band",
        ),
    )
    trainer.train(labeled)
    out = trainer.models()
    for m in out.values():
        assert np.isfinite(m.means).all()


def test_fast_mode_mfcc_config(rng):
    sig = (rng.normal(size=4000) * 2000).astype(np.float32)
    parity, t1 = mfcc_features(jnp.asarray(sig), cfg=MFCCConfig())
    fast, t2 = mfcc_features(jnp.asarray(sig), cfg=MFCCConfig(precision="high"))
    assert int(t1) == int(t2)
    # On CPU precision settings are no-ops, so results match exactly; the TPU
    # delta is measured/documented in ARCHITECTURE.md §6.
    np.testing.assert_allclose(
        np.asarray(parity)[: int(t1)], np.asarray(fast)[: int(t2)],
        rtol=1e-3, atol=1e-3,
    )
