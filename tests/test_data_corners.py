"""Dataset/front-end corner coverage: lazy vs eager, merge purity, frame counts."""
import os

import numpy as np
import pytest

from cs304_tpu.audio.wav import write_wav_int16
from cs304_tpu.data.ti_digits import DataLoader, TIDigits
from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_batch, mfcc_features

import jax.numpy as jnp


def make_tree(tmp_path, rng):
    base = os.path.join(tmp_path, "Adults", "TIDIGITS", "TRAIN")
    os.makedirs(base, exist_ok=True)
    for name in ("7a.wav", "7b.wav", "3a.wav"):
        write_wav_int16(os.path.join(base, name),
                        rng.normal(0, 900, 2400).astype(np.int16), 16000)
    os.makedirs(os.path.join(tmp_path, "Adults", "TIDIGITS", "TEST"), exist_ok=True)
    return str(tmp_path)


def test_lazy_vs_eager_loading(tmp_path, rng):
    root = make_tree(tmp_path, rng)
    lazy = TIDigits(root, include_children=False, lazy=True).train_dataset
    eager = TIDigits(root, include_children=False, lazy=False).train_dataset
    assert set(lazy.labels) == set(eager.labels) == {"7", "3"}
    for label in ("7", "3"):
        for a, b in zip(lazy[label], eager[label]):
            np.testing.assert_array_equal(a, b)
    # Lazy stores paths until materialized.
    assert isinstance(lazy.data["7"][0], str)
    assert isinstance(eager.data["7"][0], np.ndarray)


def test_merge_does_not_mutate(rng):
    a = DataLoader({"1": [np.zeros(10)]})
    b = DataLoader({"1": [np.ones(10)], "2": [np.ones(5)]})
    merged = a.merge(b)
    # The reference's __add__ mutates the left operand (ti_digits.py:43-50);
    # ours must not.
    assert len(a.data["1"]) == 1
    assert len(merged.data["1"]) == 2
    assert set(merged.labels) == {"1", "2"}
    # iteration materializes arrays with labels
    pairs = list(merged)
    assert len(pairs) == 3 and all(isinstance(p[1], str) for p in pairs)


def test_subset_and_num_clips():
    d = DataLoader({"1": [np.zeros(4)] * 5, "2": [np.zeros(4)] * 2})
    assert d.num_clips() == 7
    s = d.subset(2)
    assert s.num_clips() == 4


# n >= 9 frames only: the reference cannot process shorter clips either
# (scipy savgol raises; its endpointing rejects <9-frame results,
# signal_separation.py:95-97).
@pytest.mark.parametrize("n", [1441, 1600, 1599, 12345])
def test_frame_count_matches_librosa_formula(rng, n):
    """T = 1 + len // hop for centered STFT — exact for awkward lengths."""
    sig = rng.normal(0, 1000, n).astype(np.float32)
    cfg = MFCCConfig()
    feats, t_valid = mfcc_features(jnp.asarray(sig), cfg=cfg)
    assert int(t_valid) == 1 + n // 160
    assert np.isfinite(np.asarray(feats)[: int(t_valid)]).all()


def test_mfcc_batch_mixed_tiny_and_long(rng):
    sigs = [
        rng.normal(0, 1000, 1441).astype(np.float32),
        rng.normal(0, 1000, 9000).astype(np.float32),
    ]
    out = mfcc_batch(sigs)
    assert out[0].shape == (10, 39)
    assert out[1].shape == (1 + 9000 // 160, 39)
