"""Drop-in compat surface: the reference's API names and call shapes work."""
import os

import numpy as np
import pytest

from cs304_tpu import compat
from cs304_tpu.audio.wav import write_wav_int16
from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.data.ti_digits import DIGIT_LABELS


@pytest.fixture(scope="module")
def corpus():
    return SyntheticTIDigits(num_train_speakers=3, num_test_speakers=1, takes_per_digit=2)


def test_mfcc_surface(corpus):
    sig = corpus.train_dataset["3"][0]
    m = compat.MFCC(sig, 16000)
    assert m.feature_vector.shape[0] == 39  # coefficient-major like the reference
    batch = compat.MFCC.batch([sig, sig], 16000)
    assert batch[0].shape[1] == 39  # batch is transposed (T, 39)
    np.testing.assert_allclose(batch[0], m.feature_vector.T, rtol=1e-5)
    with pytest.raises(ValueError):
        compat.MFCC(np.zeros((2, 100)), 16000)


def test_trainable_predict_save_load(tmp_path, corpus):
    mfccs = compat.MFCC.batch(corpus.train_dataset["5"], 16000)
    model = compat.HiddenMarkovModelTrainable.from_data("5", mfccs, 5, 6)
    assert model.num_of_states == 5
    assert model.dim_of_features == 39
    score, path = model.predict(mfccs[0])
    assert np.isfinite(score)
    assert len(path) == mfccs[0].shape[0]
    model.save(str(tmp_path))
    loaded = compat.HiddenMarkovModel.from_folder(str(tmp_path / "5"))
    score2, path2 = loaded.predict(mfccs[0])
    assert score2 == pytest.approx(score, rel=1e-5)
    np.testing.assert_array_equal(path, path2)


def test_collection_and_inference(tmp_path, corpus):
    for label in DIGIT_LABELS:
        mfccs = compat.MFCC.batch(corpus.train_dataset[label], 16000)
        compat.HiddenMarkovModelTrainable.from_data(label, mfccs, 5, 4).save(
            str(tmp_path)
        )
    mc = compat.ModelCollection.load_from_files(str(tmp_path))
    clip = compat.MFCC.batch([corpus.train_dataset["7"][0]], 16000)[0]
    assert mc.predict(clip) in DIGIT_LABELS
    # The API the reference's project5_interactive_multi.py wanted:
    assert isinstance(mc.predict_continuous_controller(clip), str)

    inf = compat.HiddenMarkovModelInference.from_folder(
        str(tmp_path), list(DIGIT_LABELS)
    )
    inf._log_transition_probability_between_words = -250.0
    assert inf._decoder.penalty == -250.0
    assert isinstance(inf.predict(clip), str)


def test_dtw_surface(corpus):
    templates = [corpus.train_dataset[l][0] for l in ["1", "2", "3"]]
    dtw = compat.DynamicTimeWarping(templates, corpus.train_dataset["2"][1])
    idx, dist = dtw.search()
    assert 0 <= idx < 3
    assert np.isfinite(dist)


def test_ti_digits_compat_tree(tmp_path, corpus):
    """The reference directory layout loads through the compat TIDigits."""
    rng = np.random.default_rng(0)
    for split in ("TRAIN", "TEST"):
        base = os.path.join(tmp_path, "Adults", "TIDIGITS", split)
        os.makedirs(base)
        for name in ("1a.wav", "1b.wav", "82a.wav"):
            write_wav_int16(
                os.path.join(base, name),
                rng.normal(0, 1000, 3200).astype(np.int16), 16000,
            )
    td = compat.TIDigits(str(tmp_path), include_children=False)
    assert set(td.train_dataset.labels) == {"1", "82"}
    assert len(td.train_dataset["1"]) == 2
    assert td.train_dataset["1"][0].dtype == np.float32
    combined = td.train_dataset.get_combined("1", 0)
    assert combined.shape == (3200,)


def test_full_reference_export_surface():
    """Every name the reference package exports exists in compat
    (reference __init__.py:11-30)."""
    reference_exports = [
        "MFCC", "Segmentation", "DynamicTimeWarping", "TIDigits",
        "TI_DIGITS_LABELS", "DataLoader", "HiddenMarkovModel",
        "HiddenMarkovModelTrainable", "HiddenMarkovModelInference",
        "HiddenMarkovModelTrainContinuous", "Signal", "ModelCollection",
        "TI_DIGITS_LABEL_TYPE", "plot_confusion_matrix_from_lists",
        "plot_line", "CSVReader", "CSVWriter", "SignalSeparation",
    ]
    for name in reference_exports:
        assert hasattr(compat, name), f"compat missing {name}"
    assert sorted(compat.__all__) == sorted(reference_exports)


def test_signal_container():
    sig = np.arange(12, dtype=np.float32).reshape(6, 2)
    path = np.array([0, 0, 1, 1, 1, 2])
    s = compat.Signal(4, sig, path)
    segs = s.order_by_state
    assert segs[0].shape == (2, 2)
    assert segs[1].shape == (3, 2)
    assert segs[2].shape == (1, 2)
    assert segs[3] is None
    assert len(s.order_by_signal) == 6


def test_import_reference_checkpoint(tmp_path):
    """Round-trip a reference-format pickle checkpoint (advisor finding r1:
    the compat layer could not read the reference's .cache/ pickles). The
    fixture fabricates the exact pickle structure the reference writes
    (hidden_markov_model.py:93-115) under its module paths."""
    import pickle
    import sys
    import types

    import scipy.stats

    # Fabricate the reference's classes under its module paths, as its own
    # pickles reference them.
    tp_mod = types.ModuleType("loe_speech_recognition.transition_probability")
    hmm_mod = types.ModuleType("loe_speech_recognition.hidden_markov_model")
    pkg = types.ModuleType("loe_speech_recognition")

    class LogTransitionProbabilities:
        pass

    class MultivariateNormal:
        pass

    LogTransitionProbabilities.__module__ = tp_mod.__name__
    MultivariateNormal.__module__ = hmm_mod.__name__
    LogTransitionProbabilities.__qualname__ = "LogTransitionProbabilities"
    MultivariateNormal.__qualname__ = "MultivariateNormal"
    tp_mod.LogTransitionProbabilities = LogTransitionProbabilities
    hmm_mod.MultivariateNormal = MultivariateNormal
    saved = {k: sys.modules.get(k) for k in
             (pkg.__name__, tp_mod.__name__, hmm_mod.__name__)}
    sys.modules[pkg.__name__] = pkg
    sys.modules[tp_mod.__name__] = tp_mod
    sys.modules[hmm_mod.__name__] = hmm_mod
    try:
        rng = np.random.default_rng(0)
        want_means = rng.normal(size=(3, 5)).astype(np.float32)
        want_covs = np.tile(np.eye(5, dtype=np.float32) * 0.5, (3, 1, 1))
        ltp = LogTransitionProbabilities()
        ltp.num_of_states = 3
        ltp._core = {(0, 0): -0.5, (0, 1): -1.0, (1, 1): -0.3, (1, 2): -1.2,
                     (2, 2): 0.0}
        mns = []
        for i in range(3):
            mn = MultivariateNormal()
            mn.dim_of_features = 5
            mn._core = scipy.stats.multivariate_normal(
                mean=want_means[i], cov=want_covs[i])
            mns.append(mn)
        d = tmp_path / "ckpt" / "7"
        d.mkdir(parents=True)
        with open(d / "log_trans_probs.pickle", "wb") as f:
            pickle.dump(ltp, f, pickle.HIGHEST_PROTOCOL)
        with open(d / "multivariate_normals.pickle", "wb") as f:
            pickle.dump(mns, f, pickle.HIGHEST_PROTOCOL)
    finally:
        for k, v in saved.items():
            if v is None:
                del sys.modules[k]
            else:
                sys.modules[k] = v

    from cs304_tpu.compat import import_reference_checkpoint

    npz_dir = str(tmp_path / "npz")
    models = import_reference_checkpoint(str(tmp_path / "ckpt"),
                                         save_npz_to=npz_dir)
    assert set(models) == {"7"}
    m = models["7"]
    np.testing.assert_allclose(m.means, want_means, atol=1e-6)
    np.testing.assert_allclose(m.covariances, want_covs, atol=1e-6)
    assert m.log_a[0, 1] == pytest.approx(-1.0)
    assert m.log_a[2, 0] == -np.inf
    # npz copy loads through the normal checkpoint path.
    from cs304_tpu.utils.checkpoint import load_models

    re = load_models(npz_dir)
    np.testing.assert_allclose(re["7"].means, want_means, atol=1e-6)
