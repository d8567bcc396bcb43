"""Checkpointing, config system, CSV, confusion matrix."""
import os

import numpy as np
import pytest

from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.reporting.csvnia import CSVReader, CSVWriter
from cs304_tpu.reporting.visualizer import confusion_matrix
from cs304_tpu.utils.checkpoint import load_model, load_models, save_model, save_models
from cs304_tpu.utils.config import Config


def mk_model(label, rng, s=5, d=4):
    a = rng.normal(size=(s, d, 2)).astype(np.float32)
    covs = a @ a.transpose(0, 2, 1) + np.eye(d, dtype=np.float32)
    return WordHMM(
        label=label,
        means=rng.normal(size=(s, d)).astype(np.float32),
        covariances=covs,
        log_a=uniform_forward_log_a(s),
    )


def test_checkpoint_roundtrip(tmp_path, rng):
    model = mk_model("7", rng)
    save_model(model, str(tmp_path))
    loaded = load_model(str(tmp_path / "7"))
    assert loaded.label == "7"
    np.testing.assert_array_equal(loaded.means, model.means)
    np.testing.assert_array_equal(loaded.covariances, model.covariances)
    np.testing.assert_array_equal(loaded.log_a, model.log_a)


def test_checkpoint_collection(tmp_path, rng):
    models = {l: mk_model(l, rng) for l in ["1", "2", "S"]}
    save_models(models, str(tmp_path))
    loaded = load_models(str(tmp_path))
    assert set(loaded) == {"1", "2", "S"}
    subset = load_models(str(tmp_path), labels=["2"])
    assert set(subset) == {"2"}
    with pytest.raises(FileNotFoundError):
        load_models(str(tmp_path), labels=["9"])


def test_manifest_records_frontend(tmp_path, rng):
    """Checkpoints pin their feature front-end so decode matches training
    (a CMVN-trained model is useless on per-frame-normalized features)."""
    from cs304_tpu.utils.checkpoint import load_manifest

    models = {l: mk_model(l, rng) for l in ["1", "2"]}
    save_models(models, str(tmp_path), frontend={"normalization": "cmvn"})
    man = load_manifest(str(tmp_path))
    assert man["frontend"] == {"normalization": "cmvn"}
    assert man["labels"] == ["1", "2"]
    # manifest-less trees (per-model save) read as {}
    assert load_manifest(str(tmp_path / "1")) == {}


def test_frontend_config_to_mfcc_config():
    cfg = Config()
    cfg.apply_overrides(["frontend.normalization=cmn"])
    mcfg = cfg.frontend.mfcc_config()
    assert mcfg.normalization == "cmn"
    assert mcfg.sample_rate == 16000.0
    assert mcfg.n_mfcc == 13


def test_adopt_checkpoint_frontend(tmp_path, rng):
    """Decode scripts adopt the checkpoint's recorded front-end unless the
    user explicitly overrode the same key with --set frontend.*"""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    try:
        from _common import adopt_checkpoint_frontend
    finally:
        sys.path.pop(0)

    class Args:
        overrides = []

    save_models({"1": mk_model("1", rng)}, str(tmp_path),
                frontend={"normalization": "cmn"})
    cfg = Config()
    cfg.checkpoint_dir = str(tmp_path)
    adopt_checkpoint_frontend(cfg, Args())
    assert cfg.frontend.normalization == "cmn"

    # explicit --set wins over the manifest
    cfg2 = Config()
    cfg2.checkpoint_dir = str(tmp_path)
    cfg2.apply_overrides(["frontend.normalization=per_frame"])
    args2 = Args()
    args2.overrides = ["frontend.normalization=per_frame"]
    adopt_checkpoint_frontend(cfg2, args2)
    assert cfg2.frontend.normalization == "per_frame"

    # manifest-less checkpoint: no-op
    cfg3 = Config()
    cfg3.checkpoint_dir = str(tmp_path / "1")
    adopt_checkpoint_frontend(cfg3, Args())
    assert cfg3.frontend.normalization == "per_frame"


def test_load_models_friendly_errors(tmp_path):
    """Missing/empty checkpoint dirs produce actionable messages (ROADMAP
    quality item; surfaced as one-liners by scripts/_common.run_main)."""
    import pytest

    with pytest.raises(FileNotFoundError, match="train first"):
        load_models(str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError, match="train first"):
        load_models(None)
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="no model checkpoints"):
        load_models(str(tmp_path / "empty"))


def test_config_overrides(tmp_path):
    cfg = Config()
    assert cfg.decode.word_penalty == -100.0
    cfg.apply_overrides(["decode.word_penalty=-250", "train.num_states=7"])
    assert cfg.decode.word_penalty == -250.0
    assert cfg.train.num_states == 7
    with pytest.raises(KeyError):
        cfg.apply_overrides(["decode.bogus=1"])
    with pytest.raises(TypeError):
        cfg.apply_overrides(["train.num_states=hello"])
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    cfg2 = Config.from_file(path)
    assert cfg2.decode.word_penalty == -250.0
    assert cfg2.train.num_states == 7


def test_csv_roundtrip(tmp_path):
    w = CSVWriter(["Ground Truth", "Predict", "Count"])
    w.add_line(["4Z2Z1", "4Z2Z", 7])
    w.add_line(['has"quote', None, 0])
    path = str(tmp_path / "out.csv")
    w.write(path)
    r = CSVReader(path)
    rows = list(r)
    assert rows[0] == {"Ground Truth": "4Z2Z1", "Predict": "4Z2Z", "Count": 7}
    assert rows[1] == {"Ground Truth": 'has"quote', "Predict": None, "Count": 0}


def test_csv_rejects_bad_row():
    w = CSVWriter(["a", "b"])
    with pytest.raises(ValueError):
        w.add_line([1])


def test_confusion_matrix():
    cm = confusion_matrix(["1", "2", "1"], ["1", "1", "1"], ["1", "2"])
    assert cm[0, 0] == 2  # true 1 pred 1 twice
    assert cm[0, 1] == 1  # true 1 pred 2 once
    assert cm[1].sum() == 0


def test_checkpoint_gmm_roundtrip(tmp_path, rng):
    from cs304_tpu.models.gmm_hmm import GMMWordHMM

    s, k, d = 3, 2, 4
    a = rng.normal(size=(s, k, d, 2)).astype(np.float32)
    covs = a @ a.transpose(0, 1, 3, 2) + np.eye(d, dtype=np.float32)
    model = GMMWordHMM(
        label="G",
        means=rng.normal(size=(s, k, d)).astype(np.float32),
        covariances=covs,
        weights=rng.dirichlet(np.ones(k), size=s).astype(np.float32),
        log_a=uniform_forward_log_a(s),
    )
    save_model(model, str(tmp_path))
    loaded = load_model(str(tmp_path / "G"))
    assert isinstance(loaded, GMMWordHMM)
    np.testing.assert_array_equal(loaded.means, model.means)
    np.testing.assert_array_equal(loaded.weights, model.weights)


def test_spectrogram_visualizations(tmp_path, rng):
    from cs304_tpu.reporting.spectrograms import (
        cepstrum,
        mel_spectrogram_db,
        mfcc_heatmap_data,
        plot_mel_spectrogram,
        plot_spectrogram,
        power_spectrogram_db,
    )

    sig = (np.sin(np.arange(4000) * 0.2) * 3000 +
           rng.normal(0, 50, 4000)).astype(np.float32)
    db = power_spectrogram_db(sig)
    assert db.shape == (1 + 4000 // 160, 161)
    assert db.max() == pytest.approx(0.0)
    mel = mel_spectrogram_db(sig)
    assert mel.shape == (db.shape[0], 40)
    cep = cepstrum(sig)
    assert cep.shape[0] == db.shape[0]
    feats = mfcc_heatmap_data(sig)
    assert feats.shape == (db.shape[0], 39)
    p1 = plot_spectrogram(sig, out_dir=str(tmp_path))
    p2 = plot_mel_spectrogram(sig, out_dir=str(tmp_path))
    assert os.path.exists(p1) and os.path.exists(p2)


def test_phase_timer_and_timings():
    from cs304_tpu.utils.profiling import phase_timer, reset_timings, timings

    reset_timings()
    with phase_timer("unit_phase"):
        sum(range(1000))
    t = timings()
    assert "unit_phase" in t and t["unit_phase"] >= 0
    reset_timings()
    assert timings() == {}


def test_progress_bar_noop():
    from cs304_tpu.utils.progress import progress_bar

    bar = progress_bar(10, "x", enabled=False)
    bar.update()
    bar.close()
