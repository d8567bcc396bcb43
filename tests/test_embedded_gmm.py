"""Embedded GMM training (models/train_continuous_gmm.py).

Covers: K=1 equivalence with the fused single-Gaussian trainer, mixture
separation on genuinely bimodal states, decode integration through the GMM
continuous decoder, sharded==single parity, and empty-state failure."""
import numpy as np
import pytest

from cs304_tpu.models.gmm_hmm import GMMWordHMM
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.train_continuous import (
    ContinuousTrainConfig,
    ContinuousTrainer,
    HMMTrainMeanFail,
)
from cs304_tpu.models.train_continuous_gmm import (
    GMMContinuousTrainConfig,
    GMMContinuousTrainer,
    promote_to_gmm,
)

D = 6


def _models(rng, labels=("1", "2", "S")):
    out = {}
    for label in labels:
        s = 3 if label == "S" else 4
        means = rng.normal(size=(s, D)).astype(np.float32) * 3
        a = rng.normal(size=(s, D, 3)).astype(np.float32) * 0.2
        covs = a @ np.transpose(a, (0, 2, 1)) + 0.4 * np.eye(D, dtype=np.float32)
        out[label] = WordHMM(
            label=label, means=means, covariances=covs,
            log_a=uniform_forward_log_a(s),
        )
    return out


def _corpus(models, transcripts, n_per, seed=1, spread=0.5, offsets=None):
    """offsets: optional dict label -> (K, D) array of mode offsets; each
    state's frames are drawn around mean + a randomly chosen mode offset
    (bimodal emissions a single Gaussian cannot fit)."""
    r = np.random.default_rng(seed)
    labeled = {}
    for tr in transcripts:
        sentence = "S" + "S".join(tr) + "S"
        feats = []
        for _ in range(n_per):
            frames = []
            for w in sentence:
                m = models[w]
                for si in range(m.num_states):
                    n = r.integers(3, 6)
                    mu = m.means[si].copy()
                    if offsets is not None and w in offsets:
                        mu = mu + offsets[w][r.integers(len(offsets[w]))]
                    frames.append(
                        mu + r.normal(0, spread, size=(n, D)).astype(np.float32)
                    )
            feats.append(np.concatenate(frames).astype(np.float32))
        labeled[tr] = feats
    return labeled


def test_k1_matches_single_gaussian_fused(rng):
    """K=1 GMM embedded training must reproduce the fused single-Gaussian
    trainer exactly (responsibilities are identically 1)."""
    models = _models(rng)
    labeled = _corpus(models, ["12", "21"], 5)
    cfg1 = ContinuousTrainConfig(
        max_iterations=3, silence_bootstrap=False, cov_reg=0.05,
        fused=True, length_multiple=16,
    )
    tr1 = ContinuousTrainer(
        {k: WordHMM(label=v.label, means=v.means.copy(),
                    covariances=v.covariances.copy(), log_a=v.log_a.copy())
         for k, v in models.items()}, cfg1)
    n1 = tr1.train(labeled)

    gmm = promote_to_gmm(models, 1, jitter=0.0)
    cfgk = GMMContinuousTrainConfig(
        max_iterations=3, cov_reg=0.05, length_multiple=16,
    )
    trk = GMMContinuousTrainer(gmm, cfgk)
    nk = trk.train(labeled)
    assert n1 == nk
    np.testing.assert_allclose(
        trk.means_g[:, :, 0], tr1.means_g, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        trk.covs_g[:, :, 0], tr1.covs_g, atol=5e-5, rtol=1e-3
    )
    fin = np.isfinite(tr1.log_a_g)
    assert (np.isfinite(trk.log_a_g) == fin).all()
    np.testing.assert_allclose(
        trk.log_a_g[fin], tr1.log_a_g[fin], atol=2e-5, rtol=1e-4
    )


def _embedded_k1(models, labeled):
    """Stage 1 of the documented flow: K=1 embedded training, so promotion
    splits along DATA-fit covariances."""
    tr1 = ContinuousTrainer(
        {k: WordHMM(label=v.label, means=v.means.copy(),
                    covariances=v.covariances.copy(), log_a=v.log_a.copy())
         for k, v in models.items()},
        ContinuousTrainConfig(max_iterations=4, silence_bootstrap=False,
                              cov_reg=0.05, length_multiple=16),
    )
    tr1.train(labeled)
    return tr1.models()


def test_mixtures_separate_on_bimodal_states(rng):
    """K=2 refinement on bimodal emissions: mixtures must move apart and both
    carry mass, beating the single-Gaussian fit."""
    models = _models(rng, labels=("1", "S"))
    offsets = {"1": np.array([[3.0] + [0.0] * (D - 1),
                              [-3.0] + [0.0] * (D - 1)], np.float32)}
    labeled = _corpus(models, ["1", "11"], 8, seed=5, offsets=offsets)
    gmm = promote_to_gmm(_embedded_k1(models, labeled), 2, seed=1)
    tr = GMMContinuousTrainer(
        gmm, GMMContinuousTrainConfig(max_iterations=8, cov_reg=0.05,
                                      length_multiple=16))
    tr.train(labeled)
    out = tr.models()["1"]
    # The modes sit at ±3 along dim 0 (gap 6); hard Viterbi alignment blurs
    # state boundaries, so require a clear split everywhere and a near-full
    # split on average rather than the exact mode gap per state.
    gaps = np.abs(out.means[:, 0, 0] - out.means[:, 1, 0])
    assert (gaps > 2.0).all(), gaps
    assert gaps.mean() > 3.0, gaps
    assert (out.weights > 0.15).all(), out.weights


def test_trained_gmm_decodes_continuously(rng):
    """The refined GMM models must drop into ContinuousDecoder and decode
    the bimodal corpus correctly (integration: trainer -> decoder lift)."""
    from cs304_tpu.models.decoder import ContinuousDecoder

    models = _models(rng, labels=("1", "2", "S"))
    offsets = {"1": np.array([[3.0] + [0.0] * (D - 1),
                              [-3.0] + [0.0] * (D - 1)], np.float32)}
    labeled = _corpus(models, ["12", "21", "1", "2"], 6, seed=7,
                      offsets=offsets)
    gmm = promote_to_gmm(_embedded_k1(models, labeled), 2, seed=2)
    tr = GMMContinuousTrainer(
        gmm, GMMContinuousTrainConfig(max_iterations=6, cov_reg=0.05,
                                      length_multiple=16))
    tr.train(labeled)
    dec = ContinuousDecoder(tr.models(), penalty=-40.0)
    correct = 0
    trials = 0
    for tr_str in ("12", "21", "1", "2"):
        for x in labeled[tr_str][:3]:
            hyp = dec.predict(x, skip_silence=True)
            trials += 1
            correct += hyp == tr_str
    assert correct / trials >= 0.9, (correct, trials)

    # N-best on a GMM checkpoint must score with the GMM densities: the
    # top-1 hypothesis agrees with the 1-best decoder (both silence-stripped).
    x = labeled["12"][0]
    hyps = dec.predict_nbest(x, n=3)
    assert hyps, "no n-best hypotheses"
    assert hyps[0][1] == dec.predict(x)


def test_gmm_sharded_matches_single(rng):
    from cs304_tpu.parallel.data_parallel import make_mesh

    models = _models(rng)
    labeled = _corpus(models, ["12", "21"], 6, seed=9)
    gmm = promote_to_gmm(models, 2, jitter=0.1, seed=3)
    cfg = GMMContinuousTrainConfig(max_iterations=3, cov_reg=0.05,
                                   length_multiple=16)
    tr_single = GMMContinuousTrainer(
        promote_to_gmm(models, 2, jitter=0.1, seed=3), cfg)
    n_single = tr_single.train(labeled)
    tr_mesh = GMMContinuousTrainer(gmm, cfg, mesh=make_mesh())
    n_mesh = tr_mesh.train(labeled)
    assert n_single == n_mesh
    np.testing.assert_allclose(
        tr_mesh.means_g, tr_single.means_g, atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        tr_mesh.weights_g, tr_single.weights_g, atol=2e-5, rtol=1e-4
    )


def test_gmm_device_loop_matches_step_loop(rng):
    """on_empty_state='keep' routes through the whole-run device loop;
    'fail' (on a corpus with no empty states) uses the per-iteration step
    loop — both must produce identical results."""
    models = _models(rng)
    labeled = _corpus(models, ["12", "21"], 6, seed=25)
    gmm = promote_to_gmm(_embedded_k1(models, labeled), 2, seed=4)

    def train(mode):
        tr = GMMContinuousTrainer(
            {k: GMMWordHMM(label=v.label, means=v.means.copy(),
                           covariances=v.covariances.copy(),
                           weights=v.weights.copy(), log_a=v.log_a.copy())
             for k, v in gmm.items()},
            GMMContinuousTrainConfig(max_iterations=3, cov_reg=0.05,
                                     length_multiple=16,
                                     on_empty_state=mode))
        n = tr.train(labeled)
        return n, tr

    n_loop, tr_loop = train("keep")
    n_step, tr_step = train("fail")
    assert n_loop == n_step
    for name in ("means_g", "covs_g", "weights_g"):
        np.testing.assert_array_equal(
            getattr(tr_loop, name), getattr(tr_step, name), err_msg=name
        )


def test_gmm_empty_state_fail(rng):
    models = _models(rng)
    labeled = _corpus(models, ["1"], 4, seed=13)  # "2" never appears
    gmm = promote_to_gmm(models, 2, jitter=0.1)
    tr = GMMContinuousTrainer(
        gmm, GMMContinuousTrainConfig(max_iterations=1,
                                      on_empty_state="fail",
                                      length_multiple=16))
    with pytest.raises(HMMTrainMeanFail):
        tr.train(labeled)


def test_gmm_checkpoint_roundtrip(rng, tmp_path):
    """save_models/load_models must round-trip embedded-trained GMM models
    (weights included) and the loaded dict must rebuild the trainer."""
    from cs304_tpu.utils.checkpoint import load_models, save_models

    models = _models(rng, labels=("1", "S"))
    labeled = _corpus(models, ["1"], 5, seed=15)
    gmm = promote_to_gmm(models, 2, jitter=0.1)
    tr = GMMContinuousTrainer(
        gmm, GMMContinuousTrainConfig(max_iterations=2, length_multiple=16))
    tr.train(labeled)
    save_models(tr.models(), str(tmp_path / "gm"))
    loaded = load_models(str(tmp_path / "gm"))
    for lab, m in tr.models().items():
        np.testing.assert_array_equal(loaded[lab].means, m.means)
        np.testing.assert_array_equal(loaded[lab].weights, m.weights)
