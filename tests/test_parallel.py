"""Multi-chip (virtual 8-device CPU mesh) sharding tests: sharded == single."""
import jax
import jax.numpy as jnp
import numpy as np

from cs304_tpu.models.hmm import uniform_forward_log_a
from cs304_tpu.models.train_kmeans import kmeans_step
from cs304_tpu.parallel.data_parallel import (
    dp_composite_decode,
    dp_kmeans_step,
    make_mesh,
)
from cs304_tpu.ops.gaussian import gaussian_log_pdf, make_gaussian_params
from cs304_tpu.ops.viterbi import viterbi_composite


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def _fake_batch(rng, b=16, t=40, d=6, s=4):
    means = rng.normal(size=(s, d)).astype(np.float32) * 2
    covs = np.tile(np.eye(d, dtype=np.float32) * 0.5, (s, 1, 1))
    log_a = uniform_forward_log_a(s)
    batch = rng.normal(size=(b, t, d)).astype(np.float32)
    lengths = rng.integers(t // 2, t, size=b).astype(np.int32)
    return means, covs, log_a, batch, lengths


def test_dp_kmeans_step_matches_single_device(rng):
    means, covs, log_a, batch, lengths = _fake_batch(rng)
    mesh = make_mesh()
    dp_means, dp_covs, dp_log_a, dp_counts = dp_kmeans_step(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(log_a),
        jnp.asarray(batch), jnp.asarray(lengths), mesh, 4,
    )
    s_means, s_covs, s_log_a, s_counts, _ = kmeans_step(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(log_a),
        jnp.asarray(batch), jnp.asarray(lengths), 4, 0.001,
    )
    np.testing.assert_array_equal(np.asarray(dp_counts), np.asarray(s_counts))
    np.testing.assert_allclose(np.asarray(dp_means), np.asarray(s_means), rtol=1e-4, atol=1e-5)
    # one-pass vs two-pass covariance: loose fp32 tolerance
    np.testing.assert_allclose(np.asarray(dp_covs), np.asarray(s_covs), rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(
        np.where(np.isfinite(dp_log_a), dp_log_a, 0.0),
        np.where(np.isfinite(s_log_a), s_log_a, 0.0),
        rtol=1e-5, atol=1e-6,
    )


def test_dp_composite_decode_matches_single(rng):
    # Two words of 3 states each.
    s_total, d, b, t = 6, 5, 8, 30
    means = rng.normal(size=(s_total, d)).astype(np.float32) * 2
    covs = np.tile(np.eye(d, dtype=np.float32), (s_total, 1, 1))
    log_a = np.full((s_total, s_total), -np.inf, np.float32)
    log_a[:3, :3] = uniform_forward_log_a(3)
    log_a[3:, 3:] = uniform_forward_log_a(3)
    lower = np.array([0, 0, 0, 3, 3, 3], np.int32)
    entry = np.array([1, 0, 0, 1, 0, 0], bool)
    exit_ = np.array([0, 0, 1, 0, 0, 1], bool)
    batch = rng.normal(size=(b, t, d)).astype(np.float32)
    lengths = np.full(b, t, np.int32)

    mesh = make_mesh()
    scores, paths = dp_composite_decode(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(log_a),
        jnp.asarray(lower), jnp.asarray(entry), jnp.asarray(exit_),
        jnp.float32(-3.0), jnp.asarray(batch), jnp.asarray(lengths), mesh,
    )
    params = make_gaussian_params(means, covs)
    for i in range(b):
        log_b = gaussian_log_pdf(params, jnp.asarray(batch[i]))
        want_score, want_path = viterbi_composite(
            log_b, jnp.asarray(log_a), jnp.asarray(lower), jnp.asarray(entry),
            jnp.asarray(exit_), -3.0,
        )
        assert np.allclose(float(scores[i]), float(want_score), rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(paths[i]), np.asarray(want_path))


def test_dp_embedded_stats_matches_single(rng):
    from cs304_tpu.models.train_continuous import (
        _sentence_log_a,
        _stats_pass,
        _topology,
    )
    from cs304_tpu.parallel.data_parallel import dp_embedded_stats

    state_counts = {"A": 3, "S": 2}
    label_index = {"A": 0, "S": 1}
    topo = _topology("SAS", state_counts, label_index)
    l, s_max, d = 2, 3, 4
    log_a_g = np.stack([uniform_forward_log_a(3),
                        np.pad(uniform_forward_log_a(2), ((0, 1), (0, 1)),
                               constant_values=-np.inf)])
    means_g = rng.normal(size=(l, s_max, d)).astype(np.float32) * 2
    covs_g = np.tile(np.eye(d, dtype=np.float32), (l, s_max, 1, 1))
    means_sent = means_g[topo.lab_of_state, topo.loc_of_state]
    covs_sent = covs_g[topo.lab_of_state, topo.loc_of_state]
    log_a_sent = _sentence_log_a(topo, log_a_g)

    b, t = 16, 24
    batch = rng.normal(size=(b, t, d)).astype(np.float32)
    lengths = np.full(b, t, np.int32)

    sc, ss, st, sp = _stats_pass(
        jnp.asarray(means_sent), jnp.asarray(covs_sent), jnp.asarray(log_a_sent),
        jnp.asarray(topo.lab_of_state), jnp.asarray(topo.loc_of_state),
        jnp.asarray(topo.pos_of_state),
        jnp.asarray(batch), jnp.asarray(lengths), l, s_max,
    )
    mesh = make_mesh()
    dc, ds, dt, dp = dp_embedded_stats(
        jnp.asarray(means_sent), jnp.asarray(covs_sent), jnp.asarray(log_a_sent),
        jnp.asarray(topo.lab_of_state), jnp.asarray(topo.loc_of_state),
        jnp.asarray(topo.pos_of_state),
        jnp.asarray(batch), jnp.asarray(lengths), mesh, l, s_max,
    )
    np.testing.assert_allclose(np.asarray(dc), np.asarray(sc), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ss), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(st), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(dp), np.asarray(sp))


def test_continuous_trainer_with_mesh_matches_single(rng):
    from cs304_tpu.models.hmm import WordHMM
    from cs304_tpu.models.train_continuous import (
        ContinuousTrainConfig,
        ContinuousTrainer,
    )

    def mk(label, s):
        return WordHMM(
            label=label,
            means=rng.normal(size=(s, 4)).astype(np.float32) * 2,
            covariances=np.tile(np.eye(4, dtype=np.float32), (s, 1, 1)),
            log_a=uniform_forward_log_a(s),
        )

    base = {"1": mk("1", 5), "2": mk("2", 5), "S": mk("S", 3)}

    def fresh_models():
        return {
            l: WordHMM(label=l, means=m.means.copy(),
                       covariances=m.covariances.copy(), log_a=m.log_a.copy())
            for l, m in base.items()
        }

    # 6 utterances (not divisible by 8 -> exercises dummy padding).
    labeled = {
        "12": [rng.normal(size=(30, 4)).astype(np.float32) * 2 for _ in range(6)]
    }
    cfg = ContinuousTrainConfig(
        max_iterations=2, length_multiple=8, silence_bootstrap=False
    )
    t_single = ContinuousTrainer(fresh_models(), cfg)
    t_single.train({k: [f.copy() for f in v] for k, v in labeled.items()})

    t_mesh = ContinuousTrainer(fresh_models(), cfg, mesh=make_mesh())
    t_mesh.train(labeled)

    for label in ("1", "2", "S"):
        np.testing.assert_allclose(
            t_mesh.models()[label].means, t_single.models()[label].means,
            rtol=1e-4, atol=1e-4,
        )


def test_train_word_hmm_with_mesh(rng):
    from cs304_tpu.models.train_kmeans import SegmentalKMeansConfig, train_word_hmm

    centers = rng.normal(size=(3, 4)) * 4
    seqs = []
    for _ in range(6):  # not divisible by 8 -> dummy padding
        frames = []
        for s in range(3):
            for _ in range(rng.integers(3, 7)):
                frames.append(centers[s] + rng.normal(0, 0.3, 4))
        seqs.append(np.asarray(frames, np.float32))
    cfg = SegmentalKMeansConfig(num_states=3, max_iterations=6, length_multiple=8)
    single = train_word_hmm("X", [f.copy() for f in seqs], cfg).model
    meshed = train_word_hmm("X", seqs, cfg, mesh=make_mesh()).model
    np.testing.assert_allclose(meshed.means, single.means, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        meshed.covariances, single.covariances, rtol=5e-2, atol=5e-3
    )


def test_continuous_trainer_resume(rng, tmp_path):
    from cs304_tpu.models.hmm import WordHMM
    from cs304_tpu.models.train_continuous import (
        ContinuousTrainConfig,
        ContinuousTrainer,
    )

    def mk(label, s, seed):
        r = np.random.default_rng(seed)
        return WordHMM(
            label=label,
            means=r.normal(size=(s, 4)).astype(np.float32) * 2,
            covariances=np.tile(np.eye(4, dtype=np.float32), (s, 1, 1)),
            log_a=uniform_forward_log_a(s),
        )

    def models():
        return {"1": mk("1", 4, 1), "S": mk("S", 3, 2)}

    labeled = {
        "1": [rng.normal(size=(20, 4)).astype(np.float32) * 2 for _ in range(4)],
        "11": [rng.normal(size=(40, 4)).astype(np.float32) * 2 for _ in range(4)],
    }
    ckpt = str(tmp_path / "state")
    cfg4 = ContinuousTrainConfig(max_iterations=4, length_multiple=8,
                                 silence_bootstrap=False)
    full = ContinuousTrainer(models(), cfg4)
    full.train({k: [f.copy() for f in v] for k, v in labeled.items()})

    # Train 2, checkpoint, resume into a FRESH trainer, finish to 4.
    cfg2 = ContinuousTrainConfig(max_iterations=2, length_multiple=8,
                                 silence_bootstrap=False)
    first = ContinuousTrainer(models(), cfg2)
    first.train(labeled, checkpoint_dir=ckpt)
    second = ContinuousTrainer(models(), cfg4)
    assert second.resume(ckpt) == 2
    second.train(labeled)

    for label in ("1", "S"):
        np.testing.assert_allclose(
            second.models()[label].means, full.models()[label].means,
            rtol=1e-4, atol=1e-4,
        )
