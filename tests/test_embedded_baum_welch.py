"""Embedded Baum-Welch training (ContinuousTrainConfig.update='baum_welch').

VERDICT round-1 item #6: posterior-weighted statistics as an option in the
continuous trainer — the reference only ever had the forward algorithm for
isolated words (deprecated/hidden_markov_model.py:181-206).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a
from cs304_tpu.models.train_continuous import (
    ContinuousTrainConfig,
    ContinuousTrainer,
    _sentence_log_a,
    _stats_pass,
    _stats_pass_bw,
    _topology,
)


def _toy_setup(cov_scale: float, seed=0):
    """Two 3-state words + silence, sentence 'S1S2S', synthetic batch."""
    rng = np.random.default_rng(seed)
    d = 6
    state_counts = {"1": 3, "2": 3, "S": 2}
    label_index = {"1": 0, "2": 1, "S": 2}
    s_max = 3
    means_g = rng.normal(size=(3, s_max, d)).astype(np.float32) * 3
    covs_g = np.tile(np.eye(d, dtype=np.float32) * cov_scale, (3, s_max, 1, 1))
    log_a_g = np.full((3, s_max, s_max), -np.inf, np.float32)
    log_a_g[0] = uniform_forward_log_a(3)
    log_a_g[1] = uniform_forward_log_a(3)
    log_a_g[2, :2, :2] = uniform_forward_log_a(2)
    topo = _topology("S1S2S", state_counts, label_index)
    log_a_sent = _sentence_log_a(topo, log_a_g)

    # Generate batch by walking the sentence states in order.
    b, t = 4, 26
    means_sent = means_g[topo.lab_of_state, topo.loc_of_state]
    batch = np.zeros((b, t, d), np.float32)
    for i in range(b):
        # deterministic-ish dwell times
        reps = rng.integers(1, 4, size=len(topo.lab_of_state))
        seq = np.repeat(np.arange(len(topo.lab_of_state)), reps)[:t]
        seq = np.pad(seq, (0, t - len(seq)), constant_values=len(topo.lab_of_state) - 1)
        batch[i] = means_sent[seq] + rng.normal(size=(t, d)) * 0.05
    lengths = np.full(b, t, np.int32)
    return (topo, means_sent, covs_g[topo.lab_of_state, topo.loc_of_state],
            log_a_sent, batch, lengths, means_g, covs_g, log_a_g)


def test_bw_stats_match_viterbi_in_deterministic_limit():
    """With tight covariances the posteriors collapse onto the Viterbi path,
    so soft and hard statistics must agree."""
    (topo, means_sent, covs_sent, log_a_sent, batch, lengths,
     *_rest) = _toy_setup(cov_scale=0.01)
    args = (jnp.asarray(means_sent), jnp.asarray(covs_sent),
            jnp.asarray(log_a_sent),
            jnp.asarray(topo.lab_of_state), jnp.asarray(topo.loc_of_state),
            jnp.asarray(topo.pos_of_state),
            jnp.asarray(batch), jnp.asarray(lengths), 3, 3)
    c_v, s_v, t_v, _paths = _stats_pass(*args)
    c_b, s_b, t_b, _gamma, ll = _stats_pass_bw(*args)
    # Exact agreement is impossible: the hard path carries the reference's
    # backtrace quirk (final frame duplicated onto the second-to-last state,
    # viterbi.py quirk_backtrace) and boundary frames can stay genuinely
    # split. Assert the soft statistics put >= 97% of their mass where the
    # hard ones do.
    tv_counts = np.abs(np.asarray(c_b) - np.asarray(c_v)).sum()
    assert tv_counts / np.asarray(c_v).sum() < 0.05, tv_counts
    tv_sums = np.abs(np.asarray(s_b) - np.asarray(s_v)).sum()
    assert tv_sums / (np.abs(np.asarray(s_v)).sum() + 1e-9) < 0.05, tv_sums
    tv_trans = np.abs(np.asarray(t_b) - np.asarray(t_v)).sum()
    assert tv_trans / np.asarray(t_v).sum() < 0.06, tv_trans
    assert np.isfinite(float(ll))


def test_bw_posteriors_are_normalized():
    """Soft counts must sum to the number of real frames per utterance."""
    (topo, means_sent, covs_sent, log_a_sent, batch, lengths,
     *_rest) = _toy_setup(cov_scale=1.0)
    c_b, _s, _t, gamma, _ll = _stats_pass_bw(
        jnp.asarray(means_sent), jnp.asarray(covs_sent), jnp.asarray(log_a_sent),
        jnp.asarray(topo.lab_of_state), jnp.asarray(topo.loc_of_state),
        jnp.asarray(topo.pos_of_state),
        jnp.asarray(batch), jnp.asarray(lengths), 3, 3,
    )
    assert np.asarray(c_b).sum() == pytest.approx(lengths.sum(), rel=1e-4)
    per_frame = np.asarray(gamma).sum(-1)
    np.testing.assert_allclose(per_frame, 1.0, atol=1e-4)


def test_bw_training_end_to_end():
    """Full embedded BW training on a small synthetic corpus: converges and
    the trained system still decodes its training transcripts."""
    corpus = SyntheticTIDigits(num_train_speakers=3, num_test_speakers=1,
                               takes_per_digit=2)
    from cs304_tpu.models.train_kmeans import SegmentalKMeansConfig, train_word_hmm
    from cs304_tpu.ops.mfcc import mfcc_batch

    labels = ["1", "4", "7"]
    boot = {}
    for lab in labels:
        boot[lab] = train_word_hmm(
            lab, mfcc_batch(corpus.train_dataset[lab]),
            SegmentalKMeansConfig(num_states=5, max_iterations=8,
                                  length_multiple=32),
        ).model
    boot["S"] = WordHMM(
        label="S",
        means=np.zeros((3, 39), np.float32),
        covariances=np.tile(np.eye(39, dtype=np.float32) * 5, (3, 1, 1)),
        log_a=uniform_forward_log_a(3),
    )
    transcripts = ["14", "747", "471"]
    labeled = {
        tr: mfcc_batch([corpus.sentence_audio(tr, spk, jitter_seed=k)
                        for spk in range(3) for k in range(2)])
        for tr in transcripts
    }
    trainer = ContinuousTrainer(
        boot,
        ContinuousTrainConfig(max_iterations=4, cov_reg=0.1,
                              update="baum_welch", length_multiple=64),
    )
    iters = trainer.train(labeled)
    assert iters >= 1
    models = trainer.models()
    for m in models.values():
        assert np.isfinite(m.means).all()
        assert np.isfinite(m.covariances).all()
        np.linalg.cholesky(m.covariances)  # PSD
    decoder = ContinuousDecoder(models, penalty=-100.0)
    preds = decoder.predict_batch(
        mfcc_batch([corpus.sentence_audio(tr, 0, jitter_seed=9)
                    for tr in transcripts])
    )
    acc = np.mean([p == t for p, t in zip(preds, transcripts)])
    assert acc >= 2 / 3, (preds, transcripts)
