"""GMM continuous decoding: K=1 parity with the Gaussian decoder + mixed models."""
import numpy as np

from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.gmm_hmm import GMMWordHMM
from cs304_tpu.models.hmm import WordHMM, uniform_forward_log_a


def mk_gaussian(label, rng, s=3, d=4):
    a = rng.normal(size=(s, d, 2)).astype(np.float32)
    covs = a @ a.transpose(0, 2, 1) + np.eye(d, dtype=np.float32)
    return WordHMM(
        label=label,
        means=rng.normal(size=(s, d)).astype(np.float32) * 2,
        covariances=covs,
        log_a=uniform_forward_log_a(s),
    )


def to_k1_gmm(m: WordHMM) -> GMMWordHMM:
    return GMMWordHMM(
        label=m.label,
        means=m.means[:, None],
        covariances=m.covariances[:, None],
        weights=np.ones((m.num_states, 1), np.float32),
        log_a=m.log_a,
    )


def test_k1_gmm_decode_matches_gaussian(rng):
    gaussians = {l: mk_gaussian(l, rng) for l in "ABC"}
    gmms = {l: to_k1_gmm(m) for l, m in gaussians.items()}
    feats = [rng.normal(size=(20, 4)).astype(np.float32) * 2 for _ in range(4)]

    dec_g = ContinuousDecoder(gaussians, penalty=-3.0)
    dec_m = ContinuousDecoder(gmms, penalty=-3.0)
    assert dec_m._gmm is not None
    sg, pg, _ = dec_g.viterbi_batch(feats)
    sm, pm, _ = dec_m.viterbi_batch(feats)
    np.testing.assert_allclose(sm, sg, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(pm, pg)
    assert dec_m.predict_batch(feats) == dec_g.predict_batch(feats)


def test_mixed_gaussian_and_gmm_models(rng):
    models = {
        "A": mk_gaussian("A", rng),
        "B": to_k1_gmm(mk_gaussian("B", rng)),
    }
    # B gets 2 mixtures: duplicate the component with equal weights — the
    # emission distribution is unchanged, so decode must match all-Gaussian.
    b = models["B"]
    models["B"] = GMMWordHMM(
        label="B",
        means=np.repeat(b.means, 2, axis=1),
        covariances=np.repeat(b.covariances, 2, axis=1),
        weights=np.full((b.num_states, 2), 0.5, np.float32),
        log_a=b.log_a,
    )
    feats = [rng.normal(size=(15, 4)).astype(np.float32) * 2 for _ in range(3)]
    dec = ContinuousDecoder(models, penalty=-3.0)
    preds = dec.predict_batch(feats)
    # The duplicated-component GMM for B is distribution-identical to the
    # single Gaussian, so the mixed decode must equal the all-Gaussian one.
    gaussian_b = WordHMM(
        label="B", means=b.means[:, 0], covariances=b.covariances[:, 0],
        log_a=b.log_a,
    )
    dec_ref = ContinuousDecoder({"A": models["A"], "B": gaussian_b}, penalty=-3.0)
    assert preds == dec_ref.predict_batch(feats)


def test_bucketed_decode_matches_unbucketed(rng):
    gaussians = {l: mk_gaussian(l, rng) for l in "ABC"}
    dec = ContinuousDecoder(gaussians, penalty=-3.0)
    # Mixed lengths spanning multiple 128-frame buckets.
    feats = [
        rng.normal(size=(t, 4)).astype(np.float32) * 2
        for t in (20, 150, 300, 40, 260)
    ]
    sb, pb, lb = dec.viterbi_batch(feats, bucket=True)
    su, pu, lu = dec.viterbi_batch(feats, bucket=False)
    np.testing.assert_allclose(sb, su, rtol=1e-5)
    np.testing.assert_array_equal(lb, lu)
    for i, f in enumerate(feats):
        np.testing.assert_array_equal(pb[i, : f.shape[0]], pu[i, : f.shape[0]])
    assert dec.predict_batch(feats) == [
        dec.predict(f) for f in feats
    ]


def test_predict_batches_double_buffered(rng):
    gaussians = {l: mk_gaussian(l, rng) for l in "AB"}
    dec = ContinuousDecoder(gaussians, penalty=-3.0)
    batches = [
        [rng.normal(size=(t, 4)).astype(np.float32) * 2 for t in lens]
        for lens in ([20, 35], [40], [15, 25, 30])
    ]
    streamed = list(dec.predict_batches(iter(batches)))
    assert len(streamed) == 3
    for batch, preds in zip(batches, streamed):
        assert preds == dec.predict_batch(batch)


def test_gmm_quad_log_pdf_matches_whitening(rng):
    """gmm_log_pdf_quad == gmm_log_pdf within the quad layout's drift
    contract, including zero-weight padded mixtures dropping out."""
    import jax.numpy as jnp

    from cs304_tpu.ops.gaussian import (
        gmm_log_pdf,
        gmm_log_pdf_quad,
        make_gmm_params,
        make_gmm_quad_params,
    )

    s, k, d, t = 6, 3, 5, 24
    a = rng.normal(size=(s, k, d, 2)).astype(np.float32)
    covs = a @ a.transpose(0, 1, 3, 2) + np.eye(d, dtype=np.float32)
    means = rng.normal(size=(s, k, d)).astype(np.float32) * 2
    weights = rng.uniform(0.2, 1.0, size=(s, k)).astype(np.float32)
    weights[:, -1] = 0.0  # padded mixture: log(0) weight must drop out
    weights /= weights.sum(axis=1, keepdims=True)
    frames = rng.normal(size=(t, d)).astype(np.float32) * 2

    want = gmm_log_pdf(
        make_gmm_params(jnp.asarray(means), jnp.asarray(covs),
                        jnp.asarray(weights)),
        jnp.asarray(frames),
    )
    got = gmm_log_pdf_quad(
        make_gmm_quad_params(jnp.asarray(means), jnp.asarray(covs),
                             jnp.asarray(weights)),
        jnp.asarray(frames),
    )
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=5e-2
    )


def test_gmm_decoder_quad_emissions_agree(rng):
    """ContinuousDecoder(emissions='quad') on GMM checkpoints: same
    transcripts as the whitening layout on well-separated models."""
    def mk_gmm(label, center):
        s, k, d = 3, 2, 4
        means = np.stack([
            np.full((s, d), center, np.float32),
            np.full((s, d), center + 0.5, np.float32),
        ], axis=1)
        covs = np.tile(np.eye(d, dtype=np.float32), (s, k, 1, 1))
        w = np.full((s, k), 0.5, np.float32)
        return GMMWordHMM(label=label, means=means, covariances=covs,
                          weights=w, log_a=uniform_forward_log_a(s))

    models = {"A": mk_gmm("A", -4.0), "B": mk_gmm("B", 4.0),
              "S": mk_gaussian("S", rng)}
    clips = []
    for c in (-4.0, 4.0):
        clips.append(np.full((18, 4), c, np.float32)
                     + rng.normal(0, 0.2, (18, 4)).astype(np.float32))
    ref = ContinuousDecoder(models, penalty=-8.0).predict_batch(clips)
    quad = ContinuousDecoder(models, penalty=-8.0,
                             emissions="quad").predict_batch(clips)
    fast = ContinuousDecoder(models, penalty=-8.0, emissions="quad",
                             emission_precision="high").predict_batch(clips)
    assert ref == quad == fast == ["A", "B"]
