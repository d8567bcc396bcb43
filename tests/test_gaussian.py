"""Gaussian/GMM emission kernels vs scipy.stats.multivariate_normal."""
import numpy as np
import scipy.stats

from cs304_tpu.ops.gaussian import (
    gaussian_log_pdf,
    gmm_log_pdf,
    make_gaussian_params,
    make_gmm_params,
)


def random_spd(rng, d):
    a = rng.normal(size=(d, d))
    return a @ a.T + d * np.eye(d)


def test_gaussian_log_pdf_matches_scipy(rng):
    s, d, t = 4, 7, 11
    means = rng.normal(size=(s, d)).astype(np.float32)
    covs = np.stack([random_spd(rng, d) for _ in range(s)]).astype(np.float32)
    frames = rng.normal(size=(t, d)).astype(np.float32)

    params = make_gaussian_params(means, covs)
    got = np.asarray(gaussian_log_pdf(params, frames))

    want = np.stack(
        [
            scipy.stats.multivariate_normal(means[i], covs[i]).logpdf(frames)
            for i in range(s)
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_gmm_k1_equals_gaussian(rng):
    s, d, t = 3, 5, 9
    means = rng.normal(size=(s, 1, d)).astype(np.float32)
    covs = np.stack([[random_spd(rng, d)] for _ in range(s)]).astype(np.float32)
    weights = np.ones((s, 1), np.float32)
    frames = rng.normal(size=(t, d)).astype(np.float32)

    gmm = make_gmm_params(means, covs, weights)
    gauss = make_gaussian_params(means[:, 0], covs[:, 0])
    np.testing.assert_allclose(
        np.asarray(gmm_log_pdf(gmm, frames)),
        np.asarray(gaussian_log_pdf(gauss, frames)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_gmm_matches_manual_logsumexp(rng):
    s, k, d, t = 2, 3, 4, 6
    means = rng.normal(size=(s, k, d)).astype(np.float32)
    covs = np.stack(
        [[random_spd(rng, d) for _ in range(k)] for _ in range(s)]
    ).astype(np.float32)
    weights = rng.dirichlet(np.ones(k), size=s).astype(np.float32)
    frames = rng.normal(size=(t, d)).astype(np.float32)

    got = np.asarray(gmm_log_pdf(make_gmm_params(means, covs, weights), frames))

    want = np.zeros((t, s))
    for i in range(s):
        comp = np.stack(
            [
                scipy.stats.multivariate_normal(means[i, j], covs[i, j]).logpdf(frames)
                for j in range(k)
            ],
            axis=-1,
        )
        want[:, i] = scipy.special.logsumexp(comp + np.log(weights[i]), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_quad_form_matches_whitening(rng):
    from cs304_tpu.ops.gaussian import (
        gaussian_log_pdf_quad,
        make_gaussian_quad_params,
    )

    s, d, t = 5, 39, 30
    means = rng.normal(size=(s, d)).astype(np.float32)
    covs = np.stack([random_spd(rng, d) for _ in range(s)]).astype(np.float32)
    frames = rng.normal(size=(t, d)).astype(np.float32) * 3

    whiten = gaussian_log_pdf(make_gaussian_params(means, covs), frames)
    quad = gaussian_log_pdf_quad(make_gaussian_quad_params(means, covs), frames)
    # One-pass form: looser tolerance (documented in GaussianQuadParams).
    np.testing.assert_allclose(
        np.asarray(quad), np.asarray(whiten), rtol=1e-3, atol=5e-2
    )
