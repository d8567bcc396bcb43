"""Fused Pallas emission kernel == whitening-path log-densities (interpret).

Covers both x2 builds: "concat" (VPU broadcast chain, serving default) and
"selmm" (0/1-selector matmuls) — the two must agree bitwise, since selmm
reconstructs exactly the same x2 block through exact-f32 multiplies by 1.
"""
import jax.numpy as jnp
import numpy as np

from cs304_tpu.ops.gaussian import gaussian_log_pdf, make_gaussian_params
from cs304_tpu.ops.pallas.emission import gaussian_log_pdf_fused


def _random_gaussians(rng, s, d):
    means = rng.normal(size=(s, d)).astype(np.float32)
    a = rng.normal(size=(s, d, d)).astype(np.float32)
    covs = np.einsum("sij,skj->sik", a, a) + 2.0 * np.eye(d, dtype=np.float32)
    return means, covs


def test_fused_emission_matches_whitening(rng):
    s, d, n = 6, 5, 32
    means, covs = _random_gaussians(rng, s, d)
    frames = rng.normal(size=(n, d)).astype(np.float32)

    want = gaussian_log_pdf(
        make_gaussian_params(jnp.asarray(means), jnp.asarray(covs)),
        jnp.asarray(frames),
    )
    got = gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        interpret=True, f_blk=16,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :s], np.asarray(want), rtol=1e-4, atol=1e-3
    )


def test_fused_emission_multitile_states(rng):
    """s_pad > 128 switches to the state-blocked 2D grid (multi-tile states,
    round 4): same quadratic form, x2 cached in scratch across state tiles."""
    s, d, n = 150, 7, 32  # s_pad=256 -> two 128-lane state tiles
    means, covs = _random_gaussians(rng, s, d)
    frames = rng.normal(size=(n, d)).astype(np.float32)

    want = gaussian_log_pdf(
        make_gaussian_params(jnp.asarray(means), jnp.asarray(covs)),
        jnp.asarray(frames),
    )
    got = gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        s_pad=256, interpret=True, f_blk=16,
    )
    assert got.shape == (n, 256)
    np.testing.assert_allclose(
        np.asarray(got)[:, :s], np.asarray(want), rtol=1e-4, atol=1e-3
    )


def test_selmm_mode_bitwise_equals_concat(rng):
    s, d, n = 6, 5, 32
    means, covs = _random_gaussians(rng, s, d)
    frames = rng.normal(size=(n, d)).astype(np.float32)

    concat = gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        interpret=True, f_blk=16, x2_mode="concat",
    )
    selmm = gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        interpret=True, f_blk=16, x2_mode="selmm",
    )
    np.testing.assert_array_equal(np.asarray(selmm), np.asarray(concat))
