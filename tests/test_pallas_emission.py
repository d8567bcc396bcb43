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


def test_high_tier_matches_xla_high(rng):
    """precision="high" (in-kernel 3-pass bf16 hi/lo decomposition, round 5)
    must carry error vs the f32-exact path comparable to XLA's
    Precision.HIGH on the same quadratic form — the decomposition IS what
    HIGH means on the MXU — and be far more accurate than the 1-pass
    "default" tier."""
    import jax

    from cs304_tpu.ops.gaussian import (
        gaussian_log_pdf_quad,
        make_gaussian_quad_params,
    )

    s, d, n = 6, 5, 32
    means, covs = _random_gaussians(rng, s, d)
    # Realistic feature magnitudes: the x2 term's dynamic range is the
    # thing the tier exists to survive.
    frames = (5.0 * rng.normal(size=(n, d))).astype(np.float32)

    qp = make_gaussian_quad_params(jnp.asarray(means), jnp.asarray(covs))
    exact = np.asarray(gaussian_log_pdf_quad(
        qp, jnp.asarray(frames), precision=jax.lax.Precision.HIGHEST))
    xla_high = np.asarray(gaussian_log_pdf_quad(
        qp, jnp.asarray(frames), precision=jax.lax.Precision.HIGH))

    got_high = np.asarray(gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        interpret=True, f_blk=16, precision="high",
    ))[:, :s]
    got_default = np.asarray(gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        interpret=True, f_blk=16, precision="default",
    ))[:, :s]

    err_high = np.max(np.abs(got_high - exact))
    err_xla_high = np.max(np.abs(xla_high - exact))
    err_default = np.max(np.abs(got_default - exact))
    # Same error class as XLA HIGH (sum order may differ slightly); floor
    # avoids a vacuous bound when XLA HIGH lands exactly on HIGHEST
    # (CPU backends implement every tier as f32).
    assert err_high <= 4.0 * err_xla_high + 1e-3
    # And meaningfully tighter than the 1-pass tier whenever that tier
    # actually loses bits (on TPU it does; interpret-mode CPU may not).
    if err_default > 1e-2:
        assert err_high < 0.1 * err_default


def test_high_tier_multitile_states(rng):
    """The blocked (S_PAD > 128) high kernel: same hi/lo scratch reuse
    across state tiles, error small vs the exact path."""
    s, d, n = 150, 7, 32  # s_pad=256 -> two state tiles
    means, covs = _random_gaussians(rng, s, d)
    frames = (3.0 * rng.normal(size=(n, d))).astype(np.float32)

    want = gaussian_log_pdf(
        make_gaussian_params(jnp.asarray(means), jnp.asarray(covs)),
        jnp.asarray(frames),
    )
    got = gaussian_log_pdf_fused(
        jnp.asarray(means), jnp.asarray(covs), jnp.asarray(frames),
        s_pad=256, interpret=True, f_blk=16, precision="high",
    )
    assert got.shape == (n, 256)
    # 3-pass keeps ~16 mantissa bits on the quad term: tolerance sits
    # between HIGHEST's 1e-3 and default-bf16's O(1) drift.
    np.testing.assert_allclose(
        np.asarray(got)[:, :s], np.asarray(want), rtol=2e-3, atol=5e-2
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
