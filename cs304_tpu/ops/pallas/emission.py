"""Fused Gaussian-emission Pallas kernel: (frames, 39) -> (frames, S) log-pdfs.

The XLA whitening path (ops/gaussian.py:gaussian_log_pdf) materializes the
(T, S, D) whitened tensor in HBM — 1.4 GB per B=1024 batch — before reducing
it; that HBM round-trip is ~70% of its 6.8 ms. This kernel computes the
quadratic form

    logpdf[t, s] = const_s + x_t . lin_s + x2_t . vec(-0.5 P_s),
    x2_t = vec(x_t x_t^T)                       (ops/gaussian.py:96-143)

entirely in VMEM: the (F_BLK, D^2=1521) x2 block is built with a lane-repeat
and a lane-tile (no cross-lane relayouts), and the heavy term is ONE
(F_BLK, 1521) x (1521, S) matmul — K=1521 fills the MXU's full depth, unlike
the whitening form's K=39. Output states are padded to 128 lanes, which is
exactly the layout the scan-free trellis kernel consumes.

Numerics: the one-pass quadratic form carries ~1e-3..1e-2 absolute drift vs
the subtract-then-square whitening path (catastrophic-cancellation residual at
f32; see GaussianQuadParams). That is far below emission contrasts between
states (O(1-10)) and does not move decode output in practice, but it is NOT
bit-comparable — serving uses it (ContinuousDecoder backend "fused"), parity
tests keep gaussian_log_pdf. Replaces per-frame scipy logpdf calls at
reference hidden_markov_model.py:189,526.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _dot_bf16(a, b):
    """One bf16 x bf16 -> f32 MXU pass (contract last dim of a with first
    of b). Mosaic's native mixed-precision mode: bf16 operands, f32
    accumulate."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split_hi_lo(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo == x to ~16 mantissa bits.

    This is the operand split behind jax.lax.Precision.HIGH on TPU: the MXU
    runs 3 bf16 passes hi@hi + hi@lo + lo@hi, dropping only the lo@lo term
    (O(2^-16) relative). Done in-kernel on the VPU (two converts + one
    subtract), or ahead of time for streamed parameters."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(x_hi, x_lo, w_hi, w_lo):
    """3-pass bf16 product of the split operands == Precision.HIGH."""
    return (_dot_bf16(x_hi, w_hi) + _dot_bf16(x_hi, w_lo)
            + _dot_bf16(x_lo, w_hi))


def _build_x2(frames):
    """(F_BLK, D) -> (F_BLK, D*D) x2[t, i*D+j] = x[t,i]*x[t,j] (exact f32).

    stretch = [x0 x0 ... x0, x1 x1 ...] (element i broadcast over chunk i),
    tiled = [x0 x1 ... xD, x0 x1 ...] (the row tiled D times). NB
    pltpu.repeat TILES (concat copies) — it cannot build `stretch`; the
    chunk-broadcast loop is static lane-selects, no relayout."""
    f_blk, d = frames.shape
    stretch = jnp.concatenate(
        [jnp.broadcast_to(frames[:, i:i + 1], (f_blk, d)) for i in range(d)],
        axis=1,
    )
    tiled = jnp.concatenate([frames] * d, axis=1)
    return stretch * tiled


def _emission_kernel(nhp_ref, lin_ref, const_ref, frames_ref, out_ref,
                     *, precision):
    """nhp (D*D, S_pad) f32, lin (D, S_pad), const (8, S_pad) row 0,
    frames (F_BLK, D) -> out (F_BLK, S_pad)."""
    frames = frames_ref[:]
    x2 = _build_x2(frames)
    quad = jax.lax.dot_general(
        x2, nhp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    lin = jax.lax.dot_general(
        frames, lin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    out_ref[:] = quad + lin + const_ref[0:1, :]


def _emission_kernel_selmm(nhp_ref, lin_ref, const_ref, ssel_ref, tsel_ref,
                           frames_ref, out_ref, *, precision):
    """Like _emission_kernel, but builds the x2 block with two selector
    MATMULS (MXU) instead of the 39-way broadcast concat (VPU lane-select
    chain): stretch = frames @ S_sel, tiled = frames @ T_sel with 0/1
    selectors. At HIGHEST the product x*1 is reconstructed exactly, so the
    result is bitwise-identical to the concat build."""
    frames = frames_ref[:]
    stretch = jax.lax.dot_general(
        frames, ssel_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    tiled = jax.lax.dot_general(
        frames, tsel_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    x2 = stretch * tiled
    quad = jax.lax.dot_general(
        x2, nhp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    lin = jax.lax.dot_general(
        frames, lin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    out_ref[:] = quad + lin + const_ref[0:1, :]


def _emission_kernel_blocked(nhp_ref, lin_ref, const_ref, frames_ref, out_ref,
                             x2_scr, *, precision):
    """State-blocked variant for S_PAD > 128 lanes (multi-tile composites,
    round 4): grid (frame blocks, state blocks), the state dimension
    innermost. The (F_BLK, D^2) x2 expansion is built ONCE per frame block
    (at state block j == 0) into VMEM scratch and reused across the state
    tiles, so the heavy work per (i, j) step is exactly one
    (F_BLK, D^2) x (D^2, S_BLK) MXU matmul."""
    j = pl.program_id(1)
    frames = frames_ref[:]

    @pl.when(j == 0)
    def _():
        x2_scr[:] = _build_x2(frames)

    quad = jax.lax.dot_general(
        x2_scr[:], nhp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    lin = jax.lax.dot_general(
        frames, lin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    out_ref[:] = quad + lin + const_ref[0:1, :]


def _emission_kernel_high(nhp_hi_ref, nhp_lo_ref, lin_ref, const_ref,
                          frames_ref, out_ref):
    """Single-tile 3-pass "high" tier (VERDICT r4 item #1): the heavy
    (F_BLK, D^2) x (D^2, S_pad) quadratic term runs as bf16 hi/lo passes
    hi@hi + hi@lo + lo@hi == jax.lax.Precision.HIGH, which Mosaic exposes no
    dot tier for — so the decomposition is done by hand. x2 itself is built
    exactly in f32 on the VPU before the split; the cheap K=D linear term
    stays HIGHEST (6 passes of a K=39 matmul, ~5% of the quad's passes)."""
    frames = frames_ref[:]
    x2_hi, x2_lo = _split_hi_lo(_build_x2(frames))
    quad = _dot3(x2_hi, x2_lo, nhp_hi_ref[:], nhp_lo_ref[:])
    lin = jax.lax.dot_general(
        frames, lin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = quad + lin + const_ref[0:1, :]


def _emission_kernel_blocked_high(nhp_hi_ref, nhp_lo_ref, lin_ref, const_ref,
                                  frames_ref, out_ref, x2h_scr, x2l_scr):
    """State-blocked 3-pass "high" tier for S_PAD > 128 (the large-vocabulary
    flagship path). The f32 x2 expansion is built + hi/lo-split ONCE per
    frame block (state block j == 0) into two bf16 VMEM scratches — the same
    bytes as the HIGHEST path's one f32 scratch — and each (i, j) step then
    runs 3 bf16 MXU passes instead of HIGHEST's 6."""
    j = pl.program_id(1)
    frames = frames_ref[:]

    @pl.when(j == 0)
    def _():
        x2_hi, x2_lo = _split_hi_lo(_build_x2(frames))
        x2h_scr[:] = x2_hi
        x2l_scr[:] = x2_lo

    quad = _dot3(x2h_scr[:], x2l_scr[:], nhp_hi_ref[:], nhp_lo_ref[:])
    lin = jax.lax.dot_general(
        frames, lin_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = quad + lin + const_ref[0:1, :]


def _selectors(d: int):
    """0/1 selector matrices: stretch = x @ S_sel, tiled = x @ T_sel."""
    ssel = np.zeros((d, d * d), np.float32)
    tsel = np.zeros((d, d * d), np.float32)
    for i in range(d):
        for j in range(d):
            ssel[i, i * d + j] = 1.0
            tsel[j, i * d + j] = 1.0
    return jnp.asarray(ssel), jnp.asarray(tsel)


def _pack_quad_params(means, covariances, s_pad: int):
    """Quadratic-form parameters padded to s_pad state lanes.

    Padded states get log-density 0 everywhere (harmless: the trellis keeps
    their alpha at -inf via -inf transition coefficients)."""
    from ..gaussian import make_gaussian_quad_params

    qp = make_gaussian_quad_params(means, covariances)
    s, dd = qp.neg_half_p.shape
    d = qp.lin.shape[0]
    nhp = jnp.zeros((dd, s_pad), jnp.float32).at[:, :s].set(qp.neg_half_p.T)
    lin = jnp.zeros((d, s_pad), jnp.float32).at[:, :s].set(qp.lin)
    const = jnp.zeros((8, s_pad), jnp.float32).at[0, :s].set(qp.const)
    return nhp, lin, const


@partial(jax.jit, static_argnames=("s_pad", "interpret", "f_blk", "precision",
                                   "x2_mode"))
def gaussian_log_pdf_fused(
    means, covariances, frames_flat, s_pad: int = LANES,
    interpret: bool = False, f_blk: int = 512, precision: str = "highest",
    x2_mode: str = "concat",
):
    """(N, D) frames -> (N, s_pad) emission log-densities, states padded.

    N must be a multiple of 8. precision: "default" (1-pass bf16 — measured
    WRONG at this feature scale, ROADMAP r4), "high" (3-pass bf16 hi/lo
    decomposition done by hand in-kernel == jax.lax.Precision.HIGH, the
    validated fast tier — Mosaic exposes no HIGH dot tier, so the operands
    are split and the passes hi@hi + hi@lo + lo@hi summed explicitly), or
    "highest" (6-pass, f32-exact, the parity contract).
    x2_mode: how the kernel builds the (F_BLK, D^2) x2 block — "concat"
    (broadcast/lane-select chain on the VPU) or "selmm" (two 0/1-selector
    matmuls on the MXU; bitwise-identical output, see
    benchmarks/emission_variants.py for the measured difference).

    s_pad may be any multiple of 128: past one lane register the kernel
    switches to a 2D (frame blocks, state blocks) grid with the x2
    expansion cached in VMEM scratch per frame block (multi-tile states,
    round 4 — the large-vocabulary serving lever). The blocked path always
    builds x2 with the concat chain (it runs once per frame block, so the
    selmm MXU trick has nothing to amortize); x2_mode is ignored there.
    """
    n, d = frames_flat.shape
    if s_pad % LANES:
        raise ValueError(f"s_pad {s_pad} must be a multiple of {LANES}")
    if precision not in ("default", "high", "highest"):
        raise ValueError(f"unknown precision {precision!r}")
    prec = (jax.lax.Precision.DEFAULT if precision == "default"
            else jax.lax.Precision.HIGHEST)
    from functools import partial as _partial

    nhp, lin, const = _pack_quad_params(means, covariances, s_pad)
    if precision == "high":
        # The streamed quad parameters are hi/lo-split ahead of time (XLA
        # side, once per call): same streamed bytes as one f32 array.
        nhp_hi, nhp_lo = _split_hi_lo(nhp)
    if s_pad > LANES:
        # Blocked path: smaller frame tile (the x2 scratch + streamed nhp
        # tiles share VMEM), state tiles of up to 512 lanes.
        f_blk = min(f_blk, 256)
        s_blk = 512 if s_pad % 512 == 0 else (
            256 if s_pad % 256 == 0 else LANES)
        while n % f_blk:
            f_blk //= 2
        grid2 = (n // f_blk, s_pad // s_blk)

        qspec = pl.BlockSpec((d * d, s_blk), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
        tail_specs = [
            pl.BlockSpec((d, s_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, s_blk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_blk, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        if precision == "high":
            kernel2 = _emission_kernel_blocked_high
            in_specs2 = [qspec, qspec] + tail_specs
            args2 = (nhp_hi, nhp_lo, lin, const, frames_flat)
            # Two bf16 scratches == the HIGHEST path's one f32 scratch.
            scratch2 = [pltpu.VMEM((f_blk, d * d), jnp.bfloat16),
                        pltpu.VMEM((f_blk, d * d), jnp.bfloat16)]
        else:
            kernel2 = _partial(_emission_kernel_blocked, precision=prec)
            in_specs2 = [qspec] + tail_specs
            args2 = (nhp, lin, const, frames_flat)
            scratch2 = [pltpu.VMEM((f_blk, d * d), jnp.float32)]
        return pl.pallas_call(
            kernel2,
            grid=grid2,
            in_specs=in_specs2,
            out_specs=pl.BlockSpec((f_blk, s_blk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, s_pad), jnp.float32),
            scratch_shapes=scratch2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                # The default 16 MiB scoped limit is too tight once the
                # double-buffered (D^2, s_blk) nhp tiles + the x2 scratch +
                # the concat chain's stack temporaries add up (~20 MiB
                # measured at s_pad=1024); v5e has 128 MiB.
                vmem_limit_bytes=64 * 2**20,
            ),
            interpret=interpret,
        )(*args2)
    while n % f_blk:
        f_blk //= 2
    grid = (n // f_blk,)
    param_specs = [
        pl.BlockSpec((d * d, s_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, s_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, s_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    frame_spec = pl.BlockSpec((f_blk, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    if precision == "high":
        kernel = _emission_kernel_high
        in_specs = [param_specs[0]] + param_specs + [frame_spec]
        args = (nhp_hi, nhp_lo, lin, const, frames_flat)
    elif x2_mode == "selmm":
        kernel = _partial(_emission_kernel_selmm, precision=prec)
        ssel, tsel = _selectors(d)
        sel_spec = pl.BlockSpec((d, d * d), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        in_specs = param_specs + [sel_spec, sel_spec, frame_spec]
        args = (nhp, lin, const, ssel, tsel, frames_flat)
    else:
        kernel = _partial(_emission_kernel, precision=prec)
        in_specs = param_specs + [frame_spec]
        args = (nhp, lin, const, frames_flat)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((f_blk, s_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*args)


def decode_batch_fused(
    means, covs, log_a, lower_of_state, is_entry, is_exit, penalty,
    batch_feats, lengths, quirk_backtrace: bool = True,
    interpret: bool | None = None, precision: str = "highest",
):
    """Serving fast path: fused emission kernel + scan-free trellis pair.

    batch_feats (B, T, D) float32 features, lengths (B,) -> (scores, paths).
    Emissions never touch HBM in (T, S, D) form and arrive already padded to
    the trellis kernel's lane layout (a multiple of 128 — multi-tile past
    128 states, so large-vocabulary composites up to MAX_STATES ride the
    same kernel pair).
    """
    from .trellis_scanfree import MAX_STATES, _choose_tiles, _scanfree_impl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_total, d = batch_feats.shape
    s = means.shape[0]
    s_pad = -(-s // LANES) * LANES
    if (
        s > MAX_STATES or t_total < 2 or (b * t_total) % 8
        or _choose_tiles(b, t_total - 1, s_pad) is None
    ):
        from ..gaussian import gaussian_log_pdf, make_gaussian_params
        from ..viterbi import viterbi_composite_batch_fast

        params = make_gaussian_params(means, covs)
        log_b = jax.vmap(lambda x: gaussian_log_pdf(params, x))(batch_feats)
        return viterbi_composite_batch_fast(
            log_b, log_a, lower_of_state, is_entry, is_exit, penalty, lengths,
            quirk_backtrace=quirk_backtrace,
        )

    frames_flat = batch_feats.reshape(b * t_total, d)
    log_b_pad = gaussian_log_pdf_fused(
        means, covs, frames_flat, s_pad=s_pad, interpret=interpret,
        precision=precision,
    ).reshape(b, t_total, s_pad)
    return _scanfree_impl(
        log_b_pad, log_a, lower_of_state, is_entry, is_exit, penalty,
        jnp.asarray(lengths, jnp.int32), quirk_backtrace, interpret,
        states_prepadded=s,
    )
