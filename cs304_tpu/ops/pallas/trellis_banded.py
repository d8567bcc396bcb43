"""Scan-free banded Viterbi for the TRAINING sentence trellis.

The embedded trainers (models/train_fused.py) align every utterance against
its sentence topology with a banded 3-diagonal max-plus recursion. As an XLA
scan that pays the same per-step while-loop overhead the serving trellis paid
(~13-25 us x T sequential steps — see trellis_scanfree.py, which removed it
for the composite decode): at flagship training scale the forward scan +
backtrace are the largest single slice of the fused iteration.

Same layout as the serving kernel — states in lanes, batch in sublanes, time
statically unrolled over VMEM blocks — with one difference: the transition
coefficients are PER-UTTERANCE rows (each utterance aligns against its own
sentence topology), so the coefficient tensor is (B, 8, LANES) blocked over
the batch grid instead of a single broadcast (8, LANES) table.

Semantics are exactly models.train_fused._banded_trellis_batch (same
first-max tie-breaks: skip-2 wins exact ties, then skip-1; same degenerate-
safe init; same live-step masking; same reference backtrace quirk) —
asserted by tests/test_pallas_banded.py. The backtrace kernel is shared with
trellis_scanfree (it is topology-agnostic: it only reads backpointers).

Reference hot loop being replaced: hidden_markov_model.py:160-208 run over
the concatenated sentence states (via the fused trainer's banded layout).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trellis_scanfree import _backtrace_kernel, _choose_tiles

LANES = 128
NEG = np.float32(-np.inf)


def _forward_banded_kernel(
    coef_ref,     # (TILE_B, 8, LANES) f32: rows 0/1/2 = c0/c1/c2 per utterance
    lengths_ref,  # (TILE_B, 1) i32
    alpha0_ref,   # (TILE_B, LANES) f32 — precomputed t=0 row
    log_b_ref,    # (TILE_B, TB, LANES) f32 — frames 1..Tpad
    alpha_ref,    # out (TILE_B, LANES) f32
    bp_ref,       # out (TILE_B, TB, LANES) i32
    alpha_scr,    # scratch (TILE_B, LANES) f32
):
    j = pl.program_id(1)
    tile_b, tb, lanes = log_b_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, lanes), 1)
    c0 = coef_ref[:, 0, :]
    c1 = coef_ref[:, 1, :]
    c2 = coef_ref[:, 2, :]

    @pl.when(j == 0)
    def _():
        alpha_scr[:] = alpha0_ref[:]

    lengths = lengths_ref[:]  # (TILE_B, 1)
    for k in range(tb):  # static unroll — no dynamic ref indexing
        t = j * tb + k + 1
        alpha = alpha_scr[:]
        lb = log_b_ref[:, k, :]
        a1 = pltpu.roll(alpha, shift=1, axis=1)
        a1 = jnp.where(lane >= 1, a1, NEG)
        a2 = pltpu.roll(alpha, shift=2, axis=1)
        a2 = jnp.where(lane >= 2, a2, NEG)
        cand0 = alpha + c0
        cand1 = a1 + c1
        cand2 = a2 + c2
        # _banded_trellis_batch candidate order: start from skip-2, replace
        # only on STRICT improvement — so ties keep the smallest predecessor.
        v01 = jnp.maximum(cand1, cand0)
        best = jnp.maximum(cand2, v01)
        bp = jnp.where(
            cand2 >= v01,
            jnp.maximum(lane - 2, 0),
            jnp.where(cand1 >= cand0, jnp.maximum(lane - 1, 0), lane),
        )
        new_alpha = best + lb
        live = t < lengths
        alpha_scr[:] = jnp.where(live, new_alpha, alpha)
        bp_ref[:, k, :] = bp

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        alpha_ref[:] = alpha_scr[:]


def viterbi_banded_batch_scanfree(
    log_b, c0, c1, c2, lengths, n_states, interpret: bool | None = None,
):
    """Scan-free drop-in for train_fused._banded_trellis_batch on S <= 128.

    log_b (B, T, S) f32, per-utterance destination-indexed banded
    coefficients c0/c1/c2 (B, S), lengths (B,), n_states (B,) ->
    (scores (B,), paths (B, T) i32, with the reference final-frame quirk
    applied). Shapes the kernel cannot tile fall back to the scan.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_total, s = log_b.shape
    if s > LANES or t_total < 2 or _choose_tiles(b, t_total - 1) is None:
        from ...models.train_fused import _banded_trellis_batch

        return _banded_trellis_batch(log_b, c0, c1, c2, lengths, n_states)
    return _banded_impl(log_b, c0, c1, c2, lengths, n_states, interpret)


@partial(jax.jit, static_argnames=("interpret",))
def _banded_impl(log_b, c0, c1, c2, lengths, n_states, interpret: bool):
    b, t_total, s = log_b.shape
    # One batch tile for both kernels: at 128 state lanes the forward and
    # backtrace tiles coincide (the backtrace-legal {256, 128, b} ladder
    # always fits the VMEM budget here), so take the backtrace's.
    _tile_f, tile_b, tb = _choose_tiles(b, t_total - 1)
    n_steps = t_total - 1
    t_pad = -(-max(n_steps, 1) // tb) * tb
    n_blocks = t_pad // tb

    def pad_lanes(v, fill):
        out = jnp.full((b, LANES), fill, jnp.float32)
        return out.at[:, :s].set(v.astype(jnp.float32))

    coefs = jnp.stack(
        [pad_lanes(c0, NEG), pad_lanes(c1, NEG), pad_lanes(c2, NEG)]
        + [jnp.zeros((b, LANES), jnp.float32)] * 5,
        axis=1,
    )  # (B, 8, LANES)

    # Degenerate-safe t=0 row (train_fused._banded_trellis_batch:alpha0).
    a00 = jnp.where(jnp.isfinite(c0[:, 0]), c0[:, 0], 0.0)
    alpha0 = jnp.full((b, LANES), NEG, jnp.float32).at[:, 0].set(
        log_b[:, 0, 0].astype(jnp.float32) + a00
    )

    logb_pad = jnp.full((b, t_pad, LANES), 0.0, jnp.float32)
    logb_pad = logb_pad.at[:, : t_total - 1, :s].set(
        log_b[:, 1:].astype(jnp.float32)
    )

    lengths = jnp.asarray(lengths, jnp.int32)
    lengths_col = lengths[:, None]
    grid = (b // tile_b, n_blocks)
    alpha, bps = pl.pallas_call(
        _forward_banded_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 8, LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, tb, LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, tb, LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(coefs, lengths_col, alpha0, logb_pad)

    final = jnp.maximum(n_states - 1, 0).astype(jnp.int32)
    scores = jnp.take_along_axis(alpha, final[:, None], axis=1)[:, 0]

    path_steps, final_state = pl.pallas_call(
        _backtrace_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, tb, LANES),
                         lambda i, j: (i, n_blocks - 1 - j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, tile_b),
                         lambda i, j: (n_blocks - 1 - j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths_col, final[:, None], bps)

    paths = jnp.concatenate([final_state, path_steps.T], axis=1)[:, :t_total]
    # Reference final-frame quirk (train_fused uses _backtrace(quirk=True)).
    bidx = jnp.arange(b)
    last = jnp.maximum(lengths - 1, 0)
    second = jnp.maximum(lengths - 2, 0)
    paths = paths.at[bidx, last].set(paths[bidx, second])
    return scores, paths.astype(jnp.int32)
