"""States-in-lanes Pallas kernel for the fast composite trellis (v3).

Layout: alpha is (B_blk=64 sublanes = utterances, 128 lanes = states). Every
per-step operation of the fast composite update is now a native LANE op:
banded predecessor shifts are lane rotations, the shared exit pool is a lane
reduction, and the whole (64, 128) tile covers 64 utterances per step — v2's
failure mode (sublane shuffles) does not apply.

Same semantics as ops/viterbi.viterbi_composite_batch_fast.

MEASURED RESULT (v5e, B=1024, T=256, S=58): 188 ms vs the fast scan's 15 ms —
same order as the sublane-oriented v2 (177 ms). With both orientations losing
identically, the bottleneck is NOT op orientation but the per-time-step
dynamic ref indexing (log_b_ref[0, t] loads / bp_ref[0, t] stores) inside the
kernel loop; XLA's scan pipelines those better. Conclusive negative result
for hand-written trellis kernels at this state count — the scan stays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_LANES = 128
B_SUB = 64
NEG = np.float32(-np.inf)


def _kernel(
    coef_ref,      # (8, 8, 128) f32 rows: diag_ne, sub1, sub2, diag_e, entry, exit, to, penalty
    lengths_ref,   # (1, B_SUB, 128) int32 (length broadcast across lanes)
    alpha0_ref,    # (1, B_SUB, 128) f32
    log_b_ref,     # (1, T_blk, B_SUB, 128) f32
    alpha_out_ref,  # (1, B_SUB, 128) f32
    bp_ref,        # (1, T_blk, B_SUB, 128) int32
    alpha_scr,     # scratch (B_SUB, 128) f32
):
    j = pl.program_id(1)
    t_blk = log_b_ref.shape[1]

    @pl.when(j == 0)
    def _():
        alpha_scr[:] = alpha0_ref[0]

    diag_ne = coef_ref[0, 0:1, :]   # (1, 128) broadcast over sublanes
    sub1 = coef_ref[1, 0:1, :]
    sub2 = coef_ref[2, 0:1, :]
    diag_e = coef_ref[3, 0:1, :]
    entry_mask = coef_ref[4, 0:1, :] > 0.5
    exit_mask = coef_ref[5, 0:1, :] > 0.5
    to_idx = coef_ref[6, 0:1, :].astype(jnp.int32)
    penalty = coef_ref[7, 0, 0]
    lengths = lengths_ref[0]  # (B_SUB, 128)

    def step(t_local, _):
        t_abs = j * t_blk + t_local
        alpha = alpha_scr[:]  # (B_SUB, 128)

        a1 = pltpu.roll(alpha, 1, axis=1)
        a1 = jnp.where(to_idx >= 1, a1, NEG)
        a2 = pltpu.roll(alpha, 2, axis=1)
        a2 = jnp.where(to_idx >= 2, a2, NEG)
        c0 = alpha + diag_ne
        c1 = a1 + sub1
        c2 = a2 + sub2
        v12 = jnp.maximum(c1, c0)
        val_ne = jnp.maximum(c2, v12)
        bp_ne = jnp.where(
            c2 >= v12, jnp.maximum(to_idx - 2, 0),
            jnp.where(c1 >= c0, jnp.maximum(to_idx - 1, 0), to_idx),
        )

        exit_vals = jnp.where(exit_mask, alpha, NEG)
        best_exit = jnp.max(exit_vals, axis=1, keepdims=True)  # (B_SUB, 1)
        best_idx = jnp.argmax(exit_vals, axis=1, keepdims=True).astype(jnp.int32)
        c_pen = best_exit + penalty
        c_self = alpha + diag_e
        val_e = jnp.maximum(c_pen, c_self)
        bp_e = jnp.where(c_pen >= c_self, best_idx, to_idx)

        new_alpha = jnp.where(entry_mask, val_e, val_ne) + log_b_ref[0, t_local]
        bp = jnp.where(entry_mask, bp_e, bp_ne)

        live = (t_abs >= 1) & (t_abs < lengths)
        alpha_scr[:] = jnp.where(live, new_alpha, alpha)
        bp_ref[0, t_local] = jnp.where(t_abs == 0, -1, bp)
        return 0

    jax.lax.fori_loop(0, t_blk, step, 0)
    alpha_out_ref[0] = alpha_scr[:]


@partial(jax.jit, static_argnames=("t_blk", "interpret"))
def viterbi_lanes_forward_pallas(
    log_b: jax.Array,       # (B, T, S)
    log_a: jax.Array,       # (S, S)
    lower_of_state: jax.Array,
    is_entry: jax.Array,
    is_exit: jax.Array,
    penalty,
    lengths: jax.Array,     # (B,)
    t_blk: int = 32,
    interpret: bool = False,
):
    """Returns (alpha_final (B, S), bp (B, T, S) int32)."""
    b, t_total, s = log_b.shape
    assert s <= S_LANES, f"composite has {s} states; kernel supports <= {S_LANES}"
    nb = -(-b // B_SUB)
    b_pad = nb * B_SUB
    t_pad = -(-t_total // t_blk) * t_blk

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

    def pad_s(v, fill):
        return jnp.full((S_LANES,), fill, jnp.float32).at[:s].set(
            v.astype(jnp.float32)
        )

    coef = jnp.stack([
        pad_s(diag_ne, NEG), pad_s(sub1, NEG), pad_s(sub2, NEG),
        pad_s(diag_e, NEG), pad_s(is_entry.astype(jnp.float32), 0.0),
        pad_s(is_exit.astype(jnp.float32), 0.0),
        jnp.arange(S_LANES, dtype=jnp.float32),
        jnp.full((S_LANES,), jnp.asarray(penalty, jnp.float32)),
    ])  # (8, S_LANES)
    coef_b = jnp.broadcast_to(coef[:, None, :], (8, 8, S_LANES))

    lb = jnp.full((b_pad, t_pad, S_LANES), NEG, jnp.float32)
    lb = lb.at[:b, :t_total, :s].set(log_b)
    lb = lb.reshape(nb, B_SUB, t_pad, S_LANES).transpose(0, 2, 1, 3)

    diag_init = jnp.where(jnp.isfinite(diag), diag, 0.0)
    alpha0 = jnp.where(is_entry[None, :], log_b[:, 0, :] + diag_init[None, :], NEG)
    alpha0_p = jnp.full((b_pad, S_LANES), NEG, jnp.float32).at[:b, :s].set(alpha0)
    alpha0_p = alpha0_p.reshape(nb, B_SUB, S_LANES)

    lengths_p = jnp.zeros((b_pad,), jnp.int32).at[:b].set(lengths)
    lengths_p = jnp.broadcast_to(
        lengths_p.reshape(nb, B_SUB, 1), (nb, B_SUB, S_LANES)
    )

    grid = (nb, t_pad // t_blk)
    alpha_out, bp = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 8, S_LANES), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_SUB, S_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B_SUB, S_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blk, B_SUB, S_LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B_SUB, S_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_blk, B_SUB, S_LANES), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, B_SUB, S_LANES), jnp.float32),
            jax.ShapeDtypeStruct((nb, t_pad, B_SUB, S_LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((B_SUB, S_LANES), jnp.float32)],
        interpret=interpret,
    )(coef_b, lengths_p, alpha0_p, lb)

    alpha_final = alpha_out.reshape(b_pad, S_LANES)[:b, :s]
    bp_out = bp.transpose(0, 2, 1, 3).reshape(b_pad, t_pad, S_LANES)[:b, :t_total, :s]
    return alpha_final, bp_out
