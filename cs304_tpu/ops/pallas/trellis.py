"""Pallas TPU kernel for the Viterbi max-plus forward recursion.

The lax.scan trellis (ops/viterbi.py) is correct but pays per-step scan
overhead and round-trips the (B, S) alpha through HBM every frame. This kernel
keeps the whole recursion in VMEM: each grid program loads a block of
utterances' emission matrices once, runs the full T-step fori_loop on-chip
(alpha update + argmax backpointers), and writes the (B_blk, T, S) backpointer
tensor and final alphas back in one go.

State dimension is padded to the 128-lane VPU register width; padded states
hold -inf emissions and transitions, so they never win a max. Padded time
steps are no-ops via the per-utterance length mask, matching the scan path
exactly (ops/viterbi.py:_scan_trellis).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG = np.float32(-np.inf)  # numpy: no device touch at import


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _forward_kernel(trans_ref, lengths_ref, log_b_ref, alpha0_ref,
                    alpha_out_ref, bp_ref):
    """One grid program: B_blk utterances, full T recursion in VMEM.

    trans:   (S, S) f32 (replicated per program)
    lengths: (B_blk, S) int32 in VMEM (length broadcast across the state dim)
    log_b:   (B_blk, T, S) f32
    alpha0:  (B_blk, S) f32
    outputs: alpha (B_blk, S) f32, bp (B_blk, T, S) int32
    """
    b_blk, t_total, s = log_b_ref.shape
    trans = trans_ref[:]  # (S, S)

    bp_ref[:, 0, :] = jnp.full((b_blk, s), -1, jnp.int32)
    lengths = lengths_ref[:]  # (B_blk, S)

    def step(t, alpha):
        # scores[b, i, j] = alpha[b, i] + trans[i, j]
        scores = alpha[:, :, None] + trans[None, :, :]
        new_alpha = jnp.max(scores, axis=1) + log_b_ref[:, t, :]
        bp = jnp.argmax(scores, axis=1).astype(jnp.int32)
        bp_ref[:, t, :] = bp
        return jnp.where(t < lengths, new_alpha, alpha)

    alpha = jax.lax.fori_loop(1, t_total, step, alpha0_ref[:])
    alpha_out_ref[:] = alpha


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def viterbi_forward_pallas(
    log_b: jax.Array,
    trans: jax.Array,
    alpha0: jax.Array,
    lengths: jax.Array,
    block_b: int = 8,
    interpret: bool = False,
):
    """Batched forward pass. log_b (B, T, S), trans (S, S), alpha0 (B, S),
    lengths (B,) -> (alpha_final (B, S), backpointers (B, T, S) int32).

    Matches ops.viterbi._scan_trellis bit-for-bit on the unpadded states.
    """
    b, t_total, s = log_b.shape
    s_pad = _round_up(s, LANE)
    b_pad = _round_up(b, block_b)

    log_b_p = jnp.full((b_pad, t_total, s_pad), NEG, jnp.float32)
    log_b_p = log_b_p.at[:b, :, :s].set(log_b)
    trans_p = jnp.full((s_pad, s_pad), NEG, jnp.float32).at[:s, :s].set(trans)
    alpha0_p = jnp.full((b_pad, s_pad), NEG, jnp.float32).at[:b, :s].set(alpha0)
    # Broadcast lengths across the (padded) state dim: a plain VMEM operand,
    # avoiding SMEM vector-load restrictions.
    lengths_flat = jnp.zeros((b_pad,), jnp.int32).at[:b].set(lengths)
    lengths_p = jnp.broadcast_to(lengths_flat[:, None], (b_pad, s_pad))

    grid = (b_pad // block_b,)
    alpha_out, bp = pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, t_total, s_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, t_total, s_pad), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, t_total, s_pad), jnp.int32),
        ],
        interpret=interpret,
    )(trans_p, lengths_p, log_b_p, alpha0_p)
    return alpha_out[:b, :s], bp[:b, :, :s]
