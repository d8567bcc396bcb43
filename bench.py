#!/usr/bin/env python
"""Headline benchmark: end-to-end MFCC + composite-Viterbi decode throughput.

Workload: B synthetic ~1.5 s utterances -> 39-dim MFCC front-end -> 58-state
composite continuous Viterbi (11 digit words x 5 states + 3-state silence),
the reference's project5/6 decode hot path. The TPU pipeline is one jitted
program over the whole batch; the baseline is a NumPy/SciPy re-implementation
of the reference's algorithm (per-clip MFCC + Python-loop trellis with
per-(t,state) scipy logpdf — hidden_markov_model.py:481-581), measured on a
few utterances and extrapolated (it is ~4 orders of magnitude slower).

Prints ONE JSON line:
  {"metric": ..., "value": utt/s, "unit": "utt/s", "vs_baseline": speedup}
"""
import json
import time

import numpy as np

# Serving batch: swept 256/512/768/1024/2048/4096 on the v5e (round 2) —
# throughput peaks at 512 (75.2k utt/s vs 69.8k at 1024, 54.2k at 2048,
# 44.8k at 4096; 256 ties 512 within noise). Larger batches lose more to
# HBM pressure in the fused kernels than they gain in dispatch amortization.
BATCH = 512
SECONDS = 1.5
SAMPLE_RATE = 16000
BASELINE_CLIPS = 3


def make_signals(batch: int, seconds: float, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    sigs = []
    for i in range(batch):
        f0 = rng.uniform(200, 900)
        f1 = rng.uniform(900, 2600)
        sig = (
            np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6))
            + 0.6 * np.sin(2 * np.pi * f1 * t + rng.uniform(0, 6))
        ) * 6000.0
        sig += rng.normal(0, 50.0, n)
        sigs.append(sig.astype(np.float32))
    return np.stack(sigs)


def tpu_pipeline():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_params
    from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_features
    from cs304_tpu.ops.pallas.emission import decode_batch_fused

    comp = _flagship_params()
    cfg = MFCCConfig()
    means = jnp.asarray(comp.means)
    covs = jnp.asarray(comp.covariances)
    log_a = jnp.asarray(comp.log_a)
    lower = jnp.asarray(comp.lower_of_state)
    is_entry = jnp.asarray(comp.is_entry)
    is_exit = jnp.asarray(comp.is_exit)
    penalty = jnp.float32(comp.penalty)

    # Note on the serving epilogue: the device-side path -> word-id
    # compaction (ops/words.py) is NOT in the headline program. It costs
    # ~0.9 ms/batch of device time and pays for itself only when every
    # batch's result crosses the tunnel (the real serving loop,
    # ContinuousDecoder.predict_batch/_batches, where it + a single batched
    # device_get transfer cut per-batch consume latency from 64 ms to
    # 31 ms — benchmarks/words_ab.py). This window materializes only the
    # final rep, so the epilogue would be pure overhead here.
    @jax.jit
    def decode(signals, num_samples):
        feats, n_frames = jax.vmap(lambda s, n: mfcc_features(s, n, cfg))(
            signals, num_samples
        )
        # Fused Pallas serving path: quadratic-form emission kernel (no
        # (T, S, D) HBM intermediate, output pre-padded to 128 state lanes)
        # feeding the scan-free trellis pair (forward + backtrace kernels —
        # the XLA scans pay ~13-25 us/step of while-loop overhead for 2x150
        # sequential steps; in-kernel the time loop is free). Emission drift
        # vs the exact whitening path: 2.4e-4 absolute (ops/pallas/emission.py);
        # trellis bitwise-identical (tests/test_pallas_scanfree.py).
        return decode_batch_fused(
            means, covs, log_a, lower, is_entry, is_exit, penalty,
            feats, n_frames,
        )

    return decode


def main() -> None:
    import jax

    signals = make_signals(BATCH, SECONDS)
    num_samples = np.full(BATCH, signals.shape[1], np.int32)
    decode = tpu_pipeline()

    sj = jax.device_put(signals)
    nj = jax.device_put(num_samples)
    # Warmup/compile.
    scores, paths = decode(sj, nj)
    np.asarray(scores), np.asarray(paths)

    # Best of 3 windows of 20 reps. The clock stops only after the last
    # window's outputs are materialized on the HOST (np.asarray): through the
    # axon tunnel, block_until_ready alone can return before remote execution
    # of unread buffers actually completes, inflating throughput ~1.4x.
    # Methodology audit (round 2): a chained variant with a data dependence
    # between reps (each rep's score feeds the next input, so no rep can be
    # elided or overlapped past the timer) measures within 0.3% of this
    # window — the 20 programs execute serially and the final materialization
    # covers them all.
    reps = 20
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            scores, paths = decode(sj, nj)
        np.asarray(scores), np.asarray(paths)
        best_dt = min(best_dt, time.perf_counter() - t0)
    tpu_ups = BATCH * reps / best_dt

    # NumPy-reference baseline on a few clips, extrapolated.
    import scipy.stats
    from __graft_entry__ import _flagship_params
    from benchmarks.reference_numpy import numpy_composite_viterbi, numpy_mfcc

    comp = _flagship_params()
    gaussians = [
        scipy.stats.multivariate_normal(comp.means[i], comp.covariances[i])
        for i in range(comp.num_states)
    ]
    t0 = time.perf_counter()
    for i in range(BASELINE_CLIPS):
        feats = numpy_mfcc(signals[i])
        numpy_composite_viterbi(
            feats, gaussians, comp.log_a, comp.lowers, comp.uppers, comp.penalty
        )
    ref_dt = time.perf_counter() - t0
    ref_ups = BASELINE_CLIPS / ref_dt

    print(
        json.dumps(
            {
                "metric": "utterances/sec (MFCC+composite Viterbi decode, "
                          f"58-state, B={BATCH}, 1.5s clips)",
                "value": round(tpu_ups, 2),
                "unit": "utt/s",
                "vs_baseline": round(tpu_ups / ref_ups, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
