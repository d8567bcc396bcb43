#!/usr/bin/env python
"""Microbenchmark: scan vs Pallas trellis, emissions, MFCC — where time goes.

Run on the TPU to decide kernel work. Prints per-stage ms and utt/s for the
composite decode at the bench.py workload shape.
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_params
from cs304_tpu.ops.gaussian import gaussian_log_pdf, make_gaussian_params
from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_features
from cs304_tpu.ops.viterbi import (
    viterbi_composite_batch,
    viterbi_composite_batch_fast,
    viterbi_composite_batch_pallas,
)

B, SECONDS, SR = 256, 1.5, 16000


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    rng = np.random.default_rng(7)
    n = int(SECONDS * SR)
    signals = jnp.asarray(rng.normal(0, 3000, (B, n)).astype(np.float32))
    nums = jnp.asarray(np.full(B, n, np.int32))
    comp = _flagship_params()
    cfg = MFCCConfig()

    mfcc_fn = jax.jit(jax.vmap(lambda s, m: mfcc_features(s, m, cfg)))
    t_mfcc, (feats, n_frames) = timeit(mfcc_fn, signals, nums)
    print(f"MFCC:      {t_mfcc*1e3:8.2f} ms  ({B/t_mfcc:,.0f} utt/s)")

    params = make_gaussian_params(
        jnp.asarray(comp.means), jnp.asarray(comp.covariances)
    )
    emis_fn = jax.jit(jax.vmap(lambda x: gaussian_log_pdf(params, x)))
    t_emis, log_b = timeit(emis_fn, feats)
    print(f"Emissions: {t_emis*1e3:8.2f} ms  ({B/t_emis:,.0f} utt/s)")

    args = (
        jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
        jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
        jnp.float32(comp.penalty),
    )
    scan_fn = jax.jit(lambda lb, ln: viterbi_composite_batch(lb, *args, ln))
    t_scan, _ = timeit(scan_fn, log_b, n_frames)
    print(f"Trellis scan:   {t_scan*1e3:8.2f} ms  ({B/t_scan:,.0f} utt/s)")

    fast_fn = jax.jit(lambda lb, ln: viterbi_composite_batch_fast(lb, *args, ln))
    t_fast, _ = timeit(fast_fn, log_b, n_frames)
    print(f"Trellis fast:   {t_fast*1e3:8.2f} ms  ({B/t_fast:,.0f} utt/s)")

    pallas_fn = jax.jit(
        lambda lb, ln: viterbi_composite_batch_pallas(lb, *args, ln)
    )
    try:
        t_pal, _ = timeit(pallas_fn, log_b, n_frames)
        print(f"Trellis pallas: {t_pal*1e3:8.2f} ms  ({B/t_pal:,.0f} utt/s)")
    except Exception as e:
        print("pallas failed:", type(e).__name__, str(e)[:500])

    total = t_mfcc + t_emis + t_scan
    print(f"sum (scan path): {total*1e3:8.2f} ms -> {B/total:,.0f} utt/s")
    total_f = t_mfcc + t_emis + t_fast
    print(f"sum (fast path): {total_f*1e3:8.2f} ms -> {B/total_f:,.0f} utt/s")


if __name__ == "__main__":
    main()
