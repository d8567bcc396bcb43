#!/usr/bin/env python
"""Training-throughput scaling with corpus size (the data axis).

The serving-side scale study (scale_states.py) varies the STATE count; this
varies the CORPUS: the flagship embedded-training task (12 models, 39-dim
full-covariance Gaussians, silence-interleaved 2-7 digit transcripts) at
1x/2x/4x the round-2 benchmark corpus (896 -> 3584 utterances, ~134k ->
~537k frames). Real TI-Digits is ~12k+ utterances, so this is the axis a
production run stresses.

Measured quantity: per-iteration time of the whole-run device loop
(models/train_fused.fused_train_run, max_iterations=6, initial parameters
restored per run, full host materialization at the end — same honest
methodology as train_bench.time_device_loop).

Prints one JSON line per size:
  {"utts": N, "frames": F, "sec_per_iter": s, "utt_per_s": r, "frames_per_s": f}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_bench import make_models, sample_corpus  # noqa: E402


def scaled_corpus(models, factor: int):
    """factor x the train_bench corpus (same transcripts, more takes)."""
    corpora = [sample_corpus(models, seed=1 + i) for i in range(factor)]
    out = {}
    for c in corpora:
        for k, v in c.items():
            out.setdefault(k, []).extend(v)
    return out


def time_loop(models, labeled, iters: int = 6):
    from cs304_tpu.models.train_continuous import (
        ContinuousTrainConfig,
        ContinuousTrainer,
        insert_silence,
    )
    from cs304_tpu.models.train_fused import prepare_fused_corpus

    cfg = ContinuousTrainConfig(
        max_iterations=iters, silence_bootstrap=False, cov_reg=0.1,
        on_empty_state="keep", fused=True,
    )
    tr = ContinuousTrainer(models, cfg)
    batches = prepare_fused_corpus(
        labeled, tr.state_counts, tr.label_index, insert_silence,
        cfg.length_multiple,
    )
    init = (tr.means_g.copy(), tr.covs_g.copy(), tr.log_a_g.copy())

    def run():
        tr.means_g, tr.covs_g, tr.log_a_g = (a.copy() for a in init)
        tr._iterations_done = 0
        tr._dev_state = None
        t0 = time.perf_counter()
        n = tr._train_device_loop(batches)
        return (time.perf_counter() - t0) / max(n, 1)

    run()  # compile
    dt = min(run() for _ in range(2))
    n_utts = sum(len(v) for v in labeled.values())
    n_frames = sum(x.shape[0] for v in labeled.values() for x in v)
    return n_utts, n_frames, dt


def main() -> None:
    models = make_models()
    for factor in (1, 2, 4):
        labeled = scaled_corpus(models, factor)
        n_utts, n_frames, dt = time_loop(models, labeled)
        print(json.dumps({
            "corpus_factor": factor,
            "utts": n_utts,
            "frames": n_frames,
            "sec_per_iter": round(dt, 4),
            "utt_per_s": round(n_utts / dt, 1),
            "frames_per_s": round(n_frames / dt, 1),
        }))


if __name__ == "__main__":
    main()
