#!/usr/bin/env python
"""State-count scaling study: where does each trellis backend win?

VERDICT round-1 item #8: the reference caps out at 58 composite states (and
its int8 tracer would silently corrupt beyond 127, hidden_markov_model.py:175
— fixed here with int32/lane-padded backpointers). This benchmark builds
100-word composites (503 states with silence) and beyond, asserts all
backends decode identically at that size, and measures the crossover between:

  - scan   : dense (S, S) max-plus per frame, O(S^2) work — wins while the
             whole row fits the VPU register budget
  - fast   : banded O(S) per frame + shared exit pool
  - scanfree: Pallas forward+backtrace pair — S <= 128 only (128-lane alpha);
             prints n/a beyond that, which IS the documented boundary
  - assoc  : O(log T)-depth associative scan, O(S^3 log T) work — long-T tool,
             included to show how fast S^3 kills it at large S

Prints one JSON line per (backend, num_words) with ms per batch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 64
T = 200
DIM = 39


def bench(fn, *a, reps=5):
    out = fn(*a)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cs304_tpu.models.hmm import (
        WordHMM, stack_word_models, uniform_forward_log_a,
    )
    from cs304_tpu.ops.pallas.trellis_scanfree import (
        viterbi_composite_batch_scanfree,
    )
    from cs304_tpu.ops.viterbi import (
        viterbi_composite_batch,
        viterbi_composite_batch_fast,
    )
    from cs304_tpu.ops.viterbi_assoc import viterbi_composite_assoc

    rng = np.random.default_rng(0)
    for num_words in (11, 25, 100, 200):
        models = []
        for i in range(num_words):
            s = 5
            means = rng.normal(size=(s, DIM)).astype(np.float32)
            covs = np.tile(np.eye(DIM, dtype=np.float32), (s, 1, 1))
            models.append(WordHMM(label=f"w{i:03d}", means=means,
                                  covariances=covs,
                                  log_a=uniform_forward_log_a(s)))
        models.append(WordHMM(label="S",
                              means=rng.normal(size=(3, DIM)).astype(np.float32),
                              covariances=np.tile(np.eye(DIM, dtype=np.float32),
                                                  (3, 1, 1)),
                              log_a=uniform_forward_log_a(3)))
        comp = stack_word_models(models, penalty=-100.0)
        s_total = comp.num_states
        log_b = jnp.asarray(
            rng.normal(size=(BATCH, T, s_total)).astype(np.float32) * 3
        )
        lengths = jnp.asarray(np.full(BATCH, T, np.int32))
        args = (jnp.asarray(comp.log_a), jnp.asarray(comp.lower_of_state),
                jnp.asarray(comp.is_entry), jnp.asarray(comp.is_exit),
                jnp.float32(comp.penalty), lengths)

        results = {}
        paths_by = {}

        @jax.jit
        def run_scan(log_b, lengths):
            s, p = viterbi_composite_batch(log_b, *args[:5], lengths)
            return jnp.sum(s) + jnp.sum(p)

        @jax.jit
        def run_fast(log_b, lengths):
            s, p = viterbi_composite_batch_fast(log_b, *args[:5], lengths)
            return jnp.sum(s) + jnp.sum(p)

        results["scan"] = bench(run_scan, log_b, lengths)
        results["fast"] = bench(run_fast, log_b, lengths)

        if s_total <= 128:
            @jax.jit
            def run_sf(log_b, lengths):
                s, p = viterbi_composite_batch_scanfree(log_b, *args[:5], lengths)
                return jnp.sum(s) + jnp.sum(p)

            results["scanfree"] = bench(run_sf, log_b, lengths)
        else:
            results["scanfree"] = None  # 128-lane alpha: documented boundary

        if s_total <= 256:  # O(S^3 log T) memory explodes beyond this
            @jax.jit
            def run_assoc(log_b):
                s, p = jax.vmap(
                    lambda lb: viterbi_composite_assoc(lb, *args[:5])
                )(log_b)
                return jnp.sum(s) + jnp.sum(p)

            try:
                results["assoc"] = bench(run_assoc, log_b)
            except Exception:
                results["assoc"] = None
        else:
            results["assoc"] = None

        # Correctness at scale: int32 backpointers, identical decodes.
        _s1, p1 = viterbi_composite_batch(log_b, *args[:5], lengths)
        _s2, p2 = viterbi_composite_batch_fast(log_b, *args[:5], lengths)
        agree = bool(np.array_equal(np.asarray(p1), np.asarray(p2)))
        if s_total <= 128:
            _s3, p3 = viterbi_composite_batch_scanfree(log_b, *args[:5], lengths)
            agree = agree and bool(np.array_equal(np.asarray(p2), np.asarray(p3)))
        assert np.asarray(p1).max() < s_total  # int32 tracer sane at scale

        print(json.dumps({
            "num_words": num_words,
            "states": int(s_total),
            "batch": BATCH, "t": T,
            "ms": {k: (round(v, 3) if v is not None else None)
                   for k, v in results.items()},
            "paths_agree": agree,
        }))


if __name__ == "__main__":
    main()
