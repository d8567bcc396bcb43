"""A/B: serving decode readback — full (B, T) paths vs on-device word
compaction (ops/words.py). Run on the real chip; prints both throughputs."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from bench import BATCH, SECONDS, make_signals
    from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_features
    from cs304_tpu.ops.pallas.emission import decode_batch_fused
    from cs304_tpu.ops.words import words_from_paths

    comp = _flagship_params()
    cfg = MFCCConfig()
    means = jnp.asarray(comp.means)
    covs = jnp.asarray(comp.covariances)
    log_a = jnp.asarray(comp.log_a)
    lower = jnp.asarray(comp.lower_of_state)
    is_entry = jnp.asarray(comp.is_entry)
    is_exit = jnp.asarray(comp.is_exit)
    penalty = jnp.float32(comp.penalty)
    wos = jnp.asarray(comp.word_of_state.astype(np.int32))
    lowers = jnp.asarray(comp.lowers.astype(np.int32))
    uppers = jnp.asarray(comp.uppers.astype(np.int32))
    silence = comp.labels.index("S")

    @jax.jit
    def decode_paths(signals, num_samples):
        feats, n_frames = jax.vmap(lambda s, n: mfcc_features(s, n, cfg))(
            signals, num_samples
        )
        return decode_batch_fused(
            means, covs, log_a, lower, is_entry, is_exit, penalty,
            feats, n_frames,
        )

    @jax.jit
    def decode_words(signals, num_samples):
        feats, n_frames = jax.vmap(lambda s, n: mfcc_features(s, n, cfg))(
            signals, num_samples
        )
        scores, paths = decode_batch_fused(
            means, covs, log_a, lower, is_entry, is_exit, penalty,
            feats, n_frames,
        )
        ids, counts = words_from_paths(
            paths, n_frames, wos, lowers, uppers, silence,
            max_words=32, out_dtype=jnp.int8,
        )
        return scores, ids, counts

    signals = make_signals(BATCH, SECONDS)
    num_samples = np.full(BATCH, signals.shape[1], np.int32)
    sj = jax.device_put(signals)
    nj = jax.device_put(num_samples)

    def run(fn, label, reps=20, windows=3):
        outs = fn(sj, nj)
        [np.asarray(o) for o in outs]
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                outs = fn(sj, nj)
            [np.asarray(o) for o in outs]
            best = min(best, time.perf_counter() - t0)
        ups = BATCH * reps / best
        print(f"{label}: {ups:,.0f} utt/s  ({best*1e3/reps:.2f} ms/batch)")
        return ups

    def run_consume(fn, label, consume, reps=20, windows=3):
        """Materialize EVERY rep's outputs on the host — the real serving
        loop (predict_batches), where each batch's result is consumed."""
        outs = fn(sj, nj)
        consume(outs)
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                consume(fn(sj, nj))
            best = min(best, time.perf_counter() - t0)
        ups = BATCH * reps / best
        print(f"{label}: {ups:,.0f} utt/s  ({best*1e3/reps:.2f} ms/batch)")
        return ups

    def consume_paths(outs):
        scores, paths = outs
        np.asarray(scores), np.asarray(paths)

    def consume_words(outs):
        scores, ids, counts = outs
        np.asarray(scores), np.asarray(ids), np.asarray(counts)

    @jax.jit
    def decode_words_packed(signals, num_samples):
        """One output array: [ids int8 as f32 | count | score] per row —
        a single readback sync instead of three."""
        scores, ids, counts = decode_words(signals, num_samples)
        return jnp.concatenate(
            [
                ids.astype(jnp.float32),
                counts[:, None].astype(jnp.float32),
                scores[:, None],
            ],
            axis=1,
        )

    def consume_packed(out):
        np.asarray(out)

    def consume_get(outs):
        jax.device_get(outs)

    # Interleave the variants across rounds so tunnel drift hits both.
    for rnd in range(2):
        run(decode_paths, f"paths  (last-rep readback)  round{rnd}")
        run(decode_words, f"words  (last-rep readback)  round{rnd}")
        run_consume(decode_paths, f"paths  (per-rep, asarray)   round{rnd}",
                    consume_paths)
        run_consume(decode_words, f"words  (per-rep, asarray)   round{rnd}",
                    consume_words)
        run_consume(decode_paths, f"paths  (per-rep, device_get) round{rnd}",
                    consume_get)
        run_consume(decode_words, f"words  (per-rep, device_get) round{rnd}",
                    consume_get)
        run_consume(decode_words_packed,
                    f"packed (per-rep, asarray)   round{rnd}", consume_packed)


if __name__ == "__main__":
    main()
