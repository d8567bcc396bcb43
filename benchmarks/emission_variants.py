"""Emission-phase shootout: formulations of (B*T, 39) -> (B*T, S) Gaussian
log-densities on the real chip. All parity-style variants run the heavy
matmul at Precision.HIGHEST (f32-exact, 6 bf16 MXU passes).

Variants:
  whiten_xla    — ops/gaussian.gaussian_log_pdf (per-state whitening einsum)
  quad_pallas   — ops/pallas/emission.gaussian_log_pdf_fused (current serving)
  quad_xla      — X2 = vec(x x^T) materialized in HBM + ONE (N,1521)x(1521,S)
                  matmul (K=1521 fills the MXU depth; HBM pays ~1 GB round
                  trip at B=1024)
  quad_pallas_selmm — kernel variant where the x2 block is built by two
                  selector MATMULS (MXU) instead of the 39-broadcast concat
                  (VPU/relayout)

Measured (TPU v5e, B=1024, T=151, S=58, 154,624 frames, HIGHEST):
  whiten_xla            6.16 ms
  quad_pallas           6.29 ms   <- serving default (fuses with the trellis)
  quad_xla              9.83 ms   (HBM X2 round trip dominates)
  quad_pallas_selmm     8.89 ms   (two extra 6-pass (F,39)x(39,1521) matmuls
                                   cost more than the VPU concat chain)
Conclusion: the concat build stays; the selector-matmul variant is kept as
x2_mode="selmm" for exactness cross-checks only.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, *args, reps=10, windows=3):
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


def states_sweep():
    """whiten vs quad-XLA across state counts — the LARGE-vocabulary view
    (the flagship table above is S=58). The whitening path materializes a
    (frames, S, D) HBM intermediate that grows linearly in S; the quad
    layout's X2 round trip is S-independent, so the crossover favors quad
    past a few hundred states (the decoder exposes it as
    ContinuousDecoder(emissions="quad")). Scalar-consumed outputs — the
    (frames, S) emission matrix itself is tens of MB and would otherwise
    time the tunnel readback, not the kernel."""
    import jax
    import jax.numpy as jnp

    from cs304_tpu.ops.gaussian import (
        gaussian_log_pdf,
        gaussian_log_pdf_quad,
        make_gaussian_params,
        make_gaussian_quad_params,
    )

    rng = np.random.default_rng(0)
    d = 39
    n = 64 * 200
    frames = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    for s_states in (58, 128, 503, 1003):
        means = rng.normal(size=(s_states, d)).astype(np.float32)
        a = rng.normal(size=(s_states, d, d)).astype(np.float32) * 0.1
        covs = a @ a.transpose(0, 2, 1) + np.eye(d, dtype=np.float32)
        p = make_gaussian_params(jnp.asarray(means), jnp.asarray(covs))
        qp = make_gaussian_quad_params(jnp.asarray(means), jnp.asarray(covs))
        w = jax.jit(lambda fr, p=p: jnp.sum(gaussian_log_pdf(p, fr)))
        q = jax.jit(lambda fr, qp=qp: jnp.sum(gaussian_log_pdf_quad(qp, fr)))
        dt_w = time_fn(w, frames, reps=5)
        dt_q = time_fn(q, frames, reps=5)
        flops = n * s_states * d * d * 2
        print(f"S={s_states:5d}  whiten {dt_w*1e3:7.2f} ms "
              f"({flops/dt_w/1e12:5.2f} TF/s)   quad {dt_q*1e3:7.2f} ms "
              f"({flops/dt_q/1e12:5.2f} TF/s)   quad_speedup "
              f"{dt_w/dt_q:4.2f}x")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_params
    from cs304_tpu.ops.gaussian import (
        gaussian_log_pdf,
        make_gaussian_params,
        make_gaussian_quad_params,
    )
    from cs304_tpu.ops.pallas.emission import gaussian_log_pdf_fused

    comp = _flagship_params()
    means = jnp.asarray(comp.means)
    covs = jnp.asarray(comp.covariances)
    b, t, d = 1024, 151, 39
    n = b * t  # 154,624 frames; pad to multiple of 512
    n_pad = -(-n // 512) * 512
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))

    hi = jax.lax.Precision.HIGHEST

    @jax.jit
    def whiten_xla(fr):
        params = make_gaussian_params(means, covs)
        return jnp.sum(gaussian_log_pdf(params, fr))

    @jax.jit
    def quad_pallas(fr):
        return jnp.sum(gaussian_log_pdf_fused(means, covs, fr))

    qp = make_gaussian_quad_params(means, covs)

    @jax.jit
    def quad_xla(fr):
        x2 = (fr[:, :, None] * fr[:, None, :]).reshape(fr.shape[0], d * d)
        out = (
            jax.lax.dot_general(x2, qp.neg_half_p.T,
                                (((1,), (0,)), ((), ())), precision=hi)
            + jax.lax.dot_general(fr, qp.lin, (((1,), (0,)), ((), ())),
                                  precision=hi)
            + qp.const
        )
        return jnp.sum(out)

    @jax.jit
    def quad_pallas_selmm(fr):
        return jnp.sum(
            gaussian_log_pdf_fused(means, covs, fr, x2_mode="selmm")
        )

    print(f"frames={n_pad}  (B={b} T={t})  S={comp.num_states}")
    for name, fn in [
        ("whiten_xla", whiten_xla),
        ("quad_pallas", quad_pallas),
        ("quad_xla", quad_xla),
        ("quad_pallas_selmm", quad_pallas_selmm),
    ]:
        try:
            dt = time_fn(fn, frames)
            print(f"{name:20s} {dt*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--states-sweep", action="store_true",
                    help="whiten vs quad emissions at S=58..1003 "
                         "(the large-vocabulary decode lever)")
    if ap.parse_args().states_sweep:
        states_sweep()
    else:
        main()
