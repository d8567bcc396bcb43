#!/usr/bin/env python
"""Batched streaming capacity: how many real-time streams fit on one chip.

Measures the steady-state step time of ops/streaming_batch.py at several
slot counts (chunk of C frames per slot per dispatch, feature upload
included — that is the real serving cost), plus finalize latency. A stream
produces 100 frames/s (10 ms hop), so

    capacity = slots * chunk / (step_time * 100)  concurrent real-time mics.

Timing is chained: each step donates and consumes the previous step's device
state, so no rep can overlap past the timer; the window ends with a full
host materialization of alpha (measurement-honesty note in bench.py).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

FRAME_RATE = 100.0  # 16 kHz / 160-sample hop


def run(num_slots: int, chunk: int, reps: int, max_frames: int):
    from __graft_entry__ import _flagship_params
    from cs304_tpu.ops.streaming_batch import BatchedStreamingComposite

    comp = _flagship_params()
    pool = BatchedStreamingComposite(
        comp, num_slots=num_slots, chunk_size=chunk, max_frames=max_frames,
    )
    slots = [pool.start() for _ in range(num_slots)]
    rng = np.random.default_rng(0)
    feeds = [
        {s: rng.normal(size=(chunk, 39)).astype(np.float32) for s in slots}
        for _ in range(4)
    ]
    # Warmup/compile (one step), then reset clocks by recycling every slot.
    pool.step(feeds[0])
    np.asarray(pool._alpha)
    for s in slots:
        pool.release(s)
    slots = [pool.start() for _ in range(num_slots)]

    steps_per_window = min(reps, (max_frames // chunk) - 1)
    t0 = time.perf_counter()
    for i in range(steps_per_window):
        pool.step(feeds[i % len(feeds)])
    np.asarray(pool._alpha)  # materialize the chained window
    dt = (time.perf_counter() - t0) / steps_per_window

    pool.finalize(slots)  # compile warmup (finalize is non-destructive)
    t1 = time.perf_counter()
    results = pool.finalize(slots)
    fin_dt = time.perf_counter() - t1
    assert len(results) == num_slots

    frames_per_sec = num_slots * chunk / dt
    return {
        "slots": num_slots,
        "chunk": chunk,
        "step_ms": round(dt * 1e3, 3),
        "frames_per_sec": round(frames_per_sec),
        "realtime_streams": int(frames_per_sec / FRAME_RATE),
        "finalize_ms": round(fin_dt * 1e3, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--slots", type=int, nargs="*", default=[128, 512, 1024])
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--reps", type=int, default=40)
    p.add_argument("--max-frames", type=int, default=1024)
    args = p.parse_args()
    best = None
    for b in args.slots:
        r = run(b, args.chunk, args.reps, args.max_frames)
        print(json.dumps(r))
        if best is None or r["realtime_streams"] > best["realtime_streams"]:
            best = r
    print(json.dumps({
        "metric": "concurrent real-time streams (batched online decode, "
                  f"58-state, chunk={args.chunk})",
        "value": best["realtime_streams"],
        "unit": "streams",
    }))


if __name__ == "__main__":
    main()
