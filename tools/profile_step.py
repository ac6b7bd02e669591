"""Profile the fused GAN train step on the real TPU chip and print the
top device ops by self-time, parsed from the jax.profiler XPlane dump.

Usage:
    python tools/profile_step.py [--steps 6] [--logdir /tmp/sct_trace]

This is the perf-tuning companion to bench.py: bench gives one wall-clock
number, this shows WHERE the time goes (MXU matmuls vs layout copies vs
host gaps), so optimization is profile-driven, not guesswork.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trace(logdir: str, steps: int) -> None:
    import jax
    import numpy as np
    from bench import build_trainer, make_batch
    from sct_gan_tpu.parallel.mesh import shard_batch
    from sct_gan_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    trainer = build_trainer("bfloat16", True, 8, 1024)
    batch = make_batch(8, 1024, trainer.model.config.vocab_size)
    device_batch = shard_batch(batch, trainer.mesh)
    scalars = trainer._scalars(1.0)
    lrs = trainer._group_lrs()
    key = lambda i: jax.random.key(i, impl="rbg")

    def run(n, state, rng):
        sc = scalars
        metrics = None
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            state, metrics, sc = trainer.train_step(
                state, device_batch, sc, lrs, sub)
        _ = np.asarray(metrics["total_loss"])  # D2H barrier (tunnel-safe)
        return state

    print("warmup/compile...", file=sys.stderr, flush=True)
    state = run(1, trainer.state, key(0))
    state = run(1, state, key(1))
    print("tracing...", file=sys.stderr, flush=True)
    with jax.profiler.trace(logdir):
        state = run(steps, state, key(2))


def parse_xplane(logdir: str, topk: int = 40) -> None:
    """Aggregate device op self-times from the newest trace.json.gz dump."""
    import gzip
    import json as _json

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        trace = _json.load(f)
    events = trace.get("traceEvents", [])

    # Map pid/tid → names, so device threads can be separated from host.
    pid_names: dict = {}
    tid_names: dict = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev.get("tid"))] = ev["args"].get(
                    "name", "")

    groups: dict = {}
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pname = pid_names.get(ev.get("pid"), "")
        tname = tid_names.get((ev.get("pid"), ev.get("tid")), "")
        key = f"{pname}/{tname}"
        g = groups.setdefault(key, {"totals": {}, "counts": {}, "span": 0.0})
        name = ev.get("name", "?")
        dur = ev["dur"] / 1e3  # µs → ms
        g["totals"][name] = g["totals"].get(name, 0.0) + dur
        g["counts"][name] = g["counts"].get(name, 0) + 1
        g["span"] += dur

    print(f"== {path}")
    for key, g in sorted(groups.items(), key=lambda kv: -kv[1]["span"]):
        host_like = any(s in key.lower()
                        for s in ("python", "main", "plugin", "thread pool"))
        if host_like and len(groups) > 1:
            continue
        print(f"\n-- {key}  (sum {g['span']:.2f} ms, "
              f"{len(g['totals'])} distinct ops)")
        for name, t in sorted(g["totals"].items(), key=lambda kv: -kv[1])[:topk]:
            print(f"  {t:10.3f} ms  x{g['counts'][name]:<6d} {name[:130]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--logdir", default="/tmp/sct_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--topk", type=int, default=40)
    args = ap.parse_args()
    if not args.parse_only:
        run_trace(args.logdir, args.steps)
    parse_xplane(args.logdir, args.topk)


if __name__ == "__main__":
    main()
