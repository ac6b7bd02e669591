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
    """Aggregate device-plane event self-times from the newest xplane.pb."""
    from xprof.convert import _pywrap_profiler_plugin  # noqa: F401 (ensures ext ok)
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    path = paths[-1]
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    print(f"== {path}")
    for plane in xspace.planes:
        is_device = ("TPU" in plane.name or "/device" in plane.name.lower()
                     or plane.name.startswith("/device"))
        if not is_device:
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        totals: dict[str, float] = {}
        counts: dict[str, int] = {}
        plane_span = 0.0
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ms
                totals[name] = totals.get(name, 0.0) + dur
                counts[name] = counts.get(name, 0) + 1
                plane_span += dur
        if not totals:
            continue
        print(f"\n-- plane: {plane.name}  (sum of events {plane_span:.2f} ms "
              f"across {len(plane.lines)} lines)")
        for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:topk]:
            print(f"  {t:10.3f} ms  x{counts[name]:<5d} {name[:140]}")


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
