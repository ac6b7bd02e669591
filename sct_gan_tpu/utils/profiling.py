"""Tracing and throughput observability.

The reference has no profiling at all — only tqdm postfix prints and
notebook wall-clock timers (SURVEY §5.1; SCT-GAN/train.py:881-885,
notebook_utils.py:478-479). Here profiling is first-class:

  * `trace_context` — wraps `jax.profiler.trace`, producing TensorBoard-
    loadable XPlane dumps of device execution (the tool for finding
    MXU-idle gaps and HBM-bound ops);
  * `StepTimer` — step-time / tokens-per-second counters with exact device
    barriers, percentile summaries;
  * `MetricsLogger` — structured JSONL metrics stream replacing the
    reference's hundreds of emoji-print statements.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, List, Optional


@contextlib.contextmanager
def trace_context(logdir: str, enabled: bool = True):
    """Profile the enclosed block with jax.profiler (no-op when disabled)."""
    if not enabled:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Wall-clock step timing with device barriers and token accounting."""

    def __init__(self, tokens_per_step: int = 0):
        self.tokens_per_step = tokens_per_step
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Stop the step clock; pass the step's outputs to enforce a device
        barrier (jax.block_until_ready) so async dispatch cannot hide work."""
        if result is not None:
            import jax
            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        box: Dict[str, Any] = {}
        yield box
        self.stop(box.get("result"))

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        med = ts[n // 2]
        out = {
            "steps": float(n),
            "mean_ms": sum(ts) / n * 1e3,
            "median_ms": med * 1e3,
            "p90_ms": ts[min(n - 1, int(0.9 * n))] * 1e3,
            "min_ms": ts[0] * 1e3,
        }
        if self.tokens_per_step:
            out["tokens_per_sec"] = self.tokens_per_step / med
        return out


class MetricsLogger:
    """Append-only JSONL metrics stream + in-memory history."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history: List[Dict[str, Any]] = []
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def series(self, key: str) -> List[Any]:
        return [r[key] for r in self.history if key in r]


def enable_compilation_cache(path: str = "/root/.cache/jax_comp") -> bool:
    """Persist compiled XLA executables across processes.

    The remote TPU compiler takes ~12-15 min for the full fused train step;
    with the cache enabled, later processes (bench, eval, driver checks)
    reload the binary instead of recompiling. Safe no-op when unsupported."""
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        return True
    except Exception:
        return False
