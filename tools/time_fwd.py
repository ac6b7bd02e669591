"""Forward-vs-backward split using ONLY the trainer's own proven jit
programs (train_step, eval_step) — the custom ablation programs in
ablate_step.py trip an axon-runtime INVALID_ARGUMENT that the trainer's
paths never hit, so this sticks to them.

    full train step  = fwd(train losses) + bwd + optimizer + metrics
    eval step        = fwd(eval-mode losses) only

Differential timing identical to bench.time_step.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_trainer, make_batch, time_step
    from sct_gan_tpu.parallel.mesh import shard_batch

    trainer = build_trainer("bfloat16", True, 8, 1024)
    batch = make_batch(8, 1024, trainer.model.config.vocab_size)
    device_batch = shard_batch(batch, trainer.mesh)

    print("timing full train step...", file=sys.stderr, flush=True)
    t_full, live_state = time_step(trainer, batch)
    print(f"full step: {t_full*1e3:.1f} ms", flush=True)

    # eval_step chain: thread the loss back into a scalars field at 1e-20
    # weight so the chain is data-dependent without changing the math.
    params = live_state.params
    scalars = trainer._scalars(1.0)

    def run_eval(n, sc):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):
            metrics = trainer.eval_step(params, device_batch, sc)
            sc = sc._replace(
                line_vuln_weight=sc.line_vuln_weight
                + metrics["total_loss"] * 1e-20)
        _ = np.asarray(metrics["total_loss"])
        return time.perf_counter() - t0

    print("timing eval (fwd-only) step...", file=sys.stderr, flush=True)
    run_eval(1, scalars)
    run_eval(1, scalars)
    tiny = jnp.zeros((8,))
    null = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(tiny + i)
        null = min(null, time.perf_counter() - t0)
    best = float("inf")
    for _ in range(2):
        best = min(best, max(run_eval(10, scalars) - null, 1e-9) / 10)
    print(f"eval (fwd-only) step: {best*1e3:.1f} ms", flush=True)
    print(f"=> bwd+optimizer+train-extras: {(t_full-best)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
