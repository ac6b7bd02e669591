"""Time the optimizer stage alone (3-tier clip → Adam → wd → group LRs →
keep-where), on params-shaped dummy gradients, to split the 82 ms
bwd+optimizer lump measured by time_fwd.py."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import argparse
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import build_trainer
    from sct_gan_tpu.train.optimizer import FusedOptimizer, apply_group_lrs
    from sct_gan_tpu.train.train_step import TrainState

    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", action="store_true",
                    help="time optimizer.FusedOptimizer instead of the "
                         "per-leaf optax chain")
    args = ap.parse_args()

    trainer = build_trainer("bfloat16", True, 8, 1024)
    grad_tx, group_idx = trainer.grad_tx, trainer.group_idx
    lrs = trainer._group_lrs()

    if args.fused:
        fo = FusedOptimizer(trainer.state.params, use_gan=True)

        @jax.jit
        def opt_step(state: TrainState, seed):
            grads = jax.tree_util.tree_map(
                lambda p: p * 1e-3 + seed * 1e-9, state.params)
            new_params, new_opt, norm, ok = fo.update(
                grads, state.opt_state, state.params, lrs, jnp.float32(0.5))
            return TrainState(new_params, new_opt, state.step + 1)

        state = TrainState(trainer.state.params, fo.init(trainer.state.params),
                           trainer.state.step)
    else:
        @jax.jit
        def opt_step(state: TrainState, seed):
            # grads derived from params + seed: data-dependent chaining
            grads = jax.tree_util.tree_map(
                lambda p: p * 1e-3 + seed * 1e-9, state.params)
            gnorm = optax.global_norm(grads)
            updates, new_opt = grad_tx.update(grads, state.opt_state, state.params)
            updates = apply_group_lrs(updates, group_idx, lrs)
            new_params = optax.apply_updates(state.params, updates)
            ok = jnp.isfinite(gnorm) & (gnorm <= 1000.0)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)
            return TrainState(keep(new_params, state.params),
                              keep(new_opt, state.opt_state), state.step + 1)

        # the trainer may have initialized a FUSED opt state (config default);
        # the optax chain needs its own structure
        state = TrainState(trainer.state.params,
                           grad_tx.init(trainer.state.params),
                           trainer.state.step)
    print("compiling optimizer-only program...", file=sys.stderr, flush=True)
    state = opt_step(state, jnp.float32(0.0))
    _ = np.asarray(state.step)
    tiny = jnp.zeros((8,))
    null = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(tiny + i)
        null = min(null, time.perf_counter() - t0)
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        for i in range(10):
            state = opt_step(state, jnp.float32(rep * 10 + i))
        _ = np.asarray(state.step)
        best = min(best, (time.perf_counter() - t0 - null) / 10)
    print(f"optimizer stage (incl. grad synth + keep): {best*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
