"""Quantify how much of the optimizer stage's 18.5 ms is per-leaf kernel
launch overhead: run the SAME clip->Adam->wd->lr->keep chain over a single
mega-leaf with the same total element count (~139 M) as the 2,100-leaf real
parameter tree. The difference vs tools/time_opt.py is the launch/fusion
overhead a flattened-optimizer redesign would recover."""
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
    import optax

    n = 139_000_000
    params = {"mega": jnp.ones((n,), jnp.float32) * 1e-3}
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-9),
        optax.add_decayed_weights(0.1),
        optax.scale(-5e-5),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, seed):
        grads = jax.tree_util.tree_map(
            lambda p: p * 1e-3 + seed * 1e-9, params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(gnorm) & (gnorm <= 1000.0)
        keep = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(ok, x, y), a, b)
        return keep(new_params, params), keep(opt_state, opt_state)

    print("compiling mega-leaf optimizer...", file=sys.stderr, flush=True)
    params, opt_state = step(params, opt_state, jnp.float32(0.0))
    _ = np.asarray(params["mega"][0])
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
            params, opt_state = step(params, opt_state,
                                     jnp.float32(rep * 10 + i))
        _ = np.asarray(params["mega"][0])
        best = min(best, (time.perf_counter() - t0 - null) / 10)
    print(f"mega-leaf optimizer stage: {best*1e3:.1f} ms "
          f"(vs 18.5 ms on the 2,100-leaf tree)", flush=True)


if __name__ == "__main__":
    main()
