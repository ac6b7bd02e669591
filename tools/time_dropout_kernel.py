"""Microbench the Pallas dropout kernel vs candidate PRNG reductions.

The full-step ablation priced all ~30 dropout sites at 8.2 ms/step.
Each site is one bandwidth-bound pass (read+write) plus one in-kernel
PRNG draw per element. Variants at the production tile (8*1024, 768) bf16:

  copy   — read+write only (the bandwidth floor)
  drop   — the shipped kernel (1 uint32 draw per element)
  byte4  — 1 uint32 draw per 4 elements, 4 byte-threshold decisions
  half2  — 1 uint32 draw per 2 elements, 2 16-bit-threshold decisions

Usage: python tools/time_dropout_kernel.py
"""
from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_ROWS, C = 8 * 1024, 768
    RATE = 0.1
    BQ = 1024

    def make(mode):
        def kern(seed_ref, x_ref, o_ref):
            i = pl.program_id(0)
            x = x_ref[...]
            if mode == "copy":
                o_ref[...] = x * jnp.asarray(1.0001, x.dtype)
                return
            pltpu.prng_seed(seed_ref[0, 0], i)
            inv = 1.0 / (1.0 - RATE)
            if mode == "drop":
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits(x.shape), jnp.uint32)
                thr = jnp.uint32(int(RATE * 4294967296.0))
                keep = bits >= thr
                o_ref[...] = jnp.where(keep, x * jnp.asarray(inv, x.dtype),
                                       jnp.zeros((), x.dtype))
                return
            # Mosaic can't concatenate i1 vectors (bitcast_vreg i1->i32
            # fails); build f32 multiplier masks per slice and concat those.
            if mode == "byte4":
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((x.shape[0], x.shape[1] // 4)),
                    jnp.uint32)
                thr8 = jnp.uint32(int(RATE * 256.0))
                mult = jnp.concatenate(
                    [jnp.where(((bits >> s) & jnp.uint32(0xFF)) >= thr8,
                               jnp.float32(inv), 0.0)
                     for s in (0, 8, 16, 24)], axis=1)
            else:  # half2
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((x.shape[0], x.shape[1] // 2)),
                    jnp.uint32)
                thr16 = jnp.uint32(int(RATE * 65536.0))
                mult = jnp.concatenate(
                    [jnp.where(((bits >> s) & jnp.uint32(0xFFFF)) >= thr16,
                               jnp.float32(inv), 0.0)
                     for s in (0, 16)], axis=1)
            o_ref[...] = (x * mult.astype(x.dtype))

        return pl.pallas_call(
            kern,
            grid=(N_ROWS // BQ,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BQ, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BQ, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_ROWS, C), jnp.bfloat16),
        )

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    x = jnp.ones((N_ROWS, C), jnp.bfloat16) * 0.5
    seed = jnp.zeros((1, 1), jnp.int32)
    N = 300
    for mode in ("copy", "drop", "byte4", "half2"):
        f = make(mode)

        @jax.jit
        def chain(x, s):
            for _ in range(N):
                x = f(s, x)
            return x

        y = chain(x, seed)
        _ = np.asarray(y[:1, :1])
        null = null_fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = chain(x, seed)
            _ = np.asarray(y[:1, :1])
            best = min(best, time.perf_counter() - t0 - null)
        gbps = 2 * N_ROWS * C * 2 / (best / N) / 1e9
        print(f"{mode:6s} {best / N * 1e3:6.4f} ms/call  ({gbps:5.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
