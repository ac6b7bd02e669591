"""Microbench candidate flash-forward kernel variants at production shape.

Round-3 decomposition (tools/time_flash_parts.py): at (B=8, H=8, S=1024,
DP=128, BQ=512, BK=1024) the QK^T/AV matmuls are 0.134 ms but the full
online-softmax forward is ~0.75 ms — the VPU elementwise work on the
(512, 1024) f32 score tile (exp, cross-lane max/sum reductions, selects)
is ~5x the MXU time. Variants tested here (all single-pass, nk==1 as in
production; the running-max carry baseline is time_flash_parts.py "full"):

  nk1     — single-pass softmax with jnp.exp (no carry, no alpha rescale)
  exp2    — nk1 with jnp.exp2 and log2(e) folded into the score scale
  mxsum   — exp2 + row-sum via p @ ones on the MXU (no cross-lane VPU sum)
  bf16p   — exp2 but the exp2 computed on bf16 scores (half the VPU work)
  masked  — nk1 + threshold select (the padded path's extra compare+select)
  mmonly  — QK^T and AV only (the MXU floor)

Usage: python tools/time_flash_variants.py
"""
from __future__ import annotations

import functools
import math
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

    B, H, S, DP = 8, 8, 1024, 128
    BQ, BK = 512, 1024
    nq, nk = S // BQ, S // BK
    LOG2E = math.log2(math.e)

    def kern(q_ref, k_ref, v_ref, ones_ref, o_ref, *, mode):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        use2 = mode in ("exp2", "mxsum", "bf16p")
        scale = 0.1 * (LOG2E if use2 else 1.0)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        if mode == "mmonly":
            o_ref[0, 0] = jnp.dot(s.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32
                                  ).astype(o_ref.dtype)
            return
        m = jnp.max(s, axis=-1, keepdims=True)
        if mode == "bf16p":
            p = jnp.exp2((s - m).astype(jnp.bfloat16)).astype(jnp.float32)
        elif use2:
            p = jnp.exp2(s - m)
        else:
            p = jnp.exp(s - m)
        if mode == "masked":
            p = jnp.where(s > -1e29, p, 0.0)
        pv = p.astype(v.dtype)
        if mode == "mxsum":
            l = jnp.dot(pv, ones_ref[0],
                        preferred_element_type=jnp.float32)[:, 0:1]
        else:
            l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jnp.dot(pv, v, preferred_element_type=jnp.float32)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-9)).astype(o_ref.dtype)

    def build(mode):
        return pl.pallas_call(
            functools.partial(kern, mode=mode),
            grid=(B, H, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, DP), lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, DP), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, DP), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, 128), lambda b, h, i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, DP),
                                   lambda b, h, i, j: (b, h, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, S, DP), jnp.bfloat16),
        )

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    q = jnp.ones((B, H, S, DP), jnp.bfloat16) * 0.01
    ones = jnp.ones((1, BK, 128), jnp.bfloat16)
    N = 200
    for mode in ("nk1", "exp2", "mxsum", "bf16p", "masked", "mmonly"):
        f = build(mode)

        @jax.jit
        def chain(x, o):
            for _ in range(N):
                x = f(x, x, x, o) * jnp.bfloat16(0.999)
            return x

        y = chain(q, ones)
        _ = np.asarray(y[:1, :1, :1, :1])
        null = null_fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = chain(q, ones)
            _ = np.asarray(y[:1, :1, :1, :1])
            best = min(best, time.perf_counter() - t0 - null)
        print(f"{mode:7s} {best / N * 1e3:6.3f} ms/call (fwd only)",
              flush=True)


if __name__ == "__main__":
    main()
