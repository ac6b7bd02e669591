"""Decompose the flash-attention kernel cost: matmuls vs exp vs masks.

Hypothesis: at (B=8, H=8, S=1024, dp=128) the QK^T/AV matmuls are ~0.12 ms
of MXU work but the per-tile exp over (BQ, BK) f32 scores is VPU-bound and
dominates. Three kernels with identical memory traffic and grid:

  full   — the real fwd math (online softmax incl. exp)
  noexp  — same but p = clipped scores (no exp, no running max rescale)
  mmonly — QK^T and AV only, accumulate raw scores

Each timed as a chain of 20 calls inside one jit (differential fetch).

Usage: python tools/time_flash_parts.py
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

    B, H, S, DP = 8, 8, 1024, 128
    BQ, BK = 512, 1024
    nq, nk = S // BQ, S // BK

    def kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, mode):
        kj = pl.program_id(3)

        @pl.when(kj == 0)
        def _init():
            m_s[...] = jnp.full_like(m_s, -1e30)
            l_s[...] = jnp.zeros_like(l_s)
            acc_s[...] = jnp.zeros_like(acc_s)

        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * 0.1
        if mode == "full":
            m_prev = m_s[:, 0:1]
            l_prev = l_s[:, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v = v_ref[0, 0]
            acc_s[...] = acc_s[...] * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            m_s[...] = jnp.broadcast_to(m_new, m_s.shape)
            l_s[...] = jnp.broadcast_to(l_new, l_s.shape)
        elif mode == "noexp":
            p = jnp.clip(s, 0.0, 1.0)
            l_new = l_s[:, 0:1] + jnp.sum(p, axis=-1, keepdims=True)
            v = v_ref[0, 0]
            acc_s[...] = acc_s[...] + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            l_s[...] = jnp.broadcast_to(l_new, l_s.shape)
        else:   # mmonly
            v = v_ref[0, 0]
            acc_s[...] = acc_s[...] + jnp.dot(
                s.astype(v.dtype), v, preferred_element_type=jnp.float32)

        @pl.when(kj == nk - 1)
        def _fin():
            denom = l_s[:, 0:1] if mode != "mmonly" else 1.0
            o_ref[0, 0] = (acc_s[...] / jnp.maximum(denom, 1e-9)).astype(
                o_ref.dtype)

    def build(mode):
        f = pl.pallas_call(
            functools.partial(kernel, mode=mode),
            grid=(B, H, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, DP), lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, DP), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BK, DP), lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, BQ, DP),
                                   lambda b, h, i, j: (b, h, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, S, DP), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((BQ, 128), jnp.float32),
                            pltpu.VMEM((BQ, 128), jnp.float32),
                            pltpu.VMEM((BQ, DP), jnp.float32)],
        )
        return f

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    q = jnp.ones((B, H, S, DP), jnp.bfloat16) * 0.01
    N = 20
    for mode in ("full", "noexp", "mmonly"):
        f = build(mode)

        @jax.jit
        def chain(x):
            for _ in range(N):
                x = f(x, x, x) * jnp.bfloat16(0.999)
            return x

        y = chain(q)
        _ = np.asarray(y[:1, :1, :1, :1])
        null = null_fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = chain(q)
            _ = np.asarray(y[:1, :1, :1, :1])
            best = min(best, time.perf_counter() - t0 - null)
        print(f"{mode:7s} {best / N * 1e3:6.3f} ms/call (fwd only)",
              flush=True)


if __name__ == "__main__":
    main()
