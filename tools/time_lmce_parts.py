"""Decompose the fused-CE backward: which piece costs 35 ms?

Pieces at (8, 1023, 768) x (768, 50265), bf16:
  logits   — hidden @ W + b                          (fwd matmul, 0.63 TFLOP)
  dlogits  — exp(logits - lse) - onehot, cast bf16   (elementwise pass)
  dhidden  — dlogits @ W^T                           (matmul, 0.63 TFLOP)
  dkernel  — hidden^T contracted with dlogits        (matmul, 0.63 TFLOP)
  dkernelT — same via (V-major) dot_general layouts

Usage: python tools/time_lmce_parts.py
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

    B, S, D, V = 8, 1023, 768, 50265
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(0, 1, (B, S, D)), jnp.bfloat16)
    W = jnp.asarray(rng.normal(0, 0.02, (D, V)), jnp.bfloat16)
    b = jnp.zeros((V,), jnp.bfloat16)
    t = jnp.asarray(rng.integers(0, V, (B, S)), jnp.int32)
    lse = jnp.asarray(rng.normal(5, 0.1, (B, S)), jnp.float32)
    dl = jnp.asarray(rng.normal(0, 0.1, (B, S, V)), jnp.bfloat16)

    def p_logits(h, dl):
        return h @ W + b

    def p_dlogits(h, dl):
        logits = h @ W + b
        p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
        oh = (t[..., None] == jnp.arange(V, dtype=t.dtype)).astype(jnp.float32)
        return (p - oh).astype(jnp.bfloat16)

    def p_dhidden(h, dl):
        return jnp.matmul(dl, W.T, preferred_element_type=jnp.float32)

    def p_dkernel(h, dl):
        return jnp.einsum("bsd,bsv->dv", h, dl,
                          preferred_element_type=jnp.float32)

    def p_dkernel_flat(h, dl):
        h2 = h.reshape(-1, D)
        d2 = dl.reshape(-1, V)
        return jax.lax.dot_general(h2, d2, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    N = 10
    for name, fn in (("logits", p_logits), ("dlogits", p_dlogits),
                     ("dhidden", p_dhidden), ("dkernel", p_dkernel),
                     ("dkernel_flat", p_dkernel_flat)):

        @jax.jit
        def chain(h, dl):
            acc = jnp.float32(0)
            for i in range(N):
                y = fn(h, dl)
                acc = acc + y.astype(jnp.float32).ravel()[0]
                h = h * jnp.bfloat16(1.0 + acc * 1e-30)
            return acc

        y = chain(h, dl)
        _ = float(y)
        null = null_fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(h, dl))
            best = min(best, time.perf_counter() - t0 - null)
        print(f"{name:13s} {best / N * 1e3:7.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
