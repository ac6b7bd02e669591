"""Measure achievable bf16 matmul TFLOPS on this chip.

Sets the real speed-of-light for MFU claims: a chain of data-dependent
square matmuls, differential-timed (block_until_ready is a no-op on the
tunneled runtime). Also measures an HBM-bandwidth probe (big elementwise
copy) for the bandwidth roofline.

Usage: python tools/peak_matmul.py
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

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    for n in (4096, 8192):
        a = jnp.ones((n, n), jnp.bfloat16)

        @jax.jit
        def chain(x, k=16):
            for _ in range(k):
                x = jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
                x = x * jnp.bfloat16(1e-4)   # keep finite, negligible cost
            return x

        x = jnp.ones((n, n), jnp.bfloat16)
        y = chain(x)
        _ = np.asarray(y[:1, :1])
        null = null_fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = chain(x)
            _ = np.asarray(y[:1, :1])
            best = min(best, time.perf_counter() - t0 - null)
        flops = 2.0 * n * n * n * 16
        print(f"matmul {n}^3 x16: {best * 1e3:.2f} ms total -> "
              f"{flops / best / 1e12:.1f} TFLOPS bf16", flush=True)

    # HBM bandwidth: big copy-scale chain
    m = jnp.ones((256, 1024, 1024), jnp.bfloat16)   # 512 MB

    @jax.jit
    def bw(x, k=8):
        for _ in range(k):
            x = x * jnp.bfloat16(1.0000001)
        return x

    y = bw(m)
    _ = np.asarray(y[:1, :1, :1])
    null = null_fetch()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = bw(m)
        _ = np.asarray(y[:1, :1, :1])
        best = min(best, time.perf_counter() - t0 - null)
    byts = 2 * m.size * m.dtype.itemsize * 8   # read+write per pass, 8 passes
    print(f"elementwise x8 over 512 MB: {best * 1e3:.2f} ms -> "
          f"{byts / best / 1e9:.0f} GB/s HBM", flush=True)


if __name__ == "__main__":
    main()
