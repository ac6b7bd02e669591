"""Sweep flash-attention block sizes at the training shapes.

Times fwd and fwd+bwd of the Pallas kernel at (B=8, H=8, L=1024, dh=128,
dropout 0.3) for candidate (block_q, block_k) pairs, plus the dense XLA
reference for context. Small programs — compiles are fast; the winner (if
any) gets a full-step A/B before being promoted to the default.

Usage: python tools/sweep_flash_blocks.py
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
    from sct_gan_tpu.ops.flash_attention import flash_attention
    from sct_gan_tpu.ops.attention import mha_reference

    B, H, L, D = 8, 8, 1024, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
    mask = jnp.ones((B, L), bool)
    key = jax.random.PRNGKey(0)
    sm = 1.0 / (96.0 ** 0.5)   # unpadded head dim, as in the model

    def null_rpc():
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.zeros((8,)) + i)
            null = min(null, time.perf_counter() - t0)
        return null

    def timeit(fn, n_small=4, n_large=64):
        jfn = jax.jit(lambda c: jnp.sum(fn(q + 0 * c).astype(jnp.float32)))
        _ = np.asarray(jfn(jnp.bfloat16(0)))

        def run(n):
            c = jnp.bfloat16(0)
            t0 = time.perf_counter()
            for _ in range(n):
                c = (jfn(c) * 0).astype(jnp.bfloat16)
            _ = np.asarray(c)
            return time.perf_counter() - t0

        t1, t2 = run(n_small), run(n_large)
        return (t2 - t1) / (n_large - n_small)

    configs = [(512, 1024), (512, 512), (256, 1024), (1024, 1024),
               (256, 512), (128, 1024)]
    for bq, bk in configs:
        def fwd(qq, bq=bq, bk=bk):
            return flash_attention(qq, k, v, key_padding_mask=mask,
                                   causal=True, block_q=bq, block_k=bk,
                                   dropout_rate=0.3, dropout_rng=key,
                                   sm_scale=sm)

        def fwdbwd(qq, bq=bq, bk=bk):
            return jax.grad(lambda x: jnp.sum(
                flash_attention(x, k, v, key_padding_mask=mask, causal=True,
                                block_q=bq, block_k=bk, dropout_rate=0.3,
                                dropout_rng=key, sm_scale=sm
                                ).astype(jnp.float32)))(qq)

        tf = timeit(fwd)
        tb = timeit(fwdbwd)
        print(f"blocks ({bq:4d},{bk:4d}): fwd {tf*1e3:6.3f} ms  "
              f"fwd+bwd {tb*1e3:6.3f} ms", flush=True)

    def dense(qq):
        return mha_reference(qq, k, v, key_padding_mask=mask, causal=True,
                             dropout_rate=0.3, deterministic=False,
                             dropout_rng=key, sm_scale=sm)

    tf = timeit(dense)
    tb = timeit(lambda qq: jax.grad(lambda x: jnp.sum(
        dense(x).astype(jnp.float32)))(qq))
    print(f"dense XLA reference: fwd {tf*1e3:6.3f} ms  "
          f"fwd+bwd {tb*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
