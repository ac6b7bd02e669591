"""Time the PRODUCTION flash_attention kernel at training shape.

The variant microbench (time_flash_variants.py) showed a single-pass
softmax kernel runs at +0.03 ms over the pure-matmul floor (0.21 vs
0.18 ms) — so whatever the real kernel costs above that is carry
machinery (scratch round-trips, alpha rescale), masking, dropout PRNG,
or the lse write, not transcendentals. This times the real kernel
fwd and fwd+bwd, with and without dropout, to attribute those.

Usage: python tools/time_flash_real.py [--bq 512] [--bk 1024]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bq", type=int, default=512)
    ap.add_argument("--bk", type=int, default=1024)
    ap.add_argument("--dh", type=int, default=96,
                    help="96 = raw head dim; 128 = the production path "
                         "(lane pad folded into the projections)")
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sct_gan_tpu.ops.flash_attention import flash_attention

    B, H, S, DH = 8, 8, 1024, args.dh
    N = args.steps
    key = jax.random.PRNGKey(0)
    q = (jax.random.normal(key, (B, H, S, DH), jnp.bfloat16) * 0.05)
    mask = jnp.ones((B, S), bool)

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    def timeit(fn, *xs):
        c = jax.jit(fn)
        y = c(*xs)
        _ = np.asarray(jax.tree_util.tree_leaves(y)[0][:1, :1, :1, :1])
        null = null_fetch()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = c(*xs)
            _ = np.asarray(jax.tree_util.tree_leaves(y)[0][:1, :1, :1, :1])
            best = min(best, time.perf_counter() - t0 - null)
        return best / N * 1e3

    rng = jax.random.PRNGKey(1)

    def fwd(x, rate):
        for _ in range(N):
            x = flash_attention(
                x, x, x, key_padding_mask=mask, block_q=args.bq,
                block_k=args.bk, dropout_rate=rate,
                dropout_rng=rng if rate else None,
            ) * jnp.bfloat16(0.999)
        return x

    def fwdbwd(x, rate):
        def loss(xx):
            o = flash_attention(
                xx, xx, xx, key_padding_mask=mask, block_q=args.bq,
                block_k=args.bk, dropout_rate=rate,
                dropout_rng=rng if rate else None)
            return jnp.sum(o.astype(jnp.float32) * 1e-3), o

        for _ in range(N):
            (_, o), g = jax.value_and_grad(loss, has_aux=True)(x)
            x = (o + g).astype(jnp.bfloat16) * jnp.bfloat16(0.5)
        return x

    for name, fn, xargs in (
        ("fwd nodrop ", fwd, (q, 0.0)),
        ("fwd drop.3 ", fwd, (q, 0.3)),
        ("fb  nodrop ", fwdbwd, (q, 0.0)),
        ("fb  drop.3 ", fwdbwd, (q, 0.3)),
    ):
        ms = timeit(lambda x: fn(x, xargs[1]), xargs[0])
        print(f"{name} {ms:6.3f} ms/call  (bq={args.bq} bk={args.bk})",
              flush=True)


if __name__ == "__main__":
    main()
