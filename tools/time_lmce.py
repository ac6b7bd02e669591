"""Size the LM-head + cross-entropy prize at full training shape.

The teacher-forced tail of the train step is `output_layer` (768 -> 50,265)
followed by mean-token CE (losses/syntax.py::cross_entropy_loss). The bf16
logits are (8, 1023, 50265) = 823 MB; forward writes them, the logsumexp
reads them, and backward materializes dlogits (softmax - onehot) at the same
size and reads it twice (dW, dx). At ~927 GB/s that HBM traffic is ~4-5 ms
on top of the ~6.6 ms fwd+bwd matmul floor (3 x 0.63 TFLOP @ 284 TFLOPS).

Variants timed (fwd and fwd+bwd wrt x, W, b):
  dense   — current shipped path: x@W+b bf16, logsumexp CE
  chunked — lax.scan over vocab chunks with online (m, s) logsumexp; tests
            whether XLA-level chunking alone recovers the traffic (it
            cannot fuse reductions into matmul epilogues, so likely not)
  fused   — ops/fused_ce.py custom-VJP op (XLA-fused scatter-free backward,
            not Pallas), if present

Usage: python tools/time_lmce.py [--batch 8] [--seq 1024]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--with-chunked", action="store_true",
                    help="also time the (slower, slow-to-compile) scan variant")
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, S, D, V = args.batch, args.seq - 1, 768, 50265
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, S, D)), jnp.bfloat16)
    W = jnp.asarray(rng.normal(0, 0.02, (D, V)), jnp.bfloat16)
    b = jnp.zeros((V,), jnp.float32)
    t = jnp.asarray(rng.integers(0, V, (B, S)), jnp.int32)

    def dense(x, W, b, t):
        # exact shipped numerics (losses/syntax.py::cross_entropy_loss over
        # an nn.Dense): bf16 logits incl. bias, f32 only inside the
        # logsumexp reduction and the picked values — materializing f32
        # logits here would overstate the shipped path's cost
        logits = x @ W + b.astype(x.dtype)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logits, t[..., None],
                                     axis=-1)[..., 0].astype(jnp.float32)
        return (lse - picked).mean()

    def chunked(x, W, b, t):
        n = args.chunks
        vc = -(-V // n)
        vpad = vc * n
        Wp = jnp.pad(W, ((0, 0), (0, vpad - V)))
        bp = jnp.pad(b, (0, vpad - V), constant_values=-1e9)
        Wc = Wp.reshape(D, n, vc).transpose(1, 0, 2)     # (n, D, vc)
        bc = bp.reshape(n, vc)
        xf = x.reshape(-1, D)
        tf = t.reshape(-1)

        def body(carry, inp):
            m, s, picked = carry
            Wi, bi, off = inp
            lg = (xf @ Wi).astype(jnp.float32) + bi      # (N, vc)
            m_new = jnp.maximum(m, lg.max(axis=-1))
            s = s * jnp.exp(m - m_new) + jnp.exp(
                lg - m_new[:, None]).sum(axis=-1)
            loc = tf - off
            inside = (loc >= 0) & (loc < vc)
            pick = jnp.take_along_axis(
                lg, jnp.clip(loc, 0, vc - 1)[:, None], axis=-1)[:, 0]
            picked = jnp.where(inside, pick, picked)
            return (m_new, s, picked), None

        N = xf.shape[0]
        init = (jnp.full((N,), -1e30, jnp.float32),
                jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.float32))
        offs = jnp.arange(n, dtype=jnp.int32) * vc
        (m, s, picked), _ = jax.lax.scan(body, init, (Wc, bc, offs))
        return (m + jnp.log(s) - picked).mean()

    variants = {"dense": dense}
    if args.with_chunked:
        variants["chunked"] = chunked
    try:
        from sct_gan_tpu.ops.fused_ce import fused_linear_cross_entropy
        variants["fused"] = lambda x, W, b, t: fused_linear_cross_entropy(
            x, W, b, t)
    except ImportError:
        pass

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    NCH = 10
    for name, fn in variants.items():
        # numerics check vs dense
        ref = float(dense(x, W, b, t))
        got = float(fn(x, W, b, t))
        gref = jax.grad(dense, argnums=(0, 1))(x, W, b, t)
        ggot = jax.grad(fn, argnums=(0, 1))(x, W, b, t)
        gx_err = float(jnp.abs(gref[0].astype(jnp.float32)
                               - ggot[0].astype(jnp.float32)).max())
        gw_err = float(jnp.abs(gref[1].astype(jnp.float32)
                               - ggot[1].astype(jnp.float32)).max())
        print(f"{name:8s} val={got:.6f} (ref {ref:.6f})  "
              f"|dx|err={gx_err:.2e} |dW|err={gw_err:.2e}", flush=True)

        @jax.jit
        def chain_f(x):
            acc = jnp.float32(0)
            xx = x
            for i in range(NCH):
                acc = acc + fn(xx, W, b, t)
                xx = xx * jnp.bfloat16(1.0 + acc * 1e-20)
            return acc

        g = jax.grad(fn, argnums=(0, 1, 2))

        @jax.jit
        def chain_g(x):
            xx = x
            for _ in range(NCH):
                dx, dW, db = g(xx, W, b, t)
                xx = xx + dx.astype(xx.dtype) * jnp.bfloat16(1e-20)
            return xx

        for tag, ch in (("fwd", chain_f), ("fwd+bwd", chain_g)):
            y = ch(x)
            _ = np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]
            null = null_fetch()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                y = ch(x)
                _ = np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]
                best = min(best, time.perf_counter() - t0 - null)
            print(f"  {name:8s} {tag:8s} {best / NCH * 1e3:7.3f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
