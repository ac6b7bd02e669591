"""Time decode-attention kernel variants inside a while_loop on the chip.

The B-scaling of the decode loop (quick_bench at B=32/64) factors the
loop-step cost as fixed ≈ 0.24 ms + 84 µs/contract — ~2.7× the chunked-cache
HBM floor (~31 µs/contract), so the per-(batch, head) kernel is the lever,
not batch widening (the asymptote at c = 84 µs is 11.7 contracts/s < the 12
bar). Variants:

  v1  shipped kernel: grid (B, H), one (S, dp) K/V tile per program.
  v2  grid (B,): one (H, S, dp) block per program, unrolled head loop —
      8× fewer programs, 8× larger contiguous DMAs.
  v3  v2 with H folded into the sublane dim: K reshaped (B, H·S, dp) so a
      program reads ONE (H·S, dp) slab; per-head slices in-kernel.

Usage: python tools/time_decode_kernel_variants.py [--batch 32] [--steps 256]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--dh", type=int, default=96)
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from sct_gan_tpu.ops.decode_attention import decode_attention

    b, h, s, dh = args.batch, args.heads, args.seq, args.dh
    n = args.steps
    scale = 1.0 / (dh ** 0.5)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, 1, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((b, s)) > 0.1)

    _NEG_INF = -1e30

    def _v2_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, nh, sm_scale):
        valid = mask_ref[0] > 0                       # (1, S)
        for j in range(nh):                           # unrolled static loop
            qj = q_ref[0, j]                          # (1, dp)
            kj = k_ref[0, j]                          # (S, dp)
            vj = v_ref[0, j]
            sc = jax.lax.dot_general(qj, kj, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(valid, sc * sm_scale, _NEG_INF)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.where(valid, jnp.exp(sc - m), 0.0)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pn = jnp.where(l > 0.0, p / jnp.maximum(l, 1e-30), 0.0)
            o = jax.lax.dot_general(pn.astype(vj.dtype), vj,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, j] = o.astype(o_ref.dtype)

    def v2(q, k, v, mask):
        mask_i = mask.astype(jnp.int32).reshape(b, 1, s)
        return pl.pallas_call(
            functools.partial(_v2_kernel, nh=h, sm_scale=scale),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, 1, dh), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, s, dh), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, 1, dh), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), q.dtype),
        )(q, k, v, mask_i)

    def _v3_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, nh, ss,
                   sm_scale):
        valid = mask_ref[0] > 0                       # (1, S)
        for j in range(nh):
            qj = q_ref[0, j]                          # (1, dp)
            kj = k_ref[0, j * ss:(j + 1) * ss]        # (S, dp) slice of slab
            vj = v_ref[0, j * ss:(j + 1) * ss]
            sc = jax.lax.dot_general(qj, kj, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            sc = jnp.where(valid, sc * sm_scale, _NEG_INF)
            m = jnp.max(sc, axis=-1, keepdims=True)
            p = jnp.where(valid, jnp.exp(sc - m), 0.0)
            l = jnp.sum(p, axis=-1, keepdims=True)
            pn = jnp.where(l > 0.0, p / jnp.maximum(l, 1e-30), 0.0)
            o = jax.lax.dot_general(pn.astype(vj.dtype), vj,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, j] = o.astype(o_ref.dtype)

    def v3(q, k, v, mask):
        mask_i = mask.astype(jnp.int32).reshape(b, 1, s)
        k2 = k.reshape(b, h * s, dh)
        v2_ = v.reshape(b, h * s, dh)
        return pl.pallas_call(
            functools.partial(_v3_kernel, nh=h, ss=s, sm_scale=scale),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, 1, dh), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, h * s, dh), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h * s, dh), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, 1, dh), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, 1, dh), q.dtype),
        )(q, k2, v2_, mask_i)

    v1 = lambda q, k, v, mask: decode_attention(q, k, v, mask,
                                                sm_scale=scale)

    # parity first
    want = np.asarray(v1(q, k, v, mask), np.float32)
    for name, fn in (("v2", v2), ("v3", v3)):
        got = np.asarray(fn(q, k, v, mask), np.float32)
        err = np.abs(got - want).max()
        print(f"{name} parity max-abs-err vs v1: {err:.2e}", flush=True)
        assert err < 2e-2, name

    def time_loop(fn):
        @jax.jit
        def loop(q, k, v, mask):
            def body(carry):
                q, i = carry
                o = fn(q, k, v, mask)
                return q + o * 0, i + 1     # data dependency, no growth

            def cond(carry):
                return carry[1] < n

            out, _ = jax.lax.while_loop(cond, body, (q, jnp.int32(0)))
            return out

        out = loop(q, k, v, mask)
        _ = np.asarray(out).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(q, k, v, mask)
            _ = np.asarray(out).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best / n * 1e3

    floor_ms = (2 * b * h * s * dh * 2) / 927e9 * 1e3
    print(f"HBM floor (K+V read once): {floor_ms:.3f} ms", flush=True)
    for name, fn in (("v1-shipped", v1), ("v2-perbatch", v2),
                     ("v3-slab", v3)):
        ms = time_loop(fn)
        print(f"{name}: {ms:.3f} ms/call  ({ms / floor_ms:.2f}x floor)",
              flush=True)


if __name__ == "__main__":
    main()
