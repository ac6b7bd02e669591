"""Single-query (decode-step) attention as one fused Pallas TPU kernel.

The KV-cached decode loop (infer/generate.py) is cache-bandwidth- and
op-overhead-bound: per decoder layer and step, XLA's lowering of
``mha_reference`` at Sq=1 issues ~10 separate ops (QK^T dot, scale, mask
build, add, softmax chain, masked-row select, PV dot, casts), each with
fixed launch cost and (B, H, 1, S) HBM intermediates. This kernel does the
whole thing in ONE pass per batch element: load the (H, S, dh) K/V slabs,
then score → softmax-in-register → accumulate per head (statically
unrolled) — K/V are each read exactly once (they dominate: (B=32, H=8,
S=1024, 96)·bf16·2 = 100 MB per layer per step) and nothing intermediate
touches HBM.

Grid layout (round 5): one program per BATCH element with whole-(H, S, dh)
blocks, not one per (batch, head). The per-head variant ran 2.45× the
K+V HBM floor; the batched-block form runs 1.94× — 8× fewer grid steps and
8× larger contiguous DMAs (tools/time_decode_kernel_variants.py, B=32,
S=1024: 0.266 → 0.211 ms/call, bit-identical output). That 21% is what
moves the full generation loop past the 12-contracts/s bar.

Replaces the per-token torch decode attention the reference re-runs over the
full prefix each step with NO cache (SCT-GAN/model.py:862-930, O(L³) total).

Semantics match ops/attention.py::mha_reference at Sq=1, deterministic
(generation never applies attention dropout): masked-out keys get -inf
scores; a fully-masked row returns zeros, not NaNs. VMEM per program is
2·(H, S, dh) ≈ 3 MB at production geometry — decode caches are bounded by
max_length, so no streaming needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, nh: int,
            sm_scale: float):
    valid = mask_ref[0] > 0                           # (1, S) int32 block
    for j in range(nh):                               # static unroll over heads
        q = q_ref[0, j]                               # (1, dp)
        k = k_ref[0, j]                               # (S, dp)
        v = v_ref[0, j]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, S)
        s = jnp.where(valid, s * sm_scale, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(valid, p, 0.0)                  # exp(-inf-m) guard
        l = jnp.sum(p, axis=-1, keepdims=True)
        # fully-masked row → zeros (mha_reference convention, NaN-free)
        pn = jnp.where(l > 0.0, p / jnp.maximum(l, 1e-30), 0.0)
        o = jax.lax.dot_general(pn.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, dp)
        o_ref[0, j] = o.astype(o_ref.dtype)


def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     mask: jnp.ndarray, *, sm_scale: float,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused single-query attention.

    Args:
        q: (B, H, 1, dp) current-token queries.
        k, v: (B, H, S, dp) caches (any S; whole-(H, S, dp) blocks in VMEM).
        mask: (B, S) bool/int — True/nonzero = attendable. Covers both the
            decode causal mask (arange <= pos) and cross-attention source
            padding.
        sm_scale: softmax scale (1/sqrt(real head dim) — REQUIRED, since dp
            may be the lane-padded width).
    Returns:
        (B, H, 1, dp) in q.dtype.
    """
    b, h, _, dp = q.shape
    s = k.shape[2]
    mask_i = mask.astype(jnp.int32).reshape(b, 1, s)
    out = pl.pallas_call(
        functools.partial(_kernel, nh=h, sm_scale=float(sm_scale)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, 1, dp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s, dp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, s, dp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, 1, dp), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, dp), q.dtype),
        interpret=interpret,
    )(q, k, v, mask_i)
    return out
