"""Blockwise flash attention as a Pallas TPU kernel.

Replaces the implicit fused attention the reference gets from PyTorch's CUDA
kernels (SCT-GAN/model.py:56-77 and the 7 standalone MHA modules). Online
(streaming) softmax over key/value blocks: the (Sq, Sk) score matrix is never
materialized in HBM, only one (BQ, BK) tile at a time in VMEM. Scales past the
reference's hard L=1024 cap by construction.

Forward is the Pallas kernel; backward is a recompute-based custom VJP through
the pure-JAX reference (`mha_reference`) — numerically identical gradients,
flash-memory forward. A fused backward kernel is a later optimization.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import mha_reference

_NEG_INF = -1e30
_MASK_THRESHOLD = -1e29  # entries at/below this are treated as fully masked


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fa_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, bq, bk, sk_padded,
               causal, scale):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (BQ, Dp)
    num_kv_blocks = sk_padded // bk
    if causal:
        # With BQ == BK the last block any query row can see is block qi.
        upper = qi + 1
    else:
        upper = num_kv_blocks

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * bk, bk), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        s = s + bias_ref[0, :, pl.ds(j * bk, bk)]   # (1, BK) broadcast
        if causal:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        # Zero fully-masked entries explicitly: when an entire row is masked
        # so far, m_new == -inf stand-in and exp(0) would otherwise leak 1s.
        p = jnp.where(s > _MASK_THRESHOLD, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        v = v_ref[0, 0, pl.ds(j * bk, bk), :]
        acc_new = acc * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq,), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq,), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, q_ref.shape[-1]), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, upper, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)  # fully-masked query rows → zeros, not NaN
    o_ref[0, 0] = (acc / l[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v, kp_bias, causal: bool, block_q: int, block_k: int):
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    dp = _round_up(dh, 128)
    sqp = _round_up(sq, block_q)
    skp = _round_up(sk, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sqp - sq), (0, dp - dh)))
    kpad = jnp.pad(k, ((0, 0), (0, 0), (0, skp - sk), (0, dp - dh)))
    vpad = jnp.pad(v, ((0, 0), (0, 0), (0, skp - sk), (0, dp - dh)))
    bias = jnp.pad(kp_bias.astype(jnp.float32), ((0, 0), (0, skp - sk)),
                   constant_values=_NEG_INF)[:, None, :]   # (B, 1, Skp)

    scale = 1.0 / (dh ** 0.5)
    grid = (b, h, sqp // block_q)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, bq=block_q, bk=block_k, sk_padded=skp,
                          causal=causal, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dp), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skp, dp), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skp, dp), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            # (1, 1, Skp) block of the (B, 1, Skp) bias: last two dims
            # equal the array dims, satisfying the TPU tiling minimum
            pl.BlockSpec((1, 1, skp), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dp),
                               lambda b_, h_, i: (b_, h_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sqp, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sqp * skp * dp,
            bytes_accessed=(qp.size + kpad.size + vpad.size) * qp.dtype.itemsize,
            transcendentals=b * h * sqp * skp,
        ),
    )(qp, kpad, vpad, bias)
    return out[:, :, :sq, :dh]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, kp_bias, causal, block_q, block_k):
    return _flash_forward(q, k, v, kp_bias, causal, block_q, block_k)


def _flash_fwd(q, k, v, kp_bias, causal, block_q, block_k):
    out = _flash_forward(q, k, v, kp_bias, causal, block_q, block_k)
    return out, (q, k, v, kp_bias)


def _flash_bwd(causal, block_q, block_k, residuals, g):
    q, k, v, kp_bias = residuals

    def ref(q_, k_, v_):
        mask = kp_bias > _MASK_THRESHOLD  # back to boolean attendable mask
        return mha_reference(q_, k_, v_, key_padding_mask=mask, causal=causal)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(kp_bias)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """Flash attention over split heads (B, H, S, Dh).

    ``key_padding_mask``: (B, Sk) bool, True = attendable.
    """
    sk = k.shape[2]
    if key_padding_mask is None:
        kp_bias = jnp.zeros((q.shape[0], sk), dtype=jnp.float32)
    else:
        kp_bias = jnp.where(key_padding_mask, 0.0, _NEG_INF).astype(jnp.float32)
    return _flash(q, k, v, kp_bias, causal, block_q, block_k)
