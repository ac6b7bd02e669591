"""Blockwise flash attention as Pallas TPU kernels — forward AND backward,
with in-kernel attention-weight dropout.

Replaces the implicit fused attention the reference gets from PyTorch's CUDA
kernels (SCT-GAN/model.py:56-77 and the 7 standalone MHA modules). Online
(streaming) softmax over key/value blocks: the (Sq, Sk) score matrix is never
materialized in HBM — not in the forward and not in the backward.

K and V are STREAMED: every kernel walks its contraction sequence through a
trailing grid dimension, holding only (block × head_dim) tiles in VMEM while
the running state (softmax statistics + accumulators) lives in VMEM scratch
that persists across grid steps. VMEM per program is ~2 MB at any sequence
length, so the kernels scale to L=8k/16k+ by construction (validated on-chip
at L=8192 by tools/validate_tpu_kernels.py), unlike a whole-K-in-VMEM layout
that dies around L≈8-16k. At the production L=1024 the default blocks
(bq=512, bk=1024) make nk=1, so the streaming loop degenerates to the
single-pass layout and costs nothing over a monolithic kernel.

Dropout is applied to the softmax weights exactly as torch MHA does
(keep/(1-r) scaling), but generated tile-by-tile with the Pallas TPU PRNG:
the mask for tile (b, h, qi, kj) is a pure function of a scalar seed and the
tile coordinates, so the backward kernels REGENERATE it bit-for-bit instead
of storing an (Sq, Sk) mask. This is what lets training-mode attention
(dropout 0.3 on 13 modules, model.py:56-77) stay on the flash path. Forward
and backward must (and now trivially do) use identical block sizes, or the
regenerated masks diverge.

Forward saves per-row log-sum-exp; the backward is the standard two-kernel
flash recipe (with M the dropout keep-mask, r the rate):
    D  = rowsum(dO ∘ O)                               (XLA)
    dV = (M∘P/(1-r))ᵀ dO                              (dKV kernel, K-major)
    dS = P ∘ (M/(1-r) ∘ (dO Vᵀ) − D);  dK = dSᵀ Q·s
    dQ = dS K · s                                     (dQ kernel, Q-major)
with P = exp(S − lse) recomputed tile-by-tile in VMEM. (The dropout-aware
softmax-backward identity: Σ_k W_ik dW_ik = dO_i·O_i = D_i still holds.)
All three kernels keep the score tile in natural (BQ, BK) orientation: the
dKV kernel's Pᵀ dO / dSᵀ Q are `dot_general`s contracting the query dim —
the MXU takes transposed operand feeds natively, so no f32 tile relayouts
and no i1→f32 dropout-mask lift. When a kernel's contraction sequence is a
single block (nk==1 fwd/dQ, nq==1 dKV — always true at the production
L=1024 with the default blocks), a single-pass specialization skips the
running-statistics scratch carry entirely (measured 0.213 vs 0.309 ms/call
fwd at (8, 8, 1024, 128), tools/time_flash_variants.py).

TPU layout notes: per-row statistics (lse, D) are carried in lane-broadcast
(…, S, 128) buffers — a (1, 1, BQ) block of a (B, H, S) array violates the
(8, 128) minimum tile, a (…, BQ, 128) block doesn't.

Precision: every matmul keeps its operands in the INPUT dtype (bf16 from the
QKV projections) with f32 MXU accumulation (`preferred_element_type`) —
upcasting operands to f32 would cut the MXU rate ~4× and double VMEM/HBM
traffic. All softmax statistics (m, l, lse, D) and the dS/dP intermediates
stay f32; dS/P are cast back to bf16 only as matmul operands.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_MASK_THRESHOLD = -1e29  # entries at/below this are treated as fully masked


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _keep_mask(seed_ref, tile_index, bq, bk, rate):
    """Deterministic per-tile keep mask, regenerable in any kernel.

    Mosaic's prng_seed accepts at most 2 scalars, so the (b, h, qi, kj) tile
    coordinates are pre-folded into one index by the caller."""
    pltpu.prng_seed(seed_ref[0, 0], tile_index)
    bits = pltpu.bitcast(pltpu.prng_random_bits((bq, bk)), jnp.uint32)
    threshold = jnp.uint32(int(min(rate, 0.999999) * 4294967296.0))
    return bits >= threshold


def _tile_index(b, h, qi, kj, nh, nq, nk):
    """Unique int32 per (batch, head, q-block, k-block) tile."""
    return ((b * nh + h) * nq + qi) * nk + kj


# -- forward ----------------------------------------------------------------

def _fa_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                   m_s, l_s, acc_s, *, bq, bk, causal, scale, dropout_rate,
                   nh, nq, nk):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    kj = pl.program_id(3)

    if nk == 1:
        # Single-pass specialization (production S<=block_k): no running
        # max/sum carry, no alpha rescale, no scratch round-trips — measured
        # 0.213 vs 0.309 ms/call at (8,8,1024,128) (tools/time_flash_variants).
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, :]
        if causal:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(s > _MASK_THRESHOLD, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, _tile_index(bi, hi, qi, 0, nh, nq, 1),
                              bq, bk, dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        v = v_ref[0, 0]
        acc = jnp.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        l_safe = jnp.where(l == 0.0, 1.0, l)   # fully-masked rows → zeros
        o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
        lse = m + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:]).astype(
            lse_ref.dtype)
        return

    @pl.when(kj == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    # for causal attention, blocks strictly above the diagonal contribute
    # nothing — skip their compute (their K/V DMA still runs, which is fine:
    # it is overlapped and bandwidth is not the bottleneck here)
    needed = (kj * bk <= qi * bq + bq - 1) if causal else (kj >= 0)

    @pl.when(needed)
    def _compute():
        # matmuls stay in the input dtype (bf16 from the projections) with
        # f32 MXU accumulation; all softmax statistics remain f32
        q = q_ref[0, 0]                                     # (BQ, Dp)
        k = k_ref[0, 0]                                     # (BK, Dp)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, :]                              # (1, BK) bcast
        if causal:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows, s, _NEG_INF)
        m_prev = m_s[:, 0:1]                                # (BQ, 1)
        l_prev = l_s[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        # Zero fully-masked entries explicitly: when an entire row is masked
        # so far, m_new == -inf stand-in and exp(0) would otherwise leak 1s.
        p = jnp.where(s > _MASK_THRESHOLD, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)                     # (BQ, 1)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref,
                              _tile_index(bi, hi, qi, kj, nh, nq, nk),
                              bq, bk, dropout_rate)
            p_use = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_use = p
        v = v_ref[0, 0]                                     # (BK, Dp)
        acc_s[...] = acc_s[...] * alpha + jnp.dot(
            p_use.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_s[...] = jnp.broadcast_to(m_new, m_s.shape)
        l_s[...] = jnp.broadcast_to(l_new, l_s.shape)

    @pl.when(kj == nk - 1)
    def _finalize():
        l = l_s[:, 0:1]
        l_safe = jnp.where(l == 0.0, 1.0, l)   # fully-masked rows → zeros
        o_ref[0, 0] = (acc_s[...] / l_safe).astype(o_ref.dtype)
        lse = m_s[:, 0:1] + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:]).astype(
            lse_ref.dtype)


def _flash_forward(q, k, v, kp_bias, seed, causal: bool, block_q: int,
                   block_k: int, dropout_rate: float, sm_scale,
                   need_lse: bool):
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
    seed2d = seed.reshape(1, 1).astype(jnp.int32)

    scale = (1.0 / (dh ** 0.5)) if sm_scale is None else sm_scale
    nq, nk = sqp // block_q, skp // block_k
    grid = (b, h, nq, nk)
    seed_spec = pl.BlockSpec((1, 1), lambda b_, h_, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fa_fwd_kernel, bq=block_q, bk=block_k,
                          causal=causal, scale=scale,
                          dropout_rate=dropout_rate, nh=h, nq=nq, nk=nk),
        grid=grid,
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, 1, block_q, dp),
                         lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dp),
                         lambda b_, h_, i, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, dp),
                         lambda b_, h_, i, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            # (1, 1, BK) block of the (B, 1, Skp) bias: sublane dim equals
            # the array dim (1), satisfying the TPU tiling minimum
            pl.BlockSpec((1, 1, block_k), lambda b_, h_, i, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, dp),
                         lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 128),
                         lambda b_, h_, i, j: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sqp, dp), q.dtype),
            jax.ShapeDtypeStruct((b, h, sqp, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max m
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum l
            pltpu.VMEM((block_q, dp), jnp.float32),    # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sqp * skp * dp,
            bytes_accessed=(qp.size + kpad.size + vpad.size) * qp.dtype.itemsize,
            transcendentals=b * h * sqp * skp,
        ),
    )(seed2d, qp, kpad, vpad, bias)
    out = out[:, :, :sq, :dh]
    if need_lse:
        return out, lse, (qp, kpad, vpad, bias)
    return out


# -- backward ---------------------------------------------------------------

def _fa_dkv_kernel(seed_ref, k_ref, v_ref, bias_ref, q_ref, do_ref, lse_ref,
                   d_ref, dk_ref, dv_ref, dk_s, dv_s, *, bq, bk, causal,
                   scale, dropout_rate, nh, nq, nk):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    kj = pl.program_id(2)
    qi = pl.program_id(3)

    # Everything in natural (BQ, BK) orientation: dV = Pᵀ dO and dK = dSᵀ Q
    # are dot_generals contracting dim 0 of both operands — the MXU takes
    # transposed operand feeds natively, so no (512, 1024) f32 relayout and
    # (with dropout) no i1→f32 mask lift + transpose.
    _c0 = (((0,), (0,)), ((), ()))

    def _tile(qi_):
        k = k_ref[0, 0]                                   # (BK, Dp) bf16
        v = v_ref[0, 0]
        inv_keep = (1.0 / (1.0 - dropout_rate)
                    if dropout_rate > 0.0 else 1.0)
        q = q_ref[0, 0]                                   # (BQ, Dp)
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, 0]                         # (BQ,)
        dvec = d_ref[0, 0, :, 0]                          # (BQ,)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, :]                            # (1, BK) bcast
        if causal:
            rows = qi_ * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])
        p = jnp.where(s > _MASK_THRESHOLD, p, 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # (BQ,BK)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref,
                              _tile_index(bi, hi, qi_, kj, nh, nq, nk),
                              bq, bk, dropout_rate)
            p_drop = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        else:
            p_drop = p
        mm_dtype = k.dtype  # bf16 matmul operands, f32 MXU accumulation
        dv_t = jax.lax.dot_general(p_drop.astype(mm_dtype), do, _c0,
                                   preferred_element_type=jnp.float32)
        ds = (p * (dp - dvec[:, None])).astype(mm_dtype)
        dk_t = jax.lax.dot_general(ds, q, _c0,
                                   preferred_element_type=jnp.float32) * scale
        return dk_t, dv_t                                 # (BK, Dp) each

    if nq == 1:
        # single-pass: no scratch accumulation round-trips
        dk_t, dv_t = _tile(0)
        dk_ref[0, 0] = dk_t.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_t.astype(dv_ref.dtype)
        return

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    # causal: q-blocks strictly above the diagonal see none of this k-block
    needed = (qi * bq + bq - 1 >= kj * bk) if causal else (qi >= 0)

    @pl.when(needed)
    def _compute():
        dk_t, dv_t = _tile(qi)
        dk_s[...] = dk_s[...] + dk_t
        dv_s[...] = dv_s[...] + dv_t

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_s[...].astype(dv_ref.dtype)


def _fa_bwd_fused_kernel(seed_ref, k_ref, v_ref, bias_ref, q_ref, do_ref,
                         lse_ref, d_ref, dk_ref, dv_ref, dq_ref, dk_s, dv_s,
                         *, bq, bk, causal, scale, dropout_rate, nh, nq):
    """Single-kernel backward for the nk==1 case (K/V fit one block — always
    true at the production L=1024): emits dQ from the SAME s/p/dp/dS tiles
    the dKV pass computes, instead of recomputing them in a second kernel.
    Saves 3 of the backward's 7 matmul passes (QK^T, dO·V^T, plus the exp)
    per tile. Grid (B, H, nq): dQ is per-q-block output; dK/dV accumulate
    over the q blocks in VMEM scratch exactly like _fa_dkv_kernel."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)

    _c0 = (((0,), (0,)), ((), ()))
    k = k_ref[0, 0]                                       # (BK, Dp) bf16
    v = v_ref[0, 0]
    q = q_ref[0, 0]                                       # (BQ, Dp)
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, :, 0]                             # (BQ,)
    dvec = d_ref[0, 0, :, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0, :]
    if causal:
        rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(cols <= rows, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])
    p = jnp.where(s > _MASK_THRESHOLD, p, 0.0)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)   # (BQ, BK)
    if dropout_rate > 0.0:
        inv_keep = 1.0 / (1.0 - dropout_rate)
        keep = _keep_mask(seed_ref, _tile_index(bi, hi, qi, 0, nh, nq, 1),
                          bq, bk, dropout_rate)
        p_drop = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dp * inv_keep, 0.0)
    else:
        p_drop = p
    mm_dtype = k.dtype
    dv_t = jax.lax.dot_general(p_drop.astype(mm_dtype), do, _c0,
                               preferred_element_type=jnp.float32)
    ds = (p * (dp - dvec[:, None])).astype(mm_dtype)
    dk_t = jax.lax.dot_general(ds, q, _c0,
                               preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                    * scale).astype(dq_ref.dtype)

    if nq == 1:
        dk_ref[0, 0] = dk_t.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_t.astype(dv_ref.dtype)
        return

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = dk_t
        dv_s[...] = dv_t

    @pl.when(qi > 0)
    def _accum():
        dk_s[...] = dk_s[...] + dk_t
        dv_s[...] = dv_s[...] + dv_t

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_s[...].astype(dv_ref.dtype)


def _fa_dq_kernel(seed_ref, q_ref, do_ref, lse_ref, d_ref, k_ref, v_ref,
                  bias_ref, dq_ref, dq_s, *, bq, bk, causal, scale,
                  dropout_rate, nh, nq, nk):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    kj = pl.program_id(3)

    inv_keep = (1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0)

    def _tile(kj_):
        """dS for one (qi, kj_) tile, in natural (BQ, BK) orientation."""
        q = q_ref[0, 0]                                   # (BQ, Dp) bf16
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, :, 0]                         # (BQ,)
        dvec = d_ref[0, 0, :, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, :]
        if causal:
            rows = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            cols = kj_ * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(cols <= rows, s, _NEG_INF)
        p = jnp.exp(s - lse[:, None])
        p = jnp.where(s > _MASK_THRESHOLD, p, 0.0)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref,
                              _tile_index(bi, hi, qi, kj_, nh, nq, nk),
                              bq, bk, dropout_rate)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        return (p * (dp - dvec[:, None])).astype(q.dtype), k

    if nk == 1:
        # single-pass: no scratch accumulation round-trips
        ds, k = _tile(0)
        dq_ref[0, 0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                        * scale).astype(dq_ref.dtype)
        return

    @pl.when(kj == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)

    needed = (kj * bk <= qi * bq + bq - 1) if causal else (kj >= 0)

    @pl.when(needed)
    def _compute():
        ds, k = _tile(kj)
        dq_s[...] = dq_s[...] + jnp.dot(
            ds, k, preferred_element_type=jnp.float32) * scale

    @pl.when(kj == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_s[...].astype(dq_ref.dtype)


def _flash_backward(res, g, seed, causal, block_q, block_k, dropout_rate,
                    sm_scale):
    qp, kpad, vpad, bias, lse, out_p = res
    b, h, sqp, dp = qp.shape
    skp = kpad.shape[2]
    assert sqp % block_q == 0 and skp % block_k == 0
    sq, dh = g.shape[2], g.shape[3]
    scale = (1.0 / (dh ** 0.5)) if sm_scale is None else sm_scale
    seed2d = seed.reshape(1, 1).astype(jnp.int32)
    nq, nk = sqp // block_q, skp // block_k

    # dO stays in the compute dtype (bf16): the kernels' matmuls want bf16
    # operands for full MXU rate; the D statistic alone is computed in f32.
    do = jnp.pad(g.astype(qp.dtype),
                 ((0, 0), (0, 0), (0, sqp - sq), (0, dp - dh)))
    # D = rowsum(dO ∘ O), lane-broadcast to (…, 128)
    dvec = jnp.sum(do.astype(jnp.float32) * out_p.astype(jnp.float32),
                   axis=-1)                                      # (B,H,Sqp)
    dvec = jnp.broadcast_to(dvec[..., None], (b, h, sqp, 128))

    seed_spec = pl.BlockSpec((1, 1), lambda b_, h_, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
    # q-indexed streams: in the dKV kernel the q-block is the INNER grid dim
    # (index j); in the dQ kernel it is the outer one (index i)
    q_stream = lambda last, inner: pl.BlockSpec(
        (1, 1, block_q, last),
        (lambda b_, h_, i, j: (b_, h_, j, 0)) if inner else
        (lambda b_, h_, i, j: (b_, h_, i, 0)),
        memory_space=pltpu.VMEM)
    k_stream = lambda last, inner: pl.BlockSpec(
        (1, 1, block_k, last),
        (lambda b_, h_, i, j: (b_, h_, j, 0)) if inner else
        (lambda b_, h_, i, j: (b_, h_, i, 0)),
        memory_space=pltpu.VMEM)
    bias_spec = lambda inner: pl.BlockSpec(
        (1, 1, block_k),
        (lambda b_, h_, i, j: (b_, 0, j)) if inner else
        (lambda b_, h_, i, j: (b_, 0, i)),
        memory_space=pltpu.VMEM)

    if nk == 1:
        # fused single-kernel backward: dQ comes out of the same s/p/dp/dS
        # tiles as dK/dV — no second kernel, no recompute
        kv_spec = pl.BlockSpec((1, 1, block_k, dp),
                               lambda b_, h_, i: (b_, h_, 0, 0),
                               memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((1, 1, block_k), lambda b_, h_, i: (b_, 0, 0),
                              memory_space=pltpu.VMEM)
        q_spec = lambda last: pl.BlockSpec(
            (1, 1, block_q, last), lambda b_, h_, i: (b_, h_, i, 0),
            memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, 1), lambda b_, h_, i: (0, 0),
                              memory_space=pltpu.SMEM)
        dk, dv, dq = pl.pallas_call(
            functools.partial(_fa_bwd_fused_kernel, bq=block_q, bk=block_k,
                              causal=causal, scale=scale,
                              dropout_rate=dropout_rate, nh=h, nq=nq),
            grid=(b, h, nq),
            in_specs=[s_spec, kv_spec, kv_spec, b_spec,
                      q_spec(dp), q_spec(dp), q_spec(128), q_spec(128)],
            out_specs=(kv_spec, kv_spec, q_spec(dp)),
            out_shape=(jax.ShapeDtypeStruct((b, h, skp, dp), qp.dtype),
                       jax.ShapeDtypeStruct((b, h, skp, dp), qp.dtype),
                       jax.ShapeDtypeStruct((b, h, sqp, dp), qp.dtype)),
            scratch_shapes=[pltpu.VMEM((block_k, dp), jnp.float32),
                            pltpu.VMEM((block_k, dp), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=10 * b * h * sqp * skp * dp,
                bytes_accessed=(2 * qp.size + kpad.size + vpad.size) * 4,
                transcendentals=b * h * sqp * skp),
        )(seed2d, kpad, vpad, bias, qp, do, lse, dvec)
        return dq[:, :, :sq, :dh], dk[:, :, :, :dh], dv[:, :, :, :dh]

    dk, dv = pl.pallas_call(
        functools.partial(_fa_dkv_kernel, bq=block_q, bk=block_k,
                          causal=causal, scale=scale,
                          dropout_rate=dropout_rate, nh=h, nq=nq, nk=nk),
        grid=(b, h, nk, nq),
        in_specs=[seed_spec,
                  k_stream(dp, False), k_stream(dp, False), bias_spec(False),
                  q_stream(dp, True), q_stream(dp, True),
                  q_stream(128, True), q_stream(128, True)],
        out_specs=(k_stream(dp, False), k_stream(dp, False)),
        out_shape=(jax.ShapeDtypeStruct((b, h, skp, dp), qp.dtype),
                   jax.ShapeDtypeStruct((b, h, skp, dp), qp.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, dp), jnp.float32),
                        pltpu.VMEM((block_k, dp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sqp * skp * dp,
            bytes_accessed=(2 * qp.size + kpad.size + vpad.size) * 4,
            transcendentals=b * h * sqp * skp),
    )(seed2d, kpad, vpad, bias, qp, do, lse, dvec)

    dq = pl.pallas_call(
        functools.partial(_fa_dq_kernel, bq=block_q, bk=block_k,
                          causal=causal, scale=scale,
                          dropout_rate=dropout_rate, nh=h, nq=nq, nk=nk),
        grid=(b, h, nq, nk),
        in_specs=[seed_spec,
                  q_stream(dp, False), q_stream(dp, False),
                  q_stream(128, False), q_stream(128, False),
                  k_stream(dp, True), k_stream(dp, True), bias_spec(True)],
        out_specs=q_stream(dp, False),
        out_shape=jax.ShapeDtypeStruct((b, h, sqp, dp), qp.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * sqp * skp * dp,
            bytes_accessed=(2 * qp.size + kpad.size + vpad.size) * 4,
            transcendentals=b * h * sqp * skp),
    )(seed2d, qp, do, lse, dvec, kpad, vpad, bias)

    return dq[:, :, :sq, :dh], dk[:, :, :, :dh], dv[:, :, :, :dh]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, kp_bias, seed, causal, block_q, block_k, dropout_rate,
           sm_scale):
    return _flash_forward(q, k, v, kp_bias, seed, causal, block_q, block_k,
                          dropout_rate, sm_scale, need_lse=False)


def _flash_fwd(q, k, v, kp_bias, seed, causal, block_q, block_k,
               dropout_rate, sm_scale):
    out, lse, (qp, kpad, vpad, bias) = _flash_forward(
        q, k, v, kp_bias, seed, causal, block_q, block_k, dropout_rate,
        sm_scale, need_lse=True)
    sq, dh = q.shape[2], q.shape[3]
    out_p = jnp.pad(out, ((0, 0), (0, 0), (0, qp.shape[2] - sq),
                          (0, qp.shape[3] - dh)))
    return out, (qp, kpad, vpad, bias, lse, out_p, kp_bias, seed)


def _flash_bwd(causal, block_q, block_k, dropout_rate, sm_scale, res, g):
    qp, kpad, vpad = res[0], res[1], res[2]
    kp_bias, seed = res[6], res[7]
    sk = kp_bias.shape[-1]
    dq, dk, dv = _flash_backward(res[:6], g, seed, causal, block_q, block_k,
                                 dropout_rate, sm_scale)
    return (dq.astype(qp.dtype), dk[:, :, :sk, :].astype(kpad.dtype),
            dv[:, :, :sk, :].astype(vpad.dtype), jnp.zeros_like(kp_bias),
            jnp.zeros_like(seed))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flash attention over split heads (B, H, S, Dh).

    ``key_padding_mask``: (B, Sk) bool, True = attendable.
    ``dropout_rate``/``dropout_rng``: attention-weight dropout applied inside
    the kernel (torch-MHA semantics); the mask is regenerated in the backward
    from the derived scalar seed — nothing S×S is ever stored.
    ``sm_scale``: softmax scale override — REQUIRED when the head dim is
    lane-padded upstream (zero pad lanes leave q·k sums unchanged, but the
    1/sqrt(dh) default would read the padded dh).

    Forward and backward stream K/V through the grid with identical block
    sizes, so the regenerated dropout masks always line up and VMEM use is
    independent of sequence length.
    """
    sk = k.shape[2]
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(sk, 128))
    if key_padding_mask is None:
        kp_bias = jnp.zeros((q.shape[0], sk), dtype=jnp.float32)
    else:
        kp_bias = jnp.where(key_padding_mask, 0.0, _NEG_INF).astype(jnp.float32)
    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = jax.random.randint(dropout_rng, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        rate = float(dropout_rate)
    else:
        seed = jnp.int32(0)
        rate = 0.0
    return _flash(q, k, v, kp_bias, seed, causal, block_q, block_k, rate,
                  None if sm_scale is None else float(sm_scale))
