"""Attention ops: pure-JAX reference path + Pallas flash-attention dispatch.

The reference relies on PyTorch's fused ``nn.MultiheadAttention`` CUDA kernels
(SCT-GAN/model.py:56-77, 98-103, 158-171, 209-222, 241-246). Here the math is
owned explicitly:

  * ``mha_reference`` — pure jnp scaled-dot-product attention with PyTorch-MHA
    semantics (key-padding masks, optional causal mask, attention-weight
    dropout, head-averaged weights). Used for numerics tests and whenever
    attention weights must be materialized (the localization API exposes
    ``contract_attn_weights``, model.py:455-460).
  * ``dot_product_attention`` — dispatcher: Pallas flash-attention kernel on
    TPU (memory-tiled, never materializes (B,H,S,S) in HBM), reference path
    elsewhere or when weights are requested.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite -inf stand-in: keeps fully-masked rows NaN-free


def _build_bias(
    scores_shape: Tuple[int, ...],
    key_padding_mask: Optional[jnp.ndarray],
    causal: bool,
) -> Optional[jnp.ndarray]:
    """Additive attention bias from a key-padding mask and/or causal flag.

    ``key_padding_mask``: (B, Sk) bool, True = attendable (note: inverted
    relative to PyTorch's key_padding_mask, which marks *ignored* keys).
    """
    b, h, sq, sk = scores_shape
    bias = None
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], 0.0, _NEG_INF)
    if causal:
        causal_bias = jnp.where(
            jnp.tril(jnp.ones((sq, sk), dtype=bool)), 0.0, _NEG_INF)
        bias = causal_bias if bias is None else bias + causal_bias
    return bias


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
    sm_scale: Optional[float] = None,
):
    """Scaled-dot-product attention over already-split heads.

    Args:
        q, k, v: (B, H, Sq|Sk, Dh).
        key_padding_mask: (B, Sk) bool, True = attendable.
        causal: apply a lower-triangular mask (decoder self-attention).
        dropout_rate/deterministic/dropout_rng: attention-weight dropout, as
            PyTorch MHA applies it (after softmax).
        return_weights: also return head-averaged weights (B, Sq, Sk), the
            PyTorch ``average_attn_weights=True`` convention.
        sm_scale: softmax scale override (1/sqrt(dh) by default) — required
            when the head dim is zero-padded to TPU lane width upstream.
    Returns:
        out (B, H, Sq, Dh) [, weights (B, Sq, Sk)].
    """
    dh = q.shape[-1]
    scale = (1.0 / float(dh) ** 0.5) if sm_scale is None else float(sm_scale)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale, dtype=scores.dtype)
    bias = _build_bias(scores.shape, key_padding_mask, causal)
    if bias is not None:
        scores = scores + bias
    weights = jax.nn.softmax(scores, axis=-1)
    if bias is not None:
        # Fully-masked query rows produce zeros (not a uniform distribution):
        # consistent with the flash kernel and NaN-free, unlike torch.
        all_masked = jnp.max(scores, axis=-1, keepdims=True) <= -1e29
        weights = jnp.where(all_masked, 0.0, weights)
    if dropout_rate > 0.0 and not deterministic:
        # hash-mask dropout (ops/dropout.py): a (B, H, Sq, Sk) threefry
        # bernoulli costs ~20 rounds/element and dominated the dense path —
        # the murmur-finalizer mask fuses into the softmax/PV elementwise
        # group for a few VPU ops instead
        from .dropout import _hash_keep
        seed = jax.random.randint(dropout_rng, (), 0,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        keep = _hash_keep(weights.shape, seed, float(dropout_rate))
        weights_dropped = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    else:
        weights_dropped = weights
    out = jnp.einsum("bhqk,bhkd->bhqd", weights_dropped.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if return_weights:
        return out, weights.mean(axis=1)
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_padding_mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
    use_flash: bool = True,
    sm_scale: Optional[float] = None,
    seq_axis: Optional[str] = None,
):
    """Dispatch to the Pallas flash kernel when possible, else the reference.

    Flash is used when: on TPU and the caller does not need materialized
    weights. Attention-weight dropout (which the reference applies on the
    softmax weights, dropout 0.3 across 13 modules) runs INSIDE the kernel
    with a tile-deterministic PRNG — the training path stays flash.

    ``seq_axis``: name of a shard_map mesh axis the SEQUENCE dimension is
    sharded over (context parallelism, ModelConfig.seq_axis). K/V (and the
    key-padding mask) are all-gathered across it — one tiled all-gather per
    attention, riding the ICI ring — while Q stays local, so each device
    computes attention for its own S/sp query rows against the full keys.
    Non-causal only (the encode path): the causal path would need the
    global query offset threaded into the kernel's block mask.
    """
    if seq_axis is not None:
        if causal:
            raise NotImplementedError(
                "seq_axis context parallelism covers the non-causal encode "
                "path; causal decoder self-attention is not sequence-sharded")
        k = jax.lax.all_gather(k, seq_axis, axis=2, tiled=True)
        v = jax.lax.all_gather(v, seq_axis, axis=2, tiled=True)
        if key_padding_mask is not None:
            key_padding_mask = jax.lax.all_gather(
                key_padding_mask, seq_axis, axis=1, tiled=True)
    wants_dropout = dropout_rate > 0.0 and not deterministic
    on_tpu = jax.default_backend() == "tpu"
    if use_flash and on_tpu and not return_weights:
        from .flash_attention import flash_attention
        return flash_attention(
            q, k, v, key_padding_mask=key_padding_mask, causal=causal,
            dropout_rate=dropout_rate if wants_dropout else 0.0,
            dropout_rng=dropout_rng if wants_dropout else None,
            sm_scale=sm_scale)
    return mha_reference(
        q, k, v, key_padding_mask=key_padding_mask, causal=causal,
        dropout_rate=dropout_rate, deterministic=deterministic,
        dropout_rng=dropout_rng, return_weights=return_weights,
        sm_scale=sm_scale)
