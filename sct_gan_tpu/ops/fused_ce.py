"""Fused LM-head + mean cross-entropy with a scatter-free backward.

The teacher-forced generation loss (SCT-GAN/train.py:314-332: mean
F.cross_entropy over 50,265-vocab logits) is the single most expensive slab
of the train step. Differentiating the naive form

    logits = hidden @ W + b;  ce = (logsumexp(logits) - logits[target]).mean()

costs 43.4 ms/step fwd+bwd on-chip at (8, 1023, 768)x(768, 50265)
(tools/time_lmce.py): XLA materializes the f32 softmax (1.6 GB) and — the
real killer — expresses grad(take_along_axis) as a scatter-add into a fresh
(B, S, V) buffer. The matmul floor of the same computation is ~6.6 ms.

This custom-VJP computes the identical value with a hand-written backward:

    dlogits = softmax - onehot        (one fused elementwise pass, bf16)
    dhidden = (dlogits @ W^T) * g/N
    dW      = (hidden^T @ dlogits) * g/N
    db      = sum(dlogits) * g/N

- no scatter: the onehot subtraction is an iota==target broadcast compare
  fused into the exp pass;
- the f32 softmax is never materialized: exp/sub/cast fuse into the bf16
  dlogits production;
- the g/N scaling is applied to the f32 matmul outputs (not to dlogits), so
  the bf16 dlogits stays O(1)-conditioned;
- forward numerics are bit-identical to the shipped path
  (losses/syntax.py::cross_entropy_loss over an nn.Dense in compute dtype):
  bf16 logits, f32 logsumexp, f32 picked.

Works under GSPMD: all ops are jnp; with W sharded (None, "mp")
(parallel/mesh.py:151) the vocab dimension of dlogits shards and XLA inserts
the psum for dhidden automatically.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _logits(hidden: jnp.ndarray, kernel: jnp.ndarray,
            bias: jnp.ndarray) -> jnp.ndarray:
    """nn.Dense numerics in the hidden's compute dtype (flax promote_dtype:
    params cast down to bf16 before the matmul/add)."""
    dt = hidden.dtype
    return hidden @ kernel.astype(dt) + bias.astype(dt)


def _mask_pad(logits, valid_vocab):
    """-inf the vocab-pad columns (ModelConfig.padded_vocab_size > vocab_size)
    so they contribute exp(-inf)=0 to the softmax — the padded model's CE is
    bit-equivalent to the unpadded one."""
    if valid_vocab is None or valid_vocab >= logits.shape[-1]:
        return logits
    keep = jnp.arange(logits.shape[-1]) < valid_vocab
    return jnp.where(keep, logits, jnp.asarray(-jnp.inf, logits.dtype))


def _ce_value(logits, targets, row_weights):
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logits, targets[..., None],
                                 axis=-1)[..., 0].astype(jnp.float32)
    nll = lse - picked                                     # (B, S)
    if row_weights is None:
        return nll.mean(), lse, jnp.float32(targets.size)
    w = row_weights.astype(jnp.float32)
    n_eff = jnp.maximum(w.sum() * nll.shape[1], 1.0)
    return (nll * w[:, None]).sum() / n_eff, lse, n_eff


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_linear_cross_entropy(hidden: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, targets: jnp.ndarray,
                               row_weights=None,
                               valid_vocab=None) -> jnp.ndarray:
    """Mean token CE of ``softmax(hidden @ kernel + bias)`` vs ``targets``.

    hidden: (B, S, D) compute-dtype activations (post output_norm/dropout,
            already shifted to align with ``targets``)
    kernel: (D, V) LM-head weight (param dtype)
    bias:   (V,) LM-head bias
    targets: (B, S) int token ids
    row_weights: optional (B,) 0/1 weights — static-padding rows
            (trainer._pad_to_dp) carry 0 so the mean matches an unpadded
            batch (losses/syntax.py::cross_entropy_loss semantics)
    valid_vocab: static int or None — the TRUE vocab size when the kernel's
            vocab axis is padded (ModelConfig.padded_vocab_size); pad
            columns are masked out of the softmax so value/grads equal the
            unpadded computation (pad-column grads are exactly zero)

    Returns the scalar mean over ALL (weighted) positions — the reference
    does not ignore padding (SCT-GAN/train.py:324).
    """
    ce, _, _ = _ce_value(_mask_pad(_logits(hidden, kernel, bias),
                                   valid_vocab), targets, row_weights)
    return ce


def _fwd(hidden, kernel, bias, targets, row_weights, valid_vocab):
    ce, lse, _ = _ce_value(_mask_pad(_logits(hidden, kernel, bias),
                                     valid_vocab), targets, row_weights)
    return ce, (hidden, kernel, bias, targets, lse, row_weights)


def _bwd(valid_vocab, res, g):
    hidden, kernel, bias, targets, lse, row_weights = res
    dt = hidden.dtype
    v = kernel.shape[-1]
    # recompute the logits (one matmul — cheaper than 824 MB round-trips)
    logits = _mask_pad(_logits(hidden, kernel, bias), valid_vocab)
    p = jnp.exp(logits.astype(jnp.float32) - lse[..., None])
    onehot = (targets[..., None] ==
              jnp.arange(v, dtype=targets.dtype)).astype(jnp.float32)
    # O(1)-scaled bf16 dlogits; the tiny g/N factor multiplies the f32
    # matmul outputs instead, preserving mantissa
    dlogits = (p - onehot).astype(dt)
    if row_weights is None:
        n_eff = jnp.float32(targets.size)
    else:
        w = row_weights.astype(jnp.float32)
        n_eff = jnp.maximum(w.sum() * targets.shape[1], 1.0)
        dlogits = dlogits * w[:, None, None].astype(dt)
    scale = g / n_eff
    dhidden = (jnp.matmul(dlogits, kernel.astype(dt).T,
                          preferred_element_type=jnp.float32)
               * scale).astype(dt)
    dkernel = (jnp.einsum("bsd,bsv->dv", hidden, dlogits,
                          preferred_element_type=jnp.float32)
               * scale).astype(kernel.dtype)
    dbias = (dlogits.astype(jnp.float32).sum(axis=(0, 1))
             * scale).astype(bias.dtype)
    return dhidden, dkernel, dbias, None, None


fused_linear_cross_entropy.defvjp(_fwd, _bwd)
