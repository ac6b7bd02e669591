"""Vectorized per-line token aggregation.

Replaces the reference's dominant hot loop — a Python triple loop
(batch × line × mask) with per-line GPU syncs inside every forward
(SCT-GAN/model.py:494-611) — with a single MXU matmul:

    line_sum[b, l] = Σ_s [token_to_line[b, s] == l] · memory[b, s]

expressed as a one-hot (B, S, L) × (B, S, D) contraction. Fully static shapes
(L = max_lines slots), so it jits once; per-sample line counts come out of the
same one-hot for free.

Parity notes vs the reference loop:
  * The reference does NOT mask padding tokens — pad slots carry
    token_to_line == 0 and therefore pollute line 0 (CLS also maps to 0).
    Reproduced exactly (pass token_mask=None).
  * Empty-line / out-of-range handling is done by the caller from the returned
    counts (model.py:571-574 uses a learnable empty-line embedding).

A Pallas kernel exploiting the near-sortedness of token_to_line (monotone over
real tokens) can cut this from O(S·L·D) to O(S·D); the one-hot contraction is
already MXU-saturating at L=S=1024.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def line_segment_mean(
    memory: jnp.ndarray,
    token_to_line: jnp.ndarray,
    num_lines: int,
    token_mask: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean of token features per line.

    Args:
        memory: (B, S, D) encoder outputs.
        token_to_line: (B, S) int line index per token.
        num_lines: static number of line slots L.
        token_mask: optional (B, S) bool; reference parity = None (unmasked).
        compute_dtype: dtype of the one-hot contraction (bf16 on TPU halves
            HBM traffic; means are normalized in fp32 either way).

    Returns:
        means: (B, L, D) per-line token means (0 where count == 0).
        counts: (B, L) tokens per line.
    """
    line_ids = jnp.arange(num_lines, dtype=token_to_line.dtype)
    onehot = token_to_line[:, :, None] == line_ids[None, None, :]  # (B,S,L)
    if token_mask is not None:
        onehot = onehot & token_mask[:, :, None]
    oh = onehot.astype(compute_dtype)
    sums = jnp.einsum("bsl,bsd->bld", oh, memory.astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=1)  # (B, L) int
    means = sums / jnp.maximum(counts, 1)[:, :, None].astype(jnp.float32)
    return means.astype(memory.dtype), counts
