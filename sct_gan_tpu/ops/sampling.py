"""Sampling ops: temperature / top-k / top-p filtering and categorical draws.

Replaces the reference's host-side torch sampling inside the generation loop
(SCT-GAN/model.py:899-918: topk → scatter -inf; sort → cumsum softmax → shift
→ mask; multinomial) with jit-friendly jnp equivalents that live inside
``lax.while_loop`` decode bodies, with explicit PRNG keys threaded through
decode state.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the top-k logits per row, set the rest to -inf.

    Parity with model.py:900-904 (torch.topk + scatter of -inf mask).
    """
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= kth, logits, _NEG_INF)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: remove tokens beyond cumulative prob p.

    Parity with model.py:907-914: sort descending, cumsum of softmax, mark
    cumulative > p, shift the removal mask right by one (the first token is
    always kept), scatter back to vocab order, mask with -inf.
    """
    if p >= 1.0:
        return logits
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum_probs > p
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]],
        axis=-1)
    # Scatter back: invert the sorting permutation.
    inv_idx = jnp.argsort(sorted_idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv_idx, axis=-1)
    return jnp.where(remove, _NEG_INF, logits)


def _dense_top_k_top_p(logits: jnp.ndarray, top_k: int,
                       top_p: float) -> jnp.ndarray:
    """Reference-shaped composition (full-vocab argsorts) — kept as the
    parity oracle for the fused path (tests/test_ops.py)."""
    return top_p_filter(top_k_filter(logits, top_k), top_p)


def top_k_top_p_filter(logits: jnp.ndarray, top_k: int = 50,
                       top_p: float = 0.95) -> jnp.ndarray:
    """Composed filter in the reference's order: top-k first, then top-p.

    Fused: after top-k only k logits survive, so nucleus filtering only ever
    inspects those k — one ``lax.top_k`` (already descending) + a length-k
    cumsum replaces the dense path's THREE full-vocab sorts per decode step
    (sort, inverse-permutation argsort, and top-k's own). Exact-equivalent:
    the dense path's softmax gives the -1e30-masked tail zero probability,
    so its cumulative sums over the first k sorted entries are identical.
    """
    v = logits.shape[-1]
    if top_k <= 0 or top_k >= v:
        return top_p_filter(logits, top_p)
    vals, idx = jax.lax.top_k(logits, top_k)
    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
        remove = cum > top_p
        # shift right: the highest-prob token is always kept (model.py:911)
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        vals = jnp.where(remove, _NEG_INF, vals)
    flat_idx = idx.reshape(-1, top_k)
    flat_vals = vals.reshape(-1, top_k)
    rows = jnp.arange(flat_idx.shape[0])[:, None]
    out = jnp.full((flat_idx.shape[0], v), _NEG_INF, logits.dtype)
    out = out.at[rows, flat_idx].set(flat_vals)
    return out.reshape(logits.shape)


def sample_top_k_top_p(rng: jax.Array, logits: jnp.ndarray,
                       top_k: int = 50, top_p: float = 0.95) -> jnp.ndarray:
    """Draw one token per row from the top-k/top-p-filtered distribution,
    WITHOUT materializing filtered full-vocab logits.

    Distribution-exact fusion of ``categorical(top_k_top_p_filter(logits))``:
    every token outside the top-k (or nucleus-removed) has probability zero
    there, so sampling reduces to a categorical over the k kept logits
    followed by an index gather. Replaces the decode loop's (B, V) -inf
    fill + 50-value scatter + full-vocab gumbel/argmax (V=50k) with
    k=50-wide ops — only the single ``lax.top_k`` still touches the vocab
    axis. Returns (B,) int32 token ids.
    """
    v = logits.shape[-1]
    if top_k <= 0 or top_k >= v:
        return jax.random.categorical(
            rng, top_p_filter(logits, top_p), axis=-1).astype(jnp.int32)
    vals, idx = jax.lax.top_k(logits, top_k)
    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        vals = jnp.where(remove, _NEG_INF, vals)
    choice = jax.random.categorical(rng, vals, axis=-1)      # (B,) in [0, k)
    return jnp.take_along_axis(idx, choice[..., None],
                               axis=-1)[..., 0].astype(jnp.int32)


def sample_categorical(rng: jax.Array, logits: jnp.ndarray,
                       temperature: float = 1.0,
                       top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    """Temperature-scaled filtered categorical sample (one token per row).

    Mirrors the reference decode step (model.py:893-918): logits / T →
    syntax/filter masks → softmax → multinomial.
    """
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_k_top_p_filter(logits, top_k, top_p)
    return jax.random.categorical(rng, logits, axis=-1)


def penalize_repetition(logits: jnp.ndarray, prev_token: jnp.ndarray,
                        penalty: float = 1.5) -> jnp.ndarray:
    """Divide the previous token's positive logit by ``penalty`` (multiply
    if negative) — the standard CTRL-style repetition penalty. The
    reference's diagnostic sampler (inference.py:1108-1195) handles
    repetition by noise injection + hard stop instead (see
    infer.generate.make_generate_fn(track_repetition=True)); this op is the
    extra opt-in knob behind its ``repetition_penalty`` argument."""
    vocab = logits.shape[-1]
    onehot = jax.nn.one_hot(prev_token, vocab, dtype=bool)
    return jnp.where(onehot, jnp.where(logits > 0, logits / penalty,
                                       logits * penalty), logits)
