"""Embedding lookup with a sort-based backward (no colliding scatter-add).

The reference relies on torch's fused embedding kernels implicitly
(SCT-GAN/model.py:44-53 `nn.Embedding`). In JAX the gather forward is fine,
but the default backward lowers to a scatter-add with DUPLICATE, UNSORTED
indices over the (vocab, d) table — on TPU, XLA serializes colliding
updates, and the round-3 in-graph attribution measured the embedding tables'
backward at ~3.2 ms/step (STATUS r3) for 24k token slots into a 50k-row
table.

``embedding_lookup`` keeps the same forward but rewrites the backward as:

  1. sort the flattened token ids (one 24k-element sort),
  2. cumulative-sum the gathered output gradients in sorted order,
  3. difference the cumsum at run boundaries => one summed row per UNIQUE id,
  4. scatter-add those rows with ``indices_are_sorted=True`` (the compacted
     id list is ascending; pad slots route to a dummy row past the table
     with zero contributions).

Numerically this changes only summation ORDER within a token id (float
addition reassociation); tests pin near-equality against the native backward
(tests/test_ops.py::test_embedding_lookup_*).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` — (V, d) table, integer ``ids`` of any shape."""
    return jnp.take(table, ids, axis=0)


def _fwd(table, ids):
    # the table rides in the residuals only for its STATIC shape/dtype (it
    # is a live parameter either way; nothing is copied)
    return jnp.take(table, ids, axis=0), (ids, table)


def _bwd(res, g):
    ids, table = res
    vocab, dtype = table.shape[0], table.dtype
    d = g.shape[-1]
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    flat_g = g.reshape(-1, d).astype(jnp.float32)
    n = flat_ids.shape[0]

    order = jnp.argsort(flat_ids)
    sid = flat_ids[order]
    sg = flat_g[order]

    csum = jnp.cumsum(sg, axis=0)
    is_last = jnp.concatenate([sid[1:] != sid[:-1], jnp.ones((1,), bool)])

    # ascending positions of run ends; slots past the last run are padded
    # with n-1 (compacted below into zero-contribution dummy rows)
    end_idx = jnp.nonzero(is_last, size=n, fill_value=n - 1)[0]
    end_csum = csum[end_idx]                                  # (n, d)
    prev_end_csum = jnp.concatenate(
        [jnp.zeros((1, d), jnp.float32), end_csum[:-1]])
    sums = end_csum - prev_end_csum       # per-run sum; exactly 0 on pads
    run_count = jnp.cumsum(is_last)[-1]
    valid = jnp.arange(n) < run_count
    out_ids = jnp.where(valid, sid[end_idx], vocab)  # ascending incl. pads

    dt = jnp.zeros((vocab + 1, d), jnp.float32)
    dt = dt.at[out_ids].add(sums, indices_are_sorted=True)
    return dt[:vocab].astype(dtype), None


embedding_lookup.defvjp(_fwd, _bwd)
