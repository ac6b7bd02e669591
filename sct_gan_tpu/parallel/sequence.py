"""Sequence (context) parallelism — long-context encoding over a mesh axis.

SURVEY §5.7: the reference hard-caps sequences at L=1024 (`SCT-GAN/
model.py:32`, `dataset.py:106`) and is dense O(L²) with no parallelism of
any kind. This module is the TPU-native scaling hook beyond that cap:

  * the (B, S) token/AST inputs are sharded over a named mesh axis ("sp")
    on their SEQUENCE dimension;
  * the whole encode path (token+AST embedding, 6 encoder layers, AST
    attention, cross attention, feature fusion) runs inside ONE
    `jax.shard_map` — LayerNorm/FFN/MLP/embedding are embarrassingly
    parallel over S and execute purely locally;
  * every attention all-gathers K/V (and the key-padding mask) across the
    axis while Q stays local (`ops.attention.dot_product_attention(...,
    seq_axis=...)`) — the standard all-gather context-parallel schedule.
    The collectives are `lax.all_gather`s whose payload is the (B, H, S,
    dh) K/V shards, laid out to ride the ICI ring;
  * the positional-encoding slice is offset per shard by
    `lax.axis_index` (`SmartContractTransformer._embed`).

Differentiation: `jax.grad` through `sp_encode` turns the K/V all-gathers
into reduce-scatters automatically (shard_map transposes collectives), so
the same path is usable under a training objective; the shipped train step
keeps the dp×mp layout because at the parity L=1024 sequence sharding is
not bandwidth-profitable (SURVEY §5.7 calls it a stretch axis, not parity).

Memory: per device the encode activations are O(S/sp) except inside one
attention where the gathered K/V is O(S) — the peak-HBM term that decides
the max context is therefore 2·B·H·S·dh per layer instead of the dense
path's B·H·S² scores. With the Pallas flash kernel streaming K/V blocks,
S=16k+ fits a v5e chip at d=768.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:                                     # jax >= 0.4.35 exports it top-level
    from jax import shard_map as _shard_map
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def make_sp_mesh(sp: Optional[int] = None, dp: int = 1,
                 devices=None) -> Mesh:
    """A ("dp", "sp") mesh: batch over dp, sequence over sp.

    ``sp=None`` claims all devices not taken by dp. Parameters are
    replicated over both axes by `sp_encode` (the sp win is activation
    memory + attention bandwidth, not parameter storage — combine with the
    mp rules in `mesh.py` on 3D meshes when parameter sharding also
    matters)."""
    devs = list(devices if devices is not None else jax.devices())
    if sp is None:
        sp = len(devs) // dp
    n = dp * sp
    if n > len(devs):
        raise ValueError(f"mesh {dp}x{sp} needs {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(dp, sp)
    return Mesh(grid, axis_names=("dp", "sp"))


def sp_encode(model, params, input_ids, attention_mask, ast_input_ids,
              ast_attention_mask, mesh: Mesh, *, axis: str = "sp",
              max_length: Optional[int] = None):
    """Sequence-parallel `model.encode`: returns the fused memory
    (B, S, d_model), sharded P(dp?, sp, None) on ``mesh``.

    ``model`` is the plain (unsharded) SmartContractTransformer; its
    parameters are S-independent, so the SAME ``params`` work at any
    context length — pass ``max_length`` to extend the PE table beyond the
    model's configured cap (e.g. encode L=8192 with L=1024-trained
    weights; quality beyond the trained length is the caller's problem,
    the mechanics are exact).

    Constraints: S must divide evenly by mesh.shape[axis] (pad the batch —
    the tokenizer pipeline already pads to max_length), and B by the dp
    size when the mesh carries a "dp" axis.
    """
    sp = mesh.shape[axis]
    b, s = input_ids.shape
    if s % sp:
        raise ValueError(f"sequence length {s} not divisible by {axis}={sp}")
    cfg = dataclasses.replace(
        model.config, seq_axis=axis,
        max_length=max(int(max_length or model.config.max_length), s))
    sp_model = type(model)(cfg)

    dp_name = "dp" if "dp" in mesh.shape else None
    row = P(dp_name, axis)

    def local(p, ids, mask, aids, amask):
        return sp_model.apply({"params": p}, ids, mask, aids, amask,
                              deterministic=True, method=sp_model.encode)

    f = _shard_map(local, mesh=mesh,
                   in_specs=(P(), row, row, row, row),
                   out_specs=P(dp_name, axis, None))
    return f(params, input_ids, attention_mask, ast_input_ids,
             ast_attention_mask)


def sp_detect(model, params, batch, mesh: Mesh, *, axis: str = "sp"):
    """Long-context detection forward: sequence-parallel encode, then the
    contract + line heads on the sharded memory under plain GSPMD (their
    mean-pool / segment-mean contractions over S become psums XLA places
    automatically).

    Returns (contract_logits, line_logits) like the analyzer's detect path.
    """
    memory = sp_encode(model, params, batch["input_ids"],
                       batch["attention_mask"], batch["ast_input_ids"],
                       batch["ast_attention_mask"], mesh, axis=axis)

    @jax.jit
    def heads(p, mem, token_to_line):
        c_logits, _ = model.apply({"params": p}, mem, method=model.contract_head)
        l_logits = model.apply({"params": p}, mem, token_to_line,
                               method=model.line_head)
        return c_logits, l_logits

    return heads(params, memory, batch["token_to_line"])
