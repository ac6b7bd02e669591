"""Device mesh + sharding rules — the framework's distributed backend.

The reference has **no** distributed support of any kind (single
``cuda:{gpu_id}`` device, SCT-GAN/train.py:495; no torch.distributed/NCCL/MPI
anywhere). This module is the TPU-native replacement: a ``jax.sharding.Mesh``
over ICI with two logical axes,

    "dp" — data parallel: the batch dimension is sharded; XLA inserts a
           gradient ``psum`` across dp during the jitted train step.
    "mp" — model (tensor) parallel: the big matmuls (token embeddings, FFN,
           LM output projection) are sharded over mp; XLA inserts
           all-gather / reduce-scatter collectives on the ICI ring.

Since the reference's effective batch is 8 (SCT-GAN/dataset.py:279), pure DP
over a v5e-8 slice reproduces its semantics exactly (per-chip batch 1). The
mp axis is the scaling hook beyond parity.

Everything is plain ``jax.jit`` + ``NamedSharding`` (GSPMD): we annotate
placements and let XLA choose the collective schedule, rather than
hand-writing NCCL-style point-to-point like a CUDA port would.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("dp", "mp") mesh over the available devices.

    ``dp=None`` uses all devices not claimed by mp. Works identically for a
    single real TPU chip (1×1 mesh), a v5e-8 slice, or the virtual
    ``xla_force_host_platform_device_count`` CPU mesh used in tests and the
    driver's multi-chip dry run.
    """
    devs = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devs) // mp
    n = dp * mp
    if n > len(devs):
        raise ValueError(f"mesh {dp}x{mp} needs {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(dp, mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every array in the batch with its batch axis sharded over dp.

    Non-array fields (source strings) are dropped — they never reach the
    device. The host pipeline guarantees batch % dp == 0 shapes.
    """
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, sh)
    return out


def prefetch_to_device(batch_iter, mesh: Mesh, size: int = 2,
                       prepare=None, on_oom=None):
    """Double-buffered host→device pipeline.

    Keeps up to ``size`` batches in flight: batch i+1 is transformed on host
    and its H2D transfer dispatched while the device executes the step on
    batch i — the TPU-native replacement for the reference's synchronous
    per-batch `.to(device)` copies (SCT-GAN/train.py:894-895).

    ``prepare``: optional host-side transform (e.g. augmentation + padding)
    applied before placement.
    ``on_oom``: callback invoked if the H2D placement hits device
    RESOURCE_EXHAUSTED (e.g. drop queued checkpoint snapshots); the
    placement is retried once, and the batch is skipped (logged) if it
    still fails — an epoch must survive transient HBM pressure.
    """
    import collections
    buf = collections.deque()

    def place(batch):
        try:
            return shard_batch(batch, mesh)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or on_oom is None:
                raise
            on_oom()
            import gc
            gc.collect()
            try:
                return shard_batch(batch, mesh)
            except Exception as e2:   # still exhausted: drop THIS batch,
                if "RESOURCE_EXHAUSTED" not in str(e2):   # keep the epoch
                    raise
                import sys
                print("prefetch: dropping one batch, HBM still exhausted "
                      "after freeing snapshots", file=sys.stderr, flush=True)
                return None

    for batch in batch_iter:
        if prepare is not None:
            batch = prepare(batch)
        placed = place(batch)   # async H2D dispatch
        if placed is None:
            continue
        buf.append(placed)
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


# -- model-parallel partition rules -----------------------------------------

# Path-substring → PartitionSpec for the parameters worth sharding over mp.
# Kernels are (in_features, out_features) in flax; embeddings are (vocab, d).
# Only the large, MXU-bound matmuls are sharded; everything else (LayerNorms,
# small heads) is replicated — collective cost would exceed the matmul win.
_MP_RULES = (
    # token + AST embedding tables: shard the vocab axis
    ("embedding/embedding", P("mp", None)),
    ("ast_embedding/embedding", P("mp", None)),
    # FFN: linear1 shards the hidden axis (column parallel), linear2 the
    # same axis on its input side (row parallel) → one psum per FFN.
    ("ffn/linear1/kernel", P(None, "mp")),
    ("ffn/linear1/bias", P("mp")),
    ("ffn/linear2/kernel", P("mp", None)),
    # Attention, Megatron-style: q/k/v column parallel over the head axis
    # (heads are contiguous in the d_model layout, so sharding the output
    # feature axis by mp keeps whole heads per shard when nhead % mp == 0),
    # out_proj row parallel → one psum per attention module.
    ("q_proj/kernel", P(None, "mp")),
    ("q_proj/bias", P("mp")),
    ("k_proj/kernel", P(None, "mp")),
    ("k_proj/bias", P("mp")),
    ("v_proj/kernel", P(None, "mp")),
    ("v_proj/bias", P("mp")),
    ("out_proj/kernel", P("mp", None)),
    # LM head over the 50k vocab: column parallel.
    ("output_layer/kernel", P(None, "mp")),
)


def param_partition_spec(path: str, value, mesh: Optional[Mesh] = None) -> P:
    """PartitionSpec for one parameter, by flattened path substring.

    A rule only applies when every named axis divides the corresponding
    parameter dimension (e.g. the 50265-token vocab axis is NOT divisible by
    mp=2 — such parameters fall back to replication instead of crashing)."""
    for substr, spec in _MP_RULES:
        if substr in path:
            if value.ndim != len(spec):
                continue
            if mesh is not None:
                ok = all(axis is None
                         or value.shape[i] % mesh.shape.get(axis, 1) == 0
                         for i, axis in enumerate(spec))
                if not ok:
                    continue
            return spec
    return P()


def _flat_path(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh according to the mp rules.

    With mp == 1 every spec degenerates to replication, so this is also the
    correct single-chip / pure-DP placement.
    """
    def place(key_path, value):
        spec = param_partition_spec(_flat_path(key_path), value, mesh)
        if mesh.shape.get("mp", 1) == 1:
            spec = P()
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
