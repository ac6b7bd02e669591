"""Orbax checkpointing with the reference's metadata contract.

The reference saves torch dict checkpoints carrying epoch, model/optimizer/
scheduler state, val loss, full training history, and the aug/GAN flags —
``best_model{_augmented}{_gan}_epoch_N.pt`` on improvement and
``latest_model{_augmented}{_gan}.pt`` every epoch (SCT-GAN/train.py:1656-1721).

Here the array state (params + optimizer) goes through orbax (async-safe,
TPU-friendly, resharding-aware on restore) and the python metadata
(history, scheduler state, adaptive-control scalars) goes to a JSON sidecar
in the same directory, so a checkpoint is fully self-describing.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# jitted pack fns cached by (treedef, shapes, dtypes) so repeated saves of
# the same state structure reuse one compiled executable
_PACK_CACHE: Dict = {}


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def checkpoint_suffix(use_augmentation: bool, use_gan: bool) -> str:
    suffix = ""
    if use_augmentation:
        suffix += "_augmented"
    if use_gan:
        suffix += "_gan"
    return suffix


def _fetch_chunked(buf) -> np.ndarray:
    """Fetch one device buffer in bounded chunks rather than one giant RPC:
    on a single-lane tunnel a multi-GB transfer would block every
    concurrently-dispatched program (training steps) for its whole duration.
    ~32 MB per RPC lets other traffic interleave. Each chunk is cut with ONE
    jitted dynamic_slice (traced offset) — python slicing would bake every
    offset into a fresh remote compilation."""
    chunk = max(1, (32 << 20) // max(buf.dtype.itemsize, 1))
    if buf.size <= chunk:
        return np.asarray(jax.device_get(buf))
    sl_key = ("slicer", buf.shape, str(buf.dtype), chunk)
    slicer = _PACK_CACHE.get(sl_key)
    if slicer is None:
        slicer = jax.jit(lambda b, o, _c=chunk: jax.lax.dynamic_slice(
            b, (o,), (_c,)))
        _PACK_CACHE[sl_key] = slicer
    host = np.empty((buf.size,), buf.dtype)
    for off in range(0, buf.size, chunk):
        start = min(off, buf.size - chunk)   # dynamic_slice clamp
        part = np.asarray(jax.device_get(slicer(buf, start)))
        host[start:start + chunk] = part
    return host


# cap on the transient device-side copy made while packing: leaves are packed
# and fetched in ≤_GROUP_BYTES groups so the extra HBM held at any instant is
# bounded even for multi-GB train states (on top of AsyncSaver's snapshots).
_GROUP_BYTES = 256 << 20


def fetch_tree(state_tree: Any) -> Any:
    """Device→host fetch that packs leaves into a few large buffers.

    A plain ``jax.device_get`` walks the tree leaf by leaf — on a
    remote-tunnel runtime each leaf pays a full RPC round trip, so a
    full-size train state (~1200 leaves) takes many minutes regardless of
    bandwidth (``copy_to_host_async`` is a silent no-op there). Instead:
    concatenate raveled same-dtype leaves into large device arrays (one
    fused XLA program per ≤256 MB group, fetched before the next group is
    packed so the transient device-side copy stays bounded), fetch each in
    32 MB chunks, and split/reshape on host. Turns ~1200 RPCs into ~dozens."""
    leaves, treedef = jax.tree_util.tree_flatten(state_tree)
    idx_by_dtype: Dict = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.size > 0:
            idx_by_dtype.setdefault(jnp.dtype(leaf.dtype), []).append(i)

    # split each dtype's leaf list into bounded-byte groups
    groups = []   # (dtype, tuple(leaf indices))
    for dt, idxs in idx_by_dtype.items():
        cur, cur_bytes = [], 0
        for i in idxs:
            sz = leaves[i].size * dt.itemsize
            if cur and cur_bytes + sz > _GROUP_BYTES:
                groups.append((dt, tuple(cur)))
                cur, cur_bytes = [], 0
            cur.append(i)
            cur_bytes += sz
        if cur:
            groups.append((dt, tuple(cur)))

    out = list(leaves)
    try:
        for dt, idxs in groups:
            pk_key = ("pack", tuple((leaves[i].shape, str(dt)) for i in idxs))
            pack = _PACK_CACHE.get(pk_key)
            if pack is None:
                pack = jax.jit(
                    lambda ls: jnp.concatenate([l.ravel() for l in ls]))
                _PACK_CACHE[pk_key] = pack
            # device_get below blocks until this group is on host, so at most
            # one packed group buffer is live on device at a time
            flat = _fetch_chunked(pack([leaves[i] for i in idxs]))
            off = 0
            for i in idxs:
                n = leaves[i].size
                out[i] = np.asarray(flat[off:off + n]).reshape(leaves[i].shape)
                off += n
    except Exception as e:
        import logging
        logging.getLogger(__name__).warning(
            "fetch_tree packed fetch failed (%s: %s); falling back to the "
            "slow leaf-by-leaf device_get", type(e).__name__, e)
        return jax.device_get(state_tree)   # fallback: plain walk

    # non-array leaves (python scalars, rng keys already on host) as-is
    out = [jax.device_get(x) if isinstance(x, jax.Array) and x.size == 0
           else x for x in out]
    return jax.tree_util.tree_unflatten(treedef, out)


def save_checkpoint(checkpoint_dir: str, name: str, state_tree: Any,
                    metadata: Dict) -> str:
    """Save arrays via orbax + metadata JSON. Returns the checkpoint path."""
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    ckptr = _checkpointer()
    ckptr.save(path, fetch_tree(state_tree), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump(metadata, f, indent=2, default=float)
    return path


class AsyncSaver:
    """Background checkpoint writer.

    D2H on a remote-tunnel runtime can run at ~1-2 MB/s (a full train state
    takes 20+ minutes), so blocking the epoch loop on saves would dominate
    wall-clock. ``submit`` snapshots the state DEVICE-side (jnp.copy — HBM
    to HBM, microseconds, and immune to later donation of the live state)
    and hands the fetch+write to a daemon thread; ``wait`` joins the queue —
    call it before evaluating the written checkpoints.

    Saves are queued in one slot per category ("best" / "latest"): a newer
    submit of the same category replaces the not-yet-started older one (its
    device snapshot is freed), so a long save never starves the other
    category and memory stays bounded at ≤2 extra state snapshots.

    One persistent worker thread drains the queue, woken by a Condition on
    every submit — a spawn-per-drain design has a lost-wakeup race where the
    dying thread decides to exit just as submit enqueues and sees it still
    alive. Metadata is deep-copied at submit time: the training thread keeps
    mutating training_history/lrs/scheduler state, and the persisted meta
    must match the snapshotted weights' epoch."""

    def __init__(self, log=None):
        import threading
        self._cond = threading.Condition()
        self._thread: Optional[threading.Thread] = None
        self._pending: Dict = {}
        self._inflight = False
        self._log = log or (lambda *a, **k: None)

    def busy(self) -> bool:
        with self._cond:
            return self._inflight or bool(self._pending)

    def submit(self, checkpoint_dir: str, name: str, state_tree: Any,
               metadata: Dict, on_saved=None, on_dropped=None) -> bool:
        """``on_saved`` fires (on the worker thread) after the checkpoint is
        durably written; ``on_dropped`` fires if the queued snapshot is
        discarded by ``drop_pending`` before starting. A newer submit of the
        same category replacing a queued one fires neither — the newer entry
        supersedes it."""
        import copy
        import threading
        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            state_tree)
        meta = copy.deepcopy(metadata)
        category = "best" if name.startswith("best") else "latest"
        with self._cond:
            if category in self._pending:
                self._log(f"checkpoint {name}: replaces queued "
                          f"{self._pending[category][1]}")
            self._pending[category] = (checkpoint_dir, name, snap, meta,
                                       on_saved, on_dropped)
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._worker, daemon=True, name="ckpt-saver")
                self._thread.start()
            self._cond.notify_all()
        return True

    def _worker(self) -> None:
        while True:
            with self._cond:
                while not self._pending:
                    self._cond.wait()
                # best first: it is the checkpoint evaluation depends on
                cat = "best" if "best" in self._pending else "latest"
                (ckpt_dir, name, snap, meta,
                 on_saved, _on_dropped) = self._pending.pop(cat)
                self._inflight = True
            try:
                save_checkpoint(ckpt_dir, name, snap, meta)
                self._log(f"checkpoint {name}: saved")
                if on_saved is not None:
                    try:
                        on_saved()
                    except Exception as e:
                        self._log(f"checkpoint {name}: on_saved raised: {e}")
            except Exception as e:   # never kill training over a save
                self._log(f"checkpoint {name}: save FAILED: {e}")
            finally:
                with self._cond:
                    self._inflight = False
                    self._cond.notify_all()

    def drop_pending(self) -> int:
        """Free all queued (not-yet-started) device snapshots; returns the
        count dropped. Emergency valve for HBM pressure: each queued snapshot
        pins a full state copy while the tunnel D2H drains at ~1-2 MB/s."""
        with self._cond:
            n = len(self._pending)
            dropped = list(self._pending.values())
            if n:
                names = [v[1] for v in dropped]
                self._pending.clear()
                self._log(f"dropped {n} queued checkpoint snapshot(s) "
                          f"to free HBM: {names}")
        # outside the lock: a dropped "best" must roll the caller's
        # best-val bookkeeping back to the last best actually persisted,
        # or the best on disk silently stays a stale, worse epoch
        for entry in dropped:
            on_dropped = entry[5]
            if on_dropped is not None:
                try:
                    on_dropped()
                except Exception as e:
                    self._log(f"checkpoint {entry[1]}: on_dropped raised: {e}")
        return n

    def wait(self) -> None:
        with self._cond:
            while self._pending or self._inflight:
                if self._thread is None or not self._thread.is_alive():
                    # worker died unexpectedly: restart it so the queue drains
                    import threading
                    self._thread = threading.Thread(
                        target=self._worker, daemon=True, name="ckpt-saver")
                    self._thread.start()
                self._cond.wait(timeout=1.0)


# vocab-sized parameter leaves and their vocab axis (flax param paths);
# "embedding/embedding" also matches "ast_embedding/embedding"
_VOCAB_LEAF_AXES = (
    ("embedding/embedding", 0),
    ("output_layer/kernel", 1),
    ("output_layer/bias", 0),
)


def adapt_vocab_params(params: Any, padded_vocab: int) -> Any:
    """Pad (zeros) or slice the vocab axis of the embedding tables and the
    LM head so params saved under one ``ModelConfig.vocab_pad_multiple``
    load under another. Pad rows/columns are never read (token ids are
    always < vocab_size and exposed logits are sliced inside the model), so
    zero-padding is exact. Walks plain nested mappings (the raw orbax
    restore / flax params layout) and leaves every other leaf untouched."""
    def walk(node, path):
        if hasattr(node, "items"):
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        for suffix, ax in _VOCAB_LEAF_AXES:
            if path.endswith(suffix) and hasattr(node, "shape") \
                    and node.ndim > ax and node.shape[ax] != padded_vocab:
                arr = np.asarray(node)
                if arr.shape[ax] > padded_vocab:
                    sl = [slice(None)] * arr.ndim
                    sl[ax] = slice(0, padded_vocab)
                    return arr[tuple(sl)]
                pad = [(0, 0)] * arr.ndim
                pad[ax] = (0, padded_vocab - arr.shape[ax])
                return np.pad(arr, pad)
        return node
    return walk(params, "")


def load_checkpoint(path: str,
                    target: Optional[Any] = None) -> Tuple[Any, Dict]:
    """Restore (state_tree, metadata). ``target`` optionally provides the
    pytree structure/shardings to restore into."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if target is not None:
        tree = ckptr.restore(path, item=jax.device_get(target))
    else:
        tree = ckptr.restore(path)
    meta_path = path + ".meta.json"
    metadata: Dict = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = json.load(f)
    return tree, metadata


def find_checkpoint(checkpoint_dir: str, prefer: str = "best") -> Optional[str]:
    """Locate the newest best (or latest) checkpoint in a directory, matching
    the reference's naming scheme."""
    if not os.path.isdir(checkpoint_dir):
        return None
    entries = [e for e in os.listdir(checkpoint_dir)
               if os.path.isdir(os.path.join(checkpoint_dir, e))]
    if prefer == "best":
        best = [e for e in entries if e.startswith("best_model")]
        if best:
            def epoch_of(name):
                try:
                    return int(name.rsplit("_", 1)[1])
                except (ValueError, IndexError):
                    return -1
            return os.path.join(checkpoint_dir,
                                max(best, key=epoch_of))
    latest = [e for e in entries if e.startswith("latest_model")]
    if latest:
        return os.path.join(checkpoint_dir, sorted(latest)[-1])
    return None
