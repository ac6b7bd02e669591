"""Dropout as a Pallas TPU kernel with in-kernel PRNG.

Why: the model applies ~30 dropout sites per step at full size (embeddings,
every encoder/decoder sublayer, FFN hiddens, heads — the torch modules the
reference gets from cuDNN, SCT-GAN/model.py:56-77,412-415). Generating those
masks with threefry costs ~25 ms/step at B=8, L=1024 (measured; the hardware
rng-bit-generator op would be free but miscompiles in large graphs on the
current runtime — see TrainConfig.fast_rng). This kernel generates the mask
tile-by-tile with the Mosaic PRNG (the same mechanism as the flash-attention
kernels' in-kernel dropout, validated on-chip), so the only cost is one
bandwidth-bound pass over the tensor.

The mask for tile i is a pure function of (seed, i), so the backward
REGENERATES it exactly instead of storing it: dx = dropout(g) with the same
seed — both calls tile the same (N, C) view identically by construction.

Semantics match torch/flax dropout: keep with prob 1-rate, scale by
1/(1-rate). The mask stream differs from flax's threefry stream (iid
Bernoulli either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, x_ref, o_ref, *, rate: float):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0], i)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    threshold = jnp.uint32(int(min(rate, 0.999999) * 4294967296.0))
    keep = bits >= threshold
    inv = 1.0 / (1.0 - rate)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * jnp.asarray(inv, x.dtype),
                           jnp.zeros((), x.dtype))


def _dropout_raw(x: jnp.ndarray, seed: jnp.ndarray, rate: float):
    """(N, C) tiled kernel application; C must be a lane multiple."""
    n, c = x.shape
    # ~2 MB VMEM per block (in + out), at least 8 sublanes, 8-aligned
    bq = max(8, min(1024, (1 << 20) // max(c * x.dtype.itemsize, 1)) // 8 * 8)
    np_ = ((n + bq - 1) // bq) * bq
    xp = jnp.pad(x, ((0, np_ - n), (0, 0))) if np_ != n else x
    seed2d = seed.reshape(1, 1).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid=(np_ // bq,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, c), x.dtype),
    )(seed2d, xp)
    return out[:n] if np_ != n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout2d(x, seed, rate):
    return _dropout_raw(x, seed, rate)


def _dropout2d_fwd(x, seed, rate):
    return _dropout_raw(x, seed, rate), seed


def _dropout2d_bwd(rate, seed, g):
    # same seed + same tiling → bit-identical keep mask
    return _dropout_raw(g, seed, rate), jnp.zeros_like(seed)


_dropout2d.defvjp(_dropout2d_fwd, _dropout2d_bwd)


def fast_dropout(x: jnp.ndarray, rate: float, rng: jax.Array,
                 *, deterministic: bool = False) -> jnp.ndarray:
    """Dropout via the Pallas kernel when on TPU and the trailing dim is a
    lane multiple; falls back to the standard jax.random mask elsewhere.

    ``rng``: a PRNG key (any impl); only one scalar randint is drawn from it
    on the XLA side — the heavy per-element bits come from the in-kernel
    Mosaic PRNG.
    """
    if deterministic or rate <= 0.0:
        return x
    if rate >= 1.0:   # match nn.Dropout: drop everything, no 1/(1-rate) inf
        return jnp.zeros_like(x)
    c = x.shape[-1]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if not on_tpu or c % 128 != 0 or x.ndim < 2:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
    seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    flat = x.reshape(-1, c)
    return _dropout2d(flat, seed, float(rate)).reshape(x.shape)
