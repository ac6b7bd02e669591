"""Dropout with cheap regenerating masks (fused hash PRNG / Pallas kernel).

Why: the model applies ~30 dropout sites per step at full size (embeddings,
every encoder/decoder sublayer, FFN hiddens, heads — the torch modules the
reference gets from cuDNN, SCT-GAN/model.py:56-77,412-415). Generating those
masks with threefry costs ~25 ms/step at B=8, L=1024 (measured; the hardware
rng-bit-generator op would be free but miscompiles in large graphs on the
current runtime — see TrainConfig.fast_rng).

Two implementations, both regenerating the mask in the backward from the
saved 32-bit seed (a pure function of (seed, element index) — no stored
mask, no select on a residual):

* ``_hash_dropout`` (default): the keep mask is a murmur3-finalizer hash of
  the flat element index, written in plain jnp int ops. XLA fuses it into
  the producer/consumer fusions (a matmul epilogue, the surrounding
  elementwise group), so the mask costs a few VPU ops per element and ZERO
  extra HBM passes — unlike any pallas_call, which is a fusion barrier that
  forces the producer's output through HBM and reads it back. Works
  identically on CPU (the tests' platform) and TPU.
* ``_dropout2d`` (Pallas, kept for comparison/validation): tile-by-tile
  Mosaic PRNG, one bandwidth-bound pass over the tensor, TPU-only.

Semantics match torch/flax dropout: keep with prob 1-rate, scale by
1/(1-rate). The mask stream differs from flax's threefry stream (iid
Bernoulli either way).
"""
from __future__ import annotations

import functools
import math

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


# -- fused hash dropout (default path) ---------------------------------------

def _hash_keep(shape, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Bernoulli(1-rate) keep mask from a murmur3 finalizer over the flat
    element index. Bijective mixing of distinct indices → uniform uint32
    stream per seed; avalanche quality is far beyond what a dropout mask
    needs. All plain VPU int ops — fusable, no HBM traffic of its own."""
    n = math.prod(shape)
    h = jax.lax.iota(jnp.uint32, n)
    h = (h + seed.astype(jnp.uint32)) * jnp.uint32(0x9E3779B1)
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    threshold = jnp.uint32(int(min(rate, 0.999999) * 4294967296.0))
    return (h >= threshold).reshape(shape)


def _hash_apply(x, seed, rate):
    keep = _hash_keep(x.shape, seed, rate)
    inv = 1.0 / (1.0 - rate)
    return jnp.where(keep, x * jnp.asarray(inv, x.dtype),
                     jnp.zeros((), x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_dropout(x, seed, rate):
    return _hash_apply(x, seed, rate)


def _hash_dropout_fwd(x, seed, rate):
    return _hash_apply(x, seed, rate), seed


def _hash_dropout_bwd(rate, seed, g):
    # same (seed, index) → bit-identical keep mask, regenerated in the
    # backward fusion instead of saved as a residual
    return _hash_apply(g, seed, rate), jnp.zeros_like(seed)


_hash_dropout.defvjp(_hash_dropout_fwd, _hash_dropout_bwd)


def fast_dropout(x: jnp.ndarray, rate: float, rng: jax.Array,
                 *, deterministic: bool = False,
                 use_pallas: bool = False) -> jnp.ndarray:
    """Dropout with a regenerating mask; fused-hash path by default.

    ``rng``: a PRNG key (any impl); only one scalar randint is drawn from it
    on the XLA side — the heavy per-element bits come from the hash mix (or
    the in-kernel Mosaic PRNG with ``use_pallas=True`` on TPU).
    """
    if deterministic or rate <= 0.0:
        return x
    if rate >= 1.0:   # match nn.Dropout: drop everything, no 1/(1-rate) inf
        return jnp.zeros_like(x)
    seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    c = x.shape[-1]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if use_pallas and on_tpu and c % 128 == 0 and x.ndim >= 2:
        flat = x.reshape(-1, c)
        return _dropout2d(flat, seed, float(rate)).reshape(x.shape)
    return _hash_dropout(x, seed, float(rate))
