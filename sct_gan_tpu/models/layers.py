"""Core flax.linen building blocks with reference-parity semantics.

These own the math that the reference delegates to torch.nn
(SCT-GAN/model.py): sinusoidal positional encodings (model.py:8-21,
1207-1217), PyTorch-style MultiheadAttention (q/k/v/out projections,
key-padding masks, weight dropout, head-averaged weights), and pre-norm GELU
Transformer encoder/decoder layers (model.py:56-77; exact, non-approximate
GELU and LayerNorm eps 1e-5 to match torch defaults). Attention compute is
dispatched through ops.attention (Pallas flash kernel on TPU).

The decoder additionally exposes a **KV-cached single-token path**
(`init_cache` / `precompute_cross_kv` / `step`) — the TPU-native replacement
for the reference's cache-less O(L³) generation loop (SCT-GAN/model.py:862-930
re-decodes the whole prefix every step). Cached decode re-uses the exact same
parameters as the teacher-forced path.
"""
from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention, mha_reference
from ..ops.dropout import fast_dropout

# PyTorch nn.Linear-equivalent default init used when the reference's
# _init_weights (xavier_uniform on >1-dim, zeros on 1-dim; model.py:288-294)
# applies. Specific heads override std via `normal_init`.
xavier_init = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def gelu(x):
    """GELU. Exact (erf — torch's default for activation='gelu') in full
    precision; the tanh form in half precision, where its deviation is
    unobservable: max 5.0e-4 absolute (rel ≤ 2e-4 wherever |gelu| > 0.01,
    ~40× below bf16 resolution; the only multi-ULP differences sit in the
    |gelu| < 1e-3 negative tail where both forms round to ≈0). erf measures
    0.35 ms/layer slower fwd+bwd at (8, 1024, 2048) — ~4 ms/step across the
    12 FFNs (tools/time_layer.py)."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


class FastDropout(nn.Module):
    """Drop-in replacement for nn.Dropout backed by the Pallas in-kernel
    PRNG (ops/dropout.py) on TPU; identical Bernoulli/scale semantics with
    a different (still iid) mask stream. Saves the ~25 ms/step that
    threefry mask generation costs across the model's ~30 dropout sites."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        return fast_dropout(x, self.rate, self.make_rng("dropout"),
                            deterministic=False)


def sinusoidal_position_encoding(max_len: int, d_model: int,
                                 dtype=jnp.float32) -> jnp.ndarray:
    """Classic sin/cos table (model.py:8-18): (max_len, d_model)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe.astype(dtype)


def line_position_encoding(num_lines: int, d_model: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Per-line position encoding (model.py:1207-1217) — same math as the
    token PE, vectorized over all line slots at once."""
    return sinusoidal_position_encoding(num_lines, d_model, dtype)


class _HeadProjection(nn.Module):
    """q/k/v projection that emits split heads (B, H, S, head_pad) directly.

    When ``head_pad > dh`` the WEIGHT (not the activation) is zero-padded on
    the per-head output axis, so the projection matmul writes activations in
    the TPU-lane-padded layout the flash kernel wants — no (B, H, S, dh)→128
    ``jnp.pad`` HBM copies downstream. Zero pad lanes are exact: they add
    zeros to every q·k contraction and produce zero output lanes from P·V,
    and their parameter gradients are identically zero (the matching lanes of
    k/do are zero), so the pad regions of a checkpoint stay zero forever.

    The parameter tree ("kernel" (d, d), "bias" (d,), xavier/zeros init)
    is identical to the nn.Dense it replaces — checkpoints and the
    Megatron-style mp sharding rules (parallel/mesh.py) are unaffected.
    """

    d_model: int
    num_heads: int
    head_pad: int              # per-head lane width (== dh → no padding)
    dtype: Any = None
    kernel_init: Callable = xavier_init

    def setup(self):
        self.kernel = self.param("kernel", self.kernel_init,
                                 (self.d_model, self.d_model))
        self.bias = self.param("bias", zeros_init, (self.d_model,))

    def padded_kernel_bias(self):
        """(d, H·head_pad) kernel and (H·head_pad,) bias in the lane-padded
        split-head layout, compute dtype. Lets callers concatenate q/k/v
        weights into ONE decode-step matmul (MultiheadAttention.step)."""
        h = self.num_heads
        dh = self.d_model // h
        kernel, bias = nn.dtypes.promote_dtype(self.kernel, self.bias,
                                               dtype=self.dtype)
        if self.head_pad != dh:
            kernel = jnp.pad(kernel.reshape(self.d_model, h, dh),
                             ((0, 0), (0, 0), (0, self.head_pad - dh)))
            bias = jnp.pad(bias.reshape(h, dh),
                           ((0, 0), (0, self.head_pad - dh)))
        return (kernel.reshape(self.d_model, h * self.head_pad),
                bias.reshape(h * self.head_pad))

    def __call__(self, x):
        h = self.num_heads
        kernel, bias = self.padded_kernel_bias()
        (x,) = nn.dtypes.promote_dtype(x, dtype=self.dtype)
        y = x @ kernel + bias
        b, s = x.shape[0], x.shape[1]
        return y.reshape(b, s, h, self.head_pad).transpose(0, 2, 1, 3)


class _OutProjection(nn.Module):
    """Output projection consuming split (possibly lane-padded) heads.

    The weight's per-head INPUT axis is zero-padded to match ``head_pad``:
    pad lanes multiply zero rows, so the result equals the unpadded
    projection exactly. Parameter tree identical to nn.Dense(d_model).
    """

    d_model: int
    num_heads: int
    head_pad: int
    dtype: Any = None
    kernel_init: Callable = xavier_init

    @nn.compact
    def __call__(self, x):                       # x: (B, H, S, head_pad)
        h = self.num_heads
        dh = self.d_model // h
        kernel = self.param("kernel", self.kernel_init,
                            (self.d_model, self.d_model))
        bias = self.param("bias", zeros_init, (self.d_model,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        in_dh = x.shape[-1]            # head_pad, or the real dh on the
        kernel = kernel.reshape(h, dh, self.d_model)   # narrow decode path
        if in_dh != dh:
            kernel = jnp.pad(kernel, ((0, 0), (0, in_dh - dh), (0, 0)))
        kernel = kernel.reshape(h * in_dh, self.d_model)
        b, s = x.shape[0], x.shape[2]
        merged = x.transpose(0, 2, 1, 3).reshape(b, s, h * in_dh)
        return merged @ kernel + bias


class MultiheadAttention(nn.Module):
    """PyTorch-semantics MHA: separate q/k/v/out projections with bias,
    softmax-weight dropout, optional key-padding / causal masks, optional
    head-averaged attention weights (average_attn_weights=True convention).

    Besides the full `__call__`, exposes the decode-time primitives:
    `project_kv` (precompute cross-attention K/V once per generation) and
    `step` / `attend_kv` (single-query attention against cached K/V).

    ``pad_heads=True`` rounds the per-head dim up to the 128-lane TPU width
    inside the projection weights (see _HeadProjection): all attention math
    then runs in the padded layout end-to-end — numerically exact, and it
    removes the flash kernel's per-call activation pad/unpad HBM copies
    (e.g. the reference geometry d=768/h=8 → dh=96→128).
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = None
    kernel_init: Callable = xavier_init
    pad_heads: bool = False

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads

    @property
    def head_pad(self) -> int:
        dh = self.head_dim
        return ((dh + 127) // 128) * 128 if self.pad_heads else dh

    @property
    def sm_scale(self) -> float:
        return 1.0 / (self.head_dim ** 0.5)

    def setup(self):
        proj = lambda name: _HeadProjection(
            self.d_model, self.num_heads, self.head_pad,
            kernel_init=self.kernel_init, dtype=self.dtype, name=name)
        self.q_proj = proj("q_proj")
        self.k_proj = proj("k_proj")
        self.v_proj = proj("v_proj")
        self.out_proj = _OutProjection(
            self.d_model, self.num_heads, self.head_pad,
            kernel_init=self.kernel_init, dtype=self.dtype, name="out_proj")

    def __call__(self, query, key, value, *,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 causal: bool = False,
                 deterministic: bool = True,
                 return_weights: bool = False,
                 use_flash: bool = True,
                 seq_axis: Optional[str] = None):
        q = self.q_proj(query)                    # (B, H, S, head_pad)
        k = self.k_proj(key)
        v = self.v_proj(value)

        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")

        out = dot_product_attention(
            q, k, v, key_padding_mask=key_padding_mask, causal=causal,
            dropout_rate=self.dropout, deterministic=deterministic,
            dropout_rng=rng, return_weights=return_weights,
            use_flash=use_flash, sm_scale=self.sm_scale, seq_axis=seq_axis)
        weights = None
        if return_weights:
            out, weights = out
        out = self.out_proj(out)
        if return_weights:
            return out, weights
        return out

    # -- decode-time primitives ---------------------------------------------
    def project_kv(self, key, value) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Split-head K/V for attention against a fixed memory, stored at
        the REAL head dim (pad lanes are zeros — slicing them off is exact
        and saves a third of the per-step cross-KV HBM read at dh=96)."""
        dh = self.head_dim
        return (self.k_proj(key)[..., :dh], self.v_proj(value)[..., :dh])

    def attend_kv(self, query, k, v,
                  key_padding_mask: Optional[jnp.ndarray] = None):
        """Attention of a short query against precomputed split-head K/V."""
        q = self.q_proj(query)[..., :k.shape[-1]]
        if (q.shape[2] == 1 and key_padding_mask is not None
                and jax.default_backend() == "tpu"):
            from ..ops.decode_attention import decode_attention
            out = decode_attention(q, k, v, key_padding_mask,
                                   sm_scale=self.sm_scale)
        else:
            out = mha_reference(q, k, v, key_padding_mask=key_padding_mask,
                                sm_scale=self.sm_scale)
        return self.out_proj(out)

    def step(self, query, k_cache, v_cache, pos):
        """Single-token causal self-attention with KV cache.

        Args:
            query: (B, 1, d) current-token activations.
            k_cache/v_cache: (B, H, S, head_pad) caches; positions >= pos
                unused.
            pos: current position (traced scalar).
        Returns:
            (out (B, 1, d), new_k_cache, new_v_cache)
        """
        # one fused (d, 3·H·dp) matmul instead of three separate projections:
        # the decode step is per-op-overhead-bound (tiny tensors), and the
        # kernel concat is loop-invariant so XLA hoists it out of the
        # while_loop body
        b = query.shape[0]
        h, dp = self.num_heads, self.head_pad
        kernels, biases = zip(self.q_proj.padded_kernel_bias(),
                              self.k_proj.padded_kernel_bias(),
                              self.v_proj.padded_kernel_bias())
        w = jnp.concatenate(kernels, axis=1)
        bias = jnp.concatenate(biases)
        (query,) = nn.dtypes.promote_dtype(query, dtype=self.dtype)
        qkv = (query @ w + bias).reshape(b, 1, 3, h, dp).transpose(2, 0, 3, 1, 4)
        q, k_new, v_new = qkv[0], qkv[1], qkv[2]  # (B, H, 1, head_pad)
        # caches store the real head dim (init_cache): drop the zero pad
        # lanes before the write so every subsequent read stays narrow
        dh_c = k_cache.shape[-1]
        q, k_new, v_new = q[..., :dh_c], k_new[..., :dh_c], v_new[..., :dh_c]
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_new.astype(k_cache.dtype), pos, axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_new.astype(v_cache.dtype), pos, axis=2)
        s = k_cache.shape[2]
        visible = jnp.arange(s)[None, :] <= pos   # (1, S) causal-visible keys
        visible = jnp.broadcast_to(visible, (q.shape[0], s))
        if jax.default_backend() == "tpu":
            from ..ops.decode_attention import decode_attention
            out = decode_attention(q, k_cache, v_cache, visible,
                                   sm_scale=self.sm_scale)
        else:
            out = mha_reference(q, k_cache, v_cache, key_padding_mask=visible,
                                sm_scale=self.sm_scale)
        return self.out_proj(out), k_cache, v_cache


class FeedForward(nn.Module):
    """linear1 → GELU → dropout → linear2 (torch TransformerXLayer FFN)."""

    d_model: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.dim_feedforward, kernel_init=xavier_init,
                     bias_init=zeros_init, dtype=self.dtype, name="linear1")(x)
        x = gelu(x)
        x = FastDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, kernel_init=xavier_init,
                     bias_init=zeros_init, dtype=self.dtype, name="linear2")(x)
        return x


def _remat_call(layer, *args, **kwargs):
    """Rematerialized layer invocation (jax.checkpoint through flax lift)."""
    fn = nn.remat(lambda mdl, *a: mdl(*a, **kwargs))
    return fn(layer, *args)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm encoder layer (model.py:56-64, norm_first=True):
    x += attn(LN(x)); x += ffn(LN(x)). No final stack norm (the reference
    passes norm=None to TransformerEncoder)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None
    use_flash: bool = True
    pad_heads: bool = False
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        # dtype=self.dtype: f32 statistics (flax upcasts internally), output
        # already in the compute dtype every consumer casts to anyway — saves
        # a full-size f32 activation write per LN site on TPU.
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                               dtype=self.dtype, pad_heads=self.pad_heads,
                               name="self_attn")(
            h, h, h, key_padding_mask=key_padding_mask,
            deterministic=deterministic, use_flash=self.use_flash,
            seq_axis=self.seq_axis)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                        dtype=self.dtype, name="ffn")(h, deterministic=deterministic)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer (model.py:67-76): causal self-attn, cross-attn
    vs memory with memory key-padding mask, FFN. `step` runs the same layer
    for one token against KV caches."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None
    use_flash: bool = True
    pad_heads: bool = False

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="norm1")
        self.self_attn = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            pad_heads=self.pad_heads, name="self_attn")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="norm2")
        self.cross_attn = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            pad_heads=self.pad_heads, name="cross_attn")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="norm3")
        self.ffn = FeedForward(self.d_model, self.dim_feedforward,
                               self.dropout, dtype=self.dtype, name="ffn")
        self.drop = FastDropout(self.dropout)

    def __call__(self, x, memory, memory_key_padding_mask=None,
                 deterministic=True):
        h = self.norm1(x)
        h = self.self_attn(h, h, h, causal=True, deterministic=deterministic,
                           use_flash=self.use_flash)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.norm2(x)
        h = self.cross_attn(h, memory, memory,
                            key_padding_mask=memory_key_padding_mask,
                            deterministic=deterministic,
                            use_flash=self.use_flash)
        x = x + self.drop(h, deterministic=deterministic)
        h = self.norm3(x)
        h = self.ffn(h, deterministic=deterministic)
        return x + self.drop(h, deterministic=deterministic)

    def step(self, x, k_cache, v_cache, cross_k, cross_v, pos,
             memory_key_padding_mask=None):
        """One-token decode: (B,1,d) in, caches updated functionally."""
        h = self.norm1(x)
        h, k_cache, v_cache = self.self_attn.step(h, k_cache, v_cache, pos)
        x = x + h
        h = self.norm2(x)
        h = self.cross_attn.attend_kv(
            h, cross_k, cross_v, key_padding_mask=memory_key_padding_mask)
        x = x + h
        h = self.norm3(x)
        h = self.ffn(h, deterministic=True)
        return x + h, k_cache, v_cache

    def cross_kv(self, memory):
        return self.cross_attn.project_kv(memory, memory)


class TransformerEncoderStack(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None
    use_flash: bool = True
    remat: bool = False
    pad_heads: bool = False
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, key_padding_mask=None, deterministic=True):
        for i in range(self.num_layers):
            layer = TransformerEncoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dropout, dtype=self.dtype, use_flash=self.use_flash,
                pad_heads=self.pad_heads, seq_axis=self.seq_axis,
                name=f"layer_{i}")
            if self.remat:
                x = _remat_call(layer, x, key_padding_mask,
                                deterministic=deterministic)
            else:
                x = layer(x, key_padding_mask, deterministic=deterministic)
        return x


class TransformerDecoderStack(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None
    use_flash: bool = True
    remat: bool = False
    pad_heads: bool = False

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dropout, dtype=self.dtype, use_flash=self.use_flash,
                pad_heads=self.pad_heads, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, x, memory, *, memory_key_padding_mask=None,
                 deterministic=True):
        for layer in self.layers:
            if self.remat:
                x = _remat_call(layer, x, memory, memory_key_padding_mask,
                                deterministic=deterministic)
            else:
                x = layer(x, memory, memory_key_padding_mask,
                          deterministic=deterministic)
        return x

    # -- KV-cached decode ---------------------------------------------------
    def init_cache(self, batch_size: int, max_length: int,
                   dtype=jnp.float32) -> List:
        """Self-attention KV caches: one (k, v) pair per layer,
        (B, H, S, head_dim) each. Caches store the REAL head dim (96 at
        production d=768/h=8), not the 128-lane-padded width the projection
        weights use: decode is cache-bandwidth-bound and the pad lanes are
        zeros — storing them would waste a third of every cache read."""
        dh = self.layers[0].self_attn.head_dim
        shape = (batch_size, self.num_heads, max_length, dh)
        return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in range(self.num_layers)]

    def precompute_cross_kv(self, memory) -> List:
        """Per-layer cross-attention K/V computed once from the memory."""
        return [layer.cross_kv(memory) for layer in self.layers]

    def step(self, x, caches, cross_kvs, pos, memory_key_padding_mask=None):
        new_caches = []
        for layer, (kc, vc), (ck, cv) in zip(self.layers, caches, cross_kvs):
            x, kc, vc = layer.step(x, kc, vc, ck, cv, pos,
                                   memory_key_padding_mask)
            new_caches.append((kc, vc))
        return x, new_caches


class MLP(nn.Module):
    """Sequential [Dense (+LayerNorm) +GELU +Dropout]* Dense — covers the
    reference's many nn.Sequential heads. ``features`` lists hidden+output
    widths; the output layer has no activation/norm/dropout."""

    features: Sequence[int]
    dropout: float = 0.0
    use_layernorm: bool = True
    activate_final: bool = False   # some reference heads end with LN+GELU+drop
    kernel_init: Callable = xavier_init
    final_kernel_init: Optional[Callable] = None
    final_bias_init: Callable = zeros_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = len(self.features)
        for i, width in enumerate(self.features):
            last = i == n - 1
            kinit = (self.final_kernel_init if last and
                     self.final_kernel_init is not None else self.kernel_init)
            binit = self.final_bias_init if last else zeros_init
            x = nn.Dense(width, kernel_init=kinit, bias_init=binit,
                         dtype=self.dtype, name=f"dense_{i}")(x)
            if not last or self.activate_final:
                if self.use_layernorm:
                    x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name=f"norm_{i}")(x)
                x = gelu(x)
                x = FastDropout(self.dropout)(x, deterministic=deterministic)
        return x


class ResidualLineFeatureExtractor(nn.Module):
    """Residual 2-layer extractor (model.py:128-155): two Linear+LN(eps 1e-5)
    blocks, GELU after the first, dropout 0.1, output = x + 0.1 * residual.
    Init: normal(std=0.1) weights, zero bias (model.py:327-331)."""

    d_model: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        h = nn.Dense(self.d_model, kernel_init=normal_init(0.1),
                     bias_init=zeros_init, dtype=self.dtype, name="linear1")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = gelu(h)
        h = FastDropout(0.1)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, kernel_init=normal_init(0.1),
                     bias_init=zeros_init, dtype=self.dtype, name="linear2")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = FastDropout(0.1)(h, deterministic=deterministic)
        return h + 0.1 * residual
