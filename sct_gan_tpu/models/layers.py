"""Core flax.linen building blocks with reference-parity semantics.

These own the math that the reference delegates to torch.nn
(SCT-GAN/model.py): sinusoidal positional encodings (model.py:8-21,
1207-1217), PyTorch-style MultiheadAttention (q/k/v/out projections,
key-padding masks, weight dropout, head-averaged weights), and pre-norm GELU
Transformer encoder/decoder layers (model.py:56-77; exact, non-approximate
GELU and LayerNorm eps 1e-5 to match torch defaults). Attention compute is
dispatched through ops.attention (Pallas flash kernel on TPU).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention, mha_reference

# PyTorch nn.Linear-equivalent default init used when the reference's
# _init_weights (xavier_uniform on >1-dim, zeros on 1-dim; model.py:288-294)
# applies. Specific heads override std via `normal_init`.
xavier_init = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def gelu(x):
    """Exact (erf) GELU — torch's default for activation='gelu'."""
    return jax.nn.gelu(x, approximate=False)


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


class MultiheadAttention(nn.Module):
    """PyTorch-semantics MHA: separate q/k/v/out projections with bias,
    softmax-weight dropout, optional key-padding / causal masks, optional
    head-averaged attention weights (average_attn_weights=True convention).
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = None
    kernel_init: Callable = xavier_init

    @nn.compact
    def __call__(self, query, key, value, *,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 causal: bool = False,
                 deterministic: bool = True,
                 return_weights: bool = False,
                 use_flash: bool = True):
        dense = lambda name: nn.Dense(
            self.d_model, kernel_init=self.kernel_init, bias_init=zeros_init,
            dtype=self.dtype, name=name)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        b, sq, _ = q.shape
        sk = k.shape[1]
        h = self.num_heads
        dh = self.d_model // h
        split = lambda x, s: x.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q, sq), split(k, sk), split(v, sk)

        rng = None
        if self.dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")

        out = dot_product_attention(
            q, k, v, key_padding_mask=key_padding_mask, causal=causal,
            dropout_rate=self.dropout, deterministic=deterministic,
            dropout_rng=rng, return_weights=return_weights,
            use_flash=use_flash)
        weights = None
        if return_weights:
            out, weights = out
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, self.d_model)
        out = dense("out_proj")(out)
        if return_weights:
            return out, weights
        return out


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
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, kernel_init=xavier_init,
                     bias_init=zeros_init, dtype=self.dtype, name="linear2")(x)
        return x


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

    @nn.compact
    def __call__(self, x, *, key_padding_mask=None, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                               dtype=self.dtype, name="self_attn")(
            h, h, h, key_padding_mask=key_padding_mask,
            deterministic=deterministic, use_flash=self.use_flash)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                        dtype=self.dtype, name="ffn")(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TransformerDecoderLayer(nn.Module):
    """Pre-norm decoder layer (model.py:67-76): causal self-attn, cross-attn
    vs memory with memory key-padding mask, FFN."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, memory, *, memory_key_padding_mask=None,
                 deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                               dtype=self.dtype, name="self_attn")(
            h, h, h, causal=True, deterministic=deterministic,
            use_flash=self.use_flash)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                               dtype=self.dtype, name="cross_attn")(
            h, memory, memory, key_padding_mask=memory_key_padding_mask,
            deterministic=deterministic, use_flash=self.use_flash)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = FeedForward(self.d_model, self.dim_feedforward, self.dropout,
                        dtype=self.dtype, name="ffn")(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class TransformerEncoderStack(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None
    use_flash: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, key_padding_mask=None, deterministic=True):
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, static_argnums=())
        for i in range(self.num_layers):
            x = layer_cls(self.d_model, self.num_heads, self.dim_feedforward,
                          self.dropout, dtype=self.dtype,
                          use_flash=self.use_flash, name=f"layer_{i}")(
                x, key_padding_mask=key_padding_mask,
                deterministic=deterministic)
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

    @nn.compact
    def __call__(self, x, memory, *, memory_key_padding_mask=None,
                 deterministic=True):
        layer_cls = TransformerDecoderLayer
        if self.remat:
            layer_cls = nn.remat(layer_cls, static_argnums=())
        for i in range(self.num_layers):
            x = layer_cls(self.d_model, self.num_heads, self.dim_feedforward,
                          self.dropout, dtype=self.dtype,
                          use_flash=self.use_flash, name=f"layer_{i}")(
                x, memory, memory_key_padding_mask=memory_key_padding_mask,
                deterministic=deterministic)
        return x


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
                    x = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(x)
                x = gelu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
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
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(h)
        h = gelu(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, kernel_init=normal_init(0.1),
                     bias_init=zeros_init, dtype=self.dtype, name="linear2")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        return h + 0.1 * residual
