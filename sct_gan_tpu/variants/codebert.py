"""Frozen CodeBERT (RoBERTa-base) embedder in JAX.

The TASC variants embed contract and AST-path token streams with a frozen
`microsoft/codebert-base` encoder and SUM the two embeddings
(Binary-TASC-model/model.py:269-327, MultiClass-TASC-model/
model_code_loc.py:393-460). This module rebuilds the RoBERTa-base
architecture in flax (post-norm encoder, learned positions with RoBERTa's
padding-offset quirk) and can ingest real HF weights when they are cached
locally; in hermetic environments it falls back to deterministic random
initialization with identical shapes, keeping the whole TASC pipeline
runnable offline.

Params are held OUTSIDE the trainable pytree and wrapped in
`lax.stop_gradient` — the exact analogue of requires_grad=False + eval().
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

ROBERTA_PAD_ID = 1


class RobertaEmbeddings(nn.Module):
    vocab_size: int = 50265
    d_model: int = 768
    max_positions: int = 514
    dtype: Any = None

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        word = nn.Embed(self.vocab_size, self.d_model,
                        embedding_init=nn.initializers.normal(0.02),
                        name="word_embeddings")(input_ids)
        # RoBERTa position ids: pad positions stay at pad_id, real tokens
        # count from pad_id+1 (HF create_position_ids_from_input_ids)
        mask = attention_mask.astype(jnp.int32)
        pos_ids = jnp.cumsum(mask, axis=1) * mask + ROBERTA_PAD_ID
        pos = nn.Embed(self.max_positions, self.d_model,
                       embedding_init=nn.initializers.normal(0.02),
                       name="position_embeddings")(pos_ids)
        tok_type = nn.Embed(1, self.d_model,
                            embedding_init=nn.initializers.normal(0.02),
                            name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        return x.astype(self.dtype) if self.dtype else x


class RobertaLayer(nn.Module):
    """Post-norm transformer layer (BERT/RoBERTa style)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        from ..models.layers import MultiheadAttention
        attn = MultiheadAttention(self.d_model, self.num_heads, 0.0,
                                  dtype=self.dtype, name="attention")(
            x, x, x, key_padding_mask=key_padding_mask, deterministic=True,
            use_flash=True)
        x = nn.LayerNorm(epsilon=1e-5, name="attention_norm")(x + attn)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=1e-5, name="output_norm")(x + h)


class FlaxCodeBERT(nn.Module):
    """RoBERTa-base encoder: embeddings + N post-norm layers."""

    vocab_size: int = 50265
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    dim_feedforward: int = 3072
    max_positions: int = 514
    dtype: Any = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = RobertaEmbeddings(self.vocab_size, self.d_model,
                              max_positions=self.max_positions,
                              dtype=self.dtype, name="embeddings")(
            input_ids, attention_mask)
        kp = attention_mask.astype(bool)
        for i in range(self.num_layers):
            x = RobertaLayer(self.d_model, self.num_heads,
                             self.dim_feedforward, dtype=self.dtype,
                             name=f"layer_{i}")(x, key_padding_mask=kp)
        return x


def load_codebert_params(model, model_name: str = "microsoft/codebert-base",
                         seed: int = 0) -> Any:
    """CodeBERT parameters: real HF weights when available, else
    deterministic random init (same shapes)."""
    init_ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(seed)}, init_ids,
                        jnp.ones_like(init_ids))["params"]
    try:
        hf = _load_hf_state_dict(model_name)
    except Exception:
        hf = None
    if hf is None:
        return params
    return _convert_hf_weights(params, hf, model.num_layers)


def _load_hf_state_dict(model_name: str):
    from transformers import AutoModel
    torch_model = AutoModel.from_pretrained(model_name)
    return {k: v.detach().cpu().numpy()
            for k, v in torch_model.state_dict().items()}


def _convert_hf_weights(params, hf, num_layers: int):
    """Map HF roberta state-dict names onto the flax tree."""
    p = jax.tree_util.tree_map(np.asarray, params)
    emb = p["embeddings"]
    emb["word_embeddings"]["embedding"] = hf["embeddings.word_embeddings.weight"]
    emb["position_embeddings"]["embedding"] = hf["embeddings.position_embeddings.weight"]
    emb["token_type_embeddings"]["embedding"] = hf["embeddings.token_type_embeddings.weight"]
    emb["layer_norm"]["scale"] = hf["embeddings.LayerNorm.weight"]
    emb["layer_norm"]["bias"] = hf["embeddings.LayerNorm.bias"]
    for i in range(num_layers):
        li = p[f"layer_{i}"]
        hp = f"encoder.layer.{i}."
        att = li["attention"]
        for ours, theirs in (("q_proj", "attention.self.query"),
                             ("k_proj", "attention.self.key"),
                             ("v_proj", "attention.self.value"),
                             ("out_proj", "attention.output.dense")):
            att[ours]["kernel"] = hf[hp + theirs + ".weight"].T
            att[ours]["bias"] = hf[hp + theirs + ".bias"]
        li["attention_norm"]["scale"] = hf[hp + "attention.output.LayerNorm.weight"]
        li["attention_norm"]["bias"] = hf[hp + "attention.output.LayerNorm.bias"]
        li["intermediate"]["kernel"] = hf[hp + "intermediate.dense.weight"].T
        li["intermediate"]["bias"] = hf[hp + "intermediate.dense.bias"]
        li["output"]["kernel"] = hf[hp + "output.dense.weight"].T
        li["output"]["bias"] = hf[hp + "output.dense.bias"]
        li["output_norm"]["scale"] = hf[hp + "output.LayerNorm.weight"]
        li["output_norm"]["bias"] = hf[hp + "output.LayerNorm.bias"]
    return p
