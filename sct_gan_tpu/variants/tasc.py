"""Legacy TASC GAN variants (Binary + MultiClass), TPU-native.

Architecture parity with `Binary-TASC-model/model.py` and
`MultiClass-TASC-model/model_code_loc.py`:

  * `TASCEncoder` — 6-layer **post-norm** ReLU TransformerEncoder + final
    LayerNorm (model_code_loc.py:9-46; torch default norm_first=False).
  * `Generator` — MLP 768→2048→1024→768 + Tanh on mean-pooled embeddings or
    noise (:48-83).
  * `Discriminator` — MLP 768→2048→1024→1 + Sigmoid, LeakyReLU(0.2) (:85-125).
  * `CodeDecoder` — 6-layer post-norm ReLU TransformerDecoder + padded
    embedding + 2-layer output projection to vocab 50000 (:127-243); sampled
    generation from the hard-coded `pragma` seed token, max 512, implemented
    as a KV-cached `lax.while_loop` instead of the reference's O(L³) host
    loop. (Deviation: the reference's batch-first PositionalEncoding indexes
    the table by *batch* position — a bug that gives every token the same
    PE; here positions index the sequence axis.)
  * `VulnerabilityClassifier` — sigmoid type heads + 4 per-pattern
    sub-detectors + location-attention MHA (:261-383, multiclass only).
  * `SmartContractVulnerabilityGAN` — composition returning
    embeddings/synthetic/real_scores/fake_scores/decoded_code (:385-553).

The frozen CodeBERT embedder lives in `variants/codebert.py`; its outputs are
passed in (under `stop_gradient`) rather than embedded in the module tree, so
the trainable pytree contains exactly the reference's trainable parameters.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TASCConfig
from ..models.layers import (FastDropout, MultiheadAttention,
                             sinusoidal_position_encoding, xavier_init,
                             zeros_init)

PATTERN_HEADS = {
    "timestamp_dependence": 3,   # TDInvocation, TDAssign, TDContaminate
    "reentrancy": 4,             # callValue, balanceDeduction, zeroParam, Modifier
    "integer_overflow": 3,       # arithmeticOp, safeLibrary, conditionDecl
    "dangerous_delegatecall": 2, # delegateInvocation, ownerInvocation
}

# CodeDecoder's hard-coded Solidity seed ids (model_code_loc.py:167-176)
SPECIAL_TOKENS = {"pragma": 0, "solidity": 1, "contract": 2, "function": 3,
                  "returns": 4, "public": 5, "private": 6, "view": 7}


class PostNormEncoderLayer(nn.Module):
    """torch-default encoder layer: x = LN(x + attn(x)); x = LN(x + ffn(x)),
    ReLU FFN."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        h = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                               dtype=self.dtype, name="self_attn")(
            x, x, x, key_padding_mask=key_padding_mask,
            deterministic=deterministic)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + h)
        h = nn.Dense(self.dim_feedforward, kernel_init=xavier_init,
                     dtype=self.dtype, name="linear1")(x)
        h = jax.nn.relu(h)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, kernel_init=xavier_init, dtype=self.dtype,
                     name="linear2")(h)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class PostNormDecoderLayer(nn.Module):
    """torch-default decoder layer (post-norm, ReLU) with a cached `step`."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    def setup(self):
        self.self_attn = MultiheadAttention(self.d_model, self.num_heads,
                                            self.dropout, dtype=self.dtype,
                                            name="self_attn")
        self.cross_attn = MultiheadAttention(self.d_model, self.num_heads,
                                             self.dropout, dtype=self.dtype,
                                             name="cross_attn")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")
        self.linear1 = nn.Dense(self.dim_feedforward, kernel_init=xavier_init,
                                dtype=self.dtype, name="linear1")
        self.linear2 = nn.Dense(self.d_model, kernel_init=xavier_init,
                                dtype=self.dtype, name="linear2")
        self.drop = FastDropout(self.dropout)

    def _ffn(self, x, deterministic):
        h = jax.nn.relu(self.linear1(x))
        h = self.drop(h, deterministic=deterministic)
        return self.linear2(h)

    def __call__(self, x, memory, memory_key_padding_mask=None,
                 deterministic=True):
        h = self.self_attn(x, x, x, causal=True, deterministic=deterministic)
        x = self.norm1(x + self.drop(h, deterministic=deterministic))
        h = self.cross_attn(x, memory, memory,
                            key_padding_mask=memory_key_padding_mask,
                            deterministic=deterministic)
        x = self.norm2(x + self.drop(h, deterministic=deterministic))
        h = self._ffn(x, deterministic)
        return self.norm3(x + self.drop(h, deterministic=deterministic))

    def step(self, x, k_cache, v_cache, cross_k, cross_v, pos):
        h, k_cache, v_cache = self.self_attn.step(x, k_cache, v_cache, pos)
        x = self.norm1(x + h)
        h = self.cross_attn.attend_kv(x, cross_k, cross_v)
        x = self.norm2(x + h)
        h = self._ffn(x, True)
        return self.norm3(x + h), k_cache, v_cache

    def cross_kv(self, memory):
        return self.cross_attn.project_kv(memory, memory)


class TASCEncoder(nn.Module):
    """`SmartContractTransformer` of the TASC variants
    (model_code_loc.py:9-46): 6 post-norm layers + final LayerNorm."""

    d_model: int = 768
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        for i in range(self.num_layers):
            x = PostNormEncoderLayer(self.d_model, self.nhead,
                                     self.dim_feedforward, self.dropout,
                                     dtype=self.dtype, name=f"layer_{i}")(
                x, key_padding_mask=key_padding_mask,
                deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


class Generator(nn.Module):
    """MLP generator with Tanh output (model_code_loc.py:48-83)."""

    d_model: int = 768
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        for i, w in enumerate((self.dim_feedforward,
                               self.dim_feedforward // 2)):
            x = nn.Dense(w, kernel_init=xavier_init, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(x)
            x = jax.nn.relu(x)
            x = FastDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, kernel_init=xavier_init, dtype=self.dtype,
                     name="dense_out")(x)
        return jnp.tanh(x)


class Discriminator(nn.Module):
    """MLP discriminator, LeakyReLU(0.2) + Sigmoid
    (model_code_loc.py:85-125)."""

    d_model: int = 768
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        for i, w in enumerate((self.dim_feedforward,
                               self.dim_feedforward // 2)):
            x = nn.Dense(w, kernel_init=xavier_init, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x, negative_slope=0.2)
            x = FastDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(1, kernel_init=xavier_init, dtype=self.dtype,
                     name="dense_out")(x)
        return jax.nn.sigmoid(x).astype(jnp.float32)


def _padded_embedding_init(key, shape, dtype=jnp.float32):
    """normal(0.02) with row 0 zeroed (padding_idx=0,
    model_code_loc.py:150-151)."""
    emb = jax.random.normal(key, shape, dtype) * 0.02
    return emb.at[0].set(0.0)


class CodeDecoder(nn.Module):
    """6-layer post-norm decoder + 2-layer vocab projection
    (model_code_loc.py:127-243)."""

    d_model: int = 768
    nhead: int = 8
    num_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    vocab_size: int = 50000
    max_length: int = 512
    dtype: Any = None

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_model,
                                  embedding_init=_padded_embedding_init,
                                  name="embedding")
        self.layers = [PostNormDecoderLayer(self.d_model, self.nhead,
                                            self.dim_feedforward,
                                            self.dropout, dtype=self.dtype,
                                            name=f"layer_{i}")
                       for i in range(self.num_layers)]
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.proj1 = nn.Dense(self.d_model * 2, kernel_init=xavier_init,
                              dtype=self.dtype, name="proj1")
        self.proj2 = nn.Dense(self.vocab_size, kernel_init=xavier_init,
                              dtype=self.dtype, name="proj2")
        self.drop = FastDropout(self.dropout)
        self._pe = sinusoidal_position_encoding(max(self.max_length, 2048),
                                                self.d_model)

    def _project(self, x, deterministic):
        h = jax.nn.relu(self.proj1(x))
        h = self.drop(h, deterministic=deterministic)
        return self.proj2(h).astype(jnp.float32)

    def __call__(self, x, memory, target_sequence, deterministic=True):
        """Teacher-forced decode of ``target_sequence`` vs ``memory``.

        ``x`` (the synthetic embedding) is accepted for signature parity but,
        exactly like the reference (model_code_loc.py:184-242), does not
        influence the decode — only the memory does."""
        del x
        t = self.embedding(target_sequence)
        t = t + self._pe[None, : t.shape[1], :]
        t = self.drop(t, deterministic=deterministic)
        for layer in self.layers:
            t = layer(t, memory, deterministic=deterministic)
        t = self.layer_norm(t)
        return self._project(t, deterministic)

    # -- KV-cached sampled generation (replaces the reference's host loop) --
    def init_cache(self, batch_size: int):
        dh = self.d_model // self.nhead
        shape = (batch_size, self.nhead, self.max_length, dh)
        return [(jnp.zeros(shape), jnp.zeros(shape))
                for _ in range(self.num_layers)]

    def decode_step(self, token_ids, pos, caches, cross_kvs):
        t = self.embedding(token_ids)
        pe = jax.lax.dynamic_slice_in_dim(self._pe, pos, 1, axis=0)
        t = t + pe[None]
        new_caches = []
        for layer, (kc, vc), (ck, cv) in zip(self.layers, caches, cross_kvs):
            t, kc, vc = layer.step(t, kc, vc, ck, cv, pos)
            new_caches.append((kc, vc))
        t = self.layer_norm(t)
        return self._project(t, True)[:, 0, :], new_caches

    def cross_kvs(self, memory):
        return [layer.cross_kv(memory) for layer in self.layers]


class VulnerabilityClassifier(nn.Module):
    """Multiclass type heads + per-pattern sub-detectors + location attention
    (model_code_loc.py:261-383)."""

    d_model: int = 768
    num_vulnerability_types: int = 4
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    def setup(self):
        d, f = self.d_model, self.dim_feedforward
        self.cls_dense_0 = nn.Dense(f, kernel_init=xavier_init,
                                    dtype=self.dtype, name="cls_dense_0")
        self.cls_norm_0 = nn.LayerNorm(epsilon=1e-5, name="cls_norm_0")
        self.cls_dense_1 = nn.Dense(f // 2, kernel_init=xavier_init,
                                    dtype=self.dtype, name="cls_dense_1")
        self.cls_norm_1 = nn.LayerNorm(epsilon=1e-5, name="cls_norm_1")
        self.cls_out = nn.Dense(self.num_vulnerability_types,
                                kernel_init=xavier_init, dtype=self.dtype,
                                name="cls_out")
        self.pattern_hidden = {
            k: nn.Dense(f // 2, kernel_init=xavier_init, dtype=self.dtype,
                        name=f"pattern_{k}_hidden")
            for k in PATTERN_HEADS
        }
        self.pattern_out = {
            k: nn.Dense(n, kernel_init=xavier_init, dtype=self.dtype,
                        name=f"pattern_{k}_out")
            for k, n in PATTERN_HEADS.items()
        }
        self.location_attention = MultiheadAttention(
            d, 8, self.dropout, dtype=self.dtype, name="location_attention")
        self.drop = FastDropout(self.dropout)

    def __call__(self, x, attention_mask=None, deterministic=True):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        h = jax.nn.relu(self.cls_norm_0(self.cls_dense_0(x)))
        h = self.drop(h, deterministic=deterministic)
        h = jax.nn.relu(self.cls_norm_1(self.cls_dense_1(h)))
        h = self.drop(h, deterministic=deterministic)
        vulnerability_scores = jax.nn.sigmoid(
            self.cls_out(h)).astype(jnp.float32)

        pattern_scores = {
            k: jax.nn.sigmoid(self.pattern_out[k](
                jax.nn.relu(self.pattern_hidden[k](x)))).astype(jnp.float32)
            for k in PATTERN_HEADS
        }

        q = x[:, None, :]
        attn_out, attn_weights = self.location_attention(
            q, q, q, deterministic=deterministic, return_weights=True,
            use_flash=False)
        return {
            "vulnerability_scores": vulnerability_scores,
            "pattern_scores": pattern_scores,
            "attention_weights": attn_weights,
            "location_embeddings": attn_out[:, 0, :],
        }


def get_vulnerability_explanation(pattern_scores: Dict[str, Any],
                                  index: int = 0) -> List[str]:
    """Rule-based explanations (model_code_loc.py:360-383)."""
    ts = {k: (jnp.asarray(v)[index] if jnp.asarray(v).ndim > 1
              else jnp.asarray(v))
          for k, v in pattern_scores.items()}
    explanations = []
    td = ts["timestamp_dependence"]
    if td[0] > 0.5 and (td[1] > 0.5 or td[2] > 0.5):
        explanations.append("Timestamp Dependence: Block timestamp is used "
                            "in critical operations")
    re_ = ts["reentrancy"]
    if re_[0] > 0.5 and re_[1] > 0.5 and re_[2] > 0.5 and re_[3] < 0.5:
        explanations.append("Reentrancy: Unsafe call.value usage without "
                            "proper balance deduction")
    io = ts["integer_overflow"]
    if io[0] > 0.5 and io[1] < 0.5 and io[2] < 0.5:
        explanations.append("Integer Overflow: Arithmetic operations without "
                            "safety checks")
    dd = ts["dangerous_delegatecall"]
    if dd[0] > 0.5 and dd[1] < 0.5:
        explanations.append("Dangerous Delegatecall: Unauthorized "
                            "delegatecall usage")
    return explanations


class SmartContractVulnerabilityGAN(nn.Module):
    """Composition wrapper (model_code_loc.py:385-553). CodeBERT embeddings
    are inputs (frozen embedder lives outside the trainable tree)."""

    config: TASCConfig

    def setup(self):
        cfg = self.config
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        self.transformer = TASCEncoder(cfg.d_model, cfg.nhead, cfg.num_layers,
                                       cfg.dim_feedforward, cfg.dropout,
                                       dtype=dtype, name="transformer")
        self.generator = Generator(cfg.d_model, cfg.dim_feedforward,
                                   cfg.dropout, dtype=dtype, name="generator")
        self.discriminator = Discriminator(cfg.d_model, cfg.dim_feedforward,
                                           cfg.dropout, dtype=dtype,
                                           name="discriminator")
        self.decoder = CodeDecoder(cfg.d_model, cfg.nhead, cfg.num_layers,
                                   cfg.dim_feedforward, cfg.dropout,
                                   cfg.decoder_vocab_size, cfg.max_gen_length,
                                   dtype=dtype, name="decoder")
        if cfg.multiclass:
            self.vulnerability_classifier = VulnerabilityClassifier(
                cfg.d_model, cfg.num_vulnerability_types, cfg.dim_feedforward,
                cfg.dropout, dtype=dtype, name="vulnerability_classifier")

    def encode(self, combined_embeddings, deterministic=True):
        transformed = self.transformer(combined_embeddings,
                                       deterministic=deterministic)
        return transformed, transformed.mean(axis=1)

    def __call__(self, contract_embeddings, path_embeddings,
                 target_sequence=None, deterministic=True):
        combined = contract_embeddings + path_embeddings
        transformed, mean_embeddings = self.encode(combined, deterministic)
        synthetic = self.generator(mean_embeddings,
                                   deterministic=deterministic)
        real_scores = self.discriminator(mean_embeddings,
                                         deterministic=deterministic)
        fake_scores = self.discriminator(synthetic,
                                         deterministic=deterministic)
        if target_sequence is None:
            b = contract_embeddings.shape[0]
            target_sequence = jnp.full((b, 2), 0, jnp.int32)
            target_sequence = target_sequence.at[:, 1].set(
                SPECIAL_TOKENS["solidity"])
        decoded_code = self.decoder(synthetic, transformed, target_sequence,
                                    deterministic=deterministic)
        out = {
            "embeddings": transformed,
            "synthetic": synthetic,
            "real_scores": real_scores,
            "fake_scores": fake_scores,
            "decoded_code": decoded_code,
        }
        if self.config.multiclass:
            vout = self.vulnerability_classifier(
                mean_embeddings, deterministic=deterministic)
            out["vulnerability_scores"] = vout["vulnerability_scores"]
            out["pattern_scores"] = vout["pattern_scores"]
            out["vulnerability_locations"] = vout["attention_weights"]
            out["location_embeddings"] = vout["location_embeddings"]
        return out

    def detect_vulnerabilities(self, contract_embeddings,
                               deterministic=True):
        """Classifier-only path (model_code_loc.py:487-516)."""
        transformed, mean_embeddings = self.encode(contract_embeddings,
                                                   deterministic)
        vout = self.vulnerability_classifier(mean_embeddings,
                                             deterministic=deterministic)
        return {
            "vulnerability_scores": vout["vulnerability_scores"],
            "vulnerability_locations": vout["attention_weights"],
            "location_embeddings": vout["location_embeddings"],
            "pattern_scores": vout["pattern_scores"],
        }


def make_tasc_generate_fn(model: SmartContractVulnerabilityGAN,
                          max_length: Optional[int] = None):
    """KV-cached sampled generation from the pragma seed
    (model_code_loc.py:189-218): multinomial sampling, stop when every
    sequence emits token 0."""
    cfg = model.config
    max_len = int(max_length or cfg.max_gen_length)

    def generate(params, memory, rng):
        b = memory.shape[0]
        cross = model.apply({"params": params}, memory,
                            method=lambda m, mem: m.decoder.cross_kvs(mem))
        dh = cfg.d_model // cfg.nhead
        shape = (b, cfg.nhead, max_len, dh)
        caches = [(jnp.zeros(shape), jnp.zeros(shape))
                  for _ in range(cfg.num_layers)]
        tokens = jnp.full((b, max_len), 0, jnp.int32)
        tokens = tokens.at[:, 0].set(SPECIAL_TOKENS["pragma"])
        finished = jnp.zeros((b,), bool)

        def cond(carry):
            _, pos, finished, _, _ = carry
            return (pos < max_len - 1) & ~jnp.all(finished)

        def body(carry):
            tokens, pos, finished, caches, rng = carry
            cur = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)
            logits, caches = model.apply(
                {"params": params}, cur, pos, caches, cross,
                method=lambda m, *a: m.decoder.decode_step(*a))
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], pos + 1, axis=1)
            finished = finished | (nxt == 0)
            return tokens, pos + 1, finished, caches, rng

        tokens, _, _, _, _ = jax.lax.while_loop(
            cond, body, (tokens, jnp.int32(0), finished, caches, rng))
        return tokens

    return jax.jit(generate)
