"""SmartContractTransformer — the canonical SCT-GAN model, TPU-native.

Re-implements the architecture of SCT-GAN/model.py:23-1217 as a flax module
with fully static shapes, so the whole forward jits once and runs on the MXU:

  * dual-stream embeddings (contract + AST paths) with sinusoidal PE
    (model.py:412-421);
  * 6-layer pre-norm GELU encoder with key-padding masks (model.py:56-65,428);
  * AST self-attention residual ×0.1 and cross-attention + feature-fusion
    residual ×0.1 (model.py:430-451);
  * contract-level head: mean-query attention pooling, [global-avg ‖ attended]
    aggregation MLP, 3-layer head → 8 logits (model.py:453-476);
  * line-level heads: the reference's Python triple-loop aggregation
    (model.py:494-611) becomes one segment-mean matmul over 1024 static line
    slots, with the learnable empty-line embedding + per-line sinusoidal PE
    (model.py:571-574, 1207-1217) applied via masks, two ×0.05 residual MHA
    passes, and combined main + 0.1·type-specific heads (model.py:658-731),
    with logits zeroed beyond the batch's true line count exactly like the
    reference's zero-padding to 1024 (model.py:750-759);
  * 6-layer pre-norm decoder, teacher-forced, shifted logits/targets
    (model.py:938-973);
  * integrated GAN discriminator over encoder memory (model.py:237-271,
    1174-1201).

Autoregressive generation (model.py:862-936) lives in infer/generate.py as a
KV-cached `lax.while_loop` — the module exposes `encode` and `decode_step`
for it. Weight init follows the reference's scheme (model.py:288-383).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..ops.segment_mean import line_segment_mean
from .layers import (
    MLP,
    FastDropout,
    MultiheadAttention,
    ResidualLineFeatureExtractor,
    TransformerDecoderStack,
    TransformerEncoderStack,
    line_position_encoding,
    normal_init,
    sinusoidal_position_encoding,
    xavier_init,
    zeros_init,
)

# xavier_uniform with gain g == variance_scaling(g^2, fan_avg, uniform)
xavier_gain_08 = nn.initializers.variance_scaling(0.64, "fan_avg", "uniform")


class _VulnTypeProcessor(nn.Module):
    """One per-type sub-head: d/2 → d/4 → 1 without LayerNorm
    (model.py:195-203)."""

    d_model: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return MLP([self.d_model // 4, 1], dropout=0.1, use_layernorm=False,
                   dtype=self.dtype, name="mlp")(x, deterministic)


class SmartContractTransformer(nn.Module):
    """Dual-input encoder-decoder with vulnerability heads and GAN head."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        d = cfg.d_model
        dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                 else jnp.float32)
        self._dtype = dtype

        # vocab-sized params are padded to cfg.padded_vocab_size (128-lane
        # alignment + mp divisibility, see ModelConfig.vocab_pad_multiple);
        # token ids are always < vocab_size so the pad rows are never read
        # and receive zero gradient, and every exposed logits tensor is
        # sliced back to vocab_size below.
        self.embedding = nn.Embed(cfg.padded_vocab_size, d,
                                  embedding_init=normal_init(0.02),
                                  name="embedding")
        self.embedding_norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype,
                                   name="embedding_norm")
        self.ast_embedding = nn.Embed(cfg.padded_vocab_size, d,
                                      embedding_init=normal_init(0.02),
                                      name="ast_embedding")
        self.ast_embedding_norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype,
                                               name="ast_embedding_norm")
        self.embedding_dropout = FastDropout(cfg.dropout)
        self.ast_embedding_dropout = FastDropout(cfg.dropout)

        pad_heads = getattr(cfg, "pad_attention_heads", False)
        self.encoder = TransformerEncoderStack(
            cfg.num_encoder_layers, d, cfg.nhead, cfg.dim_feedforward,
            cfg.dropout, dtype=dtype, use_flash=cfg.use_flash_attention,
            remat=cfg.remat, pad_heads=pad_heads, seq_axis=cfg.seq_axis,
            name="encoder")
        self.decoder = TransformerDecoderStack(
            cfg.num_decoder_layers, d, cfg.nhead, cfg.dim_feedforward,
            cfg.dropout, dtype=dtype, use_flash=cfg.use_flash_attention,
            remat=cfg.remat, pad_heads=pad_heads, name="decoder")

        self.ast_attention = MultiheadAttention(
            d, cfg.nhead, cfg.dropout, dtype=dtype, pad_heads=pad_heads,
            name="ast_attention")
        self.cross_attention = MultiheadAttention(
            d, cfg.nhead, cfg.dropout, dtype=dtype, pad_heads=pad_heads,
            name="cross_attention")
        # fusion MLP 2d→d→d/2→d with LN+GELU+dropout between (model.py:225-235)
        self.feature_fusion = MLP([d, d // 2, d], dropout=cfg.dropout,
                                  dtype=dtype, name="feature_fusion")

        # Contract-level head (model.py:84-116)
        self.contract_vuln_attention = MultiheadAttention(
            d, cfg.nhead, cfg.dropout, dtype=dtype, pad_heads=pad_heads,
            name="contract_vuln_attention")
        self.contract_feature_aggregation = MLP(
            [2 * d, d], dropout=cfg.dropout, activate_final=True, dtype=dtype,
            name="contract_feature_aggregation")
        self.contract_vulnerability_head = MLP(
            [d, d // 2, cfg.num_vulnerability_types], dropout=cfg.dropout,
            kernel_init=normal_init(0.02), final_kernel_init=normal_init(0.02),
            dtype=dtype, name="contract_vulnerability_head")

        # Line-level heads (model.py:118-203)
        self.line_feature_extractor = ResidualLineFeatureExtractor(
            d, dtype=dtype, name="line_feature_extractor")
        self.line_vuln_attention = MultiheadAttention(
            d, cfg.nhead, cfg.dropout * 0.2, dtype=dtype,
            kernel_init=xavier_gain_08, pad_heads=pad_heads,
            name="line_vuln_attention")
        self.vuln_type_attention = MultiheadAttention(
            d, cfg.nhead, cfg.dropout * 0.2, dtype=dtype,
            kernel_init=xavier_gain_08, pad_heads=pad_heads,
            name="vuln_type_attention")
        # No-LayerNorm main head; final layer normal(0.1) / bias -0.2
        # (model.py:175-183, 364-369)
        self.line_vulnerability_head_1 = MLP(
            [d, d // 2, cfg.num_vulnerability_types], dropout=0.1,
            use_layernorm=False, final_kernel_init=normal_init(0.1),
            final_bias_init=nn.initializers.constant(-0.2), dtype=dtype,
            name="line_vulnerability_head_1")
        self.line_specific_processor = MLP(
            [d, d // 2], dropout=0.1, use_layernorm=False, activate_final=True,
            dtype=dtype, name="line_specific_processor")
        self.vuln_type_processor = [
            _VulnTypeProcessor(d, dtype=dtype, name=f"vuln_type_processor_{i}")
            for i in range(cfg.num_vulnerability_types)
        ]
        self.empty_line_embedding = self.param(
            "empty_line_embedding", zeros_init, (d,))

        # LM output projection (model.py:79-82)
        self.output_norm = nn.LayerNorm(epsilon=1e-5, dtype=dtype,
                                name="output_norm")
        self.output_dropout = FastDropout(cfg.dropout)
        self.output_layer = nn.Dense(cfg.padded_vocab_size,
                                     kernel_init=normal_init(0.02),
                                     bias_init=zeros_init, dtype=dtype,
                                     name="output_layer")

        # Integrated GAN discriminator (model.py:237-271)
        if cfg.use_gan:
            self.disc_path_attention = MultiheadAttention(
                d, cfg.nhead, cfg.dropout, dtype=dtype, pad_heads=pad_heads,
                name="disc_path_attention")
            self.disc_grammar_projection = nn.Dense(
                d, kernel_init=xavier_init, bias_init=zeros_init, dtype=dtype,
                name="disc_grammar_projection")
            self.disc_feature_extractor = MLP(
                [2 * d, d], dropout=cfg.dropout, activate_final=True,
                dtype=dtype, name="disc_feature_extractor")
            self.disc_synthetic_head = MLP(
                [d // 2, 1], dropout=cfg.dropout, dtype=dtype,
                name="disc_synthetic_head")

        self._pe = sinusoidal_position_encoding(cfg.max_length, d)
        self._line_pe = line_position_encoding(cfg.max_lines, d)

    # -- embedding pipelines -------------------------------------------------
    def _embed(self, ids, embed, norm, drop, deterministic):
        d = self.config.d_model
        if self.config.sorted_embed_grad:
            from ..ops.embed import embedding_lookup
            x = embedding_lookup(embed.embedding, ids) * math.sqrt(d)
        else:
            x = embed(ids) * math.sqrt(d)
        x = drop(x, deterministic=deterministic)
        x = norm(x)
        if self.config.seq_axis is not None:
            # sequence-sharded under shard_map: this shard's rows sit at
            # global positions [idx·s_local, (idx+1)·s_local)
            s_local = x.shape[1]
            offset = jax.lax.axis_index(self.config.seq_axis) * s_local
            pe = jax.lax.dynamic_slice_in_dim(self._pe, offset, s_local,
                                              axis=0)
        else:
            pe = self._pe[: x.shape[1]]
        x = x + pe[None]
        return x.astype(self._dtype)

    def embed_target(self, target_ids, deterministic: bool = True):
        """Shared-embedding target pipeline (model.py:944-947)."""
        return self._embed(target_ids, self.embedding, self.embedding_norm,
                           self.embedding_dropout, deterministic)

    def embed_target_token(self, token_ids, pos):
        """Embed a single decode-step token at position ``pos``
        (generation-path embedding pipeline, model.py:871-874)."""
        d = self.config.d_model
        x = self.embedding(token_ids) * math.sqrt(d)     # (B, 1, d)
        x = self.embedding_norm(x)
        pe = jax.lax.dynamic_slice_in_dim(self._pe, pos, 1, axis=0)
        return (x + pe[None]).astype(self._dtype)

    # -- encoder side ----------------------------------------------------------
    def encode(self, input_ids, attention_mask=None, ast_input_ids=None,
               ast_attention_mask=None, deterministic: bool = True):
        """Contract encoding incl. AST attention + fusion (model.py:412-451).

        Returns the fused memory (B, S, d_model)."""
        b, s = input_ids.shape
        src_mask = (attention_mask.astype(bool) if attention_mask is not None
                    else jnp.ones((b, s), dtype=bool))

        contract_emb = self._embed(input_ids, self.embedding,
                                   self.embedding_norm,
                                   self.embedding_dropout, deterministic)
        memory = self.encoder(contract_emb, key_padding_mask=src_mask,
                              deterministic=deterministic)

        if ast_input_ids is not None and ast_attention_mask is not None:
            ast_mask = ast_attention_mask.astype(bool)
            ast_emb = self._embed(ast_input_ids, self.ast_embedding,
                                  self.ast_embedding_norm,
                                  self.ast_embedding_dropout, deterministic)
            ast_out = self.ast_attention(
                memory, ast_emb, ast_emb, key_padding_mask=ast_mask,
                deterministic=deterministic,
                use_flash=self.config.use_flash_attention,
                seq_axis=self.config.seq_axis)
            memory = memory + 0.1 * ast_out
            cross_out = self.cross_attention(
                memory, ast_emb, ast_emb, key_padding_mask=ast_mask,
                deterministic=deterministic,
                use_flash=self.config.use_flash_attention,
                seq_axis=self.config.seq_axis)
            fused = self.feature_fusion(
                jnp.concatenate([memory, 0.1 * cross_out], axis=-1),
                deterministic)
            memory = memory + 0.1 * fused
        return memory

    # -- heads -----------------------------------------------------------------
    def contract_head(self, memory, deterministic: bool = True):
        """Contract-level logits + attention weights (model.py:453-476).

        Note reference quirks kept: the pooling attention has NO key-padding
        mask and global_avg is an unmasked mean over all positions."""
        attn_out, attn_weights = self.contract_vuln_attention(
            memory.mean(axis=1, keepdims=True), memory, memory,
            deterministic=deterministic, return_weights=True,
            use_flash=False)  # weights materialized for localization API
        global_avg = memory.mean(axis=1)
        rep = jnp.concatenate([global_avg, attn_out[:, 0]], axis=-1)
        feats = self.contract_feature_aggregation(rep, deterministic)
        logits = self.contract_vulnerability_head(feats, deterministic)
        return logits.astype(jnp.float32), attn_weights

    def _debug_sow(self, name, x):
        """Per-stage range/std instrumentation (model.py:205-206, 487-492,
        609-855 `_debug_mode` prints). Collected via flax 'intermediates':
        model.apply(..., mutable=['intermediates']) returns the stats without
        any recompile of the production path."""
        x32 = x.astype(jnp.float32)
        self.sow("intermediates", name, {
            "mean": x32.mean(), "std": x32.std(),
            "min": x32.min(), "max": x32.max()})

    def line_head(self, memory, token_to_line, deterministic: bool = True):
        """Line-level logits (B, max_lines, num_types) (model.py:478-759)."""
        cfg = self.config
        num_lines = cfg.max_lines

        means, counts = line_segment_mean(
            memory, token_to_line, num_lines,
            compute_dtype=self._dtype)
        self._debug_sow("line_means", means)
        slot_ids = jnp.arange(num_lines)
        if cfg.per_sample_line_counts:
            # Non-parity knob (config.py): each row masks its own line
            # count, so batched serving matches the reference's batch-1
            # behavior for mixed-length inputs.
            row_max = jnp.max(token_to_line, axis=-1, keepdims=True) + 1
            valid = slot_ids[None, :] < row_max         # (B, L)
        else:
            # Global line count across the batch (reference uses
            # token_to_line.max()+1 over the whole batch tensor,
            # model.py:484).
            global_max = jnp.max(token_to_line) + 1
            valid = slot_ids[None, :] < global_max      # (1, L)

        line_pe = self._line_pe[None].astype(means.dtype)
        has_tokens = (counts > 0)[..., None]
        feats = jnp.where(has_tokens, means,
                          self.empty_line_embedding[None, None, :]) + line_pe
        original = feats

        extracted = self.line_feature_extractor(feats, deterministic)
        # Zero-output fallback (model.py:641-644): if the extractor collapses
        # (std < 1e-6 over valid slots), fall back to 0.1 × original features.
        mask_f = valid[..., None].astype(jnp.float32)
        denom = jnp.maximum(mask_f.sum() * extracted.shape[-1], 1.0)
        mean_v = (extracted.astype(jnp.float32) * mask_f).sum() / denom
        var_v = (((extracted.astype(jnp.float32) - mean_v) ** 2)
                 * mask_f).sum() / denom
        collapsed = jnp.sqrt(var_v) < 1e-6
        feats = jnp.where(collapsed, original * 0.1, extracted)
        self._debug_sow("line_extracted", feats)

        valid_b = jnp.broadcast_to(valid, (feats.shape[0], num_lines))
        attn1 = self.line_vuln_attention(
            feats, feats, feats, key_padding_mask=valid_b,
            deterministic=deterministic,
            use_flash=cfg.use_flash_attention)
        feats = feats + 0.05 * attn1
        attn2 = self.vuln_type_attention(
            feats, feats, feats, key_padding_mask=valid_b,
            deterministic=deterministic,
            use_flash=cfg.use_flash_attention)
        feats = feats + 0.05 * attn2

        combined = jnp.concatenate([feats, attn1], axis=-1)
        main_out = self.line_vulnerability_head_1(combined, deterministic)
        line_specific = self.line_specific_processor(original, deterministic)
        type_specific = jnp.concatenate(
            [proc(line_specific, deterministic)
             for proc in self.vuln_type_processor], axis=-1)
        logits = main_out + 0.1 * type_specific
        # Zero logits beyond the true line count — parity with the reference's
        # zero-padding of stacked logits to 1024 (model.py:750-759).
        logits = jnp.where(valid[..., None], logits, 0.0)
        self._debug_sow("line_logits", logits)
        return logits.astype(jnp.float32)

    def discriminator_forward(self, features, deterministic: bool = True):
        """Integrated discriminator (model.py:1174-1201)."""
        if not self.config.use_gan:
            return None
        attn_out = self.disc_path_attention(
            features, features, features, deterministic=deterministic,
            use_flash=self.config.use_flash_attention)
        x = features + attn_out
        x = self.disc_grammar_projection(x)
        x = x.mean(axis=1)
        x = self.disc_feature_extractor(x, deterministic)
        return self.disc_synthetic_head(x, deterministic).astype(jnp.float32)

    # -- KV-cached autoregressive decode ------------------------------------
    def init_decode_cache(self, batch_size: int):
        """Per-layer self-attention KV caches sized to max_length."""
        return self.decoder.init_cache(batch_size, self.config.max_length,
                                       dtype=self._dtype)

    def precompute_cross_kv(self, memory):
        """Cross-attention K/V per decoder layer, computed once per encode —
        removes the reference's per-step re-projection of the full memory
        (model.py:880-885 re-runs the decoder over the whole prefix)."""
        return self.decoder.precompute_cross_kv(memory)

    def decode_step(self, token_ids, pos, caches, cross_kvs, src_mask):
        """One decode step: (B, 1) token ids at ``pos`` → (B, vocab) logits.

        Output pipeline parity with generation mode (model.py:886-890):
        decoder → output_norm → output_layer (dropout inactive at inference).
        """
        x = self.embed_target_token(token_ids, pos)
        x, caches = self.decoder.step(x, caches, cross_kvs, pos,
                                      memory_key_padding_mask=src_mask)
        x = self.output_norm(x)
        logits = self.output_layer(x)[:, 0, :self.config.vocab_size]
        return logits.astype(jnp.float32), caches

    def encode_concat(self, input_ids, attention_mask, ast_input_ids,
                      ast_attention_mask):
        """Beam-search encode path (model.py:1080-1103): concatenated
        contract+AST embeddings (each stream truncated to max_length//2),
        plain embed×√d + PE (no norm/dropout — the reference skips them
        here), single encoder pass. Returns (memory, src_mask)."""
        cfg = self.config
        half = cfg.max_length // 2
        c_emb = (self.embedding(input_ids[:, :half])
                 * math.sqrt(cfg.d_model) + self._pe[None, :half])
        a_emb = (self.ast_embedding(ast_input_ids[:, :half])
                 * math.sqrt(cfg.d_model) + self._pe[None, :half])
        src_emb = jnp.concatenate([c_emb, a_emb], axis=1).astype(self._dtype)
        src_mask = jnp.concatenate(
            [attention_mask[:, :half], ast_attention_mask[:, :half]],
            axis=1).astype(bool)
        memory = self.encoder(src_emb, key_padding_mask=src_mask,
                              deterministic=True)
        return memory, src_mask

    def decode_hidden(self, target_ids, memory, src_mask,
                      deterministic: bool = True):
        """Teacher-forced decode up to (and including) output_norm/dropout —
        everything except the LM-head matmul. The fused LM-CE path consumes
        this directly so the (B, S, 50k) logits are produced and reduced
        inside one custom-VJP op (ops/fused_ce.py) instead of being
        materialized between the model and the loss."""
        tgt_emb = self.embed_target(target_ids, deterministic)
        out = self.decoder(tgt_emb, memory,
                           memory_key_padding_mask=src_mask,
                           deterministic=deterministic)
        out = self.output_norm(out)
        return self.output_dropout(out, deterministic=deterministic)

    def decode_teacher_forced(self, target_ids, memory, src_mask,
                              deterministic: bool = True):
        """Teacher-forced decode → full-sequence vocab logits
        (model.py:942-959)."""
        out = self.decode_hidden(target_ids, memory, src_mask, deterministic)
        # stay in compute dtype: the (B, S, 50k) logits are 1.6 GB in f32 —
        # consumers (CE, sampling) upcast per-tile inside fused kernels
        return self.output_layer(out)[..., :self.config.vocab_size]

    # -- full training/eval forward ---------------------------------------------
    def __call__(self, input_ids, attention_mask=None, ast_input_ids=None,
                 ast_attention_mask=None, target_ids=None, token_to_line=None,
                 deterministic: bool = True,
                 return_lm_hidden: bool = False) -> Dict[str, Any]:
        """Training-mode forward (target_ids required; generation is in
        infer/generate.py). Returns the reference's output dict
        (model.py:966-973) with unflattened shifted logits.

        ``return_lm_hidden=True`` (train-step fast path) returns the shifted
        pre-LM-head hidden states under "lm_hidden" INSTEAD of "logits" —
        the fused linear+CE op then produces/reduces the 50k-vocab logits
        without ever materializing them between model and loss."""
        b, s = input_ids.shape
        src_mask = (attention_mask.astype(bool) if attention_mask is not None
                    else jnp.ones((b, s), dtype=bool))
        memory = self.encode(input_ids, attention_mask, ast_input_ids,
                             ast_attention_mask, deterministic)

        contract_logits, contract_attn_weights = self.contract_head(
            memory, deterministic)

        if token_to_line is not None:
            line_logits = self.line_head(memory, token_to_line, deterministic)
        else:
            line_logits = None

        out: Dict[str, Any] = {
            "contract_vulnerability_logits": contract_logits,
            "line_vulnerability_logits": line_logits,
            "contract_attn_weights": contract_attn_weights,
            "encoder_output": memory.mean(axis=1).astype(jnp.float32),
            "memory": memory,
        }

        if target_ids is not None:
            if return_lm_hidden:
                hidden = self.decode_hidden(target_ids, memory, src_mask,
                                            deterministic)
                out["lm_hidden"] = hidden[:, :-1, :]
            else:
                logits = self.decode_teacher_forced(
                    target_ids, memory, src_mask, deterministic)
                out["logits"] = logits[:, :-1, :]
            out["target_ids"] = target_ids[:, 1:]

        out["discriminator_logits"] = (
            self.discriminator_forward(memory, deterministic)
            if self.config.use_gan else None)
        return out
