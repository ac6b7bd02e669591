"""KV-cached autoregressive generation and batched beam search.

The reference's generation loop (SCT-GAN/model.py:862-930) re-embeds and
re-decodes the ENTIRE prefix through all 6 decoder layers every step — O(L³)
total work with no KV cache, in host-Python. Here:

  * the encoder runs once; cross-attention K/V are projected once per layer
    (`precompute_cross_kv`);
  * the token loop is a `lax.while_loop` with per-layer KV caches updated by
    `dynamic_update_slice` — O(L²) total, one compiled program, zero host
    round-trips;
  * sampling parity: temperature 0.7 → syntax-constraint semicolon boost
    (model.py:1039-1043) → top-k 50 → top-p 0.95 → categorical draw with an
    explicit PRNG key; stop on EOS(2)/PAD(0) after a minimum of 50 tokens
    (model.py:922-930).

Beam search (model.py:1062-1172) is re-architected from the reference's
per-batch-per-beam Python loops into a fully batched `fori_loop`: all
B×beam_size hypotheses decode as one batch with cache reindexing via gather —
the whole search is a single XLA program.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..losses.syntax import SyntaxLossTables
from ..ops.sampling import (penalize_repetition, sample_top_k_top_p,
                            top_k_top_p_filter)

BOS_ID = 1
EOS_ID = 2
PAD_ID = 0


def _init_caches(config, batch_size: int, dtype=jnp.float32):
    # caches store the REAL head dim even when pad_attention_heads lane-pads
    # the projections (layers.py init_cache): decode is cache-bandwidth-bound
    # and the pad lanes are zeros — 96 vs 128 is a 25% HBM-read saving at
    # production geometry
    dh = config.d_model // config.nhead
    shape = (batch_size, config.nhead, config.max_length, dh)
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(config.num_decoder_layers)]


def _syntax_boost(logits, prev_token, tables: Optional[SyntaxLossTables]):
    """Semicolon-boost syntax constraint (model.py:1039-1043): double the
    semicolon logit when the previous token is return/break/continue."""
    if tables is None or tables.semicolon_id < 0:
        return logits
    stmt = ((prev_token == tables.return_id)
            | (prev_token == tables.break_id)
            | (prev_token == tables.continue_id))
    sem = tables.semicolon_id
    boosted = logits.at[:, sem].mul(2.0)
    return jnp.where(stmt[:, None], boosted, logits)


def make_generate_fn(model, tables: Optional[SyntaxLossTables] = None,
                     *, top_k: int = 50, top_p: float = 0.95,
                     min_length: int = 50,
                     apply_syntax_constraints: bool = True,
                     max_length: Optional[int] = None,
                     repetition_penalty: float = 1.0,
                     track_repetition: bool = False,
                     noise_after: int = 3, break_after: int = 8,
                     cache_chunk: Optional[int] = 128):
    """Build a jitted sampler:
    fn(params, memory, src_mask, rng, temperature) -> (B, L) ids.

    ``memory``/``src_mask`` come from ``model.encode`` (run separately so the
    vulnerability heads can reuse the same encode — unlike the reference,
    which wastefully reruns them inside generation, model.py:412-759).
    ``temperature`` is a runtime scalar — changing it never recompiles.

    ``track_repetition`` enables the reference diagnostic sampler's
    repetition machinery (inference.py:1131-1185): a per-row consecutive-
    same-token counter; once it exceeds ``noise_after`` the sampling
    distribution gets uniform(0, 0.2) noise added and renormalized, and once
    it exceeds ``break_after`` the row stops. ``repetition_penalty`` != 1
    additionally divides (positive) / multiplies (negative) the previous
    token's logit — a standard penalty the reference does NOT implement;
    kept off by default for parity.

    ``cache_chunk``: the token loop runs as ceil(L/chunk) sub-loops; sub-loop
    c carries self-attention KV caches statically sliced to (c+1)·chunk
    slots, so early steps stop paying full-length cache reads (decode is
    cache-bandwidth-bound: (B=32, H=8, 1024, 128)·2·bf16 = 134 MB/layer/step
    at full width vs a 56% average width chunked). The slice/write-back at
    chunk boundaries is ~3.6 GB per full generation vs ~360 GB of avoided
    reads. ``None`` restores the single full-width loop. Numerically
    identical either way (positions ≥ pos are masked in both).
    """
    cfg = model.config
    max_len = int(max_length or cfg.max_length)
    chunk = int(cache_chunk) if cache_chunk else max_len

    def generate(params, memory, src_mask, rng, temperature=0.7):
        b = memory.shape[0]
        cross_kvs = model.apply({"params": params}, memory,
                                method=model.precompute_cross_kv)
        caches = _init_caches(cfg, b, dtype=memory.dtype)
        tokens = jnp.full((b, max_len), PAD_ID, dtype=jnp.int32)
        tokens = tokens.at[:, 0].set(BOS_ID)
        finished = jnp.zeros((b,), dtype=bool)
        rep_count = jnp.zeros((b,), dtype=jnp.int32)

        def make_cond(end):
            def cond(carry):
                tokens, pos, finished, rep_count, caches, rng = carry
                return (pos < end) & ~jnp.all(finished)
            return cond

        def body(carry):
            tokens, pos, finished, rep_count, caches, rng = carry
            cur = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)
            logits, caches = model.apply(
                {"params": params}, cur, pos, caches, cross_kvs, src_mask,
                method=model.decode_step)
            logits = logits / temperature
            if apply_syntax_constraints:
                logits = _syntax_boost(logits, cur[:, 0], tables)
            if repetition_penalty != 1.0:
                logits = penalize_repetition(logits, cur[:, 0],
                                             repetition_penalty)
            rng, sub = jax.random.split(rng)
            if track_repetition:
                # dense filtered logits: the noise injection needs the full
                # per-vocab probability vector (inference.py:1162-1166)
                logits = top_k_top_p_filter(logits, top_k, top_p)
                # probs + U(0, 0.2) noise, renormalized, once a token has
                # repeated > noise_after times
                probs = jax.nn.softmax(logits, axis=-1)
                rng, nrng = jax.random.split(rng)
                noise = jax.random.uniform(nrng, probs.shape) * 0.2
                noisy = probs + noise
                noisy = noisy / noisy.sum(axis=-1, keepdims=True)
                probs = jnp.where((rep_count > noise_after)[:, None],
                                  noisy, probs)
                nxt = jax.random.categorical(
                    sub, jnp.log(probs), axis=-1).astype(jnp.int32)
            else:
                # fused: categorical over the k kept logits + index gather —
                # no (B, V) scatter / full-vocab gumbel inside the loop
                nxt = sample_top_k_top_p(sub, logits, top_k, top_p)
            nxt = jnp.where(finished, PAD_ID, nxt)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], pos + 1, axis=1)
            # EOS/PAD stop after min length (model.py:922-930)
            stop = ((nxt == EOS_ID) | (nxt == PAD_ID)) & (pos > min_length)
            if track_repetition:
                rep_count = jnp.where(nxt == cur[:, 0], rep_count + 1, 0)
                # row break on runaway repetition (inference.py:1184-1185)
                stop = stop | (rep_count > break_after)
            finished = finished | stop
            return tokens, pos + 1, finished, rep_count, caches, rng

        pos = jnp.int32(0)
        for start in range(0, max_len - 1, chunk):
            w = min(start + chunk, max_len)
            end = min(w, max_len - 1)
            sliced = [(k[:, :, :w, :], v[:, :, :w, :]) for k, v in caches]
            tokens, pos, finished, rep_count, sliced, rng = \
                jax.lax.while_loop(
                    make_cond(end), body,
                    (tokens, pos, finished, rep_count, sliced, rng))
            if w >= max_len:
                break   # last chunk: full-width caches are dead afterwards
            caches = [(k.at[:, :, :w, :].set(sk), v.at[:, :, :w, :].set(sv))
                      for (k, v), (sk, sv) in zip(caches, sliced)]
        return tokens

    return jax.jit(generate)


def make_beam_search_fn(model, *, beam_size: int = 3,
                        max_length: Optional[int] = None):
    """Build a jitted batched beam search:
    fn(params, input_ids, attention_mask, ast_input_ids, ast_attention_mask,
       temperature) -> {'generated_sequence': (B, L), 'encoder_output': (B, d)}.

    Parity with model.py:1062-1172 (concat-embedding encode path, top-k beam
    expansion, EOS-frozen hypotheses, best-scoring sequence returned), with
    the B×beam hypotheses decoded as one fused batch.
    """
    cfg = model.config
    max_len = int(max_length or cfg.max_length)
    kk = beam_size

    def beam_search(params, input_ids, attention_mask, ast_input_ids,
                    ast_attention_mask, temperature=1.0):
        b = input_ids.shape[0]
        memory, src_mask = model.apply(
            {"params": params}, input_ids, attention_mask, ast_input_ids,
            ast_attention_mask, method=model.encode_concat)

        # expand to B*K hypothesis rows
        rep = lambda x: jnp.repeat(x, kk, axis=0)
        memory_k = rep(memory)
        src_mask_k = rep(src_mask)
        cross_kvs = model.apply({"params": params}, memory_k,
                                method=model.precompute_cross_kv)
        caches = _init_caches(cfg, b * kk, dtype=memory.dtype)

        tokens = jnp.full((b * kk, max_len), PAD_ID, dtype=jnp.int32)
        tokens = tokens.at[:, 0].set(BOS_ID)
        # beam 0 live, others -inf so step 1 expands distinct candidates
        scores = jnp.tile(jnp.array([0.0] + [-1e30] * (kk - 1),
                                    dtype=jnp.float32), (b, 1))
        finished = jnp.zeros((b, kk), dtype=bool)

        def reindex(tree, parent):
            """Gather hypothesis-major arrays by parent beam index."""
            def gather(x):
                xs = x.reshape(b, kk, *x.shape[1:])
                idx = parent.reshape(b, kk, *([1] * (x.ndim - 1)))
                return jnp.take_along_axis(xs, idx, axis=1).reshape(x.shape)
            return jax.tree_util.tree_map(gather, tree)

        def body(pos, carry):
            tokens, scores, finished, caches = carry
            cur = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, axis=1)
            logits, new_caches = model.apply(
                {"params": params}, cur, pos, caches, cross_kvs, src_mask_k,
                method=model.decode_step)
            logp = jax.nn.log_softmax(logits / temperature, axis=-1)
            # frozen (EOS) hypotheses continue only with PAD at logp 0
            pad_only = jnp.full_like(logp, -1e30).at[:, PAD_ID].set(0.0)
            logp = jnp.where(finished.reshape(-1)[:, None], pad_only, logp)

            cand_lp, cand_tok = jax.lax.top_k(logp, kk)      # (B*K, K)
            total = (scores.reshape(-1)[:, None] + cand_lp)   # (B*K, K)
            total = total.reshape(b, kk * kk)
            best, flat_idx = jax.lax.top_k(total, kk)         # (B, K)
            parent = flat_idx // kk
            cand = flat_idx % kk

            tokens = reindex(tokens, parent)
            caches_r = reindex(new_caches, parent)
            # gather chosen tokens: cand_tok (B, K_parent, K_cand)
            ct = cand_tok.reshape(b, kk, kk)
            pt = jnp.take_along_axis(ct, parent[:, :, None], axis=1)  # (B,K,K)
            new_tok = jnp.take_along_axis(pt, cand[:, :, None],
                                          axis=2)[:, :, 0]            # (B,K)
            fin = reindex(finished.reshape(-1), parent).reshape(b, kk)
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, new_tok.reshape(-1)[:, None].astype(jnp.int32),
                pos + 1, axis=1)
            finished = fin | (new_tok == EOS_ID)
            return tokens, best, finished, caches_r

        tokens, scores, finished, _ = jax.lax.fori_loop(
            0, max_len - 1, body, (tokens, scores, finished, caches))
        # hypotheses are kept sorted by top_k: beam 0 is the best
        best_tokens = tokens.reshape(b, kk, max_len)[:, 0]
        return {
            "generated_sequence": best_tokens,
            "encoder_output": memory.mean(axis=1).astype(jnp.float32),
        }

    return jax.jit(beam_search)
