"""Attribute the decode loop-step cost on the real chip.

bench.py's decode loop runs ~3.3 ms/loop-step at B=32 vs a ~0.5 ms HBM floor
(caches + weights). This tool times surgical while_loops:

  * layers-only loops at 1 / 3 / 6 decoder layers (no LM head, no sampling):
    slope = per-layer cost, intercept = loop/carry overhead;
  * lm+sample-only loop (output_norm -> LM head -> top-k/top-p sample, no
    decoder): the vocab-side cost;
  * embed-only loop (token embed + PE + cache write): the carry floor.

Differential timing as bench.py (null-RPC-subtracted chained runs).

Usage: python tools/time_decode_parts.py [--batch 32] [--steps 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=256,
                    help="while_loop trip count (cost is pos-independent: "
                         "static cache shapes)")
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.infer.generate import _init_caches
    from sct_gan_tpu.losses.syntax import SyntaxLossTables
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.ops.sampling import sample_top_k_top_p

    b, n = args.batch, args.steps
    tok = SolidityTokenizer(vocab_size=50265)
    tables = SyntaxLossTables.from_tokenizer(tok)

    def null_rpc():
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.zeros((8,)) + i)
            null = min(null, time.perf_counter() - t0)
        return null

    def time_fn(fn, *fn_args):
        out = fn(*fn_args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        null = null_rpc()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(*fn_args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0 - null)
        return best / n * 1e3  # ms per loop step

    results = {}

    # -- layers-only loops ---------------------------------------------------
    for layers in (1, 3, 6):
        cfg = ModelConfig(use_gan=False, num_decoder_layers=layers,
                          compute_dtype="bfloat16")
        model = SmartContractTransformer(cfg)
        ids = jnp.zeros((b, cfg.max_length), jnp.int32)
        mask = jnp.ones((b, cfg.max_length), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask,
                            ids, mask, target_ids=ids,
                            deterministic=True)["params"]
        memory = model.apply({"params": params}, ids, mask, ids, mask,
                             deterministic=True, method=model.encode)
        cross = model.apply({"params": params}, memory,
                            method=model.precompute_cross_kv)
        caches = _init_caches(cfg, b, dtype=memory.dtype)
        x0 = jnp.zeros((b, 1, cfg.d_model), memory.dtype)

        @jax.jit
        def layers_loop(params, caches, x0, cross, mask):
            def body(carry):
                x, caches, pos = carry
                x, caches = model.apply(
                    {"params": params}, x, caches, cross, pos,
                    memory_key_padding_mask=mask.astype(bool),
                    method=lambda m, *a, **k: m.decoder.step(*a, **k))
                return x, caches, pos + 1

            def cond(carry):
                return carry[2] < n

            x, caches, _ = jax.lax.while_loop(cond, body,
                                              (x0, caches, jnp.int32(0)))
            return x

        ms = time_fn(layers_loop, params, caches, x0, cross, mask)
        results[f"layers{layers}"] = ms
        print(f"layers-only x{layers}: {ms:.3f} ms/step", flush=True)

    # -- lm + sampling only --------------------------------------------------
    cfg = ModelConfig(use_gan=False, compute_dtype="bfloat16")
    model = SmartContractTransformer(cfg)
    ids = jnp.zeros((b, cfg.max_length), jnp.int32)
    mask = jnp.ones((b, cfg.max_length), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, ids,
                        mask, target_ids=ids, deterministic=True)["params"]
    x0 = jnp.zeros((b, 1, cfg.d_model), jnp.bfloat16)

    @jax.jit
    def lm_sample_loop(params, x0, rng):
        def body(carry):
            x, pos, rng, tok_prev = carry
            h = model.apply({"params": params}, x,
                            method=lambda m, a: m.output_norm(a))
            logits = model.apply(
                {"params": params}, h,
                method=lambda m, a: m.output_layer(a))[:, 0,
                                                       :cfg.vocab_size]
            logits = logits.astype(jnp.float32) / 0.7
            rng, sub = jax.random.split(rng)
            nxt = sample_top_k_top_p(sub, logits, 50, 0.95)
            # feed the sampled token back so nothing is dead code
            x = x + (nxt.astype(jnp.bfloat16)[:, None, None] * 0)
            return x, pos + 1, rng, nxt

        def cond(carry):
            return carry[1] < n

        x, _, _, nxt = jax.lax.while_loop(
            cond, body, (x0, jnp.int32(0), rng, jnp.zeros((b,), jnp.int32)))
        return nxt

    ms = time_fn(lm_sample_loop, params, x0, jax.random.key(0, impl="rbg"))
    results["lm_sample"] = ms
    print(f"lm+sample-only: {ms:.3f} ms/step", flush=True)

    # -- embed-only ----------------------------------------------------------
    @jax.jit
    def embed_loop(params, rng):
        def body(carry):
            pos, rng, acc = carry
            rng, sub = jax.random.split(rng)
            tok_ids = jax.random.randint(sub, (b, 1), 0, cfg.vocab_size)
            x = model.apply({"params": params}, tok_ids, pos,
                            method=model.embed_target_token)
            return pos + 1, rng, acc + x.astype(jnp.float32).sum()

        def cond(carry):
            return carry[0] < n

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), rng, jnp.float32(0)))
        return acc

    ms = time_fn(embed_loop, params, jax.random.key(1, impl="rbg"))
    results["embed"] = ms
    print(f"embed-only: {ms:.3f} ms/step", flush=True)

    per_layer = (results["layers6"] - results["layers1"]) / 5
    print(f"\nper-decoder-layer: {per_layer:.3f} ms; "
          f"6-layer body {results['layers6']:.3f} + lm/sample "
          f"{results['lm_sample']:.3f} + embed {results['embed']:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
