"""Ablate the full fused train step to locate the remaining MFU gap.

Round-3 attribution (tools/time_fwd_modules.py) priced the stages but not
the *cross-cutting* costs that only exist in the full graph: embedding-table
scatter-add backward (3 uses of the 50265x768 tables per step), dropout mask
generation, the syntax-penalty scan, line-metric sort. This tool times the
complete jitted train step under targeted mutations, so each ablation's
delta is the true in-graph cost (stage-sum dispatch artifacts cancel —
STATUS round 3 item 7a).

Differential timing as bench.py: chain N data-dependent steps, fetch one
scalar (block_until_ready is a no-op on the tunneled runtime).

Usage: python tools/ablate_step.py [--batch 8] [--seq 1024]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated subset of ablation names")
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--ffn", type=int, default=None)
    ap.add_argument("--vocab", type=int, default=50265)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-gan", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the platform to host CPU (anchor diagnosis — "
                         "tools/baseline_anchor.py runs there)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        # No compilation cache on host-CPU runs: the shared cache holds
        # XLA:CPU AOT artifacts compiled by the REMOTE compile server for a
        # different machine (+prefer-no-scatter/+prefer-no-gather), which
        # load with feature-mismatch warnings and skew timing.
        jax.config.update("jax_platforms", "cpu")
    else:
        from sct_gan_tpu.utils.profiling import enable_compilation_cache
        enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.losses.focal import (contract_level_focal_loss,
                                          spatial_aware_focal_loss)
    from sct_gan_tpu.losses.syntax import (SyntaxLossTables,
                                           cross_entropy_loss,
                                           solidity_syntax_loss)
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    b, s, v = args.batch, args.seq, args.vocab
    tok = SolidityTokenizer(vocab_size=v)
    tables = SyntaxLossTables.from_tokenizer(tok)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, v, (b, s), np.int32)),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "ast_input_ids": jnp.asarray(rng.integers(0, v, (b, s), np.int32)),
        "ast_attention_mask": jnp.ones((b, s), jnp.int32),
        "token_to_line": jnp.asarray(np.tile(np.minimum(
            np.arange(s, dtype=np.int32) // 6, s - 1), (b, 1))),
        "vulnerable_lines": jnp.asarray(
            (rng.random((b, 8, s)) < 0.01).astype(np.int32)),
        "contract_vulnerabilities": jnp.asarray(
            rng.integers(0, 2, (b, 8)).astype(np.int32)),
    }

    def make_step(cfg: ModelConfig, *, stop_embed_grad=False,
                  ce_only=False, no_line_loss=False, no_heads=False,
                  no_dropout=False):
        model = SmartContractTransformer(cfg)
        params = model.init(
            {"params": jax.random.PRNGKey(0)}, batch["input_ids"],
            batch["attention_mask"], batch["ast_input_ids"],
            batch["ast_attention_mask"], target_ids=batch["input_ids"],
            token_to_line=batch["token_to_line"], deterministic=True)["params"]
        # plain AdamW chain: constant across ablations, so deltas attribute
        # purely to the forward/backward mutations
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(1e-5, b1=0.9, b2=0.98, eps=1e-9,
                                     weight_decay=0.1))
        opt_state = tx.init(params)

        def loss_fn(p, rng_key):
            if stop_embed_grad:
                p = dict(p)
                p["embedding"] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["embedding"])
                p["ast_embedding"] = jax.tree_util.tree_map(
                    jax.lax.stop_gradient, p["ast_embedding"])
            outputs = model.apply(
                {"params": p}, batch["input_ids"], batch["attention_mask"],
                batch["ast_input_ids"], batch["ast_attention_mask"],
                target_ids=batch["input_ids"],
                token_to_line=None if no_heads else batch["token_to_line"],
                deterministic=no_dropout,
                rngs={} if no_dropout else {"dropout": rng_key})
            if ce_only:
                return cross_entropy_loss(outputs["logits"],
                                          outputs["target_ids"])
            gen_loss, _, _ = solidity_syntax_loss(
                outputs["logits"], outputs["target_ids"], tables)
            total = 0.5 * gen_loss
            if not no_heads:
                contract_loss = contract_level_focal_loss(
                    outputs["contract_vulnerability_logits"],
                    batch["contract_vulnerabilities"].astype(jnp.float32),
                    alpha=0.05, gamma=4.0)
                total = total + 0.25 * contract_loss * 3.0
                if not no_line_loss:
                    line_labels = batch["vulnerable_lines"].transpose(
                        0, 2, 1).astype(jnp.float32)
                    line_loss = spatial_aware_focal_loss(
                        outputs["line_vulnerability_logits"], line_labels,
                        batch["token_to_line"], alpha=0.1, gamma=1.5,
                        spatial_weight=0.1)
                    total = total + 0.2 * line_loss
                if cfg.use_gan:
                    disc = outputs["discriminator_logits"]
                    total = total + 0.05 * optax.sigmoid_binary_cross_entropy(
                        disc, jnp.ones_like(disc)).mean()
            return total

        @jax.jit
        def step(p, o, rng_key):
            rng_key, sub = jax.random.split(rng_key)
            loss, grads = jax.value_and_grad(loss_fn)(p, sub)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return p, o, loss, rng_key

        return params, opt_state, step

    def time_step(params, opt_state, step, n):
        key = jax.random.PRNGKey(0)
        p, o = params, opt_state
        # compile + warm
        p, o, loss, key = step(p, o, key)
        _ = np.asarray(loss)
        tiny = jnp.zeros((8,))
        null = min(_time_fetch(tiny, i) for i in range(3))
        best = float("inf")
        for _rep in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                p, o, loss, key = step(p, o, key)
            _ = np.asarray(loss)
            best = min(best, (time.perf_counter() - t0 - null) / n)
        return best

    def _time_fetch(tiny, i):
        t0 = time.perf_counter()
        np.asarray(tiny + i)
        return time.perf_counter() - t0

    base_cfg = ModelConfig(
        use_gan=not args.no_gan, max_length=s, max_lines=s,
        d_model=args.d_model, vocab_size=v,
        dim_feedforward=args.ffn or (2048 if args.d_model == 768
                                     else args.d_model * 8 // 3),
        compute_dtype=args.dtype,
        use_flash_attention=not args.cpu)   # no Mosaic on host CPU

    ablations = {
        "full": dict(),
        "no_embed_grad": dict(stop_embed_grad=True),
        "ce_only_loss": dict(ce_only=True),
        "no_line_loss": dict(no_line_loss=True),
        "no_heads": dict(no_heads=True, ce_only=True),
        "no_dropout": dict(no_dropout=True),
    }
    only = {x for x in args.only.split(",") if x}
    results = {}
    for name, kw in ablations.items():
        if only and name not in only:
            continue
        params, opt_state, step = make_step(base_cfg, **kw)
        ms = time_step(params, opt_state, step, args.steps) * 1e3
        results[name] = ms
        print(f"{name:16s} {ms:7.1f} ms/step", flush=True)
        del params, opt_state, step

    if "full" in results:
        print("\ndeltas vs full:")
        for name, ms in results.items():
            if name != "full":
                print(f"  {name:16s} {results['full'] - ms:+7.1f} ms")


if __name__ == "__main__":
    main()
