"""Measure per-dispatch overhead of the tunneled TPU runtime.

Hypothesis: chaining N separate jitted calls costs N x (device time +
per-dispatch overhead); the differential method cancels only the final
fetch, not the per-call dispatch. If overhead is material, wrapping K train
steps in one lax.scan program (device-side loop) is a real optimization,
not a measurement trick.

Probes:
  1. trivial op (x = x + 1 on (8,128)) chained N times -> per-call floor
  2. medium matmul chained N times -> floor + tiny compute
  3. full train step: K separate dispatches vs ONE program scanning K steps
     on K prefetched batches (identical math, donated state).

Usage: python tools/time_dispatch.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _null_fetch():
    import jax.numpy as jnp
    import numpy as np
    tiny = jnp.zeros((8,))
    null = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        np.asarray(tiny + i)
        null = min(null, time.perf_counter() - t0)
    return null


def time_chain(fn, x, n):
    """Per-call time of n data-dependent dispatches (differential)."""
    import numpy as np
    y = fn(x)          # compile
    y = fn(y)
    np.asarray(y).ravel()[:1]
    null = _null_fetch()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        z = x
        for _ in range(n):
            z = fn(z)
        _ = np.asarray(z).ravel()[:1]
        best = min(best, (time.perf_counter() - t0 - null) / n)
    return best


def main() -> None:
    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    # 1. trivial op
    f_triv = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    t = time_chain(f_triv, x, 50)
    print(f"trivial dispatch: {t * 1e3:.3f} ms/call", flush=True)

    # 2. medium matmul (1024^3 bf16 ~ 2 GFLOP ~ 0.01 ms device)
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    f_mm = jax.jit(lambda x: (x @ a).astype(jnp.bfloat16))
    t = time_chain(f_mm, a, 50)
    print(f"matmul dispatch:  {t * 1e3:.3f} ms/call", flush=True)

    # 3. full train step: K dispatches vs one scan-of-K program
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.losses.syntax import SyntaxLossTables
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    import optax
    from sct_gan_tpu.losses.focal import (contract_level_focal_loss,
                                          spatial_aware_focal_loss)
    from sct_gan_tpu.losses.syntax import solidity_syntax_loss

    b, s = 8, 1024
    cfg = ModelConfig(use_gan=True, max_length=s, max_lines=s,
                      compute_dtype="bfloat16")
    model = SmartContractTransformer(cfg)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    tables = SyntaxLossTables.from_tokenizer(tok)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s),
                                              np.int32)),
        "attention_mask": jnp.ones((b, s), jnp.int32),
        "ast_input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (b, s),
                                                  np.int32)),
        "ast_attention_mask": jnp.ones((b, s), jnp.int32),
        "token_to_line": jnp.asarray(np.tile(np.minimum(
            np.arange(s, dtype=np.int32) // 6, s - 1), (b, 1))),
        "vulnerable_lines": jnp.asarray(
            (rng.random((b, 8, s)) < 0.01).astype(np.int32)),
        "contract_vulnerabilities": jnp.asarray(
            rng.integers(0, 2, (b, 8)).astype(np.int32)),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["input_ids"],
        batch["attention_mask"], batch["ast_input_ids"],
        batch["ast_attention_mask"], target_ids=batch["input_ids"],
        token_to_line=batch["token_to_line"], deterministic=True)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-5, b1=0.9, b2=0.98, eps=1e-9,
                                 weight_decay=0.1))
    opt_state = tx.init(params)

    def loss_fn(p, rng_key):
        outputs = model.apply(
            {"params": p}, batch["input_ids"], batch["attention_mask"],
            batch["ast_input_ids"], batch["ast_attention_mask"],
            target_ids=batch["input_ids"],
            token_to_line=batch["token_to_line"], deterministic=False,
            rngs={"dropout": rng_key})
        gen_loss, _, _ = solidity_syntax_loss(outputs["logits"],
                                              outputs["target_ids"], tables)
        contract_loss = contract_level_focal_loss(
            outputs["contract_vulnerability_logits"],
            batch["contract_vulnerabilities"].astype(jnp.float32),
            alpha=0.05, gamma=4.0)
        line_labels = batch["vulnerable_lines"].transpose(0, 2, 1).astype(
            jnp.float32)
        line_loss = spatial_aware_focal_loss(
            outputs["line_vulnerability_logits"], line_labels,
            batch["token_to_line"], alpha=0.1, gamma=1.5, spatial_weight=0.1)
        disc = outputs["discriminator_logits"]
        disc_loss = optax.sigmoid_binary_cross_entropy(
            disc, jnp.ones_like(disc)).mean()
        return (0.5 * gen_loss + 0.25 * contract_loss * 3.0
                + 0.2 * line_loss + 0.05 * disc_loss)

    def one_step(carry, _):
        p, o, key = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o, key), loss

    step1 = jax.jit(lambda c: one_step(c, None))

    K = 8
    scanK = jax.jit(lambda c: jax.lax.scan(one_step, c, None, length=K))

    carry = (params, opt_state, jax.random.PRNGKey(0))
    null = _null_fetch()

    if "--scan-only" not in sys.argv:
        # separate dispatches
        c = step1(carry)[0]
        _ = np.asarray(c[2])
        del c
        best_sep = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            cc = carry
            for _ in range(K):
                cc, loss = step1(cc)
            _ = np.asarray(loss)
            best_sep = min(best_sep, (time.perf_counter() - t0 - null) / K)
            del cc, loss
        print(f"train step, {K} separate dispatches: "
              f"{best_sep * 1e3:.1f} ms/step", flush=True)

    # one scan program (fresh HBM: intermediates above are freed)
    (c2, losses) = scanK(carry)
    _ = np.asarray(losses)
    del c2, losses
    best_scan = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        c2, losses = scanK(carry)
        _ = np.asarray(losses)
        best_scan = min(best_scan, (time.perf_counter() - t0 - null) / K)
        del c2, losses
    print(f"train step, scan({K}) one dispatch:  "
          f"{best_scan * 1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
