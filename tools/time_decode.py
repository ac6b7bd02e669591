"""Time KV-cached decode on the real chip, stage by stage.

Measures (a) full-length batched generation throughput (bench.py's decode
metric) and (b) a single decode_step outside the while_loop, to attribute
the per-token latency. Differential timing per bench.py (block_until_ready
is a no-op on the tunneled runtime; only D2H fetches drain the device).

Usage: python tools/time_decode.py [--batch 8] [--seq 1024]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.infer.generate import _init_caches, make_generate_fn
    from sct_gan_tpu.losses.syntax import SyntaxLossTables
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq,
                      compute_dtype="bfloat16")
    model = SmartContractTransformer(cfg)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    tables = SyntaxLossTables.from_tokenizer(tok)

    b = args.batch
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, cfg.max_length),
                                   np.int32))
    mask = jnp.ones((b, cfg.max_length), jnp.int32)
    t2l = jnp.zeros((b, cfg.max_length), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, ids,
                        mask, target_ids=ids, token_to_line=t2l,
                        deterministic=True)["params"]
    print("params initialized", flush=True)

    encode = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, i, m, deterministic=True, method=model.encode))
    memory = encode(params, ids, mask)

    def drain():
        _ = np.asarray(jnp.zeros((1,)) + 1.0)

    def null_rpc():
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.zeros((8,)) + i)
            null = min(null, time.perf_counter() - t0)
        return null

    # -- (b) single decode_step outside the loop ---------------------------
    cross_kvs = jax.jit(lambda p, m: model.apply(
        {"params": p}, m, method=model.precompute_cross_kv))(params, memory)
    caches = _init_caches(cfg, b, dtype=memory.dtype)
    cur = jnp.full((b, 1), 1, jnp.int32)

    step = jax.jit(lambda p, c, pos, ca, ck, sm: model.apply(
        {"params": p}, c, pos, ca, ck, sm, method=model.decode_step))

    def run_steps(n):
        ca = caches
        logits = None
        t0 = time.perf_counter()
        for i in range(n):
            logits, ca = step(params, cur, jnp.int32(i), ca, cross_kvs,
                              mask.astype(bool))
        _ = np.asarray(logits[:, 0])
        return time.perf_counter() - t0

    run_steps(2)  # compile
    null = null_rpc()
    t1 = run_steps(4)
    t2 = run_steps(64)
    per_step = (t2 - t1) / 60
    print(f"decode_step alone: {per_step*1e3:.2f} ms/step "
          f"(null RPC {null*1e3:.1f} ms)", flush=True)

    # -- (a) full-length generation ----------------------------------------
    generate = make_generate_fn(model, tables, min_length=10**9)

    def run_gen(n, seed0):
        last = None
        t0 = time.perf_counter()
        for i in range(n):
            last = generate(params, memory, mask.astype(bool),
                            jax.random.key(seed0 + i, impl="rbg"), 0.7)
        _ = np.asarray(last[:, -1])
        return time.perf_counter() - t0

    run_gen(1, 0)  # compile
    t_small = run_gen(1, 100)
    t_large = run_gen(3, 200)
    per_round = max((t_large - t_small) / 2, 1e-9)
    per_tok = per_round / (cfg.max_length - 1)
    print(f"full generation: {per_round:.2f} s/batch of {b} -> "
          f"{b/per_round:.3f} contracts/s, "
          f"{b*(cfg.max_length-1)/per_round:.0f} tok/s "
          f"({per_tok*1e3:.2f} ms/loop-step)", flush=True)


if __name__ == "__main__":
    main()
