"""Per-module forward/backward attribution at full size, without XPlane.

XPlane tracing hangs on the tunneled runtime (round-2 incident), so this
times each model stage as its own jit program with the differential method
(chained data-dependent calls + one scalar fetch; block_until_ready is a
no-op here). Stages: encode (emb + 6L + ast/cross/fusion), contract head,
line head, teacher-forced decode + LM CE, discriminator. Each is also timed
under jax.grad to attribute the backward.

Usage: python tools/time_fwd_modules.py [--batch 8] [--seq 1024]
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
    ap.add_argument("--grad", action="store_true",
                    help="also time value_and_grad per stage")
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq,
                      compute_dtype="bfloat16")
    model = SmartContractTransformer(cfg)
    b = args.batch
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, cfg.max_length),
                                   np.int32))
    mask = jnp.ones((b, cfg.max_length), jnp.int32)
    lines = jnp.asarray(np.tile(np.minimum(
        np.arange(cfg.max_length, dtype=np.int32) // 6, cfg.max_length - 1),
        (b, 1)))
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, ids,
                        mask, target_ids=ids, token_to_line=lines,
                        deterministic=True)["params"]
    print("params initialized", flush=True)

    apply = lambda p, method, *a: model.apply({"params": p}, *a,
                                              method=method)

    def encode_fn(p):
        return apply(p, model.encode, ids, mask, ids, mask)

    memory = jax.jit(encode_fn)(p=params)

    def contract_fn(p):
        return apply(p, model.contract_head, memory)[0]

    def line_fn(p):
        return apply(p, model.line_head, memory, lines)

    def decode_fn(p):
        logits = apply(p, model.decode_teacher_forced, ids, memory,
                       mask.astype(bool))
        # CE folded in, as in the train step (bf16 logits path)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp[:, :-1], tgt[..., None], axis=-1)
        return nll.mean()

    def disc_fn(p):
        return apply(p, model.discriminator_forward, memory)

    def scalarize(out):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    stages = [("encode", encode_fn), ("contract_head", contract_fn),
              ("line_head", line_fn), ("decode+CE", decode_fn),
              ("discriminator", disc_fn)]

    def null_rpc():
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(jnp.zeros((8,)) + i)
            null = min(null, time.perf_counter() - t0)
        return null

    def time_fn(fn, n_small=4, n_large=44):
        # the tunnel's D2H round trip is ~25-50 ms with comparable variance;
        # 40 chained executions per measurement keep fast stages (<5 ms)
        # above the noise floor
        # chain data dependence through a scalar added to a dummy param leaf
        jfn = jax.jit(lambda p, c: scalarize(fn(
            jax.tree_util.tree_map(lambda x: x + 0.0 * c, p))))
        out = jfn(params, jnp.float32(0.0))   # compile
        _ = np.asarray(out)
        null = null_rpc()

        def run(n):
            c = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                c = jfn(params, c * 1e-30)
            _ = np.asarray(c)
            return time.perf_counter() - t0

        t1, t2 = run(n_small), run(n_large)
        return (t2 - t1) / (n_large - n_small)

    total = 0.0
    for name, fn in stages:
        dt = time_fn(fn)
        total += dt
        print(f"fwd {name:14s}: {dt*1e3:7.2f} ms", flush=True)
    print(f"fwd sum: {total*1e3:.2f} ms", flush=True)

    if args.grad:
        total = 0.0
        for name, fn in stages:
            gfn = lambda p: scalarize(fn(p))
            dt = time_fn(lambda p: jax.grad(gfn)(p))
            total += dt
            print(f"fwd+bwd {name:14s}: {dt*1e3:7.2f} ms", flush=True)
        print(f"fwd+bwd sum: {total*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
