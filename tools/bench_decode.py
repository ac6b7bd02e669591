"""Serving-side benchmark: KV-cached autoregressive generation throughput.

Measures full-contract synthesis (encode once + 1023 cached decode steps,
temperature/top-k/top-p sampling, syntax boost) in contracts/sec and decoded
tokens/sec on the real chip — the path the reference runs with NO KV cache,
re-decoding the whole prefix every step (SCT-GAN/model.py:862-930, O(L³)).

Prints one JSON line with both rates. Not the driver bench (bench.py is);
results are recorded in STATUS.md.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.infer.generate import make_generate_fn
    from sct_gan_tpu.losses.syntax import SyntaxLossTables
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = ModelConfig(use_gan=True)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    model = SmartContractTransformer(cfg)
    tables = SyntaxLossTables.from_tokenizer(tok)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, cfg.max_length),
                                   dtype=np.int32))
    mask = jnp.ones((batch, cfg.max_length), jnp.int32)

    log("init params...")
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, ids,
                        mask, target_ids=ids,
                        token_to_line=jnp.zeros_like(ids),
                        deterministic=True)["params"]

    encode = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, i, m, deterministic=True, method=model.encode))
    generate = make_generate_fn(model, tables, min_length=10**9)  # no early
    # stop: every sequence decodes all 1023 steps → stable, worst-case rate

    log("compile + warmup...")
    memory = encode(params, ids, mask)
    toks = generate(params, memory, mask.astype(bool),
                    jax.random.key(0, impl="rbg"), 0.7)
    _ = np.asarray(toks[0, -1])  # D2H barrier (tunnel-safe)

    log("timing...")

    def run(n, seed0):
        t0 = time.perf_counter()
        last = None
        for i in range(n):
            memory = encode(params, ids, mask)
            last = generate(params, memory, mask.astype(bool),
                            jax.random.key(seed0 + i, impl="rbg"), 0.7)
        _ = np.asarray(last[:, -1])
        return time.perf_counter() - t0

    # differential timing: constant dispatch/D2H overheads cancel
    t_small = run(1, 100)
    t_large = run(3, 200)
    per_round = max((t_large - t_small) / 2, 1e-9)
    dec_tokens = batch * (cfg.max_length - 1)
    print(json.dumps({
        "metric": "generation_throughput",
        "contracts_per_sec": round(batch / per_round, 3),
        "decode_tokens_per_sec": round(dec_tokens / per_round, 1),
        "batch": batch,
        "seq": cfg.max_length,
        "seconds_per_batch": round(per_round, 3),
    }))


if __name__ == "__main__":
    main()
