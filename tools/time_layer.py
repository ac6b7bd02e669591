"""Per-layer cost anatomy: one encoder layer fwd+bwd under variants.

The encoder stage measures 30.6 ms fwd+bwd for ~3.1 TF of matmul work —
~11 ms at this chip's achievable 284 TFLOPS (tools/peak_matmul.py). This
tool times a 12-layer stack of identical encoder layers (amortizing
dispatch) as ONE jit program per variant, isolating: attention dropout,
Pallas FastDropout sites, flash vs dense attention, and the pure-matmul
floor (same matmul shapes, no attention/LN/dropout).

Usage: python tools/time_layer.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant subset")
    args = ap.parse_args()
    only = {x for x in args.only.split(",") if x}

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from sct_gan_tpu.models.layers import TransformerEncoderStack

    B, S, D, H, F, NL = 8, 1024, 768, 8, 2048, 12

    def null_fetch():
        tiny = jnp.zeros((8,))
        null = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(tiny + i)
            null = min(null, time.perf_counter() - t0)
        return null

    x = jnp.ones((B, S, D), jnp.bfloat16)
    mask = jnp.ones((B, S), bool)

    def time_grad(make_apply, params):
        loss = lambda p, key: make_apply(p, key).astype(jnp.float32).mean()
        g = jax.jit(jax.grad(loss))
        key = jax.random.PRNGKey(0)
        gr = g(params, key)
        leaf = jax.tree_util.tree_leaves(gr)[0]
        _ = np.asarray(leaf.ravel()[:1])
        null = null_fetch()
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            gr = g(params, jax.random.PRNGKey(rep))
            leaf = jax.tree_util.tree_leaves(gr)[0]
            _ = np.asarray(leaf.ravel()[:1])
            best = min(best, time.perf_counter() - t0 - null)
        return best / NL   # per layer

    def stack_variant(dropout, use_flash):
        m = TransformerEncoderStack(NL, D, H, F, dropout,
                                    dtype=jnp.bfloat16, use_flash=use_flash,
                                    pad_heads=True)
        params = m.init({"params": jax.random.PRNGKey(0)}, x,
                        key_padding_mask=mask, deterministic=True)["params"]
        deterministic = dropout == 0.0
        def apply(p, key):
            kw = {} if deterministic else {"rngs": {"dropout": key}}
            return m.apply({"params": p}, x, key_padding_mask=mask,
                           deterministic=deterministic, **kw)
        return apply, params

    results = {}
    for name, (dropout, flash) in {
        "drop0.3+flash": (0.3, True),
        "drop0.0+flash": (0.0, True),
        "drop0.0+dense": (0.0, False),
    }.items():
        if only and name not in only:
            continue
        apply, params = stack_variant(dropout, flash)
        ms = time_grad(apply, params) * 1e3
        results[name] = ms
        print(f"{name:16s} {ms:6.2f} ms/layer fwd+bwd", flush=True)

    # GELU cost probe: tanh-approximate GELU is within bf16 rounding of the
    # exact erf form; if erf is a measurable VPU cost this shows it.
    if not only or "tanhgelu" in only:
        import sct_gan_tpu.models.layers as L
        orig_gelu = L.gelu
        try:
            L.gelu = lambda x: jax.nn.gelu(x, approximate=True)
            apply, params = stack_variant(0.0, True)
            ms = time_grad(apply, params) * 1e3
            print(f"{'drop0+flash+tanh':16s} {ms:6.2f} ms/layer fwd+bwd",
                  flush=True)
        finally:
            L.gelu = orig_gelu

    # pure-matmul floor: same matmul shapes as one layer (qkvo + ffn), no
    # attention/LN/dropout — what the MXU alone would cost
    class MatmulFloor(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(4):    # q, k, v, out (768->1024 padded)
                x = nn.Dense(1024 if i < 3 else D, dtype=jnp.bfloat16,
                             name=f"p{i}")(x[..., :D])
            h = nn.Dense(F, dtype=jnp.bfloat16, name="ffn1")(x)
            x = nn.Dense(D, dtype=jnp.bfloat16, name="ffn2")(h)
            return x

    class FloorStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(NL):
                x = MatmulFloor(name=f"l{i}")(x)
            return x

    m = FloorStack()
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    apply = lambda p, key: m.apply({"params": p}, x)
    ms = time_grad(apply, params) * 1e3
    print(f"{'matmul floor':16s} {ms:6.2f} ms/layer fwd+bwd", flush=True)


if __name__ == "__main__":
    main()
