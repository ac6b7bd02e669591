"""Explain the d=256 CPU anchor ratio with kernel-level measurements.

`tools/baseline_anchor.py` compares the torch reference step against this
repo's step on the SAME host CPU. That ratio is a statement about two CPU
backends — torch's MKL/oneDNN aten kernels vs XLA:CPU codegen — not about
the TPU design (BASELINE-ANCHOR.md). This tool measures the backends
directly on the anchor workload's dominant kernels, single-threaded, so the
anchor paragraph cites numbers instead of speculation:

  * the LM-head GEMM (B·S, d) @ (d, V) — the largest single matmul in the
    d=256 step (105 GFLOP fwd at B=4, S=1024, V=50257);
  * a representative FFN GEMM (B·S, d) @ (d, 683);
  * the dense (no-Mosaic-on-CPU) attention score GEMM (B·h, S, dh)@(dh, S);
  * an elementwise softmax+sigmoid chain (VPU-style work — XLA fuses,
    aten dispatches per-op).

Usage: python tools/anchor_gemm_cpu.py [--json results/anchor_gemm_cpu.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single-threaded on both sides (the anchor host exposes 1 core; pin anyway
# so the artifact is reproducible on bigger hosts)
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")
os.environ.setdefault("XLA_FLAGS", "--xla_cpu_multi_thread_eigen=false "
                      "intra_op_parallelism_threads=1")


def _best(fn, n=5):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import numpy as np
    import torch
    torch.set_num_threads(1)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cases = {
        # name: (M, K, N)
        "lm_head_4096x256x50257": (4096, 256, 50257),
        "ffn_4096x256x683": (4096, 256, 683),
        "attn_scores_1024x64x1024": (1024, 64, 1024),
    }
    out = {"host_cpus": os.cpu_count(), "torch_threads": torch.get_num_threads()}
    for name, (m, k, n) in cases.items():
        a = rng.standard_normal((m, k)).astype(np.float32)
        b = rng.standard_normal((k, n)).astype(np.float32)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        t_torch = _best(lambda: torch.mm(ta, tb))
        ja, jb = jnp.asarray(a), jnp.asarray(b)
        f = jax.jit(lambda x, y: x @ y)
        np.asarray(f(ja, jb))  # compile
        t_jax = _best(lambda: np.asarray(f(ja, jb)))
        gflop = 2 * m * k * n / 1e9
        out[name] = {
            "gflop": round(gflop, 1),
            "torch_ms": round(t_torch * 1e3, 2),
            "jax_cpu_ms": round(t_jax * 1e3, 2),
            "torch_gflops": round(gflop / t_torch, 1),
            "jax_cpu_gflops": round(gflop / t_jax, 1),
            "jax_over_torch": round(t_jax / t_torch, 2),
        }
        print(name, out[name], flush=True)

    # elementwise chain: softmax over (32, 1024, 1024) + sigmoid — the shape
    # of the dense-attention probabilities in the d=256 anchor step
    x = rng.standard_normal((32, 1024, 1024)).astype(np.float32)
    tx = torch.from_numpy(x)
    t_torch = _best(lambda: torch.sigmoid(torch.softmax(tx, dim=-1)))
    jx = jnp.asarray(x)
    g = jax.jit(lambda v: jax.nn.sigmoid(jax.nn.softmax(v, axis=-1)))
    np.asarray(g(jx))
    t_jax = _best(lambda: np.asarray(g(jx)))
    out["softmax_sigmoid_32x1024x1024"] = {
        "torch_ms": round(t_torch * 1e3, 2),
        "jax_cpu_ms": round(t_jax * 1e3, 2),
        "jax_over_torch": round(t_jax / t_torch, 2),
    }
    print("softmax_sigmoid", out["softmax_sigmoid_32x1024x1024"], flush=True)

    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
