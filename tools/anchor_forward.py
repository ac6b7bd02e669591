"""Forward-only CPU anchor at FULL shape: the reference's model.forward
(with its per-line Python loop, SCT-GAN/model.py:494-611, executed inside
EVERY forward) vs this framework's jitted forward, same machine, d=768,
B=2, L=1024, GAN heads on, no grad either side.

Complements tools/baseline_anchor.py (train-step anchor at d=256): the
forward is where the reference's Python-loop cost lives, so this isolates
it at the real model size where a torch-CPU train step is impractical to
iterate.

Usage: python tools/anchor_forward.py [--reps 3] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baseline_anchor import load_ref  # noqa: E402  (same ref-import recipe)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    import numpy as np

    b, s, vocab = args.batch, 1024, 8192
    rng = np.random.default_rng(0)
    ids = rng.integers(4, vocab, (b, s)).astype(np.int64)
    mask = np.ones((b, s), np.int64)
    t2l = np.minimum(np.arange(s, dtype=np.int64) // 6, s - 1)
    t2l = np.tile(t2l, (b, 1))

    out = {"d_model": args.d_model, "batch": b, "seq": s}

    # -- reference (torch CPU) ------------------------------------------------
    import torch
    ref_model_mod = load_ref("sctgan_ref_model", "model.py")
    orig_device = torch.device
    torch.device = lambda *a, **kw: orig_device("cpu")
    try:
        model = ref_model_mod.SmartContractTransformer(
            d_model=args.d_model, nhead=8, num_encoder_layers=6,
            num_decoder_layers=6, dim_feedforward=2048, dropout=0.3,
            max_length=s, vocab_size=vocab, num_vulnerability_types=8,
            use_gan=True).eval()
        tids = torch.from_numpy(ids)
        tmask = torch.from_numpy(mask)
        tt2l = torch.from_numpy(t2l)
        times = []
        with torch.no_grad():
            for _ in range(args.reps):
                t0 = time.perf_counter()
                model(input_ids=tids, attention_mask=tmask,
                      ast_input_ids=tids, ast_attention_mask=tmask,
                      target_ids=tids, token_to_line=tt2l)
                times.append(time.perf_counter() - t0)
        out["ref_forward_s"] = statistics.median(times)
        print(f"[ref] forward: {out['ref_forward_s']:.2f} s "
              f"(all: {['%.2f' % t for t in times]})", file=sys.stderr)
        del model
    finally:
        torch.device = orig_device

    # -- mine (jax CPU) -------------------------------------------------------
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    cfg = ModelConfig(d_model=args.d_model, nhead=8, num_encoder_layers=6,
                      num_decoder_layers=6, dim_feedforward=2048, dropout=0.3,
                      max_length=s, max_lines=s, vocab_size=vocab,
                      use_gan=True, compute_dtype="float32",
                      use_flash_attention=False)
    jmodel = SmartContractTransformer(cfg)
    jids = jnp.asarray(ids, jnp.int32)
    jmask = jnp.asarray(mask, jnp.int32)
    jt2l = jnp.asarray(t2l, jnp.int32)
    params = jmodel.init({"params": jax.random.PRNGKey(0)}, jids, jmask,
                         jids, jmask, target_ids=jids, token_to_line=jt2l,
                         deterministic=True)["params"]

    @jax.jit
    def fwd(p):
        return jmodel.apply({"params": p}, jids, jmask, jids, jmask,
                            target_ids=jids, token_to_line=jt2l,
                            deterministic=True)["logits"]

    _ = np.asarray(fwd(params))   # compile
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        _ = np.asarray(fwd(params))
        times.append(time.perf_counter() - t0)
    out["mine_forward_s"] = statistics.median(times)
    print(f"[mine] forward: {out['mine_forward_s']:.2f} s "
          f"(all: {['%.2f' % t for t in times]})", file=sys.stderr)
    out["speedup_same_cpu"] = round(
        out["ref_forward_s"] / out["mine_forward_s"], 2)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
