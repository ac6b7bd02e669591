"""CPU-vs-CPU anchor: the reference's OWN train step (torch) vs this
framework's fused step (JAX), same machine, same model size, same data shape.

BENCH_r*.json's ``vs_baseline`` compares against a naive JAX port on the TPU;
this tool adds the like-for-like anchor VERDICT r3 asked for: the reference's
`SmartContractTrainer.train_epoch` (SCT-GAN/train.py:868-1344 — including its
per-token Python line loop in the spatial loss, the doubled syntax-penalty
scan, and the per-line Python loop inside model.forward, model.py:494-759)
timed per batch on torch-CPU, against this repo's `SmartContractTrainer`
stepped on the SAME CPU through a 1-device mesh.

The reference hard-codes CUDA (`torch.device(f'cuda:{gpu_id}')`,
train.py:495) and 1024-wide shapes (model.py:737, train.py:699), so the
device constructor is patched to CPU for the run and the shape is fixed at
L=1024 with a reduced d_model (default 256) to keep a torch-CPU step in
seconds. The reference's dataset.py emits no contract_vulnerabilities (the
notebook adds them); the wrapper loader derives them the notebook way
(any vulnerable line of that type → 1).

Usage: python tools/baseline_anchor.py [--d-model 256] [--batch 2]
       [--contracts 6] [--epochs 2] [--json out.json]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import statistics
import sys
import time
import typing

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/SCT-GAN"


def load_ref(name: str, filename: str):
    if name in sys.modules:
        return sys.modules[name]
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, filename))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    mod.__dict__["Any"] = typing.Any     # dataset.py's missing import
    spec.loader.exec_module(mod)
    return mod


class _CpuLoader:
    """Wrap a torch DataLoader: move nothing, add contract_vulnerabilities
    (notebook recipe: 1 iff any line of that type is marked)."""

    def __init__(self, loader):
        self.loader = loader

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import torch
        for batch in self.loader:
            vl = batch["vulnerable_lines"]              # (B, 8, L)
            batch = dict(batch)
            batch["contract_vulnerabilities"] = (
                vl.sum(dim=-1) > 0).to(torch.long)
            yield batch


def time_reference(args, tok, records) -> dict:
    import pandas as pd
    import torch
    from torch.utils.data import DataLoader

    ref_dataset = load_ref("sctgan_ref_dataset", "dataset.py")
    ref_train = load_ref("sctgan_ref_train", "train.py")
    ref_model_mod = load_ref("sctgan_ref_model", "model.py")

    csv = "/tmp/anchor_corpus.csv"
    pd.DataFrame(records).to_csv(csv, index=False)

    ds = ref_dataset.SmartContractVulnerabilityDataset(
        csv, tok, max_length=1024, split="train")
    loader = _CpuLoader(DataLoader(ds, batch_size=args.batch, shuffle=False,
                                   collate_fn=ref_dataset.custom_collate_fn))

    model = ref_model_mod.SmartContractTransformer(
        d_model=args.d_model, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=args.d_model * 8 // 3,
        dropout=0.3, max_length=1024, vocab_size=tok.vocab_size,
        num_vulnerability_types=8, use_gan=args.gan)

    # the reference hard-codes cuda:<id>; patch the constructor to CPU.
    # It also passes ReduceLROnPlateau(verbose=...), removed in torch>=2.2 —
    # strip that kwarg.
    orig_device = torch.device
    orig_plateau = torch.optim.lr_scheduler.ReduceLROnPlateau

    class _Plateau(orig_plateau):
        def __init__(self, *a, verbose=None, **kw):
            super().__init__(*a, **kw)

    torch.device = lambda *a, **kw: orig_device("cpu")
    torch.optim.lr_scheduler.ReduceLROnPlateau = _Plateau
    try:
        trainer = ref_train.SmartContractTrainer(
            model, loader, loader, tok, learning_rate=1e-5,
            d_model=args.d_model, use_augmentation=False, use_gan=args.gan)
        times = []
        for epoch in range(args.epochs):
            t_batches = []
            it = iter(trainer.train_dataloader)
            # time batch-by-batch by driving train_epoch once per epoch and
            # measuring wall around it; per-batch = epoch_wall / n_batches
            t0 = time.perf_counter()
            trainer.train_epoch(epoch)
            wall = time.perf_counter() - t0
            del it, t_batches
            times.append(wall / len(loader))
            print(f"[ref] epoch {epoch}: {wall:.1f}s "
                  f"({wall / len(loader):.2f} s/batch)", file=sys.stderr)
        per_batch = min(times[1:]) if len(times) > 1 else times[0]
    finally:
        torch.device = orig_device
        torch.optim.lr_scheduler.ReduceLROnPlateau = orig_plateau
    return {"ref_s_per_batch": per_batch}


def time_mine(args, tok_vocab: int) -> dict:
    import numpy as np
    os.environ.setdefault("XLA_FLAGS", "")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh, shard_batch
    from sct_gan_tpu.train import SmartContractTrainer

    cfg = ModelConfig(d_model=args.d_model, nhead=8, num_encoder_layers=6,
                      num_decoder_layers=6,
                      dim_feedforward=args.d_model * 8 // 3,
                      dropout=0.3, max_length=1024, max_lines=1024,
                      vocab_size=tok_vocab, use_gan=args.gan,
                      compute_dtype="float32",     # CPU: bf16 is emulated
                      use_flash_attention=False)   # CPU: no Mosaic
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)

    class _Empty:
        def __iter__(self):
            return iter(())

    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    trainer = SmartContractTrainer(
        model := SmartContractTransformer(cfg), _Empty(), _Empty(), tok,
        config=TrainConfig(learning_rate=1e-5, use_gan=args.gan,
                           warmup_epochs=1),
        mesh=mesh, verbose=False)
    del model

    rng = np.random.default_rng(0)
    b, s = args.batch, 1024
    lines = np.minimum(np.arange(s, dtype=np.int32) // 6, s - 1)
    batch = {
        "input_ids": rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32),
        "attention_mask": np.ones((b, s), np.int32),
        "ast_input_ids": rng.integers(0, cfg.vocab_size,
                                      (b, s)).astype(np.int32),
        "ast_attention_mask": np.ones((b, s), np.int32),
        "token_to_line": np.tile(lines, (b, 1)),
        "vulnerable_lines": (rng.random((b, 8, s)) < 0.01).astype(np.int32),
        "contract_vulnerabilities": rng.integers(0, 2, (b, 8)).astype(np.int32),
    }
    device_batch = shard_batch(batch, trainer.mesh)
    scalars = trainer._scalars(1.0)
    lrs = trainer._group_lrs()
    state = trainer.state
    key = jax.random.PRNGKey(0)

    def step(state, i):
        return trainer.train_step(state, device_batch, scalars, lrs,
                                  jax.random.fold_in(key, i))

    state, metrics, _ = step(state, 0)    # compile
    _ = np.asarray(metrics["total_loss"])
    times = []
    for i in range(1, args.steps + 1):
        t0 = time.perf_counter()
        state, metrics, _ = step(state, i)
        _ = np.asarray(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
    print(f"[mine] steps: {['%.3f' % t for t in times]}", file=sys.stderr)
    return {"mine_s_per_batch": statistics.median(times)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--contracts", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--gan", action="store_true", default=False)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-mine", action="store_true")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    from sct_gan_tpu.data.synthetic import generate_corpus
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    tok = SolidityTokenizer(vocab_size=8192)
    records = generate_corpus(n=args.contracts, seed=5)

    out = {"d_model": args.d_model, "batch": args.batch, "seq": 1024,
           "gan": args.gan, "host_cpus": os.cpu_count()}
    if not args.skip_mine:
        out.update(time_mine(args, tok.vocab_size))
    if not args.skip_ref:
        out.update(time_reference(args, tok, records))
    if "ref_s_per_batch" in out and "mine_s_per_batch" in out:
        out["speedup_same_cpu"] = round(
            out["ref_s_per_batch"] / out["mine_s_per_batch"], 2)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
