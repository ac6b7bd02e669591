"""Hunt for non-finite loss components on a corpus, batch by batch.

Replays the training forward + loss mix (no optimizer) over augmented batches
of a corpus CSV and reports per-component finiteness, min/max logits, and the
offending batch index. Runs on CPU by default so it can execute while the TPU
is busy training.

Usage:
    python tools/debug_nan_batch.py --csv /tmp/sct_run_big/corpus.csv \
        --epochs 3 [--full-size] [--backward]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--epochs", type=int, default=3,
                    help="augmentation re-rolls per dataset pass")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--full-size", action="store_true",
                    help="reference-size model (slow on CPU)")
    ap.add_argument("--backward", action="store_true",
                    help="also check gradient finiteness")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.dataset import create_dataloaders
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh
    from sct_gan_tpu.train import SmartContractTrainer
    from sct_gan_tpu.train.train_step import compute_losses

    if args.full_size:
        cfg = ModelConfig(use_gan=True, max_length=args.seq,
                          max_lines=args.seq)
    else:
        cfg = ModelConfig(d_model=128, nhead=4, num_encoder_layers=2,
                          num_decoder_layers=2, dim_feedforward=256,
                          max_length=args.seq, max_lines=args.seq,
                          use_gan=True)
    print("building dataset...", flush=True)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    train_loader, _ = create_dataloaders(args.csv, tokenizer=tok,
                                         batch_size=args.batch_size,
                                         max_length=args.seq)
    print("dataset ready; building trainer...", flush=True)
    model = SmartContractTransformer(cfg)
    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    trainer = SmartContractTrainer(
        model, train_loader, train_loader, tok,
        config=TrainConfig(learning_rate=5e-5, use_gan=True,
                           use_augmentation=True, warmup_epochs=5),
        mesh=mesh, verbose=False)

    print("trainer ready; starting batch loop", flush=True)
    tables = trainer.syntax_tables

    def loss_fn(params, batch, rng):
        total, (metrics, _, _, _) = compute_losses(
            model, params, batch, trainer._scalars(1.0), rng,
            use_gan=True, use_augmentation=True, tables=tables,
            deterministic=False)
        return total, metrics

    if args.backward:
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    else:
        fwd = jax.jit(loss_fn)

    import optax
    bad = 0
    for epoch in range(args.epochs):
        for i, batch in enumerate(train_loader):
            batch = trainer._create_augmented_batch(batch)
            batch = trainer._pad_to_dp(batch)
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if isinstance(v, np.ndarray)}
            rng = jax.random.PRNGKey(epoch * 1000 + i)
            if args.backward:
                (total, metrics), grads = grad_fn(trainer.state.params, dev,
                                                  rng)
                gnorm = float(optax.global_norm(grads))
            else:
                total, metrics = fwd(trainer.state.params, dev, rng)
                gnorm = float("nan")
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            bad_keys = [k for k, v in metrics.items()
                        if not np.isfinite(v)]
            tag = "OK " if not bad_keys else "BAD"
            print(f"[{tag}] epoch {epoch} batch {i}: total="
                  f"{metrics['total_loss']:.4f} gnorm={gnorm:.1f} "
                  + (f"NONFINITE: {bad_keys} | all={metrics}" if bad_keys
                     else ""), flush=True)
            if bad_keys:
                bad += 1
                np.savez(f"/tmp/nan_batch_e{epoch}_b{i}.npz", **batch)
                print(f"  batch saved to /tmp/nan_batch_e{epoch}_b{i}.npz",
                      flush=True)
    print(f"done: {bad} non-finite batches", flush=True)


if __name__ == "__main__":
    main()
