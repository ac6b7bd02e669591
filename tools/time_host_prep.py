"""Measure the host-side per-epoch prep cost (augmentation + tokenization).

The reference re-runs its regex transforms and re-tokenizes every contract
every epoch (SCT-GAN/train.py:774-866); at corpus scale this made epochs
~48x device time (round-2 incident). This tool times ONLY the host path —
the trainer's prepare() (augmented batch + static pad) over full epochs,
no device in the loop — for the banked (TrainConfig.aug_bank_size>0) and
reference-parity (0) paths.

Usage:  JAX_PLATFORMS=cpu python tools/time_host_prep.py --contracts 500
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contracts", type=int, default=500)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/sct_hostprep")
    args = ap.parse_args()

    import jax
    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.dataset import create_dataloaders
    from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
    from sct_gan_tpu.data.synthetic import write_corpus_csv
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh
    from sct_gan_tpu.train import SmartContractTrainer

    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, "corpus.csv")
    write_corpus_csv(csv_path, n=args.contracts, seed=0)

    tok = NativeSolidityTokenizer()
    print(f"native tokenizer: {tok.native_active}")
    t0 = time.time()
    train_loader, val_loader = create_dataloaders(
        csv_path, tokenizer=tok, batch_size=args.batch_size,
        max_length=args.seq)
    print(f"dataset build: {time.time()-t0:.1f}s "
          f"({len(train_loader.dataset)} train contracts)")

    # tiny model: host prep cost is independent of model size
    mcfg = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                      num_decoder_layers=1, dim_feedforward=64,
                      max_length=args.seq, max_lines=args.seq, use_gan=True,
                      use_flash_attention=False, compute_dtype="float32")
    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])

    for bank in (getattr(TrainConfig, "aug_bank_size", 6), 0):
        trainer = SmartContractTrainer(
            SmartContractTransformer(mcfg), train_loader, val_loader, tok,
            config=TrainConfig(use_gan=True, use_augmentation=True,
                               aug_bank_size=bank),
            mesh=mesh, verbose=False)

        def prepare(batch):
            batch = trainer._create_augmented_batch(batch)
            return trainer._pad_to_dp(batch)

        label = f"aug_bank_size={bank}"
        for epoch in range(args.epochs):
            t0 = time.time()
            nb = 0
            for batch in train_loader:
                prepare(batch)
                nb += 1
            dt = time.time() - t0
            print(f"{label}: epoch {epoch}: {dt:.2f}s host prep "
                  f"({nb} batches, {dt/nb*1e3:.0f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
