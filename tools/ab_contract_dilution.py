"""A/B: does padding dilution explain the contract-head ranking failure?

The contract head mean-pools over ALL max_length positions, padding included
(SCT-GAN/model.py:462-466 — a kept parity quirk). The reference's corpus is
pre-filtered to 2048-token contracts, so at max_length=1024 its pooled
feature sees ~0% padding; round-2's synthetic corpus averaged ~170 tokens →
~83% padding. This trains the SAME tiny recipe on a short corpus (~33% fill
at L=512) vs a window-filling corpus (~95% fill) and compares contract-level
PR-AUC/ROC-AUC on the validation split.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/ab_contract_dilution.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(label, csv_path, seq, epochs, batch_size):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sklearn.metrics import average_precision_score, roc_auc_score

    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.dataset import create_dataloaders
    from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh
    from sct_gan_tpu.train import SmartContractTrainer

    tok = NativeSolidityTokenizer()
    train_loader, val_loader = create_dataloaders(
        csv_path, tokenizer=tok, batch_size=batch_size, max_length=seq)
    mcfg = ModelConfig(d_model=128, nhead=4, num_encoder_layers=2,
                       num_decoder_layers=2, dim_feedforward=256,
                       max_length=seq, max_lines=seq, use_gan=False,
                       use_flash_attention=False, compute_dtype="float32")
    ndev = min(8, len(jax.devices()))
    mesh = make_mesh(dp=ndev, mp=1, devices=jax.devices()[:ndev])
    trainer = SmartContractTrainer(
        SmartContractTransformer(mcfg), train_loader, val_loader, tok,
        config=TrainConfig(learning_rate=5e-5, use_gan=False,
                           use_augmentation=False, latest_every=10**9,
                           patience=10**9),
        mesh=mesh, verbose=False)
    t0 = time.time()
    for epoch in range(epochs):
        m = trainer.train_epoch(epoch)
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(f"  [{label}] epoch {epoch}: gen {m['gen_loss']:.3f} "
                  f"contract {m['contract_vuln_loss']:.5f}", flush=True)

    # eval-mode contract probabilities over the val split
    @jax.jit
    def fwd(params, batch):
        out = trainer.model.apply(
            {"params": params}, batch["input_ids"], batch["attention_mask"],
            batch["ast_input_ids"], batch["ast_attention_mask"],
            target_ids=batch["input_ids"],
            token_to_line=batch["token_to_line"], deterministic=True)
        return jax.nn.sigmoid(out["contract_vulnerability_logits"])

    probs, labels = [], []
    for batch in val_loader:
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if not isinstance(v, list)}
        probs.append(np.asarray(fwd(trainer.state.params, dev)))
        labels.append(np.asarray(batch["contract_vulnerabilities"]))
    p = np.concatenate(probs).ravel()
    y = np.concatenate(labels).ravel()
    pr = average_precision_score(y, p)
    roc = roc_auc_score(y, p)
    print(f"  [{label}] contract PR-AUC {pr:.3f} ROC-AUC {roc:.3f} "
          f"(base rate {y.mean():.3f}; {time.time()-t0:.0f}s)", flush=True)
    return pr, roc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contracts", type=int, default=300)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--out", default="/tmp/sct_ab_dilution")
    args = ap.parse_args()

    from sct_gan_tpu.data.synthetic import write_corpus_csv
    os.makedirs(args.out, exist_ok=True)
    short_csv = os.path.join(args.out, "short.csv")
    long_csv = os.path.join(args.out, "long.csv")
    write_corpus_csv(short_csv, n=args.contracts, seed=0)
    write_corpus_csv(long_csv, n=args.contracts, seed=0,
                     target_tokens=(int(args.seq * 0.86),
                                    int(args.seq * 1.1)))

    print("arm A: short contracts (~33% window fill)")
    a = run_arm("short", short_csv, args.seq, args.epochs, args.batch_size)
    print("arm B: window-filling contracts (~95% fill)")
    b = run_arm("long", long_csv, args.seq, args.epochs, args.batch_size)
    print(f"RESULT short PR-AUC {a[0]:.3f} ROC {a[1]:.3f} | "
          f"long PR-AUC {b[0]:.3f} ROC {b[1]:.3f}")


if __name__ == "__main__":
    main()
