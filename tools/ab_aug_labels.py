"""A/B: does the reference's augmented-batch label-by-index quirk starve the
contract head?

The reference's _create_augmented_batch samples its (original, variant)
pairs from a pool across ALL contracts in the batch, then assigns pair i the
labels of batch-slot i (SCT-GAN/train.py:829-839) — ~(B-1)/B of augmented
examples carry the wrong contract's labels. This trains the SAME tiny
recipe with augmentation ON under (a) the quirk (aug_label_correct=False)
and (b) source-correct labels, and compares contract-level PR-AUC/ROC-AUC.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/ab_aug_labels.py
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(label, csv_path, seq, epochs, batch_size, label_correct):
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
                       max_length=seq, max_lines=seq, use_gan=True,
                       use_flash_attention=False, compute_dtype="float32")
    ndev = min(8, len(jax.devices()))
    mesh = make_mesh(dp=ndev, mp=1, devices=jax.devices()[:ndev])
    trainer = SmartContractTrainer(
        SmartContractTransformer(mcfg), train_loader, val_loader, tok,
        config=TrainConfig(learning_rate=5e-5, use_gan=True,
                           use_augmentation=True,
                           aug_label_correct=label_correct,
                           latest_every=10**9, patience=10**9),
        mesh=mesh, verbose=False)
    t0 = time.time()
    for epoch in range(epochs):
        m = trainer.train_epoch(epoch)
        if epoch % 5 == 0 or epoch == epochs - 1:
            print(f"  [{label}] epoch {epoch}: gen {m['gen_loss']:.3f} "
                  f"contract {m['contract_vuln_loss']:.5f}", flush=True)

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
    ap.add_argument("--out", default="/tmp/sct_ab_auglabels")
    args = ap.parse_args()

    from sct_gan_tpu.data.synthetic import write_corpus_csv
    os.makedirs(args.out, exist_ok=True)
    csv_path = os.path.join(args.out, "corpus.csv")
    write_corpus_csv(csv_path, n=args.contracts, seed=0)

    print("arm A: reference label-by-index quirk (aug_label_correct=False)")
    a = run_arm("quirk", csv_path, args.seq, args.epochs, args.batch_size,
                False)
    print("arm B: source-correct labels (aug_label_correct=True)")
    b = run_arm("correct", csv_path, args.seq, args.epochs, args.batch_size,
                True)
    print(f"RESULT quirk PR-AUC {a[0]:.3f} ROC {a[1]:.3f} | "
          f"correct PR-AUC {b[0]:.3f} ROC {b[1]:.3f}")


if __name__ == "__main__":
    main()
