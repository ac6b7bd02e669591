"""Train a real full-size checkpoint on the synthetic corpus and publish
detection / perplexity metrics against BASELINE.md's evaluation protocol.

The reference's Etherscan CSV is private, so a like-for-like rerun is
impossible; this drives the EXACT same pipeline (GAN + augmentation training
→ best-checkpoint restore → per-type-threshold comprehensive eval → JSON) on
the hermetic synthetic corpus with known vulnerable lines (data/synthetic.py).

Usage:
    python tools/train_synthetic.py --contracts 200 --epochs 30 \
        --out /tmp/sct_run
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--contracts", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--out", default="/tmp/sct_run")
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--d-model", type=int, default=768,
                    help="shrink for smoke runs (full-size parity: 768)")
    ap.add_argument("--layers", type=int, default=6,
                    help="encoder/decoder layer count (parity: 6)")
    ap.add_argument("--no-aug", action="store_true")
    ap.add_argument("--max-eval", type=int, default=None)
    ap.add_argument("--corpus-v2", action="store_true",
                    help="de-saturated benchmark: train on ONE template "
                         "family (+ near-miss distractors), validate "
                         "in-family, evaluate on every DISJOINT family — "
                         "measures template generalization (VERDICT r3 "
                         "item 3, r4 item 5)")
    ap.add_argument("--train-family", type=int, default=0,
                    help="corpus-v2 training family (0 or 1; family 2 is "
                         "reserved as the never-trained matrix column)")
    ap.add_argument("--eval-contracts", type=int, default=None,
                    help="held-out per-family corpus size (corpus-v2 only; "
                         "default contracts//5)")
    ap.add_argument("--patience", type=int, default=None,
                    help="early-stop patience override (default: reference "
                         "parity, 24)")
    ap.add_argument("--model-select", default="gen_loss",
                    choices=["gen_loss", "detection"],
                    help="validation signal for best-checkpoint/early-stop/"
                         "plateau (TrainConfig.model_select)")
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import jax
    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.dataset import create_dataloaders
    from sct_gan_tpu.data.synthetic import write_corpus_csv
    from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh
    from sct_gan_tpu.train import SmartContractTrainer

    os.makedirs(args.out, exist_ok=True)
    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq,
                      d_model=args.d_model,
                      dim_feedforward=(2048 if args.d_model == 768
                                       else args.d_model * 8 // 3),
                      num_encoder_layers=args.layers,
                      num_decoder_layers=args.layers)
    tok = NativeSolidityTokenizer(vocab_size=cfg.vocab_size)
    print(f"native tokenizer: {tok.native_active}", flush=True)

    test_loaders = {}
    if args.corpus_v2:
        from sct_gan_tpu.data.dataset import (
            ArrayDataLoader, SmartContractVulnerabilityDataset)
        from sct_gan_tpu.data.synthetic import _FAMILIES, generate_corpus
        fam = args.train_family
        n_eval = args.eval_contracts or max(args.contracts // 5, 20)
        n_val = max(args.contracts // 10, 16)
        # model selection (early stop / best checkpoint) uses an
        # IN-distribution same-family val split; the held-out disjoint-family
        # corpora are pure TEST sets never touched during training
        train_recs = generate_corpus(args.contracts, seed=0, family=fam,
                                     distractors=True)
        val_recs = generate_corpus(n_val, seed=777, family=fam,
                                   distractors=True)
        mk = lambda recs: SmartContractVulnerabilityDataset(
            records=recs, tokenizer=tok, max_length=args.seq)
        train_loader = ArrayDataLoader(mk(train_recs),
                                       batch_size=args.batch_size,
                                       shuffle=True, seed=0)
        val_loader = ArrayDataLoader(mk(val_recs),
                                     batch_size=args.batch_size)
        # one eval column per family: in-family uses FRESH contracts (same
        # templates, unseen instances); the others are template-held-out
        for f in sorted(_FAMILIES):
            test_recs = generate_corpus(n_eval, seed=10**6 + f, family=f,
                                        distractors=True)
            test_loaders[f"fam{f}"] = ArrayDataLoader(
                mk(test_recs), batch_size=args.batch_size)
        print(f"corpus v2: {args.contracts} train + {n_val} val (family "
              f"{fam} + distractors), {n_eval}-contract TEST per family "
              f"{sorted(_FAMILIES)}", flush=True)
    else:
        csv_path = os.path.join(args.out, "corpus.csv")
        write_corpus_csv(csv_path, n=args.contracts, seed=0)
        print(f"corpus: {args.contracts} contracts -> {csv_path}", flush=True)
        train_loader, val_loader = create_dataloaders(
            csv_path, tokenizer=tok, batch_size=args.batch_size,
            max_length=args.seq)
    model = SmartContractTransformer(cfg)
    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    trainer = SmartContractTrainer(
        model, train_loader, val_loader, tok,
        config=TrainConfig(learning_rate=args.lr, use_gan=True,
                           use_augmentation=not args.no_aug,
                           warmup_epochs=5, line_lr_max=5e-4,
                           model_select=args.model_select,
                           **({"patience": args.patience}
                              if args.patience is not None else {}),
                           # remote-tunnel D2H makes every save minutes-long;
                           # this run only needs the (params-only) best
                           latest_every=10**9),
        mesh=mesh, verbose=True)

    ckpt_dir = os.path.join(args.out, "checkpoints")
    t0 = time.time()
    history = trainer.train(args.epochs, checkpoint_dir=ckpt_dir)
    train_secs = time.time() - t0
    print(f"training done in {train_secs/60:.1f} min", flush=True)

    # -- best checkpoint -> comprehensive eval ------------------------------
    import glob
    bests = sorted((p for p in glob.glob(os.path.join(ckpt_dir, "best_model*"))
                    if not p.endswith(".meta.json")),
                   key=os.path.getmtime)
    ckpt = bests[-1] if bests else os.path.join(
        ckpt_dir, "latest_model_augmented_gan")
    print(f"evaluating checkpoint {ckpt}", flush=True)

    from sct_gan_tpu.evals.harness import (BASELINE_CONTRACT_THRESHOLDS,
                                           BASELINE_LINE_THRESHOLDS,
                                           evaluate_model_performance,
                                           print_evaluation_summary)
    from sct_gan_tpu.infer.analyzer import SmartContractAnalyzer

    analyzer = SmartContractAnalyzer(model_path=ckpt, use_gan=True,
                                     tokenizer=tok, model_config=cfg,
                                     verbose=False)
    matrix = {}
    if test_loaders:
        results = None
        for name, loader in test_loaders.items():
            print(f"-- evaluating column {name} --", flush=True)
            res = evaluate_model_performance(
                model_path=ckpt, val_dataloader=loader,
                contract_thresholds=BASELINE_CONTRACT_THRESHOLDS,
                line_thresholds=BASELINE_LINE_THRESHOLDS,
                max_contracts=args.max_eval,
                output_file=os.path.join(args.out,
                                         f"evaluation_{name}.json"),
                analyzer=analyzer)
            print_evaluation_summary(res)
            matrix[name] = {
                "contract_overall": res["contract_level"]["overall"],
                "line_overall": res["line_level"]["overall"],
                "contract_per_type": {
                    vt: d.get("pr_auc")
                    for vt, d in res["contract_level"]
                    .get("per_vulnerability", {}).items()},
                "line_per_type": {
                    vt: d.get("pr_auc")
                    for vt, d in res["line_level"]
                    .get("per_vulnerability", {}).items()},
            }
            if results is None or name == f"fam{1 - args.train_family}":
                results = res   # headline column: the opposite family
    else:
        results = evaluate_model_performance(
            model_path=ckpt, val_dataloader=val_loader,
            contract_thresholds=BASELINE_CONTRACT_THRESHOLDS,
            line_thresholds=BASELINE_LINE_THRESHOLDS,
            max_contracts=args.max_eval,
            output_file=os.path.join(args.out, "evaluation_results.json"),
            analyzer=analyzer)
        print_evaluation_summary(results)

    # -- teacher-forced perplexity ------------------------------------------
    from sct_gan_tpu.evals.perplexity import compute_perplexity
    ppl = compute_perplexity(analyzer.model, analyzer.params, val_loader)
    print(f"validation perplexity: {ppl['perplexity']:.2f} "
          f"(CE {ppl['cross_entropy']:.3f})", flush=True)

    summary = {
        "contracts": args.contracts,
        "train_family": args.train_family if args.corpus_v2 else None,
        "epochs_requested": args.epochs,
        "epochs_run": len(history["train_loss"]),
        "train_minutes": round(train_secs / 60, 2),
        "final_train_loss": history["train_loss"][-1],
        "best_val_loss": min(history["val_loss"]),
        "perplexity": ppl,
        "contract_overall": results["contract_level"]["overall"],
        "line_overall": results["line_level"]["overall"],
        "matrix": matrix or None,
        "checkpoint": ckpt,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
