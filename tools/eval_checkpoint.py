"""Evaluate a trained checkpoint through the full reference protocol.

The eval tail of tools/train_synthetic.py as a standalone (restartable)
stage: best-checkpoint restore → per-type-threshold comprehensive eval →
perplexity → summary.json. Lets a finished training run be scored in a
fresh process without retraining.

Usage: python tools/eval_checkpoint.py --run /tmp/sct_run2k [--max-eval N]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="/tmp/sct_run2k")
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-eval", type=int, default=None)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.dataset import create_dataloaders
    from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
    from sct_gan_tpu.evals.harness import (BASELINE_CONTRACT_THRESHOLDS,
                                           BASELINE_LINE_THRESHOLDS,
                                           evaluate_model_performance,
                                           print_evaluation_summary)
    from sct_gan_tpu.infer.analyzer import SmartContractAnalyzer

    csv_path = os.path.join(args.run, "corpus.csv")
    ckpt_dir = os.path.join(args.run, "checkpoints")
    ckpt = args.ckpt
    if ckpt is None:
        bests = sorted(
            (p for p in glob.glob(os.path.join(ckpt_dir, "best_model*"))
             if not p.endswith(".meta.json")
             and not p.endswith(".orbax-checkpoint-tmp")),
            key=os.path.getmtime)
        ckpt = bests[-1]
    print(f"evaluating checkpoint {ckpt}", flush=True)

    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq)
    tok = NativeSolidityTokenizer(vocab_size=cfg.vocab_size)
    t0 = time.time()
    _, val_loader = create_dataloaders(csv_path, tokenizer=tok,
                                       batch_size=args.batch_size,
                                       max_length=args.seq)
    print(f"val loader ready ({time.time()-t0:.0f}s)", flush=True)

    analyzer = SmartContractAnalyzer(model_path=ckpt, use_gan=True,
                                     tokenizer=tok, model_config=cfg,
                                     verbose=True)
    print(f"analyzer ready ({time.time()-t0:.0f}s)", flush=True)
    results = evaluate_model_performance(
        model_path=ckpt, val_dataloader=val_loader,
        contract_thresholds=BASELINE_CONTRACT_THRESHOLDS,
        line_thresholds=BASELINE_LINE_THRESHOLDS,
        max_contracts=args.max_eval,
        output_file=os.path.join(args.run, "evaluation_results.json"),
        analyzer=analyzer)
    print(f"eval done ({time.time()-t0:.0f}s)", flush=True)
    print_evaluation_summary(results)

    from sct_gan_tpu.evals.perplexity import compute_perplexity
    ppl = compute_perplexity(analyzer.model, analyzer.params, val_loader)
    print(f"validation perplexity: {ppl['perplexity']:.2f} "
          f"(CE {ppl['cross_entropy']:.3f})", flush=True)

    summary = {
        "checkpoint": ckpt,
        "perplexity": ppl,
        "contract_overall": results["contract_level"]["overall"],
        "line_overall": results["line_level"]["overall"],
    }
    meta_path = ckpt + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        summary["epoch"] = meta.get("epoch")
        summary["best_val_loss"] = meta.get("val_loss")
    with open(os.path.join(args.run, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps(summary, indent=2, default=float))


if __name__ == "__main__":
    main()
