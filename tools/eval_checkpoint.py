"""Standalone comprehensive evaluation of a saved checkpoint: the eval half
of tools/train_synthetic.py, runnable on its own (e.g. after a training run
whose eval phase was interrupted).

Usage:
    python tools/eval_checkpoint.py --ckpt /tmp/run/checkpoints/best_model_x \
        --csv /tmp/run/corpus.csv --out /tmp/run
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--max-eval", type=int, default=None)
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.dataset import create_dataloaders
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.evals.harness import (BASELINE_CONTRACT_THRESHOLDS,
                                           BASELINE_LINE_THRESHOLDS,
                                           evaluate_model_performance,
                                           print_evaluation_summary)
    from sct_gan_tpu.evals.perplexity import compute_perplexity
    from sct_gan_tpu.infer.analyzer import SmartContractAnalyzer

    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    _, val_loader = create_dataloaders(args.csv, tokenizer=tok,
                                       batch_size=args.batch_size,
                                       max_length=args.seq)

    analyzer = SmartContractAnalyzer(model_path=args.ckpt, use_gan=True,
                                     tokenizer=tok, model_config=cfg,
                                     verbose=False)
    results = evaluate_model_performance(
        model_path=args.ckpt, val_dataloader=val_loader,
        contract_thresholds=BASELINE_CONTRACT_THRESHOLDS,
        line_thresholds=BASELINE_LINE_THRESHOLDS,
        max_contracts=args.max_eval,
        output_file=os.path.join(args.out, "evaluation_results.json"),
        analyzer=analyzer)
    print_evaluation_summary(results)

    ppl = compute_perplexity(analyzer.model, analyzer.params, val_loader)
    print(f"validation perplexity: {ppl['perplexity']:.2f} "
          f"(CE {ppl['cross_entropy']:.3f})", flush=True)

    summary = {
        "checkpoint": args.ckpt,
        "perplexity": ppl,
        "contract_overall": results["contract_level"]["overall"],
        "line_overall": results["line_level"]["overall"],
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
