"""Score a corpus-v2 checkpoint on an IN-FAMILY (family-0) test set.

The corpus-v2 protocol (tools/train_synthetic.py --corpus-v2) trains on
template family 0 and reports the de-saturated held-out family-1 numbers.
This companion stage scores the SAME checkpoint on a fresh family-0 corpus
(unseen seed, with distractors) — the in-distribution counterpart of the
reference's own evaluation (its private Etherscan eval split is drawn from
the same distribution as its train split, SURVEY §4), so the BASELINE.md
contract PR-AUC 0.747 bar is compared like-for-like while the family-1
number measures template generalization.

Usage: python tools/eval_v2_infamily.py --run /tmp/sct_run_v2b
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="/tmp/sct_run_v2b")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=2_000_000)  # != train/val/test
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                          SmartContractVulnerabilityDataset)
    from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
    from sct_gan_tpu.data.synthetic import generate_corpus
    from sct_gan_tpu.evals.harness import (BASELINE_CONTRACT_THRESHOLDS,
                                           BASELINE_LINE_THRESHOLDS,
                                           evaluate_model_performance,
                                           print_evaluation_summary)
    from sct_gan_tpu.infer.analyzer import SmartContractAnalyzer

    ckpt = args.ckpt
    if ckpt is None:
        bests = sorted(
            (p for p in glob.glob(
                os.path.join(args.run, "checkpoints", "best_model*"))
             if not p.endswith(".meta.json")
             and not p.endswith(".orbax-checkpoint-tmp")),
            key=os.path.getmtime)
        assert bests, f"no best checkpoint under {args.run}"
        ckpt = bests[-1]
    print(f"checkpoint: {ckpt}", flush=True)

    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq)
    tok = NativeSolidityTokenizer(vocab_size=cfg.vocab_size)
    recs = generate_corpus(args.n, seed=args.seed, family=0, distractors=True)
    ds = SmartContractVulnerabilityDataset(records=recs, tokenizer=tok,
                                           max_length=args.seq)
    loader = ArrayDataLoader(ds, batch_size=args.batch_size)
    print(f"in-family test set: {args.n} family-0 contracts (seed "
          f"{args.seed})", flush=True)

    analyzer = SmartContractAnalyzer(model_path=ckpt, use_gan=True,
                                     tokenizer=tok, model_config=cfg,
                                     verbose=False)
    out_file = os.path.join(args.run, "evaluation_infamily.json")
    results = evaluate_model_performance(
        model_path=ckpt, val_dataloader=loader,
        contract_thresholds=BASELINE_CONTRACT_THRESHOLDS,
        line_thresholds=BASELINE_LINE_THRESHOLDS,
        output_file=out_file, analyzer=analyzer)
    print_evaluation_summary(results)

    summary = {
        "checkpoint": ckpt,
        "n_contracts": args.n,
        "family": 0,
        "seed": args.seed,
        "contract_overall": results["contract_level"]["overall"],
        "line_overall": results["line_level"]["overall"],
    }
    path = os.path.join(args.run, "summary_infamily.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
