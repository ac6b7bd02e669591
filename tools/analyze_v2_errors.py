"""Per-type error analysis of a trained checkpoint on a corpus-v2 family.

Mirrors the reference's TP/FP/FN line analysis
(`SCT-GAN/notebook_utils.py:1298-1492`, ported as
`evals.validation.analyze_line_vulnerability_detection`) and adds the
contract-level diagnosis VERDICT r4 asked for: per-type score separations
(mean/median predicted probability on positives vs negatives, the overlap
quartiles) plus the most-confused PAIRS (which OTHER type's templates drive
a type's false positives) — the numbers that say WHY a contract-level
PR-AUC is low when the line head is fine.

Usage:
    python tools/analyze_v2_errors.py --ckpt /path/best_model... \
        --family 1 [--contracts 200] [--seed 1000001] [--out errors.json]
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
    ap.add_argument("--family", type=int, default=1)
    ap.add_argument("--contracts", type=int, default=200)
    ap.add_argument("--seed", type=int, default=None,
                    help="corpus seed (default: 10**6 + family, the "
                         "train_synthetic.py test-column seed)")
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                          SmartContractVulnerabilityDataset)
    from sct_gan_tpu.data.native_tokenizer import NativeSolidityTokenizer
    from sct_gan_tpu.data.synthetic import generate_corpus
    from sct_gan_tpu.evals.validation import (
        analyze_line_vulnerability_detection, collect_validation_results)
    from sct_gan_tpu.infer.analyzer import SmartContractAnalyzer

    cfg = ModelConfig(use_gan=True, max_length=args.seq, max_lines=args.seq,
                      d_model=args.d_model,
                      dim_feedforward=(2048 if args.d_model == 768
                                       else args.d_model * 8 // 3),
                      num_encoder_layers=args.layers,
                      num_decoder_layers=args.layers)
    tok = NativeSolidityTokenizer(vocab_size=cfg.vocab_size)
    seed = args.seed if args.seed is not None else 10**6 + args.family
    recs = generate_corpus(args.contracts, seed=seed, family=args.family,
                           distractors=True)
    ds = SmartContractVulnerabilityDataset(records=recs, tokenizer=tok,
                                           max_length=args.seq)
    loader = ArrayDataLoader(ds, batch_size=8)
    analyzer = SmartContractAnalyzer(model_path=args.ckpt, use_gan=True,
                                     tokenizer=tok, model_config=cfg,
                                     verbose=False)

    results = collect_validation_results(analyzer, loader, threshold=0.4,
                                         generate_contracts=False)
    line_analysis = analyze_line_vulnerability_detection(results)

    cl = results["contract_level"]
    y_true = np.stack(cl["true_labels"]).astype(bool)      # (N, 8)
    y_prob = np.stack(cl["predicted_probs"])               # (N, 8)
    vts = results["metadata"]["vulnerability_types"]

    contract_sep = {}
    for j, vt in enumerate(vts):
        pos, neg = y_prob[y_true[:, j], j], y_prob[~y_true[:, j], j]
        if not len(pos):
            continue
        contract_sep[vt] = {
            "n_pos": int(len(pos)),
            "pos_prob_mean": float(pos.mean()),
            "pos_prob_q25_50_75": [float(q) for q in
                                   np.percentile(pos, [25, 50, 75])],
            "neg_prob_mean": float(neg.mean()),
            "neg_prob_q25_50_75": [float(q) for q in
                                   np.percentile(neg, [25, 50, 75])],
            # fraction of negatives scoring above the positive median —
            # >0.5 means the ranking is effectively inverted
            "neg_above_pos_median": float(
                (neg > np.median(pos)).mean()) if len(neg) else 0.0,
        }

    # confusion drivers: for each type j, among contracts WITHOUT type j
    # that score high on j (top-decile of j's scores), which types they DO
    # have — the template family whose presence inflates j's head
    confusion = {}
    for j, vt in enumerate(vts):
        neg_mask = ~y_true[:, j]
        if neg_mask.sum() < 10:
            continue
        thr = np.percentile(y_prob[:, j], 90)
        hot = neg_mask & (y_prob[:, j] >= thr)
        if not hot.sum():
            continue
        co = {vts[k]: int(y_true[hot, k].sum()) for k in range(len(vts))
              if k != j and y_true[hot, k].sum()}
        confusion[vt] = {"high_scoring_negatives": int(hot.sum()),
                         "their_actual_types": co}

    out = {
        "checkpoint": args.ckpt,
        "family": args.family,
        "contracts": args.contracts,
        "contract_score_separation": contract_sep,
        "contract_confusion_drivers": confusion,
        "line_tp_fp_fn": {
            vt: {k: v for k, v in d.items() if k != "examples"}
            for vt, d in line_analysis["per_vulnerability"].items()},
        "line_totals": line_analysis["totals"],
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
