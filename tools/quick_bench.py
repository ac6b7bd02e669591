"""Quick iteration bench: fused train step + decode only (no naive baseline).

Same timing methodology as bench.py (differential chained steps); skips the
fp32/dense naive-port leg so a measurement round-trip fits in ~5 minutes.

Usage: python tools/quick_bench.py [--no-step] [--no-decode] [--decode-batch N]
       [--sorted-embed]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-decode", action="store_true")
    ap.add_argument("--no-step", action="store_true")
    ap.add_argument("--decode-batch", type=int, default=32)
    ap.add_argument("--sorted-embed", action="store_true",
                    help="A/B: sort-based embedding backward "
                         "(ModelConfig.sorted_embed_grad)")
    args = ap.parse_args()

    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from bench import build_trainer, make_batch, time_decode, time_step

    batch_size, seq = 8, 1024
    trainer = build_trainer("bfloat16", True, batch_size, seq,
                            sorted_embed=args.sorted_embed)
    batch = make_batch(batch_size, seq, trainer.model.config.vocab_size)
    out = {}
    if not args.no_step:
        print("timing fused step...", flush=True)
        t, state = time_step(trainer, batch)
        out["step_ms"] = round(t * 1e3, 2)
        out["tok_per_sec"] = round(batch_size * seq / t, 1)
    else:
        state = trainer.state
    if not args.no_decode:
        print("timing decode...", flush=True)
        out.update(time_decode(trainer, state.params, args.decode_batch))
        out["decode_batch"] = args.decode_batch
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
