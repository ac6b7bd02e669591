"""Capture golden fixtures from the REAL `microsoft/codebert-base` artifacts.

Run this in an environment with the HF cache (or network); it writes JSON
fixtures under tests/fixtures/hf_codebert/ that the hermetic test suite then
checks against (tests/test_hf_fidelity.py) — skipped-with-reason when absent.

Captured:
  * ~20 Solidity-snippet tokenizations (ids + per-token line indices built
    the reference's way: newline counting over the decoded prefix,
    SCT-GAN/dataset.py:154-173) — guards SolidityTokenizer/token_to_line
    drift against the real tokenizer's geometry;
  * one CodeBERT forward activation checksum (mean/std/slice of the
    last_hidden_state on a fixed input) — guards the HF→flax weight
    conversion numerics (variants/codebert.py).

Usage:  python tools/capture_hf_fixtures.py [--out tests/fixtures/hf_codebert]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNIPPETS = [
    "pragma solidity ^0.8.0;\ncontract A {\n    uint256 public total;\n}",
    "function withdraw(uint256 amount) public {\n"
    "    msg.sender.call{value: amount}(\"\");\n"
    "    balances[msg.sender] -= amount;\n}",
    "require(tx.origin == owner);",
    "for (uint i = 0; i < holders.length; i++) {\n"
    "    holders[i].transfer(dividend);\n}",
    "if (now > deadline) { state = 2; }",
    "return block.timestamp % 2 == 0;",
    "to.send(v);",
    "locked[msg.sender] = msg.value;",
    "event Deposit(address indexed from, uint256 amount);",
    "mapping(address => uint256) public balances;",
    "constructor() { owner = msg.sender; }",
    "uint8 next = uint8(state) + count;",
    "(bool ok, ) = msg.sender.call{value: amount}(\"\");\nrequire(ok);",
    "address payable[] public holders;",
    "require(end - start <= 50);",
    "owner.call{value: v}(\"\");",
    "uint256 roll = uint256(blockhash(block.number - 1)) % 100;",
    "balances[msg.sender] = balances[msg.sender] - amount;",
    "contract Token {\n    string public name = \"T\";\n"
    "    function ping() public pure returns (uint256) { return 1; }\n}",
    "pragma solidity ^0.4.24;\n\ncontract Old {\n    function f() public {\n"
    "        if (tx.origin == owner) { paused = true; }\n    }\n}",
]


def token_to_line(tokenizer, code: str, ids) -> list:
    """Per-token source-line indices, the reference's decoded-prefix way
    (SCT-GAN/dataset.py:154-173): line(t) = #newlines in decode(ids[:t])."""
    lines = []
    for t in range(1, len(ids) + 1):
        prefix = tokenizer.decode(ids[:t], skip_special_tokens=True)
        lines.append(prefix.count("\n"))
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "hf_codebert"))
    ap.add_argument("--model", default="microsoft/codebert-base")
    args = ap.parse_args()

    from transformers import AutoModel, AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.model)
    os.makedirs(args.out, exist_ok=True)

    tok_fixtures = []
    for code in SNIPPETS:
        enc = tok(code, truncation=True, max_length=128)
        ids = enc["input_ids"]
        tok_fixtures.append({
            "code": code,
            "input_ids": ids,
            "token_to_line": token_to_line(tok, ids),
        })
    with open(os.path.join(args.out, "tokenizations.json"), "w") as f:
        json.dump({"model": args.model, "fixtures": tok_fixtures}, f, indent=1)
    print(f"wrote {len(tok_fixtures)} tokenizations")

    # activation checksum: fixed ids through the real torch model
    import numpy as np
    import torch
    model = AutoModel.from_pretrained(args.model)
    model.eval()
    ids = tok(SNIPPETS[0], return_tensors="pt", truncation=True,
              max_length=64)
    with torch.no_grad():
        out = model(**ids).last_hidden_state.numpy()
    with open(os.path.join(args.out, "activation.json"), "w") as f:
        json.dump({
            "model": args.model,
            "input_ids": ids["input_ids"][0].tolist(),
            "mean": float(np.mean(out)),
            "std": float(np.std(out)),
            "first_row_head": np.asarray(out[0, 0, :16]).tolist(),
            "last_row_head": np.asarray(out[0, -1, :16]).tolist(),
        }, f, indent=1)
    print("wrote activation checksum")


if __name__ == "__main__":
    main()
