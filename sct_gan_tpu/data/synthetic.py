"""Synthetic labeled Solidity corpus for tests, overfit runs, and benches.

The reference trains on a private Etherscan CSV
(`contract_sources_with_vulnerabilities_2048_token_size.csv`, Model-v3
trainning-phase.ipynb cell 6) that is not part of the repo. This generator
produces contracts with known vulnerable lines per type so the full pipeline
(labels → training → detection → metrics) is exercisable hermetically. The
CSV schema matches the reference's: ``source_code``, ``contract_name``, and
one ``{vuln}_lines`` column per vulnerability type.
"""
from __future__ import annotations

import random
from typing import Dict, List, Optional

VULNERABILITY_TYPES = [
    "ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO", "Tx-Origin", "UE",
]

# Each snippet is (lines, relative_vulnerable_line_indices)
_VULN_SNIPPETS = {
    "ARTHM": (
        ["    function addFunds(uint256 amount) public {",
         "        total = total + amount * rate;",
         "    }"],
        [1],
    ),
    "DOS": (
        ["    function payAll() public {",
         "        for (uint i = 0; i < holders.length; i++) {",
         "            holders[i].transfer(dividend);",
         "        }",
         "    }"],
        [1, 2],
    ),
    "LE": (
        ["    function lockFunds() public payable {",
         "        locked[msg.sender] = msg.value;",
         "    }"],
        [1],
    ),
    "RENT": (
        ["    function withdraw(uint256 amount) public {",
         "        msg.sender.call{value: amount}(\"\");",
         "        balances[msg.sender] -= amount;",
         "    }"],
        [1, 2],
    ),
    "TimeM": (
        ["    function draw() public view returns (bool) {",
         "        return block.timestamp % 2 == 0;",
         "    }"],
        [1],
    ),
    "TimeO": (
        ["    function expire() public {",
         "        if (now > deadline) { state = 2; }",
         "    }"],
        [1],
    ),
    "Tx-Origin": (
        ["    function adminOnly() public {",
         "        require(tx.origin == owner);",
         "        paused = true;",
         "    }"],
        [1],
    ),
    "UE": (
        ["    function pay(address payable to, uint256 v) public {",
         "        to.send(v);",
         "    }"],
        [1],
    ),
}

_SAFE_SNIPPETS = [
    ["    function getOwner() public view returns (address) {",
     "        return owner;",
     "    }"],
    ["    function setRate(uint256 r) public {",
     "        require(msg.sender == owner);",
     "        rate = r;",
     "    }"],
    ["    event Deposit(address indexed from, uint256 amount);"],
    ["    function ping() public pure returns (uint256) {",
     "        return 1;",
     "    }"],
]


def generate_contract(rng: random.Random,
                      vuln_types: Optional[List[str]] = None,
                      name: Optional[str] = None) -> Dict:
    """Generate one contract record with exact per-type vulnerable lines."""
    if vuln_types is None:
        k = rng.randint(0, 3)
        vuln_types = rng.sample(VULNERABILITY_TYPES, k)
    name = name or f"Contract{rng.randint(0, 10**6)}"

    lines: List[str] = [
        f"pragma solidity ^0.{rng.randint(4, 8)}.{rng.randint(0, 20)};",
        "",
        f"contract {name} {{",
        "    address public owner;",
        "    uint256 public total;",
        "    uint256 public rate;",
        "    uint256 public deadline;",
        "    uint256 public state;",
        "    bool public paused;",
        "    mapping(address => uint256) public balances;",
        "    mapping(address => uint256) public locked;",
        "    address payable[] public holders;",
        "    uint256 public dividend;",
        "",
        "    constructor() {",
        "        owner = msg.sender;",
        "    }",
        "",
    ]
    vuln_lines: Dict[str, List[int]] = {vt: [] for vt in VULNERABILITY_TYPES}

    blocks: List = []
    for vt in vuln_types:
        blocks.append(("vuln", vt))
    for _ in range(rng.randint(1, 3)):
        blocks.append(("safe", rng.randrange(len(_SAFE_SNIPPETS))))
    rng.shuffle(blocks)

    for kind, which in blocks:
        if kind == "vuln":
            snippet, rel = _VULN_SNIPPETS[which]
            base = len(lines)
            lines.extend(snippet)
            vuln_lines[which].extend(base + r for r in rel)
        else:
            lines.extend(_SAFE_SNIPPETS[which])
        lines.append("")
    lines.append("}")

    record: Dict = {
        "source_code": "\n".join(lines),
        "contract_name": name,
    }
    for vt in VULNERABILITY_TYPES:
        record[f"{vt}_lines"] = str(vuln_lines[vt])
    return record


def generate_corpus(n: int = 50, seed: int = 0) -> List[Dict]:
    rng = random.Random(seed)
    return [generate_contract(rng, name=f"Synth{i}") for i in range(n)]


def write_corpus_csv(path: str, n: int = 50, seed: int = 0) -> None:
    import pandas as pd
    pd.DataFrame(generate_corpus(n, seed)).to_csv(path, index=False)
