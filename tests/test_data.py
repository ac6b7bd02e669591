"""Data layer tests: parser, tokenizer, labels, token_to_line, augmenter,
pattern matcher. Golden expectations follow the reference semantics
(SCT-GAN/dataset.py, data_augmentation.py, pattern_matcher.py)."""
import numpy as np
import pytest

from sct_gan_tpu.data.ast_parser import parse_solidity_to_ast, prepare_code2vec_input
from sct_gan_tpu.data.augmentation import SmartContractAugmenter
from sct_gan_tpu.data.dataset import (
    ArrayDataLoader,
    SmartContractVulnerabilityDataset,
    build_token_to_line,
    custom_collate_fn,
)
from sct_gan_tpu.data.pattern_matcher import PatternMatcher
from sct_gan_tpu.data.synthetic import generate_corpus
from sct_gan_tpu.data.tokenizer import BOS_ID, EOS_ID, PAD_ID, SolidityTokenizer

SAMPLE = """pragma solidity ^0.8.0;

contract Example {
    uint256 public value;
    address public owner;

    function setValue(uint256 _value) public {
        value = _value;
    }

    function getValue() public view returns (uint256) {
        return value;
    }
}
"""


def test_ast_parser_extracts_structure():
    ast = parse_solidity_to_ast(SAMPLE)
    assert ast["type"] == "Contract"
    assert ast["name"] == "Example"
    names = [f["name"] for f in ast["functions"]]
    assert "setValue" in names and "getValue" in names
    set_value = next(f for f in ast["functions"] if f["name"] == "setValue")
    assert set_value["parameters"] == ["uint256 _value"]
    get_value = next(f for f in ast["functions"] if f["name"] == "getValue")
    assert get_value["returns"] == ["uint256"]
    # Reference regex quirk (dataset.py:39): "uint" must be followed by
    # whitespace, so "uint256 public value" is missed but
    # "address public owner" is captured.
    assert "owner" in ast["variables"]


def test_ast_parser_handles_garbage():
    assert parse_solidity_to_ast("not solidity at all")["name"] == "Unknown"


def test_code2vec_paths():
    ast = parse_solidity_to_ast(SAMPLE)
    paths = prepare_code2vec_input(ast)
    assert "Example setValue" in paths
    assert "Example setValue uint256 _value" in paths
    assert "Example getValue uint256" in paths
    assert any(p == "Example owner" for p in paths)
    assert prepare_code2vec_input(None) == []


def test_tokenizer_roundtrip_and_specials(tokenizer):
    ids = tokenizer.encode("function foo() public { return x; }")
    assert ids[0] == BOS_ID and ids[-1] == EOS_ID
    # Deterministic across instances
    tok2 = SolidityTokenizer()
    assert tok2.encode("function foo() public { return x; }") == ids
    # Stable ids for syntax-critical tokens
    assert tokenizer.convert_tokens_to_ids(";") == tok2.convert_tokens_to_ids(";")
    text = tokenizer.decode(ids)
    assert "function" in text and "foo" in text


def test_tokenizer_batch_padding(tokenizer):
    out = tokenizer(["uint a;", "function f() public { return; }"],
                    max_length=16, padding="max_length", truncation=True)
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    assert out["input_ids"][0, -1] == PAD_ID
    assert out["attention_mask"][0].sum() < 16


def test_tokenizer_train_from_texts():
    tok = SolidityTokenizer()
    tok.train_from_texts(["myUniqueIdentifier myUniqueIdentifier other"])
    tid = tok.vocab.get("myUniqueIdentifier")
    assert tid is not None and tid < tok.vocab_size


def test_build_token_to_line(tokenizer):
    ttl = build_token_to_line(SAMPLE, tokenizer, max_length=128)
    assert ttl.shape == (128,)
    assert ttl[0] == 0  # CLS slot
    # Line indices are monotone over the real-token span
    real = ttl[1:1 + len(tokenizer.encode(SAMPLE, add_special_tokens=False))]
    assert (np.diff(real[real > 0]) >= 0).all()
    n_lines = len(SAMPLE.split("\n"))
    assert ttl.max() < n_lines


def test_dataset_labels(tokenizer, tiny_corpus):
    ds = SmartContractVulnerabilityDataset(
        records=tiny_corpus, tokenizer=tokenizer, max_length=256)
    assert len(ds) == len(tiny_corpus)
    item = ds[0]
    assert item["input_ids"].shape == (256,)
    assert item["vulnerable_lines"].shape == (8, 256)
    assert item["contract_vulnerabilities"].shape == (8,)
    assert item["token_to_line"].shape == (256,)
    # contract label = 1 iff that type has any marked line
    for i in range(8):
        assert item["contract_vulnerabilities"][i] == int(
            item["vulnerable_lines"][i].any())


def test_dataset_line_label_positions(tokenizer):
    import ast as pyast
    rec = generate_corpus(n=1, seed=3)[0]
    ds = SmartContractVulnerabilityDataset(
        records=[rec], tokenizer=tokenizer, max_length=512)
    item = ds[0]
    for i, vt in enumerate(["ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO",
                            "Tx-Origin", "UE"]):
        marked = pyast.literal_eval(rec[f"{vt}_lines"])
        got = set(np.nonzero(item["vulnerable_lines"][i])[0].tolist())
        assert got == set(m for m in marked if m < 512)


def test_collate_and_loader(tokenizer, tiny_corpus):
    ds = SmartContractVulnerabilityDataset(
        records=tiny_corpus, tokenizer=tokenizer, max_length=128)
    loader = ArrayDataLoader(ds, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["input_ids"].shape == (4, 128)
    assert b["vulnerable_lines"].shape == (4, 8, 128)
    assert b["contract_vulnerabilities"].shape == (4, 8)
    assert len(b["source_code"]) == 4
    # Shuffling differs across epochs
    first_epoch = [b["contract_name"] for b in loader]
    second_epoch = [b["contract_name"] for b in loader]
    assert first_epoch != second_epoch or len(ds) <= 4


def test_augmenter_produces_pairs(tokenizer):
    aug = SmartContractAugmenter(tokenizer=tokenizer, seed=0)
    pairs = aug.augment_contract(SAMPLE, num_variants=5)
    assert len(pairs) >= 1
    for original, variant in pairs:
        assert original == SAMPLE
        assert variant.strip() != SAMPLE.strip()


def test_augmenter_batch(tokenizer):
    aug = SmartContractAugmenter(tokenizer=tokenizer, seed=0)
    batch = aug.create_training_batch([SAMPLE, SAMPLE], batch_size=2)
    assert batch["input_ids"].shape == (2, 1024)
    assert batch["target_ids"].shape == (2, 1024)


def test_pattern_matcher_families():
    pm = PatternMatcher()
    code = (
        "contract C {\n"
        "    function f() public {\n"
        "        uint t = block.timestamp + 1;\n"
        "        msg.sender.transfer(1);\n"
        "        target.delegatecall(data);\n"
        "    }\n"
        "}\n"
    )
    m = pm.match_patterns(code)
    assert m["timestamp_dependence"]["TDInvocation"]
    assert m["reentrancy"]["callValueInvocation"]
    assert m["dangerous_delegatecall"]["delegateInvocation"]
    # line numbers are 1-based
    assert m["timestamp_dependence"]["TDInvocation"][0][0] == 3

    scores = pm.get_pattern_scores(code)
    assert scores["dangerous_delegatecall"]["delegateInvocation"] == 0.5
    tensors = pm.get_pattern_tensor(code)
    assert tensors["reentrancy"].shape == (4,)
    expl = pm.get_vulnerability_explanation(code)
    assert any("Delegatecall" in e for e in expl)


def test_synthetic_corpus_schema():
    corpus = generate_corpus(n=5, seed=1)
    assert len(corpus) == 5
    for rec in corpus:
        assert "source_code" in rec and "contract_name" in rec
        for vt in ["ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO",
                   "Tx-Origin", "UE"]:
            assert f"{vt}_lines" in rec


def test_corpus_v2_families_and_distractors():
    """Corpus v2 (VERDICT r3 item 3): family-restricted generation draws
    templates only from that family, labeled lines actually contain the
    vulnerable code, and distractor blocks never carry labels."""
    import ast as pyast
    from sct_gan_tpu.data.synthetic import (VULNERABILITY_TYPES,
                                            generate_corpus)

    fam0 = generate_corpus(n=40, seed=1, family=0, distractors=True)
    fam1 = generate_corpus(n=40, seed=2, family=1, distractors=True)

    # labels point at real lines inside the source
    for recs in (fam0, fam1):
        for r in recs:
            lines = r["source_code"].split("\n")
            for vt in VULNERABILITY_TYPES:
                for ln in pyast.literal_eval(r[f"{vt}_lines"]):
                    assert 0 <= ln < len(lines), (r["contract_name"], vt, ln)
                    assert lines[ln].strip(), "label on empty line"

    # family-1 templates introduce surface forms family 0 never emits
    def labeled_lines(recs, vt):
        out = set()
        for r in recs:
            lines = r["source_code"].split("\n")
            for ln in pyast.literal_eval(r[f"{vt}_lines"]):
                out.add(lines[ln].strip())
        return out

    # f1's tx.origin-transfer form never appears in f0's labeled lines
    assert "payable(tx.origin).transfer" not in \
        " ".join(labeled_lines(fam0, "Tx-Origin"))

    # deterministic disjointness check: force the same types in one
    # contract per family; the labeled UE lines must use disjoint surface
    # forms (family 0: .send / ignored .call; family 1: delegatecall /
    # encodeWithSignature)
    import random
    from sct_gan_tpu.data.synthetic import generate_contract
    r0 = generate_contract(random.Random(3), vuln_types=["Tx-Origin", "UE"],
                           family=0)
    r1 = generate_contract(random.Random(3), vuln_types=["Tx-Origin", "UE"],
                           family=1)
    def labeled(rec, vt):
        lines = rec["source_code"].split("\n")
        return [lines[i] for i in pyast.literal_eval(rec[f"{vt}_lines"])]
    l0 = " ".join(labeled(r0, "UE"))
    l1 = " ".join(labeled(r1, "UE"))
    assert l0 != l1
    assert ("delegatecall" in l1 or "encodeWithSignature" in l1)
    assert "delegatecall" not in l0 and "encodeWithSignature" not in l0

    # distractor text appears somewhere (comments/strings/dead code) yet
    # contributes zero labels: every contract with 0 sampled vuln types has
    # all-empty label cells even when its body contains call/tx.origin text
    rng = random.Random(9)
    clean = generate_contract(rng, vuln_types=[], distractors=True,
                              target_tokens=600)
    assert all(pyast.literal_eval(clean[f"{vt}_lines"]) == []
               for vt in VULNERABILITY_TYPES)


def test_corpus_v2_family2_disjoint():
    """Family 2 (round 5) is the never-trained matrix column: its labeled
    lines are valid, and its labeled surface forms do not appear among the
    labeled lines of families 0/1 (spot-checked on signature tokens)."""
    import ast as pyast
    from sct_gan_tpu.data.synthetic import (VULNERABILITY_TYPES,
                                            generate_corpus)
    fam2 = generate_corpus(n=40, seed=5, family=2, distractors=True)
    for r in fam2:
        lines = r["source_code"].split("\n")
        for vt in VULNERABILITY_TYPES:
            for ln in pyast.literal_eval(r[f"{vt}_lines"]):
                assert 0 <= ln < len(lines) and lines[ln].strip()

    def labeled_text(recs, vt):
        out = []
        for r in recs:
            lines = r["source_code"].split("\n")
            out += [lines[i].strip()
                    for i in pyast.literal_eval(r[f"{vt}_lines"])]
        return " ".join(out)

    fam0 = generate_corpus(n=40, seed=6, family=0, distractors=True)
    fam1 = generate_corpus(n=40, seed=7, family=1, distractors=True)
    # family-2 signature tokens never labeled in families 0/1
    for vt, token in [("DOS", "do {"), ("UE", "encodePacked"),
                      ("Tx-Origin", "owner = tx.origin")]:
        assert token in labeled_text(fam2, vt) or not any(
            pyast.literal_eval(r[f"{vt}_lines"]) for r in fam2)
        assert token not in labeled_text(fam0, vt)
        assert token not in labeled_text(fam1, vt)
