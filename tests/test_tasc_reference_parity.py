"""Golden parity vs the TASC reference implementations (torch-CPU):

  * PatternMatcher — the weak-label oracle
    (MultiClass-TASC-model/pattern_matcher.py)
  * SolidityCodeLoss — CE(ignore_index=0) + keyword-probability syntax loss,
    syntax checker, and Jaccard similarity
    (MultiClass-TASC-model/train_code_loc.py:18-158)

Loaded the same way as tests/test_reference_parity.py (private module
names; the TASC train module pulls in model_code_loc + pattern_matcher from
its own directory, which is pushed onto sys.path).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/MultiClass-TASC-model"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    pytest.importorskip("torch")
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    mods = {}
    for name, filename in [("tasc_ref_pm", "pattern_matcher.py"),
                           ("tasc_ref_train", "train_code_loc.py")]:
        if name in sys.modules:
            mods[name] = sys.modules[name]
            continue
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_DIR, filename))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


SAMPLES = [
    # reentrancy + tx.origin + timestamp, the classic triple
    """pragma solidity ^0.8.0;
contract Vulnerable {
    mapping(address => uint) balances;
    function withdraw(uint amount) public {
        require(tx.origin == msg.sender);
        msg.sender.call{value: amount}("");
        balances[msg.sender] -= amount;
    }
    function roll() public view returns (bool) {
        return block.timestamp % 2 == 0;
    }
}""",
    # clean contract
    """pragma solidity ^0.8.19;
contract Safe {
    address owner;
    function get() public view returns (address) { return owner; }
}""",
    # overflow-ish arithmetic and unchecked send
    """pragma solidity ^0.4.24;
contract Legacy {
    uint total;
    function add(uint v) public { total = total + v * 2; }
    function pay(address a, uint v) public { a.send(v); }
}""",
]

BROKEN = [
    "contract NoPragma { }",
    "pragma solidity ^0.8.0;\nfunction orphan() {}",
    "pragma solidity ^0.8.0;\ncontract Unbalanced { function f() { }",
    "pragma solidity ^0.8.0;\ncontract Close } {",
]


def test_pattern_matcher_matches_reference(ref):
    from sct_gan_tpu.data.pattern_matcher import PatternMatcher
    want_pm = ref["tasc_ref_pm"].PatternMatcher()
    got_pm = PatternMatcher()

    for code in SAMPLES:
        want = want_pm.match_patterns(code)
        got = got_pm.match_patterns(code)
        assert want == got, "match_patterns diverges"
        assert want_pm.get_pattern_scores(code) == \
            got_pm.get_pattern_scores(code)
        assert want_pm.get_vulnerability_explanation(code) == \
            got_pm.get_vulnerability_explanation(code)
        want_t = want_pm.get_pattern_tensor(code)
        got_t = got_pm.get_pattern_tensor(code)
        assert set(want_t) == set(got_t)
        for k in want_t:
            np.testing.assert_allclose(want_t[k].numpy(),
                                       np.asarray(got_t[k]), rtol=1e-6)


def test_solidity_syntax_checker_matches_reference(ref):
    from sct_gan_tpu.variants.tasc_trainer import SolidityCodeLoss
    ref_loss = ref["tasc_ref_train"].SolidityCodeLoss(vocab_size=128)
    for code in SAMPLES + BROKEN:
        assert ref_loss.check_solidity_syntax(code) == \
            SolidityCodeLoss.check_solidity_syntax(code), code[:40]


def test_semantic_similarity_matches_reference(ref):
    from sct_gan_tpu.variants.tasc_trainer import SolidityCodeLoss
    ref_loss = ref["tasc_ref_train"].SolidityCodeLoss(vocab_size=128)
    pairs = [(SAMPLES[0], SAMPLES[1]), (SAMPLES[0], SAMPLES[0]),
             (SAMPLES[2], SAMPLES[1]), ("", SAMPLES[1])]
    for a, b in pairs:
        assert ref_loss.compute_semantic_similarity(a, b) == pytest.approx(
            SolidityCodeLoss.compute_semantic_similarity(a, b))


def test_solidity_code_loss_forward_matches_reference(ref):
    """Full CE + syntax-loss forward on shared random logits/targets —
    including the reference's read-every-rule-at-targets[0] quirk and the
    ignore_index=0 CE."""
    import torch
    import jax.numpy as jnp
    from sct_gan_tpu.variants.tasc_trainer import SolidityCodeLoss

    rng = np.random.default_rng(0)
    b, s, v = 2, 24, 128
    logits = rng.normal(0, 1.5, (b, s, v)).astype(np.float32)
    targets = rng.integers(0, v, (b, s))
    targets[0, :4] = 0          # exercise ignore_index=0
    targets = targets.astype(np.int64)

    ref_loss = ref["tasc_ref_train"].SolidityCodeLoss(vocab_size=v)
    want = ref_loss(torch.from_numpy(logits).clone(),
                    torch.from_numpy(targets)).item()
    got = float(SolidityCodeLoss(vocab_size=v)(
        jnp.asarray(logits), jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-5)
