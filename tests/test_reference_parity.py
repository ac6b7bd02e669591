"""Golden parity vs the ACTUAL reference implementation (torch-CPU).

Every other parity claim in this repo rests on re-derived math plus code
citations; these tests instead load `/root/reference/SCT-GAN/*.py` (runnable
on the installed torch CPU build) and assert the JAX numbers match numbers
the reference itself produced:

  (a) loss zoo — FocalLoss / SpatialAwareFocalLoss / SoliditySyntaxLoss /
      ContractLevelFocalLoss (SCT-GAN/train.py:99-478)
  (b) PositionalEncoding table (SCT-GAN/model.py:8-21)
  (c) dataset label builders — token_to_line + multi-label line labels
      (SCT-GAN/dataset.py:100-240)
  (d) a d=32 weight-synced SmartContractTransformer forward
      (SCT-GAN/model.py:23-1030) — see test_weight_synced_forward.

The reference package is imported under private module names (its files are
called dataset/train/model — far too generic for sys.modules) with its one
import bug patched in-namespace (dataset.py uses typing.Any without
importing it).
"""
import importlib.util
import os
import sys
import typing

import numpy as np
import pytest

REF_DIR = "/root/reference/SCT-GAN"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present")


def _load_ref(name: str, filename: str):
    if name in sys.modules:
        return sys.modules[name]
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)  # train.py does `from data_augmentation …`
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_DIR, filename))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    # dataset.py annotates with typing.Any but never imports it.
    mod.__dict__["Any"] = typing.Any
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    del torch
    return {
        "dataset": _load_ref("sctgan_ref_dataset", "dataset.py"),
        "train": _load_ref("sctgan_ref_train", "train.py"),
        "model": _load_ref("sctgan_ref_model", "model.py"),
    }


@pytest.fixture(scope="module")
def tok():
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    return SolidityTokenizer(vocab_size=512)


# ---------------------------------------------------------------------------
# (a) loss zoo
# ---------------------------------------------------------------------------

def test_focal_loss_matches_reference(ref):
    import torch
    import jax.numpy as jnp
    from sct_gan_tpu.losses.focal import focal_loss

    rng = np.random.default_rng(0)
    pred = rng.normal(0, 2, size=(16, 8)).astype(np.float32)
    target = (rng.random((16, 8)) < 0.3).astype(np.float32)
    for alpha, gamma in [(0.25, 2.0), (0.05, 4.0), (0.1, 3.0)]:
        want = ref["train"].FocalLoss(alpha=alpha, gamma=gamma)(
            torch.from_numpy(pred), torch.from_numpy(target)).item()
        got = float(focal_loss(jnp.asarray(pred), jnp.asarray(target),
                               alpha=alpha, gamma=gamma))
        assert got == pytest.approx(want, rel=1e-5), (alpha, gamma)


def test_contract_level_focal_loss_matches_reference(ref):
    import torch
    import jax.numpy as jnp
    from sct_gan_tpu.losses.focal import contract_level_focal_loss

    rng = np.random.default_rng(1)
    pred = rng.normal(0, 3, size=(16, 8)).astype(np.float32)
    # include confident misses (target 1, prob < 0.5) to exercise the 2x
    # false-negative multiplier
    target = (rng.random((16, 8)) < 0.4).astype(np.float32)
    for alpha, gamma in [(0.1, 3.0), (0.05, 4.0)]:
        want = ref["train"].ContractLevelFocalLoss(alpha=alpha, gamma=gamma)(
            torch.from_numpy(pred), torch.from_numpy(target)).item()
        got = float(contract_level_focal_loss(
            jnp.asarray(pred), jnp.asarray(target), alpha=alpha, gamma=gamma))
        assert got == pytest.approx(want, rel=1e-5), (alpha, gamma)


def _ref_spatial(ref, pred, target, ttl):
    """Reference SpatialAwareFocalLoss on flattened (N, C) inputs."""
    import torch
    loss = ref["train"].SpatialAwareFocalLoss(alpha=0.25, gamma=2.0,
                                              spatial_weight=0.2)
    return loss(torch.from_numpy(pred.reshape(-1, pred.shape[-1])),
                torch.from_numpy(target.reshape(-1, target.shape[-1])),
                torch.from_numpy(ttl.reshape(-1))).item()


def test_spatial_aware_focal_loss_matches_reference(ref):
    import jax.numpy as jnp
    from sct_gan_tpu.losses.focal import spatial_aware_focal_loss

    rng = np.random.default_rng(2)
    b, s, c = 1, 64, 8
    pred = rng.normal(0, 2, size=(b, s, c)).astype(np.float32)
    target = (rng.random((b, s, c)) < 0.15).astype(np.float32)
    # realistic token->line map: nondecreasing, a few tokens per line
    ttl = np.sort(rng.integers(0, 20, size=(b, s))).astype(np.int64)

    want = _ref_spatial(ref, pred, target, ttl)
    got = float(spatial_aware_focal_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(ttl),
        alpha=0.25, gamma=2.0, spatial_weight=0.2))
    assert got == pytest.approx(want, rel=1e-5)

    # no-vulnerability batch: penalty path must still agree
    target0 = np.zeros_like(target)
    want0 = _ref_spatial(ref, pred, target0, ttl)
    got0 = float(spatial_aware_focal_loss(
        jnp.asarray(pred), jnp.asarray(target0), jnp.asarray(ttl),
        alpha=0.25, gamma=2.0, spatial_weight=0.2))
    assert got0 == pytest.approx(want0, rel=1e-5)


@pytest.mark.slow
def test_spatial_loss_matches_reference_batched_1024(ref):
    """The reference infers batch structure from total_tokens % 1024 == 0
    (train.py:186-199); check the multi-row full-length path."""
    import jax.numpy as jnp
    from sct_gan_tpu.losses.focal import spatial_aware_focal_loss

    rng = np.random.default_rng(3)
    b, s, c = 2, 1024, 8
    pred = rng.normal(0, 1.5, size=(b, s, c)).astype(np.float32)
    target = (rng.random((b, s, c)) < 0.02).astype(np.float32)
    ttl = np.sort(rng.integers(0, 120, size=(b, s))).astype(np.int64)

    want = _ref_spatial(ref, pred, target, ttl)
    got = float(spatial_aware_focal_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(ttl),
        alpha=0.25, gamma=2.0, spatial_weight=0.2))
    # rel 1e-4: f32 accumulation order differs (banded einsum reduction vs
    # the reference's per-token python loop) over 16k summands
    assert got == pytest.approx(want, rel=1e-4)


def test_solidity_syntax_loss_matches_reference(ref, tok):
    import torch
    import jax.numpy as jnp
    from sct_gan_tpu.losses.syntax import (SyntaxLossTables,
                                           solidity_syntax_loss)

    rng = np.random.default_rng(4)
    b, s, v = 2, 96, 512
    # token stream rich in keywords/parens/statements so every penalty
    # branch fires: keyword-follower violations, missing semicolons,
    # unclosed parens/braces near the sequence end
    words = ("function ( ) { return ; if ( x ) { break } continue ; "
             "require ( y ) ; contract is for while ( { (").split()
    ids = np.array([tok.convert_tokens_to_ids(w) for w in words])
    target_ids = rng.choice(ids, size=(b, s)).astype(np.int64)
    logits = rng.normal(0, 1, size=(b, s, v)).astype(np.float32)

    ref_loss = ref["train"].SoliditySyntaxLoss(tok, syntax_weight=0.5)
    want_total = ref_loss(torch.from_numpy(logits),
                          torch.from_numpy(target_ids)).item()
    want_pen = ref_loss._compute_simple_syntax_penalty(
        torch.from_numpy(logits), torch.from_numpy(target_ids)).item()

    tables = SyntaxLossTables.from_tokenizer(tok)
    got_total, got_ce, got_pen = solidity_syntax_loss(
        jnp.asarray(logits), jnp.asarray(target_ids), tables,
        syntax_weight=0.5)
    assert want_pen > 0.0  # the stream must actually trigger penalties
    assert float(got_pen) == pytest.approx(want_pen, rel=1e-5)
    assert float(got_total) == pytest.approx(want_total, rel=1e-5)
    # CE parity (the reference's F.cross_entropy(..., mean) over ALL
    # positions incl. padding, train.py:324)
    want_ce = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).view(-1, v),
        torch.from_numpy(target_ids).view(-1)).item()
    assert float(got_ce) == pytest.approx(want_ce, rel=1e-5)


# ---------------------------------------------------------------------------
# (b) positional encoding table
# ---------------------------------------------------------------------------

def test_positional_encoding_matches_reference(ref):
    from sct_gan_tpu.models.layers import sinusoidal_position_encoding

    # atol 1e-5: both sides compute sin/cos(position·div_term) in f32;
    # at position ~1000 the argument reduction differs by ~2e-6 ULP-wise
    # between torch and XLA libm implementations.
    pe_mod = ref["model"].PositionalEncoding(d_model=64, max_len=128)
    want = pe_mod.pe.squeeze(1).numpy()          # (max_len, 1, d) -> (L, d)
    got = np.asarray(sinusoidal_position_encoding(128, 64))
    np.testing.assert_allclose(got, want, atol=1e-5)

    pe_mod = ref["model"].PositionalEncoding(d_model=32, max_len=1024)
    want = pe_mod.pe.squeeze(1).numpy()
    got = np.asarray(sinusoidal_position_encoding(1024, 32))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# (c) dataset label builders
# ---------------------------------------------------------------------------

SRC_A = """pragma solidity ^0.8.0;
contract Wallet {
    mapping(address => uint) balances;
    function withdraw() public {
        uint bal = balances[msg.sender];
        (bool ok, ) = msg.sender.call{value: bal}("");
        balances[msg.sender] = 0;
    }
}"""

SRC_B = """contract Tiny {
    function f() public pure returns (uint) { return 1; }
}"""


def _rows():
    vt = ["ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO", "Tx-Origin", "UE"]
    base = {f"{v}_lines": "[]" for v in vt}
    row_a = dict(base, source_code=SRC_A, contract_name="Wallet")
    row_a["RENT_lines"] = "[5, 6]"
    row_a["UE_lines"] = "[6]"
    row_b = dict(base, source_code=SRC_B, contract_name="Tiny")
    row_b["ARTHM_lines"] = "not a list"      # garbage cell -> all zeros
    row_b["DOS_lines"] = "[99, -3]"          # out-of-range -> ignored
    return [row_a, row_b]


def test_dataset_items_match_reference(ref, tok, tmp_path):
    import pandas as pd
    csv = tmp_path / "tiny.csv"
    pd.DataFrame(_rows()).to_csv(csv, index=False)

    from sct_gan_tpu.data.dataset import SmartContractVulnerabilityDataset

    ref_ds = ref["dataset"].SmartContractVulnerabilityDataset(
        str(csv), tok, max_length=128, split="train")
    my_ds = SmartContractVulnerabilityDataset(
        str(csv), tok, max_length=128, split="train")
    assert len(ref_ds) == len(my_ds)

    for i in range(len(ref_ds)):
        want, got = ref_ds[i], my_ds[i]
        assert want["contract_name"] == got["contract_name"]
        np.testing.assert_array_equal(np.asarray(want["input_ids"]),
                                      got["input_ids"])
        np.testing.assert_array_equal(np.asarray(want["attention_mask"]),
                                      got["attention_mask"])
        np.testing.assert_array_equal(np.asarray(want["ast_input_ids"]),
                                      got["ast_input_ids"])
        np.testing.assert_array_equal(want["token_to_line"].numpy(),
                                      got["token_to_line"])
        np.testing.assert_array_equal(want["vulnerable_lines"].numpy(),
                                      got["vulnerable_lines"])


def test_line_label_builder_matches_reference(ref, tok):
    """_create_multi_label_line_labels (dataset.py:219-240) head-to-head,
    including the eval()-string and out-of-range quirks."""
    import pandas as pd
    ref_cls = ref["dataset"].SmartContractVulnerabilityDataset
    ref_ds = ref_cls.__new__(ref_cls)      # skip CSV-loading __init__
    ref_ds.vulnerability_types = [
        "ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO", "Tx-Origin", "UE"]
    ref_ds.max_length = 128

    from sct_gan_tpu.data.dataset import SmartContractVulnerabilityDataset
    my_ds = SmartContractVulnerabilityDataset(
        records=[], tokenizer=tok, max_length=128)

    for row in _rows():
        want = ref_ds._create_multi_label_line_labels(
            row["source_code"], pd.Series(row))
        got = my_ds._create_multi_label_line_labels(row["source_code"], row)
        assert [list(map(int, l)) for l in want] == \
               [list(map(int, l)) for l in got]
