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


# ---------------------------------------------------------------------------
# (d) weight-synced full-model forward
# ---------------------------------------------------------------------------

def _set_leaf(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[p]
    leaf = parts[-1]
    assert leaf in node, f"no flax param at {path}"
    if node[leaf].shape != value.shape:
        # vocab-padded flax param (ModelConfig.vocab_pad_multiple): the flax
        # side is larger on exactly one axis — zero-pad the torch tensor
        # (pad rows/columns are never read; logits are sliced in-model)
        dst_shape, src_shape = node[leaf].shape, value.shape
        assert len(dst_shape) == len(src_shape), (
            f"{path}: flax {dst_shape} vs torch {src_shape}")
        diff = [i for i in range(len(dst_shape))
                if dst_shape[i] != src_shape[i]]
        assert len(diff) == 1 and dst_shape[diff[0]] > src_shape[diff[0]], (
            f"{path}: flax {dst_shape} vs torch {src_shape}")
        pad = [(0, 0)] * len(dst_shape)
        pad[diff[0]] = (0, dst_shape[diff[0]] - src_shape[diff[0]])
        value = np.pad(value, pad)
    node[leaf] = value


def torch_state_to_flax(sd, params, d_model):
    """Port a reference SmartContractTransformer state_dict into a flax
    param tree of the same tiny config.

    Conventions: nn.Linear weight (out,in) -> kernel (in,out) transposed;
    nn.LayerNorm weight -> scale; nn.MultiheadAttention packed
    in_proj_weight (3d,d) -> split q/k/v rows (torch F.multi_head_attention
    packs q first). Returns the number of torch tensors consumed.
    """
    import copy
    params = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def linear(dst, src):
        _set_leaf(params, dst + "/kernel", take(src + ".weight").T)
        _set_leaf(params, dst + "/bias", take(src + ".bias"))

    def ln(dst, src):
        _set_leaf(params, dst + "/scale", take(src + ".weight"))
        _set_leaf(params, dst + "/bias", take(src + ".bias"))

    def mha(dst, src):
        w = take(src + ".in_proj_weight")
        b = take(src + ".in_proj_bias")
        for i, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            _set_leaf(params, f"{dst}/{proj}/kernel",
                      w[i * d_model:(i + 1) * d_model].T)
            _set_leaf(params, f"{dst}/{proj}/bias",
                      b[i * d_model:(i + 1) * d_model])
        linear(dst + "/out_proj", src + ".out_proj")

    def seq(dst, src, layout):
        """layout: list of (torch_seq_index, flax_name, kind)"""
        for idx, name, kind in layout:
            (linear if kind == "linear" else ln)(f"{dst}/{name}",
                                                 f"{src}.{idx}")

    _set_leaf(params, "embedding/embedding", take("embedding.weight"))
    _set_leaf(params, "ast_embedding/embedding", take("ast_embedding.weight"))
    _set_leaf(params, "empty_line_embedding", take("empty_line_embedding"))
    ln("embedding_norm", "embedding_norm")
    ln("ast_embedding_norm", "ast_embedding_norm")

    enc_layers = sorted({k.split(".")[2] for k in sd
                         if k.startswith("encoder.layers.")})
    for i in enc_layers:
        mha(f"encoder/layer_{i}/self_attn", f"encoder.layers.{i}.self_attn")
        linear(f"encoder/layer_{i}/ffn/linear1", f"encoder.layers.{i}.linear1")
        linear(f"encoder/layer_{i}/ffn/linear2", f"encoder.layers.{i}.linear2")
        ln(f"encoder/layer_{i}/norm1", f"encoder.layers.{i}.norm1")
        ln(f"encoder/layer_{i}/norm2", f"encoder.layers.{i}.norm2")
    dec_layers = sorted({k.split(".")[2] for k in sd
                         if k.startswith("decoder.layers.")})
    for i in dec_layers:
        mha(f"decoder/layer_{i}/self_attn", f"decoder.layers.{i}.self_attn")
        mha(f"decoder/layer_{i}/cross_attn",
            f"decoder.layers.{i}.multihead_attn")
        linear(f"decoder/layer_{i}/ffn/linear1", f"decoder.layers.{i}.linear1")
        linear(f"decoder/layer_{i}/ffn/linear2", f"decoder.layers.{i}.linear2")
        for n in ("norm1", "norm2", "norm3"):
            ln(f"decoder/layer_{i}/{n}", f"decoder.layers.{i}.{n}")

    ln("output_norm", "output_norm")
    linear("output_layer", "output_layer")

    mha("ast_attention", "ast_attention")
    mha("cross_attention", "cross_attention")
    seq("feature_fusion", "feature_fusion",
        [(0, "dense_0", "linear"), (1, "norm_0", "ln"),
         (4, "dense_1", "linear"), (5, "norm_1", "ln"),
         (8, "dense_2", "linear")])

    mha("contract_vuln_attention", "contract_vuln_attention")
    seq("contract_feature_aggregation", "contract_feature_aggregation",
        [(0, "dense_0", "linear"), (1, "norm_0", "ln"),
         (4, "dense_1", "linear"), (5, "norm_1", "ln")])
    seq("contract_vulnerability_head", "contract_vulnerability_head",
        [(0, "dense_0", "linear"), (1, "norm_0", "ln"),
         (4, "dense_1", "linear"), (5, "norm_1", "ln"),
         (8, "dense_2", "linear")])

    for n in ("linear1", "linear2"):
        linear(f"line_feature_extractor/{n}", f"line_feature_extractor.{n}")
    for n in ("norm1", "norm2"):
        ln(f"line_feature_extractor/{n}", f"line_feature_extractor.{n}")
    mha("line_vuln_attention", "line_vuln_attention")
    mha("vuln_type_attention", "vuln_type_attention")
    seq("line_vulnerability_head_1", "line_vulnerability_head_1",
        [(0, "dense_0", "linear"), (3, "dense_1", "linear"),
         (6, "dense_2", "linear")])
    seq("line_specific_processor", "line_specific_processor",
        [(0, "dense_0", "linear"), (3, "dense_1", "linear")])
    for t in range(8):
        seq(f"vuln_type_processor_{t}/mlp", f"vuln_type_processor.{t}",
            [(0, "dense_0", "linear"), (3, "dense_1", "linear")])

    mha("disc_path_attention", "disc_path_attention")
    linear("disc_grammar_projection", "disc_grammar_projection")
    seq("disc_feature_extractor", "disc_feature_extractor",
        [(0, "dense_0", "linear"), (1, "norm_0", "ln"),
         (4, "dense_1", "linear"), (5, "norm_1", "ln")])
    seq("disc_synthetic_head", "disc_synthetic_head",
        [(0, "dense_0", "linear"), (1, "norm_0", "ln"),
         (4, "dense_1", "linear")])

    # Everything not consumed must be a buffer or a parameter the reference
    # itself never uses in forward: the PE table (recomputed, checked by
    # test_positional_encoding_matches_reference), path_embedding (alias of
    # ast_embedding), and disc_grammar_embedding (dead: GrammarConstraint
    # applies only the projection, model.py:37-40).
    leftovers = {k for k in sd if k not in used}
    assert leftovers <= {"pos_encoder.pe", "path_embedding.weight",
                         "disc_grammar_embedding.weight"}, leftovers
    return params


import jax  # noqa: E402  (used by the converter above)


@pytest.mark.slow
def test_weight_synced_forward_matches_reference(ref, tok):
    """d=32 SmartContractTransformer forward, torch weights ported to flax:
    every logit family must match the reference to ~1e-4 in f32 (dropout
    off). Pins the x0.1/x0.05 residual scales, the sqrt(d) embed scale,
    PE placement, the empty-line embedding + line PE, the unmasked
    contract-head pooling, the zero-pad of line logits, and the shifted
    LM logits/targets (model.py:395-1030)."""
    import torch
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                          SmartContractVulnerabilityDataset)
    from sct_gan_tpu.data.synthetic import generate_corpus
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    d = 32
    ref_model = ref["model"].SmartContractTransformer(
        d_model=d, nhead=2, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64, dropout=0.0, max_length=64, vocab_size=512,
        num_vulnerability_types=8, use_gan=True).eval()

    cfg = ModelConfig(d_model=d, nhead=2, num_encoder_layers=2,
                      num_decoder_layers=2, dim_feedforward=64, dropout=0.0,
                      max_length=64, max_lines=64, vocab_size=512,
                      use_gan=True, compute_dtype="float32",
                      use_flash_attention=False)
    model = SmartContractTransformer(cfg)

    ds = SmartContractVulnerabilityDataset(
        records=generate_corpus(n=2, seed=11), tokenizer=tok, max_length=64)
    batch = next(iter(ArrayDataLoader(ds, batch_size=2, shuffle=False)))

    init = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
        ast_input_ids=batch["ast_input_ids"],
        ast_attention_mask=batch["ast_attention_mask"],
        target_ids=batch["input_ids"],
        token_to_line=batch["token_to_line"])["params"]
    params = torch_state_to_flax(ref_model.state_dict(), init, d)

    with torch.no_grad():
        want = ref_model(
            input_ids=torch.from_numpy(batch["input_ids"]).long(),
            attention_mask=torch.from_numpy(batch["attention_mask"]).long(),
            ast_input_ids=torch.from_numpy(batch["ast_input_ids"]).long(),
            ast_attention_mask=torch.from_numpy(
                batch["ast_attention_mask"]).long(),
            target_ids=torch.from_numpy(batch["input_ids"]).long(),
            token_to_line=torch.from_numpy(batch["token_to_line"]).long())

    got = model.apply(
        {"params": params},
        input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
        ast_input_ids=batch["ast_input_ids"],
        ast_attention_mask=batch["ast_attention_mask"],
        target_ids=batch["input_ids"],
        token_to_line=batch["token_to_line"])

    b, s = batch["input_ids"].shape
    np.testing.assert_array_equal(
        want["target_ids"].numpy().reshape(b, s - 1),
        np.asarray(got["target_ids"]))
    np.testing.assert_allclose(
        np.asarray(got["contract_vulnerability_logits"]),
        want["contract_vulnerability_logits"].numpy(),
        rtol=1e-4, atol=1e-4)
    # reference zero-pads line logits to a hard-coded 1024 (model.py:737-748)
    want_lines = want["line_vulnerability_logits"].numpy()
    assert want_lines.shape[1] == 1024
    np.testing.assert_allclose(np.asarray(got["line_vulnerability_logits"]),
                               want_lines[:, :cfg.max_lines], rtol=1e-4,
                               atol=1e-4)
    assert np.all(want_lines[:, cfg.max_lines:] == 0.0)
    np.testing.assert_allclose(
        np.asarray(got["logits"]).reshape(b * (s - 1), -1),
        want["logits"].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["discriminator_logits"]),
                               want["discriminator_logits"].numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# (e) weight-synced GENERATION decode step (VERDICT r4 item 7a)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_weight_synced_decode_step_matches_reference(ref, tok):
    """One-token-at-a-time generation parity: the reference's generation
    loop (model.py:862-930, re-decoding the whole prefix each step) vs this
    repo's KV-cached `decode_step` (infer/generate.py), with the SAME ported
    weights. torch.multinomial is patched to a greedy recorder so both sides
    walk the identical trajectory; at every step the post-temperature,
    post-top-k/top-p sampling distribution must match."""
    import torch
    import jax
    import jax.numpy as jnp
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                          SmartContractVulnerabilityDataset)
    from sct_gan_tpu.data.synthetic import generate_corpus
    from sct_gan_tpu.infer.generate import _init_caches
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.ops.sampling import top_k_top_p_filter

    d = 32
    ref_model = ref["model"].SmartContractTransformer(
        d_model=d, nhead=2, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64, dropout=0.0, max_length=64, vocab_size=512,
        num_vulnerability_types=8, use_gan=True).eval()
    # the reference zero-initializes output_layer (model.py init), so an
    # untrained model emits ALL-ZERO logits and the top-k/top-p support is
    # decided by torch's unstable sort over ties — randomize the LM head so
    # the compared distributions are tie-free
    with torch.no_grad():
        torch.manual_seed(3)
        torch.nn.init.normal_(ref_model.output_layer.weight, std=0.2)
        torch.nn.init.normal_(ref_model.output_layer.bias, std=0.2)
    cfg = ModelConfig(d_model=d, nhead=2, num_encoder_layers=2,
                      num_decoder_layers=2, dim_feedforward=64, dropout=0.0,
                      max_length=64, max_lines=64, vocab_size=512,
                      use_gan=True, compute_dtype="float32",
                      use_flash_attention=False)
    model = SmartContractTransformer(cfg)

    ds = SmartContractVulnerabilityDataset(
        records=generate_corpus(n=2, seed=17), tokenizer=tok, max_length=64)
    batch = next(iter(ArrayDataLoader(ds, batch_size=2, shuffle=False)))

    init = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"], attention_mask=batch["attention_mask"],
        ast_input_ids=batch["ast_input_ids"],
        ast_attention_mask=batch["ast_attention_mask"],
        target_ids=batch["input_ids"],
        token_to_line=batch["token_to_line"])["params"]
    params = torch_state_to_flax(ref_model.state_dict(), init, d)

    # -- reference side: generation mode with a greedy recorder ------------
    recorded = []
    orig_multinomial = torch.multinomial

    def greedy_recorder(probs, num_samples, **kw):
        assert num_samples == 1
        recorded.append(probs.detach().cpu().numpy().copy())
        return probs.argmax(dim=-1, keepdim=True)

    torch.multinomial = greedy_recorder
    try:
        with torch.no_grad():
            want = ref_model(
                input_ids=torch.from_numpy(batch["input_ids"]).long(),
                attention_mask=torch.from_numpy(
                    batch["attention_mask"]).long(),
                ast_input_ids=torch.from_numpy(batch["ast_input_ids"]).long(),
                ast_attention_mask=torch.from_numpy(
                    batch["ast_attention_mask"]).long(),
                target_ids=None,
                token_to_line=torch.from_numpy(batch["token_to_line"]).long(),
                apply_syntax_constraints=False)
    finally:
        torch.multinomial = orig_multinomial
    ref_seq = want["generated_sequence"].numpy()
    assert len(recorded) >= 5, "reference generated too few steps to compare"

    # -- our side: KV-cached decode_step along the same trajectory ---------
    memory = model.apply(
        {"params": params}, batch["input_ids"], batch["attention_mask"],
        batch["ast_input_ids"], batch["ast_attention_mask"],
        method=model.encode)
    src_mask = batch["attention_mask"].astype(bool)
    cross_kvs = model.apply({"params": params}, memory,
                            method=model.precompute_cross_kv)
    caches = _init_caches(cfg, 2, dtype=memory.dtype)

    step_fn = jax.jit(lambda p, t, pos, c: model.apply(
        {"params": p}, t, pos, c, cross_kvs, src_mask,
        method=model.decode_step))

    tokens = ref_seq[:, :1]                      # BOS
    for i, want_probs in enumerate(recorded):
        logits, caches = step_fn(params, jnp.asarray(tokens[:, -1:]),
                                 jnp.int32(i), caches)
        filt = top_k_top_p_filter(np.asarray(logits) / 0.7, 50, 0.95)
        got_probs = np.asarray(jax.nn.softmax(jnp.asarray(filt), axis=-1))
        np.testing.assert_allclose(got_probs, want_probs,
                                   rtol=2e-3, atol=2e-5,
                                   err_msg=f"step {i}")
        nxt = got_probs.argmax(axis=-1)
        np.testing.assert_array_equal(nxt, ref_seq[:, i + 1],
                                      err_msg=f"greedy choice at step {i}")
        tokens = np.concatenate([tokens, nxt[:, None]], axis=1)


# ---------------------------------------------------------------------------
# (f) the reference's beam search cannot run (VERDICT r4 item 7b)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_reference_beam_search_is_unrunnable(ref):
    """`generate_with_beam_search` (model.py:1062-1172) feeds integer
    position TENSORS into PositionalEncoding.forward (model.py:1073,1078:
    `self.pos_encoder(contract_pos)`), which computes `x + pe[:x.size(0)]` —
    a (B, S) + (B, 1, d) broadcast that raises for every S != d_model
    (including the real configuration S=1024, d=768). Even in the contrived
    square case S == d_model it crashes on the SECOND decode step
    (tgt_pos (1, 2) vs pe (1, 1, d)). The reference's beam search therefore
    never produced a usable sequence; this repo's batched KV-cached beam
    (infer/generate.py:make_beam_search_fn) implements the intended
    semantics instead, and its per-step scores are pinned by the
    weight-synced decode-step golden above plus the NumPy-oracle
    bookkeeping test (tests/test_infer.py)."""
    import torch

    model = ref["model"].SmartContractTransformer(
        d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=64, dropout=0.0, max_length=64, vocab_size=128,
        num_vulnerability_types=8, use_gan=False).eval()

    ids16 = torch.randint(0, 128, (1, 16))
    mask16 = torch.ones(1, 16, dtype=torch.bool)
    with pytest.raises(RuntimeError):
        model.generate_with_beam_search(ids16, mask16, ids16, mask16,
                                        beam_size=2, max_length=4)

    # square case S == d_model: the encode quirk broadcasts, but the second
    # decode step still crashes...
    ids32 = torch.randint(0, 128, (1, 32))
    mask32 = torch.ones(1, 32, dtype=torch.bool)
    with pytest.raises(RuntimeError):
        model.generate_with_beam_search(ids32, mask32, ids32, mask32,
                                        beam_size=2, max_length=4)

    # ...so the longest sequence it can ever emit is the 2-token
    # max_length=2 degenerate run.
    with torch.no_grad():
        out = model.generate_with_beam_search(ids32, mask32, ids32, mask32,
                                              beam_size=2, max_length=2)
    assert out["generated_sequence"].shape[1] == 2
