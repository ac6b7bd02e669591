"""HF-artifact fidelity: weight-conversion numerics + golden fixtures.

Two tiers (VERDICT r1 §missing-2 / weak-7):

1. ALWAYS-RUN conversion parity: `_convert_hf_weights` is verified
   numerically against torch — a tiny random-weight `RobertaModel` (the HF
   modeling code is local; no network) is converted through the exact
   production mapping and the flax forward must match torch's
   last_hidden_state, padding included. This proves the converter right for
   the architecture, which is everything testable hermetically.

2. FIXTURE-GATED goldens against the real `microsoft/codebert-base`:
   tokenization ids + decoded-prefix token_to_line vectors and an
   activation checksum, captured offline by tools/capture_hf_fixtures.py.
   Skipped-with-reason when the fixtures have not been captured.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "hf_codebert")


@pytest.fixture(scope="module")
def tiny_roberta_pair():
    """(torch RobertaModel, converted flax params, FlaxCodeBERT) at a tiny
    config — random weights, fixed seed."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    from sct_gan_tpu.variants.codebert import (FlaxCodeBERT,
                                               _convert_hf_weights)
    import jax
    import jax.numpy as jnp

    cfg = RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    tmodel = RobertaModel(cfg, add_pooling_layer=False)
    tmodel.eval()

    fmodel = FlaxCodeBERT(vocab_size=128, d_model=32, num_layers=2,
                          num_heads=2, dim_feedforward=64, max_positions=40)
    init_ids = jnp.zeros((1, 8), jnp.int32)
    params = fmodel.init({"params": jax.random.PRNGKey(0)}, init_ids,
                         jnp.ones_like(init_ids))["params"]
    hf = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    params = _convert_hf_weights(params, hf, 2)
    return tmodel, params, fmodel


def test_hf_weight_conversion_matches_torch(tiny_roberta_pair):
    torch = pytest.importorskip("torch")
    tmodel, params, fmodel = tiny_roberta_pair
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    ids = rng.integers(2, 128, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0          # ragged padding on row 1
    ids[1, 8:] = 1           # pad id

    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(fmodel.apply({"params": params}, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    # padded rows attend over garbage in torch too, compare real tokens only
    err = np.abs(got[0] - ref[0]).max()
    err1 = np.abs(got[1, :8] - ref[1, :8]).max()
    assert max(err, err1) < 2e-4, (err, err1)


def test_hf_position_id_quirk(tiny_roberta_pair):
    """RoBERTa position ids: pad stays at pad_id, real tokens count from
    pad_id+1 — shifting the pad prefix must shift activations with it."""
    torch = pytest.importorskip("torch")
    tmodel, params, fmodel = tiny_roberta_pair
    import jax.numpy as jnp

    ids = np.full((1, 10), 1, np.int64)
    ids[0, :6] = [5, 9, 17, 3, 44, 23]
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(fmodel.apply({"params": params}, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    assert np.abs(got[0, :6] - ref[0, :6]).max() < 2e-4


# -- real-codebert goldens (fixture-gated) ----------------------------------

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE_DIR, "tokenizations.json")),
    reason="codebert-base fixtures not captured in this environment "
           "(zero-egress; run tools/capture_hf_fixtures.py where the HF "
           "cache exists)")


@needs_fixtures
def test_real_tokenizer_goldens():
    with open(os.path.join(FIXTURE_DIR, "tokenizations.json")) as f:
        data = json.load(f)
    from sct_gan_tpu.data import SolidityTokenizer, get_tokenizer
    tok = get_tokenizer()      # resolves to HF when cached, else hermetic
    if isinstance(tok, SolidityTokenizer):
        pytest.skip("HF tokenizer unavailable; goldens need the real one")
    for fx in data["fixtures"]:
        enc = tok(fx["code"], truncation=True, max_length=128)
        assert enc["input_ids"] == fx["input_ids"]


@needs_fixtures
def test_real_codebert_activation_checksum():
    with open(os.path.join(FIXTURE_DIR, "activation.json")) as f:
        data = json.load(f)
    import jax
    import jax.numpy as jnp

    from sct_gan_tpu.variants.codebert import (FlaxCodeBERT,
                                               load_codebert_params)
    model = FlaxCodeBERT()
    params = load_codebert_params(model, data["model"])
    try:
        from transformers import AutoModel  # probe: real weights loadable?
        AutoModel.from_pretrained(data["model"])
    except Exception:
        pytest.skip("codebert-base weights not cached; checksum needs them")
    ids = jnp.asarray([data["input_ids"]], jnp.int32)
    out = np.asarray(model.apply({"params": params}, ids,
                                 jnp.ones_like(ids)))
    assert abs(float(out.mean()) - data["mean"]) < 1e-3
    assert abs(float(out.std()) - data["std"]) < 1e-3
    np.testing.assert_allclose(out[0, 0, :16], data["first_row_head"],
                               atol=5e-3)
