"""TASC legacy-variant tests: module shapes, GAN wrapper outputs, trainer
loop (binary + multiclass), generation, SolidityCodeLoss behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.config import TASCConfig
from sct_gan_tpu.data.tasc_dataset import (TASCDataLoader, TASCDataset,
                                           tasc_records_from_corpus)
from sct_gan_tpu.data.tokenizer import SolidityTokenizer
from sct_gan_tpu.variants import (FlaxCodeBERT, SmartContractVulnerabilityGAN,
                                  SolidityCodeLoss,
                                  VulnerabilityDetectionTrainer,
                                  get_vulnerability_explanation,
                                  load_codebert_params, make_tasc_generate_fn)

TINY = TASCConfig(d_model=32, nhead=2, num_layers=1, dim_feedforward=64,
                  dropout=0.1, vocab_size=256, decoder_vocab_size=128,
                  max_gen_length=16, multiclass=True,
                  num_vulnerability_types=4, compute_dtype="float32",
                  codebert_num_layers=1, codebert_nhead=2, codebert_ffn=64,
                  max_length=32)


@pytest.fixture(scope="module")
def tok():
    return SolidityTokenizer(vocab_size=TINY.vocab_size)


@pytest.fixture(scope="module")
def loaders(tok):
    records = tasc_records_from_corpus(n=6, seed=0, multiclass=True)
    ds = TASCDataset(records, tok, max_length=TINY.max_length,
                     multiclass=True)
    return (TASCDataLoader(ds, batch_size=3, shuffle=True),
            TASCDataLoader(ds, batch_size=3))


def test_codebert_embedder_shapes():
    cb = FlaxCodeBERT(vocab_size=TINY.vocab_size, d_model=32, num_layers=1,
                      num_heads=2, dim_feedforward=64)
    params = load_codebert_params(cb, model_name="nonexistent/offline")
    ids = jnp.ones((2, 16), jnp.int32)
    out = cb.apply({"params": params}, ids, jnp.ones_like(ids))
    assert out.shape == (2, 16, 32)
    assert bool(jnp.isfinite(out).all())


@pytest.fixture(scope="module")
def gan_and_params():
    model = SmartContractVulnerabilityGAN(TINY)
    emb = jnp.zeros((2, 8, TINY.d_model))
    tgt = jnp.zeros((2, 6), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, emb, emb,
                        target_sequence=tgt, deterministic=True)["params"]
    return model, params


def test_gan_wrapper_outputs(gan_and_params):
    model, params = gan_and_params
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((2, 8, TINY.d_model)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, TINY.decoder_vocab_size, (2, 6)),
                      jnp.int32)
    out = model.apply({"params": params}, emb, emb, target_sequence=tgt,
                      deterministic=True)
    assert out["embeddings"].shape == (2, 8, TINY.d_model)
    assert out["synthetic"].shape == (2, TINY.d_model)
    assert out["real_scores"].shape == (2, 1)
    assert float(out["real_scores"].min()) >= 0.0   # sigmoid outputs
    assert float(out["real_scores"].max()) <= 1.0
    assert out["decoded_code"].shape == (2, 6, TINY.decoder_vocab_size)
    assert out["vulnerability_scores"].shape == (2, 4)
    assert set(out["pattern_scores"]) == {
        "timestamp_dependence", "reentrancy", "integer_overflow",
        "dangerous_delegatecall"}
    assert out["pattern_scores"]["reentrancy"].shape == (2, 4)


def test_tasc_generation(gan_and_params):
    model, params = gan_and_params
    gen = make_tasc_generate_fn(model, max_length=12)
    memory = jnp.zeros((2, 8, TINY.d_model))
    tokens = np.asarray(gen(params, memory, jax.random.PRNGKey(0)))
    assert tokens.shape == (2, 12)
    assert (tokens[:, 0] == 0).all()   # pragma seed token


def test_vulnerability_explanations():
    scores = {
        "timestamp_dependence": np.array([[0.9, 0.8, 0.1]]),
        "reentrancy": np.array([[0.9, 0.9, 0.9, 0.1]]),
        "integer_overflow": np.array([[0.9, 0.1, 0.1]]),
        "dangerous_delegatecall": np.array([[0.9, 0.1]]),
    }
    ex = get_vulnerability_explanation(scores, index=0)
    assert len(ex) == 4
    zero = {k: np.zeros_like(v) for k, v in scores.items()}
    assert get_vulnerability_explanation(zero, index=0) == []


def test_solidity_code_loss(tok):
    loss_fn = SolidityCodeLoss(vocab_size=64)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 8, 64)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, 64, (2, 8)), jnp.int32)
    loss = loss_fn(logits, targets)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # syntax checker
    good = "pragma solidity ^0.8.0;\ncontract A { function f() public {} }"
    assert SolidityCodeLoss.check_solidity_syntax(good)
    assert not SolidityCodeLoss.check_solidity_syntax("contract A {}")
    assert not SolidityCodeLoss.check_solidity_syntax(
        good.replace("}", "", 1))
    sim = SolidityCodeLoss.compute_semantic_similarity(good, good)
    assert sim == pytest.approx(1.0)


@pytest.mark.slow
@pytest.mark.parametrize("multiclass", [False, True])
def test_tasc_trainer_epoch(tok, loaders, multiclass):
    cfg = TASCConfig(**{**TINY.__dict__, "multiclass": multiclass})
    model = SmartContractVulnerabilityGAN(cfg)
    trainer = VulnerabilityDetectionTrainer(
        model, loaders[0], loaders[1], learning_rate=1e-3, tokenizer=tok,
        verbose=False)
    g, d, dec = trainer.train_epoch()
    assert all(np.isfinite(x) for x in (g, d, dec))
    val = trainer.validate()
    assert np.isfinite(val)
    hist = trainer.training_history
    assert len(hist["g_loss"]) == 1 and len(hist["val_loss"]) == 1


@pytest.mark.slow
def test_tasc_checkpoint_roundtrip(tok, loaders, tmp_path):
    """Save → restore into a FRESH trainer → continue training: params,
    all per-submodule optimizer states, best val loss and history survive
    the round trip (Binary-TASC-model/main.ipynb cell 21 contract)."""
    cfg = TASCConfig(**{**TINY.__dict__, "multiclass": True})

    def make_trainer():
        return VulnerabilityDetectionTrainer(
            SmartContractVulnerabilityGAN(cfg), loaders[0], loaders[1],
            learning_rate=1e-3, tokenizer=tok, verbose=False)

    t1 = make_trainer()
    t1.train(1, checkpoint_dir=str(tmp_path))
    assert (tmp_path / "tasc_best.meta.json").exists()
    path = str(tmp_path / "tasc_best")

    t2 = make_trainer()
    epochs_run = t2.restore(path)
    assert epochs_run == 1
    assert t2.best_val_loss == pytest.approx(t1.best_val_loss)
    assert t2.training_history["g_loss"] == pytest.approx(
        t1.training_history["g_loss"])
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer state round-trips leaf-for-leaf (incl. Adam mu/nu)
    l1 = jax.tree_util.tree_leaves(t1.opt_states)
    l2 = jax.tree_util.tree_leaves(t2.opt_states)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    g, d, dec = t2.train_epoch()
    assert all(np.isfinite(x) for x in (g, d, dec))


def test_variant_factory(tok):
    from sct_gan_tpu.variants import VARIANTS, build_variant
    for name in ("binary-tasc", "multiclass-tasc"):
        model, cfg = build_variant(name, dict(
            d_model=32, nhead=2, num_layers=1, dim_feedforward=64,
            vocab_size=256, decoder_vocab_size=128, max_gen_length=16,
            compute_dtype="float32", codebert_num_layers=1, codebert_nhead=2,
            codebert_ffn=64, max_length=32))
        assert model.config.d_model == 32
    model, cfg = build_variant("model-v3")
    assert model.config.use_gan is False
    model, cfg = build_variant("sct-gan")
    assert model.config.use_gan is True
    model, cfg = build_variant("final-model")
    assert model.config.use_gan is True


def test_generate_vulnerable_code(gan_and_params, tok):
    import jax
    from sct_gan_tpu.variants import generate_vulnerable_code
    model, params = gan_and_params
    out = generate_vulnerable_code(model, params, jax.random.PRNGKey(0),
                                   num_samples=2, tokenizer=tok,
                                   max_length=12)
    assert out["tokens"].shape == (2, 12)
    assert isinstance(out["code"], str)
    assert out["vulnerability_scores"].shape == (2, 4)


def test_tasc_records_from_hf_maps_notebook_columns(monkeypatch):
    """Hermetic check of the HF ingestion path (Binary-TASC-model/main.ipynb
    cells 3+6): the dataset's `contract_source`/`malicious` columns map into
    TASC records without network access."""
    import sct_gan_tpu.data.tasc_dataset as td

    fake_rows = [
        {"contract_source": "pragma solidity ^0.8.0;\ncontract A {}",
         "malicious": 0},
        {"contract_source": "pragma solidity ^0.8.0;\ncontract B { "
         "function f() public { tx.origin; } }", "malicious": 1},
        {"contract_source": "", "malicious": 1},     # dropped: empty source
    ]

    class _FakeDatasets:
        @staticmethod
        def load_dataset(name, split="train"):
            assert name == "jainabh/smart_contracts_malicious"
            assert split == "train"
            return fake_rows

    import sys as _sys
    monkeypatch.setitem(_sys.modules, "datasets", _FakeDatasets)
    recs = td.load_hf_tasc_records()
    assert [r["malicious"] for r in recs] == [0, 1]
    assert recs[1]["source_code"].startswith("pragma")

    # and the records feed the dataset builder
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    ds = td.TASCDataset(recs, SolidityTokenizer(vocab_size=512),
                        max_length=64)
    assert len(ds) == 2
    assert ds[1]["label"] == 1.0
