"""Import-swap compat shims: flat-module layout + reference constructor
signatures + class-style losses."""
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.compat import (analyze_contracts, data_augmentation, dataset,
                                inference, model, notebook_utils,
                                pattern_matcher, train)


def test_flat_module_surface():
    assert hasattr(model, "SmartContractTransformer")
    assert hasattr(model, "PositionalEncoding")
    assert hasattr(train, "SmartContractTrainer")
    assert hasattr(train, "FocalLoss")
    assert hasattr(train, "SpatialAwareFocalLoss")
    assert hasattr(train, "SoliditySyntaxLoss")
    assert hasattr(train, "ContractLevelFocalLoss")
    assert hasattr(dataset, "create_dataloaders")
    assert hasattr(dataset, "SmartContractVulnerabilityDataset")
    assert hasattr(dataset, "custom_collate_fn")
    assert hasattr(inference, "SmartContractAnalyzer")
    assert hasattr(data_augmentation, "SmartContractAugmenter")
    assert hasattr(pattern_matcher, "PatternMatcher")
    assert hasattr(notebook_utils, "collect_validation_results")
    assert hasattr(analyze_contracts, "main")


def test_model_reference_constructor():
    m = model.SmartContractTransformer(
        d_model=32, nhead=2, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=64, dropout=0.1, max_length=64, vocab_size=128,
        num_vulnerability_types=8, use_gan=True, compute_dtype="float32")
    assert m.config.d_model == 32
    assert m.config.use_gan is True
    assert m.config.max_lines == 64


def test_positional_encoding_shim():
    pe = model.PositionalEncoding(16, max_len=32)
    x = jnp.zeros((2, 8, 16))
    out = pe(x)
    assert out.shape == (2, 8, 16)
    assert float(out[0, 1, 1]) != 0.0


def test_class_losses():
    logits = jnp.zeros((2, 8))
    target = jnp.ones((2, 8))
    assert float(train.FocalLoss()(logits, target)) > 0
    assert float(train.ContractLevelFocalLoss()(logits, target)) > 0
    sl = train.SpatialAwareFocalLoss()
    # mutable attrs (the trainer retunes these)
    sl.alpha = 0.1
    sl.gamma = 1.5
    v3d = sl(jnp.zeros((2, 16, 8)), jnp.ones((2, 16, 8)),
             jnp.zeros((2, 16), jnp.int32))
    assert np.isfinite(float(v3d))
    # flattened reference calling convention (train.py:990-995)
    flat = sl(jnp.zeros((32, 8)), jnp.ones((32, 8)),
              jnp.zeros(16, jnp.int32))
    assert np.isfinite(float(flat))


def test_syntax_loss_class(tokenizer):
    sl = train.SoliditySyntaxLoss(tokenizer, syntax_weight=0.5)
    logits = jnp.zeros((1, 8, tokenizer.vocab_size))
    targets = jnp.ones((1, 8), jnp.int32)
    total = sl(logits, targets, None)
    assert np.isfinite(float(total))
    pen = sl._compute_simple_syntax_penalty(logits, targets)
    assert np.isfinite(float(pen))


def test_augmentation_shim():
    pairs = data_augmentation.test_augmentation(num_variants=2,
                                                verbose=False)
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in pairs)
