"""sct_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for smart-contract
vulnerability detection, localization, and synthetic contract generation.

Rebuilt from scratch with the capabilities of the SCT-GAN reference
(joaocrisostomo/SCT-GAN): a dual-stream (contract + AST-path) Transformer
encoder-decoder with contract-level and line-level vulnerability heads and an
integrated GAN discriminator, plus the earlier Binary-TASC / MultiClass-TASC /
Model-v3 variants.

Layout:
    ops/       Pallas kernels + pure-JAX reference implementations (attention,
               segment-mean line aggregation, sampling, KV-cache decode)
    models/    flax.linen model definitions (SCT transformer, TASC variants)
    data/      host-side pipeline: parsing, tokenization, labels, augmentation
    losses/    focal / spatial-focal / syntax / contract-focal losses
    train/     jit-compiled train step, host control loop, checkpointing
    infer/     SmartContractAnalyzer serving API, KV-cached generation
    evals/     metrics + evaluation harness (per-type thresholds, JSON report)
    parallel/  device mesh + sharding rules (data/tensor parallel over ICI)
"""

__version__ = "0.1.0"

VULNERABILITY_TYPES = [
    "ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO", "Tx-Origin", "UE",
]

# Lazy top-level API: heavy submodules (jax, flax) load on first access.
_LAZY = {
    "SmartContractTransformer": ("sct_gan_tpu.models", "SmartContractTransformer"),
    "SmartContractTrainer": ("sct_gan_tpu.train", "SmartContractTrainer"),
    "SmartContractAnalyzer": ("sct_gan_tpu.infer", "SmartContractAnalyzer"),
    "SmartContractVulnerabilityGAN": (
        "sct_gan_tpu.variants", "SmartContractVulnerabilityGAN"),
    "VulnerabilityDetectionTrainer": (
        "sct_gan_tpu.variants", "VulnerabilityDetectionTrainer"),
    "ModelConfig": ("sct_gan_tpu.config", "ModelConfig"),
    "TrainConfig": ("sct_gan_tpu.config", "TrainConfig"),
    "DataConfig": ("sct_gan_tpu.config", "DataConfig"),
    "TASCConfig": ("sct_gan_tpu.config", "TASCConfig"),
    "VariantConfig": ("sct_gan_tpu.config", "VariantConfig"),
    "sct_gan_config": ("sct_gan_tpu.config", "sct_gan_config"),
    "model_v3_config": ("sct_gan_tpu.config", "model_v3_config"),
    "evaluate_model_performance": (
        "sct_gan_tpu.evals", "evaluate_model_performance"),
    "create_dataloaders": ("sct_gan_tpu.data", "create_dataloaders"),
    "get_tokenizer": ("sct_gan_tpu.data", "get_tokenizer"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'sct_gan_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
