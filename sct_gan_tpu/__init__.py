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
