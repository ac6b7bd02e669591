"""Variant factory: assemble any of the four reference model families.

| name             | reference dir            | model / trainer |
|------------------|--------------------------|-----------------|
| "binary-tasc"    | Binary-TASC-model/       | SmartContractVulnerabilityGAN (binary) + VulnerabilityDetectionTrainer |
| "multiclass-tasc"| MultiClass-TASC-model/   | + VulnerabilityClassifier & PatternMatcher weak labels |
| "model-v3"       | Model-v3/                | SmartContractTransformer (no GAN/aug) + SmartContractTrainer |
| "sct-gan"        | SCT-GAN/ (canonical)     | SmartContractTransformer (GAN+aug) + SmartContractTrainer |

(`final-model/` is byte-identical to SCT-GAN — same assembly.)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from ..config import (TASCConfig, VariantConfig, binary_tasc_config,
                      model_v3_config, multiclass_tasc_config, sct_gan_config)

VARIANTS = ("binary-tasc", "multiclass-tasc", "model-v3", "sct-gan",
            "final-model")


def build_variant(name: str, overrides: Optional[Dict[str, Any]] = None
                  ) -> Tuple[Any, Any]:
    """Return (model, config) for a variant name."""
    overrides = overrides or {}
    name = name.lower()
    if name in ("sct-gan", "final-model"):
        cfg = sct_gan_config(**overrides)
        from ..models.sct_transformer import SmartContractTransformer
        return SmartContractTransformer(cfg.model), cfg
    if name == "model-v3":
        cfg = model_v3_config(**overrides)
        from ..models.sct_transformer import SmartContractTransformer
        return SmartContractTransformer(cfg.model), cfg
    if name == "binary-tasc":
        cfg = binary_tasc_config(**overrides)
        from .tasc import SmartContractVulnerabilityGAN
        return SmartContractVulnerabilityGAN(cfg), cfg
    if name == "multiclass-tasc":
        cfg = multiclass_tasc_config(**overrides)
        from .tasc import SmartContractVulnerabilityGAN
        return SmartContractVulnerabilityGAN(cfg), cfg
    raise ValueError(f"unknown variant {name!r}; choose from {VARIANTS}")


def build_trainer(name: str, model, config, train_loader, val_loader,
                  tokenizer, **kwargs):
    """Return the matching trainer for a built variant."""
    name = name.lower()
    if name in ("sct-gan", "final-model", "model-v3"):
        from ..train.trainer import SmartContractTrainer
        return SmartContractTrainer(model, train_loader, val_loader,
                                    tokenizer, config=config.train, **kwargs)
    from .tasc_trainer import VulnerabilityDetectionTrainer
    return VulnerabilityDetectionTrainer(model, train_loader, val_loader,
                                         tokenizer=tokenizer,
                                         learning_rate=config.learning_rate,
                                         beta1=config.adam_b1, **kwargs)


def generate_vulnerable_code(model, params, rng, num_samples: int = 1,
                             tokenizer=None, max_length: Optional[int] = None
                             ) -> Dict[str, Any]:
    """TASC noise→code generation (model_code_loc.py:518-553): noise through
    the Generator, decoder memory = the synthetic embedding, KV-cached
    sampled decode, classifier scores on the synthetic embedding."""
    import jax
    import jax.numpy as jnp
    from .tasc import make_tasc_generate_fn

    cfg = model.config
    rng, noise_rng, gen_rng = jax.random.split(rng, 3)
    noise = jax.random.normal(noise_rng, (num_samples, cfg.d_model))
    synthetic = model.apply({"params": params}, noise,
                            method=lambda m, x: m.generator(x))
    memory = synthetic[:, None, :]                  # (N, 1, d)
    gen_fn = make_tasc_generate_fn(model, max_length=max_length)
    tokens = gen_fn(params, memory, gen_rng)
    out: Dict[str, Any] = {"tokens": tokens}
    if tokenizer is not None:
        import numpy as np
        out["code"] = tokenizer.decode(np.asarray(tokens)[0])
    if cfg.multiclass:
        vout = model.apply({"params": params}, synthetic,
                           method=lambda m, x: m.vulnerability_classifier(x))
        out["vulnerability_scores"] = vout["vulnerability_scores"]
        out["vulnerability_locations"] = vout["attention_weights"]
    return out
