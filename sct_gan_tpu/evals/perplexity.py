"""Generation-quality metrics: teacher-forced perplexity.

The BASELINE north star is "detection F1 + generation perplexity parity"
(BASELINE.json). The reference never computes perplexity explicitly — its
generation loss is CE + syntax penalty (SCT-GAN/train.py:314-332) — so this
is the standard definition: exp(mean token cross-entropy) of the LM head
teacher-forced on held-out contracts, computed in one batched jitted sweep.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ce_sums(model, params, batch):
    out = model.apply(
        {"params": params},
        input_ids=batch["input_ids"],
        attention_mask=batch["attention_mask"],
        ast_input_ids=batch["ast_input_ids"],
        ast_attention_mask=batch["ast_attention_mask"],
        target_ids=batch["input_ids"],
        token_to_line=batch["token_to_line"],
        deterministic=True)
    logits = out["logits"]                               # (B, S-1, V)
    targets = out["target_ids"]                          # (B, S-1)
    # materialization-free nll (see losses/syntax.py::cross_entropy_loss)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logits, targets[..., None],
                                 axis=-1)[..., 0].astype(jnp.float32)
    nll = lse - picked
    mask = (targets != 0).astype(jnp.float32)            # ignore padding
    return (nll * mask).sum(), mask.sum(), nll.sum(), jnp.float32(nll.size)


def compute_perplexity(model, params, dataloader,
                       max_batches: Optional[int] = None
                       ) -> Dict[str, float]:
    """Teacher-forced perplexity over a dataloader.

    Returns both the padding-masked perplexity (standard) and the all-token
    variant matching the reference's unmasked CE convention
    (SCT-GAN/train.py:324 does not ignore padding).
    """
    step = jax.jit(lambda p, b: _ce_sums(model, p, b))
    tot_masked = 0.0
    tot_tokens = 0.0
    tot_all = 0.0
    tot_all_n = 0.0
    for i, batch in enumerate(dataloader):
        if max_batches is not None and i >= max_batches:
            break
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)}
        s_m, n_m, s_a, n_a = jax.device_get(step(params, device_batch))
        tot_masked += float(s_m)
        tot_tokens += float(n_m)
        tot_all += float(s_a)
        tot_all_n += float(n_a)
    ce_masked = tot_masked / max(tot_tokens, 1.0)
    ce_all = tot_all / max(tot_all_n, 1.0)
    return {
        "cross_entropy": ce_masked,
        "perplexity": math.exp(min(ce_masked, 30.0)),
        "cross_entropy_unmasked": ce_all,
        "perplexity_unmasked": math.exp(min(ce_all, 30.0)),
        "tokens": tot_tokens,
    }
