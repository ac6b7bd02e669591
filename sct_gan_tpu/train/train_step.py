"""The jit-compiled training and validation steps.

One fused XLA program per step: forward (all heads + GAN discriminator), the
full loss mix, backward, 3-tier clipping, Adam, per-group LR scaling, and the
NaN/explosion skip — compiled once, then pure device execution. Everything the
reference mutates between batches/epochs (loss weights, focal α/γ, LRs,
stability scales — SCT-GAN/train.py:906-907, 1172-1194, 1529-1654) enters as
runtime scalars so the executable never recompiles.

Loss-mix parity (SCT-GAN/train.py:1243-1270):
    aug+gan : 0.5·gen + 0.25·contract·w_c + 0.2·line·w_l + 0.05·disc [+0.02·adv]
    aug     : 0.6·gen + 0.25·contract·w_c + 0.15·line·w_l
    plain   : 0.5·gen + 0.3·contract·w_c + 0.2·line·w_l
with loss floors (contract 1e-4, line 1e-6) and the high-line-loss
down-scaling (×0.1 above 5.0, ×0.5 above 1.0; train.py:1184-1194).

GAN terms (train.py:1201-1234): disc BCE toward "real", overconfidence
penalties (conf > 0.8: +1.0·E[σ²] + 2.0·E[σ⁴]), and a 0.02-weighted
adversarial term active only when conf < 0.3 — all expressed with jnp.where
so the graph stays single-compilation.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.focal import (contract_level_focal_loss, masked_mean,
                            spatial_aware_focal_loss)
from ..losses.syntax import SyntaxLossTables, solidity_syntax_loss
from .optimizer import GroupLRs, apply_group_lrs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class DynamicScalars(NamedTuple):
    """Host-mutated runtime scalars fed to every step (no recompiles)."""

    line_vuln_weight: jnp.ndarray      # warmup·stability·scale adjusted
    contract_vuln_weight: jnp.ndarray  # 3.0 (train.py:705)
    spatial_alpha: jnp.ndarray
    spatial_gamma: jnp.ndarray
    spatial_weight: jnp.ndarray

    @classmethod
    def init(cls) -> "DynamicScalars":
        return cls(jnp.float32(0.0), jnp.float32(3.0), jnp.float32(0.25),
                   jnp.float32(2.0), jnp.float32(0.2))


def compute_losses(model, params, batch, scalars: DynamicScalars, rng,
                   *, use_gan: bool, use_augmentation: bool, tables,
                   deterministic: bool, fused_lm_ce: bool = False):
    """Forward + full loss mix. Returns (total_loss, metrics).

    ``batch['row_valid']`` (B,), when present, marks static-padding rows
    added by trainer._pad_to_dp with 0 — those rows are excluded from every
    loss mean and metric so padded and unpadded tail batches produce
    identical loss/gradients (the reference never pads).

    ``fused_lm_ce``: compute the generation CE through the fused
    LM-head+CE custom VJP (ops/fused_ce.py) — same value, scatter-free
    backward, no materialized (B, S, 50k) logits between model and loss."""
    target_ids = batch["target_ids"] if (use_augmentation and
                                         "target_ids" in batch) else batch["input_ids"]
    row_mask = batch.get("row_valid")
    rngs = {} if deterministic else {"dropout": rng}
    outputs = model.apply(
        {"params": params},
        input_ids=batch["input_ids"],
        attention_mask=batch["attention_mask"],
        ast_input_ids=batch["ast_input_ids"],
        ast_attention_mask=batch["ast_attention_mask"],
        target_ids=target_ids,
        token_to_line=batch["token_to_line"],
        deterministic=deterministic,
        return_lm_hidden=fused_lm_ce,
        rngs=rngs,
    )

    if fused_lm_ce:
        from ..losses.syntax import syntax_penalty
        from ..ops.fused_ce import fused_linear_cross_entropy
        ol = params["output_layer"]
        ce = fused_linear_cross_entropy(
            outputs["lm_hidden"], ol["kernel"], ol["bias"],
            outputs["target_ids"], row_mask,
            int(model.config.vocab_size))
        syntax_pen = syntax_penalty(outputs["target_ids"], tables,
                                    row_mask=row_mask)
        gen_loss = ce + 0.5 * syntax_pen     # syntax_weight (train.py:314)
    else:
        gen_loss, ce, syntax_pen = solidity_syntax_loss(
            outputs["logits"], outputs["target_ids"], tables,
            row_mask=row_mask)

    contract_loss = contract_level_focal_loss(
        outputs["contract_vulnerability_logits"],
        batch["contract_vulnerabilities"].astype(jnp.float32),
        alpha=0.05, gamma=4.0, row_mask=row_mask)

    # labels come in (B, 8, L); logits are (B, L, 8) — the reference detects
    # and fixes this transposition at train.py:981-991.
    line_labels = batch["vulnerable_lines"].transpose(0, 2, 1).astype(jnp.float32)
    line_logits = outputs["line_vulnerability_logits"]
    line_loss = spatial_aware_focal_loss(
        line_logits, line_labels, batch["token_to_line"],
        alpha=scalars.spatial_alpha, gamma=scalars.spatial_gamma,
        spatial_weight=scalars.spatial_weight, row_mask=row_mask)

    # Loss floors (train.py:1184-1186) and high-loss scaling (1189-1194).
    contract_loss = jnp.maximum(contract_loss, 1e-4)
    line_loss = jnp.maximum(line_loss, 1e-6)
    line_loss = jnp.where(line_loss > 5.0, line_loss * 0.1,
                          jnp.where(line_loss > 1.0, line_loss * 0.5,
                                    line_loss))

    disc_loss = jnp.float32(0.0)
    adv_loss = jnp.float32(0.0)
    disc_conf = jnp.float32(0.5)
    if use_gan:
        disc_logits = outputs["discriminator_logits"]
        real = jnp.ones_like(disc_logits)
        fake = jnp.zeros_like(disc_logits)
        disc_loss = masked_mean(
            optax.sigmoid_binary_cross_entropy(disc_logits, real), row_mask)
        sig = jax.nn.sigmoid(disc_logits)
        disc_conf = masked_mean(sig, row_mask)
        conf_pen = jnp.where(disc_conf > 0.8,
                             1.0 * masked_mean(sig ** 2, row_mask)
                             + 2.0 * masked_mean(sig ** 4, row_mask),
                             0.0)
        disc_loss = disc_loss + conf_pen
        adv_loss = jnp.where(
            disc_conf < 0.3,
            masked_mean(optax.sigmoid_binary_cross_entropy(disc_logits, fake),
                        row_mask), 0.0)

    w_c = scalars.contract_vuln_weight
    w_l = scalars.line_vuln_weight
    if use_augmentation and use_gan:
        total = (0.5 * gen_loss + 0.25 * contract_loss * w_c
                 + 0.2 * line_loss * w_l + 0.05 * disc_loss)
        total = total + 0.02 * adv_loss
    elif use_augmentation:
        total = 0.6 * gen_loss + 0.25 * contract_loss * w_c + 0.15 * line_loss * w_l
    else:
        total = 0.5 * gen_loss + 0.3 * contract_loss * w_c + 0.2 * line_loss * w_l
        if use_gan:
            total = total + 0.05 * disc_loss + 0.02 * adv_loss

    if row_mask is None:
        ll_mean, ll_std = line_logits.mean(), line_logits.std()
    else:
        ll_mean = masked_mean(line_logits, row_mask)
        ll_std = jnp.sqrt(jnp.maximum(
            masked_mean((line_logits - ll_mean) ** 2, row_mask), 0.0))
    metrics = {
        "gen_loss": gen_loss,
        "ce_loss": ce,
        "syntax_loss": syntax_pen,
        "contract_vuln_loss": contract_loss,
        "line_vuln_loss": line_loss,
        "discriminator_loss": disc_loss,
        "discriminator_confidence": disc_conf,
        "total_loss": total,
        "line_logits_mean": ll_mean,
        "line_logits_std": ll_std,
    }
    return total, (metrics, line_logits, line_labels, row_mask)


def _line_batch_metrics(line_logits, line_labels, row_mask=None):
    """Adaptive-threshold batch metrics (train.py:1047-1155).

    Quantile-based threshold with conservative/ultra fallbacks, then
    precision/recall/accuracy against the line labels — all on-device.
    ``row_mask`` (B,) excludes static-padding rows (trainer._pad_to_dp)
    from the quantiles, counts, and averages so padded tail batches report
    the same numbers as unpadded ones.
    """
    probs = jax.nn.sigmoid(line_logits)
    if row_mask is not None:
        valid = jnp.broadcast_to(
            row_mask.astype(bool).reshape(-1, 1, 1), probs.shape)
        # invalid entries sort to the top; quantile positions index only
        # the first n (valid) entries, so pads never influence thresholds
        sorted_p = jnp.sort(jnp.where(valid, probs, jnp.inf).ravel())
        n = row_mask.astype(jnp.float32).sum() * probs.shape[1] * probs.shape[2]

        def _q(quant):
            pos = quant * (n - 1.0)
            lo = jnp.floor(pos).astype(jnp.int32)
            w = (pos - jnp.floor(pos)).astype(jnp.float32)
            hi = jnp.minimum(lo + 1, (n - 1.0).astype(jnp.int32))
            return sorted_p[lo] * (1.0 - w) + sorted_p[hi] * w
    else:
        valid = None
        # One sort serves all three quantiles (0.99/0.995/0.999) —
        # jnp.quantile would sort the full tensor once per call. Same
        # linear interpolation.
        sorted_p = jnp.sort(probs.ravel())
        n = sorted_p.shape[0]

        def _q(quant):
            pos = quant * (n - 1)
            lo = jnp.int32(int(np.floor(pos)))
            w = jnp.float32(pos - np.floor(pos))
            return sorted_p[lo] * (1.0 - w) + sorted_p[jnp.minimum(lo + 1, n - 1)] * w

    mask_or = lambda p: p if valid is None else p & valid
    q99 = _q(0.99)
    neg_regime = masked_mean(line_logits, row_mask) < -1.0
    thr = jnp.where(neg_regime,
                    jnp.clip(q99, 0.1, 0.4),
                    jnp.clip(q99, 0.3, 0.6))
    preds = mask_or(probs > thr)
    n_pred = preds.sum()

    # too-many-prediction fallbacks (train.py:1069-1086)
    cons_thr = jnp.minimum(0.8, _q(0.995))
    preds = jnp.where(n_pred > 10000, mask_or(probs > cons_thr), preds)
    n_pred = preds.sum()
    ultra_thr = jnp.minimum(0.9, _q(0.999))
    preds = jnp.where(n_pred > 5000, mask_or(probs > ultra_thr), preds)
    n_pred = preds.sum()

    # no-prediction fallbacks (train.py:1088-1105)
    pmax = (probs if valid is None else jnp.where(valid, probs, 0.0)).max()
    fb_thr = jnp.minimum(0.3, pmax * 0.5)
    preds = jnp.where((n_pred == 0) & (pmax > 0.1),
                      mask_or(probs > fb_thr), preds)
    n_pred = preds.sum()
    ufb_thr = jnp.maximum(0.01, pmax * 0.3)
    preds = jnp.where(n_pred == 0, mask_or(probs > ufb_thr), preds)

    predf = preds.astype(jnp.float32)
    labelsf = (line_labels if valid is None
               else jnp.where(valid, line_labels, 0.0))
    tp = (predf * labelsf).sum()
    total_vuln = labelsf.sum()
    total_pred = predf.sum()
    recall = jnp.where(total_vuln > 0, tp / jnp.maximum(total_vuln, 1.0), 0.0)
    precision = jnp.where(total_pred > 0, tp / jnp.maximum(total_pred, 1.0), 0.0)
    accuracy = masked_mean((predf == line_labels).astype(jnp.float32),
                           row_mask)
    return {
        "line_vuln_accuracy": accuracy,
        "line_vuln_precision": precision,
        "line_vuln_recall": recall,
        "line_predictions": total_pred,
        "line_threshold": thr,
        "batch_line_vulns": total_vuln,
    }


def make_train_step(model, grad_tx, group_idx, tables: SyntaxLossTables,
                    *, use_gan: bool, use_augmentation: bool,
                    donate: bool = True, fused_opt=None, fusion_mask=None,
                    fused_lm_ce: bool = False):
    """Build the jitted train step.

    step(state, batch, scalars, lrs, rng) -> (state, metrics, next_scalars)

    ``next_scalars`` carries the reference's per-batch focal retuning
    (train.py:1172-1182): the spatial focal α/γ/weight used for the *next*
    batch depend on whether this batch contained line vulnerabilities (the
    reference mutates the loss object after computing the loss).
    """

    def step(state: TrainState, batch, scalars: DynamicScalars,
             lrs: GroupLRs, rng):
        (total, (metrics, line_logits, line_labels, row_mask)), grads = (
            jax.value_and_grad(
                lambda p: compute_losses(
                    model, p, batch, scalars, rng, use_gan=use_gan,
                    use_augmentation=use_augmentation, tables=tables,
                    deterministic=False, fused_lm_ce=fused_lm_ce),
                has_aux=True)(state.params))

        metrics.update(_line_batch_metrics(line_logits, line_labels,
                                           row_mask))

        if fused_opt is not None:
            # single-pass tree optimizer: clip norms, Adam, wd, group LRs,
            # and the NaN/explosion skip all fused into one touch per leaf
            # (optimizer.FusedOptimizer)
            new_params, new_opt_state, gnorm, ok = fused_opt.update(
                grads, state.opt_state, state.params, lrs, total)
            metrics["grad_norm"] = gnorm
            metrics["skipped"] = (~ok).astype(jnp.float32)
        else:
            # gate norm at the same point as FusedOptimizer and the torch
            # hook ordering: after the feature_fusion ±1 clamp (which runs
            # first in the optax chain), before the norm clips. fusion_mask
            # leaves are python bools, so the clamp is applied statically to
            # only the few fusion leaves.
            if fusion_mask is not None:
                gate_grads = jax.tree_util.tree_map(
                    lambda g, m: jnp.clip(g, -1.0, 1.0) if m else g,
                    grads, fusion_mask)
            else:
                gate_grads = grads
            gnorm = optax.global_norm(gate_grads)
            metrics["grad_norm"] = gnorm

            updates, new_opt_state = grad_tx.update(grads, state.opt_state,
                                                    state.params)
            updates = apply_group_lrs(updates, group_idx, lrs)
            new_params = optax.apply_updates(state.params, updates)

            # NaN/Inf-loss and gradient-explosion skip (train.py:1301-1309).
            ok = jnp.isfinite(total) & (gnorm <= 1000.0)
            metrics["skipped"] = (~ok).astype(jnp.float32)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old)
            new_params = keep(new_params, state.params)
            new_opt_state = keep(new_opt_state, state.opt_state)

        # Per-batch focal retune for the next batch (train.py:1172-1182).
        has_line_vulns = metrics["batch_line_vulns"] > 0
        next_scalars = scalars._replace(
            spatial_alpha=jnp.where(has_line_vulns, 0.1, 0.05),
            spatial_gamma=jnp.where(has_line_vulns, 1.5, 1.0),
            spatial_weight=jnp.where(has_line_vulns, 0.1, 0.05),
        )
        new_state = TrainState(new_params, new_opt_state, state.step + 1)
        return new_state, metrics, next_scalars

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model, tables: SyntaxLossTables, *, use_gan: bool,
                   use_augmentation: bool, fused_lm_ce: bool = False):
    """Validation step: eval-mode forward + the reference's val loss mix
    (train.py:1455-1470 — no discriminator term in validation)."""

    def step(params, batch, scalars: DynamicScalars):
        total, (metrics, line_logits, line_labels, _) = compute_losses(
            model, params, batch, scalars, jax.random.PRNGKey(0),
            use_gan=use_gan, use_augmentation=use_augmentation,
            tables=tables, deterministic=True, fused_lm_ce=fused_lm_ce)
        w_c = scalars.contract_vuln_weight
        w_l = scalars.line_vuln_weight
        if use_augmentation:
            val_total = (0.6 * metrics["gen_loss"]
                         + 0.25 * metrics["contract_vuln_loss"] * w_c
                         + 0.15 * metrics["line_vuln_loss"] * w_l)
        else:
            val_total = (0.5 * metrics["gen_loss"]
                         + 0.3 * metrics["contract_vuln_loss"] * w_c
                         + 0.2 * metrics["line_vuln_loss"] * w_l)
        metrics["total_loss"] = val_total
        return metrics

    return jax.jit(step)
