"""Optimizer: AdamW with the reference's 4 learning-rate parameter groups and
three-tier gradient clipping, built so every rate is a *runtime scalar*.

Reference semantics (SCT-GAN/train.py:512-540, 1277-1291):
  * param groups by name match — contract heads (lr×2), line heads (lr×3),
    discriminator (lr×0.5), base (lr×1);
  * AdamW β=(0.9, 0.98), ε=1e-9, weight_decay=0.1;
  * grad clip: global L2 norm to 1.0, then the discriminator subtree to
    0.3·max_norm, then the vulnerability-head subtree to 2.0·max_norm
    (a no-op after the global clip — kept for exact parity);
  * the trainer mutates group LRs between epochs (plateau scheduler, dead-head
    boosts, explosion rescue — train.py:1529-1654).

TPU-native twist: instead of optimizer "param_groups" objects, the group LRs
are a 4-vector of dynamic scalars passed into the jitted train step every
call. Mutating them on the host never triggers a recompile — the XLA
executable is compiled once for the whole training run.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

GROUPS = ("base", "contract", "line", "disc")

# name-substring rules, first match wins (reference order: disc → contract →
# line → base; SCT-GAN/train.py:518-527)
_DISC_KEYS = ("disc_",)
_CONTRACT_KEYS = ("contract_vulnerability_head", "contract_feature_aggregation",
                  "contract_vuln_attention")
_LINE_KEYS = ("line_vulnerability_head", "line_feature_extractor",
              "line_vuln_attention", "vuln_type_attention")
# the separate 2.0·max_norm clip set (train.py:1287-1291): any
# '*vulnerability_head*' + the line feature path modules
_VULN_CLIP_KEYS = ("vulnerability_head", "line_feature_extractor",
                   "line_vuln_attention", "vuln_type_attention")


def _flat_path(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def group_of(path: str, use_gan: bool) -> str:
    if use_gan and any(k in path for k in _DISC_KEYS):
        return "disc"
    if any(k in path for k in _CONTRACT_KEYS):
        return "contract"
    if any(k in path for k in _LINE_KEYS):
        return "line"
    return "base"


def group_index_tree(params, use_gan: bool):
    """Pytree of int32 group indices (into GROUPS), aligned with params."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, v: GROUPS.index(group_of(_flat_path(kp), use_gan)), params)


def _mask_tree(params, pred):
    return jax.tree_util.tree_map_with_path(
        lambda kp, v: pred(_flat_path(kp)), params)


class GroupLRs(NamedTuple):
    """The 4 group learning rates, as runtime scalars."""

    base: jnp.ndarray
    contract: jnp.ndarray
    line: jnp.ndarray
    disc: jnp.ndarray

    @classmethod
    def init(cls, learning_rate: float, contract_mult: float = 2.0,
             line_mult: float = 3.0, disc_mult: float = 0.5) -> "GroupLRs":
        lr = float(learning_rate)
        return cls(jnp.float32(lr), jnp.float32(lr * contract_mult),
                   jnp.float32(lr * line_mult), jnp.float32(lr * disc_mult))

    def as_vector(self) -> jnp.ndarray:
        return jnp.stack([self.base, self.contract, self.line, self.disc])


def build_gradient_transform(params, *, use_gan: bool,
                             max_grad_norm: float = 1.0,
                             adam_b1: float = 0.9, adam_b2: float = 0.98,
                             adam_eps: float = 1e-9,
                             weight_decay: float = 0.1):
    """LR-less gradient transform: 3-tier clip → Adam → decoupled weight decay.

    The final per-group ``-lr`` scaling is applied by ``apply_group_lrs`` in
    the train step with runtime scalars.
    """
    disc_mask = _mask_tree(params,
                           lambda p: any(k in p for k in _DISC_KEYS))
    vuln_mask = _mask_tree(params,
                           lambda p: any(k in p for k in _VULN_CLIP_KEYS))
    fusion_mask = _mask_tree(params, lambda p: "feature_fusion" in p)
    # per-parameter ±1.0 clamp on the fusion layer — the reference registers
    # grad hooks that clamp during backward, i.e. before any norm clipping
    # (SCT-GAN/model.py:284-286, 385-387)
    chain = [optax.masked(optax.clip(1.0), fusion_mask),
             optax.clip_by_global_norm(max_grad_norm)]
    if use_gan:
        chain.append(optax.masked(
            optax.clip_by_global_norm(max_grad_norm * 0.3), disc_mask))
    chain.append(optax.masked(
        optax.clip_by_global_norm(max_grad_norm * 2.0), vuln_mask))
    chain.append(optax.scale_by_adam(b1=adam_b1, b2=adam_b2, eps=adam_eps))
    # torch AdamW couples weight decay with the group lr: p -= lr*(adam + wd*p).
    # add_decayed_weights before the lr scale reproduces that exactly.
    chain.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*chain)


def apply_group_lrs(updates, group_idx, lrs: GroupLRs):
    """updates[leaf] *= -lr[group(leaf)] — the runtime-scalar LR stage."""
    lr_vec = lrs.as_vector()
    return jax.tree_util.tree_map(
        lambda u, g: u * (-lr_vec[g]).astype(u.dtype), updates, group_idx)


# -- host-side schedulers ----------------------------------------------------

class ReduceLROnPlateau:
    """Host-side plateau scheduler with the reference's settings
    (SCT-GAN/train.py:543-550): mode=min, factor=0.3, patience=5,
    min_lr=1e-6. Scales all four group LRs together, like torch does."""

    def __init__(self, factor: float = 0.3, patience: int = 5,
                 min_lr: float = 1e-6):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float, lrs: Dict[str, float]) -> Tuple[Dict[str, float], bool]:
        """Returns (possibly reduced lrs, reduced?)."""
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
            return lrs, False
        self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            new = {k: max(v * self.factor, self.min_lr)
                   for k, v in lrs.items()}
            return new, True
        return lrs, False

    def state_dict(self) -> Dict:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: Dict) -> None:
        self.best = d.get("best", float("inf"))
        self.num_bad = d.get("num_bad", 0)
