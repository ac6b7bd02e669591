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
import numpy as np
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


def fusion_mask_tree(params):
    """Pytree of python bools: leaves under the feature_fusion grad-hook
    clamp (SCT-GAN/model.py:284-286). Static — used to compute the skip-gate
    norm at the same (post-clamp) point as the torch hook ordering."""
    return _mask_tree(params, lambda p: "feature_fusion" in p)


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


# -- fused single-pass tree optimizer ----------------------------------------

class FusedOptimizer:
    """The whole gradient transform as ONE pass over the parameter tree.

    Numerically identical to build_gradient_transform + apply_group_lrs +
    apply_updates + the skip keep-where (tests/test_fused_optimizer.py), but
    structured for launch-overhead-dominated runtimes:

      * the optax chain rewrites the full gradient tree once per stage
        (fusion clamp → global clip → disc clip → vuln clip → Adam → wd),
        then the train step adds a keep-where over params AND optimizer
        state — ~7k device ops and ~3 extra full-tree memory sweeps per
        step on the 405-leaf/224M-param model (measured 18.5 ms vs a ~6 ms
        bandwidth ideal; a concat-into-one-vector design measured WORSE,
        33.1 ms — the 896 MB gather/scatter swamps what it saves);
      * here each leaf is touched exactly once: one sum-of-squares reduce
        (feeding the global/subset norms) and one fused
        clip·Adam·wd·LR·gate computation. All clip factors are SCALARS
        composed analytically — scaling a set by s scales its subset norm
        by s, so the sequential optax semantics (subset norms taken on
        post-global-clip values) compose exactly without materializing
        intermediate trees;
      * the NaN/explosion skip (train.py:1301-1309) is folded into the
        scalar coefficients (lr→0, β→1, 1-β→0, count increment→0): a
        skipped step leaves params/mu/nu bit-identical with ZERO extra
        per-leaf where ops.

    No concat, no slicing — works under any mesh sharding (mp included):
    the reductions lower to the appropriate collectives under GSPMD.
    """

    def __init__(self, params, *, use_gan: bool, max_grad_norm: float = 1.0,
                 adam_b1: float = 0.9, adam_b2: float = 0.98,
                 adam_eps: float = 1e-9, weight_decay: float = 0.1):
        self.use_gan = use_gan
        self.max_norm = float(max_grad_norm)
        self.b1, self.b2, self.eps = float(adam_b1), float(adam_b2), float(adam_eps)
        self.wd = float(weight_decay)
        # static per-leaf annotations: (group index, in-vuln-clip-set,
        # in-disc-clip-set, fusion-clamp)
        self._meta = []
        for kp, _ in jax.tree_util.tree_leaves_with_path(params):
            path = _flat_path(kp)
            self._meta.append((
                GROUPS.index(group_of(path, use_gan)),
                any(k in path for k in _VULN_CLIP_KEYS),
                use_gan and any(k in path for k in _DISC_KEYS),
                "feature_fusion" in path,
            ))
        self._treedef = jax.tree_util.tree_structure(params)

    def init(self, params):
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        return {"count": jnp.zeros((), jnp.int32), "mu": zeros,
                "nu": jax.tree_util.tree_map(jnp.copy, zeros)}

    def update(self, grads, opt_state, params, lrs: GroupLRs, total_loss):
        """Returns (new_params, new_opt_state, grad_norm, ok).

        ``ok`` is the NaN/explosion skip gate. The gate norm is taken after
        the fusion ±1 grad-hook clamp — matching torch, where backward hooks
        run before clip_grad_norm_ sees the grads."""
        g_leaves = [g.astype(jnp.float32) for g in
                    jax.tree_util.tree_leaves(grads)]
        # fusion grad-hook clamp (model.py:284-286) — a handful of leaves
        g_leaves = [jnp.clip(g, -1.0, 1.0) if m[3] else g
                    for g, m in zip(g_leaves, self._meta)]

        # one reduce per leaf feeds every norm: global, vuln-set, disc-set
        sq = [jnp.vdot(g, g) for g in g_leaves]
        total_sq = sum(sq)
        vuln_sq = sum((s for s, m in zip(sq, self._meta) if m[1]),
                      jnp.float32(0.0))
        disc_sq = sum((s for s, m in zip(sq, self._meta) if m[2]),
                      jnp.float32(0.0))

        mx = self.max_norm
        norm = jnp.sqrt(total_sq)
        s_g = jnp.where(norm < mx, 1.0, mx / norm)
        # subset norms on post-global-clip values = s_g * pre-clip norms
        vn = s_g * jnp.sqrt(vuln_sq)
        s_v = jnp.where(vn < 2.0 * mx, 1.0, 2.0 * mx / vn)
        dn = s_g * jnp.sqrt(disc_sq)
        s_d = jnp.where(dn < 0.3 * mx, 1.0, 0.3 * mx / dn)

        # skip gate folded into the scalar coefficients
        ok = jnp.isfinite(total_loss) & (norm <= 1000.0)
        okf = ok.astype(jnp.float32)
        count_inc = opt_state["count"] + ok.astype(jnp.int32)
        b1_eff = 1.0 - okf * (1.0 - self.b1)    # ok: b1, skip: 1
        c1_eff = okf * (1.0 - self.b1)          # ok: 1-b1, skip: 0
        b2_eff = 1.0 - okf * (1.0 - self.b2)
        c2_eff = okf * (1.0 - self.b2)
        # a skipped step leaves count unchanged; clamp t so the (discarded,
        # lr_eff=0) bias correction can't divide by 1-β^0 = 0 and NaN the
        # whole update
        t = jnp.maximum(count_inc.astype(jnp.float32), 1.0)
        bc1 = 1.0 - self.b1 ** t
        bc2 = 1.0 - self.b2 ** t
        lr_eff = okf * lrs.as_vector()          # ok: lr, skip: 0 → p' = p

        mu_leaves = jax.tree_util.tree_leaves(opt_state["mu"])
        nu_leaves = jax.tree_util.tree_leaves(opt_state["nu"])
        p_leaves = jax.tree_util.tree_leaves(params)

        new_p, new_mu, new_nu = [], [], []
        for g, mu, nu, p, m in zip(g_leaves, mu_leaves, nu_leaves, p_leaves,
                                   self._meta):
            s = s_g * (s_v if m[1] else 1.0) * (s_d if m[2] else 1.0)
            # scalar gating alone can't mask NaN grads (0·NaN = NaN): zero
            # the clipped grad on skipped steps so mu/nu stay bit-identical
            gc = jnp.where(ok, g * s, 0.0)
            mu2 = b1_eff * mu + c1_eff * gc
            nu2 = b2_eff * nu + c2_eff * (gc * gc)
            u = (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + self.eps)
            pf = p.astype(jnp.float32)
            p2 = pf - lr_eff[m[0]] * (u + self.wd * pf)
            new_p.append(p2.astype(p.dtype))
            new_mu.append(mu2)
            new_nu.append(nu2)

        unflat = lambda ls: jax.tree_util.tree_unflatten(self._treedef, ls)
        new_opt = {"count": count_inc, "mu": unflat(new_mu),
                   "nu": unflat(new_nu)}
        return unflat(new_p), new_opt, norm, ok
