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


# -- flattened (vector) optimizer --------------------------------------------

class _LeafMeta(NamedTuple):
    path: str
    shape: Tuple[int, ...]
    size: int
    offset: int
    group: int          # index into GROUPS
    fusion: bool        # ±1 clamp applies (feature_fusion grad hook)


class FusedOptimizer:
    """The whole gradient transform as a few large vector ops.

    Numerically identical to build_gradient_transform + apply_group_lrs +
    apply_updates (tests/test_fused_optimizer.py proves it leaf-for-leaf),
    but the per-leaf optax chain costs ~12 ms/step in kernel-launch overhead
    alone on the 2,100-leaf full-size tree (measured: the same chain on one
    139M-element mega-leaf runs 6.1 ms vs 18.5 ms — tools/time_opt_megaleaf.py).
    Here every reduction and elementwise stage runs on ONE concatenated f32
    vector; leaves are ordered so each clip set is a contiguous segment:

        [ base | contract∖vuln | contract∩vuln | line (all vuln) | disc ]

    so the masked clip norms (SCT-GAN/train.py:1277-1291) are slice
    reductions, not masked tree traversals. Per-leaf work is exactly one
    slice+reshape+fma per parameter at apply time (group LR, decoupled
    weight decay, and the NaN/explosion keep-where are folded in).

    Restriction: built for replicated parameters (dp-only meshes). Under
    mp>1 the concat would all-gather every sharded gradient each step —
    callers keep the optax chain there (trainer gates on mesh mp size).
    """

    def __init__(self, params, *, use_gan: bool, max_grad_norm: float = 1.0,
                 adam_b1: float = 0.9, adam_b2: float = 0.98,
                 adam_eps: float = 1e-9, weight_decay: float = 0.1):
        self.use_gan = use_gan
        self.max_norm = float(max_grad_norm)
        self.b1, self.b2, self.eps = float(adam_b1), float(adam_b2), float(adam_eps)
        self.wd = float(weight_decay)

        flat = []
        for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
            path = _flat_path(kp)
            grp = GROUPS.index(group_of(path, use_gan))
            vuln = any(k in path for k in _VULN_CLIP_KEYS)
            seg = {  # contiguity rank: vuln leaves adjacent, disc last
                ("base", False): 0, ("contract", False): 1,
                ("contract", True): 2, ("line", True): 3, ("line", False): 3,
                ("disc", False): 4, ("disc", True): 4,
            }[(GROUPS[grp], vuln)]
            flat.append((seg, path, leaf, grp, vuln,
                         "feature_fusion" in path))
        flat.sort(key=lambda t: (t[0], t[1]))

        metas, off = [], 0
        self._vuln_lo = self._vuln_hi = self._disc_lo = None
        for seg, path, leaf, grp, vuln, fusion in flat:
            size = int(np.prod(leaf.shape)) if leaf.shape else 1
            if vuln and self._vuln_lo is None:
                self._vuln_lo = off
            if vuln:
                self._vuln_hi = off + size
            if seg == 4 and self._disc_lo is None:
                self._disc_lo = off
            metas.append(_LeafMeta(path, tuple(leaf.shape), size, off,
                                   grp, fusion))
            off += size
        self.metas = metas
        self.total = off
        self._treedef = jax.tree_util.tree_structure(params)
        # map from storage order back to tree order
        order = {m.path: i for i, m in enumerate(metas)}
        self._tree_order = [
            order[_flat_path(kp)]
            for kp, _ in jax.tree_util.tree_leaves_with_path(params)]

    def init(self, params):
        del params
        vec = jnp.zeros((self.total,), jnp.float32)
        return {"count": jnp.zeros((), jnp.int32), "mu": vec, "nu": vec}

    def _leaves_in_storage_order(self, tree):
        leaves = jax.tree_util.tree_leaves(tree)
        out = [None] * len(leaves)
        for tree_i, store_i in enumerate(self._tree_order):
            out[store_i] = leaves[tree_i]
        return out

    def update(self, grads, opt_state, params, lrs: GroupLRs, total_loss):
        """Returns (new_params, new_opt_state, grad_norm, ok).

        ``ok`` is the NaN/explosion skip gate (train.py:1301-1309), folded
        in here because the norm it needs is computed here anyway. The norm
        is taken after the fusion ±1 grad-hook clamp — matching torch,
        where backward hooks run before clip_grad_norm_ sees the grads.
        """
        g_leaves = self._leaves_in_storage_order(grads)
        parts = []
        for m, g in zip(self.metas, g_leaves):
            g = g.astype(jnp.float32).ravel()
            if m.fusion:   # grad-hook clamp runs before any norm (model.py:284)
                g = jnp.clip(g, -1.0, 1.0)
            parts.append(g)
        g = jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        mx = self.max_norm
        norm = jnp.sqrt(jnp.vdot(g, g))
        s = jnp.where(norm < mx, 1.0, mx / norm)
        g = g * s
        if self._vuln_lo is not None:
            seg = jax.lax.slice(g, (self._vuln_lo,), (self._vuln_hi,))
            vn = jnp.sqrt(jnp.vdot(seg, seg))
            sv = jnp.where(vn < 2.0 * mx, 1.0, 2.0 * mx / vn)
            g = jax.lax.dynamic_update_slice(g, seg * sv, (self._vuln_lo,))
        if self.use_gan and self._disc_lo is not None:
            seg = jax.lax.slice(g, (self._disc_lo,), (self.total,))
            dn = jnp.sqrt(jnp.vdot(seg, seg))
            sd = jnp.where(dn < 0.3 * mx, 1.0, 0.3 * mx / dn)
            g = jax.lax.dynamic_update_slice(g, seg * sd, (self._disc_lo,))

        count_inc = opt_state["count"] + 1
        mu = self.b1 * opt_state["mu"] + (1.0 - self.b1) * g
        nu = self.b2 * opt_state["nu"] + (1.0 - self.b2) * (g * g)
        t = count_inc.astype(jnp.float32)
        mu_hat = mu / (1.0 - self.b1 ** t)
        nu_hat = nu / (1.0 - self.b2 ** t)
        u_vec = mu_hat / (jnp.sqrt(nu_hat) + self.eps)

        ok = jnp.isfinite(total_loss) & (norm <= 1000.0)
        lr_vec = lrs.as_vector()
        p_leaves = self._leaves_in_storage_order(params)
        new_store = []
        for m, p in zip(self.metas, p_leaves):
            u = jax.lax.slice(u_vec, (m.offset,),
                              (m.offset + m.size,)).reshape(m.shape)
            lr = lr_vec[m.group]
            newp = (p.astype(jnp.float32)
                    - lr * (u + self.wd * p.astype(jnp.float32))).astype(p.dtype)
            new_store.append(jnp.where(ok, newp, p))
        # back to tree order
        new_tree_leaves = [new_store[i] for i in self._tree_order]
        new_params = jax.tree_util.tree_unflatten(self._treedef,
                                                  new_tree_leaves)
        new_opt = {
            "count": jnp.where(ok, count_inc, opt_state["count"]),
            "mu": jnp.where(ok, mu, opt_state["mu"]),
            "nu": jnp.where(ok, nu, opt_state["nu"]),
        }
        return new_params, new_opt, norm, ok
