"""FusedOptimizer must match the optax chain (build_gradient_transform +
apply_group_lrs + apply_updates + keep-where) leaf for leaf — same clip
tiers, Adam, decoupled wd, group LRs, and skip gate."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sct_gan_tpu.config import ModelConfig, TrainConfig
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
from sct_gan_tpu.train.optimizer import (FusedOptimizer, GroupLRs,
                                         apply_group_lrs,
                                         build_gradient_transform,
                                         fusion_mask_tree,
                                         group_index_tree)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                      num_decoder_layers=1, dim_feedforward=64, dropout=0.0,
                      max_length=32, max_lines=32, vocab_size=64,
                      use_gan=True, compute_dtype="float32",
                      use_flash_attention=False)
    model = SmartContractTransformer(cfg)
    ids = jnp.zeros((2, 32), jnp.int32)
    mask = jnp.ones((2, 32), jnp.int32)
    t2l = jnp.zeros((2, 32), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, mask, ids,
                        mask, target_ids=ids, token_to_line=t2l,
                        deterministic=True)["params"]
    rng = np.random.default_rng(0)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)
    lrs = GroupLRs.init(5e-5)
    return params, grads, lrs


def _optax_step(params, grads, lrs, *, steps=1, scale_grads=1.0,
                grad_seq=None):
    """Replays the train_step optax path: gate norm post-fusion-clamp
    (matching FusedOptimizer and torch hook ordering), and the keep-where
    restores the PRE-update optimizer state on skipped steps."""
    tx = build_gradient_transform(params, use_gan=True)
    gidx = group_index_tree(params, True)
    fmask = fusion_mask_tree(params)
    opt_state = tx.init(params)
    for i in range(steps):
        if grad_seq is not None:
            g = grad_seq[i]
        else:
            g = jax.tree_util.tree_map(
                lambda x: x * (scale_grads ** (i + 1)), grads)
        gate_g = jax.tree_util.tree_map(
            lambda x, m: jnp.clip(x, -1.0, 1.0) if m else x, g, fmask)
        gnorm = optax.global_norm(gate_g)
        old_opt = opt_state
        updates, new_opt_state = tx.update(g, opt_state, params)
        updates = apply_group_lrs(updates, gidx, lrs)
        new_params = optax.apply_updates(params, updates)
        ok = jnp.isfinite(gnorm) & (gnorm <= 1000.0)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old)
        params = keep(new_params, params)
        opt_state = keep(new_opt_state, old_opt)
    return params


def _fused_step(params, grads, lrs, *, steps=1, scale_grads=1.0,
                grad_seq=None):
    fo = FusedOptimizer(params, use_gan=True)
    opt_state = fo.init(params)
    for i in range(steps):
        if grad_seq is not None:
            g = grad_seq[i]
        else:
            g = jax.tree_util.tree_map(
                lambda x: x * (scale_grads ** (i + 1)), grads)
        params, opt_state, norm, ok = fo.update(
            g, opt_state, params, lrs, jnp.float32(0.5))
    return params


def test_single_step_matches(setup):
    params, grads, lrs = setup
    p1 = _optax_step(params, grads, lrs)
    p2 = _fused_step(params, grads, lrs)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = dict(
        ( jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(p2))
    for kp, v in flat1:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat2[jax.tree_util.keystr(kp)]),
            rtol=1e-5, atol=1e-7, err_msg=jax.tree_util.keystr(kp))


def test_multi_step_matches(setup):
    params, grads, lrs = setup
    p1 = _optax_step(params, grads, lrs, steps=3, scale_grads=0.7)
    p2 = _fused_step(params, grads, lrs, steps=3, scale_grads=0.7)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_skip_gate_keeps_params(setup):
    params, grads, lrs = setup
    huge = jax.tree_util.tree_map(lambda g: g * 1e9, grads)  # norm > 1000
    fo = FusedOptimizer(params, use_gan=True)
    opt_state = fo.init(params)
    new_params, new_opt, norm, ok = fo.update(huge, opt_state, params, lrs,
                                              jnp.float32(0.5))
    assert not bool(ok)
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_opt["count"]) == 0


def test_nan_loss_skips(setup):
    params, grads, lrs = setup
    fo = FusedOptimizer(params, use_gan=True)
    _, _, _, ok = fo.update(grads, fo.init(params), params, lrs,
                            jnp.float32(float("nan")))
    assert not bool(ok)


def test_skip_then_step_matches(setup):
    """A skipped (explosive) step must leave mu/nu/count untouched on BOTH
    paths — the subsequent normal step then produces identical params. This
    is the skip-semantics check the identity tests alone can't see (a
    keep(new, new) no-op in the reference would pass them)."""
    params, grads, lrs = setup
    huge = jax.tree_util.tree_map(lambda g: g * 1e9, grads)   # norm > 1000
    seq = [huge, grads, jax.tree_util.tree_map(lambda g: g * 0.5, grads)]
    p1 = _optax_step(params, grads, lrs, steps=3, grad_seq=seq)
    p2 = _fused_step(params, grads, lrs, steps=3, grad_seq=seq)
    # also prove the skipped step actually changed nothing vs never running it
    p1_ref = _optax_step(params, grads, lrs, steps=2, grad_seq=seq[1:])
    for a, b, c in zip(jax.tree_util.tree_leaves(p1),
                       jax.tree_util.tree_leaves(p2),
                       jax.tree_util.tree_leaves(p1_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-7)


def test_fusion_clamp_applies(setup):
    """feature_fusion grads are clamped to ±1 before any norm — parity with
    the reference's grad hooks (model.py:284-286). Both paths take the skip
    gate norm post-clamp (as torch does — backward hooks run before
    clip_grad_norm_ sees the grads)."""
    params, grads, lrs = setup
    big_fusion = jax.tree_util.tree_map_with_path(
        lambda kp, g: g * 5.0 if "feature_fusion" in
        jax.tree_util.keystr(kp) else g, grads)
    p1 = _optax_step(params, big_fusion, lrs)
    p2 = _fused_step(params, big_fusion, lrs)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
