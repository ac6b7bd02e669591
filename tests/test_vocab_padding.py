"""Vocab padding (ModelConfig.vocab_pad_multiple) must be numerically EXACT.

The embedding tables and the LM head are padded from vocab_size to
padded_vocab_size (128-lane MXU alignment + mp divisibility — 50265 is odd,
so unpadded vocab-axis params silently fell back to replication on any mp
mesh). Token ids are always < vocab_size, exposed logits are sliced back
inside the model, and the fused LM-CE masks pad columns out of its softmax
(ops/fused_ce.py::_mask_pad) — so a padded model with zero pad rows must
reproduce the unpadded model bit-for-bit, forward and backward.

Reference geometry: vocab 50265 per SCT-GAN/model.py:399 (the reference
never pads; padding is a TPU-native layout choice, not a behavior change).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
from sct_gan_tpu.ops.fused_ce import fused_linear_cross_entropy
from sct_gan_tpu.train.checkpoint import adapt_vocab_params

V = 100  # deliberately not a multiple of anything convenient

CFG_UNPADDED = ModelConfig(
    d_model=32, nhead=4, num_encoder_layers=2, num_decoder_layers=2,
    dim_feedforward=64, dropout=0.1, max_length=48, max_lines=48,
    vocab_size=V, num_vulnerability_types=8, use_gan=True,
    compute_dtype="float32", use_flash_attention=False,
    vocab_pad_multiple=1)
CFG_PADDED = dataclasses.replace(CFG_UNPADDED, vocab_pad_multiple=16)


def test_padded_vocab_size_property():
    assert CFG_UNPADDED.padded_vocab_size == V
    assert CFG_PADDED.padded_vocab_size == 112
    assert ModelConfig().padded_vocab_size == 50304  # 50265 → 128·393


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    B, S = 2, CFG_UNPADDED.max_length
    ids = jnp.asarray(rng.integers(0, V, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    ttl = jnp.tile(jnp.arange(S) // 4, (B, 1))
    return ids, mask, ttl


def test_padded_forward_exact(batch):
    """Full training forward: every output of the padded model equals the
    unpadded model with the same (zero-padded) weights, exactly."""
    ids, mask, ttl = batch
    m_u = SmartContractTransformer(CFG_UNPADDED)
    m_p = SmartContractTransformer(CFG_PADDED)
    rng = jax.random.PRNGKey(0)
    var_u = m_u.init({"params": rng, "dropout": rng}, ids, mask, ids, mask,
                     target_ids=ids, token_to_line=ttl, deterministic=True)
    var_p = {"params": adapt_vocab_params(
        jax.tree.map(np.asarray, var_u["params"]),
        CFG_PADDED.padded_vocab_size)}

    out_u = m_u.apply(var_u, ids, mask, ids, mask, target_ids=ids,
                      token_to_line=ttl, deterministic=True)
    out_p = m_p.apply(var_p, ids, mask, ids, mask, target_ids=ids,
                      token_to_line=ttl, deterministic=True)
    assert out_p["logits"].shape == (ids.shape[0], ids.shape[1] - 1, V)
    for key in out_u:
        a, b = np.asarray(out_u[key]), np.asarray(out_p[key])
        assert a.shape == b.shape, key
        np.testing.assert_array_equal(a, b, err_msg=key)


def test_fused_ce_valid_vocab_exact():
    """fused CE with a padded kernel + valid_vocab: value and all grads equal
    the unpadded op; pad-column grads are exactly zero (the pad columns'
    softmax mass is -inf'd out)."""
    rng = np.random.default_rng(1)
    b, s, d, v, vp = 2, 16, 8, 23, 32
    x = jnp.asarray(rng.normal(0, 1, (b, s, d)), jnp.float32)
    W = jnp.asarray(rng.normal(0, 0.3, (d, v)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (v,)), jnp.float32)
    t = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)
    Wp = jnp.pad(W, ((0, 0), (0, vp - v)))
    biasp = jnp.pad(bias, (0, vp - v))

    want = fused_linear_cross_entropy(x, W, bias, t)
    got = fused_linear_cross_entropy(x, Wp, biasp, t, None, v)
    assert float(got) == pytest.approx(float(want), rel=1e-6)

    g_want = jax.grad(fused_linear_cross_entropy, argnums=(0, 1, 2))(
        x, W, bias, t)
    g_got = jax.grad(
        lambda x, W, b: fused_linear_cross_entropy(x, W, b, t, None, v),
        argnums=(0, 1, 2))(x, Wp, biasp)
    np.testing.assert_allclose(np.asarray(g_got[0]), np.asarray(g_want[0]),
                               rtol=1e-5, atol=1e-6, err_msg="dhidden")
    np.testing.assert_allclose(np.asarray(g_got[1][:, :v]),
                               np.asarray(g_want[1]),
                               rtol=1e-5, atol=1e-6, err_msg="dkernel")
    np.testing.assert_allclose(np.asarray(g_got[2][:v]),
                               np.asarray(g_want[2]),
                               rtol=1e-5, atol=1e-6, err_msg="dbias")
    assert np.all(np.asarray(g_got[1][:, v:]) == 0.0)
    assert np.all(np.asarray(g_got[2][v:]) == 0.0)


def test_adapt_vocab_params_roundtrip(batch):
    """Pad → slice returns the original params bit-for-bit, and padding
    touches exactly the three vocab-axis leaf families."""
    ids, mask, ttl = batch
    m_u = SmartContractTransformer(CFG_UNPADDED)
    rng = jax.random.PRNGKey(0)
    params = jax.tree.map(np.asarray, m_u.init(
        {"params": rng, "dropout": rng}, ids, mask, ids, mask,
        target_ids=ids, token_to_line=ttl,
        deterministic=True)["params"])

    padded = adapt_vocab_params(params, 112)
    assert padded["embedding"]["embedding"].shape[0] == 112
    assert padded["ast_embedding"]["embedding"].shape[0] == 112
    assert padded["output_layer"]["kernel"].shape[1] == 112
    assert padded["output_layer"]["bias"].shape[0] == 112
    # pad rows are zero (zero grad + never read ⇒ exactness)
    assert np.all(padded["embedding"]["embedding"][V:] == 0)
    assert np.all(padded["output_layer"]["kernel"][:, V:] == 0)

    back = adapt_vocab_params(padded, V)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_o) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_o, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_mp_rules_apply_to_padded_vocab():
    """The whole point of the padding: on an mp mesh the vocab-axis params
    must actually shard instead of silently replicating (50265 is odd)."""
    from sct_gan_tpu.parallel.mesh import make_mesh, param_partition_spec
    mesh = make_mesh(dp=4, mp=2)
    padded = np.zeros((50304, 8), np.float32)
    unpadded = np.zeros((50265, 8), np.float32)
    spec_p = param_partition_spec("embedding/embedding", padded, mesh)
    spec_u = param_partition_spec("embedding/embedding", unpadded, mesh)
    assert spec_p == jax.sharding.PartitionSpec("mp", None)
    assert spec_u == jax.sharding.PartitionSpec()  # the old silent fallback
    lm_p = param_partition_spec(
        "output_layer/kernel", np.zeros((8, 50304), np.float32), mesh)
    assert lm_p == jax.sharding.PartitionSpec(None, "mp")
