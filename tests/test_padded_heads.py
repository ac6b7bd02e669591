"""Lane-padded attention heads (layers._HeadProjection/_OutProjection) must
be numerically EXACT vs the unpadded path: zero pad lanes add zeros to every
contraction, so outputs, gradients, and the decode path are unchanged.

Covers the perf change that folds the flash kernel's dh→128 activation pad
into the projection weights (reference geometry d=768/h=8 → dh=96→128;
SCT-GAN/model.py:24-36).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.models.layers import MultiheadAttention


def _mha(pad):
    return MultiheadAttention(d_model=48, num_heads=4, dropout=0.0,
                              pad_heads=pad)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 16, 48)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 24, 48)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 24)) > 0.2)
    return q, kv, mask


def test_padded_equals_unpadded_forward(data):
    q, kv, mask = data
    plain, padded = _mha(False), _mha(True)
    params = plain.init(jax.random.PRNGKey(0), q, kv, kv)
    # identical parameter trees: the padded module reuses them as-is
    out_plain = plain.apply(params, q, kv, kv, key_padding_mask=mask)
    out_pad = padded.apply(params, q, kv, kv, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_pad),
                               rtol=0, atol=1e-5)


def test_padded_equals_unpadded_grads(data):
    q, kv, mask = data
    plain, padded = _mha(False), _mha(True)
    params = plain.init(jax.random.PRNGKey(1), q, kv, kv)

    def loss(mod):
        return lambda p: (mod.apply(p, q, kv, kv,
                                    key_padding_mask=mask) ** 2).sum()

    g_plain = jax.grad(loss(plain))(params)
    g_pad = jax.grad(loss(padded))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_padded_weights_path(data):
    q, kv, mask = data
    plain, padded = _mha(False), _mha(True)
    params = plain.init(jax.random.PRNGKey(2), q, kv, kv)
    _, w_plain = plain.apply(params, q, kv, kv, key_padding_mask=mask,
                             return_weights=True)
    _, w_pad = padded.apply(params, q, kv, kv, key_padding_mask=mask,
                            return_weights=True)
    np.testing.assert_allclose(np.asarray(w_plain), np.asarray(w_pad),
                               rtol=0, atol=1e-6)


def test_padded_decode_step_matches_full(data):
    """Cached single-token decode in the padded layout == full causal call."""
    q, _, _ = data
    padded = _mha(True)
    params = padded.init(jax.random.PRNGKey(3), q, q, q)
    full = padded.apply(params, q, q, q, causal=True)

    b, s, d = q.shape
    cache_shape = (b, 4, s, padded.head_pad)
    k_cache = jnp.zeros(cache_shape, jnp.float32)
    v_cache = jnp.zeros(cache_shape, jnp.float32)
    outs = []
    for pos in range(s):
        out, k_cache, v_cache = padded.apply(
            params, q[:, pos:pos + 1], k_cache, v_cache, pos,
            method=padded.step)
        outs.append(out)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               rtol=1e-4, atol=1e-4)


def test_full_model_padded_equals_unpadded():
    """SmartContractTransformer logits identical with/without head padding."""
    from sct_gan_tpu.config import ModelConfig
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

    def build(pad):
        cfg = ModelConfig(d_model=48, nhead=4, num_encoder_layers=1,
                          num_decoder_layers=1, dim_feedforward=96,
                          dropout=0.0, max_length=64, max_lines=64,
                          vocab_size=128, use_gan=True,
                          compute_dtype="float32",
                          pad_attention_heads=pad)
        return SmartContractTransformer(cfg)

    rng = np.random.default_rng(3)
    b, s = 2, 64
    ids = jnp.asarray(rng.integers(0, 128, (b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.int32)
    t2l = jnp.asarray(np.minimum(np.arange(s) // 4, s - 1))[None].repeat(b, 0)

    m0, m1 = build(False), build(True)
    params = m0.init({"params": jax.random.PRNGKey(0)}, ids, mask, ids, mask,
                     target_ids=ids, token_to_line=t2l, deterministic=True)
    out0 = m0.apply(params, ids, mask, ids, mask, target_ids=ids,
                    token_to_line=t2l, deterministic=True)
    out1 = m1.apply(params, ids, mask, ids, mask, target_ids=ids,
                    token_to_line=t2l, deterministic=True)
    for key in ("contract_vulnerability_logits", "line_vulnerability_logits",
                "logits", "discriminator_logits"):
        np.testing.assert_allclose(np.asarray(out0[key]),
                                   np.asarray(out1[key]),
                                   rtol=1e-4, atol=1e-4, err_msg=key)
