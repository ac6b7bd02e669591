"""Model tests: PE golden values, forward shapes/semantics, line-head parity
with the reference's loop semantics (SCT-GAN/model.py:478-759), GAN head."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.models.layers import (
    line_position_encoding,
    sinusoidal_position_encoding,
)
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer

TINY = ModelConfig(d_model=32, nhead=4, num_encoder_layers=2,
                   num_decoder_layers=2, dim_feedforward=64, dropout=0.1,
                   max_length=48, max_lines=48, vocab_size=128,
                   num_vulnerability_types=8, use_gan=True,
                   compute_dtype="float32", use_flash_attention=False)


def _np_reference_pe(max_len, d):
    """Literal transcription of model.py:12-17."""
    import math
    pe = np.zeros((max_len, d), dtype=np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * (-math.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def test_positional_encoding_golden():
    pe = np.asarray(sinusoidal_position_encoding(64, 16))
    np.testing.assert_allclose(pe, _np_reference_pe(64, 16), rtol=1e-6,
                               atol=1e-7)
    # line PE uses the same math (model.py:1207-1217)
    lpe = np.asarray(line_position_encoding(32, 16))
    np.testing.assert_allclose(lpe, _np_reference_pe(32, 16), rtol=1e-6,
                               atol=1e-7)


@pytest.fixture(scope="module")
def tiny_model():
    m = SmartContractTransformer(TINY)
    rng = jax.random.PRNGKey(0)
    B, S = 2, TINY.max_length
    ids = jax.random.randint(rng, (B, S), 0, TINY.vocab_size)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    ttl = jnp.tile(jnp.arange(S) // 4, (B, 1))
    variables = jax.jit(
        lambda: m.init({"params": rng, "dropout": rng}, ids, mask, ids, mask,
                       target_ids=ids, token_to_line=ttl,
                       deterministic=True))()
    return m, variables


def test_forward_shapes(tiny_model):
    m, variables = tiny_model
    B, S = 2, TINY.max_length
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (B, S), 0, TINY.vocab_size)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    ttl = jnp.tile(jnp.arange(S) // 4, (B, 1))
    out = m.apply(variables, ids, mask, ids, mask, target_ids=ids,
                  token_to_line=ttl, deterministic=True)
    assert out["contract_vulnerability_logits"].shape == (B, 8)
    assert out["line_vulnerability_logits"].shape == (B, TINY.max_lines, 8)
    assert out["logits"].shape == (B, S - 1, TINY.vocab_size)
    assert out["target_ids"].shape == (B, S - 1)
    assert out["encoder_output"].shape == (B, TINY.d_model)
    assert out["discriminator_logits"].shape == (B, 1)
    assert out["contract_attn_weights"].shape == (B, 1, S)
    # Attention weights are a distribution over source positions
    np.testing.assert_allclose(np.asarray(out["contract_attn_weights"]).sum(-1),
                               1.0, rtol=1e-4)
    for key in ("contract_vulnerability_logits", "line_vulnerability_logits",
                "logits"):
        assert np.isfinite(np.asarray(out[key])).all(), key


def test_line_logits_zero_beyond_global_max(tiny_model):
    """Parity with the reference's zero-padding of line logits to max_lines
    (model.py:750-759): slots >= token_to_line.max()+1 must be exactly 0."""
    m, variables = tiny_model
    B, S = 2, TINY.max_length
    rng = jax.random.PRNGKey(2)
    ids = jax.random.randint(rng, (B, S), 0, TINY.vocab_size)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    n_lines = 7
    ttl = jnp.tile(jnp.minimum(jnp.arange(S) // 3, n_lines - 1), (B, 1))
    out = m.apply(variables, ids, mask, ids, mask, target_ids=ids,
                  token_to_line=ttl, deterministic=True)
    logits = np.asarray(out["line_vulnerability_logits"])
    assert (logits[:, n_lines:, :] == 0).all()
    assert np.abs(logits[:, :n_lines, :]).sum() > 0


def test_line_head_uses_empty_line_embedding(tiny_model):
    """Lines with no tokens inside the valid range go through the heads with
    the learnable empty-line embedding + line PE (model.py:571-574), so their
    logits are generally nonzero and differ from token-backed lines."""
    m, variables = tiny_model
    B, S = 1, TINY.max_length
    rng = jax.random.PRNGKey(3)
    ids = jax.random.randint(rng, (B, S), 0, TINY.vocab_size)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    # tokens only on lines 0 and 5 → lines 1-4 are empty but < global_max
    ttl = jnp.where(jnp.arange(S) < 10, 0, 5)[None, :]
    out = m.apply(variables, ids, mask, ids, mask, target_ids=ids,
                  token_to_line=ttl, deterministic=True)
    logits = np.asarray(out["line_vulnerability_logits"])[0]
    assert np.abs(logits[1:5]).sum() > 0      # empty lines produce logits
    assert (logits[6:] == 0).all()            # beyond global_max: zeroed
    # empty lines differ from each other thanks to the line PE
    assert np.abs(logits[1] - logits[2]).sum() > 1e-8


def test_dropout_changes_output(tiny_model):
    m, variables = tiny_model
    B, S = 2, TINY.max_length
    rng = jax.random.PRNGKey(4)
    ids = jax.random.randint(rng, (B, S), 0, TINY.vocab_size)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    ttl = jnp.tile(jnp.arange(S) // 4, (B, 1))
    out1 = m.apply(variables, ids, mask, ids, mask, target_ids=ids,
                   token_to_line=ttl, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(10)})
    out2 = m.apply(variables, ids, mask, ids, mask, target_ids=ids,
                   token_to_line=ttl, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(11)})
    assert not np.allclose(np.asarray(out1["logits"]),
                           np.asarray(out2["logits"]))


def test_no_gan_variant_has_no_disc_params():
    cfg = ModelConfig(**{**TINY.__dict__, "use_gan": False})
    m = SmartContractTransformer(cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 1, cfg.max_length
    ids = jnp.zeros((B, S), dtype=jnp.int32)
    mask = jnp.ones((B, S), dtype=jnp.int32)
    ttl = jnp.zeros((B, S), dtype=jnp.int32)
    variables = m.init({"params": rng, "dropout": rng}, ids, mask, ids, mask,
                       target_ids=ids, token_to_line=ttl, deterministic=True)
    names = list(variables["params"].keys())
    assert not any(n.startswith("disc_") for n in names)
    out = m.apply(variables, ids, mask, ids, mask, target_ids=ids,
                  token_to_line=ttl, deterministic=True)
    assert out["discriminator_logits"] is None


def test_padding_mask_affects_memory(tiny_model):
    """Key-padding masks must change encoder output on non-pad positions."""
    m, variables = tiny_model
    B, S = 1, TINY.max_length
    rng = jax.random.PRNGKey(5)
    ids = jax.random.randint(rng, (B, S), 0, TINY.vocab_size)
    full = jnp.ones((B, S), dtype=jnp.int32)
    half = jnp.where(jnp.arange(S) < S // 2, 1, 0)[None, :]
    mem_full = m.apply(variables, ids, full, method="encode",
                       deterministic=True)
    mem_half = m.apply(variables, ids, half, method="encode",
                       deterministic=True)
    assert not np.allclose(np.asarray(mem_full)[0, 0],
                           np.asarray(mem_half)[0, 0], atol=1e-6)


def test_sorted_embed_grad_equivalent():
    """ModelConfig.sorted_embed_grad rewrites only the embedding backward
    (ops/embed.py): forward outputs are bit-identical and full-model grads
    match the native scatter backward to f32 reassociation tolerance."""
    import dataclasses

    cfg_a = TINY
    cfg_b = dataclasses.replace(TINY, sorted_embed_grad=True)
    rng = np.random.default_rng(5)
    b, s = 2, TINY.max_length
    batch = {
        "input_ids": rng.integers(0, TINY.vocab_size, (b, s)).astype(np.int32),
        "attention_mask": np.ones((b, s), np.int32),
        "ast_input_ids": rng.integers(0, TINY.vocab_size,
                                      (b, s)).astype(np.int32),
        "ast_attention_mask": np.ones((b, s), np.int32),
        "token_to_line": (np.arange(s, dtype=np.int32) // 4)[None, :]
        .repeat(b, 0),
    }

    def build(cfg):
        model = SmartContractTransformer(cfg)
        params = model.init(
            jax.random.PRNGKey(0), input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            ast_input_ids=batch["ast_input_ids"],
            ast_attention_mask=batch["ast_attention_mask"],
            target_ids=batch["input_ids"],
            token_to_line=batch["token_to_line"])["params"]
        return model, params

    model_a, params = build(cfg_a)
    model_b, params_b = build(cfg_b)
    chex = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: x.shape == y.shape, params, params_b))
    assert chex

    def loss(model):
        def f(p):
            out = model.apply(
                {"params": p}, input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                ast_input_ids=batch["ast_input_ids"],
                ast_attention_mask=batch["ast_attention_mask"],
                target_ids=batch["input_ids"],
                token_to_line=batch["token_to_line"], deterministic=True)
            return (out["contract_vulnerability_logits"].sum()
                    + out["line_vulnerability_logits"].sum()
                    + out["logits"].astype(jnp.float32).mean())
        return f

    va, ga = jax.value_and_grad(loss(model_a))(params)
    vb, gb = jax.value_and_grad(loss(model_b))(params)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), rtol=2e-5,
            atol=2e-5, err_msg=jax.tree_util.keystr(path))
