"""Sequence-parallel (context-parallel) encoding — SURVEY §5.7.

The reference caps every sequence at L=1024 and is dense O(L²)
(SCT-GAN/model.py:32, dataset.py:106); `parallel/sequence.py` shards the
sequence axis of the encode path over a mesh axis with all-gathered K/V.
These tests pin, on the virtual 8-device CPU mesh:

  * exact numerical parity of `sp_encode` with the single-device
    `model.encode` at sp=4 (collectives + per-shard PE offsets correct);
  * gradient parity THROUGH the shard_map (the all-gathers transpose to
    reduce-scatters);
  * encoding beyond the model's configured max_length with unchanged
    parameters (the long-context point of the subsystem);
  * `sp_detect`: the detection heads consuming the sequence-sharded memory
    under plain GSPMD.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
from sct_gan_tpu.parallel.sequence import make_sp_mesh, sp_detect, sp_encode

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs the virtual multi-device mesh")

D, L, B = 64, 256, 2


def _cfg(**kw):
    base = dict(d_model=D, nhead=4, num_encoder_layers=2,
                num_decoder_layers=1, dim_feedforward=128, dropout=0.0,
                max_length=L, max_lines=L, vocab_size=512, use_gan=False,
                compute_dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = SmartContractTransformer(cfg)
    rng = np.random.default_rng(0)
    am = np.ones((B, L), np.int32)
    am[1, L - 37:] = 0          # ragged row: mask survives the sp gather
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 512, (B, L), np.int32)),
        "attention_mask": jnp.asarray(am),
        "ast_input_ids": jnp.asarray(rng.integers(0, 512, (B, L), np.int32)),
        "ast_attention_mask": jnp.ones((B, L), jnp.int32),
        "token_to_line": jnp.asarray(
            np.tile(np.minimum(np.arange(L, dtype=np.int32) // 4, L - 1),
                    (B, 1))),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["ast_input_ids"], batch["ast_attention_mask"],
        target_ids=batch["input_ids"], token_to_line=batch["token_to_line"],
        deterministic=True)["params"]
    return model, params, batch


def _reference_encode(model, params, batch):
    return jax.jit(lambda p: model.apply(
        {"params": p}, batch["input_ids"], batch["attention_mask"],
        batch["ast_input_ids"], batch["ast_attention_mask"],
        deterministic=True, method=model.encode))(params)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_encode_matches_single_device(setup, sp):
    model, params, batch = setup
    mesh = make_sp_mesh(sp=sp, dp=1, devices=jax.devices()[:sp])
    got = sp_encode(model, params, batch["input_ids"],
                    batch["attention_mask"], batch["ast_input_ids"],
                    batch["ast_attention_mask"], mesh)
    want = _reference_encode(model, params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_sp_encode_dp_by_sp(setup):
    """2×4 (dp×sp) mesh: batch AND sequence sharded simultaneously."""
    model, params, batch = setup
    mesh = make_sp_mesh(sp=4, dp=2)
    got = sp_encode(model, params, batch["input_ids"],
                    batch["attention_mask"], batch["ast_input_ids"],
                    batch["ast_attention_mask"], mesh)
    want = _reference_encode(model, params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sp_encode_grads_match(setup):
    """d(loss)/d(params) through shard_map == single-device: the K/V/mask
    all-gathers transpose to reduce-scatters over sp."""
    model, params, batch = setup
    mesh = make_sp_mesh(sp=4, dp=1, devices=jax.devices()[:4])

    def loss_sp(p):
        mem = sp_encode(model, p, batch["input_ids"],
                        batch["attention_mask"], batch["ast_input_ids"],
                        batch["ast_attention_mask"], mesh)
        return (mem.astype(jnp.float32) ** 2).mean()

    def loss_ref(p):
        mem = model.apply({"params": p}, batch["input_ids"],
                          batch["attention_mask"], batch["ast_input_ids"],
                          batch["ast_attention_mask"], deterministic=True,
                          method=model.encode)
        return (mem.astype(jnp.float32) ** 2).mean()

    g_sp = jax.grad(loss_sp)(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    flat_sp = jax.tree_util.tree_leaves_with_path(g_sp)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(g_ref))
    # f32 reassociation noise: the reduce-scatter sums shard-partials in a
    # different order than the single-device contraction, and leaves whose
    # true gradient is ~0 (e.g. k_proj bias — softmax is invariant to
    # per-query constant score shifts) are PURE cancellation noise on both
    # sides, so the absolute floor is set by the global gradient scale. A
    # missing/doubled collective would show as an O(global_scale) error.
    global_scale = max(float(jnp.abs(l).max())
                       for l in flat_ref.values()) or 1.0
    checked = 0
    for path, leaf in flat_sp:
        ref_leaf = flat_ref[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref_leaf),
            rtol=2e-3, atol=2e-3 * global_scale, err_msg=str(path))
        checked += 1
    assert checked == len(flat_ref)


@pytest.mark.slow
def test_sp_encode_beyond_configured_max_length(setup):
    """Long-context: encode L=1024 with an L=256-configured model — the PE
    table is extended via the max_length override, parameters unchanged
    (they are all S-independent). The reference cannot represent this input
    at all."""
    model, params, _ = setup
    rng = np.random.default_rng(1)
    long_l = 1024
    ids = jnp.asarray(rng.integers(0, 512, (B, long_l), np.int32))
    mask = jnp.ones((B, long_l), jnp.int32)
    mesh = make_sp_mesh(sp=8, dp=1)
    mem = sp_encode(model, params, ids, mask, ids, mask, mesh,
                    max_length=long_l)
    assert mem.shape == (B, long_l, D)
    assert bool(jnp.isfinite(mem.astype(jnp.float32)).all())


def test_sp_detect_heads_consume_sharded_memory(setup):
    model, params, batch = setup
    mesh = make_sp_mesh(sp=4, dp=1, devices=jax.devices()[:4])
    c_logits, l_logits = sp_detect(model, params, batch, mesh)
    assert c_logits.shape == (B, 8)
    # single-device reference
    mem = _reference_encode(model, params, batch)
    c_ref, _ = jax.jit(lambda p, m: model.apply(
        {"params": p}, m, method=model.contract_head))(params, mem)
    np.testing.assert_allclose(np.asarray(c_logits), np.asarray(c_ref),
                               rtol=2e-5, atol=2e-5)
    l_ref = jax.jit(lambda p, m: model.apply(
        {"params": p}, m, batch["token_to_line"],
        method=model.line_head))(params, mem)
    np.testing.assert_allclose(np.asarray(l_logits), np.asarray(l_ref),
                               rtol=2e-5, atol=3e-5)
