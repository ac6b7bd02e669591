"""Static-padding mask + per-sample line-count knob.

1. trainer._pad_to_dp pads ragged tail batches by repeating the last row;
   ``row_valid`` must give those rows zero weight so the loss, gradients,
   and batch metrics equal the unpadded batch exactly (the reference never
   pads — SCT-GAN/train.py iterates the raw DataLoader).
2. ModelConfig.per_sample_line_counts=True makes batched serving match the
   reference's batch-1 behavior for mixed-length inputs (the reference
   computes line count as token_to_line.max()+1 over the whole batch,
   model.py:484 — a long contract unmasks line slots of every short one).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                      SmartContractVulnerabilityDataset)
from sct_gan_tpu.losses.syntax import SyntaxLossTables
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
from sct_gan_tpu.train.train_step import (DynamicScalars, _line_batch_metrics,
                                          compute_losses)

TINY = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                   num_decoder_layers=1, dim_feedforward=64, dropout=0.1,
                   max_length=64, max_lines=64, vocab_size=512,
                   use_gan=True, compute_dtype="float32",
                   use_flash_attention=False)


@pytest.fixture(scope="module")
def setup():
    from sct_gan_tpu.data.synthetic import generate_corpus
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    tok = SolidityTokenizer(vocab_size=TINY.vocab_size)
    records = generate_corpus(n=4, seed=3)
    ds = SmartContractVulnerabilityDataset(
        records=records, tokenizer=tok, max_length=TINY.max_length)
    batch = next(iter(ArrayDataLoader(ds, batch_size=4, shuffle=False)))
    model = SmartContractTransformer(TINY)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"][:1],
        attention_mask=batch["attention_mask"][:1],
        ast_input_ids=batch["ast_input_ids"][:1],
        ast_attention_mask=batch["ast_attention_mask"][:1],
        target_ids=batch["input_ids"][:1],
        token_to_line=batch["token_to_line"][:1])["params"]
    return model, params, batch, SyntaxLossTables.from_tokenizer(tok)


def _loss_and_grads(model, params, batch, tables):
    def f(p):
        total, (metrics, line_logits, line_labels, row_mask) = compute_losses(
            model, p, batch, DynamicScalars.init(), jax.random.PRNGKey(0),
            use_gan=True, use_augmentation=False, tables=tables,
            deterministic=True)
        return total, (metrics, line_logits, line_labels, row_mask)
    (total, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
    return total, aux, grads


def test_padded_tail_batch_matches_unpadded(setup):
    """VERDICT r3 item 5: padded and unpadded tail batches must yield
    identical loss, gradients, and batch metrics."""
    model, params, full, tables = setup
    # Unpadded ragged tail: 3 real rows.
    unpadded = {k: v[:3] for k, v in full.items()}
    # Padded to 4 the way trainer._pad_to_dp does: repeat the last real row,
    # mark it invalid.
    padded = {k: np.concatenate([v[:3], v[2:3]], axis=0)
              for k, v in full.items()}
    padded["row_valid"] = np.array([1.0, 1.0, 1.0, 0.0], dtype=np.float32)

    t0, (m0, ll0, lab0, _), g0 = _loss_and_grads(model, params, unpadded,
                                                 tables)
    t1, (m1, ll1, lab1, rm1), g1 = _loss_and_grads(model, params, padded,
                                                   tables)

    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                               rtol=1e-5, atol=1e-6)
    for k in m0:
        np.testing.assert_allclose(
            np.asarray(m0[k]), np.asarray(m1[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"metric {k} diverges under padding")

    # Gradients: identical (the pad row must carry exactly zero weight).
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)

    # Batch metrics (adaptive-threshold line stats) too.
    bm0 = _line_batch_metrics(ll0, lab0)
    bm1 = _line_batch_metrics(ll1, lab1, rm1)
    for k in bm0:
        np.testing.assert_allclose(
            np.asarray(bm0[k]), np.asarray(bm1[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"batch metric {k} diverges under padding")


def test_line_metrics_pad_rows_cannot_dominate(setup):
    """A pad row full of spurious high logits must not change thresholds,
    counts, or accuracy when masked out."""
    model, params, full, tables = setup
    del model, params, tables
    rng = np.random.default_rng(0)
    ll = rng.normal(-2.0, 1.0, size=(4, 16, 8)).astype(np.float32)
    labels = (rng.random((4, 16, 8)) < 0.05).astype(np.float32)
    ll_pad = np.concatenate([ll, np.full((1, 16, 8), 9.0, np.float32)])
    lab_pad = np.concatenate([labels, np.ones((1, 16, 8), np.float32)])
    rm = np.array([1, 1, 1, 1, 0], dtype=np.float32)
    m0 = _line_batch_metrics(jnp.asarray(ll), jnp.asarray(labels))
    m1 = _line_batch_metrics(jnp.asarray(ll_pad), jnp.asarray(lab_pad),
                             jnp.asarray(rm))
    for k in m0:
        np.testing.assert_allclose(np.asarray(m0[k]), np.asarray(m1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_per_sample_line_counts_batch_of_one_matches_batched(setup):
    """VERDICT r3 item 9: with the knob on, mixed-length batched serving
    equals batch-1 serving (no cross-row line-slot unmasking)."""
    _, params, full, _ = setup
    # Force very different per-row line counts.
    batch = {k: np.asarray(v).copy() for k, v in full.items()}
    t2l = batch["token_to_line"]
    t2l[0] = np.minimum(t2l[0], 2)           # short contract: 3 lines
    t2l[1] = np.minimum(t2l[1], TINY.max_lines - 1)
    t2l[1, -1] = TINY.max_lines - 1          # long contract: all slots
    assert int(t2l[0].max()) < int(t2l[1].max())

    cfg = TINY.__class__(**{**TINY.__dict__, "per_sample_line_counts": True})
    model = SmartContractTransformer(cfg)

    def fwd(b):
        return model.apply(
            {"params": params},
            input_ids=b["input_ids"], attention_mask=b["attention_mask"],
            ast_input_ids=b["ast_input_ids"],
            ast_attention_mask=b["ast_attention_mask"],
            target_ids=b["input_ids"], token_to_line=b["token_to_line"],
            deterministic=True)

    batched = fwd(batch)
    for i in range(2):
        single = fwd({k: v[i:i + 1] for k, v in batch.items()})
        np.testing.assert_allclose(
            np.asarray(batched["line_vulnerability_logits"][i]),
            np.asarray(single["line_vulnerability_logits"][0]),
            rtol=1e-4, atol=1e-5,
            err_msg=f"row {i} batched != batch-of-one with knob on")

    # And the default (parity) config DOES couple: the short row's logits
    # change when batched with a long row — documenting the quirk the knob
    # removes.
    model_parity = SmartContractTransformer(TINY)

    def fwd_p(b):
        return model_parity.apply(
            {"params": params},
            input_ids=b["input_ids"], attention_mask=b["attention_mask"],
            ast_input_ids=b["ast_input_ids"],
            ast_attention_mask=b["ast_attention_mask"],
            target_ids=b["input_ids"], token_to_line=b["token_to_line"],
            deterministic=True)

    batched_p = fwd_p(batch)
    single_p = fwd_p({k: v[0:1] for k, v in batch.items()})
    assert not np.allclose(
        np.asarray(batched_p["line_vulnerability_logits"][0]),
        np.asarray(single_p["line_vulnerability_logits"][0]),
        rtol=1e-4, atol=1e-5), "parity mode should exhibit batch coupling"


def test_fused_lm_ce_matches_unfused_in_train_loss(setup):
    """TrainConfig.fused_lm_ce path: identical loss value (bit-identical CE
    forward) and matching gradients vs the materialized-logits path, with
    and without the row mask."""
    model, params, full, tables = setup

    def lg(batch, fused):
        def f(p):
            total, (metrics, *_rest) = compute_losses(
                model, p, batch, DynamicScalars.init(), jax.random.PRNGKey(0),
                use_gan=True, use_augmentation=False, tables=tables,
                deterministic=True, fused_lm_ce=fused)
            return total, metrics
        (total, metrics), grads = jax.value_and_grad(f, has_aux=True)(params)
        return total, metrics, grads

    padded = {k: np.asarray(v) for k, v in full.items()}
    masked = dict(padded,
                  row_valid=np.array([1, 1, 1, 0], dtype=np.float32))

    for batch in (padded, masked):
        t0, m0, g0 = lg(batch, fused=False)
        t1, m1, g1 = lg(batch, fused=True)
        np.testing.assert_allclose(np.asarray(t0), np.asarray(t1),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m0["ce_loss"]),
                                   np.asarray(m1["ce_loss"]),
                                   rtol=1e-6, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)
