"""Golden parity tests: vectorized losses vs naive numpy reimplementations of
the reference math (SCT-GAN/train.py:99-478)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sct_gan_tpu.losses.focal import (
    contract_level_focal_loss,
    focal_loss,
    spatial_aware_focal_loss,
)
from sct_gan_tpu.losses.syntax import (
    SyntaxLossTables,
    cross_entropy_loss,
    solidity_syntax_loss,
    syntax_penalty,
)
from sct_gan_tpu.data.tokenizer import SolidityTokenizer


def _np_bce(logits, targets):
    return np.maximum(logits, 0) - logits * targets + np.log1p(
        np.exp(-np.abs(logits)))


def test_focal_loss_matches_naive():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(16, 8)).astype(np.float32)
    target = (rng.random((16, 8)) < 0.2).astype(np.float32)
    bce = _np_bce(pred, target)
    pt = np.exp(-bce)
    expected = (0.25 * (1 - pt) ** 2.0 * bce).mean()
    got = focal_loss(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_contract_focal_fn_penalty():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(8, 8)).astype(np.float32)
    target = (rng.random((8, 8)) < 0.3).astype(np.float32)
    bce = _np_bce(pred, target)
    pt = np.exp(-bce)
    fl = 0.05 * (1 - pt) ** 4.0 * bce
    probs = 1 / (1 + np.exp(-pred))
    fl = fl * np.where((target == 1) & (probs < 0.5), 2.0, 1.0)
    got = contract_level_focal_loss(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(got, fl.mean(), rtol=1e-5)


def _np_spatial_penalty(pred, target, ttl):
    """Literal transcription of the reference loop (train.py:221-242)."""
    b, s, c = pred.shape
    penalty = np.zeros_like(pred)
    for bi in range(b):
        for i in range(s):
            near = (np.abs(ttl[bi] - ttl[bi, i]) <= 2)
            near[i] = False
            if near.any():
                if target[bi, near].sum() > 0:
                    sig = 1 / (1 + np.exp(-pred[bi, near]))
                    penalty[bi, i] = sig.mean(axis=0) * 0.1
    return penalty


def test_spatial_focal_matches_naive_loop():
    rng = np.random.default_rng(2)
    b, s, c = 2, 24, 4
    pred = rng.normal(size=(b, s, c)).astype(np.float32)
    target = (rng.random((b, s, c)) < 0.15).astype(np.float32)
    ttl = rng.integers(0, 6, size=(b, s)).astype(np.int32)

    bce = _np_bce(pred, target)
    pt = np.exp(-bce)
    fl = 0.25 * (1 - pt) ** 2.0 * bce
    probs = 1 / (1 + np.exp(-pred))
    fl = fl + np.where(target == 1, np.maximum(0.3 - probs, 0) * 0.5, 0)
    fl = fl + np.where(target == 0, np.maximum(probs - 0.5, 0) * 0.2, 0)
    fl = fl + 0.2 * _np_spatial_penalty(pred, target, ttl)
    expected = fl.mean()

    got = spatial_aware_focal_loss(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(ttl))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def _np_syntax_penalty(t, tables):
    """Literal transcription of the reference scan (train.py:378-421)."""
    b, s = t.shape
    total, count = 0.0, 0
    kw = dict(zip(tables.keyword_ids, tables.follower_ids))
    for bi in range(b):
        for i in range(s - 1):
            cur, nxt = t[bi, i], t[bi, i + 1]
            if cur in kw and kw[cur] and nxt not in kw[cur]:
                total += 2.0
                count += 1
            if cur in (tables.return_id, tables.break_id, tables.continue_id):
                if nxt != tables.semicolon_id:
                    total += 1.5
                    count += 1
            if cur == tables.open_paren_id:
                if not any(t[bi, j] == tables.close_paren_id
                           for j in range(i + 1, min(i + 20, s))):
                    total += 1.0
                    count += 1
            if cur == tables.open_brace_id:
                if not any(t[bi, j] == tables.close_brace_id
                           for j in range(i + 1, min(i + 50, s))):
                    total += 1.0
                    count += 1
    return total / count if count else 0.0


def test_syntax_penalty_matches_naive_scan():
    tok = SolidityTokenizer()
    tables = SyntaxLossTables.from_tokenizer(tok)
    code = ("function f ( ) public { if ( x ) { return ; } "
            "return x ; break } pragma solidity ( y")
    ids = np.asarray([tok.encode(code, add_special_tokens=False)],
                     dtype=np.int32)
    expected = _np_syntax_penalty(ids, tables)
    got = float(syntax_penalty(jnp.asarray(ids), tables))
    assert expected > 0  # the snippet does contain violations
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_syntax_penalty_random_ids_parity():
    tok = SolidityTokenizer()
    tables = SyntaxLossTables.from_tokenizer(tok)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 200, size=(3, 80)).astype(np.int32)
    expected = _np_syntax_penalty(ids, tables)
    got = float(syntax_penalty(jnp.asarray(ids), tables))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(2, 6, 11)).astype(np.float32)
    targets = rng.integers(0, 11, size=(2, 6))
    lse = np.log(np.exp(logits).sum(-1))
    nll = lse - np.take_along_axis(logits, targets[..., None], -1)[..., 0]
    got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(got, nll.mean(), rtol=1e-5)


def test_solidity_syntax_loss_composition():
    tok = SolidityTokenizer()
    tables = SyntaxLossTables.from_tokenizer(tok)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 150, size=(2, 32)).astype(np.int32)
    logits = rng.normal(size=(2, 32, 200)).astype(np.float32)
    total, ce, pen = solidity_syntax_loss(jnp.asarray(logits),
                                          jnp.asarray(ids), tables,
                                          syntax_weight=0.5)
    np.testing.assert_allclose(total, ce + 0.5 * pen, rtol=1e-6)


def test_spatial_penalty_banded_matches_dense():
    """The O(S·C) line-bucketed penalty must equal the O(S²·C) pairwise
    oracle exactly (same neighborhood definition, self-exclusion, gating)."""
    import numpy as np
    import jax.numpy as jnp
    from sct_gan_tpu.losses.focal import (_spatial_penalty,
                                          _spatial_penalty_dense)
    rng = np.random.default_rng(0)
    b, s, c = 3, 64, 8
    pred = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    target = jnp.asarray((rng.random((b, s, c)) < 0.05), jnp.float32)
    ttl = jnp.asarray(np.sort(rng.integers(0, 20, (b, s)), axis=1), jnp.int32)
    banded = _spatial_penalty(pred, target, ttl)
    dense = _spatial_penalty_dense(pred, target, ttl)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)
    # unsorted line ids too (augmented batches carry arbitrary maps)
    ttl2 = jnp.asarray(rng.integers(0, 20, (b, s)), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(_spatial_penalty(pred, target, ttl2)),
        np.asarray(_spatial_penalty_dense(pred, target, ttl2)),
        rtol=1e-5, atol=1e-6)
