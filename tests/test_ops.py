"""Kernel/op parity tests: attention, segment-mean, sampling filters."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sct_gan_tpu.ops.attention import mha_reference
from sct_gan_tpu.ops.segment_mean import line_segment_mean
from sct_gan_tpu.ops.sampling import (
    top_k_filter,
    top_p_filter,
    sample_categorical,
)


def _np_attention(q, k, v, key_padding_mask=None, causal=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if key_padding_mask is not None:
        scores = np.where(key_padding_mask[:, None, None, :], scores, -1e30)
    if causal:
        tri = np.tril(np.ones((sq, sk), dtype=bool))
        scores = np.where(tri, scores, -1e30)
    scores = scores - scores.max(-1, keepdims=True)
    w = np.exp(scores)
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v), w.mean(1)


def test_mha_reference_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 4, 8, 16)).astype(np.float32)
    k = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)
    v = rng.normal(size=(2, 4, 10, 16)).astype(np.float32)
    mask = rng.random((2, 10)) < 0.7
    mask[:, 0] = True
    out, w = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           key_padding_mask=jnp.asarray(mask),
                           return_weights=True)
    exp_out, exp_w = _np_attention(q, k, v, mask)
    np.testing.assert_allclose(out, exp_out, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(w, exp_w, rtol=2e-4, atol=2e-5)


def test_mha_reference_causal():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 2, 6, 8)).astype(np.float32)
    out = mha_reference(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                        causal=True)
    exp, _ = _np_attention(q, q, q, causal=True)
    np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-5)
    # First query position attends only to itself
    np.testing.assert_allclose(out[0, :, 0], q[0, :, 0], rtol=1e-5)


def test_flash_attention_matches_reference_interpret():
    """Pallas kernel in interpreter mode (CPU) vs the jnp reference."""
    from jax.experimental.pallas import tpu as pltpu
    from sct_gan_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 2, 256, 64)).astype(np.float32)
    k = rng.normal(size=(2, 2, 256, 64)).astype(np.float32)
    v = rng.normal(size=(2, 2, 256, 64)).astype(np.float32)
    mask = rng.random((2, 256)) < 0.8
    mask[:, 0] = True
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              key_padding_mask=jnp.asarray(mask))
        out_c = flash_attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), causal=True)
    exp = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        key_padding_mask=jnp.asarray(mask))
    exp_c = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          causal=True)
    np.testing.assert_allclose(out, exp, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out_c, exp_c, rtol=2e-4, atol=2e-4)


def test_segment_mean_matches_loop():
    rng = np.random.default_rng(3)
    b, s, d, L = 2, 32, 8, 16
    memory = rng.normal(size=(b, s, d)).astype(np.float32)
    ttl = rng.integers(0, 12, size=(b, s)).astype(np.int32)
    means, counts = line_segment_mean(jnp.asarray(memory), jnp.asarray(ttl), L)
    for bi in range(b):
        for l in range(L):
            mask = ttl[bi] == l
            assert counts[bi, l] == mask.sum()
            if mask.any():
                np.testing.assert_allclose(means[bi, l],
                                           memory[bi, mask].mean(0),
                                           rtol=1e-4, atol=1e-5)
            else:
                np.testing.assert_allclose(means[bi, l], 0.0, atol=1e-6)


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(top_k_filter(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 4] == 4.0
    assert (out[0, [0, 2, 3]] < -1e29).all()


def test_top_p_filter_keeps_first():
    # One dominant logit: top-p must always keep the argmax.
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(top_p_filter(logits, 0.5))
    assert out[0, 0] == 10.0
    assert (out[0, 1:] < -1e29).all()


def test_fused_top_k_top_p_matches_dense():
    """The fused (k-element) composed filter must equal the dense
    full-vocab-sort composition element-for-element."""
    from sct_gan_tpu.ops.sampling import (_dense_top_k_top_p,
                                          top_k_top_p_filter)
    rng = np.random.default_rng(11)
    for shape, k, p in [((4, 503), 50, 0.95), ((2, 64), 8, 0.5),
                        ((1, 32), 32, 0.9), ((3, 40), 5, 1.0),
                        ((2, 3, 64), 7, 0.8)]:
        logits = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        fused = np.asarray(top_k_top_p_filter(logits, k, p))
        dense = np.asarray(_dense_top_k_top_p(logits, k, p))
        np.testing.assert_allclose(fused, dense, rtol=0, atol=0)


def test_sample_top_k_top_p_distribution_exact():
    """The in-top-k sampler must draw from EXACTLY the distribution of
    categorical(dense filtered logits): same support, and empirical
    frequencies within binomial noise of the dense path's probabilities."""
    from sct_gan_tpu.ops.sampling import (_dense_top_k_top_p,
                                          sample_top_k_top_p)
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(0, 2, (1, 257)).astype(np.float32))
    k, p = 8, 0.9
    dense = np.asarray(jax.nn.softmax(
        jnp.asarray(_dense_top_k_top_p(logits, k, p)), -1))[0]
    support = set(np.flatnonzero(dense > 1e-9).tolist())
    n = 20_000
    draws = sample_top_k_top_p(
        jax.random.PRNGKey(0), jnp.tile(logits, (n, 1)), k, p)
    draws = np.asarray(draws)
    assert set(draws.tolist()) <= support
    freq = np.bincount(draws, minlength=257) / n
    # 5-sigma binomial bound per kept token
    for t in support:
        sd = (dense[t] * (1 - dense[t]) / n) ** 0.5
        assert abs(freq[t] - dense[t]) < 5 * sd + 1e-4, (t, freq[t], dense[t])


@pytest.mark.parametrize("s,masked", [(128, "causal"), (256, "padding"),
                                      (64, "one_row_fully_masked")])
def test_decode_attention_matches_reference_interpret(s, masked):
    """Fused single-query decode attention vs mha_reference at Sq=1
    (interpret mode), incl. the fully-masked-row zero convention."""
    from sct_gan_tpu.ops.attention import mha_reference
    from sct_gan_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(9)
    b, h, dp = 3, 4, 128
    q = jnp.asarray(rng.normal(0, 1, (b, h, 1, dp)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (b, h, s, dp)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (b, h, s, dp)), jnp.float32)
    if masked == "causal":
        mask = jnp.broadcast_to(jnp.arange(s)[None, :] <= 17, (b, s))
    elif masked == "padding":
        mask = jnp.asarray(rng.random((b, s)) < 0.7)
        mask = mask.at[:, 0].set(True)
    else:
        mask = jnp.ones((b, s), bool).at[1].set(False)
    scale = 1.0 / (96 ** 0.5)
    want = np.asarray(mha_reference(q, k, v, key_padding_mask=mask,
                                    sm_scale=scale))
    got = np.asarray(decode_attention(q, k, v, mask, sm_scale=scale,
                                      interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    if masked == "one_row_fully_masked":
        assert np.all(got[1] == 0.0)


def test_top_p_filter_mass():
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(3, 20)).astype(np.float32))
    out = np.asarray(top_p_filter(logits, 0.9))
    probs = jax.nn.softmax(jnp.asarray(logits), -1)
    for i in range(3):
        kept = out[i] > -1e29
        kept_probs = np.sort(np.asarray(probs[i])[kept])[::-1]
        # Mass of kept tokens minus the smallest kept token must be < p
        # (the reference keeps the first token crossing the threshold).
        assert kept_probs.sum() - kept_probs[-1] < 0.9 + 1e-6
        assert kept.sum() >= 1


def test_sample_categorical_respects_filter():
    rng = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.tile([[10.0, -10.0, 9.5, -10.0]], (64, 1)))
    toks = sample_categorical(rng, logits, temperature=0.7, top_k=2, top_p=0.95)
    assert set(np.asarray(toks).tolist()) <= {0, 2}


def test_hash_dropout_statistics():
    """The fused-hash mask stream: keep-rate within binomial bounds at
    several rates, no inter-seed correlation, and no row/column structure
    (every row and column of a (256, 512) mask keeps 40-60% at rate 0.5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sct_gan_tpu.ops.dropout import _hash_keep

    for rate in (0.1, 0.3, 0.5):
        keep = np.asarray(_hash_keep((256, 512), jnp.int32(123), rate))
        got = keep.mean()
        # 131072 draws: 5 sigma ≈ 0.007
        assert abs(got - (1.0 - rate)) < 0.01, (rate, got)
    k1 = np.asarray(_hash_keep((256, 512), jnp.int32(1), 0.5))
    k2 = np.asarray(_hash_keep((256, 512), jnp.int32(2), 0.5))
    agree = (k1 == k2).mean()
    assert 0.45 < agree < 0.55          # independent streams
    assert ((k1.mean(axis=0) > 0.35) & (k1.mean(axis=0) < 0.65)).all()
    assert ((k1.mean(axis=1) > 0.35) & (k1.mean(axis=1) < 0.65)).all()


def test_fast_dropout_cpu_fallback():
    """fast_dropout semantics (fused-hash path on every platform)."""
    import jax
    import jax.numpy as jnp
    from sct_gan_tpu.ops.dropout import fast_dropout

    x = jnp.ones((64, 256), jnp.float32)
    key = jax.random.PRNGKey(0)
    assert (fast_dropout(x, 0.5, key, deterministic=True) == x).all()
    assert (fast_dropout(x, 0.0, key) == x).all()
    y = fast_dropout(x, 0.5, key)
    y2 = fast_dropout(x, 0.5, key)
    assert (y == y2).all()                       # deterministic per key
    kept = float((y != 0).mean())
    assert 0.4 < kept < 0.6                      # ~keep prob
    nz = y[y != 0]
    assert jnp.allclose(nz, 2.0)                 # 1/(1-rate) scaling
    # gradient is mask/(1-rate)
    g = jax.grad(lambda x_: fast_dropout(x_, 0.5, key).sum())(x)
    assert jnp.allclose(g, (y != 0) / 0.5)


@pytest.mark.parametrize("block_k,causal", [(256, False), (128, True),
                                            (64, False)])
def test_flash_attention_grads_match_reference_interpret(block_k, causal):
    """Backward kernels (dKV natural-orientation dot_generals + the
    single-pass specializations) vs reference autodiff, in interpreter
    mode. block_k=256 exercises the nk==1/nq==1 single-pass paths;
    128/64 exercise the streaming scratch-carry paths."""
    from jax.experimental.pallas import tpu as pltpu
    from sct_gan_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(7)
    q = rng.normal(size=(1, 2, 256, 64)).astype(np.float32) * 0.3
    k = rng.normal(size=(1, 2, 256, 64)).astype(np.float32) * 0.3
    v = rng.normal(size=(1, 2, 256, 64)).astype(np.float32)
    mask = rng.random((1, 256)) < 0.85
    mask[:, 0] = True
    g = rng.normal(size=q.shape).astype(np.float32)

    def flash_loss(q_, k_, v_):
        out = flash_attention(q_, k_, v_,
                              key_padding_mask=jnp.asarray(mask),
                              causal=causal, block_q=128, block_k=block_k)
        return jnp.sum(out * jnp.asarray(g))

    def ref_loss(q_, k_, v_):
        out = mha_reference(q_, k_, v_, key_padding_mask=jnp.asarray(mask),
                            causal=causal)
        return jnp.sum(out * jnp.asarray(g))

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(flash_loss, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    exp = jax.grad(ref_loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for name, a, b in zip("qkv", got, exp):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4,
                                   err_msg=f"d{name}")


def test_fused_linear_cross_entropy_value_and_grads():
    """ops/fused_ce.py custom VJP vs jax.grad of the naive formulation:
    value and all three gradients (hidden, kernel, bias) must match. Guards
    the hand-written backward (softmax - onehot, scatter-free) against
    regressions — previously only checked by the manual tools/time_lmce.py
    run."""
    import jax
    from sct_gan_tpu.ops.fused_ce import fused_linear_cross_entropy

    rng = np.random.default_rng(0)
    b, s, d, v = 2, 16, 8, 64
    x = jnp.asarray(rng.normal(0, 1, (b, s, d)), jnp.float32)
    W = jnp.asarray(rng.normal(0, 0.3, (d, v)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (v,)), jnp.float32)
    t = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)

    def naive(x, W, bias, t):
        logits = x @ W + bias
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, t[..., None], axis=-1)[..., 0]
        return (lse - picked).mean()

    want = float(naive(x, W, bias, t))
    got = float(fused_linear_cross_entropy(x, W, bias, t))
    assert got == pytest.approx(want, rel=1e-6)

    g_want = jax.grad(naive, argnums=(0, 1, 2))(x, W, bias, t)
    g_got = jax.grad(fused_linear_cross_entropy,
                     argnums=(0, 1, 2))(x, W, bias, t)
    for name, a, e in zip(("dx", "dW", "db"), g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-6, err_msg=name)

    # cotangent scaling: grad of 3*ce must be 3x (exercises the g/N path)
    g3 = jax.grad(lambda *a: 3.0 * fused_linear_cross_entropy(*a),
                  argnums=(0,))(x, W, bias, t)[0]
    np.testing.assert_allclose(np.asarray(g3), 3.0 * np.asarray(g_got[0]),
                               rtol=1e-5, atol=1e-6)


def test_fused_linear_cross_entropy_bf16_matches_shipped_numerics():
    """bf16 path: forward must be bit-identical to the shipped formulation
    (bf16 logits incl. bias, f32 logsumexp/picked)."""
    import jax
    from sct_gan_tpu.ops.fused_ce import fused_linear_cross_entropy

    rng = np.random.default_rng(1)
    b, s, d, v = 2, 32, 16, 128
    x = jnp.asarray(rng.normal(0, 1, (b, s, d)), jnp.bfloat16)
    W = jnp.asarray(rng.normal(0, 0.3, (d, v)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(0, 0.1, (v,)), jnp.float32)
    t = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)

    def shipped(x, W, bias, t):
        logits = x @ W.astype(x.dtype) + bias.astype(x.dtype)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32),
                                          axis=-1)
        picked = jnp.take_along_axis(
            logits, t[..., None], axis=-1)[..., 0].astype(jnp.float32)
        return (lse - picked).mean()

    assert float(fused_linear_cross_entropy(x, W, bias, t)) == \
        float(shipped(x, W, bias, t))


def test_flash_fused_backward_single_block_interpret():
    """nq==1, nk==1: the fused backward kernel's no-scratch path (whole
    sequence in one tile) vs reference autodiff."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from sct_gan_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(9)
    q = rng.normal(size=(2, 2, 256, 64)).astype(np.float32)
    k = rng.normal(size=(2, 2, 256, 64)).astype(np.float32)
    v = rng.normal(size=(2, 2, 256, 64)).astype(np.float32)
    g = rng.normal(size=q.shape).astype(np.float32)
    mask = rng.random((2, 256)) < 0.9
    mask[:, 0] = True

    def flash_loss(q_, k_, v_):
        out = flash_attention(q_, k_, v_, key_padding_mask=jnp.asarray(mask),
                              causal=True, block_q=256, block_k=256)
        return jnp.sum(out * jnp.asarray(g))

    def ref_loss(q_, k_, v_):
        out = mha_reference(q_, k_, v_, key_padding_mask=jnp.asarray(mask),
                            causal=True)
        return jnp.sum(out * jnp.asarray(g))

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(flash_loss, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    exp = jax.grad(ref_loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for name, a, b in zip("qkv", got, exp):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4,
                                   err_msg=f"d{name}")


def test_embedding_lookup_forward_and_grads_match_native():
    """Sort-based embedding backward (ops/embed.py) == native scatter-add
    backward, on ids with heavy duplication, to f32 reassociation
    tolerance; forward is bit-identical."""
    from sct_gan_tpu.ops.embed import embedding_lookup

    rng = np.random.default_rng(0)
    v, d = 97, 16
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    for shape in [(4, 33), (128,), (2, 3, 5)]:
        ids = jnp.asarray(rng.integers(0, v, size=shape), jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(embedding_lookup(table, ids)),
            np.asarray(jnp.take(table, ids, axis=0)))

        cot = jnp.asarray(rng.normal(size=shape + (d,)), jnp.float32)
        loss_new = lambda t: (embedding_lookup(t, ids) * cot).sum()
        loss_ref = lambda t: (jnp.take(t, ids, axis=0) * cot).sum()
        g_new = jax.grad(loss_new)(table)
        g_ref = jax.grad(loss_ref)(table)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)


def test_embedding_lookup_grad_single_id_all_duplicates():
    """Every slot the same id: one run covering the whole sort — the
    boundary-difference path must produce the full sum in row `id` and
    zero elsewhere."""
    from sct_gan_tpu.ops.embed import embedding_lookup

    v, d, n = 11, 4, 64
    table = jnp.zeros((v, d), jnp.float32)
    ids = jnp.full((n,), 7, jnp.int32)
    cot = jnp.ones((n, d), jnp.float32)
    g = jax.grad(lambda t: (embedding_lookup(t, ids) * cot).sum())(table)
    want = np.zeros((v, d), np.float32)
    want[7] = n
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)
