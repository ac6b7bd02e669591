"""On-TPU kernel validation suite (run manually: the pytest suite runs on the
CPU backend where the Pallas kernels don't dispatch).

    /opt/venv/bin/python tools/validate_tpu_kernels.py

Checks, on the real chip:
  * flash forward vs pure-JAX reference (masked, causal, odd head dims);
  * flash backward (fused dKV/dQ kernels) vs reference autodiff;
  * in-kernel dropout: determinism per seed, seed sensitivity, mean
    preservation, rate→0 gradient limit.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from sct_gan_tpu.ops.attention import mha_reference
    from sct_gan_tpu.ops.flash_attention import flash_attention

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: backend is {jax.default_backend()}, need TPU")
        return 0

    rng = np.random.default_rng(0)
    failures = 0

    def check(name, cond, detail=""):
        nonlocal failures
        status = "ok" if cond else "FAIL"
        if not cond:
            failures += 1
        print(f"[{status}] {name} {detail}")

    # forward + backward parity
    # 4096/8192 rows: the kernels stream K/V blockwise, so VMEM use is
    # length-independent — these validate the "scales by construction" claim
    # (small b·h keeps the QUADRATIC pure-JAX *reference* inside HBM).
    for (b, h, s, dh, causal) in [(2, 4, 256, 64, False),
                                  (2, 4, 256, 64, True),
                                  (1, 8, 1024, 96, False),
                                  (1, 2, 4096, 96, False),
                                  (1, 1, 8192, 96, True)]:
        q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
        mask = jnp.asarray(rng.random((b, s)) > 0.2)
        of = flash_attention(q, k, v, key_padding_mask=mask, causal=causal)
        orf = mha_reference(q, k, v, key_padding_mask=mask, causal=causal)
        err = float(jnp.abs(of - orf).max())
        check(f"fwd b{b} h{h} s{s} causal={causal}", err < 2e-2,
              f"max_err={err:.2e}")

        w = jnp.asarray(rng.standard_normal(of.shape), jnp.float32)
        gf = jax.grad(lambda *a: jnp.sum(flash_attention(
            *a, key_padding_mask=mask, causal=causal) * w),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(mha_reference(
            *a, key_padding_mask=mask, causal=causal) * w),
            argnums=(0, 1, 2))(q, k, v)
        err = max(float(jnp.abs(a - b_).max()) for a, b_ in zip(gf, gr))
        check(f"bwd b{b} h{h} s{s} causal={causal}", err < 5e-2,
              f"max_err={err:.2e}")

    # bf16 operands (the production path: projections emit bf16; kernels keep
    # bf16 matmul operands with f32 accumulation)
    for (b, h, s, dh, causal) in [(2, 8, 1024, 96, False),
                                  (2, 8, 1024, 96, True)]:
        q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
        mask = jnp.asarray(rng.random((b, s)) > 0.2)
        of = flash_attention(q, k, v, key_padding_mask=mask, causal=causal)
        orf = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), key_padding_mask=mask,
                            causal=causal)
        err = float(jnp.abs(of.astype(jnp.float32) - orf).max())
        check(f"fwd bf16 s{s} dh{dh} causal={causal}", err < 5e-2,
              f"max_err={err:.2e}")
        w = jnp.asarray(rng.standard_normal(of.shape), jnp.float32)
        gf = jax.grad(lambda *a: jnp.sum(flash_attention(
            *a, key_padding_mask=mask, causal=causal).astype(jnp.float32)
            * w), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda *a: jnp.sum(mha_reference(
            *a, key_padding_mask=mask, causal=causal) * w),
            argnums=(0, 1, 2))(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
        err = max(float(jnp.abs(a.astype(jnp.float32) - b_).max())
                  for a, b_ in zip(gf, gr))
        check(f"bwd bf16 s{s} dh{dh} causal={causal}", err < 2e-1,
              f"max_err={err:.2e}")

    # dropout behavior
    b, h, s, dh = 2, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    mask = jnp.asarray(rng.random((b, s)) > 0.2)
    key = jax.random.PRNGKey(42)
    clean = flash_attention(q, k, v, key_padding_mask=mask)
    o1 = flash_attention(q, k, v, key_padding_mask=mask, dropout_rate=0.3,
                         dropout_rng=key)
    o1b = flash_attention(q, k, v, key_padding_mask=mask, dropout_rate=0.3,
                          dropout_rng=key)
    o2 = flash_attention(q, k, v, key_padding_mask=mask, dropout_rate=0.3,
                         dropout_rng=jax.random.PRNGKey(7))
    check("dropout deterministic per seed", bool(jnp.allclose(o1, o1b)))
    check("dropout varies across seeds", not bool(jnp.allclose(o1, o2)))
    mean = sum(flash_attention(q, k, v, key_padding_mask=mask,
                               dropout_rate=0.3,
                               dropout_rng=jax.random.PRNGKey(i))
               for i in range(24)) / 24
    rel = float(jnp.abs(mean - clean).mean() / jnp.abs(clean).mean())
    check("dropout mean-preserving", rel < 0.25, f"rel={rel:.3f}")
    g_clean = jax.grad(lambda *a: (flash_attention(
        *a, key_padding_mask=mask) ** 2).sum(), argnums=0)(q, k, v)
    g_tiny = jax.grad(lambda *a: (flash_attention(
        *a, key_padding_mask=mask, dropout_rate=1e-7,
        dropout_rng=key) ** 2).sum(), argnums=0)(q, k, v)
    err = float(jnp.abs(g_tiny - g_clean).max())
    check("dropout rate→0 gradient limit", err < 1e-2, f"max_err={err:.2e}")

    # Dropout-mask forward/backward consistency at FULL rate and the
    # production sequence length. The mask for tile (b, h, qi, kj) is a pure
    # function of (seed, tile coords), so the backward must tile the
    # sequence EXACTLY like the forward — a fwd (512,1024) vs bwd-clamped
    # (512,512) mismatch once made every dropout gradient garbage (×1500
    # grad-norm amplification in the full model). With q=k=0 the attention
    # weights are uniform, so the forward linearly exposes the mask:
    # out = M @ v / (S(1-r)); extract M column-block by column-block, then
    # check the kernel's dV against the extracted-mask reference.
    # (A finite-difference check is useless here: TPU default-precision f32
    # matmuls drown the FD signal.)
    S, Dh, rate = 1024, 96, 0.3
    dkey = jax.random.PRNGKey(11)
    kpm1 = jnp.ones((1, S), bool)
    q0 = jnp.zeros((1, 1, S, Dh), jnp.float32)
    cols = []
    for j0 in range(0, S, Dh):
        vbasis = jnp.zeros((S, Dh), jnp.float32)
        w = min(Dh, S - j0)
        vbasis = vbasis.at[j0:j0 + w, :w].set(jnp.eye(w))
        out = flash_attention(q0, q0, vbasis[None, None],
                              key_padding_mask=kpm1, dropout_rate=rate,
                              dropout_rng=dkey)
        cols.append(np.asarray(jax.device_get(out[0, 0, :, :w]))
                    * S * (1 - rate))
    M = np.concatenate(cols, axis=1)
    keep = float((M > 0.5).mean())
    binary = bool(np.all((np.abs(M) < 1e-2) | (np.abs(M - 1.0) < 1e-2)))
    check("dropout fwd mask binary + keep rate", binary
          and abs(keep - (1 - rate)) < 0.01, f"keep={keep:.4f}")
    dO = jnp.asarray(rng.normal(size=(1, 1, S, Dh)), jnp.float32)
    v_in = jnp.asarray(rng.normal(size=(1, 1, S, Dh)), jnp.float32)
    g_v = jax.grad(lambda v_: jnp.vdot(flash_attention(
        q0, q0, v_, key_padding_mask=kpm1, dropout_rate=rate,
        dropout_rng=dkey), dO))(v_in)
    ref = (M / (S * (1 - rate))).T @ np.asarray(jax.device_get(dO))[0, 0]
    relv = float(np.abs(np.asarray(jax.device_get(g_v))[0, 0] - ref).max()
                 / (np.abs(ref).max() + 1e-9))
    check("dropout bwd regenerates the fwd mask (dV parity)", relv < 0.05,
          f"rel_err={relv:.4f}")

    # -- fast_dropout (ops/dropout.py): in-kernel PRNG elementwise dropout --
    from sct_gan_tpu.ops.dropout import fast_dropout
    x = jnp.asarray(rng.normal(size=(8, 1024, 768)), jnp.bfloat16)
    kk = jax.random.PRNGKey(3)
    d1 = fast_dropout(x, 0.3, kk)
    d1b = fast_dropout(x, 0.3, kk)
    d2 = fast_dropout(x, 0.3, jax.random.PRNGKey(4))
    check("fast_dropout deterministic per key", bool(jnp.allclose(d1, d1b)))
    check("fast_dropout varies across keys", not bool(jnp.allclose(d1, d2)))
    kept = float((d1 != 0).mean())
    check("fast_dropout keep rate", abs(kept - 0.7) < 0.02, f"kept={kept:.3f}")
    nz = d1[d1 != 0] / x[d1 != 0]
    scale_err = float(jnp.abs(nz.astype(jnp.float32) - 1.0 / 0.7).max())
    check("fast_dropout scale", scale_err < 1e-2, f"err={scale_err:.2e}")
    # backward regenerates the same mask: grad of sum == mask * inv
    # (mask taken from an f32 forward — tiling, and hence the per-tile
    # stream, is dtype-dependent)
    xf = x.astype(jnp.float32)
    g = jax.grad(lambda x_: fast_dropout(x_, 0.3, kk).sum())(xf)
    mask = (fast_dropout(xf, 0.3, kk) != 0).astype(jnp.float32)
    gerr = float(jnp.abs(g - mask / 0.7).max())
    check("fast_dropout backward mask regen", gerr < 1e-5,
          f"max_err={gerr:.2e}")

    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
