"""Full-size tensor-parallel (mp) proof on the virtual CPU mesh.

Counterpart to tools/scaling_dp.py for the mp axis, per VERDICT r3 item 8:
at the REAL model size (d=768, 6+6 layers, vocab 50,265, L=1024) on a
dp=4 x mp=2 virtual 8-device mesh,

  1. verify by GSPMD sharding inspection that the (B, S, 50k) LM logits come
     out mp-sharded on the vocab axis (NOT replicated — a replicated logits
     tensor would defeat the point of sharding the LM head);
  2. run ONE full fused train step and check the loss is finite;
  3. decode parity: one KV-cached decode_step under mp=2 must match the
     single-device logits to f32 tolerance.

Writes results to stdout as one JSON line (and --json FILE).

Usage: python tools/scaling_mp.py [--json scaling_mp.json] [--dp N --mp N]
(self-provisions the virtual CPU mesh by re-exec, the dryrun recipe)

Default mesh is dp=1 x mp=2: this image has ONE physical core, and XLA-CPU's
collective rendezvous has a fatal 40 s skew limit — 8 full-size device
programs timesharing one core cannot all reach an all-reduce in time
(observed F rendezvous.cc:127 termination at dp=4 x mp=2). Two device
threads are schedulable; the mp-sharding facts being proven are identical.
dp scaling is proven separately (tools/scaling_dp.py, tiny shapes).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_virtual_devices() -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
        os.environ["SCALING_MP_REEXEC"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--mp", type=int, default=2)
    args = ap.parse_args()

    _ensure_virtual_devices()
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.infer.generate import _init_caches
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh, shard_batch
    from sct_gan_tpu.train import SmartContractTrainer

    assert len(jax.devices()) >= 8, jax.devices()
    out: dict = {}

    cfg = ModelConfig(use_gan=True, compute_dtype="float32",
                      use_flash_attention=False)   # full size, CPU backend
    assert cfg.d_model == 768 and cfg.vocab_size == 50265
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    model = SmartContractTransformer(cfg)

    class _Empty:
        def __iter__(self):
            return iter(())

    mesh = make_mesh(dp=args.dp, mp=args.mp)
    trainer = SmartContractTrainer(
        model, _Empty(), _Empty(), tok,
        config=TrainConfig(learning_rate=1e-5, use_gan=True,
                           warmup_epochs=1),
        mesh=mesh, verbose=False)

    b, s = args.batch, cfg.max_length
    rng = np.random.default_rng(0)
    lines = np.minimum(np.arange(s, dtype=np.int32) // 6, s - 1)
    batch = {
        "input_ids": rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32),
        "attention_mask": np.ones((b, s), np.int32),
        "ast_input_ids": rng.integers(0, cfg.vocab_size,
                                      (b, s)).astype(np.int32),
        "ast_attention_mask": np.ones((b, s), np.int32),
        "token_to_line": np.tile(lines, (b, 1)),
        "vulnerable_lines": (rng.random((b, 8, s)) < 0.01).astype(np.int32),
        "contract_vulnerabilities": rng.integers(0, 2, (b, 8)).astype(np.int32),
    }

    # -- 1. GSPMD inspection. Two facts are checked:
    # (a) the PADDED-width LM logits (the tensor the LM head actually
    #     produces: padded_vocab_size = 50304, 128-lane + mp-divisible —
    #     the public "logits" are sliced to 50265, which is not divisible
    #     by mp and is never materialized on the fused-CE train path) CAN
    #     come out mp-sharded on the vocab axis, and
    # (b) the actual TRAIN STEP's compiled (partitioned) HLO contains no
    #     full-width (B, S, 50265|50304) rank-3 tensor — i.e. the CE path
    #     keeps the vocab axis sharded instead of all-gathering the logits.
    db = shard_batch(batch, mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _fwd(params, batch):
        outs = model.apply(
            {"params": params}, input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            ast_input_ids=batch["ast_input_ids"],
            ast_attention_mask=batch["ast_attention_mask"],
            target_ids=batch["input_ids"],
            token_to_line=batch["token_to_line"], deterministic=True,
            return_lm_hidden=True)
        # padded-width logits, exactly what the fused-CE path shards
        return model.apply({"params": params}, outs["lm_hidden"],
                           method=lambda m, h: m.output_layer(h))

    fwd_logits = jax.jit(
        _fwd, out_shardings=NamedSharding(mesh, P("dp", None, "mp")))
    logits = fwd_logits(trainer.state.params, db)
    shard_shapes = {tuple(sh.data.shape) for sh in logits.addressable_shards}
    vocab_shard = min(shape[-1] for shape in shard_shapes)
    out["logits_shape"] = list(logits.shape)
    out["logits_vocab_shard_width"] = int(vocab_shard)
    out["logits_mp_sharded"] = bool(vocab_shard < cfg.padded_vocab_size)
    print(f"logits {logits.shape} mp-sharded shard width={vocab_shard}",
          file=sys.stderr)

    # (b): scan the partitioned train-step HLO for full-width vocab tensors
    scalars0 = trainer._scalars(1.0)
    lrs0 = trainer._group_lrs()
    hlo = trainer.train_step.lower(
        trainer.state, db, scalars0, lrs0,
        jax.random.PRNGKey(0)).compile().as_text()
    import re as _re
    full_width = sorted(set(_re.findall(
        r"\w+\[\d+,\d+,(?:%d|%d)\]" % (cfg.vocab_size,
                                       cfg.padded_vocab_size), hlo)))
    out["train_step_full_vocab_tensors"] = full_width
    out["ce_path_mp_sharded"] = not full_width
    print(f"train-step HLO full-width (B,S,{cfg.vocab_size}|"
          f"{cfg.padded_vocab_size}) tensors: "
          f"{full_width or 'none'}", file=sys.stderr)

    # -- 2. one full fused train step at full size under dp=4 x mp=2
    # (compile already cached by the HLO inspection above)
    t0 = time.perf_counter()
    state, metrics, _ = trainer.train_step(trainer.state, db, scalars0, lrs0,
                                           jax.random.PRNGKey(0))
    loss = float(np.asarray(metrics["total_loss"]))
    out["train_step_loss"] = loss
    out["train_step_finite"] = bool(np.isfinite(loss))
    out["train_step_wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"train step: loss={loss:.4f} "
          f"wall={out['train_step_wall_s']}s (incl. compile)",
          file=sys.stderr)

    # -- 3. decode-step parity: mp=2 logits vs single-device logits
    params_host = jax.device_get(state.params)
    dev0 = jax.devices()[0]
    params_1d = jax.device_put(params_host, dev0)

    def one_decode_step(params, placer):
        ids = placer(jnp.asarray(batch["input_ids"][:2]))
        mask = placer(jnp.ones((2, s), jnp.int32))
        memory = model.apply({"params": params}, ids, mask,
                             method=model.encode)
        cross = model.apply({"params": params}, memory,
                            method=model.precompute_cross_kv)
        caches = _init_caches(cfg, 2, dtype=memory.dtype)
        tokens = placer(jnp.ones((2, 1), jnp.int32))
        logits, _ = model.apply({"params": params}, tokens, jnp.int32(0),
                                caches, cross, mask.astype(bool),
                                method=model.decode_step)
        return np.asarray(logits)

    lg_mp = one_decode_step(state.params, lambda x: x)
    lg_1d = one_decode_step(params_1d, lambda x: jax.device_put(x, dev0))
    err = float(np.abs(lg_mp - lg_1d).max())
    out["decode_logits_max_abs_err"] = err
    out["decode_parity_ok"] = bool(err < 1e-3)
    print(f"decode parity: max|Δlogit| = {err:.2e}", file=sys.stderr)

    ok = (out["logits_mp_sharded"] and out["ce_path_mp_sharded"]
          and out["train_step_finite"] and out["decode_parity_ok"])
    out["ok"] = bool(ok)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
