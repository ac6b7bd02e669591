"""Data-parallel weak-scaling measurement on a virtual CPU mesh.

The real environment exposes ONE TPU chip, so absolute multi-chip throughput
cannot be measured here; what CAN be measured is how the GSPMD-sharded train
step *scales* when the dp axis grows with a fixed per-device batch — the
weak-scaling efficiency of the XLA program itself (gradient psum + sharded
data placement), on an 8-device virtual CPU mesh
(``xla_force_host_platform_device_count``, the same recipe as
tests/conftest.py and the driver's dryrun).

For each dp in {1, 2, 4, 8}: per-device batch B is fixed, global batch is
B*dp, and we time the identical fused GAN train step (forward, losses, grads,
psum over dp, 3-tier clip, Adam). Perfect weak scaling = constant step time
as dp grows (global throughput ∝ dp). Prints a JSON summary with per-dp step
times and efficiency vs dp=1.

Caveat printed with the result: on a CPU "mesh" every virtual device shares
the same cores, so compute time inflates with dp; the efficiency number is a
LOWER bound on what ICI-connected chips (which add cores with devices) would
do. The artifact this produces is evidence the sharded program has no
serialization or recompile cliffs as dp grows — per-step host-side overhead
and collective scheduling stay flat.

Usage:
    python tools/scaling_dp.py [--per-device-batch 4] [--steps 6]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = 8


def _impl(per_device_batch: int, steps: int) -> None:
    import time

    import jax
    import numpy as np

    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh, shard_batch
    from sct_gan_tpu.train import SmartContractTrainer

    cfg = ModelConfig(d_model=64, nhead=4, num_encoder_layers=2,
                      num_decoder_layers=2, dim_feedforward=128, dropout=0.1,
                      max_length=128, max_lines=128, vocab_size=256,
                      use_gan=True, compute_dtype="float32",
                      use_flash_attention=False)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    model = SmartContractTransformer(cfg)

    class _Empty:
        def __iter__(self):
            return iter(())

    rng = np.random.default_rng(0)
    rows = []
    t1 = None
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp=dp, mp=1, devices=jax.devices()[:dp])
        trainer = SmartContractTrainer(
            model, _Empty(), _Empty(), tok,
            config=TrainConfig(learning_rate=1e-4, use_gan=True,
                               use_augmentation=True, warmup_epochs=1),
            mesh=mesh, verbose=False)
        b = per_device_batch * dp
        seq = cfg.max_length
        lines = np.minimum(np.arange(seq, dtype=np.int32) // 6, seq - 1)
        batch = {
            "input_ids": rng.integers(0, cfg.vocab_size, (b, seq)).astype(np.int32),
            "attention_mask": np.ones((b, seq), np.int32),
            "ast_input_ids": rng.integers(0, cfg.vocab_size, (b, seq)).astype(np.int32),
            "ast_attention_mask": np.ones((b, seq), np.int32),
            "token_to_line": np.tile(lines, (b, 1)),
            "vulnerable_lines": (rng.random((b, 8, seq)) < 0.01).astype(np.int32),
            "contract_vulnerabilities": rng.integers(0, 2, (b, 8)).astype(np.int32),
        }
        device_batch = shard_batch(batch, mesh)
        scalars = trainer._scalars(1.0)
        lrs = trainer._group_lrs()

        state = trainer.state
        key = jax.random.PRNGKey(0)
        # compile + warmup
        for i in range(2):
            key, sub = jax.random.split(key)
            state, metrics, scalars = trainer.train_step(
                state, device_batch, scalars, lrs, sub)
        jax.block_until_ready(metrics)

        t0 = time.perf_counter()
        for i in range(steps):
            key, sub = jax.random.split(key)
            state, metrics, scalars = trainer.train_step(
                state, device_batch, scalars, lrs, sub)
        jax.block_until_ready(metrics)
        dt = (time.perf_counter() - t0) / steps
        if dp == 1:
            t1 = dt
        # weak-scaling efficiency: perfect = step time flat as dp grows
        rows.append({
            "dp": dp,
            "global_batch": b,
            "step_ms": round(dt * 1e3, 1),
            "global_tokens_per_sec": round(b * seq / dt, 1),
            "weak_scaling_efficiency": round(t1 / dt, 3),
            "loss": float(metrics["total_loss"]),
        })
        print(f"dp={dp}: {rows[-1]}", file=sys.stderr, flush=True)

    print(json.dumps({"mesh": "virtual-cpu-8", "rows": rows}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--inner", action="store_true",
                    help="run the measurement in THIS process (devices "
                         "must already be provisioned)")
    args = ap.parse_args()

    import jax
    if args.inner or len(jax.devices()) >= N_DEVICES:
        _impl(args.per_device_batch, args.steps)
        return

    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={N_DEVICES}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.argv = ['scaling_dp', '--inner', '--per-device-batch', "
        f"'{args.per_device_batch}', '--steps', '{args.steps}']\n"
        "from tools.scaling_dp import main\n"
        "main()\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=here, env=env)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
