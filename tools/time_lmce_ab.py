"""On-chip A/B: full train step with the fused LM-head+CE custom VJP
(TrainConfig.fused_lm_ce) vs the materialized-logits path, at full size
(d=768, 6+6L, B=8, L=1024, GAN).

Differential timing per bench.py. Run SOLO.

Usage: python tools/time_lmce_ab.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sct_gan_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from bench import make_batch, time_step
    from sct_gan_tpu.config import ModelConfig, TrainConfig

    batch_size, seq = 8, 1024
    results = {}
    for name, fused in (("fused_lm_ce", True), ("materialized", False)):
        import jax
        from sct_gan_tpu.data.tokenizer import SolidityTokenizer
        from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
        from sct_gan_tpu.parallel.mesh import make_mesh
        from sct_gan_tpu.train import SmartContractTrainer

        cfg = ModelConfig(use_gan=True, max_length=seq, max_lines=seq,
                          compute_dtype="bfloat16", use_flash_attention=True)
        tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
        model = SmartContractTransformer(cfg)

        class _Empty:
            def __iter__(self):
                return iter(())

        mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
        trainer = SmartContractTrainer(
            model, _Empty(), _Empty(), tok,
            config=TrainConfig(learning_rate=1e-5, use_gan=True,
                               warmup_epochs=1, fused_lm_ce=fused),
            mesh=mesh, verbose=False)
        batch = make_batch(batch_size, seq, cfg.vocab_size)
        print(f"[{name}] compiling + timing...", flush=True)
        dt, state = time_step(trainer, batch)
        tps = batch_size * seq / dt
        results[name] = dt
        print(f"[{name}] {dt*1e3:.1f} ms/step = {tps:,.0f} tok/s/chip",
              flush=True)
        del trainer, state

    d = (results["materialized"] - results["fused_lm_ce"]) * 1e3
    print(f"delta: fused_lm_ce saves {d:+.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
