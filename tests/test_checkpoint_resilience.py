"""Checkpoint/HBM-pressure resilience added after the epoch-11 OOM incident:
params-only best checkpoints restore with a fresh optimizer state,
AsyncSaver.drop_pending frees queued snapshots, and prefetch_to_device
retries a RESOURCE_EXHAUSTED placement after invoking on_oom."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.train.checkpoint import AsyncSaver, load_checkpoint, \
    save_checkpoint


def test_params_only_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.int32(7)}
    path = save_checkpoint(str(tmp_path), "best_model_x", tree,
                           {"epoch": 7, "params_only": True})
    got, meta = load_checkpoint(path, target=tree)
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert meta["params_only"] is True
    # restoring with a FULL target (params+opt_state) must fail cleanly —
    # the trainer catches this and falls back to the params-only target
    full_target = dict(tree, opt_state={"m": jnp.zeros((2, 3))})
    with pytest.raises(Exception):
        load_checkpoint(path, target=full_target)


def test_trainer_restores_params_only_best(tmp_path):
    from sct_gan_tpu.config import ModelConfig, TrainConfig
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
    from sct_gan_tpu.parallel.mesh import make_mesh
    from sct_gan_tpu.train import SmartContractTrainer

    cfg = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                      num_decoder_layers=1, dim_feedforward=64, dropout=0.0,
                      max_length=32, max_lines=32, vocab_size=64,
                      use_gan=False, compute_dtype="float32",
                      use_flash_attention=False)
    tok = SolidityTokenizer(vocab_size=cfg.vocab_size)
    model = SmartContractTransformer(cfg)

    class _Empty:
        def __iter__(self):
            return iter(())

    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    trainer = SmartContractTrainer(model, _Empty(), _Empty(), tok,
                                   config=TrainConfig(learning_rate=1e-4),
                                   mesh=mesh, verbose=False)
    tree = {"params": trainer.state.params, "step": trainer.state.step}
    path = save_checkpoint(str(tmp_path), "best_model_tiny", tree,
                           {"epoch": 3, "params_only": True})
    # mutate params so the restore visibly takes effect
    trainer.state = trainer.state._replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                      trainer.state.params))
    trainer.restore(path)
    leaf0 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    ref0 = jax.tree_util.tree_leaves(tree["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf0), np.asarray(ref0))
    assert trainer.current_epoch == 3


def test_drop_pending_frees_queue(tmp_path):
    import threading

    saver = AsyncSaver()
    release = threading.Event()
    started = threading.Event()

    # occupy the worker with a save that blocks until released
    orig = save_checkpoint

    def slow_save(*a, **k):
        started.set()
        release.wait(timeout=30)
        return orig(*a, **k)

    import sct_gan_tpu.train.checkpoint as ckpt_mod
    ckpt_mod_save = ckpt_mod.save_checkpoint
    ckpt_mod.save_checkpoint = slow_save
    try:
        tree = {"params": {"w": jnp.ones((2,))}, "step": jnp.int32(1)}
        saver.submit(str(tmp_path), "best_a", tree, {})
        assert started.wait(timeout=10)
        saver.submit(str(tmp_path), "best_b", tree, {})   # queued
        saver.submit(str(tmp_path), "latest_c", tree, {})  # queued
        assert saver.drop_pending() == 2
        assert saver.drop_pending() == 0
        release.set()
        saver.wait()
    finally:
        ckpt_mod.save_checkpoint = ckpt_mod_save
    # the in-flight save completed; the dropped ones were never written
    names = os.listdir(tmp_path)
    assert any("best_a" in n for n in names)
    assert not any("best_b" in n or "latest_c" in n for n in names)


def test_prefetch_retries_oom_once():
    from sct_gan_tpu.parallel.mesh import make_mesh, prefetch_to_device

    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    batches = [{"x": np.ones((2, 4), np.int32)} for _ in range(3)]
    calls = {"n": 0, "oom": 0}

    import sct_gan_tpu.parallel.mesh as mesh_mod
    orig = mesh_mod.shard_batch

    def flaky(batch, m):
        calls["n"] += 1
        if calls["n"] == 2:   # second placement OOMs once
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return orig(batch, m)

    mesh_mod.shard_batch = flaky
    try:
        out = list(prefetch_to_device(
            iter(batches), mesh,
            on_oom=lambda: calls.__setitem__("oom", calls["oom"] + 1)))
    finally:
        mesh_mod.shard_batch = orig
    assert len(out) == 3
    assert calls["oom"] == 1
    assert calls["n"] == 4    # 3 placements + 1 retry
