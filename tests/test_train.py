"""Training-stack tests: optimizer groups, fused step, trainer loop,
checkpointing, and multi-device data parallelism on the virtual CPU mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig, TrainConfig
from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                      SmartContractVulnerabilityDataset)
from sct_gan_tpu.models.sct_transformer import SmartContractTransformer
from sct_gan_tpu.parallel.mesh import make_mesh
from sct_gan_tpu.train import (GroupLRs, ReduceLROnPlateau,
                               SmartContractTrainer, group_index_tree,
                               load_checkpoint)
from sct_gan_tpu.train.optimizer import GROUPS, group_of

TINY = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                   num_decoder_layers=1, dim_feedforward=64, dropout=0.1,
                   max_length=64, max_lines=64, vocab_size=512,
                   use_gan=True, compute_dtype="float32",
                   use_flash_attention=False)


@pytest.fixture(scope="module")
def tiny_tokenizer():
    # vocab must fit the tiny model's embedding table: OOV hash buckets land
    # in [first_free, vocab_size)
    from sct_gan_tpu.data.tokenizer import SolidityTokenizer
    return SolidityTokenizer(vocab_size=TINY.vocab_size)


@pytest.fixture(scope="module")
def loaders(tiny_tokenizer):
    from sct_gan_tpu.data.synthetic import generate_corpus
    records = generate_corpus(n=8, seed=1)
    ds = SmartContractVulnerabilityDataset(
        records=records, tokenizer=tiny_tokenizer, max_length=TINY.max_length)
    train = ArrayDataLoader(ds, batch_size=4, shuffle=True, seed=0)
    val = ArrayDataLoader(ds, batch_size=4, shuffle=False)
    return train, val


@pytest.fixture(scope="module")
def trainer(tiny_tokenizer, loaders):
    model = SmartContractTransformer(TINY)
    return SmartContractTrainer(
        model, loaders[0], loaders[1], tiny_tokenizer,
        learning_rate=1e-3, use_augmentation=False, use_gan=True,
        config=TrainConfig(learning_rate=1e-3, use_gan=True, warmup_epochs=1),
        verbose=False)


def test_param_group_labels():
    assert group_of("encoder/layer_0/self_attn/q_proj/kernel", True) == "base"
    assert group_of("contract_vulnerability_head/dense_0/kernel", True) == "contract"
    assert group_of("line_feature_extractor/linear1/kernel", True) == "line"
    assert group_of("disc_synthetic_head/mlp/dense_0/kernel", True) == "disc"
    # without GAN, disc params fall through to base (reference gating,
    # train.py:519)
    assert group_of("disc_synthetic_head/mlp/dense_0/kernel", False) == "base"


def test_group_index_tree_covers_all_groups(trainer):
    idx = jax.tree_util.tree_leaves(
        group_index_tree(trainer.state.params, use_gan=True))
    present = {GROUPS[i] for i in set(int(i) for i in idx)}
    assert present == {"base", "contract", "line", "disc"}


@pytest.mark.slow
def test_train_step_decreases_loss(trainer, loaders):
    train_loader, _ = loaders
    m0 = trainer.train_epoch(0)
    for e in range(1, 4):
        m = trainer.train_epoch(e)
    assert np.isfinite(m["gen_loss"])
    assert m["gen_loss"] < m0["gen_loss"]


def test_select_val_criterion(trainer):
    """model_select picks the selection scalar: reference parity is the val
    GEN loss (SCT-GAN/train.py:1657-1658); "detection" sums the contract +
    line focal components instead (config.py:model_select)."""
    import dataclasses

    metrics = {"gen_loss": 0.7, "contract_vuln_loss": 0.01,
               "line_vuln_loss": 0.002, "total_loss": 1.3}
    assert trainer._select_val(metrics) == 0.7
    old_cfg = trainer.cfg
    try:
        trainer.cfg = dataclasses.replace(old_cfg, model_select="detection")
        assert trainer._select_val(metrics) == pytest.approx(0.012)
    finally:
        trainer.cfg = old_cfg


def test_validate_returns_finite(trainer):
    v = trainer.validate()
    assert np.isfinite(v["gen_loss"])
    assert np.isfinite(v["contract_vuln_loss"])
    assert np.isfinite(v["line_vuln_loss"])


def test_checkpoint_roundtrip(tmp_path, trainer):
    hist = trainer.train(num_epochs=1, checkpoint_dir=str(tmp_path))
    assert len(hist["val_loss"]) == 1
    names = os.listdir(tmp_path)
    assert any(n.startswith("best_model_gan_epoch_") for n in names)
    best = [n for n in names if n.startswith("best_model_gan")
            and not n.endswith(".json")][0]
    tree, meta = load_checkpoint(str(tmp_path / best))
    assert meta["epoch"] == 1
    assert meta["use_gan"] is True
    # params restored with identical values
    orig = jax.device_get(trainer.state.params)
    chex_close = jax.tree_util.tree_map(
        lambda a, b: np.allclose(a, b), orig, tree["params"])
    assert all(jax.tree_util.tree_leaves(chex_close))


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=1, min_lr=1e-6)
    lrs = {"base": 1e-3}
    lrs, red = s.step(1.0, lrs)
    assert not red
    lrs, red = s.step(1.1, lrs)      # bad epoch 1
    assert not red
    lrs, red = s.step(1.2, lrs)      # bad epoch 2 > patience
    assert red and lrs["base"] == pytest.approx(5e-4)


@pytest.mark.slow
def test_data_parallel_step_matches_single_device(tiny_tokenizer, loaders):
    """The same batch stepped on a 1-device and an 8-device dp mesh must
    produce identical losses (XLA psum-of-shards == single-device sum)."""
    model = SmartContractTransformer(TINY)
    cfg = TrainConfig(learning_rate=1e-3, use_gan=True, warmup_epochs=1)
    mesh8 = make_mesh(dp=8, mp=1)
    mesh1 = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    t1 = SmartContractTrainer(model, loaders[0], loaders[1], tiny_tokenizer,
                              config=cfg, mesh=mesh1, seed=7, verbose=False)
    t8 = SmartContractTrainer(model, loaders[0], loaders[1], tiny_tokenizer,
                              config=cfg, mesh=mesh8, seed=7, verbose=False)
    # batch of 8 identical rows → dp=8 shards see the same data
    batch = next(iter(loaders[0]))
    batch = {k: (np.repeat(v[:1], 8, axis=0) if isinstance(v, np.ndarray)
                 else v) for k, v in batch.items()}
    from sct_gan_tpu.parallel.mesh import shard_batch
    from sct_gan_tpu.train.train_step import DynamicScalars
    scalars = DynamicScalars.init()._replace(
        line_vuln_weight=jnp.float32(1.0))
    lrs = t1._group_lrs()
    rng = jax.random.PRNGKey(0)
    _, m1, _ = t1.train_step(t1.state, shard_batch(batch, mesh1), scalars,
                             lrs, rng)
    _, m8, _ = t8.train_step(t8.state, shard_batch(batch, mesh8), scalars,
                             lrs, rng)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=2e-4)


@pytest.mark.slow
def test_tensor_parallel_step_matches_single_device(tiny_tokenizer, loaders):
    """dp=4 × mp=2 (Megatron-style attention + FFN sharding) must produce
    the same loss as a single replicated device."""
    from sct_gan_tpu.parallel.mesh import shard_batch
    from sct_gan_tpu.train.train_step import DynamicScalars

    model = SmartContractTransformer(TINY)
    cfg = TrainConfig(learning_rate=1e-3, use_gan=True, warmup_epochs=1)
    mesh42 = make_mesh(dp=4, mp=2)
    mesh1 = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    t1 = SmartContractTrainer(model, loaders[0], loaders[1], tiny_tokenizer,
                              config=cfg, mesh=mesh1, seed=7, verbose=False)
    tmp = SmartContractTrainer(model, loaders[0], loaders[1], tiny_tokenizer,
                               config=cfg, mesh=mesh42, seed=7, verbose=False)
    batch = next(iter(loaders[0]))
    batch = {k: (np.repeat(v[:1], 4, axis=0) if isinstance(v, np.ndarray)
                 else v) for k, v in batch.items()}
    scalars = DynamicScalars.init()._replace(
        line_vuln_weight=jnp.float32(1.0))
    lrs = t1._group_lrs()
    rng = jax.random.PRNGKey(0)
    _, m1, _ = t1.train_step(t1.state, shard_batch(batch, mesh1), scalars,
                             lrs, rng)
    _, mm, _ = tmp.train_step(tmp.state, shard_batch(batch, mesh42), scalars,
                              lrs, rng)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(mm["total_loss"]), rtol=2e-4)
    # the mp rules actually sharded something: check a q_proj kernel placement
    flat = jax.tree_util.tree_flatten_with_path(tmp.state.params)[0]
    q_kernels = [v for path, v in flat
                 if "q_proj" in "/".join(str(getattr(p, "key", p))
                                         for p in path)
                 and v.ndim == 2]
    assert q_kernels and any(
        not s.is_fully_replicated for s in
        [v.sharding for v in q_kernels])


@pytest.mark.slow
def test_fused_optimizer_step_under_mp_matches_optax(tiny_tokenizer, loaders):
    """The fused tree optimizer must run under dp=4 × mp=2 sharding (its
    reductions lower to collectives — no concat) and track the optax-chain
    trainer step-for-step."""
    from sct_gan_tpu.parallel.mesh import shard_batch
    from sct_gan_tpu.train.train_step import DynamicScalars

    model = SmartContractTransformer(TINY)
    mesh42 = make_mesh(dp=4, mp=2)
    trainers = {}
    for name, fused in (("optax", False), ("fused", True)):
        cfg = TrainConfig(learning_rate=1e-3, use_gan=True, warmup_epochs=1,
                          fused_optimizer=fused)
        trainers[name] = SmartContractTrainer(
            model, loaders[0], loaders[1], tiny_tokenizer, config=cfg,
            mesh=mesh42, seed=7, verbose=False)
    assert trainers["fused"].fused_opt is not None
    batch = next(iter(loaders[0]))
    batch = {k: (np.repeat(v[:1], 4, axis=0) if isinstance(v, np.ndarray)
                 else v) for k, v in batch.items()}
    scalars = DynamicScalars.init()._replace(
        line_vuln_weight=jnp.float32(1.0))
    states = {k: t.state for k, t in trainers.items()}
    for step in range(2):
        rng = jax.random.PRNGKey(step)
        metrics = {}
        for name, t in trainers.items():
            states[name], metrics[name], _ = t.train_step(
                states[name], shard_batch(batch, mesh42), scalars,
                t._group_lrs(), rng)
        np.testing.assert_allclose(float(metrics["optax"]["grad_norm"]),
                                   float(metrics["fused"]["grad_norm"]),
                                   rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(states["optax"].params),
                    jax.tree_util.tree_leaves(states["fused"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
