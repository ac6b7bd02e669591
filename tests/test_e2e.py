"""End-to-end slice (SURVEY.md §7 step 4): synthetic CSV → train →
checkpoint → restore into trainer AND into the Analyzer → detect →
comprehensive evaluation → metrics JSON. Exercises the full framework through
its public layers only."""
import json
import os

import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig, TrainConfig
from sct_gan_tpu.data.dataset import create_dataloaders
from sct_gan_tpu.data.synthetic import write_corpus_csv
from sct_gan_tpu.data.tokenizer import SolidityTokenizer
from sct_gan_tpu.evals import evaluate_model_performance
from sct_gan_tpu.infer import SmartContractAnalyzer
from sct_gan_tpu.models import SmartContractTransformer
from sct_gan_tpu.train import SmartContractTrainer, find_checkpoint

# the module fixture trains + checkpoints a real (tiny) run — minutes of
# compile on the CPU mesh; excluded from the fast `-m "not slow"` loop
pytestmark = pytest.mark.slow

CFG = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                  num_decoder_layers=1, dim_feedforward=64, dropout=0.1,
                  max_length=64, max_lines=64, vocab_size=512, use_gan=True,
                  compute_dtype="float32", use_flash_attention=False)


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    csv = str(root / "corpus.csv")
    write_corpus_csv(csv, n=10, seed=11)
    tok = SolidityTokenizer(vocab_size=CFG.vocab_size)
    train_loader, val_loader = create_dataloaders(
        csv, tok, batch_size=4, max_length=CFG.max_length)
    model = SmartContractTransformer(CFG)
    trainer = SmartContractTrainer(
        model, train_loader, val_loader, tok,
        config=TrainConfig(learning_rate=5e-4, use_gan=True,
                           warmup_epochs=1),
        verbose=False)
    ckpt_dir = str(root / "ckpts")
    trainer.train(num_epochs=2, checkpoint_dir=ckpt_dir)
    return root, tok, trainer, val_loader, ckpt_dir


def test_checkpoint_written(e2e):
    _, _, trainer, _, ckpt_dir = e2e
    best = find_checkpoint(ckpt_dir, prefer="best")
    assert best is not None
    latest = find_checkpoint(ckpt_dir, prefer="latest")
    assert latest is not None
    assert len(trainer.training_history["val_loss"]) == 2


def test_resume_from_checkpoint(e2e):
    root, tok, trainer, val_loader, ckpt_dir = e2e
    model = SmartContractTransformer(CFG)
    fresh = SmartContractTrainer(
        model, val_loader, val_loader, tok,
        config=TrainConfig(learning_rate=5e-4, use_gan=True,
                           warmup_epochs=1),
        verbose=False)
    epoch = fresh.restore(find_checkpoint(ckpt_dir, prefer="latest"))
    assert epoch == 2
    # restored params equal the trained params
    import jax
    a = jax.tree_util.tree_leaves(jax.device_get(fresh.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    assert all(np.allclose(x, y) for x, y in zip(a, b))
    # and training can continue
    m = fresh.train_epoch(epoch)
    assert np.isfinite(m["gen_loss"])


def test_analyzer_from_checkpoint_and_eval(e2e):
    root, tok, trainer, val_loader, ckpt_dir = e2e
    best = find_checkpoint(ckpt_dir, prefer="best")
    analyzer = SmartContractAnalyzer(model_path=best, model_config=CFG,
                                     tokenizer=tok, batch_size=2,
                                     verbose=False)
    code = val_loader.dataset.data[0]["source_code"]
    res = analyzer.detect_vulnerabilities(code, threshold=0.5)
    assert set(res["contract_vulnerabilities"]) == set(
        analyzer.vulnerability_types)

    out_file = str(root / "eval.json")
    results = evaluate_model_performance(
        model_path=best, val_dataloader=val_loader, analyzer=analyzer,
        max_contracts=4, output_file=out_file, verbose=False)
    assert os.path.exists(out_file)
    blob = json.load(open(out_file))
    assert blob["line_level"]["statistics"]["total_lines_processed"] > 0
    assert 0.0 <= results["contract_level"]["overall"]["accuracy"] <= 1.0


def test_generation_from_trained_checkpoint(e2e):
    root, tok, trainer, val_loader, ckpt_dir = e2e
    best = find_checkpoint(ckpt_dir, prefer="best")
    analyzer = SmartContractAnalyzer(model_path=best, model_config=CFG,
                                     tokenizer=tok, verbose=False)
    outs = analyzer.generate_synthetic_contract(
        val_loader.dataset.data[0]["source_code"], num_contracts=1,
        temperature=0.8)
    assert len(outs) == 1 and isinstance(outs[0], str)
