"""Eval-harness tests: scalar metrics vs sklearn, validation sweep,
comprehensive evaluation with per-type thresholds, dashboard rendering."""
import json
import os

import numpy as np
import pytest

from sct_gan_tpu.config import ModelConfig
from sct_gan_tpu.data.dataset import (ArrayDataLoader,
                                      SmartContractVulnerabilityDataset)
from sct_gan_tpu.data.synthetic import generate_corpus
from sct_gan_tpu.data.tokenizer import SolidityTokenizer
from sct_gan_tpu.evals import (analyze_line_vulnerability_detection,
                               calculate_f1_score, calculate_line_accuracy,
                               calculate_precision, calculate_recall,
                               collect_validation_results,
                               compute_contract_level_metrics,
                               compute_line_level_metrics,
                               compute_metrics_for_threshold,
                               evaluate_model_performance,
                               print_evaluation_summary,
                               visualize_training_progress)
from sct_gan_tpu.infer import SmartContractAnalyzer

CFG = ModelConfig(d_model=32, nhead=2, num_encoder_layers=1,
                  num_decoder_layers=1, dim_feedforward=64, dropout=0.1,
                  max_length=64, max_lines=64, vocab_size=256, use_gan=True,
                  compute_dtype="float32", use_flash_attention=False)


def test_scalar_metrics():
    y_true = np.array([1, 1, 0, 0, 1])
    y_pred = np.array([1, 0, 1, 0, 1])
    p = calculate_precision(y_true, y_pred)
    r = calculate_recall(y_true, y_pred)
    assert p == pytest.approx(2 / 3)
    assert r == pytest.approx(2 / 3)
    assert calculate_f1_score(p, r) == pytest.approx(2 / 3)
    assert calculate_f1_score(0, 0) == 0.0


def test_compute_metrics_for_threshold_matches_sklearn():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, 200)
    y_probs = np.clip(y_true * 0.6 + rng.random(200) * 0.5, 0, 1)
    y_pred = (y_probs > 0.5).astype(int)
    m = compute_metrics_for_threshold(y_true, y_pred, y_probs)
    from sklearn.metrics import f1_score, roc_auc_score
    assert m["f1_score"] == pytest.approx(f1_score(y_true, y_pred))
    assert m["roc_auc"] == pytest.approx(roc_auc_score(y_true, y_probs))
    # degenerate: no positives
    z = compute_metrics_for_threshold(np.zeros(10), np.zeros(10),
                                      np.zeros(10))
    assert z["f1_score"] == 0.0


def test_calculate_line_accuracy():
    true = np.zeros((8, 4), np.int32)
    true[0, 1] = 1
    preds = {0: {"ARTHM": False}, 1: {"ARTHM": True}, 2: {"ARTHM": True}}
    acc = calculate_line_accuracy(true, preds)
    assert acc == pytest.approx(2 / 3)


@pytest.fixture(scope="module")
def eval_setup():
    tok = SolidityTokenizer(vocab_size=CFG.vocab_size)
    records = generate_corpus(n=6, seed=3)
    ds = SmartContractVulnerabilityDataset(records=records, tokenizer=tok,
                                           max_length=CFG.max_length)
    loader = ArrayDataLoader(ds, batch_size=2)
    analyzer = SmartContractAnalyzer(model_config=CFG, tokenizer=tok,
                                     batch_size=2, verbose=False)
    return analyzer, loader


def test_collect_validation_results(eval_setup):
    analyzer, loader = eval_setup
    res = collect_validation_results(analyzer, loader, threshold=0.5,
                                     max_contracts=4,
                                     generate_contracts=False)
    assert res["metadata"]["total_contracts"] == 4
    assert len(res["contract_level"]["true_labels"]) == 4
    assert res["line_level"]["true_labels"][0].shape == (8, CFG.max_length)
    assert res["line_level"]["predicted_probs"][0].shape == (8, CFG.max_length)

    cm = compute_contract_level_metrics(res)
    assert "overall" in cm and len(cm["per_vulnerability"]) == 8
    lm = compute_line_level_metrics(res)
    assert lm["statistics"]["total_line_slots"] > 0
    an = analyze_line_vulnerability_detection(res)
    assert set(an["totals"]) == {"true_positives", "false_positives",
                                 "false_negatives"}


def test_evaluate_model_performance(eval_setup, tmp_path, capsys):
    analyzer, loader = eval_setup
    out = str(tmp_path / "eval.json")
    res = evaluate_model_performance(
        val_dataloader=loader, analyzer=analyzer, max_contracts=4,
        contract_thresholds={vt: 0.4 for vt in analyzer.vulnerability_types},
        line_thresholds={vt: 0.2 for vt in analyzer.vulnerability_types},
        output_file=out, verbose=False)
    assert os.path.exists(out)
    blob = json.load(open(out))
    assert blob["model_info"]["total_contracts"] == 4
    assert set(blob["contract_level"]["per_vulnerability"]) == set(
        analyzer.vulnerability_types)
    assert blob["line_level"]["statistics"]["total_lines_processed"] > 0
    print_evaluation_summary(res)
    assert "COMPREHENSIVE EVALUATION" in capsys.readouterr().out


def test_visualize_training_progress(tmp_path):
    hist = {k: list(np.linspace(1, 0.5, 5)) for k in
            ("train_loss", "val_loss", "contract_vuln_loss", "line_vuln_loss",
             "learning_rate", "discriminator_loss", "line_vuln_accuracy",
             "line_vuln_precision", "line_vuln_recall")}
    path = str(tmp_path / "dash.png")
    fig = visualize_training_progress(hist, save_path=path)
    assert os.path.exists(path)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_compute_perplexity(eval_setup):
    from sct_gan_tpu.evals import compute_perplexity
    from sct_gan_tpu.data.dataset import ArrayDataLoader
    analyzer, loader = eval_setup
    res = compute_perplexity(analyzer.model, analyzer.params, loader,
                             max_batches=2)
    assert res["perplexity"] > 1.0
    assert res["tokens"] > 0
    assert res["cross_entropy"] > 0


def test_notebook_utils_analysis_helpers(eval_setup, capsys):
    from sct_gan_tpu.evals import notebook_utils as nbu
    analyzer, loader = eval_setup
    vr = nbu.collect_validation_results(analyzer, loader, max_contracts=4,
                                        generate_contracts=False)
    top = nbu.analyze_vulnerable_contracts(vr, top_k=3)
    assert len(top["top_vulnerable_contracts"]) == 3
    assert top["top_vulnerable_contracts"][0]["rank"] == 1
    probs = nbu.analyze_vulnerable_line_probabilities(vr)
    assert "overall_stats" in probs and "per_vulnerability_type" in probs
    nbu.print_probability_analysis(probs)
    det = nbu.analyze_line_vulnerability_detection(vr)
    nbu.print_line_vulnerability_summary(det)
    nbu.print_simplified_validation_summary(vr)
    out = capsys.readouterr().out
    assert "Contract metrics" in out
