"""Scalar metrics (parity: SCT-GAN/notebook_utils.py:7-107 and the eval
notebook's `compute_metrics_for_threshold`, model-performance-evaluation.ipynb
cell 19)."""
from __future__ import annotations

from typing import Dict

import numpy as np

VULNERABILITY_TYPES = [
    "ARTHM", "DOS", "LE", "RENT", "TimeM", "TimeO", "Tx-Origin", "UE",
]


def calculate_precision(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """TP / predicted-positive (notebook_utils.py:7-24)."""
    y_true = np.asarray(y_true).astype(bool)
    y_pred = np.asarray(y_pred).astype(bool)
    tp = np.sum(y_true & y_pred)
    pp = np.sum(y_pred)
    return float(tp / pp) if pp > 0 else 0.0


def calculate_recall(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """TP / actual-positive (notebook_utils.py:26-43)."""
    y_true = np.asarray(y_true).astype(bool)
    y_pred = np.asarray(y_pred).astype(bool)
    tp = np.sum(y_true & y_pred)
    ap = np.sum(y_true)
    return float(tp / ap) if ap > 0 else 0.0


def calculate_f1_score(precision: float, recall: float) -> float:
    """Harmonic mean (notebook_utils.py:45-59)."""
    if precision + recall == 0:
        return 0.0
    return 2 * (precision * recall) / (precision + recall)


def get_vulnerability_index(vuln_type: str) -> int:
    """Vuln-type → column index (notebook_utils.py:93-107)."""
    try:
        return VULNERABILITY_TYPES.index(vuln_type)
    except ValueError:
        return -1


def calculate_line_accuracy(true_line_vulns: np.ndarray,
                            pred_line_vulns: Dict[int, Dict[str, bool]]
                            ) -> float:
    """Accuracy of dict-form line predictions vs a (8, L) truth array
    (notebook_utils.py:61-91)."""
    true_line_vulns = np.asarray(true_line_vulns)
    correct = 0
    total = 0
    for line_idx, vulns in pred_line_vulns.items():
        for vuln_type, flag in vulns.items():
            j = get_vulnerability_index(vuln_type)
            if j < 0 or line_idx >= true_line_vulns.shape[1]:
                continue
            total += 1
            if bool(true_line_vulns[j, line_idx]) == bool(flag):
                correct += 1
    return correct / total if total > 0 else 0.0


def compute_metrics_for_threshold(y_true: np.ndarray, y_pred: np.ndarray,
                                  y_probs: np.ndarray) -> Dict[str, float]:
    """accuracy/P/R/F1 + PR-AUC + ROC-AUC (eval notebook cell 19)."""
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    y_probs = np.asarray(y_probs).reshape(-1)
    if len(y_true) == 0 or np.sum(y_true) == 0:
        return {"accuracy": 0.0, "precision": 0.0, "recall": 0.0,
                "f1_score": 0.0, "pr_auc": 0.0, "roc_auc": 0.0}

    from sklearn.metrics import (accuracy_score, auc, f1_score,
                                 precision_recall_curve, precision_score,
                                 recall_score, roc_curve)
    accuracy = accuracy_score(y_true, y_pred)
    precision = precision_score(y_true, y_pred, zero_division=0)
    recall = recall_score(y_true, y_pred, zero_division=0)
    f1 = f1_score(y_true, y_pred, zero_division=0)
    try:
        pc, rc, _ = precision_recall_curve(y_true, y_probs)
        pr_auc = auc(rc, pc)
    except Exception:
        pr_auc = 0.0
    try:
        fpr, tpr, _ = roc_curve(y_true, y_probs)
        roc_auc = auc(fpr, tpr)
    except Exception:
        roc_auc = 0.0
    return {"accuracy": float(accuracy), "precision": float(precision),
            "recall": float(recall), "f1_score": float(f1),
            "pr_auc": float(pr_auc), "roc_auc": float(roc_auc)}
