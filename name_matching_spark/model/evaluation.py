"""Evaluation curves as data artifacts (M9).

The reference plots ROC and Precision-Recall curves with matplotlib
(``plot_roc_auc`` / ``plot_precision_recall_auc``,
name_matching/utils/utils.py:211-274 in vietexob/name-matching).  The
sandbox ships no plotting library, so this module ports the CONTENT of
those figures — the curve points and their AUCs, computed from scratch —
and the trainer persists them as ``models/eval_curves.json``.  Feeding the
points to any plotting frontend reproduces the reference figures; the
AUC numbers match sklearn's ``auc(roc_curve(...))`` semantics (trapezoid
rule over the stepwise curve, thresholds at distinct scores).
"""

from __future__ import annotations

import numpy as np


def roc_curve_points(y_true, scores) -> tuple[np.ndarray, np.ndarray]:
    """(fpr, tpr) at every distinct score threshold, descending scores —
    the standard stepwise ROC curve, (0,0) prepended."""
    y = np.asarray(y_true, dtype=np.float64)
    s = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-s, kind="stable")
    y = y[order]
    s = s[order]
    # threshold boundaries = last index of each distinct score
    distinct = np.nonzero(np.diff(s))[0]
    idx = np.concatenate([distinct, [len(s) - 1]])
    tps = np.cumsum(y)[idx]
    fps = (idx + 1) - tps
    n_pos = y.sum()
    n_neg = len(y) - n_pos
    tpr = tps / max(n_pos, 1)
    fpr = fps / max(n_neg, 1)
    return np.concatenate([[0.0], fpr]), np.concatenate([[0.0], tpr])


def pr_curve_points(y_true, scores) -> tuple[np.ndarray, np.ndarray]:
    """(recall, precision) at every distinct score threshold, descending
    scores, with the (0, 1) anchor prepended."""
    y = np.asarray(y_true, dtype=np.float64)
    s = np.asarray(scores, dtype=np.float64)
    order = np.argsort(-s, kind="stable")
    y = y[order]
    s = s[order]
    distinct = np.nonzero(np.diff(s))[0]
    idx = np.concatenate([distinct, [len(s) - 1]])
    tps = np.cumsum(y)[idx]
    precision = tps / (idx + 1)
    recall = tps / max(y.sum(), 1)
    return np.concatenate([[0.0], recall]), np.concatenate([[1.0], precision])


def auc_trapezoid(x, y) -> float:
    """Area under a curve via the trapezoid rule (sklearn.metrics.auc
    semantics; x need not start at 0)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return float(np.trapz(y, x))


def evaluation_curves(y_true, scores, max_points: int = 200) -> dict:
    """ROC + PR curves (downsampled to ``max_points`` for the artifact)
    and their AUCs — the JSON-persistable twin of the reference's two
    figures."""
    fpr, tpr = roc_curve_points(y_true, scores)
    rec, prec = pr_curve_points(y_true, scores)
    roc_auc = auc_trapezoid(fpr, tpr)
    pr_auc = auc_trapezoid(rec, prec)

    def _sample(a: np.ndarray) -> list:
        if len(a) <= max_points:
            return [round(float(v), 6) for v in a]
        pick = np.linspace(0, len(a) - 1, max_points).astype(int)
        return [round(float(v), 6) for v in a[pick]]

    return {
        "roc_auc": round(roc_auc, 6),
        "pr_auc": round(pr_auc, 6),
        "roc_curve": {"fpr": _sample(fpr), "tpr": _sample(tpr)},
        "pr_curve": {"recall": _sample(rec), "precision": _sample(prec)},
    }
