"""Evaluation curves as data artifacts AND rendered figures (M9).

The reference plots ROC and Precision-Recall curves with matplotlib
(``plot_roc_auc`` / ``plot_precision_recall_auc``,
name_matching/utils/utils.py:211-274 in vietexob/name-matching).  The
sandbox ships no plotting library, so this module ports the CONTENT of
those figures — the curve points and their AUCs, computed from scratch —
persisted as ``models/eval_curves.json``, and ADDITIONALLY renders real
PNG figures (``models/eval_curves.png``) with :func:`render_curves_png`:
a from-scratch numpy rasterizer (axes, gridlines, Bresenham-style
polylines) written through the repo's own pure-stdlib PNG encoder
(functions/codecs.py).  The AUC numbers match sklearn's
``auc(roc_curve(...))`` semantics (trapezoid rule over the stepwise
curve, thresholds at distinct scores).
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


# ---------------------------------------------------------------------------
# Figure rendering (no plotting library: numpy raster + repo PNG encoder)
# ---------------------------------------------------------------------------

_AXIS = (60, 60, 60)
_GRID = (225, 225, 225)
_ROC = (31, 119, 180)   # the matplotlib default C0 blue the reference uses
_PR = (214, 39, 40)     # C3 red
_DIAG = (160, 160, 160)


def _draw_line(img: np.ndarray, x0, y0, x1, y1, color) -> None:
    """Bresenham-style polyline segment on an (h, w, 3) uint8 canvas."""
    h, w, _ = img.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) + 1
    xs = np.clip(np.round(np.linspace(x0, x1, n)).astype(int), 0, w - 1)
    ys = np.clip(np.round(np.linspace(y0, y1, n)).astype(int), 0, h - 1)
    img[ys, xs] = color


def _draw_panel(img, x_off, xs, ys, color, size, margin, diagonal) -> None:
    """One square curve panel at horizontal offset ``x_off``: frame,
    gridlines, optional chance diagonal, then the polyline (data coords in
    [0,1]^2, y up)."""
    left, top = x_off + margin, margin

    def px(x):
        return left + x * size

    def py(y):
        return top + (1.0 - y) * size

    for frac in (0.25, 0.5, 0.75):
        _draw_line(img, px(0), py(frac), px(1), py(frac), _GRID)
        _draw_line(img, px(frac), py(0), px(frac), py(1), _GRID)
    if diagonal:
        _draw_line(img, px(0), py(0), px(1), py(1), _DIAG)
    for seg in (
        (px(0), py(0), px(1), py(0)), (px(0), py(0), px(0), py(1)),
        (px(0), py(1), px(1), py(1)), (px(1), py(0), px(1), py(1)),
    ):
        _draw_line(img, *seg, _AXIS)
    for i in range(len(xs) - 1):
        _draw_line(img, px(xs[i]), py(ys[i]), px(xs[i + 1]), py(ys[i + 1]), color)


def render_curves_png(curves: dict, panel: int = 256, margin: int = 24) -> bytes:
    """Render the ROC (left, with chance diagonal) and PR (right) panels
    of an ``evaluation_curves`` dict as a real PNG — the rendered-figure
    form of the reference's two matplotlib plots, with zero plotting
    dependencies (numpy raster -> codecs.png_encode)."""
    from name_matching_spark.functions import codecs

    w = 2 * (panel + 2 * margin)
    h = panel + 2 * margin
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    _draw_panel(
        img, 0, curves["roc_curve"]["fpr"], curves["roc_curve"]["tpr"],
        _ROC, panel, margin, diagonal=True,
    )
    _draw_panel(
        img, panel + 2 * margin, curves["pr_curve"]["recall"],
        curves["pr_curve"]["precision"], _PR, panel, margin, diagonal=False,
    )
    return codecs.png_encode(img)
