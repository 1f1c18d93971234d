"""Run BOTH tuning objectives on the real labeled training frame and
record the comparison in models/tuning_comparison.json — the
reference-parity evidence for M1 tuning (the reference tunes Optuna
trials with 5-fold CV on average precision; our authoritative gate is
F1@threshold).  Does NOT touch the shipped model artifacts."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from name_matching_spark.functions.features import build_features  # noqa: E402
from name_matching_spark.functions.tfidf import TfidfModel  # noqa: E402
from name_matching_spark.model.train import (  # noqa: E402
    DEFAULT_TUNE_GRID,
    MODEL_DIR,
    load_labeled_pairs,
    load_synthetic_pairs,
    tune_cv_ap,
    tune_grid_search,
)

import pandas as pd  # noqa: E402

df = load_labeled_pairs()
syn = load_synthetic_pairs(n_entities=600)
df = pd.concat(
    [df, syn[["name_x", "name_y", "label", "name_x_norm", "name_y_norm"]]],
    ignore_index=True,
)
corpus = sorted(set(df["name_x_norm"].unique()) | set(df["name_y_norm"].unique()))
tfidf = TfidfModel.fit(corpus)
X = build_features(df["name_x_norm"].tolist(), df["name_y_norm"].tolist(), tfidf)
y = df["label"].to_numpy(dtype=np.float64)

cv = tune_cv_ap(X, y, grid=DEFAULT_TUNE_GRID, folds=5, verbose=True)
f1 = tune_grid_search(X, y, grid=DEFAULT_TUNE_GRID, verbose=True)
out = {
    "rows": int(len(y)),
    "cv_ap": cv,
    "holdout_f1": f1,
    "same_winner": cv["best"] == f1["best"],
    "note": (
        "cv_ap mirrors the reference's Optuna objective (5-fold CV average "
        "precision); holdout_f1 is the selection the shipped artifacts use "
        "(the authoritative F1@0.85 gate)."
    ),
}
with open(os.path.join(MODEL_DIR, "tuning_comparison.json"), "w") as f:
    json.dump(out, f, indent=2)
print("WROTE models/tuning_comparison.json; same_winner =", out["same_winner"])
