"""Diagnose why the corpus-scale domain-randomization copies pull the
reference semantic pair "John Smith" ~ "J. Smith" below the 0.85
threshold (test_model_gate.py::test_semantic_expectations).

Prints: the pair's feature vector under the deployed (train-corpus)
TF-IDF fit and under the 50k-entity scale fit; the deployed model's
probability under both; and the nearest training rows (label / source /
key features) to the pair in each regime.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from name_matching_spark.functions.features import FEATURE_COLS, build_features
from name_matching_spark.functions.normalize import preprocess_name
from name_matching_spark.functions.tfidf import ADAPTIVE_VOCAB_CEILING, TfidfModel
from name_matching_spark.model.train import load_artifacts, load_labeled_pairs, load_synthetic_pairs

model_dir = os.environ.get("NMS_MODEL_DIR", os.path.join(REPO, "models"))
model, tfidf = load_artifacts(
    os.path.join(model_dir, "match_gbm.json"), os.path.join(model_dir, "tfidf.json")
)

pairs = [("John Smith", "J. Smith"), ("Jane Marie Doe", "Jane M. Doe"), ("John Wick", "Jonathan Wick")]
xs = [preprocess_name(a) for a, _ in pairs]
ys = [preprocess_name(b) for _, b in pairs]

X_small = build_features(xs, ys, tfidf)

# Rebuild the scale fit exactly as train() does.
df = load_labeled_pairs()
df["source"] = "reference"
syn = load_synthetic_pairs(n_entities=600)
syn["source"] = "synthetic"
import pandas as pd

df = pd.concat([df, syn], ignore_index=True)
df = df[(df["name_x_norm"].str.len() > 0) & (df["name_y_norm"].str.len() > 0)].reset_index(drop=True)
corpus = sorted(set(df["name_x_norm"]) | set(df["name_y_norm"]))

from name_matching_spark.datagen import generate_entities

ents = generate_entities(n_entities=50_000, seed=42 + 101)
scale_names = {preprocess_name(a) for aliases in ents["aliases"] for a in aliases}
scale_corpus = sorted((scale_names | set(corpus)) - {""})
tfidf_scale = TfidfModel.fit(scale_corpus, max_features=ADAPTIVE_VOCAB_CEILING)

X_scale = build_features(xs, ys, tfidf_scale)

p_small = model.predict_proba(X_small)
p_scale = model.predict_proba(X_scale)

idf_cols = ["cosine_sim", "shared_max_idf", "idf_jaccard"]
print(f"{'pair':40s} {'p_small':>8s} {'p_scale':>8s}  " + "  ".join(f"{c}(s/S)" for c in idf_cols))
for i, (a, b) in enumerate(pairs):
    vals = "  ".join(
        f"{X_small[i, FEATURE_COLS.index(c)]:.3f}/{X_scale[i, FEATURE_COLS.index(c)]:.3f}"
        for c in idf_cols
    )
    print(f"{a+' ~ '+b:40s} {p_small[i]:8.4f} {p_scale[i]:8.4f}  {vals}")

# Nearest training rows to the failing pair, in the small-fit regime.
print("\nBuilding training features (small fit) ...", flush=True)
Xtr = build_features(df["name_x_norm"].tolist(), df["name_y_norm"].tolist(), tfidf)
y = df["label"].to_numpy(dtype=np.float64)

q = X_small[0]
# Scale-normalize per feature for the distance.
sd = Xtr.std(axis=0) + 1e-9
d = np.sqrt((((Xtr - q) / sd) ** 2).sum(axis=1))
near = np.argsort(d)[:15]
print(f"\nnearest training rows to 'JOHN SMITH ~ J SMITH' (small fit):")
for i in near:
    print(
        f"  label={int(y[i])} src={df['source'].iloc[i]:9s} d={d[i]:.2f} "
        f"{df['name_x_norm'].iloc[i]!r} ~ {df['name_y_norm'].iloc[i]!r}"
    )

# Same in the scale regime: the pair's scale-fit vector vs the training
# rows' scale-fit vectors.
print("\nBuilding training features (scale fit, idf cols only) ...", flush=True)
from name_matching_spark.functions.features import refit_idf_features

Xtr_scale = refit_idf_features(Xtr, df["name_x_norm"].tolist(), df["name_y_norm"].tolist(), tfidf_scale)
q2 = X_scale[0]
d2 = np.sqrt((((Xtr_scale - q2) / sd) ** 2).sum(axis=1))
near2 = np.argsort(d2)[:15]
print(f"\nnearest training rows to 'JOHN SMITH ~ J SMITH' (scale fit):")
for i in near2:
    print(
        f"  label={int(y[i])} src={df['source'].iloc[i]:9s} d={d2[i]:.2f} "
        f"{df['name_x_norm'].iloc[i]!r} ~ {df['name_y_norm'].iloc[i]!r}"
    )
