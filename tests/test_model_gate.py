"""THE correctness gate (BASELINE.json metric): pairwise F1 >= 0.99 on the
reference's labeled name-pair set, replayed through the deployed artifacts
at the reference's decision threshold (0.85)."""

import numpy as np
import pytest

from name_matching_spark.functions.features import build_features
from name_matching_spark.model.train import (
    f1_score,
    load_artifacts,
    load_labeled_pairs,
)

THRESHOLD = 0.85


@pytest.fixture(scope="module")
def gate_data():
    model, tfidf = load_artifacts()
    df = load_labeled_pairs()
    X = build_features(df["name_x_norm"].tolist(), df["name_y_norm"].tolist(), tfidf)
    prob = model.predict_proba(X)
    return df, prob


def test_pairwise_f1_gate(gate_data):
    df, prob = gate_data
    y = df["label"].to_numpy()
    pred = (prob >= THRESHOLD).astype(int)
    f1 = f1_score(y, pred)
    print(f"labeled-pair F1 @0.85 = {f1:.6f} on {len(y)} pairs")
    assert f1 >= 0.99, f"pairwise F1 {f1:.4f} below the 0.99 gate"


def test_identity_pairs_match(gate_data):
    df, prob = gate_data
    ident = (df["name_x_norm"] == df["name_y_norm"]).to_numpy()
    pos = (df["label"] == 1).to_numpy()
    sel = ident & pos
    assert (prob[sel] >= THRESHOLD).mean() >= 0.999


def test_probability_bounds(gate_data):
    _, prob = gate_data
    assert np.all((prob >= 0.0) & (prob <= 1.0))


SEMANTIC_EXPECTATIONS = [
    # (raw_x, raw_y, expected MATCH/NO_MATCH) — reference
    # test_predict_model.py:64-180 semantics at threshold 0.85
    ("John Smith", "J. Smith", 1),
    ("Jane Marie Doe", "Jane M. Doe", 1),
    ("John Doe", "Doe John", 1),
    ("O'Brien & Associates, Inc.", "OBrien and Associates Inc", 1),
    ("François Müller", "Francois Mueller", 1),
    ("John Wick", "Jonathan Wick", 1),
    ("Agoda Company Limited", "Agoda Co, Ltd", 1),
    ("Microsoft Corporation", "Amazon Web Services", 0),
    ("Winston Scott", "Hotel Continental", 0),
]


def test_semantic_expectations():
    from name_matching_spark.functions.normalize import preprocess_name

    model, tfidf = load_artifacts()
    xs = [preprocess_name(a) for a, _, _ in SEMANTIC_EXPECTATIONS]
    ys = [preprocess_name(b) for _, b, _ in SEMANTIC_EXPECTATIONS]
    prob = model.predict_proba(build_features(xs, ys, tfidf))
    for (a, b, want), p in zip(SEMANTIC_EXPECTATIONS, prob):
        got = 1 if p >= THRESHOLD else 0
        assert got == want, f"{a!r} ~ {b!r}: prob={p:.4f}, want {want}"
