"""Single-pair / small-batch prediction shim — the driver-side twin of the
reference's ``NameMatchPredictor.predict`` / ``predict_batch``
(name_matching/models/predict_model.py:131-289 in vietexob/name-matching).

The distributed path (operators/scoring.py) is the production scorer; this
shim exists for parity fixtures, notebooks and spot checks.  Same response
contract as the reference: prediction from the RAW probability vs the
threshold, probability and features rounded to 4 decimals for display,
``MATCH``/``NO_MATCH`` labels, validation errors returned as error dicts
(never raised)."""

from __future__ import annotations

import numpy as np

from name_matching_spark.functions.features import FEATURE_COLS, build_features
from name_matching_spark.functions.normalize import preprocess_name
from name_matching_spark.model.train import DEFAULT_THRESHOLD, load_artifacts


class NameMatchPredictor:
    def __init__(self, model=None, tfidf=None):
        if model is None or tfidf is None:
            model, tfidf = load_artifacts()
        self.model = model
        self.tfidf = tfidf

    def predict(
        self,
        name_x: str,
        name_y: str,
        ft_no: str = "",
        threshold: float = DEFAULT_THRESHOLD,
    ) -> dict:
        if not isinstance(name_x, str) or not isinstance(name_y, str):
            return {
                "error": "Type error",
                "message": "Both name_x and name_y must be strings",
                "ft_no": ft_no or None,
            }
        if not name_x or not name_y:
            return {
                "error": "Validation error",
                "message": "Both name_x and name_y must be non-empty strings",
                "ft_no": ft_no or None,
            }
        nx, ny = preprocess_name(name_x), preprocess_name(name_y)
        if not nx or not ny:
            return {
                "error": "Validation error",
                "message": "Names are empty after preprocessing",
                "ft_no": ft_no or None,
            }
        X = build_features([nx], [ny], self.tfidf)
        prob = float(self.model.predict_proba(X)[0])
        prediction = 1 if prob >= threshold else 0
        return {
            "ft_no": ft_no or None,
            "name_x": name_x,
            "name_y": name_y,
            "prediction": prediction,
            "match_label": "MATCH" if prediction == 1 else "NO_MATCH",
            "probability": round(prob, 4),
            "threshold": threshold,
            "features": {
                f: round(float(v), 4) for f, v in zip(FEATURE_COLS, X[0])
            },
        }

    def predict_batch(
        self, pairs: list, threshold: float = DEFAULT_THRESHOLD
    ) -> dict:
        """Batch twin (predict_model.py:243-289): invalid rows land in
        ``errors``; valid rows are featurized in ONE vectorized batch."""
        errors = []
        valid = []
        for i, pair in enumerate(pairs):
            nx_raw = pair.get("name_x") if isinstance(pair, dict) else None
            ny_raw = pair.get("name_y") if isinstance(pair, dict) else None
            if not isinstance(nx_raw, str) or not isinstance(ny_raw, str) or not nx_raw or not ny_raw:
                errors.append({"index": i, "error": "invalid pair"})
                continue
            nx, ny = preprocess_name(nx_raw), preprocess_name(ny_raw)
            if not nx or not ny:
                errors.append({"index": i, "error": "empty after preprocessing"})
                continue
            valid.append((i, nx_raw, ny_raw, nx, ny))
        results = []
        if valid:
            X = build_features([v[3] for v in valid], [v[4] for v in valid], self.tfidf)
            probs = self.model.predict_proba(X)
            for (i, nx_raw, ny_raw, _, _), prob in zip(valid, np.asarray(probs)):
                p = float(prob)
                results.append(
                    {
                        "index": i,
                        "name_x": nx_raw,
                        "name_y": ny_raw,
                        "prediction": 1 if p >= threshold else 0,
                        "match_label": "MATCH" if p >= threshold else "NO_MATCH",
                        "probability": round(p, 4),
                    }
                )
        return {"results": results, "errors": errors, "threshold": threshold}
