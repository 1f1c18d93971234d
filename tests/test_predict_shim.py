"""Single-pair / batch predict shim — mirrors the reference's unit-test
expectations (tests/unit_tests/test_predict_model.py in
vietexob/name-matching): response contract, feature ranges, validation
errors as dicts, batch error isolation."""

import pytest

from name_matching_spark.model.predict import NameMatchPredictor


@pytest.fixture(scope="module")
def predictor():
    return NameMatchPredictor()


def test_predict_obvious_match(predictor):
    r = predictor.predict("John Smith", "J. Smith", ft_no="FT001")
    assert "error" not in r
    assert r["ft_no"] == "FT001"
    assert r["match_label"] in ("MATCH", "NO_MATCH")
    assert 0.0 <= r["probability"] <= 1.0
    same = predictor.predict("John Smith", "John Smith")
    assert same["prediction"] == 1 and same["match_label"] == "MATCH"


def test_predict_obvious_non_match(predictor):
    r = predictor.predict("John Smith", "Continental Hotel Group")
    assert r["prediction"] == 0 and r["match_label"] == "NO_MATCH"


def test_feature_values_in_valid_range(predictor):
    # the reference's range contract (test_predict_model.py:232-254):
    # similarity features in [0,1]; PARTIAL_RATIO 0-100; LEN_DIFF >= 0
    feats = predictor.predict("John Smith", "J. Smith")["features"]
    for name, value in feats.items():
        assert isinstance(value, (int, float))
        if name == "partial_ratio":
            assert 0 <= value <= 100
        elif name == "len_diff":
            assert value >= 0
        elif name == "align_edit":
            assert 0 <= value <= 10  # capped absolute edit count
        elif name == "token_sub_excess":
            assert 0 <= value <= 5  # capped per-token excess-edit count
        else:
            assert 0.0 <= value <= 1.0


def test_predict_validation_errors(predictor):
    assert predictor.predict("", "x")["error"] == "Validation error"
    assert predictor.predict("x", None)["error"] == "Type error"
    assert "error" in predictor.predict("123", "456")  # empty after normalize


def test_predict_decision_uses_raw_probability(predictor):
    # threshold semantics: raw prob vs threshold, display rounded to 4dp
    r = predictor.predict("John Smith", "John Smyth", threshold=0.0)
    assert r["prediction"] == 1
    r = predictor.predict("John Smith", "John Smyth", threshold=1.0)
    assert r["prediction"] == 0


def test_predict_batch_isolates_errors(predictor):
    out = predictor.predict_batch(
        [
            {"name_x": "John Wick", "name_y": "Jonathan Wick"},
            {"name_x": "", "name_y": "x"},
            "not a dict",
            {"name_x": "Winston Scott", "name_y": "W Scott"},
        ]
    )
    assert {e["index"] for e in out["errors"]} == {1, 2}
    assert [r["index"] for r in out["results"]] == [0, 3]
    assert all(0.0 <= r["probability"] <= 1.0 for r in out["results"])
