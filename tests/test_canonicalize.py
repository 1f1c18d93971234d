"""Turn collapse: per-turn text equality + stable ordering under shuffle."""

import pandas as pd

from name_matching_spark.functions.normalize import normalize_text
from name_matching_spark.operators.canonicalize import canonicalize


def _transcripts_df(spark):
    rows = [
        # deliberately out of order
        ("c1", 2, "assistant", "THE PAYMENT 123 CLEARED.", "", "2026-01-01 00:01:00"),
        ("c1", 0, "user", "I NEED HELP WITH John Wick'S ACCOUNT", "", "2026-01-01 00:00:00"),
        ("c1", 1, "tool", 'lookup_customer(name="John Wick") -> status=OK', "lookup_customer", "2026-01-01 00:00:30"),
        ("c2", 0, "user", "TRANSFER TO Continental Hotel", "", "2026-01-02 00:00:00"),
        ("c2", 1, "tool", 'verify_entity(name="Continental Hotel") -> OK', "verify_entity", "2026-01-02 00:00:30"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_turn_collapse_order_and_per_turn_equality(spark):
    df = _transcripts_df(spark)
    out = {r["conv_id"]: r for r in canonicalize(df).collect()}
    # canonical text = per-turn reference normalization, joined in turn order
    turns = [
        "I NEED HELP WITH John Wick'S ACCOUNT",
        'lookup_customer(name="John Wick") -> status=OK',
        "THE PAYMENT 123 CLEARED.",
    ]
    expected = " ".join(
        normalize_text(t.upper(), remove_numbers=True, remove_stopwords=False)
        for t in turns
    )
    assert out["c1"]["canonical_text"] == expected
    assert out["c1"]["n_turns"] == 3
    # earliest mention wins; normalized name column
    assert out["c1"]["name_raw"] == "John Wick"
    assert out["c1"]["name"] == "JOHN WICK"
    assert out["c2"]["name"] == "CONTINENTAL HOTEL"


def test_turn_collapse_partitioning_invariant(spark):
    df = _transcripts_df(spark)
    a = {r["conv_id"]: r["canonical_text"] for r in canonicalize(df.repartition(16)).collect()}
    b = {r["conv_id"]: r["canonical_text"] for r in canonicalize(df.coalesce(1)).collect()}
    assert a == b
