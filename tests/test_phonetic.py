"""Soundex twin parity with Spark's native implementation + metaphone
properties (blocking keys only need stability + collision of spelling
variants, which the blocking-recall test measures end-to-end)."""

from pyspark.sql import functions as F

from name_matching_spark.functions.phonetic import double_metaphone, soundex

TOKENS = [
    "ROBERT", "RUPERT", "WICK", "WHICK", "SMITH", "SMYTH", "JOHN", "JON",
    "JONATHAN", "SCOTT", "CONTINENTAL", "PFISTER", "HONEYMAN", "TYMCZAK",
    "ASHCRAFT", "X", "A", "MUELLER", "MULLER",
]


def test_soundex_matches_spark(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], ["tok"])
    got = {r["tok"]: r["sx"] for r in df.select("tok", F.soundex("tok").alias("sx")).collect()}
    for t in TOKENS:
        assert soundex(t) == got[t], t


def test_soundex_spelling_variants_collide():
    assert soundex("WICK") == soundex("WHICK")
    assert soundex("SMITH") == soundex("SMYTH")
    assert soundex("ROBERT") == soundex("RUPERT")


def test_metaphone_variants():
    assert double_metaphone("SMITH")[0] == double_metaphone("SMYTH")[0]
    assert double_metaphone("PHIL")[0].startswith("F")
    assert double_metaphone("KNIGHT")[0].startswith("N")
    p, s = double_metaphone("SCHMIDT")
    assert p != "" and s != ""
    assert double_metaphone("") == ("", "")
    assert double_metaphone("123") == ("", "")
