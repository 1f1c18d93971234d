"""Text-analysis operators for training-data curation (documents table).

All native Column expressions (whole-stage codegen, oracle-checkable):

* :func:`token_count`     — whitespace tokens + a BPE-ish subword estimate
  (word-chars runs / digits / punctuation as separate units);
* :func:`quality_score`   — length / punctuation-ratio / stopword-ratio /
  mean-token-length heuristics folded into one [0,1] score;
* :func:`lang_id`         — stopword-hit-rate n-gram heuristic across a
  small built-in language profile set;
* :func:`fingerprint`     — md5-based document fingerprint over the
  normalized token sequence (rolling-hash style, reproducible in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "de", "que", "los", "una", "es", "por", "con", "para"],
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"(?U)\s+"), lambda t: t != F.lit(""))


def token_count(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """(key, n_tokens, n_subwords): whitespace tokens and a BPE-ish unit
    count (runs of word chars, digits, and individual punctuation)."""
    c = F.col(text_col)
    toks = _tokens(c)
    sub = F.size(
        F.filter(
            F.split(c, r"(?U)(?<=\W)|(?=\W)"),
            lambda t: ~t.rlike(r"(?U)^\s*$"),
        )
    )
    return docs.select(
        F.col(key_col).alias("key"),
        F.size(toks).alias("n_tokens"),
        sub.alias("n_subwords"),
        F.length(c).alias("n_chars"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """(key, punct_ratio, stopword_ratio, mean_token_len, quality):
    quality = weighted product of clipped component scores."""
    c = F.col(text_col)
    toks = _tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    punct = n_chars - F.length(F.regexp_replace(c, r"(?U)[^\w\s]", ""))
    en = F.lit(_LANG_PROFILES["en"])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 6)
    mean_tok = F.round(
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
        / F.greatest(n_tok, F.lit(1)),
        6,
    )
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 4)
    tok_score = F.when((mean_tok >= 3) & (mean_tok <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    quality = F.round(len_score * punct_score * tok_score, 6)
    return docs.select(
        F.col(key_col).alias("key"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok.alias("mean_token_len"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """(key, lang, lang_score) — argmax stopword-hit-rate across profiles;
    ties and zero hits resolve to 'und' (undetermined)."""
    toks = _tokens(F.col(text_col))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in _LANG_PROFILES.items():
        lw = F.lit(words)
        hits = F.size(F.filter(toks, lambda t: F.array_contains(lw, t)))
        scores.append(F.struct((hits / n_tok).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return docs.select(
        F.col(key_col).alias("key"),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang"),
        F.round(best["score"], 6).alias("lang_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """(key, fingerprint) — md5 of the normalized (lowercase, sorted
    distinct tokens) representation: robust to reordering/duplication,
    reproducible in any SQL engine with md5."""
    norm = F.array_join(F.array_sort(F.array_distinct(_tokens(F.col(text_col)))), " ")
    return docs.select(
        F.col(key_col).alias("key"), F.md5(norm).alias("fingerprint")
    )
