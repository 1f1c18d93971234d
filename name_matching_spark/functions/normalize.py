"""Text normalization with exact parity to the reference semantics.

The reference pipeline (``name_matching/utils/utils.py:34-72`` in
vietexob/name-matching) normalizes free text as:

1. replace ``[/(){}\\[\\]\\|@,;]`` with a space;
2. replace every remaining non-word/non-space char (``[^\\w\\s]``, Unicode
   semantics) with a space;
3. optionally drop whitespace tokens for which Python ``str.isnumeric()``
   is true (default on);
4. optionally drop (uppercased) English stopwords (the name pipeline always
   passes ``remove_stopwords=False``);
5. optionally Porter-stem (never used for names);
6. re-join on single spaces.

Two implementations are provided and tested for equality:

* :func:`normalize_text` — pure-Python twin, the executable spec.  Used by
  the driver-side trainer, the fixture generator, and parity tests.
* :func:`normalize_text_col` — native Spark Column expression (JVM-side,
  whole-stage-codegen friendly); the hot path at scale.  Java regexes are
  given the ``(?U)`` flag so ``\\w``/``\\s`` match Python's Unicode classes,
  and ``str.isnumeric()`` is mirrored with ``[\\p{Nd}\\p{Nl}\\p{No}]+``
  (decimal digits, letter numbers, other numbers) which covers every case
  in the conformance corpus incl. full-width digits and vulgar fractions.
  Known residual gap: CJK ideographs with a numeric value (e.g. U+4E94)
  are ``isnumeric()`` in Python but category Lo in Unicode; callers that
  need byte-exact behavior on such inputs use :func:`normalize_udf`.
* :func:`normalize_udf` — Arrow-batched pandas UDF wrapping the Python
  twin, for exact-Unicode mode (never row-at-a-time Python).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# The standard public English stopword list (NLTK corpus), uppercased, as
# consumed by the reference (utils.py:21).
STOPWORDS = frozenset(
    w.upper()
    for w in """
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split()
)

_REPLACE_BY_SPACE = re.compile(r"[/(){}\[\]\|@,;]")
_PUNCT = re.compile(r"[^\w\s]")

# ---------------------------------------------------------------------------
# Pure-Python twin (executable spec)
# ---------------------------------------------------------------------------


def normalize_text(
    text: str,
    remove_numbers: bool = True,
    remove_stopwords: bool = True,
    stem: bool = False,
) -> str:
    """Pure-Python normalization, byte-equal to the reference semantics."""
    out = _REPLACE_BY_SPACE.sub(" ", text)
    out = _PUNCT.sub(" ", out)
    if remove_numbers:
        out = " ".join(t for t in out.split() if not t.isnumeric())
    else:
        out = " ".join(out.split())
    if remove_stopwords:
        out = " ".join(w for w in out.split() if w not in STOPWORDS)
    if stem:
        out = " ".join(porter_stem(w) for w in out.split())
    return out


def remove_or_extract_numeric_tokens(text: str, is_removal: bool = True) -> str:
    """Standalone numeric-token remove/extract (operator P3): keeps or
    returns whitespace tokens for which ``str.isnumeric()`` holds.  Note
    the difference from the full normalization pipeline: applied directly,
    '12-34' is one non-numeric token; inside normalization the punctuation
    pass splits it first."""
    tokens = text.split()
    if is_removal:
        kept = [t for t in tokens if not t.isnumeric()]
    else:
        kept = [t for t in tokens if t.isnumeric()]
    return " ".join(kept)


def preprocess_name(name: str) -> str:
    """Uppercase + normalize, the exact name-pipeline flag combination
    (upper -> remove_numbers=True, remove_stopwords=False)."""
    return normalize_text(name.upper(), remove_numbers=True, remove_stopwords=False)


# ---------------------------------------------------------------------------
# Native Spark Column expression (the hot path)
# ---------------------------------------------------------------------------

_NUMERIC_TOKEN_RE = r"^[\p{Nd}\p{Nl}\p{No}]+$"


def normalize_text_col(
    col: Column,
    remove_numbers: bool = True,
    remove_stopwords: bool = False,
    upper: bool = False,
) -> Column:
    """Spark-native normalization (JVM regex / higher-order functions only).

    ``upper=True`` folds in the caller-side ``.upper()`` the reference name
    pipeline applies before normalization.
    """
    c = F.upper(col) if upper else col
    c = F.regexp_replace(c, r"[/(){}\[\]\|@,;]", " ")
    # Python's \w means "alphanumeric or underscore" = categories
    # L* ∪ Nd ∪ Nl ∪ No ∪ {_}.  Java's (?U)\w differs on both sides
    # (includes combining marks Mn/Mc/Me, excludes Nl/No), so the class is
    # spelled out.  Residual gap: characters assigned between the JVM's and
    # CPython's Unicode table versions — normalize_udf is the exact twin.
    c = F.regexp_replace(c, r"(?U)[^\p{L}\p{Nd}\p{Nl}\p{No}_\s]", " ")
    tokens = F.split(c, r"(?U)\s+")
    tokens = F.filter(tokens, lambda t: t != F.lit(""))
    if remove_numbers:
        tokens = F.filter(tokens, lambda t: ~t.rlike(_NUMERIC_TOKEN_RE))
    if remove_stopwords:
        stop = F.lit(sorted(STOPWORDS))
        tokens = F.filter(tokens, lambda t: ~F.array_contains(stop, t))
    return F.array_join(tokens, " ")


def normalize_udf(
    remove_numbers: bool = True,
    remove_stopwords: bool = False,
    upper: bool = False,
):
    """Arrow-batched pandas UDF twin for exact-Unicode mode."""

    def _batch(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            if upper:
                v = v.upper()
            return normalize_text(
                v, remove_numbers=remove_numbers, remove_stopwords=remove_stopwords
            )

        return s.map(one)

    return F.pandas_udf(_batch, StringType())


# ---------------------------------------------------------------------------
# Porter stemmer (classic public algorithm; only used when stem=True, which
# the name pipeline never enables — provided for operator completeness).
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    forms = "".join("c" if _is_cons(stem, i) else "v" for i in range(len(stem)))
    return len(re.findall("vc", forms))


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def porter_stem(word: str) -> str:
    """Compact Porter stemmer (steps 1a-5b of the published algorithm)."""
    w = word.lower()
    if len(w) <= 2:
        return word if word != w else w
    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # Step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # Step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # Step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]
    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _measure(stem) > 1 or (_measure(stem) == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w
