"""The 8-feature pairwise vector — single source of truth for train & serve.

Column order is the load-bearing contract (mirrors the reference's fixed
feature order, predict_model.py:58-67 in vietexob/name-matching).  The same
function featurizes the driver-side training frame and every Arrow batch
inside the Spark scorer UDF, so train/serve skew is impossible.
"""

from __future__ import annotations

import numpy as np

from name_matching_spark.functions import similarity as sim
from name_matching_spark.functions.tfidf import TfidfModel

FEATURE_COLS = [
    "jaccard_sim",
    "cosine_sim",
    "ratio",
    "sorted_token_ratio",
    "token_set_ratio",
    "partial_ratio",
    "emb_distance",
    "len_diff",
    # Features 9-11 extend the reference's 8: Jaro-Winkler is explicitly in
    # the target feature set; Monge-Elkan(JW) and the designator-stripped
    # core ratio supply the out-of-vocabulary generalization signal the
    # reference obtained from its sentence-embedding feature.
    "jaro_winkler",
    "monge_elkan_jw",
    "core_ratio",
    "token_weakest_link",
    # Absolute (not length-normalized) edit distance on designator-stripped
    # sorted-token-collapsed names: separates typo/merge positives (0-2)
    # from grafted-syllable near-miss cores (3+) that every ratio feature
    # scores identically on long names.
    "align_edit",
    # Max per-aligned-token edit distance beyond the single-substitution
    # typo allowance: a substituted syllable (2 edits in ONE token) is a
    # different name; a two-token typo (1 edit in each of two tokens) is
    # the positive space — identical under every whole-name feature.
    "token_sub_excess",
    # IDF-weighted shared-token evidence, moved INTO the model from the
    # clustering evidence rung (which tested cosine>=0.05 post-hoc):
    # shared_max_idf = rarity of the rarest SHARED token (1.0 = df-1 rare,
    # ~0 = generic designator), length-invariant where cosine dilutes on
    # long names; idf_jaccard = idf-weighted token-overlap ratio.  Both
    # computed from the same TF-IDF artifact as cosine_sim, so the serve
    # fit stays corpus-adaptive.
    "shared_max_idf",
    "idf_jaccard",
]


def idf_evidence_batch(xs, ys, tfidf) -> tuple[np.ndarray, np.ndarray]:
    """(shared_max_idf, idf_jaccard) for aligned batches of normalized
    names.  Tokens are the >=2-char words (1-char initials deliberately
    carry NO evidence — they are exactly the ambiguous glue forms),
    lowercased to match the TF-IDF fit.  idf lookups go through the
    model's ``unigram_idf`` (vocab or hashed-bucket), normalized by its
    ``max_idf`` so the scale is corpus-size-stable."""
    n = len(xs)
    out_max = np.zeros(n, dtype=np.float64)
    out_jac = np.zeros(n, dtype=np.float64)
    max_idf = tfidf.max_idf() or 1.0
    idf_cache: dict[str, float] = {}

    def idf(t: str) -> float:
        v = idf_cache.get(t)
        if v is None:
            v = tfidf.unigram_idf(t)
            idf_cache[t] = v
        return v

    for k, (x, y) in enumerate(zip(xs, ys)):
        tx = {t for t in x.lower().split() if len(t) >= 2}
        ty = {t for t in y.lower().split() if len(t) >= 2}
        if not tx or not ty:
            continue
        shared = tx & ty
        if shared:
            out_max[k] = max(idf(t) for t in shared) / max_idf
            union_sum = sum(idf(t) for t in tx | ty)
            if union_sum > 0:
                out_jac[k] = sum(idf(t) for t in shared) / union_sum
    return out_max, out_jac


def build_features(xs, ys, tfidf: TfidfModel) -> np.ndarray:
    """(n, len(FEATURE_COLS)) float64 feature matrix for aligned batches of
    *normalized* names.  Inputs must be non-null; empty strings are legal
    and score 0.
    """
    xs = list(xs)
    ys = list(ys)
    # One edit-distance memo per batch: the four ratio variants and the
    # partial-ratio windows repeat many identical string pairs.
    memo: dict = {}
    # Weakest-link + sub-excess share one token-alignment/JW pass.
    twl, excess = sim._token_align_stats_batch(xs, ys)
    shared_max_idf, idf_jaccard = idf_evidence_batch(xs, ys, tfidf)
    cols = [
        sim.jaccard_batch(xs, ys),
        tfidf.cosine_pairs(xs, ys),
        sim.ratio_batch(xs, ys, memo=memo),
        sim.sorted_token_ratio_batch(xs, ys, memo=memo),
        sim.token_set_ratio_batch(xs, ys, memo=memo),
        sim.partial_ratio_reference_batch(xs, ys).astype(np.float64),
        sim.ngram_cosine_batch(xs, ys),
        sim.len_diff_batch(xs, ys).astype(np.float64),
        sim.jaro_winkler_batch(xs, ys),
        sim.monge_elkan_jw_batch(xs, ys),
        sim.core_ratio_batch(xs, ys, memo=memo),
        twl,
        sim.align_edit_batch(xs, ys, memo=memo),
        excess,
        shared_max_idf,
        idf_jaccard,
    ]
    return np.column_stack(cols)
