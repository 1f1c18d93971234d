"""Word 1-2-gram TF-IDF cosine — pure-numpy re-implementation.

The reference computes a COSINE_SIM feature from a word-(1,2)-gram TF-IDF
vectorizer fitted on the unique positive left names with ``max_df=0.9`` and
``max_features=10000`` (build_features.py:243-270, train_model.py:493-495 in
vietexob/name-matching).  This module implements the same published TF-IDF
semantics from scratch:

* tokens: lowercase, ``(?u)\\b\\w\\w+\\b`` (>=2 word chars);
* terms: unigrams + space-joined bigrams;
* document frequency pruning at ``max_df`` (fraction of corpus docs);
* vocabulary truncated to the ``max_features`` most frequent terms
  (by corpus-wide term count, ties broken lexicographically);
* ``idf = ln((1 + N) / (1 + df)) + 1`` (smoothed), tf = raw in-doc count;
* vectors L2-normalized; pair score = cosine (dot of normalized vectors).

The fitted model is a plain dict — trivially broadcastable to executors and
JSON-serializable for artifact checkpointing.
"""

from __future__ import annotations

import json
import re
from collections import Counter

import numpy as np

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")

# Hard ceiling for the corpus-adaptive (max_features=None) fit: keeps the
# collected vocabulary/artifact bounded; corpora past it should use
# HashedTfidfModel.  Referenced by the pipeline's sidecar fingerprint so a
# change here invalidates resumed vocabularies.
ADAPTIVE_VOCAB_CEILING = 1_000_000


def _terms(text: str) -> list[str]:
    toks = _TOKEN_RE.findall(text.lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


class TfidfModel:
    """Fitted TF-IDF vocabulary + idf weights with pairwise-cosine transform."""

    def __init__(self, vocab: dict[str, int], idf: np.ndarray):
        self.vocab = vocab
        self.idf = np.asarray(idf, dtype=np.float64)

    # -- fitting ------------------------------------------------------------

    @classmethod
    def fit(
        cls,
        corpus,
        max_df: float = 0.9,
        max_features: int = 10000,
    ) -> "TfidfModel":
        n_docs = 0
        df: Counter = Counter()
        tf_total: Counter = Counter()
        for doc in corpus:
            n_docs += 1
            terms = _terms(doc)
            tf_total.update(terms)
            df.update(set(terms))
        if n_docs == 0:
            raise ValueError("empty corpus")
        max_df_count = max_df * n_docs
        kept = [t for t in df if df[t] <= max_df_count]
        kept.sort(key=lambda t: (-tf_total[t], t))
        kept = sorted(kept[:max_features])
        vocab = {t: i for i, t in enumerate(kept)}
        idf = np.array(
            [np.log((1.0 + n_docs) / (1.0 + df[t])) + 1.0 for t in kept],
            dtype=np.float64,
        )
        return cls(vocab, idf)

    # -- transform ----------------------------------------------------------

    def _doc_weights(self, text: str) -> dict[int, float]:
        c = Counter(_terms(text))
        w = {
            self.vocab[t]: n * self.idf[self.vocab[t]]
            for t, n in c.items()
            if t in self.vocab
        }
        norm = np.sqrt(sum(v * v for v in w.values()))
        if norm > 0:
            w = {k: v / norm for k, v in w.items()}
        return w

    def cosine_pairs(self, xs, ys) -> np.ndarray:
        """Pairwise cosine for aligned batches; sparse dict dot per pair
        (names carry ~5 terms, so the dict intersection dominates)."""
        out = np.zeros(len(xs), dtype=np.float64)
        cache: dict[str, dict[int, float]] = {}

        def weights(s: str) -> dict[int, float]:
            w = cache.get(s)
            if w is None:
                w = self._doc_weights(s)
                cache[s] = w
            return w

        for k, (x, y) in enumerate(zip(xs, ys)):
            wx, wy = weights(x), weights(y)
            if len(wx) > len(wy):
                wx, wy = wy, wx
            out[k] = sum(v * wy.get(i, 0.0) for i, v in wx.items())
        return out

    # -- per-token idf (the shared-rare-token evidence features) -----------

    def unigram_idf(self, token: str) -> float:
        """idf of one (lowercased) token.  A token absent from the
        vocabulary gets the MAX observed idf: at fit time absence means
        either rarity beyond the cap or max_df pruning, and treating it
        as maximally discriminating mirrors HashedTfidfModel's
        unseen-bucket rule (rare unseen terms are the informative ones —
        the anti-OOV-collapse lesson)."""
        i = self.vocab.get(token)
        if i is None:
            return self.max_idf()
        return float(self.idf[i])

    def max_idf(self) -> float:
        m = getattr(self, "_max_idf", None)
        if m is None:
            m = float(self.idf.max(initial=1.0))
            self._max_idf = m
        return m

    # -- distributed fitting ---------------------------------------------------

    @classmethod
    def fit_spark(
        cls,
        names_df,
        name_col: str = "name",
        extra_corpus: list[str] | None = None,
        max_df: float = 0.9,
        max_features: int | None = 10000,
        ceiling: int | None = None,
        overflow_n_buckets: int = 1 << 22,
    ) -> "TfidfModel | HashedTfidfModel":
        """Fit on a (possibly huge) Spark DataFrame of names plus an optional
        driver-side extra corpus.  The document-frequency / term-frequency
        aggregation runs distributed; only the <= ``max_features`` vocabulary
        rows are collected.  Tokenization mirrors :func:`_terms` exactly for
        whitespace-normalized word-character names (which is what the
        normalization stage guarantees).

        ``max_features=None`` means corpus-adaptive: keep every term up to
        a 1M hard ceiling.  The 10k default mirrors the reference
        (build_features.py max_features=10000) and is right for its small
        corpus, but at 10^5+ resolution names a frequency-truncated
        vocabulary drops exactly the RARE core tokens that distinguish
        entities, leaving only shared high-frequency tokens (designators,
        common given names) in vocabulary — cosine then collapses onto
        those and scores different-core orgs as near-identical (the
        documented OOV failure mode, measured as a primary driver of
        cluster over-merge at the 100k-entity scale).  The ceiling bounds
        the driver/broadcast artifact (~tens of MB); a corpus whose term
        diversity EXCEEDS the ceiling auto-switches to the hashing-trick
        fit (``overflow_n_buckets`` buckets, returns a
        :class:`HashedTfidfModel`) — truncating the adaptive vocabulary
        would silently reintroduce the rare-core OOV collapse the adaptive
        mode exists to prevent, and the hashed fit is A/B-proven within
        0.001 F1 of adaptive (BENCH/QUALITY.md).  ``ceiling`` overrides
        :data:`ADAPTIVE_VOCAB_CEILING` (tests cross the boundary cheaply).
        """
        from pyspark.sql import functions as F

        # ONE distinct over the union (distinct(union(distinct, distinct))
        # computes the same set through three exchanges)
        docs = names_df.select(F.lower(F.col(name_col)).alias("doc"))
        if extra_corpus:
            # Arrow createDataFrame path (pandas): ~2.5x faster to ship
            # the ~20k-doc training corpus than the pickled-row path, and
            # it holds the driver GIL for far less time (the fit runs on
            # a worker thread concurrent with blocking in the pipeline).
            import pandas as pd

            spark = names_df.sparkSession
            extra = spark.createDataFrame(
                pd.DataFrame({"doc": [c.lower() for c in extra_corpus]}),
                "doc string",
            )
            docs = docs.unionByName(extra)
        docs = docs.distinct()
        toks = F.filter(F.split(F.col("doc"), " "), lambda t: F.length(t) >= 2)
        n_tok = F.size(toks)
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        # The distinct-docs chain feeds BOTH the count and the term
        # aggregate; un-persisted it executes twice (two actions, no CSE
        # across jobs).  One pass + spill-graceful cache instead.
        docs.persist()
        n_docs = docs.count()
        # CPU floor for the term aggregate (guide §2.5 analog of the scan
        # floor): AQE coalesces the small distinct output to ~1 partition,
        # serializing the tokenize+bigram+explode work on one core.
        # Repartition BY doc (hash, not round-robin) so the downstream
        # countDistinct(doc) keeps exploiting the doc partitioning and
        # never shuffles doc strings into the aggregate.  Target derived
        # from the measured corpus size (>= ~512 docs/task); at scale the
        # cached partition count already exceeds it and this is a no-op.
        # (.rdd probe is safe here: docs is materialized by the count.)
        n_par = min(
            names_df.sparkSession.sparkContext.defaultParallelism,
            max(1, n_docs // 512),
        )
        src = docs
        if n_par > 1 and docs.rdd.getNumPartitions() < n_par:
            src = docs.repartition(n_par, F.col("doc"))
        with_terms = src.select(
            "doc", F.concat(toks, bigrams).alias("terms")
        )
        adaptive_cap = ceiling if ceiling is not None else ADAPTIVE_VOCAB_CEILING
        # ONE explode + ONE aggregate: tf = occurrence count, df = distinct
        # containing docs — same values as the explode-twice-and-join shape
        # with half the scans and no join.  explode_outer + isNotNull
        # instead of explode: the inferred non-empty filter a plain explode
        # generates gets pushed below the distinct and re-evaluates the
        # whole tokenize+bigram tree twice per input row (guide §7.2).
        agg = (
            with_terms.select("doc", F.explode_outer("terms").alias("term"))
            .where(F.col("term").isNotNull())
            .groupBy("term")
            .agg(
                F.count("*").alias("tf"),
                F.countDistinct("doc").alias("df"),
            )
            .where(F.col("df") <= max_df * n_docs)
        )
        if max_features is not None:
            # frequency-truncated vocabulary: the global order IS the
            # truncation rule, keep the sort
            stats = agg.orderBy(F.desc("tf"), F.asc("term")).limit(
                max_features + 1
            ).collect()
        else:
            # corpus-adaptive: every surviving term is kept (up to the
            # ceiling), so the global sort bought nothing but a full
            # exchange + TakeOrdered heap over every term (guide §2.4:
            # an orderBy used only to make output deterministic) — the
            # vocabulary is re-sorted lexicographically below either way.
            # Over-ceiling handling needs no order: the fit SWITCHES to
            # hashed, discarding the collected rows.
            stats = agg.limit(adaptive_cap + 1).collect()
        docs.unpersist()
        limit = max_features if max_features is not None else adaptive_cap
        if len(stats) > limit:
            stats = stats[:limit]
            if max_features is None:
                # The adaptive mode exists to PREVENT rare-core truncation;
                # crossing the ceiling therefore SWITCHES fits rather than
                # truncating: the hashed model keeps a weight for every
                # term at O(n_buckets) memory regardless of term diversity.
                import warnings

                warnings.warn(
                    "TfidfModel.fit_spark: corpus-adaptive vocabulary exceeded "
                    f"the {limit}-term ceiling; auto-switching to hashed TF-IDF "
                    f"({overflow_n_buckets} buckets) to preserve rare "
                    "discriminating terms",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return HashedTfidfModel.fit_spark(
                    names_df,
                    name_col=name_col,
                    extra_corpus=extra_corpus,
                    max_df=max_df,
                    n_buckets=overflow_n_buckets,
                )
        kept = sorted(r["term"] for r in stats)
        dfmap = {r["term"]: r["df"] for r in stats}
        vocab = {t: i for i, t in enumerate(kept)}
        idf = np.array(
            [np.log((1.0 + n_docs) / (1.0 + dfmap[t])) + 1.0 for t in kept],
            dtype=np.float64,
        )
        return cls(vocab, idf)

    # -- (de)serialization ----------------------------------------------------

    def to_json(self) -> str:
        return json.dumps({"vocab": self.vocab, "idf": self.idf.tolist()})

    @classmethod
    def from_json(cls, payload: str):
        obj = json.loads(payload)
        if obj.get("kind") == "hashed":  # polymorphic artifact dispatch
            return HashedTfidfModel._from_obj(obj)
        return cls(obj["vocab"], np.asarray(obj["idf"], dtype=np.float64))


def _md5_bucket(term: str, n_buckets: int) -> int:
    """Stable term -> bucket: 60-bit md5 prefix mod n_buckets.  md5 (not
    xxhash) so the Spark-side SQL expression
    ``pmod(conv(substring(md5(t),1,15),16,10), B)`` and driver python
    compute the identical bucket (the same trick the dedup operators use
    for oracle-stable hashing)."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_buckets


class HashedTfidfModel:
    """Hashing-trick TF-IDF — the successor fit for corpora past the
    adaptive vocabulary's 1M-term ceiling.

    No vocabulary is ever collected: a term maps to one of ``n_buckets``
    md5-derived buckets and only the per-bucket idf array ships to the
    driver/broadcast (memory O(n_buckets) REGARDLESS of corpus term
    diversity — the property a 10^8-name corpus needs).  With
    ``n_buckets`` far above the distinct-term count, buckets are
    singletons and the model is numerically identical to an uncapped
    :class:`TfidfModel` (tested); collisions degrade gracefully (two
    terms share a weight) rather than dropping terms entirely.

    One deliberate semantic difference: a transform-time term whose
    bucket was NEVER seen at fit time gets the maximum idf (df=0) instead
    of TfidfModel's drop-to-zero — rare unseen terms are the
    discriminating ones, which is exactly the OOV-collapse lesson
    BENCH/QUALITY.md records.
    """

    def __init__(self, idf: np.ndarray, n_buckets: int, default_idf: float | None = None):
        self.idf = np.asarray(idf, dtype=np.float64)
        self.n_buckets = int(n_buckets)
        # the unseen-bucket (df=0) weight; needed to serialize sparsely
        self.default_idf = (
            float(default_idf)
            if default_idf is not None
            else float(self.idf.max(initial=0.0))
        )

    @classmethod
    def fit_spark(
        cls,
        names_df,
        name_col: str = "name",
        extra_corpus: list[str] | None = None,
        max_df: float = 0.9,
        n_buckets: int = 1 << 20,
    ) -> "HashedTfidfModel":
        from pyspark.sql import functions as F

        # ONE distinct over the union (distinct(union(distinct, distinct))
        # computes the same set through three exchanges)
        docs = names_df.select(F.lower(F.col(name_col)).alias("doc"))
        if extra_corpus:
            # Arrow createDataFrame path (pandas): ~2.5x faster to ship
            # the ~20k-doc training corpus than the pickled-row path, and
            # it holds the driver GIL for far less time (the fit runs on
            # a worker thread concurrent with blocking in the pipeline).
            import pandas as pd

            spark = names_df.sparkSession
            extra = spark.createDataFrame(
                pd.DataFrame({"doc": [c.lower() for c in extra_corpus]}),
                "doc string",
            )
            docs = docs.unionByName(extra)
        docs = docs.distinct()
        toks = F.filter(F.split(F.col("doc"), " "), lambda t: F.length(t) >= 2)
        n_tok = F.size(toks)
        bigrams = F.zip_with(
            F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        docs.persist()
        n_docs = docs.count()
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        )
        stats = (
            docs.select("doc", F.concat(toks, bigrams).alias("terms"))
            .select("doc", F.explode_outer("terms").alias("term"))
            .where(F.col("term").isNotNull())  # see fit_spark: avoids the
            # inferred non-empty filter re-tokenizing below the distinct
            .select("doc", bucket.alias("b"))
            .groupBy("b")
            .agg(F.countDistinct("doc").alias("df"))
            .collect()  # <= distinct-bucket rows, bounded by n_buckets
        )
        docs.unpersist()
        idf = np.full(
            n_buckets, np.log((1.0 + n_docs) / 1.0) + 1.0, dtype=np.float64
        )
        max_df_count = max_df * n_docs
        for r in stats:
            if r["df"] <= max_df_count:
                idf[int(r["b"])] = np.log((1.0 + n_docs) / (1.0 + r["df"])) + 1.0
            else:
                idf[int(r["b"])] = 0.0  # stop-bucket, same rule as max_df terms
        return cls(idf, n_buckets, default_idf=np.log(1.0 + n_docs) + 1.0)

    def _doc_weights(self, text: str) -> dict[int, float]:
        c = Counter(_terms(text))
        w: dict[int, float] = {}
        for t, n in c.items():
            b = _md5_bucket(t, self.n_buckets)
            w[b] = w.get(b, 0.0) + n * self.idf[b]
        norm = np.sqrt(sum(v * v for v in w.values()))
        if norm > 0:
            w = {k: v / norm for k, v in w.items()}
        return w

    cosine_pairs = TfidfModel.cosine_pairs  # same sparse-dict pairwise dot

    def unigram_idf(self, token: str) -> float:
        return float(self.idf[_md5_bucket(token, self.n_buckets)])

    def max_idf(self) -> float:
        m = getattr(self, "_max_idf", None)
        if m is None:
            m = float(max(self.idf.max(initial=1.0), self.default_idf))
            self._max_idf = m
        return m

    def to_json(self) -> str:
        # sparse: store only buckets that differ from the unseen default
        default = self.default_idf
        nz = {
            str(i): float(v)
            for i, v in enumerate(self.idf)
            if v != default
        }
        return json.dumps(
            {
                "kind": "hashed",
                "n_buckets": self.n_buckets,
                "default_idf": default,
                "idf_nz": nz,
            }
        )

    @classmethod
    def _from_obj(cls, obj: dict) -> "HashedTfidfModel":
        idf = np.full(obj["n_buckets"], obj["default_idf"], dtype=np.float64)
        for i, v in obj["idf_nz"].items():
            idf[int(i)] = v
        return cls(idf, obj["n_buckets"], default_idf=obj["default_idf"])

    @classmethod
    def from_json(cls, payload: str) -> "HashedTfidfModel":
        return cls._from_obj(json.loads(payload))
