"""Similarity search over an embedding column (array<float>).

* :func:`brute_force_topk` — exact cosine top-k for a set of query vectors:
  broadcast the (small) query side, native ``zip_with``/``aggregate`` dot
  products, per-query ``row_number`` window.  The correctness baseline.
* :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets;
  candidates are limited to bucket collisions across ``tables`` independent
  hash tables, then re-ranked exactly.  Probing cost drops from O(N) per
  query to O(N / 2^bits x tables); recall is tunable with (bits, tables).

Hyperplanes are derived deterministically from a seeded RNG at plan-build
time and shipped as literal arrays — no state, reproducible across runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(c: Column) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact top-k by cosine.

    The query side is broadcast (queries << corpus); the corpus scan is a
    single narrow pass, the only shuffle is the per-query top-k window."""
    q = F.broadcast(
        queries.select(
            F.col(query_key_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    scored = (
        emb.select(F.col(key_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .crossJoin(q)
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def _bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id for one hash table (planes: (bits, dim))."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = _dot(vec, F.lit([float(x) for x in plane]))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 32,
    bits: int = 6,
    tables: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    query_key_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join then exact re-rank.

    At 100TB the corpus side is partitioned by (table, bucket); each query
    probes ``tables`` buckets instead of the full corpus."""
    planes = _hyperplanes(dim, bits, tables, seed)
    corpus = emb.select(F.col(key_col).alias("vec_id"), F.col(vec_col).alias("v"))
    qs = queries.select(F.col(query_key_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c_buck = None
    q_buck = None
    for t in range(tables):
        cb = corpus.select(
            "vec_id", "v", F.lit(t).alias("tbl"), _bucket_expr(F.col("v"), planes[t]).alias("bucket")
        )
        qb = qs.select(
            "query_id", "qv", F.lit(t).alias("tbl"), _bucket_expr(F.col("qv"), planes[t]).alias("bucket")
        )
        c_buck = cb if c_buck is None else c_buck.unionByName(cb)
        q_buck = qb if q_buck is None else q_buck.unionByName(qb)
    cand = (
        q_buck.join(c_buck, ["tbl", "bucket"])
        .select("query_id", "vec_id", "qv", "v")
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("cosine", F.round(cosine_col(F.col("qv"), F.col("v")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
