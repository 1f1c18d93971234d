"""Deterministic 10x scale-up: /root/testdata/sf0.1 -> data/sf1.

The driver ships testdata only up to sf0.1; the 10x-scale evidence run
(BENCH/SF1.md) needs the same tables one order of magnitude larger.  This
script derives them from sf0.1 itself — no external data, no RNG — as 10
disjoint replicas per table:

* every id column is shifted by ``replica * (max_id + 1)`` so keys stay
  unique and joins (lineitem.l_partkey -> part.p_partkey) stay consistent
  within a replica;
* ``documents.text`` is perturbed per replica by a Caesar shift of the
  letters (``translate``, shift = replica index; replica 0 keeps the
  original text).  A character bijection maps word shingles AND char
  n-grams bijectively, so each replica's internal similarity structure is
  EXACTLY isomorphic to replica 0 (expected dedup outputs scale exactly
  linearly, modulo md5-MinHash banding variance), while replicas share
  essentially no shingles with each other: cross-replica near-dup
  collisions are suppressed by construction.  That is the property the
  scale run needs — any super-linear growth in runtime is then an engine
  artifact (a hidden quadratic), not a data artifact.  (A per-token
  suffix tag was tried first and rejected: the tag's own char n-grams are
  shared by every doc in a replica and inflate within-replica Jaccard —
  near-dup drops grew 13.2x instead of ~10x;
  number-only tokens map to themselves — rare enough in this corpus not
  to matter);
* ``embeddings.embedding`` is rotated by ``replica`` positions (norms
  preserved, neighbor structure decorrelated across replicas).

Usage: python scripts/make_sf1.py [out_dir]  (default: <repo>/data/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# MAKE_SF_REPLICAS=100 MAKE_SF_TABLES=documents,embeddings -> a derived
# sf10 with just the corpus tables (the second-decade scale check for the
# dedup/text/ANN operators; replicating the 6M-row lineitem 100x buys no
# extra evidence for those).  Replicas 1-25 use the Caesar shift (keeps
# the recorded sf1 byte-identical); replicas >= 26 use a seeded alphabet
# PERMUTATION instead — a plain shift wraps at 26 and would make replica
# 26 an exact text clone of replica 0, collapsing the cross-replica
# disjointness the linearity diagnostic depends on.  Every per-replica
# transform is still a character bijection, so within-replica similarity
# structure stays exactly isomorphic to replica 0.
REPLICAS = int(os.environ.get("MAKE_SF_REPLICAS", "10"))
SRC = "/root/testdata/sf0.1"

_LOWER = "abcdefghijklmnopqrstuvwxyz"


def replica_alphabet(r: int) -> tuple[str, str]:
    """(from_chars, to_chars) for ``F.translate`` at replica ``r > 0``."""
    if r < 26:
        mapped = _LOWER[r:] + _LOWER[:r]  # the original Caesar shift
    else:
        import random

        letters = list(_LOWER)
        random.Random(9000 + r).shuffle(letters)
        mapped = "".join(letters)
    return _LOWER + _LOWER.upper(), mapped + mapped.upper()

# table -> id columns to shift (shift unit = max over the FIRST id column,
# shared across tables that join on it via the per-table mapping below)
ID_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
}
# fixed-cardinality dimension tables, copied verbatim (TPC-H keeps
# nation/region constant across scale factors; *_nationkey is NO_SHIFT so
# the copied dims still join every replica)
COPY_TABLES = ["nation", "region"]
# columns whose shift unit must MATCH another table's so joins survive the
# replica shift: (table, col) -> (table, col) providing the unit
SHARED_UNITS = {
    ("lineitem", "l_partkey"): ("part", "p_partkey"),
    ("lineitem", "l_orderkey"): ("orders", "o_orderkey"),
    ("lineitem", "l_suppkey"): ("supplier", "s_suppkey"),
    ("orders", "o_custkey"): ("customer", "c_custkey"),
}
# keys that are small-dimension codes, not entity ids — never shift
NO_SHIFT = {("customer", "c_nationkey"), ("supplier", "s_nationkey")}


def main(out_dir: str) -> None:
    from name_matching_spark.session import get_spark

    spark = get_spark(app_name="make-sf1", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    units: dict[tuple[str, str], int] = {}
    bases = {}
    for t, cols in ID_COLS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        bases[t] = df
        for c in cols:
            units[(t, c)] = int(df.agg(F.max(c)).collect()[0][0]) + 1
    for key, src in SHARED_UNITS.items():
        units[key] = units[src]

    only = os.environ.get("MAKE_SF_TABLES")
    wanted = set(only.split(",")) if only else None
    for t, cols in ID_COLS.items():
        if wanted is not None and t not in wanted:
            continue
        base = bases[t]
        parts = []
        for r in range(REPLICAS):
            rep = base
            for c in cols:
                if (t, c) in NO_SHIFT:
                    continue
                rep = rep.withColumn(c, F.col(c) + F.lit(r * units[(t, c)]))
            if t == "documents" and r > 0:
                src_chars, dst_chars = replica_alphabet(r)
                rep = rep.withColumn("text", F.translate("text", src_chars, dst_chars))
            if t == "embeddings" and r > 0:
                dim = F.size("embedding")
                rot = r % 64  # embeddings are 64-dim; rotate within range
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", rot + 1, dim - rot),
                        F.slice("embedding", 1, rot),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        dest = os.path.join(out_dir, f"{t}.parquet")
        out.repartition(8).write.mode("overwrite").parquet(dest)
        print(f"{t}: {spark.read.parquet(dest).count()} rows -> {dest}")
    for t in COPY_TABLES:
        if wanted is not None and t not in wanted:
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        dest = os.path.join(out_dir, f"{t}.parquet")
        df.write.mode("overwrite").parquet(dest)
        print(f"{t}: {spark.read.parquet(dest).count()} rows -> {dest} (copied)")
    spark.stop()


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "data", "sf1"))
