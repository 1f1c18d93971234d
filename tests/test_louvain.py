"""Louvain option: agreement with CC on alias-shaped graphs, the
documented divergence on weakly-joined cliques, golden-cluster parity."""

import os
from collections import defaultdict

from pyspark.sql import functions as F

from name_matching_spark.operators.clustering import connected_components
from name_matching_spark.operators.louvain import louvain_communities, louvain_driver

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clusters(rows):
    out = defaultdict(set)
    for r in rows:
        out[r["component"]].add(r["name"])
    return sorted((frozenset(v) for v in out.values()), key=lambda s: sorted(s)[0])


def test_louvain_matches_cc_on_alias_cliques(spark):
    # near-clique alias groups (the threshold-0.85 match-graph shape)
    edges = []
    for g in range(6):
        members = [f"g{g}x{i}" for i in range(5)]
        edges += [(a, b) for a in members for b in members if a < b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert _clusters(louvain_communities(df).collect()) == _clusters(
        connected_components(df).collect()
    )


def test_louvain_splits_weakly_joined_cliques():
    # two 6-cliques joined by ONE edge: CC merges them; Louvain's
    # modularity objective keeps them apart — the semantic difference vs
    # transitive clustering, documented.
    a = [f"a{i}" for i in range(6)]
    b = [f"b{i}" for i in range(6)]
    edges = [(x, y) for x in a for y in a if x < y]
    edges += [(x, y) for x in b for y in b if x < y]
    edges += [("a0", "b0")]
    labels = louvain_driver(edges)
    comms = defaultdict(set)
    for node, c in labels.items():
        comms[c].add(node)
    assert sorted(map(sorted, comms.values())) == [sorted(a), sorted(b)]


def test_louvain_deterministic():
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d")]
    assert louvain_driver(edges) == louvain_driver(list(reversed(edges)))


def test_louvain_golden_txns_parity(spark):
    """The reference clusters the txn fixture with louvain_communities;
    our Louvain must reproduce the same four entity groups."""
    from name_matching_spark.functions.normalize import normalize_text_col
    from name_matching_spark.model.train import load_artifacts
    from name_matching_spark.operators.blocking import candidate_pairs
    from name_matching_spark.operators.scoring import score_pairs

    model, tfidf = load_artifacts()
    txn = spark.read.option("header", True).csv(os.path.join(REPO, "data/sample_txns.csv"))
    txn = txn.toDF(*[c.strip("﻿") for c in txn.columns])
    names = (
        txn.select(normalize_text_col(F.col("Cust_Name"), upper=True).alias("name"))
        .union(txn.select(normalize_text_col(F.col("Counterpart_Name"), upper=True)))
        .distinct()
    )
    pairs = candidate_pairs(names)
    scored = score_pairs(pairs, model.to_json(), tfidf.to_json(), threshold=0.85)
    comps = louvain_communities(
        scored.where("prediction = 1").selectExpr("name_x as src", "name_y as dst")
    )
    got = _clusters(comps.collect())
    want = sorted(
        (
            frozenset({"JOHN WICK", "JONATHAN WICK", "JON WHICK", "J WICK"}),
            frozenset({"CONTINENTAL HOTEL", "HOTEL CONTINENTAL", "HOTEL CONT L"}),
            frozenset({"WINSTON SCOTT", "W SCOTT", "WIN SCOTT", "SCOTT WINSTON"}),
        ),
        key=lambda s: sorted(s)[0],
    )
    assert got == want


def test_louvain_distributed_per_component(spark):
    """Total edges above the gate but every component under it: the
    distributed path (CC partition -> per-component applyInPandas with the
    global 2m) must resolve WITHOUT raising and agree exactly with the
    driver path on the same graph."""
    edges = []
    for g in range(4):
        m = [f"g{g}n{i}" for i in range(4)]
        edges += [(a, b) for a in m for b in m if a < b]  # 6 edges each
    df = spark.createDataFrame(edges, ["src", "dst"])
    dist = louvain_communities(df, max_edges=10)  # 24 total > 10, 6/component
    drv = louvain_communities(df, max_edges=1_000_000)
    assert _clusters(dist.collect()) == _clusters(drv.collect())


def test_louvain_per_component_gate_raises(spark):
    """A single component larger than the gate must raise loudly (inside
    the applyInPandas task), never truncate."""
    import pytest

    m = [f"n{i}" for i in range(6)]
    edges = [(a, b) for a in m for b in m if a < b]  # one 15-edge clique
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(Exception, match="per-component gate"):
        louvain_communities(df, max_edges=10).collect()
