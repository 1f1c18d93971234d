"""Structured-streaming surface: streaming canonicalization + incremental
entity assignment (the batch-clustering / stream-assignment lambda split)."""

import os

import pytest
from pyspark.sql import functions as F

from name_matching_spark.datagen import write_fixture
from name_matching_spark.model.train import load_artifacts
from name_matching_spark.streaming.stream_resolve import (
    assign_stream_batch,
    stream_canonical_names,
)


@pytest.mark.slow
def test_stream_canonicalize_file_source(spark, tmp_path):
    fixture = str(tmp_path / "fx")
    write_fixture(fixture, n_entities=10, convs_per_entity=2, seed=5)
    static = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))
    stream = spark.readStream.schema(static.schema).parquet(
        os.path.join(fixture)
    )
    out = stream_canonical_names(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("canon_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from canon_stream").collect()
    assert len(got) > 0
    names = {r["name"] for r in got}
    # names come out normalized (uppercase, punctuation-free)
    assert all(n == n.upper() for n in names)


def test_assign_stream_batch(spark):
    model, tfidf = load_artifacts()
    entities = spark.createDataFrame(
        [("JONATHAN WICK", "JONATHAN WICK"), ("HOTEL CONTINENTAL", "HOTEL CONTINENTAL")],
        ["entity_key", "resolved_name"],
    )
    new = spark.createDataFrame(
        [("c1", "JOHN WICK"), ("c2", "ZEBRA QUARRY")], ["conv_id", "name"]
    )
    out = {r["conv_id"]: r for r in assign_stream_batch(
        new, entities, model.to_json(), tfidf.to_json()
    ).collect()}
    assert out["c1"]["status"] == "assigned"
    assert out["c1"]["entity_key"] == "JONATHAN WICK"
    assert out["c2"]["status"] == "pending"


@pytest.mark.slow
def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicates inside the watermark collapse to
    one row; state is bounded (dropDuplicatesWithinWatermark, not the
    unbounded dropDuplicates)."""
    import datetime as dt

    from name_matching_spark.streaming.stream_resolve import stream_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        text = f"doc body {i % 10}"  # 10 distinct texts, 4 copies each
        rows.append((i, t0 + dt.timedelta(seconds=i), text))
    src = str(tmp_path / "src")
    static = spark.createDataFrame(rows, ["doc_id", "ts", "text"])
    static.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").collect()
    # every distinct text survives exactly once
    assert len(got) == 10
    assert len({r["fp"] for r in got}) == 10


def test_entity_token_index_built_once(spark):
    """The entity-side explode must run exactly once per index build; every
    micro-batch reuses the materialized index (no per-trigger recompute)."""
    from pyspark.sql.types import StringType

    from name_matching_spark.streaming.stream_resolve import EntityTokenIndex

    acc = spark.sparkContext.accumulator(0)

    def bump(s):
        acc.add(1)
        return s

    bump_udf = F.udf(bump, StringType()).asNondeterministic()
    entities = spark.createDataFrame(
        [("JONATHAN WICK", "JONATHAN WICK"), ("HOTEL CONTINENTAL", "HOTEL CONTINENTAL")],
        ["entity_key", "resolved_name"],
    ).withColumn("resolved_name", bump_udf("resolved_name"))
    idx = EntityTokenIndex(entities)
    built = acc.value
    assert built > 0
    assert idx.broadcastable
    model, tfidf = load_artifacts()
    new = spark.createDataFrame(
        [("c1", "JOHN WICK"), ("c2", "ZEBRA QUARRY")], ["conv_id", "name"]
    )
    for _ in range(2):  # two simulated micro-batch triggers
        out = {
            r["conv_id"]: r
            for r in assign_stream_batch(
                new, idx, model.to_json(), tfidf.to_json()
            ).collect()
        }
        assert out["c1"]["status"] == "assigned"
        assert out["c2"]["status"] == "pending"
    # the entity-side scan + explode did NOT rerun per trigger
    assert acc.value == built


@pytest.mark.slow
def test_stateful_turn_collapse_matches_batch(spark, tmp_path):
    """applyInPandasWithState: the final per-conversation snapshot must
    equal the batch canonicalize() text, with state surviving across
    micro-batches (maxFilesPerTrigger=1 forces several)."""
    from name_matching_spark.operators.canonicalize import canonicalize
    from name_matching_spark.streaming.stream_resolve import stateful_turn_collapse

    fixture = str(tmp_path / "fx_state")
    write_fixture(fixture, n_entities=8, convs_per_entity=2, seed=11)
    src = os.path.join(fixture, "transcripts.parquet")
    static = spark.read.parquet(src)
    # re-write as several files so availableNow runs multiple micro-batches
    multi = str(tmp_path / "multi")
    static.repartition(4).write.parquet(multi)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    out = stateful_turn_collapse(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("state_collapse")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from state_collapse").collect()
    assert len(rows) > 0
    # final snapshot per conversation = the one with all turns accumulated
    # (n_turns grows monotonically, so max picks it order-independently)
    last = {}
    for r in rows:
        if r["conv_id"] not in last or r["n_turns"] > last[r["conv_id"]]["n_turns"]:
            last[r["conv_id"]] = r
    want = {
        r["conv_id"]: (r["canonical_text"], r["n_turns"])
        for r in canonicalize(static).collect()
    }
    got = {c: (r["canonical_text"], r["n_turns"]) for c, r in last.items()}
    assert set(got) == set(want)
    assert got == want
    # state genuinely crossed micro-batches: some conversation was
    # snapshotted more than once with growing n_turns
    assert len(rows) > len(got)


@pytest.mark.slow
def test_stream_vs_batch_agreement_10k(spark, tmp_path):
    """End-to-end lambda split at bench scale: batch pipeline resolves the
    10k-entity fixture; the SAME transcripts then replay as a stream in
    >= 3 micro-batches with turns shuffled out of order inside each
    chunk, and every conversation's streamed assignment must agree with
    the batch assignment for >= 0.99 of conversations (exact-member fast
    path + scored fallback, streaming canonicalization included)."""
    import tempfile

    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.streaming.stream_resolve import EntityTokenIndex

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture = os.path.join(REPO, "data", "bench_transcripts_e10000")
    if os.path.exists(fixture):
        transcripts = spark.read.parquet(
            os.path.join(fixture, "transcripts.parquet")
        )
    else:  # fallback: generate a smaller one on the fly
        fx = str(tmp_path / "fx10k")
        write_fixture(fx, n_entities=1000, convs_per_entity=3, seed=77)
        transcripts = spark.read.parquet(os.path.join(fx, "transcripts.parquet"))
    wh = tempfile.mkdtemp(prefix="nms_stream10k_")
    stages = EntityResolutionPipeline(spark, wh).run(transcripts)
    batch_keys = {
        r["conv_id"]: r["name_entity_key"]
        for r in stages["resolved_conversations"]
        .select("conv_id", "name_entity_key")
        .collect()
    }
    idx = EntityTokenIndex(stages["entities"])
    model, tfidf = load_artifacts()

    # 3 arrival chunks by conversation start time (watermark-friendly),
    # turns SHUFFLED within each chunk (out-of-order arrival)
    multi = str(tmp_path / "chunks")
    conv_t0 = transcripts.groupBy("conv_id").agg(F.min("ts").alias("t0"))
    tiles = conv_t0.withColumn(
        "chunk", F.ntile(3).over(__import__("pyspark").sql.Window.orderBy("t0"))
    )
    src = transcripts.join(tiles.select("conv_id", "chunk"), "conv_id")
    for c in (1, 2, 3):
        (
            src.where(F.col("chunk") == c)
            .drop("chunk")
            .orderBy(F.rand(41 + c))
            .coalesce(1)
            .write.mode("append")
            .parquet(multi)
        )
    stream = (
        spark.readStream.schema(transcripts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(multi)
    )
    names = stream_canonical_names(stream, watermark="10 minutes")
    got: dict = {}
    n_batches = [0]

    def sink(batch_df, _bid):
        n_batches[0] += 1
        out = assign_stream_batch(batch_df, idx, model.to_json(), tfidf.to_json())
        for r in out.where(F.col("status") == "assigned").collect():
            got[r["conv_id"]] = r["entity_key"]

    q = (
        names.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt10k"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert n_batches[0] >= 3, f"only {n_batches[0]} micro-batches ran"
    compared = [c for c in got if batch_keys.get(c) is not None]
    assert len(compared) >= 0.9 * len(batch_keys), (
        f"stream resolved only {len(compared)}/{len(batch_keys)} conversations"
    )
    agree = sum(got[c] == batch_keys[c] for c in compared)
    rate = agree / max(len(compared), 1)
    assert rate >= 0.99, f"stream-vs-batch agreement {rate:.4f}"
