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
