"""Incremental entity resolution over a transcript stream.

The reference's closest thing to streaming is its row-at-a-time Flask
scorer (app.py:101-369 in vietexob/name-matching), which the north star
explicitly replaces with batch.  This module provides the Structured
Streaming counterpart for *incremental* arrivals: new transcript turns
stream in, are canonicalized per conversation inside event-time windows
(watermarked so late turns within the allowance still collapse into their
conversation), and each micro-batch of new names is scored against the
existing entity table with the same Arrow-batched scorer the batch
pipeline uses.

Design: stream-side work is append-only and bounded per micro-batch; the
entity table is a broadcast-joined lookup refreshed from the batch
pipeline's warehouse.  Names that match an existing entity adopt it; the
rest are emitted as pending singletons for the next batch-pipeline run to
cluster (streaming transitive closure would need unbounded state, so the
lambda split batch=clustering / stream=assignment is deliberate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from name_matching_spark.functions.normalize import normalize_text_col
from name_matching_spark.operators.scoring import score_pairs


def stream_canonical_names(
    stream: DataFrame,
    watermark: str = "10 minutes",
    extract_pattern: str = r'name="([^"]+)"',
) -> DataFrame:
    """Streaming turn-collapse: watermarked event-time aggregation per
    conversation; emits (conv_id, name) in append mode once the watermark
    passes (late turns inside the allowance are still included)."""
    # Parquet sources surface TIMESTAMP_NTZ; event-time semantics need the
    # instant type.
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    t = stream.withWatermark("ts", watermark).select(
        "conv_id",
        "ts",
        F.regexp_extract(F.col("text"), extract_pattern, 1).alias("mention"),
        F.col("turn_idx"),
    )
    agg = t.groupBy(
        F.col("conv_id"),
        F.session_window(F.col("ts"), watermark).alias("w"),
    ).agg(
        F.min(
            F.when(F.col("mention") != "", F.struct("turn_idx", "mention"))
        )["mention"].alias("name_raw")
    )
    return agg.select(
        "conv_id",
        normalize_text_col(F.col("name_raw"), upper=True).alias("name"),
    ).where(F.col("name").isNotNull() & (F.length("name") > 0))


def assign_stream_batch(
    new_names: DataFrame,
    entities: DataFrame,
    model_json: str,
    tfidf_json: str,
    threshold: float = 0.85,
) -> DataFrame:
    """foreachBatch body: score each new name against existing entity
    canonical names that share a token (cheap blocking), assign the best
    match >= threshold, else mark pending.

    entities: (entity_key, resolved_name) — the batch pipeline's output."""
    nn = new_names.select("conv_id", "name").dropDuplicates(["name", "conv_id"])
    nt = nn.select(
        "conv_id", "name", F.explode(F.split("name", " ")).alias("tok")
    ).where(F.length("tok") >= 2)
    et = entities.select(
        "entity_key", F.col("resolved_name").alias("cand")
    ).withColumn("tok", F.explode(F.split(F.col("cand"), " ")))
    cands = (
        nt.join(et.where(F.length("tok") >= 2), "tok")
        .select("conv_id", "name", "entity_key", "cand")
        .dropDuplicates(["conv_id", "name", "entity_key"])
    )
    scored = score_pairs(
        cands,
        model_json,
        tfidf_json,
        threshold=threshold,
        name_x="name",
        name_y="cand",
        keep_features=False,
    )
    best = (
        scored.where(F.col("prediction") == 1)
        .groupBy("conv_id", "name")
        .agg(F.max_by("entity_key", "probability").alias("entity_key"))
    )
    return nn.join(best, ["conv_id", "name"], "left").withColumn(
        "status",
        F.when(F.col("entity_key").isNotNull(), F.lit("assigned")).otherwise(
            F.lit("pending")
        ),
    )
