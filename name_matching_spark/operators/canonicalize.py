"""Transcript canonicalization: turns -> per-conversation canonical record.

Input: the graft's transcript table (conv_id:string, turn_idx:int, role:string,
text:string, tool:string, ts:timestamp).  Output: one row per conversation:

* ``canonical_text`` — every turn's text normalized with the exact reference
  semantics (``process_text_standard`` with the name-pipeline flags,
  utils.py:34-72 in vietexob/name-matching) and collapsed in stable
  ``(conv_id, turn_idx)`` order.  ``array_sort(collect_list(struct(...)))``
  makes the result independent of partitioning/shuffle order — the per-turn
  text-equality invariant demanded by the graft contract.
* ``name_raw`` / ``name`` — the entity surface form mentioned in the
  conversation, extracted declaratively (native ``regexp_extract``) from the
  earliest turn that matches ``extract_pattern``.  Agent transcripts carry
  entity mentions in structured tool payloads (``name="..."``), which the
  default pattern targets; the pattern is a parameter, not a constant.

Everything is native Column expressions — one shuffle (the groupBy), no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from name_matching_spark.functions.normalize import normalize_text_col

DEFAULT_EXTRACT_PATTERN = r'name="([^"]+)"'


def canonicalize(
    transcripts: DataFrame,
    extract_pattern: str = DEFAULT_EXTRACT_PATTERN,
) -> DataFrame:
    """(conv_id, canonical_text, name_raw, name, n_turns, first_ts, last_ts)"""
    t = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        normalize_text_col(F.col("text"), upper=True).alias("text_norm"),
        F.regexp_extract(F.col("text"), extract_pattern, 1).alias("mention"),
    )
    agg = t.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text_norm"))),
                lambda s: s["text_norm"],
            ),
            " ",
        ).alias("canonical_text"),
        # Earliest non-empty mention wins (min over (turn_idx, mention)).
        F.min(
            F.when(F.col("mention") != "", F.struct("turn_idx", "mention"))
        )["mention"].alias("name_raw"),
        F.count("*").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    return agg.withColumn(
        "name", normalize_text_col(F.col("name_raw"), upper=True)
    )
