"""Sweep clustering-refinement knobs on a fixed scored-edge set.

Runs the pipeline ONCE on a bench fixture (blocking + scoring reused
across variants), then recomputes refined_components -> entities ->
resolved under each knob combination and reports ground-truth pair
precision / recall / F1.  Pure measurement — no product code touched.

Usage: python scripts/cluster_knob_sweep.py [n_entities]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from name_matching_spark.operators.clustering import (
        refined_components,
        subsumption_aware_components,
    )
    from name_matching_spark.operators.resolve import entity_table, resolve_records
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark
    from scripts.er_quality_at_scale import pair_f1

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n}")
    spark = get_spark(app_name="knob-sweep", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))
    truth_path = os.path.join(fixture, "truth.parquet")

    wh = tempfile.mkdtemp(prefix="nms_sweep_")
    try:
        pipe = EntityResolutionPipeline(spark, wh)
        stages = pipe.run(transcripts)
        conv = stages["conversations"].localCheckpoint()
        names = stages["names"].localCheckpoint()
        matches = (
            stages["scored_pairs"]
            .where(F.col("prediction") == 1)
            .select(
                F.col("name_x").alias("src"),
                F.col("name_y").alias("dst"),
                "probability",
                "cosine_sim",
                "align_edit",
                "token_weakest_link",
            )
            .localCheckpoint()
        )
        _L = (0.92, 0.96, 0.99, 0.995, 0.999)
        grid = [
            # cap sweep under singleton re-attach (unanimous evidence
            # votes): attachment now recovers the recall a tighter cap
            # sheds, so the cap/precision trade needs re-measuring
            {"max_component": 4, "ladder": _L, "subsume": True,
             "evidence_min_size": 2},
            {"max_component": 5, "ladder": _L, "subsume": True,
             "evidence_min_size": 2},
            {"max_component": 6, "ladder": _L, "subsume": True,
             "evidence_min_size": 2},
        ]
        for knobs in grid:
            kw = {k: v for k, v in knobs.items() if k != "subsume"}
            if knobs["subsume"]:
                comp = subsumption_aware_components(matches, **kw)
            else:
                comp = refined_components(matches, **kw)
            entities = entity_table(comp, names)
            resolved = resolve_records(conv, entities, ["name"])
            m = pair_f1(spark, resolved, truth_path)
            print(json.dumps({**knobs, "ladder": list(knobs["ladder"]), **m}), flush=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
