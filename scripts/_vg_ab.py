"""Ad-hoc A/B: glue-edge singleton vote off vs on (min-vote rule), same edges."""
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
    from name_matching_spark.operators.clustering import subsumption_aware_components
    from name_matching_spark.operators.resolve import entity_table, resolve_records
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark
    from scripts.er_quality_at_scale import pair_f1

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n}")
    spark = get_spark(app_name="vg-ab", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))
    truth_path = os.path.join(fixture, "truth.parquet")
    wh = tempfile.mkdtemp(prefix="nms_vgab_")
    try:
        pipe = EntityResolutionPipeline(spark, wh)
        stages = pipe.run(transcripts)
        conv = stages["conversations"].localCheckpoint()
        names = stages["names"].localCheckpoint()
        sp = stages["scored_pairs"]
        matches = (
            sp.where(F.col("prediction") == 1)
            .select(
                F.col("name_x").alias("src"),
                F.col("name_y").alias("dst"),
                "probability",
                "cosine_sim",
                "align_edit",
                "token_weakest_link",
                *(["margin"] if "margin" in sp.columns else []),
            )
            .localCheckpoint()
        )
        lad = (0.92, 0.96, 0.99, 0.995, 0.999, 0.9999, 0.99999)
        for vg in (False, True):
            comp = subsumption_aware_components(
                matches,
                max_component=4,
                ladder=lad,
                evidence_min_size=2,
                singleton_vote_glue=vg,
            )
            entities = entity_table(comp, names)
            resolved = resolve_records(conv, entities, ["name"])
            m = pair_f1(spark, resolved, truth_path)
            print(json.dumps({"n": n, "vg": vg, **m}), flush=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
