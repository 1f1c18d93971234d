"""Second-decade ER-pipeline scale run: the flagship blocking -> scoring ->
clustering flow on a 10x-entities transcript fixture (100k entities /
500k conversations vs the sf1 bench's 10k/50k), same machine, local[32].

Prints one JSON line with stage timings, pair counts, and throughput so
the growth vs the sf1-bench fixture can be recorded in BENCH/SF10.md.
Usage: python scripts/er_scale_run.py [n_entities]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")


def main() -> None:
    from name_matching_spark.datagen import write_fixture
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark

    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n_entities}")
    if not os.path.exists(os.path.join(fixture, "transcripts.parquet")):
        t0 = time.time()
        write_fixture(fixture, n_entities=n_entities, convs_per_entity=5, seed=42)
        print(f"fixture generated in {time.time() - t0:.1f}s", flush=True)

    spark = get_spark(
        app_name="er-scale", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))
    wh = tempfile.mkdtemp(prefix="nms_er_scale_")
    try:
        t0 = time.time()
        pipe = EntityResolutionPipeline(spark, wh)
        stages = pipe.run(transcripts)
        n_out = stages["entities"].select("entity_key").distinct().count()
        total = time.time() - t0
        pairs = pipe.ckpt.read("scored_pairs").count()
        score_sec = max(pipe.timings.get("scored_pairs", total), 1e-9)
        print(
            json.dumps(
                {
                    "n_entities_in": n_entities,
                    "n_conversations": transcripts.select("conv_id").distinct().count(),
                    "total_sec": round(total, 1),
                    "stages": pipe.timings,
                    "pairs_scored": pairs,
                    "pairs_per_sec_scoring": round(pairs / score_sec, 1),
                    "entities_out": n_out,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
