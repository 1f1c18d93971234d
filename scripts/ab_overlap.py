"""Interleaved A/B of the tfidf/blocking overlap inside ONE warm session.

A = overlap_tfidf=True (worker-thread fit), B = False (sequential).
Fresh warehouse per run (no checkpoint reuse).  Prints per-rep wall
times and the min/median per variant.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("AB_REPS", "5"))


def main() -> None:
    from name_matching_spark.datagen import write_fixture
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark

    spark = get_spark(
        app_name="ab-overlap", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS
    )
    n_entities = 1000
    fixture = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        f"bench_transcripts_e{n_entities}",
    )
    if not os.path.exists(os.path.join(fixture, "transcripts.parquet")):
        write_fixture(fixture, n_entities=n_entities, convs_per_entity=5, seed=42)
    transcripts = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))

    def one(overlap: bool) -> tuple[float, float]:
        wh = tempfile.mkdtemp(prefix="nms_ab_")
        try:
            t0 = time.time()
            pipe = EntityResolutionPipeline(spark, wh, overlap_tfidf=overlap)
            stages = pipe.run(transcripts)
            stages["entities"].select("entity_key").distinct().count()
            total = time.time() - t0
            # the tfidf+blocking WINDOW = total minus every stage outside it
            # (noise in scorer/clustering stages cancels out of the A/B)
            rest = sum(
                pipe.timings.get(k, 0.0)
                for k in (
                    "conversations",
                    "names",
                    "scored_pairs",
                    "components",
                    "entities",
                    "resolved_conversations",
                )
            )
            return total, total - rest
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    one(True)  # warm lap, untimed
    a: list[tuple[float, float]] = []
    b: list[tuple[float, float]] = []
    for i in range(REPS):
        b.append(one(False))
        a.append(one(True))
        print(
            f"rep {i}: B={b[-1][0]:.2f} (win {b[-1][1]:.2f})"
            f"  A={a[-1][0]:.2f} (win {a[-1][1]:.2f})",
            flush=True,
        )
    for tag, xs in (("A(overlap)", a), ("B(seq)    ", b)):
        tot = [x[0] for x in xs]
        win = [x[1] for x in xs]
        print(
            f"{tag}: total min={min(tot):.2f} med={statistics.median(tot):.2f} | "
            f"window min={min(win):.2f} med={statistics.median(win):.2f} "
            f"{sorted(round(x, 2) for x in win)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
