"""Audit the singleton re-attach rule against ground truth.

Runs the pipeline ONCE on a bench fixture, then clusters the same scored
edges twice — ``singleton_attach`` on and off — and truth-labels every
name whose assignment the rule changed: an attach is CORRECT when the
name shares a truth entity with at least one member of the cluster it
joined.  Prints correct/wrong counts, the feature shape of wrong
attaches, and pair P/R/F1 under both variants.  Pure measurement.

Usage: python scripts/attach_audit.py [n_entities]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from name_matching_spark.functions.normalize import preprocess_name
    from name_matching_spark.operators.clustering import (
        subsumption_aware_components,
    )
    from name_matching_spark.operators.resolve import entity_table, resolve_records
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark
    from scripts.er_quality_at_scale import pair_f1

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n}")
    spark = get_spark(app_name="attach-audit", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))
    truth_path = os.path.join(fixture, "truth.parquet")
    truth = pd.read_parquet(truth_path)
    truth["name"] = truth["alias"].map(preprocess_name)
    n2e = truth.groupby("name")["entity_id"].agg(set).to_dict()

    wh = tempfile.mkdtemp(prefix="nms_attach_")
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
        kw = dict(
            max_component=5,
            ladder=(0.92, 0.96, 0.99, 0.995, 0.999),
            evidence_min_size=2,
        )
        comps = {}
        for variant in (False, True):
            comp = subsumption_aware_components(
                matches, singleton_attach=variant, **kw
            )
            comps[variant] = {
                r["name"]: r["component"] for r in comp.collect()
            }
            ent = entity_table(
                spark.createDataFrame(
                    sorted(comps[variant].items()), ["name", "component"]
                ),
                names,
            )
            resolved = resolve_records(conv, ent, ["name"])
            m = pair_f1(spark, resolved, truth_path)
            print(json.dumps({"singleton_attach": variant, **m}), flush=True)

        off, on = comps[False], comps[True]
        # cluster membership under ON
        members: dict = {}
        for nm, c in on.items():
            members.setdefault(c, []).append(nm)
        changed = [
            nm for nm in on
            if on[nm] != off.get(nm, nm) and off.get(nm, nm) == nm
        ]
        correct = wrong = unknown = 0
        wrong_rows = []
        for nm in changed:
            ex = n2e.get(nm)
            if not ex:
                unknown += 1
                continue
            tgt = [o for o in members.get(on[nm], []) if o != nm]
            hit = any(ex & n2e.get(o, set()) for o in tgt)
            if hit:
                correct += 1
            else:
                wrong += 1
                if len(wrong_rows) < 12:
                    wrong_rows.append((nm, on[nm], sorted(tgt)[:4]))
        print(json.dumps({
            "changed": len(changed), "correct": correct,
            "wrong": wrong, "unknown": unknown,
        }), flush=True)
        for nm, c, tgt in wrong_rows:
            print(f"WRONG {nm!r} -> {c!r} members~{tgt}")
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
