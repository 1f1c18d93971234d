"""Diagnose WHERE cluster precision is lost at fixture scale.

Runs the pipeline on a bench fixture, labels every match edge
(prediction==1) with ground truth (same-entity vs cross-entity), and
reports: FP edge rate, probability histogram of FP vs TP edges, cluster
size/purity distribution, and the top mixed clusters with their gluing
edges + feature values.  Pure measurement — no product code touched.

Usage: python scripts/debug_merge_analysis.py [n_entities]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from name_matching_spark.functions.normalize import preprocess_name
    from name_matching_spark.pipeline import EntityResolutionPipeline
    from name_matching_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    fixture = os.path.join(REPO, "data", f"bench_transcripts_e{n}")
    spark = get_spark(app_name="merge-debug", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(os.path.join(fixture, "transcripts.parquet"))
    truth = spark.read.parquet(os.path.join(fixture, "truth.parquet"))

    # normalized alias -> set of entity_ids (an alias CAN belong to several)
    import pandas as pd

    tp = truth.select("entity_id", "alias").toPandas()
    tp["name"] = tp["alias"].map(preprocess_name)
    name2ents = tp.groupby("name")["entity_id"].agg(set).to_dict()

    wh = tempfile.mkdtemp(prefix="nms_dbg_")
    try:
        pipe = EntityResolutionPipeline(spark, wh, keep_features=True)
        stages = pipe.run(transcripts)
        scored = stages["scored_pairs"].where(F.col("prediction") == 1)
        edges = scored.toPandas()
        print(f"match edges: {len(edges)}")

        def edge_label(r):
            ex = name2ents.get(r["name_x"], set())
            ey = name2ents.get(r["name_y"], set())
            return bool(ex & ey)

        edges["tp"] = edges.apply(edge_label, axis=1)
        n_tp = int(edges["tp"].sum())
        print(f"TP edges: {n_tp}  FP edges: {len(edges) - n_tp}  "
              f"FP rate: {(len(edges) - n_tp) / max(len(edges), 1):.3f}")
        # probability deciles for FP vs TP
        import numpy as np

        for lab, grp in edges.groupby("tp"):
            qs = np.percentile(grp["probability"], [50, 75, 90, 99])
            print(f"  {'TP' if lab else 'FP'} prob p50/p75/p90/p99: "
                  + "/".join(f"{q:.3f}" for q in qs))
        # FP edges by probability band
        bands = [(0.85, 0.90), (0.90, 0.95), (0.95, 0.99), (0.99, 1.01)]
        for lo, hi in bands:
            sel = edges[(edges.probability >= lo) & (edges.probability < hi)]
            fp = int((~sel["tp"]).sum())
            print(f"  band [{lo},{hi}): {len(sel)} edges, {fp} FP "
                  f"({fp / max(len(sel), 1):.3f})")
        # feature medians for FP vs TP
        featcols = [c for c in edges.columns
                    if c not in ("name_x", "name_y", "probability", "prediction",
                                 "match_label", "tp")]
        med = edges.groupby("tp")[featcols].median().T
        med.columns = ["FP_median", "TP_median"]
        print(med.round(3).to_string())

        # cluster purity
        comp = stages["components"].toPandas()
        comp["ents"] = comp["name"].map(lambda x: name2ents.get(x, set()))
        purity = []
        for lab, grp in comp.groupby("component"):
            allents = set().union(*grp["ents"]) if len(grp) else set()
            purity.append((lab, len(grp), len(allents)))
        pur = pd.DataFrame(purity, columns=["component", "n_names", "n_entities"])
        print("\ncluster size dist:")
        print(pur["n_names"].describe().round(2).to_string())
        mixed = pur[pur.n_entities > 1].sort_values("n_names", ascending=False)
        print(f"\nmixed clusters: {len(mixed)} / {len(pur)} "
              f"({len(mixed) / max(len(pur), 1):.3f})")
        print(mixed.head(10).to_string())
        # worst cluster: show members + their entity sets
        if len(mixed):
            worst = mixed.iloc[0]["component"]
            mem = comp[comp.component == worst][["name", "ents"]]
            print(f"\nworst cluster ({worst}): {len(mem)} names")
            print(mem.head(30).to_string())
            # its internal FP edges
            names = set(mem["name"])
            internal = edges[edges.name_x.isin(names) & edges.name_y.isin(names)]
            fp_int = internal[~internal.tp].sort_values("probability", ascending=False)
            show = ["name_x", "name_y", "probability", "cosine_sim", "ratio",
                    "token_set_ratio", "core_ratio", "token_weakest_link"]
            print(f"internal FP edges: {len(fp_int)} / {len(internal)}")
            print(fp_int.head(20)[show].to_string())
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
