"""The DataSourceV2 `writeTo` / `read.table` checkpoint branch.

On a cluster with the Iceberg runtime jar + a configured catalog this
branch writes real Iceberg tables; the sandbox ships no Iceberg jar
(`iceberg_available` is the documented probe), so the same code path is
exercised against the built-in session catalog with the parquet provider —
the write/read/resume semantics are identical."""

import os

from pyspark.sql import functions as F

from name_matching_spark.io.checkpoint import CheckpointManager, iceberg_available


def test_iceberg_probe_documents_runtime(spark):
    # The sandbox has no iceberg-spark-runtime jar; on a real cluster this
    # flips to True and CheckpointManager defaults to the iceberg provider.
    assert iceberg_available(spark) is False


def test_catalog_table_checkpoint_roundtrip(spark, tmp_path):
    wh = str(tmp_path / "wh_cat")
    ckpt = CheckpointManager(
        spark, wh, table_format="catalog", namespace="default",
        table_provider="parquet",
    )
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )

    out = ckpt.stage("cat_stage", make, params={"p": 1})
    assert calls["n"] == 1
    assert out.count() == 10
    # stored through the catalog, readable via spark.read.table
    assert spark.read.table("default.cat_stage").count() == 10
    assert os.path.exists(ckpt.manifest_path("cat_stage"))

    # resume: no recompute
    again = ckpt.stage("cat_stage", make, params={"p": 1})
    assert calls["n"] == 1
    assert again.count() == 10

    # param change -> recompute through the same writeTo path (exercises
    # the replace/drop-create branch on a pre-existing table)
    ckpt.stage("cat_stage", make, params={"p": 2})
    assert calls["n"] == 2
    spark.sql("DROP TABLE IF EXISTS default.cat_stage")
