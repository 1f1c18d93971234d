"""Stage checkpointing with manifests, per-partition lineage and metrics.

Every pipeline stage writes its output table plus a ``_MANIFEST.json``
recording row counts, per-partition lineage, timing, and upstream stage
manifests.  A rerun finds a complete manifest and **resumes** from the
stored table instead of recomputing — the resumability the north rule
demands.  Metrics accumulate in ``<warehouse>/_metrics`` (one row per
stage per run).

The storage layer is parquet-on-directory with the same write-once,
snapshot-complete semantics an Iceberg catalog would give (manifest file =
commit marker).  On a cluster with an Iceberg catalog the ``_write``/
``_read`` pair swaps for ``df.writeTo(table).createOrReplace()`` /
``spark.read.table(table)`` with no other changes — the sandbox ships no
Iceberg runtime jar, so the file layout stands in.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for the Iceberg Spark runtime on the JVM classpath.  The
    sandbox ships none (this returns False there — test-documented); a
    cluster with ``iceberg-spark-runtime`` on the classpath and a catalog
    configured flips the CheckpointManager to real catalog tables."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class CheckpointManager:
    """``table_format="parquet"`` (default) stores each stage as a parquet
    directory; ``table_format="catalog"`` stores it through the DataSourceV2
    ``df.writeTo(...)`` / ``spark.read.table(...)`` path — with an Iceberg
    catalog that is a real Iceberg table, and the same code runs against the
    session catalog with ``table_provider="parquet"`` (how the sandbox tests
    exercise the branch).  Manifests live in the warehouse dir either way."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        run_id: str | None = None,
        table_format: str = "parquet",
        namespace: str = "default",
        table_provider: str | None = None,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.table_format = table_format
        self.namespace = namespace
        # Iceberg catalogs imply the iceberg provider; the session catalog
        # (the jar-less fallback) needs an explicit file provider.
        self.table_provider = table_provider or (
            "iceberg" if iceberg_available(spark) else "parquet"
        )
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------------

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _table_ident(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def manifest_path(self, name: str) -> str:
        if self.table_format == "catalog":
            return os.path.join(self.warehouse, f"{name}.{MANIFEST}")
        return os.path.join(self._stage_dir(name), MANIFEST)

    def is_complete(self, name: str) -> bool:
        return os.path.exists(self.manifest_path(name))

    def read(self, name: str) -> DataFrame:
        if self.table_format == "catalog":
            return self.spark.read.table(self._table_ident(name))
        return self.spark.read.parquet(self._stage_dir(name))

    def _write(self, out: DataFrame, name: str) -> None:
        if self.table_format == "catalog":
            writer = out.writeTo(self._table_ident(name)).using(self.table_provider)
            try:
                writer.createOrReplace()
            except Exception:
                # V1 session catalog (no Iceberg jar) rejects REPLACE TABLE;
                # drop + create gives the same write-once snapshot semantics.
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {self._table_ident(name)}"
                )
                writer.create()
        else:
            out.write.mode("overwrite").parquet(self._stage_dir(name))

    def stored_rows(self, name: str) -> int | None:
        """Row count recorded in a completed stage's manifest (None when
        the stage has no manifest).  Lets consumers reuse the count the
        checkpoint already paid for instead of running another job."""
        try:
            with open(self.manifest_path(name)) as f:
                rows = json.load(f).get("rows")
            return int(rows) if rows is not None else None
        except Exception:
            return None

    def _stored_params(self, name: str):
        try:
            with open(self.manifest_path(name)) as f:
                return json.load(f).get("params")
        except Exception:
            return None

    # -- the stage runner ------------------------------------------------------

    def stage(
        self,
        name: str,
        fn,
        inputs: list[str] | None = None,
        force: bool = False,
        params: dict | None = None,
    ) -> DataFrame:
        """Run ``fn() -> DataFrame`` checkpointed under ``name``.

        If a complete manifest exists (and not ``force``), the stored table
        is returned without recomputation — but only when the recorded
        ``params`` (stage configuration + input fingerprint) match the
        current ones: rerunning into an existing warehouse with a different
        threshold or a different input table must recompute, not silently
        serve results produced under the old configuration.
        """
        if self.is_complete(name) and not force:
            stored = self._stored_params(name)
            current = json.loads(json.dumps(params)) if params is not None else None
            if params is None or stored == current:
                return self.read(name)
        t0 = time.time()
        out = fn()
        self._write(out, name)
        stored = self.read(name)
        part_counts = self._partition_lineage(stored, name)
        rows = sum(p["rows"] for p in part_counts)
        manifest = {
            "stage": name,
            "run_id": self.run_id,
            "rows": rows,
            "partitions": part_counts,
            "inputs": inputs or [],
            "params": params,
            "schema": stored.schema.jsonValue(),
            "duration_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self.manifest_path(name), "w") as f:
            json.dump(manifest, f)
        self._append_metric(name, rows, manifest["duration_sec"])
        return stored

    def _partition_lineage(self, stored: DataFrame, name: str) -> list[dict]:
        """Row count per physical partition of the stored stage table.

        For the parquet layout the counts come straight from the parquet
        FOOTERS (one metadata read per part file, no Spark job) — the
        write just produced exactly one file per output partition, so the
        lineage is identical to the old ``groupBy(spark_partition_id)``
        job minus one full read-back of every stage per pipeline run
        (guide §1.2: don't recompute what the storage layer already
        knows).  The catalog layout keeps the job: table files are the
        catalog's concern there."""
        if self.table_format != "catalog":
            try:
                import glob

                import pyarrow.parquet as pq

                files = sorted(
                    glob.glob(os.path.join(self._stage_dir(name), "part-*"))
                )
                return [
                    {
                        "partition": i,
                        "rows": int(pq.ParquetFile(f).metadata.num_rows),
                    }
                    for i, f in enumerate(files)
                ]
            except Exception:
                pass  # fall back to the Spark job below
        return [
            {"partition": int(r["pid"]), "rows": int(r["rows"])}
            for r in stored.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        ]

    def _append_metric(self, stage: str, rows: int, duration: float) -> None:
        mdir = os.path.join(self.warehouse, "_metrics")
        os.makedirs(mdir, exist_ok=True)
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "rows": rows,
            "duration_sec": duration,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(os.path.join(mdir, f"{self.run_id}_{stage}.json"), "w") as f:
            json.dump(rec, f)

    def metrics(self) -> list[dict]:
        mdir = os.path.join(self.warehouse, "_metrics")
        if not os.path.isdir(mdir):
            return []
        out = []
        for fn in sorted(os.listdir(mdir)):
            with open(os.path.join(mdir, fn)) as f:
                out.append(json.load(f))
        return out
