"""Iceberg-style table catalog emulated on partitioned Parquet + JSON
manifests (SURVEY.md §7.1: no Iceberg jars in the sandbox; the interface keeps
a real Iceberg catalog drop-in-able via --packages on a cluster).

Each table directory holds the parquet files plus ``_manifest.json``:
stage name, input fingerprint, row count, wall-clock, run id, and
PER-PARTITION lineage (file -> rows) — the north_rule's "resumable from
checkpoint with per-partition lineage + metrics". Commits are atomic via
write-to-tmp + rename; a killed job leaves no half-visible table.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.path(name), "_manifest.json")

    def manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def is_complete(self, name: str, fingerprint: str) -> bool:
        m = self.manifest(name)
        return bool(m) and m.get("fingerprint") == fingerprint and m.get("status") == "committed"

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self.path(name))

    def write(
        self,
        spark: SparkSession,
        df: DataFrame,
        name: str,
        fingerprint: str,
        run_id: str,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Atomic checkpoint commit with per-partition lineage."""
        t0 = time.time()
        final = self.path(name)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        # lineage: per-written-file row counts (partition granularity)
        back = spark.read.parquet(tmp)
        lineage = [
            {"file": os.path.basename(r["file"]), "rows": r["rows"]}
            for r in back.groupBy(F.input_file_name().alias("file"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        rows = sum(p["rows"] for p in lineage)
        manifest = {
            "stage": name,
            "fingerprint": fingerprint,
            "run_id": run_id,
            "status": "committed",
            "rows": rows,
            "n_partitions": len(lineage),
            "wall_ms": int((time.time() - t0) * 1000),
            "partitions": sorted(lineage, key=lambda p: p["file"]),
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return manifest

    def drop(self, name: str) -> None:
        if os.path.exists(self.path(name)):
            shutil.rmtree(self.path(name))
