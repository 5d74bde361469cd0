"""Iceberg-style table catalog emulated on partitioned Parquet + JSON
manifests (SURVEY.md §7.1: no Iceberg jars in the sandbox; the interface keeps
a real Iceberg catalog drop-in-able via --packages on a cluster).

Each table directory holds versioned snapshot dirs (``v00001``, ``v00002``,
…) plus ``_manifest.json`` (latest) and ``_current.json`` (the snapshot
pointer). Every manifest records: stage name, input fingerprint, row count,
wall-clock, run id, and PER-PARTITION lineage (file -> rows) — the
north_rule's "resumable from checkpoint with per-partition lineage +
metrics". Commits are atomic (write-to-tmp + rename, then pointer swap); a
killed job leaves no half-visible snapshot, and earlier snapshots stay
readable (``read(..., version=k)`` = Iceberg ``VERSION AS OF``).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Orphaned-commit tmp dirs older than this are reclaimed by the next write;
# younger ones may belong to a live concurrent writer.
TMP_GC_AGE_S = 6 * 3600


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

    def _current(self, name: str) -> dict | None:
        try:
            with open(os.path.join(self.path(name), "_current.json")) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def current_version(self, name: str) -> int | None:
        cur = self._current(name)
        return cur["version"] if cur else None

    def snapshots(self, name: str) -> list[dict]:
        """All committed snapshots of a table (version, rows, run_id, ...).

        Strict ``vNNNNN`` match: a commit killed between the in-dir manifest
        write and the os.rename leaves a ``vNNNNN.tmp-<hex>/`` orphan that
        contains a _manifest.json — it must not be listed (and int('NNNNN.tmp'
        ...) must not crash the listing after exactly the crash the catalog is
        designed to survive)."""
        out = []
        root = self.path(name)
        if not os.path.isdir(root):
            return out
        # 5+ digits: f"v{version:05d}" grows to 6 digits past 99,999 commits;
        # sort NUMERICALLY (lexicographic order breaks at the width change:
        # 'v100000' < 'v99999')
        vdirs = [d for d in os.listdir(root) if re.fullmatch(r"v\d{5,}", d)]
        for d in sorted(vdirs, key=lambda d: int(d[1:])):
            mp = os.path.join(root, d, "_manifest.json")
            if os.path.isfile(mp):
                # tolerate a truncated/unreadable manifest (crash mid-write
                # of an auxiliary rewrite): skip the snapshot rather than
                # poison every future listing with JSONDecodeError
                try:
                    with open(mp) as f:
                        m = json.load(f)
                except (json.JSONDecodeError, OSError):
                    continue
                m["version"] = int(d[1:])
                out.append(m)
        return out

    def latest_complete(self, name: str, predicate=None) -> dict | None:
        """Newest COMMITTED snapshot, optionally filtered by a manifest
        predicate — the catalog analog of the reference's 'latest complete
        dump' selection (steps/latest_available_data.sh:54-143 probes dump
        dates newest-first and picks the first whose every artifact exists;
        here the manifest IS the completeness record, so the probe is a
        reverse scan over committed manifests)."""
        for m in reversed(self.snapshots(name)):
            if m.get("status") == "committed" and (predicate is None or predicate(m)):
                return m
        return None

    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        """Read a table snapshot; ``version`` = Iceberg VERSION AS OF (None
        = current)."""
        if version is None:
            cur = self._current(name)
            if cur is None:  # pre-versioning layout: data at table root
                return spark.read.parquet(self.path(name))
            version = cur["version"]
        return spark.read.parquet(os.path.join(self.path(name), f"v{version:05d}"))

    def write(
        self,
        spark: SparkSession,
        df: DataFrame,
        name: str,
        fingerprint: str,
        run_id: str,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Atomic snapshot commit with per-partition lineage; earlier
        snapshots remain readable (time travel)."""
        t0 = time.time()
        root = self.path(name)
        os.makedirs(root, exist_ok=True)
        # garbage-collect tmp dirs orphaned by a previously KILLED commit —
        # age-gated so a concurrent writer's in-flight tmp dir (uuid-named,
        # actively being written) is never deleted from under it. Age = the
        # NEWEST mtime anywhere under the dir: Spark streams task files into
        # nested _temporary/ attempt dirs without touching the top-level
        # mtime, so a long-running live write keeps its recursive mtime
        # fresh while a killed one goes stale everywhere.
        now = time.time()
        for d in os.listdir(root):
            if ".tmp-" not in d:
                continue
            p = os.path.join(root, d)
            newest = 0.0
            try:
                for dirpath, _dirs, files in os.walk(p):
                    newest = max(newest, os.path.getmtime(dirpath))
                    for fn in files:
                        try:
                            newest = max(
                                newest,
                                os.path.getmtime(os.path.join(dirpath, fn)),
                            )
                        except OSError:
                            pass
            except OSError:
                continue
            if now - newest > TMP_GC_AGE_S:
                shutil.rmtree(p, ignore_errors=True)
        cur = self._current(name)
        version = (cur["version"] + 1) if cur else 1
        vdir = os.path.join(root, f"v{version:05d}")
        tmp = vdir + ".tmp-" + uuid.uuid4().hex[:8]
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
            "version": version,
            "rows": rows,
            "n_partitions": len(lineage),
            "wall_ms": int((time.time() - t0) * 1000),
            "partitions": sorted(lineage, key=lambda p: p["file"]),
        }
        with open(os.path.join(tmp, "_manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
        os.rename(tmp, vdir)
        # snapshot pointer + latest-manifest swap (os.replace = atomic)
        for fname, payload in (
            ("_current.json", {"version": version}),
            ("_manifest.json", manifest),
        ):
            ptmp = os.path.join(root, fname + ".tmp")
            with open(ptmp, "w") as f:
                json.dump(payload, f, indent=1)
            os.replace(ptmp, os.path.join(root, fname))
        return manifest

    def drop(self, name: str) -> None:
        if os.path.exists(self.path(name)):
            shutil.rmtree(self.path(name))
