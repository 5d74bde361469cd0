#!/usr/bin/env python3
"""Per-phase scaling profile of the north-star spatial job.

Runs the SAME phases as bench.spatial_job but with a timer (and a forced
materialization boundary) around each phase, in a fresh taskset-pinned
subprocess per parallelism level, and prints per-phase seconds at each
width plus per-phase 2->8 efficiency. Diagnostic only — the official
record stays `python bench.py --scaling` (no phase barriers there).

Usage: python BENCH/phase_profile.py [n_lo,n_hi] [sf_dir]
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_phases(master: str, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from wikipedia_wikidata_spark.functions.cells import (
        make_cell_udf, make_morton_udf,
    )
    from wikipedia_wikidata_spark.operators.spatial import (
        knn_nearest, knn_release, pip_join,
    )
    from wikipedia_wikidata_spark.operators.tiles import tile_importance
    from wikipedia_wikidata_spark.plans.importance import build_scored
    from wikipedia_wikidata_spark.session import get_spark

    parts = int(os.environ.get("SPARK_GRAFT_SCALING_PARTS", "192"))
    spark = get_spark("wws-phase", master=master,
                      shuffle_partitions=parts, aqe=False)
    phases: dict[str, float] = {}
    try:
        # warm codegen/UDF workers exactly like the scaling leg
        from bench import spatial_job
        spatial_job(spark, "/root/testdata/sf0.001")

        # Phases are the official job's own sequential driver calls — no
        # extra materialization barrier (a first version _noop'd the ep
        # persist separately; that added a whole extra pass and distorted
        # both totals and ratios). build_scored eagerly writes the
        # spans_flat + scored checkpoints, so timing the call isolates the
        # checkpoint/ETL stage; ep materializes inside the pip phase
        # exactly as in bench.spatial_job.
        t0 = time.time()
        sc, v = build_scored(spark, sf_dir)
        phases["checkpoints"] = round(time.time() - t0, 2)

        t0 = time.time()
        ep = sc.filter(
            F.col("wd_page_title").isNotNull() & F.col("lat").isNotNull()
        ).select(
            "language", "title", F.col("wd_page_title").alias("wikidata_id"),
            "lat", "lon", "importance",
        )
        ep = ep.withColumn("cell_r7", make_cell_udf(7)(F.col("lat"), F.col("lon")))
        ep = ep.withColumn("s2", make_morton_udf()(F.col("lat"), F.col("lon")))
        ep.persist()
        _noop(pip_join(ep, v["polygons"].select("item", "verts"), res=5))
        phases["pip_join_ep"] = round(time.time() - t0, 2)

        t0 = time.time()
        places = v["wikidata_places"].filter(
            F.col("lat").isNotNull()).select("item", "lat", "lon")
        places.persist()
        knn = knn_nearest(ep, places)
        _noop(knn)
        knn_release(knn)
        places.unpersist()
        phases["knn"] = round(time.time() - t0, 2)

        t0 = time.time()
        _noop(tile_importance(ep))
        phases["tiles"] = round(time.time() - t0, 2)
        ep.unpersist()
        phases["total"] = round(sum(phases.values()), 2)
        return phases
    finally:
        spark.stop()


def main():
    pair = sys.argv[1] if len(sys.argv) > 1 else "2,8"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf4"
    if "--phases-only" in sys.argv:
        master = sys.argv[sys.argv.index("--phases-only") + 1]
        print(json.dumps(run_phases(master, sf_dir)))
        return
    n_lo, n_hi = (int(x) for x in pair.split(","))
    out = {}
    for n in (n_lo, n_hi):
        cmd = [sys.executable, __file__, pair, sf_dir, "--phases-only",
               f"local[{n}]"]
        if shutil.which("taskset"):
            total = os.cpu_count() or 32
            cmd = ["taskset", "-c", f"{total - n}-{total - 1}"] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, check=True)
        out[f"local[{n}]"] = json.loads(r.stdout.strip().splitlines()[-1])
    lo, hi = out[f"local[{n_lo}]"], out[f"local[{n_hi}]"]
    out["efficiency"] = {
        k: round((lo[k] / hi[k]) / (n_hi / n_lo), 3)
        for k in lo if hi.get(k)
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
