#!/usr/bin/env python3
"""spark-submit entrypoint for the staged, resumable pipeline (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage:
    python -m zipfile -c /tmp/wws.zip wikipedia_wikidata_spark
    spark-submit --master <cluster> --py-files /tmp/wws.zip \
        submit_pipeline.py --sf-dir /root/testdata/sf0.01 --out /tmp/wws_ckpt

Master, executor count, and memory come from spark-submit (the N-vs-4N
scaling runs differ ONLY in the launcher flags); the script never overrides
them. Prints one JSON line per stage: rows, partitions, wall_ms, skipped —
the per-partition lineage lives in each stage's _manifest.json (resume =
re-running the same command; completed stages are skipped by fingerprint).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True, help="checkpoint catalog root")
    args = ap.parse_args()

    from wikipedia_wikidata_spark.plans.pipeline import run_pipeline
    from wikipedia_wikidata_spark.session import get_spark

    spark = get_spark("wws-pipeline", master="")  # master from spark-submit
    try:
        report = run_pipeline(spark, args.sf_dir, args.out)
        for stage, m in report.items():
            print(json.dumps({
                "stage": stage,
                "rows": m.get("rows"),
                "n_partitions": m.get("n_partitions"),
                "wall_ms": m.get("wall_ms"),
                "skipped": m.get("skipped"),
            }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
