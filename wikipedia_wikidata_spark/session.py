"""SparkSession factory.

One place to set the configs that matter at 100 TB scale:
- AQE on (runtime re-plan, skew-join splitting) — replaces the reference's
  hand-tuned loop decomposition (steps/wikipedia_process.sh:52-71).
- Arrow on for all pandas-UDF exchange (input_hint: "no per-row Python").
- Shuffle partitions sized for the local test box; on a real cluster this is
  set per-job (or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wikipedia-wikidata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    aqe: bool = True,
) -> SparkSession:
    # master="" means "do not set": under spark-submit the master/deploy mode
    # come from the launcher (north_rule: spark-submit --py-files at N and 4N
    # executors) and must not be overridden here.
    if master != "":
        master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    if shuffle_partitions is None and master != "":
        # local[N] -> N; a real cluster would use 2-3x total cores or AQE.
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        try:
            shuffle_partitions = 32 if n == "*" else max(8, int(n))
        except ValueError:
            shuffle_partitions = 32
    builder = SparkSession.builder.appName(app_name)
    if master != "":
        builder = builder.master(master)
    if shuffle_partitions is not None:
        # Under spark-submit (master="") the launcher's --conf wins: setting
        # a single-node default of 32 here would silently pin a real cluster
        # to 32 shuffle partitions. Only set when derived from an explicit
        # local master or passed explicitly by the caller.
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    builder = (
        builder
        # AQE defaults ON (runtime re-plan + skew split for real-scale
        # partitions). The bench turns it off for its timed job: with
        # sub-second stages AQE's stage-at-a-time driver round trips are
        # pure serial latency (~8s of a 14s job at sf1), and skew there is
        # handled by explicit salting (operators/spatial.py).
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # test corpora are single smallish files: split scans finely so every
        # core gets work (row groups in the corpus are 16k rows)
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
    )
    return builder.getOrCreate()
