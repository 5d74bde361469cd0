"""Hypertable-style incremental rollup (continuous aggregate).

A daily aggregate over the events stream, maintained INCREMENTALLY: each
refresh fingerprints the input per day (count + order-insensitive hash),
recomputes only the days whose fingerprint changed since the last committed
snapshot, and carries every unchanged day's rows forward from that snapshot
— then commits the merged result as a new catalog version (time travel
included). At 100 TB this is the difference between touching yesterday's
partition and re-aggregating years of history; the reference's closest
analog is its skip-completed-download resume (steps/wikipedia_download.sh:
22-25), which this generalizes to data-content granularity.

All bookkeeping is relational: the day fingerprints are a tiny aggregate
stored in the snapshot manifest, the changed-day set is a driver-side dict
diff over ~10^3 days, and the merge is a partition-pruned read of the
previous snapshot union the recomputed days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog


def _with_day(events: DataFrame) -> DataFrame:
    return events.withColumn("day", F.to_date(F.col("ts")))


def day_digests(events: DataFrame) -> dict[str, list]:
    """Per-day input fingerprint: row count + commutative xor-style hash
    (sum of xxhash64 in a bigint column tolerates any row order/partitioning)."""
    # pmod before the SUM keeps each term < 2^31 so ~10^9 rows/day cannot
    # overflow the ANSI long sum (raw xxhash64 sums overflow immediately)
    h = F.pmod(
        F.xxhash64("event_id", "ts", "user_id", "event_type", "value"),
        F.lit(2147483647),
    )
    rows = (
        _with_day(events)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(h).alias("h"))
        .collect()
    )
    return {str(r.day): [int(r.n), int(r.h)] for r in rows}


def daily_rollup(events: DataFrame) -> DataFrame:
    """The aggregate itself: per (day, event_type) counts/sums/users."""
    return (
        _with_day(events)
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.sum("value") * 1000000.0 + 0.5).cast("bigint").alias("value_sum_e6"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def refresh_rollup(
    spark: SparkSession, events: DataFrame, cat: Catalog, name: str, run_id: str
) -> dict:
    """Incrementally refresh the rollup table ``name`` in ``cat``.

    Returns the commit manifest, extended with:
      changed_days   — days recomputed this refresh
      carried_days   — days carried forward from the previous snapshot
    """
    digests = day_digests(events)
    prev = cat.latest_complete(name)
    prev_digests: dict[str, list] = (prev or {}).get("day_digests", {})
    changed = sorted(
        d for d in digests if digests[d] != prev_digests.get(d)
    )
    removed = sorted(d for d in prev_digests if d not in digests)
    carried = sorted(d for d in digests if d not in changed)

    recomputed = daily_rollup(
        _with_day(events).filter(F.col("day").isin([*changed]))
        if changed
        else _with_day(events).filter(F.lit(False))
    )
    if prev and carried:
        old = cat.read(spark, name, version=prev["version"]).filter(
            F.col("day").isin([*carried])  # partition-pruned (day-partitioned)
        )
        merged = old.unionByName(recomputed)
    else:
        merged = recomputed
    manifest = cat.write(
        spark,
        merged,
        name,
        fingerprint=f"rollup:{len(digests)}d",
        run_id=run_id,
        partition_by=["day"],
    )
    manifest["day_digests"] = digests
    manifest["changed_days"] = changed
    manifest["carried_days"] = carried
    manifest["removed_days"] = removed
    # persist the extended manifest (digests ride with the snapshot) —
    # tmp + os.replace, same atomicity as Catalog.write's pointer swap: a
    # kill mid-write must never leave truncated JSON that poisons every
    # later snapshots()/latest_complete()/refresh (the crash-resume
    # scenario the catalog exists for)
    import json
    import os

    for p in (
        os.path.join(cat.path(name), f"v{manifest['version']:05d}", "_manifest.json"),
        os.path.join(cat.path(name), "_manifest.json"),
    ):
        ptmp = p + ".tmp"
        with open(ptmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(ptmp, p)
    return manifest
