"""Shuffle-key skew diagnostics — measure before you salt.

The engine handles skew with explicit mechanisms (mega-cell salting in
operators/spatial.pip_join, AQE skew-join splits); this module provides the
MEASUREMENT side: per-key histograms and a scalar summary that recommends a
salt factor, so the hot-key threshold and salt count fed to pip_join (or any
salted join) come from observed data instead of guesses.

``skew_stats`` intentionally returns a small Python dict (a handful of
scalars) — it is a diagnostic run before a big job, not part of a data
plan. The histogram aggregation itself is a single map-side-combinable
groupBy; the summary is a second tiny aggregate over one row per key. At
10^9+ distinct keys replace the exact ``percentile`` with
``approx_percentile`` (same call shape, sketch-based) — the exact variant
is kept here because the oracle-able diagnostic must be deterministic.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., n) — exact per-key row counts."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def skew_stats(
    df: DataFrame, keys: list[str], target_rows_per_key: int | None = None
) -> dict:
    """Scalar skew summary of the would-be shuffle on ``keys``.

    Returns n_keys, total_rows, max_count, avg_count, p50/p99 counts,
    skew_ratio (max/avg) and, when ``target_rows_per_key`` is given, the
    salt factor that would spread the hottest key down to the target
    (ceil(max/target), 1 = no salting needed).
    """
    h = key_histogram(df, keys)
    row = h.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("max_count"),
        F.avg("n").alias("avg_count"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.99)").alias("p99"),
    ).collect()[0]
    out = {
        "n_keys": row["n_keys"],
        "total_rows": row["total_rows"],
        "max_count": row["max_count"],
        "avg_count": float(row["avg_count"]),
        "p50": float(row["p50"]),
        "p99": float(row["p99"]),
        "skew_ratio": float(row["max_count"]) / float(row["avg_count"]),
    }
    if target_rows_per_key is not None:
        out["suggested_salt"] = max(
            1, math.ceil(row["max_count"] / target_rows_per_key)
        )
    return out
