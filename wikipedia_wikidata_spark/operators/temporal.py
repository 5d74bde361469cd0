"""As-of (point-in-time) join — an operator vanilla Spark lacks.

For each left row, attach the LATEST right row with right.ts <= left.ts for
the same key. The naive formulation is a range join (l.ts >= r.ts) that
Catalyst plans as a per-key cartesian then a max — quadratic per key. This
implementation is the scale-correct union-sort-fill composition:

  tag both inputs -> unionByName -> one window per key ordered by
  (ts, side) -> last_value(right attrs, ignorenulls) carries the most
  recent right values forward -> keep left rows.

Cost: ONE shuffle on the key (the window), zero join explosion — per-key
work is a sort, exactly what an as-of merge needs. Ties (right.ts ==
left.ts) order the right row first, giving <= semantics, which matches
DuckDB's native ASOF JOIN used as the oracle in tests/test_sources.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + latest right ``value_cols`` as of each left row's ``ts``.

    right must contain (key, ts, *value_cols); appended columns are named
    ``asof_<col>`` (NULL when no right row precedes the left row)."""
    r = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"asof_{c}") for c in value_cols],
    )
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(
            f"asof_{c}", F.last(f"asof_{c}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("_side") == 1).drop("_side")
