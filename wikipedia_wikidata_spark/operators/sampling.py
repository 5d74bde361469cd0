"""Deterministic sampling operators for training-data pipelines.

Task-level RNG sampling (``df.sample()``) is NOT stable under retries,
resumes, or repartitioning — a re-run of a failed task can emit a different
row subset, which breaks exactly the resumable-pipeline contract the catalog
provides. Both operators here derive the keep/drop decision from a
CONTENT-keyed hash (the md5-prefix hash60 primitive shared with the dedup
family), so the same row set survives any execution plan, any retry, and is
reproducible by the DuckDB oracle bit-for-bit.

Scale notes:
- ``hash_sample`` is a pure narrow filter — no shuffle, survives predicate
  pushdown next to other filters, cost O(rows) regardless of fraction.
- ``stratified_sample`` shuffles once on the strata columns; the per-stratum
  window is the standard top-k shape (rank by hash, keep <= cap). Skew is
  bounded by the largest stratum; for mega-strata at 10^9 rows, pre-truncate
  per partition first (each input partition can contribute at most ``cap``
  survivors, so a partial window per partition before the global one caps
  the shuffled volume at n_partitions*cap rows per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import hash60_col

SAMPLE_MOD = 1_000_000
DEFAULT_SEED = 42


def _sample_hash(key_col: str, seed: int):
    return hash60_col(
        F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = DEFAULT_SEED
) -> DataFrame:
    """Keep rows where hash60(seed:key) mod 1e6 < round(fraction*1e6) — a
    deterministic, retry/resume-stable Bernoulli sample keyed on content.
    round(), not int(): float truncation turns 0.3*1e6 into 299999 and the
    Spark predicate silently diverges from a hand-written oracle threshold
    (int(0.3 * 1e6) == 299999 on binary floats)."""
    return df.filter(
        F.pmod(_sample_hash(key_col, seed), F.lit(SAMPLE_MOD))
        < int(round(fraction * SAMPLE_MOD))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    cap: int,
    key_col: str,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """At most ``cap`` rows per stratum, chosen by deterministic hash order
    (tie-broken by the key itself) — balanced class downsampling whose
    output is independent of partitioning and retries."""
    h = _sample_hash(key_col, seed)
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
