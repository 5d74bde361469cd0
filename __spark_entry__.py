"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship importance pipeline on the sf0.001 interleaved corpus.
queries()     — one callable per implemented operator (SURVEY.md §2).
oracle_sql()  — matching DuckDB SQL; runs on the same parquet bytes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: documents -> wikimedia_importance rows (sorted sink
    order of steps/output.sh:113-123) at sf0.001."""
    from wikipedia_wikidata_spark.plans.importance import run_importance_sorted

    return run_importance_sorted(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wikipedia_wikidata_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from wikipedia_wikidata_spark.queries import get_oracle_sql

    return get_oracle_sql()
