"""Physical-plan quality checks (the 100-TB design criteria) + TSV sink."""

import re

from pyspark.sql import functions as F

from wikipedia_wikidata_spark.plans.importance import run_importance
from wikipedia_wikidata_spark.plans.pipeline import run_pipeline
from wikipedia_wikidata_spark.sinks import read_importance_tsv, write_importance_tsv
from wikipedia_wikidata_spark.sources.catalog import Catalog

from .conftest import SF_DIR_SMALL


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_driver_table_scan_pushdown(spark):
    """Filters/column pruning must reach the parquet scan on flat tables."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    p = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in p, p
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m and "text" not in m.group(1), "column pruning failed: " + m.group(1)


def test_spans_checkpoint_partition_pruning(spark, tmp_path_factory):
    """The pipeline's kind-partitioned spans_flat checkpoint must give
    partition pruning for per-kind extractors (the scale answer to nested-
    column scans)."""
    out = str(tmp_path_factory.mktemp("pruning"))
    run_pipeline(spark, SF_DIR_SMALL, out)
    sp = Catalog(out).read(spark, "spans_flat")
    q = sp.filter(F.col("kind") == "page").select("doc_id", "text")
    p = _plan(q)
    assert "PartitionFilters" in p and "kind" in p.split("PartitionFilters", 1)[1][:200], p


def test_importance_uses_broadcast_joins(spark):
    """Small dims (levels, 1-row max) must broadcast, not shuffle."""
    p = _plan(run_importance(spark, SF_DIR_SMALL))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, p
    # the scalar-max denominator must NOT be a driver collect: it appears as a
    # broadcast nested-loop (cross) join in-plan
    assert "BroadcastNestedLoopJoin" in p, p


def test_whole_stage_codegen_in_extraction(spark):
    from wikipedia_wikidata_spark.operators.extract import extract_views, load_documents

    v = extract_views(load_documents(spark, SF_DIR_SMALL))
    p = _plan(v["page"])
    assert "codegen id" in p, p  # '* Project [codegen id : 1]' spans the stage


def test_tsv_sink_roundtrip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tsv") / "wikimedia_importance.tsv.gz")
    wmi = run_importance(spark, SF_DIR_SMALL)
    write_importance_tsv(wmi, out)
    rows = read_importance_tsv(out)
    assert rows[0] == ["language", "type", "title", "importance", "wikidata_id"]
    body = rows[1:]
    assert len(body) == wmi.count()
    # order: language block sizes descending, then type, then title
    from collections import Counter

    sizes = Counter(r[0] for r in body)
    key = [(-sizes[r[0]], r[1], r[2]) for r in body]
    assert key == sorted(key)
    assert all(r[1] in ("a", "r") for r in body)
