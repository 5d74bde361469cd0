"""KMV distinct-count sketch, deterministic weighted sampling, snapshot CDC.

Cross-engine value parity runs in test_oracle_parity (distinct_tokens_kmv,
sample_weighted, snapshot_cdc); these pin the properties the operators'
scale stories rest on: KMV estimate accuracy and sketch MERGEABILITY,
weight monotonicity and partition invariance of the weighted sample, and
the insert/update/delete classification of the catalog changelog.
"""

import hashlib

from pyspark.sql import functions as F

from wikipedia_wikidata_spark.operators.sketches import (
    KMV_K,
    distinct_kmv,
    kmv_merge,
    sample_weighted,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_exact_below_k(spark):
    """A group with fewer than k distinct values reports the EXACT count
    (duplicates collapse first)."""
    rows = [("g", f"v{i % 10}") for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, val string")
    got = distinct_kmv(df, "grp", "val").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_kept"] == 10 and r["est_distinct"] == 10


def test_kmv_estimate_within_error_band(spark):
    """5000 distinct values: KMV with k=64 has relative standard error
    ~ 1/sqrt(k-1) = 12.6%; assert the estimate lands within 4 sigma and
    matches the pure-Python replication of the same integer arithmetic
    bit-for-bit."""
    n = 5000
    df = spark.createDataFrame(
        [("g", f"item-{i}") for i in range(n)], "grp string, val string"
    )
    r = distinct_kmv(df, "grp", "val").collect()[0]
    hashes = sorted(_h60(f"item-{i}") for i in range(n))
    hk = hashes[KMV_K - 1]
    want = (KMV_K - 1) * (1 << 60) // hk
    assert r["kth_min_hash"] == hk
    assert r["est_distinct"] == want
    assert abs(want - n) / n < 4 / (KMV_K - 1) ** 0.5, want


def test_kmv_sketch_merges(spark):
    """Mergeability — the property that makes KMV the 100-TB primitive:
    min-k(sketch(A) ∪ sketch(B)) == min-k(A ∪ B). Split a corpus in two,
    sketch each half, merge, and compare against the one-shot sketch of
    the whole."""
    rows = [("g", f"w-{i}") for i in range(3000)]
    df = spark.createDataFrame(rows, "grp string, val string")
    a = df.filter(F.crc32(F.col("val")) % 2 == 0)
    b = df.filter(F.crc32(F.col("val")) % 2 == 1)

    def mink_rows(part):
        from wikipedia_wikidata_spark.operators.text import hash60_col

        h = hash60_col(F.col("val").cast("string"))
        d = part.select(F.col("grp"), h.alias("h")).distinct()
        from pyspark.sql import Window

        w = Window.partitionBy("grp").orderBy(F.col("h").asc())
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= KMV_K)
            .drop("_rn")
        )

    merged = kmv_merge(mink_rows(a).unionByName(mink_rows(b)))
    oneshot = mink_rows(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, oneshot.collect())
    )


def test_sample_weighted_monotone_and_stable(spark):
    """Same key hash, doubled weight -> halved priority (monotone in
    weight); the selected set is identical under different partitionings
    (retry/resume stability); exactly k rows come back; and the result
    matches a pure-Python replication of hash60 div weight."""
    rows = [(f"k{i}", (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, wt long")
    got = sample_weighted(df, "key", "wt", 20)
    out = got.collect()
    assert len(out) == 20
    pri = {
        k: _h60(f"42:{k}") // w for k, w in rows
    }
    want = sorted(rows, key=lambda r: (pri[r[0]], r[0]))[:20]
    assert sorted((r["key"], r["wt"]) for r in out) == sorted(want)
    # partition invariance
    out2 = sample_weighted(df.repartition(17), "key", "wt", 20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # monotone: a row at weight 2w has half the priority of the same key
    # at weight w (integer div), so it can only move UP the selection order
    one = sample_weighted(
        spark.createDataFrame([("kx", 1)], "key string, wt long"),
        "key",
        "wt",
        1,
    ).collect()[0]
    two = sample_weighted(
        spark.createDataFrame([("kx", 2)], "key string, wt long"),
        "key",
        "wt",
        1,
    ).collect()[0]
    assert two["priority"] == one["priority"] // 2


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """Hand-built two-version table: k1 unchanged (absent from the diff),
    k2 updated, k3 deleted, k4 inserted, k5 null->value update (null-safe
    comparison catches it)."""
    from wikipedia_wikidata_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    v1 = spark.createDataFrame(
        [("k1", "a"), ("k2", "b"), ("k3", "c"), ("k5", None)],
        "k string, v string",
    )
    v2 = spark.createDataFrame(
        [("k1", "a"), ("k2", "B"), ("k4", "d"), ("k5", "e")],
        "k string, v string",
    )
    cat.write(spark, v1, "t", "fp1", "r1")
    cat.write(spark, v2, "t", "fp2", "r2")
    got = {
        r["k"]: (r["change"], r["v"])
        for r in cat.snapshot_diff(spark, "t", ["k"], 1, 2).collect()
    }
    assert got == {
        "k2": ("update", "B"),
        "k3": ("delete", "c"),
        "k4": ("insert", "d"),
        "k5": ("update", "e"),
    }


def test_snapshot_diff_of_identical_versions_is_empty(spark, tmp_path):
    from wikipedia_wikidata_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    v = spark.createDataFrame([("k1", "a")], "k string, v string")
    cat.write(spark, v, "t", "fp1", "r1")
    cat.write(spark, v, "t", "fp2", "r2")
    assert cat.snapshot_diff(spark, "t", ["k"], 1, 2).count() == 0
