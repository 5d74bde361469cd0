"""Skew diagnostics: exact stats on a constructed skewed distribution."""

from wikipedia_wikidata_spark.operators.skew import key_histogram, skew_stats


def test_skew_stats_on_known_distribution(spark):
    # one mega-key with 1000 rows + 99 keys with 10 rows each
    rows = [("hot", i) for i in range(1000)] + [
        (f"k{j}", i) for j in range(99) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    s = skew_stats(df, ["k"], target_rows_per_key=100)
    assert s["n_keys"] == 100
    assert s["total_rows"] == 1990
    assert s["max_count"] == 1000
    assert s["p50"] == 10.0
    assert abs(s["avg_count"] - 19.9) < 1e-9
    assert abs(s["skew_ratio"] - 1000 / 19.9) < 1e-9
    assert s["suggested_salt"] == 10       # ceil(1000/100)

    h = {r["k"]: r["n"] for r in key_histogram(df, ["k"]).collect()}
    assert h["hot"] == 1000 and h["k7"] == 10


def test_skew_stats_uniform_needs_no_salt(spark):
    df = spark.createDataFrame(
        [(f"k{i % 50}", i) for i in range(5000)], "k string, v long"
    )
    s = skew_stats(df, ["k"], target_rows_per_key=200)
    assert s["max_count"] == 100 and s["suggested_salt"] == 1
    assert s["skew_ratio"] == 1.0
