"""PageRank operator: hand-oracle on a tiny graph, invariants, plan shape.

Cross-engine parity vs the unrolled DuckDB CTE (oracle.py: pagerank_links)
runs in tests/test_oracle_parity.py with the rest of the registry.
"""

import pytest
from pyspark.sql import functions as F

from wikipedia_wikidata_spark.operators.graph import (
    PR_DAMPING, PR_ITERS, PR_TELEPORT, link_edges, pagerank,
)


def _numpy_pagerank(edges, iters=PR_ITERS):
    """Independent dense-matrix reference (lost dangling mass variant)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / outdeg[s]
        rank = {v: PR_TELEPORT / n + PR_DAMPING * contrib[v] for v in nodes}
    return rank, idx


def test_pagerank_matches_hand_oracle(spark):
    # 4-node graph with a cycle, a hub, and a dangling node (4 -> nothing)
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (2, 4)]
    df = spark.createDataFrame(
        [("en", s, d) for s, d in edges], "language string, src int, dst int"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, materialize=False).collect()
    }
    want, _ = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v


def test_pagerank_language_subgraphs_independent(spark):
    """The same graph under two language keys ranks identically per key."""
    edges = [(1, 2), (2, 1), (2, 3)]
    rows = [(lang, s, d) for lang in ("en", "de") for s, d in edges]
    df = spark.createDataFrame(rows, "language string, src int, dst int")
    out = pagerank(df, materialize=False).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["language"], {})[r["node"]] = r["rank"]
    assert by_lang["en"] == by_lang["de"]


def test_pagerank_mass_bounded(spark):
    """With dangling nodes mass leaks but never grows: sum(rank) <= 1."""
    edges = [(1, 2), (2, 3)]  # 3 is dangling
    df = spark.createDataFrame(
        [("en", s, d) for s, d in edges], "language string, src int, dst int"
    )
    total = (
        pagerank(df, materialize=False)
        .groupBy("language").agg(F.sum("rank").alias("t")).collect()[0]["t"]
    )
    assert total <= 1.0 + 1e-12
    assert total > PR_TELEPORT  # teleport mass alone is a lower bound


def test_connected_components_chain_and_islands(spark):
    """Long chain (forces multi-round propagation) + separate triangle +
    untouched pair; labels = min node id per component."""
    from wikipedia_wikidata_spark.operators.graph import connected_components

    pairs = (
        [(i, i + 1) for i in range(1, 8)]        # chain 1-8, diameter 7
        + [(20, 21), (21, 22), (20, 22)]          # triangle
        + [(31, 30)]                              # pair, min is on the b side
    )
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    for n in range(1, 9):
        assert got[n] == 1, (n, got[n])
    for n in (20, 21, 22):
        assert got[n] == 20
    assert got[30] == 30 and got[31] == 30
    assert len(got) == 13


def test_registry_window_untouched():
    """Driver executes queries()[:50]; post-window entries must stay after."""
    import __spark_entry__ as e

    names = list(e.queries())
    first50 = set(names[:50])
    assert "pagerank_links" not in first50
    assert "dedup_clusters" not in first50
    assert len(names) >= 52


def test_pagerank_plan_is_cartesian_free_and_truncated(spark):
    from tests.conftest import SF_DIR_SMALL
    from wikipedia_wikidata_spark.operators.extract import extract_views_shared
    from wikipedia_wikidata_spark.config import LANGUAGES

    v = extract_views_shared(spark, SF_DIR_SMALL, LANGUAGES)
    pr = pagerank(link_edges(v))
    p = pr._sc._jvm.PythonSQLUtils.explainString(
        pr._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # lineage truncation: the iterations read the materialized edge/node
    # RDDs, not a replayed 2-join resolution subtree per reference
    assert "Scan ExistingRDD" in p, p


def test_connected_components_random_graphs_vs_union_find(spark):
    """Seeded random graphs vs a pure-Python union-find oracle."""
    import random

    from wikipedia_wikidata_spark.operators.graph import connected_components

    rng = random.Random(42)
    for trial in range(3):
        n, m = 60, rng.randint(20, 80)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for p in pairs for x in p}
        want = {x: find(x) for x in touched}
        # canonicalize oracle labels to the min node id per component
        groups = {}
        for x, r in want.items():
            groups.setdefault(find(r), []).append(x)
        want = {x: min(g) for r, g in groups.items() for x in g}

        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == want, f"trial {trial}"
