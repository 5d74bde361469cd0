"""Iterative graph algorithms as declarative DataFrame programs (PageRank).

The reference ranks articles by RAW inlink counts (langcount/othercount
accumulation, steps/wikipedia_process.sh:96-103 + README.md:163-192);
PageRank over the same resolved pagelink graph is the natural next rung of
link-derived importance and exercises the one operator class the engine did
not yet cover: a fixed-point ITERATION expressed as a DataFrame loop.

Scale design (100 TB / 10^9-node graph):
- The edge list is resolved once (two equi-joins, same shape as
  plans/importance.pagelink_counts) and deduplicated; per-language subgraphs
  are independent, so every shuffle below is keyed by (language, node) and
  skew is bounded by the largest single language.
- Each iteration is join(ranks, edges) -> groupBy(dst).sum — two shuffles,
  both map-side-combined. The edge side of the per-iteration join is an
  IDENTICAL subplan every iteration, so Spark plans one Exchange for it and
  replays it as ReusedExchange in iterations 2..k (asserted by
  tests/test_graph.py::test_pagerank_plan_reuses_edge_exchange) — edges are
  shuffled ONCE per job, not once per iteration, without any persist() whose
  lifetime a caller would have to manage.
- Fixed iteration count (default 5) keeps the lineage shallow enough to skip
  checkpointing; a production run at hundreds of iterations would commit
  ranks through sources/catalog.Catalog every ~10 iterations (the staged
  boundary plans/pipeline.py already uses) to cut lineage and enable resume.
- Dangling-node mass is NOT redistributed (the "lost mass" PageRank
  variant): rank = teleport/N + damping * sum(contribs). This keeps every
  iteration a pure local aggregate — redistributing would add a per-language
  scalar join per iteration — and is the convention the DuckDB oracle
  (oracle.py: pagerank_links) mirrors term-for-term.

Determinism note: double summation order differs between engines, so the
query surface quantizes ranks to e9 (floor(x*1e9+0.5)); a 1-ulp (~1e-16
relative) cross-engine delta cannot move a value ~1e-3 across a 1e-9-wide
bucket boundary in practice (same protocol as the e6 quantizers elsewhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 5
PR_DAMPING = 0.85
PR_TELEPORT = 0.15  # literal, NOT 1-damping: 1-0.85 != 0.15 in binary fp


def link_edges(v: dict[str, DataFrame]) -> DataFrame:
    """Resolved, deduplicated pagelink edges (language, src, dst) with
    self-loops dropped. src = linking page id; dst = target page id, via
    pl_target_id -> linktarget.lt_title -> page.page_title (the same
    resolution chain as plans/importance.pagelink_counts, which mirrors
    bin/filter_pagelinks.py:29-43 of the reference)."""
    pl = v["pagelink"].select(
        "language",
        F.col("pl_from").alias("src"),
        F.col("pl_target_id").alias("lt_id"),
    )
    lt = v["linktarget"].select(
        "language", "lt_id", F.col("lt_title").alias("page_title")
    )
    pg = v["page"].select(
        "language", F.col("page_id").alias("dst"), "page_title"
    )
    return (
        pl.join(lt, ["language", "lt_id"])
        .join(pg, ["language", "page_title"])
        .filter(F.col("src") != F.col("dst"))
        .select("language", "src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    teleport: float = PR_TELEPORT,
    materialize: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank per independent `language` subgraph.

    edges: (language, src, dst), parallel edges already deduplicated.
    Returns (language, node, rank:double).

    materialize=True localCheckpoints the edge and node sets once up front:
    the unrolled plan references edges ~3x per iteration (ew + both arms of
    nodes) and Spark's exchange-reuse did not collapse them (measured: the
    executed sf0.01 plan carried 134 Exchanges and zero ReusedExchange), so
    without truncation the resolution joins replay O(iters) times. A
    production run would commit edges through sources/catalog.Catalog
    (durable, resumable) instead; localCheckpoint is the in-session analog —
    same role as the scored-table checkpoint in plans/importance.py.
    """
    if materialize:
        edges = edges.localCheckpoint()
    nodes = (
        edges.select("language", F.col("src").alias("node"))
        .unionByName(edges.select("language", F.col("dst").alias("node")))
        .distinct()
    )
    if materialize:
        nodes = nodes.localCheckpoint()
    n = nodes.groupBy("language").agg(
        F.count(F.lit(1)).cast("double").alias("n_nodes")
    )
    outdeg = edges.groupBy("language", "src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    )
    # edge-with-outdeg subtree consumed once per iteration; with
    # materialize=True its scan side reads the checkpointed edge RDD (the
    # measured alternative — relying on exchange reuse — never fired)
    ew = edges.join(outdeg, ["language", "src"])
    ranks = nodes.join(F.broadcast(n), "language").select(
        "language", "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            ew.join(
                ranks.select(
                    "language", F.col("node").alias("src"), "rank"
                ),
                ["language", "src"],
            )
            .select(
                "language",
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("language", "node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, ["language", "node"], "left")
            .join(F.broadcast(n), "language")
            .select(
                "language",
                "node",
                (
                    F.lit(teleport) / F.col("n_nodes")
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components by min-label propagation to convergence:
    (node, component) with component = smallest node id in the component.

    This is the clustering step the dedup family needs AFTER candidate
    generation: MinHash/LSH (operators/dedup.py) emits near-dup PAIRS, but
    keep/drop decisions need per-CLUSTER groups (A~B, B~C => {A,B,C} keeps
    one document, not two independent pair-wise keeps).

    Scale design: each iteration is one equi-join (labels into edges) plus
    one min-aggregate — both shuffles keyed by node id, map-side combined;
    labels are localCheckpointed per iteration so lineage stays O(1) rather
    than O(iterations) (production: catalog snapshots, as in pagerank).
    Convergence is a driver-side SCALAR count of changed labels per
    iteration (no data collected). Plain min-propagation needs O(diameter)
    iterations; near-dup graphs are dense clusters with tiny diameter, so
    this converges in 2-3 rounds there. For adversarial long-chain graphs
    at 10^9+ edges the alternating large-star/small-star variant
    (Kiveris et al., "Connected Components in MapReduce and Beyond") drops
    it to O(log n) rounds with the same per-round shuffle shape.
    """
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        prop = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nl"))
        )
        stepped = labels.join(prop, "node", "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce("nl", F.col("label"))).alias("label"),
        )
        stepped = stepped.localCheckpoint()
        changed = stepped.filter(F.col("label") != F.col("old_label")).count()
        labels = stepped.drop("old_label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # partially-propagated labels are WRONG components — fail loudly
        # rather than return them (a diameter > max_iters graph needs the
        # large-star/small-star variant, see docstring)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )
    return labels.select("node", F.col("label").alias("component"))


def pagerank_titles(v: dict[str, DataFrame], iters: int = PR_ITERS) -> DataFrame:
    """PageRank joined back to page titles, ranks quantized to e9 for the
    cross-engine value hash: (language, title, rank_e9)."""
    pr = pagerank(link_edges(v), iters=iters)
    pg = v["page"].select(
        "language", F.col("page_id").alias("node"), F.col("page_title").alias("title")
    )
    return pr.join(pg, ["language", "node"]).select(
        "language",
        "title",
        F.floor(F.col("rank") * 1000000000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("rank_e9"),
    )
