"""Similarity search over the embeddings table (array<float>, dim 64).

- cosine_topk: brute-force exact top-k per query vector — the baseline. Dot
  products via zip_with + left-fold aggregate (JVM, deterministic order); the
  DuckDB oracle uses an identical left fold so doubles match bit-for-bit.
- ann_lsh_topk: random-hyperplane LSH bucketing (the scale path): 8 signed
  projections -> 256 buckets -> exact re-rank within bucket. Hyperplane
  weights are a deterministic numpy literal (seed 123) inlined into BOTH
  engines' expressions.

At 100 TB scale the brute-force form shards the query side and broadcasts
centroid/bucket stats; the LSH form is a plain equi-join on bucket id that
AQE can re-plan — no custom strategies needed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

DIM = 64
N_PLANES = 8
TOP_K = 5


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double precision (deterministic order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def plane_weights() -> np.ndarray:
    rng = np.random.default_rng(123)
    return rng.choice(np.array([-1.0, 1.0]), size=(N_PLANES, DIM))


def with_lsh_bucket(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    w = plane_weights()
    bucket = F.lit(0).cast("bigint")
    for p in range(N_PLANES):
        lits = F.array(*[F.lit(float(x)) for x in w[p]])
        proj = _dot(F.col(vec_col), lits)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return emb.withColumn("lsh_bucket", bucket)


def cosine_topk(emb: DataFrame, k: int = TOP_K, query_mod: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for every query_mod-th vector."""
    base = emb.select("vec_id", "embedding")
    q = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    j = q.join(base.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb")),
               F.col("q_id") != F.col("n_id"))
    cos = _dot(F.col("q_emb"), F.col("n_emb")) / (
        _norm(F.col("q_emb")) * _norm(F.col("n_emb"))
    )
    j = j.withColumn("_cos", cos)
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("_rk").cast("bigint").alias("rank"),
            F.floor(F.col("_cos") * 1000000.0 + 0.5).cast("bigint").alias("cosine_e6"),
        )
    )


NEAR_DUP_T = 0.9


def augment_emb(emb: DataFrame) -> DataFrame:
    """embeddings ∪ exact dups (vec_id+10^6, every 10th) ∪ near dups
    (vec_id+2*10^6, every 7th, first component +0.05) — planted pairs so the
    near-dup op is provably exercised; mirrored in the DuckDB oracle.
    All vectors cast to array<double> (both engines) before any math."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb_d")
    )
    exact = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "emb_d"
    )
    pert = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("emb_d", 1) + F.lit(0.05)),
            F.slice("emb_d", 2, DIM - 1),
        ).alias("emb_d"),
    )
    return base.unionByName(exact).unionByName(pert)


def emb_near_dup(emb: DataFrame, t: float = NEAR_DUP_T) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket blocking (equi-join
    on bucket id — broadcastable/AQE-replannable at scale) then exact cosine
    within bucket, thresholded at t. Output (vec_a, vec_b, cosine_e6)."""
    b = with_lsh_bucket(augment_emb(emb), vec_col="emb_d")
    qa = b.select(F.col("vec_id").alias("vec_a"), F.col("emb_d").alias("_ea"), "lsh_bucket")
    qb = b.select(F.col("vec_id").alias("vec_b"), F.col("emb_d").alias("_eb"), "lsh_bucket")
    j = qa.join(qb, "lsh_bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("_ea"), F.col("_eb")) / (_norm(F.col("_ea")) * _norm(F.col("_eb")))
    return (
        j.withColumn("_cos", cos)
        .filter(F.col("_cos") >= t)
        .select(
            "vec_a",
            "vec_b",
            F.floor(F.col("_cos") * 1000000.0 + 0.5).cast("bigint").alias("cosine_e6"),
        )
    )


def ann_lsh_topk(emb: DataFrame, k: int = 3) -> DataFrame:
    """LSH-bucketed approximate top-k: exact cosine re-rank within bucket."""
    b = with_lsh_bucket(emb.select("vec_id", "embedding"))
    q = b.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "lsh_bucket"
    )
    n = b.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"), "lsh_bucket"
    )
    j = q.join(n, "lsh_bucket").filter(F.col("q_id") != F.col("n_id"))
    cos = _dot(F.col("q_emb"), F.col("n_emb")) / (
        _norm(F.col("q_emb")) * _norm(F.col("n_emb"))
    )
    j = j.withColumn("_cos", cos)
    w = Window.partitionBy("q_id").orderBy(F.desc("_cos"), F.asc("n_id"))
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            "q_id",
            "n_id",
            F.col("_rk").cast("bigint").alias("rank"),
            F.floor(F.col("_cos") * 1000000.0 + 0.5).cast("bigint").alias("cosine_e6"),
        )
    )
