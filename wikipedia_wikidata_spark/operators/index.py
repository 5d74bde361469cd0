"""Keyword retrieval over the documents table: integer-exact BM25 top-k.

The reference engine's query surface is join/aggregate-shaped; a training-data
curation stack also needs lexical retrieval — "find the documents most
relevant to these terms" — for eval-set mining, targeted decontamination
(pull everything that *scores* near an eval prompt, not just exact n-gram
hits), and corpus inspection. This module implements BM25 as pure DataFrame
algebra: the posting lists are a (doc_id, token, tf) aggregate filtered to
the query's terms, corpus statistics are one broadcast row, and the ranking
is a deterministic top-k — no inverted-index service, no per-row Python.

Exactness (the house rule for cross-engine value-hash parity): BM25's two
transcendental-looking factors are computed in integer arithmetic —

- idf is quantized to log2 steps via the length(bin(q)) - 1 trick shared
  with operators/text.unigram_surprisal:
      idf_w = floor(log2((1000 * (2N + 1)) // (2 * df + 1)))
  (the 1000x pre-scale keeps ~10 bits of gradation between df = N and
  df = 1, so near-ubiquitous terms still separate from rare ones);
- the tf-saturation factor tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
  the standard k1 = 1.2, b = 0.75 is a RATIONAL in (tf, dl, l_total, N)
  once multiplied through by 20 * l_total (avgdl = l_total / N):
      num = 44 * tf * l_total
      den = 20 * tf * l_total + 6 * l_total + 18 * dl * N
  so the per-term milli-score idf_w * ((1000 * num) div den) is exact
  integer math on both engines.

int64 headroom: the widest product is 44000 * tf * l_total; exact up to
tf * l_total < 2^63/44000 ~ 2.1e14 (e.g. a 1e12-token corpus with tf <= 200).
Past that, swap the bigint columns for decimal(38,0)/HUGEINT — the formula is
unchanged.

Scale shape at 10^12 docs: dl is a narrow per-row expression (no explode);
only the explode->filter(token IN terms) stream shuffles, and it is pre-shrunk
to the query's terms at the scan (predicate on the exploded token). df and
the (l_total, N) totals are <= |terms| + 1 rows — broadcast joins. Final
top-k is TakeOrdered (per-partition heads + a k-row driver merge), not a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words_col

BM25_TERMS: tuple[str, ...] = ("spark", "join", "window", "stream", "vector")
BM25_K = 50


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k: int = BM25_K,
) -> DataFrame:
    """Top-``k`` documents by integer-exact BM25 over whitespace tokens.

    Output: (doc_id, n_terms, score_milli) ordered by (score_milli DESC,
    doc_id ASC) — a total order, so the LIMIT is deterministic under any
    partitioning. Documents matching none of the terms are absent.
    """
    d = docs.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("bigint").alias("dl"),
    )
    totals = d.agg(
        F.sum("dl").alias("l_total"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        docs.select(
            "doc_id", F.explode(words_col(F.col("text"))).alias("token")
        )
        .filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf_w = (
        F.length(
            F.bin(
                F.expr("(1000 * (2 * n_docs + 1)) div (2 * df + 1)")
            )
        )
        - 1
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(d, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                idf_w
                * F.expr(
                    "(1000 * (44 * tf * l_total)) div "
                    "(20 * tf * l_total + 6 * l_total + 18 * dl * n_docs)"
                )
            ).cast("bigint").alias("_s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("_s").cast("bigint").alias("score_milli"),
        )
        .orderBy(F.desc("score_milli"), F.asc("doc_id"))
        .limit(k)
    )
