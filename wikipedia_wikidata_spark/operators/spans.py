"""Operators over the interleaved span payload itself (input_hint's
``spans: array<struct<kind,text,media_ref,offset>>``) — the document-level
transformations a multimodal training pipeline runs BEFORE any relational
extraction:

- media_context: pair every media span with its nearest PRECEDING prose
  span in the same document — the caption/alt-text association that
  image-text training pairs are built from. One per-document window (carry
  the last prose seen via last(ignorenulls) over the offset order); no
  join, no self-cartesian per document.
- dedup_spans: drop exact-duplicate (kind, text, media_ref) spans within a
  document keeping the FIRST occurrence by offset, and report the
  before/after span counts plus the md5 digest of the kept offset-ordered
  sequence — boilerplate removal at span granularity that PRESERVES the
  surviving spans' relative order (the input_hint invariant).
- drop_boilerplate_spans: CROSS-document boilerplate removal — drop spans
  whose exact content appears in more than ``max_df`` distinct documents
  (site chrome, licence footers, navigation text), preserving each
  document's surviving span order. The production complement of
  dedup_spans (round-4 verdict item 4).

Scale: media_context/dedup_spans are windows partitioned by doc_id —
embarrassingly parallel, state bounded by the largest single document; no
global sort, no shuffle beyond the doc_id hash partitioning.
drop_boilerplate_spans adds one document-frequency aggregation on a 60-bit
content hash (two map-side-combinable groupBys — the dfreq pattern of
operators/dedup.ngram_jaccard_pairs) plus one equi-join back on the hash;
the over-threshold content set is tiny by construction (boilerplate is few
distinct strings at huge volume), so Catalyst/AQE broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _exploded(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def media_context(docs: DataFrame) -> DataFrame:
    """(doc_id, media_ref, offset, ctx_offset, ctx_text) for every media
    span: the nearest prose span at a smaller offset in the same document
    (NULL ctx when the media leads the document)."""
    sp = _exploded(docs).filter(F.col("kind").isin("prose", "media"))
    # tie-break beyond offset (round-4 ADVICE): if a prose and a media span
    # ever share an offset, the ROWS ... 1 PRECEDING frame's row order decides
    # whether the prose counts as preceding — (kind, text, media_ref) pins it
    # identically on both engines ('media' < 'prose', so a same-offset prose
    # does NOT precede the media). Current corpora have unique per-doc
    # offsets; this removes the latent nondeterminism, not a live bug.
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset", "kind", "text", "media_ref")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prose_text = F.when(F.col("kind") == "prose", F.col("text"))
    prose_off = F.when(F.col("kind") == "prose", F.col("offset"))
    out = sp.select(
        "doc_id",
        "kind",
        "media_ref",
        "offset",
        F.last(prose_text, ignorenulls=True).over(w).alias("ctx_text"),
        F.last(prose_off, ignorenulls=True).over(w).alias("ctx_offset"),
    )
    return out.filter(F.col("kind") == "media").select(
        "doc_id", "media_ref",
        F.col("offset").cast("bigint").alias("offset"),
        F.col("ctx_offset").cast("bigint").alias("ctx_offset"),
        "ctx_text",
    )


BOILERPLATE_MAX_DF = 2  # spans in more than this many docs are chrome


def drop_boilerplate_spans(
    docs: DataFrame, max_df: int = BOILERPLATE_MAX_DF
) -> DataFrame:
    """Cross-document boilerplate removal: (doc_id, n_spans, n_kept,
    kept_md5) after dropping every span whose exact (kind, text, media_ref)
    content occurs in more than ``max_df`` DISTINCT documents. kept_md5
    digests the kept spans' offset-ordered serialization (NULL when a
    document loses every span), proving the survivors' relative order is
    preserved — same digest construction as dedup_spans.

    Document frequency (not raw occurrence count) is the right boilerplate
    signal: a span repeated 50x inside ONE page is that page's structure;
    a span appearing once in each of 1000 pages is site chrome."""
    from .text import hash60_col

    sp = _exploded(docs)
    ser = F.concat_ws(
        "\x1f", F.col("kind"), F.col("text"), F.col("media_ref")
    )
    sp = sp.withColumn("_h", hash60_col(ser))
    # df = count of distinct docs per content hash: distinct-then-count is
    # two map-side-combinable aggregations (no countDistinct single-stage
    # shuffle of raw rows)
    hot = (
        sp.select("_h", "doc_id")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("_h", F.lit(True).alias("_drop"))
    )
    flagged = sp.join(hot, "_h", "left")
    keep = F.col("_drop").isNull()
    n_kept = F.sum(F.when(keep, 1).otherwise(0)).cast("bigint")
    digest = F.md5(
        F.concat_ws(
            "\x1e",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            keep, F.struct(F.col("offset"), ser.alias("ser"))
                        )
                    )
                ),
                lambda s: s["ser"],
            ),
        ).cast("binary")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        n_kept.alias("n_kept"),
        # empty kept set digests to NULL on both engines (DuckDB's
        # string_agg over zero rows is NULL; Spark's md5('') is not)
        F.when(n_kept > 0, digest).alias("kept_md5"),
    )


def dedup_spans(docs: DataFrame) -> DataFrame:
    """Within-document exact span dedup, first occurrence (smallest offset)
    wins: (doc_id, n_spans, n_kept, kept_md5) where kept_md5 digests the
    kept spans' offset-ordered (kind, text, media_ref) serialization — the
    order-preservation proof a re-assembly consumer relies on."""
    sp = _exploded(docs)
    w = Window.partitionBy("doc_id", "kind", "text", "media_ref").orderBy(
        "offset"
    )
    kept = sp.withColumn("_rn", F.row_number().over(w))
    # span fields are non-null by the input_hint schema (text spans carry
    # media_ref='' and vice versa); concat_ws would silently SKIP a NULL
    # field while the oracle's || yields NULL — keep the contract explicit
    ser = F.concat_ws(
        "\x1f", F.col("kind"), F.col("text"), F.col("media_ref")
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.md5(
                F.concat_ws(
                    "\x1e",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("_rn") == 1,
                                    F.struct(F.col("offset"), ser.alias("ser")),
                                )
                            )
                        ),
                        lambda s: s["ser"],
                    ),
                ).cast("binary")
            ).alias("kept_md5"),
        )
    )
