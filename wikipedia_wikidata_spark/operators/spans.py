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

Scale: both are windows partitioned by doc_id — embarrassingly parallel,
state bounded by the largest single document; no global sort, no shuffle
beyond the doc_id hash partitioning.
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
