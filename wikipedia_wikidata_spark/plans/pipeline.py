"""Staged, checkpoint/resume pipeline runner (north_rule).

The DAG mirrors the reference's stage boundaries (complete_run.sh:29-45) but
each boundary is an atomic catalog commit instead of a bash-script disk file;
a killed run resumes by skipping every stage whose manifest fingerprint
matches (the reference can only skip downloads, steps/wikipedia_download.sh:22-25
— everything else recomputes).

Stage order:
  spans_flat -> relational views -> article_full -> scored -> importance
  -> entity_points -> spatial_assign (PIP) -> knn -> tiles

spans_flat is written partitioned by span kind: every downstream extractor
then prunes to its kind's partition at the parquet-scan level (the reference's
"any work done here cuts down time/space" pushdown, steps/wikipedia_sql2csv.sh:36-40,
done once instead of per filter program).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LANGUAGES, spans_dir_for
from ..operators import extract as ex
from ..operators.spatial import (
    knn_nearest, knn_release, pip_join, suggest_knn_ladder, suggest_pip_salt,
)
from ..operators.tiles import tile_importance
from ..sources.catalog import Catalog
from . import importance as imp

VIEW_NAMES = [
    "page", "linktarget", "redirect", "pagelink", "langlinks",
    "wd_page", "geo_tags", "sitelinks", "places", "polygons",
]

PIPELINE_VERSION = 7  # v7: knn ladder derived from measured place density

# Shard sizing for the shard-granular resumable spatial stage: resume
# granularity vs K× replay of the (small) polygon build side. Derived from
# the committed entity_points row count (deterministic per fingerprint, so
# a resume re-derives the identical shard split): one shard per
# SPATIAL_SHARD_ROWS points, floored at 4 (test-scale resume granularity)
# and capped at 256 (the docstring's 10^12-doc figure — beyond that, shard
# count stops paying because each shard is already thousands of tasks).
SPATIAL_SHARDS_MIN = 4
SPATIAL_SHARDS_MAX = 256
SPATIAL_SHARD_ROWS = 1_000_000


def spatial_shards_for(n_points: int) -> int:
    return max(
        SPATIAL_SHARDS_MIN,
        min(SPATIAL_SHARDS_MAX, -(-n_points // SPATIAL_SHARD_ROWS)),
    )


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    languages: list[str] | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns {stage: manifest}."""
    languages = languages or LANGUAGES
    cat = Catalog(out_root)
    run_id = uuid.uuid4().hex[:12]
    # fingerprint covers EVERYTHING that changes stage outputs: pipeline
    # logic version, corpus generator version, corpus location, and the
    # language configuration — otherwise a resume against the same out_root
    # silently serves stages built under a different configuration
    from ..sources.synth import GENERATOR_VERSION

    fp = (
        f"v{PIPELINE_VERSION}:g{GENERATOR_VERSION}:{spans_dir_for(sf_dir)}"
        f":{','.join(languages)}"
    )
    report: dict[str, dict] = {}

    def stage(name: str, build, partition_by=None, cluster_by=None,
              extra=None):
        if cat.is_complete(name, fp):
            m = cat.manifest(name)
            m["skipped"] = True
            report[name] = m
            return
        m = cat.write(
            spark, build(), name, fp, run_id, partition_by,
            extra=extra() if callable(extra) else extra,
            cluster_by=cluster_by,
        )
        m["skipped"] = False
        report[name] = m

    docs = ex.load_documents(spark, sf_dir)
    stage("spans_flat", lambda: ex.spans_flat(docs).drop("f"), ["kind"])

    sp = cat.read(spark, "spans_flat").withColumn(
        "f", F.split("text", "\x1f", 3)
    )
    view_builders = {
        "page": ex.page_view, "linktarget": ex.linktarget_view,
        "redirect": ex.redirect_view, "pagelink": ex.pagelink_view,
        "wd_page": ex.wd_page_view, "geo_tags": ex.geo_tags_view,
        "places": ex.places_view, "polygons": ex.polygons_view,
    }
    for name, fn in view_builders.items():
        stage(f"view_{name}", lambda fn=fn: fn(sp))
    stage("view_langlinks", lambda: ex.langlinks_view(sp, languages))
    stage("view_sitelinks", lambda: ex.sitelinks_view(sp, languages))

    v = {n: cat.read(spark, f"view_{n}") for n in VIEW_NAMES}
    levels = spark.read.parquet(f"{spans_dir_for(sf_dir)}/place_type_levels.parquet")

    def build_af():
        plc = imp.pagelink_counts(v)
        return imp.article_full(plc, imp.othercounts(v, plc))

    stage("article_full", build_af)
    af = cat.read(spark, "article_full")

    # wikidata_places commits FIRST and 'scored' reads the snapshot: on a
    # cold run the places subtree used to be evaluated twice (once inside
    # scored, once for its own stage), and resume could pair a 'scored'
    # built from a different places computation than the committed one
    stage("wikidata_places", lambda: imp.wikidata_places(
        v, levels, imp.geo_earth_wikidata(v)))
    places = cat.read(spark, "wikidata_places")

    def build_scored():
        wp = imp.wikidata_pages(places, v["sitelinks"], languages)
        return imp.scored_articles(af, wp)

    stage("scored", build_scored)
    scored = cat.read(spark, "scored")

    stage("importance", lambda: imp.wikimedia_importance(scored, v), ["language"])

    def build_points():
        return scored.filter(
            F.col("wd_page_title").isNotNull() & F.col("lat").isNotNull()
        ).select(
            "language", "title",
            F.col("wd_page_title").alias("wikidata_id"), "lat", "lon", "importance",
        )

    stage("entity_points", build_points)
    pts = cat.read(spark, "entity_points")

    # shard-granular resumable stage (north_star: a killed job resumes
    # without recomputing completed cells): points are split by a stable
    # hash, each shard's PIP assignment commits atomically on its own, and
    # a resume rebuilds only the missing shards (catalog.write_sharded).
    # Shard count derives from the committed point count; the PIP salt
    # derives from the MEASURED per-cell histogram (suggest_pip_salt) — the
    # pipeline consumes its own skew diagnostics instead of a hand guess.
    # Both are pure functions of the committed entity_points snapshot, so a
    # resume under the same fingerprint re-derives the identical plan.
    if cat.is_complete("spatial_assign", fp):
        m = cat.manifest("spatial_assign")
        m["skipped"] = True
        report["spatial_assign"] = m
    else:
        n_shards = spatial_shards_for(report["entity_points"]["rows"])
        salt, skstats = suggest_pip_salt(pts, res=5)

        def spatial_shard(k: int) -> DataFrame:
            sub = pts.filter(
                F.pmod(F.xxhash64("wikidata_id"), F.lit(n_shards)) == k
            )
            return pip_join(
                sub, v["polygons"].select("item", "verts"), res=5,
                salt=salt if salt > 1 else None,
            ).select(
                "language", "title", "wikidata_id", F.col("item").alias("place_item")
            )

        m = cat.write_sharded(
            spark, spatial_shard, "spatial_assign", fp, run_id, n_shards,
            extra={
                "pip_salt": salt,
                "pip_cell_skew": {
                    k: skstats[k]
                    for k in ("n_keys", "max_count", "p99", "skew_ratio")
                },
            },
        )
        m["skipped"] = False
        report["spatial_assign"] = m

    geo_places = cat.read(spark, "wikidata_places").filter(
        F.col("lat").isNotNull()
    ).select("item", "lat", "lon")
    built_knn: list[DataFrame] = []
    knn_extra: dict = {}

    def build_knn() -> DataFrame:
        # ladder derived from the MEASURED places-per-cell histogram
        # (suggest_knn_ladder, round-4 verdict item 5) — like the PIP salt,
        # a pure function of the committed places snapshot, so a resume
        # under the same fingerprint re-derives the identical plan; the
        # manifest records what was derived. Any ladder returns identical
        # results (per-level guards prove exactness); this tunes cost.
        ladder, kstats = suggest_knn_ladder(geo_places)
        knn_extra["knn_ladder"] = kstats
        built_knn.append(knn_nearest(pts, geo_places, levels=ladder))
        return built_knn[0]

    stage("knn", build_knn, extra=lambda: knn_extra)
    if built_knn:  # release the one cache knn_nearest returns (skip-safe)
        knn_release(built_knn[0])
    # zoom dirs for partition pruning + tile range clustering inside each
    # dir: a viewport query (tile range at one zoom) prunes to one partition
    # dir AND skips files whose footer tile range misses the viewport
    # (catalog cluster_by = the Iceberg SORTED BY analog). zoom LEADS the
    # range keys so each shuffle task holds a zoom-contiguous slice —
    # partitionBy(zoom) then emits ~one file per task instead of
    # tasks x zooms small files.
    stage(
        "tiles", lambda: tile_importance(pts), ["zoom"],
        cluster_by=["zoom", "tile_x", "tile_y"],
    )
    return report
