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
from ..operators.spatial import knn_nearest, knn_release, pip_join
from ..operators.tiles import tile_importance
from ..sources.catalog import Catalog
from . import importance as imp

VIEW_NAMES = [
    "page", "linktarget", "redirect", "pagelink", "langlinks",
    "wd_page", "geo_tags", "sitelinks", "places", "polygons",
]

PIPELINE_VERSION = 5

# Shard count for the shard-granular resumable spatial stage: resume
# granularity vs K× replay of the (small) polygon build side. On a real
# cluster this scales with the corpus (e.g. 256 shards at 10^12 docs).
SPATIAL_SHARDS = 4


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

    def stage(name: str, build, partition_by=None):
        if cat.is_complete(name, fp):
            m = cat.manifest(name)
            m["skipped"] = True
            report[name] = m
            return
        m = cat.write(spark, build(), name, fp, run_id, partition_by)
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
    # a resume rebuilds only the missing shards (catalog.write_sharded)
    def spatial_shard(k: int) -> DataFrame:
        sub = pts.filter(
            F.pmod(F.xxhash64("wikidata_id"), F.lit(SPATIAL_SHARDS)) == k
        )
        return pip_join(sub, v["polygons"].select("item", "verts"), res=5).select(
            "language", "title", "wikidata_id", F.col("item").alias("place_item")
        )

    if cat.is_complete("spatial_assign", fp):
        m = cat.manifest("spatial_assign")
        m["skipped"] = True
        report["spatial_assign"] = m
    else:
        m = cat.write_sharded(
            spark, spatial_shard, "spatial_assign", fp, run_id, SPATIAL_SHARDS
        )
        m["skipped"] = False
        report["spatial_assign"] = m

    geo_places = cat.read(spark, "wikidata_places").filter(
        F.col("lat").isNotNull()
    ).select("item", "lat", "lon")
    built_knn: list[DataFrame] = []

    def build_knn() -> DataFrame:
        built_knn.append(knn_nearest(pts, geo_places))
        return built_knn[0]

    stage("knn", build_knn)
    if built_knn:  # release the one cache knn_nearest returns (skip-safe)
        knn_release(built_knn[0])
    stage("tiles", lambda: tile_importance(pts), ["zoom"])
    return report
