"""Spatial operators vs independent numpy brute force (third check beyond the
DuckDB oracle), plus the span-sequence invariant and cell-codec properties."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from wikipedia_wikidata_spark.config import CELL_RES_BITS
from wikipedia_wikidata_spark.functions.cells import cell_id, cell_xy, morton
from wikipedia_wikidata_spark.operators.extract import load_documents, extract_views
from wikipedia_wikidata_spark.operators.spatial import (
    knn_nearest, knn_release, pip_join,
)
from wikipedia_wikidata_spark.plans.importance import build_scored, entity_points

from .conftest import SF_DIR_SMALL


def _ray_cast_np(vy, vx, py, px):
    inside = False
    n = len(vy)
    for i in range(n):
        j = (i + 1) % n
        if (vy[i] > py) != (vy[j] > py):
            xint = (vx[j] - vx[i]) * (py - vy[i]) / (vy[j] - vy[i]) + vx[i]
            if px < xint:
                inside = not inside
    return inside


def test_pip_matches_numpy_brute_force(spark):
    ep = entity_points(spark, SF_DIR_SMALL).select("language", "title", "lat", "lon")
    polys = extract_views(load_documents(spark, SF_DIR_SMALL))["polygons"]
    got = {
        (r.language, r.title, r.item)
        for r in pip_join(ep, polys.select("item", "verts"), res=5)
        .select("language", "title", "item")
        .collect()
    }
    pts = ep.collect()
    pls = polys.select("item", "verts").collect()
    exp = set()
    for p in pts:
        for g in pls:
            vy = [v.lat for v in g.verts]
            vx = [v.lon for v in g.verts]
            if _ray_cast_np(vy, vx, p.lat, p.lon):
                exp.add((p.language, p.title, g.item))
    assert got == exp
    assert len(exp) > 0, "synthetic data must exercise PIP hits"


def test_pip_salting_preserves_results(spark):
    """Mega-cell salting must not change the join result, only the keys."""
    ep = entity_points(spark, SF_DIR_SMALL).select("language", "title", "lat", "lon")
    polys = extract_views(load_documents(spark, SF_DIR_SMALL))["polygons"]
    base = {
        tuple(r) for r in pip_join(ep, polys.select("item", "verts"), res=5)
        .select("language", "title", "item").collect()
    }
    salted = {
        tuple(r) for r in pip_join(
            ep, polys.select("item", "verts"), res=5, salt=4, hot_threshold=5
        ).select("language", "title", "item").collect()
    }
    assert base == salted and len(base) > 0


def test_knn_matches_numpy_brute_force(spark):
    sc, v = build_scored(spark, SF_DIR_SMALL)
    ep = sc.filter(
        F.col("wd_page_title").isNotNull() & F.col("lat").isNotNull()
    ).select("language", "title", "lat", "lon")
    places = v["wikidata_places"].filter(F.col("lat").isNotNull()).select(
        "item", "lat", "lon"
    )
    knn = knn_nearest(ep, places)
    got = {
        (r.language, r.title): (r.nearest_item, r.dist2) for r in knn.collect()
    }
    knn_release(knn)
    pts = ep.collect()
    pls = places.collect()
    assert len(pls) > 3
    for p in pts:
        cands = sorted(
            ((p.lat - g.lat) ** 2 + (p.lon - g.lon) ** 2, g.item) for g in pls
        )
        d2, item = cands[0]
        gi, gd = got[(p.language, p.title)]
        assert gi == item, ((p.language, p.title), gi, item)
        assert abs(gd - d2) < 1e-12
    assert len(got) == len(pts), "every point must be assigned exactly once"


def test_knn_does_not_leak_persisted_rdds(spark):
    """Round-1 verdict #5: repeated knn_nearest calls must not accumulate
    per-level caches; after knn_release the session is back to baseline."""
    sc, v = build_scored(spark, SF_DIR_SMALL)
    ep = sc.filter(
        F.col("wd_page_title").isNotNull() & F.col("lat").isNotNull()
    ).select("language", "title", "lat", "lon")
    places = v["wikidata_places"].filter(F.col("lat").isNotNull()).select(
        "item", "lat", "lon"
    )

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persisted()
    peaks = []
    for _ in range(3):
        out = knn_nearest(ep, places)
        out.count()
        peaks.append(n_persisted())
        knn_release(out)
    # bounded: at most the one documented result cache while held, and back
    # to (at most) baseline after release — async ContextCleaner may shrink
    # the count below base, so <= not ==.
    assert max(peaks) <= base + 1
    assert n_persisted() <= base


def test_cell_codec_properties():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.99, 89.99, 20000)
    lon = rng.uniform(-179.99, 179.99, 20000)
    for res, bits in CELL_RES_BITS.items():
        cid = cell_id(lat, lon, res)
        x, y = cell_xy(lat, lon, bits)
        # pack/unpack roundtrip
        assert ((cid >> 58) == res).all()
        assert (((cid >> 29) & ((1 << 29) - 1)) == x).all()
        assert ((cid & ((1 << 29) - 1)) == y).all()
        # same point, finer res -> child cell within parent
        if res > 5:
            pb = CELL_RES_BITS[res - 1]
            px, py = cell_xy(lat, lon, pb)
            assert ((x >> (bits - pb)) == px).all()
            assert ((y >> (bits - pb)) == py).all()
    m = morton(lat, lon)
    x, y = cell_xy(lat, lon, 16)
    # morton decodes back
    def unpart(v):
        v = v & 0x55555555
        v = (v | (v >> 1)) & 0x33333333
        v = (v | (v >> 2)) & 0x0F0F0F0F
        v = (v | (v >> 4)) & 0x00FF00FF
        v = (v | (v >> 8)) & 0x0000FFFF
        return v
    assert (unpart(m) == x).all()
    assert (unpart(m >> 1) == y).all()


def test_tile_cell_cover_zoom_finer_than_cells(spark):
    """zoom > cell bits: a tile FINER than the cell grid covers exactly one
    cell column (advice round 1: the long-cast fac=0 emitted descending
    ranges and negative cell ids)."""
    from wikipedia_wikidata_spark.operators.tiles import tile_cell_cover

    bits = CELL_RES_BITS[5]  # 12
    tiles = spark.createDataFrame(
        [(13, 4100, 2900), (13, 0, 0), (4, 3, 2)],
        "zoom int, tile_x bigint, tile_y bigint",
    )
    rows = tile_cell_cover(tiles, res=5).collect()
    assert all(r.cell_id >= 0 for r in rows)
    by_tile = {}
    for r in rows:
        by_tile.setdefault((r.zoom, r.tile_x, r.tile_y), []).append(r.cell_id)
    for (z, tx, ty), cells in by_tile.items():
        xs = {(c >> 29) & ((1 << 29) - 1) for c in cells}
        if z > bits:
            # fine tile -> exactly one covering cell, at the right column
            assert len(cells) == 1, (z, tx, ty, cells)
            assert xs == {tx // (1 << (z - bits))}, (tx, xs)
        else:
            # coarse tile -> the exact 2^(bits-z) column range
            assert xs == set(
                range(tx * (1 << (bits - z)), (tx + 1) * (1 << (bits - z)))
            ), (z, tx, xs)


def test_span_sequence_invariant(spark):
    """input_hint: after transformation, per-doc (kind,text,media_ref,offset)
    sequence must equal the input exactly."""
    from wikipedia_wikidata_spark.operators.extract import reassemble_spans

    docs = load_documents(spark, SF_DIR_SMALL)
    re = reassemble_spans(docs)
    a = docs.select("doc_id", F.col("spans").alias("orig"))
    diff = a.join(re, "doc_id").filter(F.col("orig") != F.col("spans"))
    assert diff.count() == 0
    assert re.count() == docs.count()


def test_knn_ladder_derived_from_place_density(spark):
    """suggest_knn_ladder (round-4 verdict item 5): a sparse-places corpus
    selects a COARSER entry level than a dense one, and knn_nearest run on
    the derived ladder matches numpy brute force exactly (the ladder tunes
    cost, never semantics)."""
    from wikipedia_wikidata_spark.operators.spatial import suggest_knn_ladder

    rng = np.random.default_rng(7)
    # dense corpus: 400 places packed into a ~0.2-degree urban blob
    dense = pd.DataFrame({
        "item": [f"Q{i}" for i in range(400)],
        "lat": 48.85 + rng.uniform(-0.1, 0.1, 400),
        "lon": 2.35 + rng.uniform(-0.1, 0.1, 400),
    })
    # sparse corpus: 40 places spread over the whole globe
    sparse = pd.DataFrame({
        "item": [f"Q{i}" for i in range(40)],
        "lat": rng.uniform(-85, 85, 40),
        "lon": rng.uniform(-179, 179, 40),
    })
    d_ladder, d_stats = suggest_knn_ladder(spark.createDataFrame(dense))
    s_ladder, s_stats = suggest_knn_ladder(spark.createDataFrame(sparse))
    assert d_ladder[-1] == 0 and s_ladder[-1] == 0
    assert s_ladder[0] < d_ladder[0], (s_ladder, d_ladder)
    assert d_stats["levels"][d_ladder[0]]["max_per_cell"] <= d_stats["entry_target"]
    # correctness is ladder-invariant: derived ladder == brute force
    pts = pd.DataFrame({
        "language": "en",
        "title": [f"p{i}" for i in range(300)],
        "lat": np.concatenate([48.85 + rng.uniform(-0.3, 0.3, 150),
                               rng.uniform(-85, 85, 150)]),
        "lon": np.concatenate([2.35 + rng.uniform(-0.3, 0.3, 150),
                               rng.uniform(-179, 179, 150)]),
    })
    ep = spark.createDataFrame(pts)
    for places_pd, ladder in ((dense, d_ladder), (sparse, s_ladder)):
        places = spark.createDataFrame(places_pd)
        knn = knn_nearest(ep, places, levels=ladder)
        got = {(r.language, r.title): (r.nearest_item, r.dist2)
               for r in knn.collect()}
        knn_release(knn)
        assert len(got) == len(pts)
        for _, p in pts.iterrows():
            d2, item = min(
                ((p.lat - g.lat) ** 2 + (p.lon - g.lon) ** 2, g.item)
                for g in places_pd.itertuples()
            )
            gi, gd = got[(p.language, p.title)]
            assert gi == item and abs(gd - d2) < 1e-9
