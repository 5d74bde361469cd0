"""Raster-tile aggregation of importance scores (A9 / north_star).

Web-mercator slippy tiles. The mercator y-projection is computed by a
vectorized Arrow pandas UDF (numpy, batch) — the tile index floor/clamp stays
in JVM Column expressions. The DuckDB oracle uses the identical formula
(ln/tan/cos with the same association order), so tile assignments match
bit-for-bit except for sub-ulp libm noise exactly at tile boundaries
(probability ~1e-16 per row; synthetic lattice coords avoid boundaries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..config import TILE_ZOOMS

MERC_LAT_MAX = 85.05112878


@pandas_udf(DoubleType())
def mercator_y_norm(lat: pd.Series) -> pd.Series:
    """Normalized mercator y in [0,1): (1 - ln(tan(r) + 1/cos(r))/pi)/2."""
    la = np.clip(lat.to_numpy(dtype="float64"), -MERC_LAT_MAX, MERC_LAT_MAX)
    rad = la * np.pi / 180.0
    y = (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0
    return pd.Series(y)


def mercator_y_norm_sql(lat_expr: str) -> str:
    e = f"least(greatest({lat_expr}, {-MERC_LAT_MAX}), {MERC_LAT_MAX}) * pi() / 180.0"
    return f"(1.0 - ln(tan({e}) + 1.0 / cos({e})) / pi()) / 2.0"


def _tile_xy_cols(zoom_col: str = "zoom", merc_col: str = "_merc"):
    """(tile_x, tile_y) Columns from lon + a precomputed mercator-y column."""
    n = F.pow(F.lit(2.0), F.col(zoom_col)).cast("double")
    xn = (F.col("lon") + F.lit(180.0)) / F.lit(360.0)
    tx = F.least(F.greatest(F.floor(xn * n), F.lit(0)), (n - 1).cast("long")).cast("long")
    ty = F.least(
        F.greatest(F.floor(F.col(merc_col) * n), F.lit(0)), (n - 1).cast("long")
    ).cast("long")
    return tx, ty


def with_tile(df: DataFrame, zoom_col: str = "zoom") -> DataFrame:
    """Add tile_x/tile_y given lat/lon and a zoom column."""
    tx, ty = _tile_xy_cols(zoom_col)
    return (
        df.withColumn("_merc", mercator_y_norm(F.col("lat")))
        .withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .drop("_merc")
    )


def tile_importance(points: DataFrame, zooms: list[int] | None = None) -> DataFrame:
    """Per-(zoom, tile) entity count + importance sum (log-scale column too).

    points: (..., lat, lon, importance). The mercator Python/Arrow UDF is
    zoom-independent, so it runs ONCE PER POINT — before the zoom explode;
    computing it after the explode paid len(zooms) redundant Arrow round
    trips per point in the timed north-star job. One explode over the zoom
    pyramid; the groupBy is a single shuffle keyed (zoom, tile_x, tile_y).
    """
    zooms = zooms or TILE_ZOOMS
    z = (
        points.withColumn("_merc", mercator_y_norm(F.col("lat")))
        .withColumn("zoom", F.explode(F.array(*[F.lit(int(s)) for s in zooms])))
    )
    tx, ty = _tile_xy_cols()
    t = z.withColumn("tile_x", tx).withColumn("tile_y", ty)
    return t.groupBy("zoom", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.sum("importance").alias("importance_sum"),
    )


# Fixed serving viewport over the Berlin synth cluster (sources/synth.py
# CLUSTERS[0] = 52.52N 13.40E, present at every sf): zoom-10 tile (550, 335)
# +/- 4 tiles. Constants, not data-derived — a serving query's shape.
DEFAULT_VIEWPORT = {
    "zoom": 10, "x_min": 546, "x_max": 554, "y_min": 331, "y_max": 339,
}


def tile_viewport(
    tiles: DataFrame,
    zoom: int,
    x_min: int,
    x_max: int,
    y_min: int,
    y_max: int,
) -> DataFrame:
    """Serving-path viewport read (round-4 verdict item 7): one zoom, a
    tile_x/tile_y range — the query a map server issues per screen. Against
    the pipeline's clustered tiles snapshot (partitioned by zoom,
    cluster_by zoom/tile_x/tile_y) the zoom predicate prunes to ONE
    partition directory (measured: FileSourceScan numFiles < table files)
    and the range predicates push into the parquet reader where the
    zoom-led sorted layout makes row-group stats disjoint, so non-viewport
    row groups are skipped from the footer stats alone
    (tests/test_sources.py::test_tile_viewport_serves_from_pruned_files).
    """
    return tiles.filter(
        (F.col("zoom") == int(zoom))
        & F.col("tile_x").between(int(x_min), int(x_max))
        & F.col("tile_y").between(int(y_min), int(y_max))
    )


# ------------------------------------------------------- raster <-> vector

PI = float(np.pi)
DEG_PER_RAD = 180.0 / float(np.pi)


def _inv_mercator_lat(y, n):
    """lat(y) = atan(sinh(pi * (1 - 2*y/n))) in degrees; sinh spelled via exp
    so the DuckDB oracle can use the token-identical expression."""
    z = F.lit(PI) * (F.lit(1.0) - F.lit(2.0) * y / n)
    sinh = (F.exp(z) - F.exp(-z)) / F.lit(2.0)
    return F.atan(sinh) * F.lit(DEG_PER_RAD)


def _inv_mercator_lat_sql(y_expr: str, n_expr: str) -> str:
    z = f"({PI!r} * (1.0 - 2.0 * {y_expr} / {n_expr}))"
    sinh = f"((exp({z}) - exp(-{z})) / 2.0)"
    return f"(atan({sinh}) * {DEG_PER_RAD!r})"


def tile_cell_cover(tiles: DataFrame, res: int) -> DataFrame:
    """Raster -> vector grid: the H3-analog cells covering each mercator tile.

    x is EXACT integer refinement (both grids halve longitude at each level:
    cell columns per tile = 2^(bits - zoom)); y crosses projections
    (mercator tile rows vs equirectangular cell rows) via the inverse
    mercator on the tile's lat bounds. Input (zoom, tile_x, tile_y);
    output one row per covering cell with its packed cell_id.
    """
    from ..config import CELL_RES_BITS

    bits = CELL_RES_BITS[res]
    nb = 1 << bits
    # fac = 2^(bits-zoom) kept as DOUBLE: when zoom > bits a tile is FINER
    # than a cell and fac < 1 — the long cast used to truncate it to 0 and
    # emit a descending [0,-1] x-range with bogus negative cell ids. With the
    # float form, floor(tile_x * fac) is the single covering cell column
    # (floor(tile_x / 2^(zoom-bits))) and the greatest() pins cx1 >= cx0, so
    # both the coarse (range of columns) and fine (one column) cases are
    # exact. Values stay < 2^29, well inside double precision.
    fac = F.pow(F.lit(2.0), (F.lit(bits) - F.col("zoom")))
    n = F.pow(F.lit(2.0), F.col("zoom")).cast("double")
    lat_bottom = _inv_mercator_lat((F.col("tile_y") + 1).cast("double"), n)
    lat_top = _inv_mercator_lat(F.col("tile_y").cast("double"), n)
    y0 = F.least(
        F.greatest(F.floor((lat_bottom + F.lit(90.0)) / F.lit(180.0) * F.lit(float(nb))), F.lit(0)),
        F.lit(nb - 1),
    ).cast("long")
    y1 = F.least(
        F.greatest(F.floor((lat_top + F.lit(90.0)) / F.lit(180.0) * F.lit(float(nb))), F.lit(0)),
        F.lit(nb - 1),
    ).cast("long")
    cx0 = F.floor(F.col("tile_x") * fac).cast("long")
    cx1 = F.greatest(F.floor((F.col("tile_x") + 1) * fac).cast("long") - 1, cx0)
    t = tiles.select(
        "zoom", "tile_x", "tile_y",
        cx0.alias("_cx0"),
        cx1.alias("_cx1"),
        y0.alias("_cy0"), y1.alias("_cy1"),
    )
    c = t.withColumn("_cx", F.explode(F.sequence("_cx0", "_cx1"))).withColumn(
        "_cy", F.explode(F.sequence("_cy0", "_cy1"))
    )
    cell = (
        F.lit(res).cast("long") * F.lit(1 << 58).cast("long")
        + F.col("_cx") * F.lit(1 << 29).cast("long")
        + F.col("_cy")
    )
    return c.select("zoom", "tile_x", "tile_y", cell.alias("cell_id"))


def cell_vector(cells: DataFrame, res: int, cell_col: str = "cell_id") -> DataFrame:
    """Vectorize grid cells: packed cell_id -> geographic bbox + WKT polygon
    (the raster->vector half of the north_rule's 'raster<->vector')."""
    from ..config import CELL_RES_BITS

    bits = CELL_RES_BITS[res]
    n = float(1 << bits)
    # integer-exact decode (shift/mask, NOT float division: cell ids exceed
    # 2^53 so a double quotient would corrupt low bits)
    x = F.shiftright(F.col(cell_col), 29).bitwiseAND(F.lit((1 << 29) - 1))
    y = F.col(cell_col).bitwiseAND(F.lit((1 << 29) - 1))
    d = cells.withColumn("_x", x.cast("double")).withColumn("_y", y.cast("double"))
    lon0 = F.col("_x") / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    lon1 = (F.col("_x") + 1) / F.lit(n) * F.lit(360.0) - F.lit(180.0)
    lat0 = F.col("_y") / F.lit(n) * F.lit(180.0) - F.lit(90.0)
    lat1 = (F.col("_y") + 1) / F.lit(n) * F.lit(180.0) - F.lit(90.0)
    wkt = F.concat_ws(
        "",
        F.lit("POLYGON(("),
        lon0.cast("string"), F.lit(" "), lat0.cast("string"), F.lit(","),
        lon1.cast("string"), F.lit(" "), lat0.cast("string"), F.lit(","),
        lon1.cast("string"), F.lit(" "), lat1.cast("string"), F.lit(","),
        lon0.cast("string"), F.lit(" "), lat1.cast("string"), F.lit(","),
        lon0.cast("string"), F.lit(" "), lat0.cast("string"),
        F.lit("))"),
    )
    return d.select(
        F.col(cell_col),
        lat0.alias("min_lat"), lon0.alias("min_lon"),
        lat1.alias("max_lat"), lon1.alias("max_lon"),
        wkt.alias("wkt"),
    )


def tile_sql(zoom_expr: str, lat_expr: str, lon_expr: str) -> tuple[str, str]:
    """DuckDB (tile_x, tile_y) expressions mirroring with_tile()."""
    n = f"CAST(pow(2.0, {zoom_expr}) AS DOUBLE)"
    tx = (
        f"CAST(least(greatest(floor(({lon_expr} + 180.0) / 360.0 * {n}), 0), "
        f"CAST({n} - 1 AS BIGINT)) AS BIGINT)"
    )
    ty = (
        f"CAST(least(greatest(floor({mercator_y_norm_sql(lat_expr)} * {n}), 0), "
        f"CAST({n} - 1 AS BIGINT)) AS BIGINT)"
    )
    return tx, ty
