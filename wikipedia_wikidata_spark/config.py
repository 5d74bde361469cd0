"""Shared configuration for the PySpark-native spatial importance engine.

Models the reference's config surface (``/root/reference/config/languages.txt``,
``config/wikidata_place_type_levels.csv``) as small Python constants that become
broadcast DataFrames. The sandbox build uses a 4-language subset (the reference's
CI uses a 2-language subset the same way, ``.github/workflows/ci.yml``).
"""

from __future__ import annotations

# Languages included in the build (reference: config/languages.txt:1-40 holds 39;
# lib/languages.py:4-12 reads them; CI overrides to a subset).
LANGUAGES: list[str] = ["en", "de", "bar", "li"]

# Languages that appear in dumps but are filtered out (dirty data for tests).
EXCLUDED_LANGUAGES: list[str] = ["fr", "xx"]

# Unit separator used inside span text payloads (FIXTURES.md §1).
SEP = "\x1f"

# Place-type → ontology level. Mirrors the *shape* of
# config/wikidata_place_type_levels.csv (place_type,level) without copying its
# 199 rows; levels chosen to exercise MAX(ont_level) tie-breaks
# (steps/wikidata_process.sh:44-66).
PLACE_TYPE_LEVELS: list[tuple[str, int]] = [
    ("Q515", 14),      # city-like
    ("Q6256", 2),      # country-like
    ("Q486972", 16),   # settlement-like
    ("Q8502", 12),     # mountain-like
    ("Q4022", 12),     # river-like
    ("Q23397", 10),    # lake-like
    ("Q34442", 20),    # road-like
    ("Q532", 18),      # village-like
    ("Q3957", 15),     # town-like
    ("Q46831", 11),    # range-like
]

# Place types that appear in the dump but have no level row (=> NULL ont_level,
# exercised by steps/wikidata_process.sh:44-48 leaving ont_level NULL).
UNLEVELED_PLACE_TYPES: list[str] = ["Q99999", "Q88888"]

ALL_PLACE_TYPES: list[str] = [t for t, _ in PLACE_TYPE_LEVELS] + UNLEVELED_PLACE_TYPES

# Importance floor (steps/wikidata_process.sh:156; README.md:71).
IMPORTANCE_FLOOR = 1e-10

# Cell-codec resolutions: H3-analog grid bit-widths per resolution.
# Chosen so cell edge ~ H3 res 5-9 edge lengths (8.5km/3.2km/1.2km/460m/174m):
# 360deg / 2^bits ~= edge_km / 111km.
CELL_RES_BITS: dict[int, int] = {5: 12, 6: 14, 7: 15, 8: 17, 9: 18}

# S2-analog (Morton / Z-order) fixed level.
MORTON_BITS = 16

# Web-mercator tile zoom levels for the tile pyramid.
TILE_ZOOMS: list[int] = [4, 6, 8, 10]

# Skew handling: cells with more than this many points get salted in the
# spatial join (north_rule: "partitioning / shuffle / skew handled explicitly").
MEGA_CELL_THRESHOLD = 20_000
MEGA_CELL_SALT = 8


def spans_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our synthesized
    interleaved-documents dir (/root/repo/data/spans_sf0.01)."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    if not tag.startswith("sf"):
        tag = "sf0.01"
    return f"/root/repo/data/spans_{tag}"


def sf_of(sf_dir: str) -> float:
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tag[2:])
    except (ValueError, IndexError):
        return 0.01
