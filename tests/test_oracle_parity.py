"""Driver-style parity: every queries() entry vs its DuckDB oracle at sf0.01."""

import pytest

from tests.conftest import SF_DIR
from wikipedia_wikidata_spark.queries import get_oracle_sql, get_queries

from .conftest import compare_frames

QUERIES = get_queries()
ORACLES = get_oracle_sql()


def test_every_query_has_oracle_or_is_flagged():
    # round 3: every registered query carries a hard DuckDB oracle — the
    # former no-oracle slots (spans_roundtrip digest, checkpoint_lineage
    # stage counts) are oracled now
    missing = [k for k in QUERIES if k not in ORACLES]
    assert not missing, f"queries missing oracles: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    ddf = ddb.execute(ORACLES[name]).fetchdf()
    compare_frames(sdf, ddf, name)
