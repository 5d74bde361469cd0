"""Property-based tests (hypothesis) for the pure-Python kernels.

The reference has no property tests (SURVEY §5); these fuzz the parts with
real grammar/arithmetic surface area.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from wikipedia_wikidata_spark.sources.mysqldump import parse_insert_line

# characters mysqldump escapes inside quoted strings + grammar metacharacters
TRICKY = "(),'\\\"\n\r\t\0\x1a `NULL;=%_"


def render_field(v) -> str:
    """Render one field exactly the way mysqldump does."""
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return str(v)
    s = (
        v.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
        .replace("\0", "\\0")
        .replace("\x1a", "\\Z")
    )
    return f"'{s}'"


field = st.one_of(
    st.none(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.text(
        alphabet=st.one_of(
            st.sampled_from(TRICKY),
            st.characters(codec="utf-8", exclude_categories=("Cs",)),
        ),
        max_size=30,
    ),
)
row = st.lists(field, min_size=1, max_size=4)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=4).flatmap(
    lambda width: st.lists(
        st.lists(field, min_size=width, max_size=width), min_size=1, max_size=5
    )
))
def test_mysqldump_insert_roundtrip(rows):
    """render(rows) -> parse == rows, for adversarial field content
    (quotes, backslashes, parens, commas, control chars, 'NULL' text)."""
    line = "INSERT INTO `page` VALUES " + ",".join(
        "(" + ",".join(render_field(f) for f in r) + ")" for r in rows
    ) + ";"
    parsed = parse_insert_line(line, table="page")
    expected = [
        [None if f is None else str(f) for f in r] for r in rows
    ]
    assert parsed == expected, (line, parsed, expected)


@settings(max_examples=200, deadline=None)
@given(st.lists(row, min_size=1, max_size=3))
def test_mysqldump_table_filter(rows):
    """Rows for other tables must be ignored; same grammar."""
    line = "INSERT INTO `other` VALUES " + ",".join(
        "(" + ",".join(render_field(f) for f in r) + ")" for r in rows
    ) + ";"
    assert parse_insert_line(line, table="page") == []
