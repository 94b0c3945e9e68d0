"""Property-based round-trip: random table -> xlsx -> parser -> same data.

Implements the SURVEY.md §5 test-plan item: random tabular data
(unicode, quotes, newlines, sparse cells, numbers, booleans) written by
the fixture writer must come back from the streaming parser exactly.
Pure-Python (no Spark) so hypothesis can run many examples fast.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from catme_etl_j_spark.converter.xlsx import XlsxWorkbook, _format_number
from catme_etl_j_spark.converter.xlsx_writer import write_xlsx

# Text without control chars (XML 1.0 can't carry them) and without
# leading/trailing whitespace ambiguity handled below.
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"),
    ),
    min_size=0,
    max_size=40,
)
_cell = st.one_of(
    st.none(),
    _text,
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12),
    st.booleans(),
)
_row = st.lists(_cell, min_size=0, max_size=6)
_table = st.lists(_row, min_size=1, max_size=12)


def _expected(value):
    if value is None:
        return None
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return _format_number(repr(value))
    return str(value)


@settings(max_examples=60, deadline=None)
@given(_table)
def test_roundtrip(tmp_path_factory, table):
    d = tmp_path_factory.mktemp("prop")
    p = write_xlsx(str(d / "t.xlsx"), {"S": table})
    with XlsxWorkbook(p) as wb:
        got = dict(wb.iter_rows())
    for i, row in enumerate(table):
        want = {
            j: _expected(v) for j, v in enumerate(row) if v is not None
        }
        if i not in got:
            assert not want, (i, want)
            continue
        assert got[i] == want, (i, got[i], want)


@settings(max_examples=30, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_number_roundtrip_general(tmp_path_factory, x):
    d = tmp_path_factory.mktemp("num")
    p = write_xlsx(str(d / "n.xlsx"), {"S": [[x]]})
    with XlsxWorkbook(p) as wb:
        ((_, cells),) = list(wb.iter_rows())
    got = cells[0]
    # parse back: General formatting must preserve the numeric value
    assert math.isclose(float(got), x, rel_tol=1e-15, abs_tol=1e-300)


# Header dedup must be collision-free even when literal "_N" names
# coexist with duplicates — the naive per-name counter emitted [a, a_2,
# a_2] for headers [a, a, a_2], a schema with duplicate columns whose
# NDJSON keys silently collide.
_name = st.text(alphabet=st.sampled_from(list("ab_123")), max_size=5)


@given(st.lists(_name, max_size=10))
@settings(max_examples=500, deadline=None)
def test_dedupe_headers_unique(names):
    from catme_etl_j_spark.converter.reader import _dedupe

    out = _dedupe(names)
    assert len(out) == len(names)
    assert len(set(out)) == len(out), (names, out)
    # an already-unique header list passes through untouched
    if len(set(names)) == len(names):
        assert out == names


def test_dedupe_collision_with_literal_suffix():
    from catme_etl_j_spark.converter.reader import _dedupe

    assert _dedupe(["a", "a", "a_2"]) == ["a", "a_2", "a_2_2"]
    assert _dedupe(["x", "x_2", "x", "x_2"]) == ["x", "x_2", "x_3", "x_2_2"]
    assert _dedupe(["a", "a", "a"]) == ["a", "a_2", "a_3"]
