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
