"""format("xlsx") Python Data Source vs the mapInPandas reader."""

import pytest

from catme_etl_j_spark.converter.reader import read_xlsx
from catme_etl_j_spark.converter.xlsx_writer import write_xlsx
from catme_etl_j_spark.sources.xlsx_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _norm(df):
    return sorted(
        tuple(r)[1:] for r in df.select(*sorted(df.columns)).collect()
    )  # drop _file (absolute paths differ), order-insensitive


def test_datasource_matches_mapinpandas_reader(spark, tmp_path):
    for i in range(3):
        write_xlsx(
            str(tmp_path / f"f{i}.xlsx"),
            {"S": [["a", "b"], [f"x{i}", str(i)], [None, "only-b"]]},
        )
    via_ds = spark.read.format("xlsx").load(str(tmp_path / "*.xlsx"))
    via_mp = read_xlsx(spark, str(tmp_path / "*.xlsx"))
    assert via_ds.columns == via_mp.columns
    assert _norm(via_ds) == _norm(via_mp)
    assert via_ds.count() == 6


def test_datasource_options(spark, tmp_path):
    write_xlsx(
        str(tmp_path / "o.xlsx"),
        {"First": [["x"], ["1"]], "Second": [["junk"], ["h"], ["v1"], ["v2"]]},
    )
    df = (
        spark.read.format("xlsx")
        .option("sheet_index", 1)
        .option("header_row", 1)
        .load(str(tmp_path / "o.xlsx"))
    )
    assert df.columns[2:] == ["h"]
    assert {r["h"] for r in df.collect()} == {"v1", "v2"}


def test_datasource_filter_pushdown_semantics(spark, tmp_path):
    # filters applied post-scan still work through the DS (strings only)
    write_xlsx(str(tmp_path / "p.xlsx"), {"S": [["k"], ["a"], ["b"], ["c"]]})
    df = spark.read.format("xlsx").load(str(tmp_path / "p.xlsx"))
    assert df.filter(df.k > "a").count() == 2
