"""CLI surface (in-process; the session is shared via getOrCreate)."""

from catme_etl_j_spark.converter.cli import build_parser, main
from catme_etl_j_spark.converter.xlsx_writer import write_xlsx


def test_cli_ndjson(spark, tmp_path, capsys):
    p = write_xlsx(str(tmp_path / "c.xlsx"), {"S": [["k", "v"], ["a", "1"], ["b", "2"]]})
    out = str(tmp_path / "o.ndjson")
    rc = main(["--input", p, "--format", "NDJSON", "--output", out, "--overwrite"])
    assert rc == 0
    assert "rows=2" in capsys.readouterr().out
    assert len(open(out).readlines()) == 2


def test_cli_error_paths(spark, tmp_path, capsys):
    p = write_xlsx(str(tmp_path / "c.xlsx"), {"S": [["k"], ["a"]]})
    # missing output for NDJSON -> exit 2 with message
    rc = main(["--input", p, "--format", "NDJSON"])
    assert rc == 2
    assert "output is required" in capsys.readouterr().err
    # bad sheet -> exit 2 listing sheets
    rc = main(
        ["--input", p, "--format", "NDJSON", "--output", str(tmp_path / "x"), "--sheetName", "Nope"]
    )
    assert rc == 2
    assert "available sheets" in capsys.readouterr().err


def test_cli_accepts_ignored_reference_flags(spark, tmp_path):
    p = write_xlsx(str(tmp_path / "c.xlsx"), {"S": [["k"], ["a"]]})
    rc = main(
        [
            "--input", p, "--format", "NDJSON",
            "--output", str(tmp_path / "o2.ndjson"),
            "--strategy-hint", "USER_MODEL_EVENT",
            "--mem-threshold", "100",
            "--date-format", "yyyy-mm-dd",
            "--verbose",
        ]
    )
    assert rc == 0


def test_parser_flag_surface_matches_reference():
    # SURVEY.md §2.5 option inventory
    opts = {a.option_strings[0] for a in build_parser()._actions if a.option_strings}
    for flag in (
        "--input", "--output", "--format", "--sheetName", "--batchSize",
        "--continueOnError", "--temp-dir", "--mem-threshold",
        "--min-inflate-ratio", "--sheet-index", "--header-row",
        "--date-format", "--verbose", "--overwrite", "--strategy-hint",
        "--pretty-print",
    ):
        assert flag in opts, flag


def test_csv_rows_written_with_embedded_newlines(spark, tmp_path):
    """Quoted multi-line cells must not inflate rows_written."""
    from catme_etl_j_spark.converter import convert
    from catme_etl_j_spark.converter.xlsx_writer import write_xlsx

    rows = [["id", "note"]] + [[str(i), f"line1\nline2 {i}"] for i in range(10)]
    p = write_xlsx(str(tmp_path / "nl.xlsx"), {"S": rows})
    result = convert(p, "CSV", temp_dir=str(tmp_path / "out"), spark=spark)
    assert result.rows_written == 10


def test_config_file_service_mode(spark, tmp_path, monkeypatch):
    """The contract's converter.yml service mode: config supplies the
    run, CLI flags override, unknown keys fail loudly."""
    import json as _json

    from catme_etl_j_spark.converter.cli import main
    from catme_etl_j_spark.converter.config import load_config
    from catme_etl_j_spark.converter.errors import ConversionError
    from catme_etl_j_spark.converter.xlsx_writer import write_xlsx

    xlsx = write_xlsx(str(tmp_path / "c.xlsx"), {"S": [["a"], ["x"], ["y"]]})
    out = str(tmp_path / "out.ndjson")
    cfg = tmp_path / "converter.yml"
    cfg.write_text(
        f"input: {xlsx}\noutput: {out}\nformat: ndjson\nbatchSize: 10000\n"
    )
    assert main(["--config", str(cfg)]) == 0
    lines = [_json.loads(ln) for ln in open(out).read().splitlines() if ln]
    assert [r["a"] for r in lines] == ["x", "y"]

    # CLI flag overrides the file's output
    out2 = str(tmp_path / "out2.ndjson")
    assert main(["--config", str(cfg), "--output", out2, "--overwrite"]) == 0
    assert [_json.loads(ln)["a"] for ln in open(out2).read().splitlines() if ln] == ["x", "y"]

    # env-var analog of -Dconfig.path
    out3 = str(tmp_path / "out3.ndjson")
    cfg3 = tmp_path / "c3.yml"
    cfg3.write_text(f"input: {xlsx}\noutput: {out3}\nformat: ndjson\n")
    monkeypatch.setenv("CATME_CONVERTER_CONFIG", str(cfg3))
    assert main([]) == 0

    # unknown keys are an error
    bad = tmp_path / "bad.yml"
    bad.write_text("inptu: typo.xlsx\n")
    import pytest as _pytest

    with _pytest.raises(ConversionError, match="unknown config key"):
        load_config(str(bad))


def test_cli_requires_input_and_format(tmp_path):
    from catme_etl_j_spark.converter.cli import main

    assert main([]) == 2


def test_run_query_list_and_show(capsys):
    from catme_etl_j_spark.run_query import main

    assert main(["--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q01_pricing_summary" in names and len(names) >= 150
    assert main(["q01_pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
                 "--format", "show", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out


def test_run_query_errors(capsys):
    from catme_etl_j_spark.run_query import main

    assert main(["q01_priczng_summary"]) == 2
    assert "did you mean" in capsys.readouterr().err
    assert main(["q01_pricing_summary", "--format", "parquet"]) == 2


def test_run_query_writes_ndjson(tmp_path):
    import json

    from catme_etl_j_spark.run_query import main

    out = str(tmp_path / "out")
    assert main(["q01_pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
                 "--format", "ndjson", "--output", out]) == 0
    import glob as g

    rows = []
    for f in g.glob(f"{out}/part-*"):
        rows += [json.loads(l) for l in open(f) if l.strip()]
    assert len(rows) == 6
    assert {r["l_returnflag"] for r in rows} <= {"A", "N", "R"}


def test_run_query_explain_flag(capsys):
    from catme_etl_j_spark.run_query import main

    rc = main(["q06_revenue_delta", "--sf-dir", "/root/testdata/sf0.001", "--explain"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out
    assert "Scan parquet" in out
