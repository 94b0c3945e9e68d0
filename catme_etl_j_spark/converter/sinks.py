"""Converter sinks: NDJSON (W2), chunked CSV (W1), JSON array (W3).

Reference behaviors reproduced (SURVEY.md §2.3) and the deliberate
divergences (§7.7.4), per sink:

* NDJSON — native ``df.write.json`` (Spark's JSON sink IS ndjson).
  Absent cells are omitted from each object (EasyExcel-path parity;
  Spark drops null fields by default); present-but-blank cells are
  ``""``. Single-file parity mode orders by ``_row_idx`` and renames
  the lone part file. The reference's per-row flush
  (NdjsonDataWriter.java:145-147) is a perf anti-feature with no Spark
  analog — buffering is the task commit protocol's job.
* CSV — chunk files named ``<inputbase>-chunk-N.csv``, N starting at 1
  (code behavior, CsvDataWriter.java:83 — the contract says 0; code
  wins, SURVEY.md §2.3 W1), header re-written per chunk, rotation every
  ``batch_size`` rows via ``maxRecordsPerFile``. Sparse rows are PADDED
  (divergence: the reference concatenates present values and misaligns
  columns, CsvDataWriter.java:153-165).
* JSON array — no native Spark sink; streamed on the driver via
  ``toLocalIterator`` (bounded memory, never ``collect()`` —
  SURVEY.md §7.7.5), with optional ``pretty_print``.
* ``overwrite`` gate refuses to clobber existing output otherwise
  (W5; NdjsonDataWriter.java:73-77).

Scale note: the ordered single-file modes exist for reference parity
on modest outputs; at 100 TB use ``single_file=False`` (NDJSON) which
becomes a plain parallel partitioned ``df.write.json``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

from catme_etl_j_spark.converter.errors import ConversionError

# Meta columns carried by the reader for ordering/provenance; listed in
# sort order. _sheet_idx/_sheet appear only on multi-sheet reads
# (drop/order handle their absence).
META_COLS = ("_file", "_sheet_idx", "_sheet", "_row_idx")


def _check_overwrite(path: str, overwrite: bool) -> None:
    if os.path.exists(path):
        if not overwrite:
            raise ConversionError(
                f"output {path!r} exists and overwrite=False (use --overwrite)"
            )
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


def _data_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in META_COLS]


def _ordered_single(df: DataFrame) -> DataFrame:
    """One partition in sheet order, WITHOUT ``orderBy``: a global sort
    range-samples its input, which re-executes the whole upstream parse
    a second time. ``repartition(1)`` keeps the parse parallel and
    single-pass; ``sortWithinPartitions`` then gives total order on the
    lone partition."""
    cols = [c for c in META_COLS if c in df.columns]
    if not cols:
        return df.coalesce(1)
    return df.repartition(1).sortWithinPartitions(*cols)


def _count_lines(*paths: str) -> int:
    n = 0
    for p in paths:
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                n += chunk.count(b"\n")
    return n


def _count_csv_records(*paths: str) -> int:
    """Newlines OUTSIDE quoted fields — cell values containing embedded
    newlines are quoted multi-line by Spark's CSV writer, so a raw line
    count would over-report rows. Quote state toggles on every '\"'
    (escaped quotes are doubled, so the two toggles cancel)."""
    n = 0
    for p in paths:
        in_quote = False
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                for part in chunk.split(b'"'):
                    if not in_quote:
                        n += part.count(b"\n")
                    in_quote = not in_quote
                in_quote = not in_quote  # last split part has no quote after it
    return n


def _write_ndjson_partition_ordered(df: DataFrame, output: str) -> int:
    """Ordered single-file NDJSON from a frame whose PARTITIONS are
    already in global row order with rows ordered inside each (the
    slice-parallel reader's contract — one partition per byte slice,
    slices in sheet order): drop the meta columns and let every task
    stream its partition straight to a JSON part file — NO exchange,
    NO sort — then concatenate the part files in partition order.
    Byte-identical to the serial repartition(1)+sort write (r12: this
    replaces the r11 bucketed sink, which re-shuffled every row by a
    _row_idx bucket and re-sorted what the parse tasks already emit in
    order). Empty partitions write no part file; the remaining names
    still sort in partition order."""
    tmp = tempfile.mkdtemp(prefix="ndjson_", dir=os.path.dirname(os.path.abspath(output)))
    try:
        df.drop(*META_COLS).write.mode("overwrite").json(tmp)
        parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
        with open(output, "wb") as out:
            for part in parts:
                with open(part, "rb") as src:
                    shutil.copyfileobj(src, out, 1 << 20)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return _count_lines(output)


def write_ndjson(
    df: DataFrame,
    output: str,
    *,
    overwrite: bool = False,
    single_file: bool = True,
    slice_ordered: bool | None = None,
) -> int:
    """Write NDJSON; returns rows written. ``single_file=False`` is the
    scale path: parallel partitioned write, `output` becomes a dir.

    ``slice_ordered``: the frame's partitions are already in global row
    order (the slice-parallel reader's contract) so the single-file
    sink may skip its sort. ``convert()`` threads it explicitly; when
    None the reader's ``_catme_slice_ordered`` attribute is consulted
    (lost by any intervening transformation, which safely lands on the
    sorting path).

    Rows-written is counted from the OUTPUT files (cheap local line
    count), not via df.count() — counting the frame would re-execute
    the whole read pipeline a second time."""
    _check_overwrite(output, overwrite)
    if not single_file:
        df.drop(*META_COLS).write.mode("overwrite").json(output)
        return _count_lines(*glob.glob(os.path.join(output, "part-*")))
    if slice_ordered is None:
        slice_ordered = bool(getattr(df, "_catme_slice_ordered", False))
    if slice_ordered:
        return _write_ndjson_partition_ordered(df, output)
    tmp = tempfile.mkdtemp(prefix="ndjson_", dir=os.path.dirname(os.path.abspath(output)))
    try:
        (_ordered_single(df).drop(*META_COLS).write.mode("overwrite").json(tmp))
        parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
        if not parts:  # zero-row frame: Spark may emit no part file
            open(output, "w").close()
        else:
            shutil.move(parts[0], output)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return _count_lines(output)


def write_csv_chunks(
    df: DataFrame,
    input_base: str,
    temp_dir: str = "data/temp",
    *,
    batch_size: int = 50_000,
    overwrite: bool = False,
) -> list[str]:
    """Write ``<temp_dir>/<input_base>-chunk-N.csv`` files; returns them
    in order. ``--output`` is ignored for CSV, as in the reference
    (ConverterConfig.java:34)."""
    os.makedirs(temp_dir, exist_ok=True)
    existing = glob.glob(os.path.join(temp_dir, f"{input_base}-chunk-*.csv"))
    if existing:
        if not overwrite:
            raise ConversionError(
                f"chunk files for {input_base!r} already exist in {temp_dir!r} "
                "and overwrite=False"
            )
        for p in existing:
            os.remove(p)
    tmp = tempfile.mkdtemp(prefix="csv_", dir=temp_dir)
    try:
        (
            _ordered_single(df)
            .drop(*META_COLS)
            .write.mode("overwrite")
            .option("header", True)
            .option("maxRecordsPerFile", batch_size)
            .csv(tmp)
        )
        parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
        outs = []
        for i, p in enumerate(parts, start=1):  # chunk index starts at 1
            dst = os.path.join(temp_dir, f"{input_base}-chunk-{i}.csv")
            shutil.move(p, dst)
            outs.append(dst)
        return outs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_json_array(
    df: DataFrame, output: str, *, overwrite: bool = False, pretty_print: bool = False
) -> int:
    """Single ``[ {...}, ... ]`` file, streamed row-by-row on the driver
    (toLocalIterator pulls one partition at a time — bounded memory)."""
    _check_overwrite(output, overwrite)
    cols = _data_cols(df)
    n = 0
    with open(output, "w", encoding="utf-8") as f:
        f.write("[")
        first = True
        for row in _ordered_single(df).toLocalIterator():
            obj = {c: row[c] for c in cols if row[c] is not None}
            text = json.dumps(obj, ensure_ascii=False, indent=2 if pretty_print else None)
            if pretty_print:
                text = "\n" + "\n".join("  " + line for line in text.splitlines())
            f.write("," if not first else "")
            f.write(text)
            first = False
            n += 1
        f.write("\n]" if (pretty_print and n) else "]")
    return n
