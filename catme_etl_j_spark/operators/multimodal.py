"""Multimodal-column plumbing (SURVEY.md §7.5).

Convention for image/audio/video at 100 TB: an opaque ``binary``
payload column plus typed metadata columns, stored in parquet,
processed per-file-parallel. The decode/feature-extract step is a
Pandas-UDF over ``mapInPandas`` (Arrow batch transfer, never
row-at-a-time) — the real media libraries are not in this container,
so the decoder is STUBBED behind ``decode_media`` (deterministic fake;
raises ``NotImplementedError`` for real codecs), but the Spark-side
plumbing — schema, batch iteration, partition parallelism — is real
and tested.

The ``documents.text`` column (UTF-8-encoded to binary) stands in for
the payload so the queries run on driver testdata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catme_etl_j_spark.sources.tables import load_table

FAKE_CODEC = "fake/deterministic"


def decode_media(payload: bytes, codec: str = FAKE_CODEC) -> dict:
    """Stub decoder. Real image/audio decode needs libs absent from this
    container; the deterministic fake keeps the pipeline testable."""
    if codec != FAKE_CODEC:
        raise NotImplementedError(
            f"codec {codec!r} requires media libraries not present in this "
            "environment; only the deterministic fake codec is available"
        )
    # Deterministic "features": byte length, byte sum, min/max byte.
    return {
        "n_bytes": len(payload),
        "byte_sum": sum(payload),
        "byte_min": min(payload) if payload else 0,
        "byte_max": max(payload) if payload else 0,
    }


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload"), F.lit(FAKE_CODEC).alias("codec")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM built-ins."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.substring(F.hex("payload"), 1, 16).alias("head_hex"),
        F.sha2(F.col("payload"), 256).alias("sha256_hex"),
    )


_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substr(hex(encode(text)), 1, 16) AS head_hex,
       sha256(text) AS sha256_hex
FROM documents
"""


def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas.

    The Python decode path handles arbitrary bytes; on the driver
    fixtures the payload is the UTF-8 text, which is pure ASCII at
    every SF (verified: max codepoint 121), so byte arithmetic equals
    codepoint arithmetic and a DuckDB oracle twin pins the Arrow
    plumbing end-to-end on the hash gate. tests/test_multimodal.py
    additionally verifies against a pure-Python recomputation.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    p = _payloads(spark, sf_dir)

    schema = "doc_id long, n_bytes long, byte_sum long, byte_min long, byte_max long"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(bytes(b), c) for b, c in zip(pdf["payload"], pdf["codec"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return p.mapInPandas(extract, schema=schema)


def resize_image(payload: bytes, width: int, height: int, codec: str = FAKE_CODEC) -> bytes:
    """Stub resize. Real codecs need media libs absent here; the fake
    'image' is its payload bytes tiled/truncated to width*height —
    deterministic, shape-correct, and enough to test the plumbing."""
    if codec != FAKE_CODEC:
        raise NotImplementedError(
            f"codec {codec!r} requires media libraries not present in this environment"
        )
    n = width * height
    if not payload:
        return b"\x00" * n
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def sample_frames(payload: bytes, n_frames: int, codec: str = FAKE_CODEC) -> list[bytes]:
    """Stub video frame sampling: split the payload into n_frames evenly
    spaced slices (stand-ins for decoded frames)."""
    if codec != FAKE_CODEC:
        raise NotImplementedError(
            f"codec {codec!r} requires media libraries not present in this environment"
        )
    if not payload or n_frames <= 0:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(min(n_frames, len(payload)))]


def multimodal_resize(spark: SparkSession, sf_dir: str, width: int = 8, height: int = 8) -> DataFrame:
    """Batch resize over mapInPandas: binary in -> fixed-size binary out.

    The schema/batching pattern for any per-item media transform:
    payload column + params -> transformed payload + metadata, Arrow
    both ways, no driver involvement.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    p = _payloads(spark, sf_dir)
    schema = "doc_id long, thumb binary, thumb_bytes long"

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [resize_image(bytes(b), width, height) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                }
            )

    return p.mapInPandas(do_resize, schema=schema)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> DataFrame:
    """Frame sampling with explode: one row per sampled frame — the
    layout a frame-level feature extractor downstream would consume."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    p = _payloads(spark, sf_dir)
    schema = "doc_id long, frame_idx long, frame_bytes long"

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                for i, fr in enumerate(sample_frames(bytes(b), n_frames)):
                    rows.append((int(doc_id), i, len(fr)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return p.mapInPandas(do_sample, schema=schema)


# The frame-sample geometry (step = max(n//4, 1), min(4, n) frames of
# exactly step bytes — python slicing drops the tail remainder) is pure
# arithmetic over the payload length, so the mapInPandas operator gets
# a REAL hash-compared oracle: the SQL recomputes indexes and byte
# counts; frame CONTENT equality is covered by tests/test_multimodal.py.
_FRAME_SQL = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
geo AS (
  SELECT doc_id, greatest(n // 4, 1) AS step, least(4, n) AS nf FROM p)
SELECT doc_id,
       unnest(range(0, nf)) AS frame_idx,
       step AS frame_bytes
FROM geo
"""


def multimodal_resize_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize pipeline HASH-GATED: the same mapInPandas
    resize_image path as multimodal_resize, with the 64-byte tile
    rendered as hex so the oracle can compare content (raw binary
    columns repr differently across engines; hex is canonical). The
    ASCII fixture makes the tile reproducible in SQL as
    repeat(text)[:64] — so the Arrow round-trip AND the tiling
    arithmetic are value-checked end to end, not just row counts.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return multimodal_resize(spark, sf_dir).select(
        "doc_id", F.hex("thumb").alias("thumb_hex"), "thumb_bytes"
    )


# reps = ceil(64/len): repeat() then cut to 64 chars; empty text -> 64
# zero bytes (hex '00' * 64), mirroring resize_image's empty branch.
_RESIZE_HEX_SQL = """
SELECT doc_id,
       CASE WHEN len(text) = 0 THEN repeat('00', 64)
            ELSE hex(encode(substr(repeat(text, CAST(ceil(64.0 / len(text)) AS INTEGER)), 1, 64)))
       END AS thumb_hex,
       CAST(64 AS BIGINT) AS thumb_bytes
FROM documents
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_fake_features": multimodal_fake_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
    "multimodal_resize_hex": multimodal_resize_hex,
}

# Oracle for the fake-codec features: valid because the fixture text
# is pure ASCII (bytes == codepoints); the UDF itself handles any bytes.
_FAKE_FEATURES_SQL = """
WITH b AS (
  SELECT doc_id,
         list_transform(range(1, len(text) + 1), i -> ord(substr(text, i, 1))) AS bs
  FROM documents)
SELECT doc_id,
       CAST(len(bs) AS BIGINT) AS n_bytes,
       CAST(COALESCE(list_sum(bs), 0) AS BIGINT) AS byte_sum,
       CAST(CASE WHEN len(bs) = 0 THEN 0 ELSE list_min(bs) END AS BIGINT) AS byte_min,
       CAST(CASE WHEN len(bs) = 0 THEN 0 ELSE list_max(bs) END AS BIGINT) AS byte_max
FROM b
"""

ORACLES = {
    "multimodal_meta": _META_SQL,
    "multimodal_frame_sample": _FRAME_SQL,
    "multimodal_fake_features": _FAKE_FEATURES_SQL,
    "multimodal_resize_hex": _RESIZE_HEX_SQL,
    # multimodal_resize: intentionally no oracle (raw binary tile
    # output); its CONTENT is hash-gated via multimodal_resize_hex and
    # covered by tests/test_multimodal.py.
}
