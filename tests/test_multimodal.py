"""Multimodal plumbing: Arrow-batch UDF output vs pure-Python recompute."""

import duckdb
import pytest

from catme_etl_j_spark.operators.multimodal import (
    FAKE_CODEC,
    decode_media,
    multimodal_fake_features,
)


def test_decode_media_fake_deterministic():
    f = decode_media(b"abc")
    assert f == {"n_bytes": 3, "byte_sum": 294, "byte_min": 97, "byte_max": 99}
    assert decode_media(b"") == {"n_bytes": 0, "byte_sum": 0, "byte_min": 0, "byte_max": 0}


def test_decode_media_real_codec_stubbed():
    with pytest.raises(NotImplementedError, match="media libraries"):
        decode_media(b"\x89PNG", codec="image/png")


def test_resize_plumbing(spark, sf_dir):
    from catme_etl_j_spark.operators.multimodal import multimodal_resize, resize_image

    rows = multimodal_resize(spark, sf_dir, width=4, height=4).collect()
    assert len(rows) == 500
    assert all(r["thumb_bytes"] == 16 and len(bytes(r["thumb"])) == 16 for r in rows)
    assert resize_image(b"ab", 2, 2) == b"abab"
    with pytest.raises(NotImplementedError):
        resize_image(b"x", 2, 2, codec="image/png")


def test_frame_sample_plumbing(spark, sf_dir):
    from catme_etl_j_spark.operators.multimodal import multimodal_frame_sample, sample_frames

    df = multimodal_frame_sample(spark, sf_dir, n_frames=4)
    per_doc = df.groupBy("doc_id").count().collect()
    assert len(per_doc) == 500
    assert all(r["count"] == 4 for r in per_doc)
    assert sample_frames(b"abcdefgh", 4) == [b"ab", b"cd", b"ef", b"gh"]
    assert sample_frames(b"", 4) == []


def test_fake_features_match_python(spark, sf_dir):
    got = {
        r["doc_id"]: (r["n_bytes"], r["byte_sum"], r["byte_min"], r["byte_max"])
        for r in multimodal_fake_features(spark, sf_dir).collect()
    }
    docs = duckdb.sql(f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    assert len(got) == len(docs)
    for doc_id, text in docs:
        b = text.encode("utf-8")
        assert got[doc_id] == (len(b), sum(b), min(b), max(b)), doc_id


def test_ahash_pigeonhole_and_python_recompute(spark, sf_dir):
    """Any near pair must share a 16-bit block (pigeonhole identity is
    what makes the banding complete at hamming<=3), and the signature
    math must match a direct Python recomputation for sampled docs."""
    from catme_etl_j_spark.operators.multimodal import (
        AHASH_NEAR_HAMMING,
        multimodal_ahash_candidates,
    )
    from catme_etl_j_spark.sources.tables import load_table

    rows = multimodal_ahash_candidates(spark, sf_dir).collect()
    assert rows  # banded candidates exist at every SF
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
    assert all(0 <= r["hamming"] <= 64 for r in rows)
    assert all(r["is_near"] == (r["hamming"] <= AHASH_NEAR_HAMMING) for r in rows)

    def py_sig(payload: bytes):
        n = len(payload)
        if n < 64:
            return None
        sums, cnts = [0] * 64, [0] * 64
        for i, byte in enumerate(payload):
            b = (i * 64) // n
            sums[b] += byte
            cnts[b] += 1
        px = [s // c for s, c in zip(sums, cnts)]
        tot = sum(px)
        bits = [1 if 64 * v > tot else 0 for v in px]
        lo = sum(bits[i] << i for i in range(32))
        hi = sum(bits[i + 32] << i for i in range(32))
        return hi, lo

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows[:10]:
        ha, la = py_sig(texts[r["doc_a"]].encode("utf-8"))
        hb, lb = py_sig(texts[r["doc_b"]].encode("utf-8"))
        assert r["hamming"] == bin((ha ^ hb)).count("1") + bin((la ^ lb)).count("1")
        # pigeonhole: the banded join only emits block-sharing pairs
        shares = any(
            ((v1 >> s) & 65535) == ((v2 >> s) & 65535)
            for v1, v2 in ((la, lb), (ha, hb))
            for s in (0, 16)
        )
        assert shares


def test_chunk_manifest_reassembles(spark, sf_dir):
    """The manifest is a proper partition of every payload: offsets
    are contiguous multiples of the chunk size, lengths sum to the
    blob's byte count, exactly one last chunk per doc, and only the
    last chunk may be short."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from catme_etl_j_spark.operators.multimodal import (
        CHUNK_BLOB_BYTES,
        multimodal_chunk_manifest,
    )
    from catme_etl_j_spark.sources.tables import load_table

    rows = multimodal_chunk_manifest(spark, sf_dir).collect()
    sizes = {
        r["doc_id"]: r["nb"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.length(F.encode("text", "UTF-8")).alias("nb"))
        .collect()
    }
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    # every non-empty payload has a manifest; empty payloads have none
    assert set(by_doc) == {d for d, n in sizes.items() if n > 0}
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert [c["offset"] for c in chunks] == [
            i * CHUNK_BLOB_BYTES for i in range(len(chunks))
        ]
        assert sum(c["chunk_bytes"] for c in chunks) == sizes[doc]
        assert [c["is_last"] for c in chunks].count(True) == 1
        assert chunks[-1]["is_last"]
        for c in chunks[:-1]:
            assert c["chunk_bytes"] == CHUNK_BLOB_BYTES
        assert 1 <= chunks[-1]["chunk_bytes"] <= CHUNK_BLOB_BYTES
