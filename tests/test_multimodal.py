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
