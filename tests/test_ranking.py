"""TF-IDF / BM25 ranking invariants (oracle equality is covered by
selfcheck; these assert the semantic guarantees)."""

from catme_etl_j_spark.operators.ranking import (
    BM25_TOP,
    TFIDF_TOP_PER_DOC,
    rank_bm25_search,
    rank_tfidf_topterms,
)


def test_tfidf_top_terms_shape(spark, sf_dir):
    rows = rank_tfidf_topterms(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        assert 1 <= r["rn"] <= TFIDF_TOP_PER_DOC
        assert r["tf"] >= 1 and r["df"] >= 1
        assert r["tfidf"] > 0
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["rn"])
        scores = [r["tfidf"] for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_bm25_descending_and_positive(spark, sf_dir):
    rows = rank_bm25_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_bm25_rewards_matching_terms(spark, sf_dir):
    """Every returned doc must actually contain a query term."""
    from pyspark.sql import functions as F

    from catme_etl_j_spark.operators.ranking import BM25_QUERY_TERMS
    from catme_etl_j_spark.sources.tables import load_table

    top = rank_bm25_search(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = top.join(docs, "doc_id").select("doc_id", "text").collect()
    assert len(joined) == top.count()
    for r in joined:
        words = set(r["text"].split())
        assert words & set(BM25_QUERY_TERMS)


def test_rrf_fusion_blends_both_rankers(spark, sf_dir):
    """Fused top-20 must draw on both lists and score by the integer
    RRF identity."""
    from catme_etl_j_spark.operators.ranking import RRF_K, RRF_SCALE, rank_rrf_fusion

    rows = rank_rrf_fusion(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        expect = 0
        if r["r_bm25"] is not None:
            expect += RRF_SCALE // (RRF_K + r["r_bm25"])
        if r["r_cos"] is not None:
            expect += RRF_SCALE // (RRF_K + r["r_cos"])
        assert r["rrf_e9"] == expect
    # at least one doc ranked by each signal made the cut
    assert any(r["r_bm25"] is not None for r in rows)
    assert any(r["r_cos"] is not None for r in rows)


def test_ndcg_bounds_and_ideal_dominance(spark, sf_dir):
    """nDCG in (0,1]; the ideal prefix DCG dominates the actual at
    every k; relevance grades within 0..|query|."""
    from catme_etl_j_spark.operators.ranking import (
        BM25_QUERY_TERMS,
        rank_ndcg_eval,
    )

    rows = rank_ndcg_eval(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["rel"] <= len(BM25_QUERY_TERMS)
        assert 0.0 < r["ndcg_at_k"] <= 1.0
        assert r["dcg_cum_e9"] <= r["idcg_cum_e9"]
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, 21))


def test_vector_index_delegates_to_gated_queries(spark, sf_dir):
    """The fluent facade must return exactly what the gated operators
    return (same rows, same order), and the filtered path must agree
    with ann_filtered_topk's pre-filter column set."""
    from catme_etl_j_spark.operators.similarity import (
        ANN_FILTER_MOD,
        ann_filtered_topk,
        ann_topk_bruteforce,
    )
    from catme_etl_j_spark.vector import VectorIndex

    idx = VectorIndex(spark, sf_dir)
    assert (
        idx.topk(10, strategy="exact").collect()
        == ann_topk_bruteforce(spark, sf_dir).collect()
    )
    filtered = idx.topk(10, where=f"label % {ANN_FILTER_MOD} = 0").collect()
    audit = ann_filtered_topk(spark, sf_dir).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in filtered] == [
        (r["vec_id"], r["cos_sim"]) for r in audit
    ]
    import pytest

    with pytest.raises(ValueError):
        idx.topk(10, strategy="ivf", where="label = 1")
    with pytest.raises(ValueError):
        idx.topk(10, strategy="nope")
    assert idx.recall_at_k().count() >= 1


def test_batch_topk_consistent_with_single(spark, sf_dir):
    """Query 0's batch results must equal the single-query brute-force
    top-3; every query gets exactly BATCH_TOP ranked rows."""
    from catme_etl_j_spark.operators.similarity import (
        BATCH_Q,
        BATCH_TOP,
        ann_batch_topk,
        ann_topk_bruteforce,
    )

    rows = ann_batch_topk(spark, sf_dir).collect()
    assert len(rows) == BATCH_Q * BATCH_TOP
    q0 = [(r["vec_id"], r["cos_sim"]) for r in rows if r["qid"] == 0]
    single = ann_topk_bruteforce(spark, sf_dir).collect()[:BATCH_TOP]
    assert q0 == [(r["vec_id"], r["cos_sim"]) for r in single]
    for qid in range(BATCH_Q):
        ranks = [r["rank"] for r in rows if r["qid"] == qid]
        assert ranks == list(range(1, BATCH_TOP + 1))


def test_mrr_eval_bounds(spark, sf_dir):
    """n_hit <= n_queries = MRR_Q; mrr_e9 bounded by 1e9 and 0; a
    hit-for-every-query corpus gives mrr >= 1e9/MRR_DEPTH."""
    from catme_etl_j_spark.operators.similarity import MRR_Q, MRR_DEPTH, rank_mrr_eval

    [r] = rank_mrr_eval(spark, sf_dir).collect()
    assert r["n_queries"] == MRR_Q
    assert 0 <= r["n_hit"] <= r["n_queries"]
    assert 0 <= r["mrr_e9"] <= 1_000_000_000
    if r["n_hit"] == r["n_queries"]:
        assert r["mrr_e9"] >= 1_000_000_000 // MRR_DEPTH // 2
