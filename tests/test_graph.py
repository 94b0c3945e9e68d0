"""PageRank invariants (value equality vs DuckDB covered by selfcheck)."""

from catme_etl_j_spark.operators.graph import PR_SCALE, graph_pagerank_nations


def test_pagerank_mass_and_order(spark, sf_dir):
    rows = graph_pagerank_nations(spark, sf_dir).collect()
    assert len(rows) == 25
    total = sum(r["rank_e9"] for r in rows)
    # integer floors only ever LOSE mass: sum <= SCALE, but stays close
    assert total <= PR_SCALE
    assert total > PR_SCALE * 0.9
    ranks = [r["rank_e9"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["rank_e9"] > 0 for r in rows)
    for r in rows:
        assert abs(r["rank"] - r["rank_e9"] / PR_SCALE) < 1e-12


def test_common_neighbors_jaccard_bounds(spark, sf_dir):
    from catme_etl_j_spark.operators.graph import graph_common_neighbors

    rows = graph_common_neighbors(spark, sf_dir).collect()
    assert len(rows) == 15
    keys = [(-r["jaccard"], r["nation_a"], r["nation_b"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["nation_a"] < r["nation_b"]
        assert 0 < r["jaccard"] <= 1.0
        assert r["common"] >= 1
