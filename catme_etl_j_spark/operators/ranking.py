"""Term-weighting / retrieval ranking over the documents corpus.

TF-IDF and BM25 are the standard lexical relevance scores a training-
data pipeline uses for corpus curation (query-based filtering, topical
sampling, boilerplate down-weighting). Both are pure DataFrame
aggregation pipelines: tokenize -> per-(doc, term) counts -> corpus
statistics -> score. Joins whose build side is genuinely bounded
(per-TERM stats, the 1-row N / avgdl aggregates) are broadcast; the
per-DOCUMENT length table is NOT — it grows with the corpus, so it
joins as a plain shuffle join co-partitioned with the per-(doc, term)
stream on doc_id (both sides already hash on it; the exchange is
reused).

Cross-engine determinism: IEEE +,*,/ are bit-identical across engines;
``ln`` may differ in the last ulp, so ranks are taken over the
FIXED-POINT (1e4) score with a term/doc tie-break, and the same
fixed-point value is the displayed score — both engines round the same
way except within ~1e-11 of a rounding boundary (see
functions/numeric.py for the rationale; corpus_doc_frequency set the
precedent for ln-on-the-gate).

The reference (waldfalke/catme-etl-j) has no analytics operators
(SURVEY.md §2.4); this extends the engine's own training-data surface.

100 TB posture: the term-stats side (df per term, avgdl) is tiny and
broadcast; the per-(doc, term) aggregate map-side combines on a key
whose cardinality is bounded by sum(doc lengths); no all-pairs
anything. The BM25 probe filters to query terms BEFORE the tf
aggregate, so the big exploded stream is pruned immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from catme_etl_j_spark.sources.tables import load_table

TFIDF_TOP_PER_DOC = 5
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20
BM25_QUERY_TERMS = ("join", "vector", "stream")


def rank_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per document by smoothed TF-IDF.

    score = tf * (ln((N + 1) / (df + 1)) + 1), reported and ranked as
    floor(score * 1e4 + 0.5) fixed-point; rank ties break on term ASC.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    # 1-row corpus size as a broadcast aggregate — no driver-side
    # .count() action; the scalar folds into the one plan.
    ndf = docs.agg(F.count("*").alias("n_docs"))
    pairs = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("term")
        )
        .filter("term <> ''")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = pairs.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        pairs.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(ndf))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr(
                "CAST(floor(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)"
                " * 10000.0 + 0.5) AS BIGINT)"
            ).alias("score_fp"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_fp"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_PER_DOC)
        .select(
            "doc_id",
            "rn",
            "term",
            "tf",
            "df",
            F.expr("CAST(score_fp AS DOUBLE) / 10000.0").alias("tfidf"),
        )
    )


_TFIDF_SQL = f"""
WITH pairs AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS term
    FROM documents) u
  WHERE term <> ''
  GROUP BY doc_id, term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dfs AS (SELECT term, COUNT(*)::BIGINT AS df FROM pairs GROUP BY term),
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         CAST(floor(p.tf * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0)
              * 10000.0 + 0.5) AS BIGINT) AS score_fp
  FROM pairs p JOIN dfs d ON p.term = d.term, n),
ranked AS (
  SELECT doc_id, term, tf, df, score_fp,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_fp DESC, term ASC) AS rn
  FROM scored)
SELECT doc_id, rn, term, tf, df,
       CAST(score_fp AS DOUBLE) / 10000.0 AS tfidf
FROM ranked WHERE rn <= {TFIDF_TOP_PER_DOC}
"""


def rank_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) of every document against the fixed
    query ``join vector stream``; top-20 docs by fixed-point score with
    doc_id tie-break.

    idf uses the standard smoothed form ln(1 + (N - df + 0.5) /
    (df + 0.5)); dl/avgdl is exact rational arithmetic. The exploded
    term stream is filtered to the query terms BEFORE the tf aggregate,
    so at scale the heavy stream prunes to 3 terms' worth of rows.

    Join strategy at 100 TB: ``qdf`` (<= |query| rows), ``avgdl`` and
    the corpus count (1 row each) broadcast; ``dl`` is one row per
    DOCUMENT — it grows with the corpus and must NOT be broadcast, so
    it joins as a plain shuffle join on doc_id, co-partitioned with
    the qtf side (both hash on doc_id; AQE reuses the exchange).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    ndf = docs.agg(F.count("*").alias("n_docs"))
    q = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("term")
    ).filter("term <> ''")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl")
    )
    qtf = (
        toks.filter(f"term IN ({q})")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    qdf = qtf.groupBy("term").agg(F.count("*").alias("df"))
    parts = (
        qtf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")  # per-doc side: plain shuffle join, never broadcast
        .crossJoin(F.broadcast(avgdl))
        .crossJoin(F.broadcast(ndf))
        .select(
            "doc_id",
            F.expr(
                f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))"
                f" * (tf * ({BM25_K1} + 1.0))"
                f" / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
            ).alias("part"),
        )
    )
    scored = parts.groupBy("doc_id").agg(
        F.expr("CAST(floor(SUM(part) * 10000.0 + 0.5) AS BIGINT)").alias(
            "score_fp"
        )
    )
    return (
        scored.orderBy(F.desc("score_fp"), F.asc("doc_id"))
        .limit(BM25_TOP)
        .select(
            "doc_id",
            F.expr("CAST(score_fp AS DOUBLE) / 10000.0").alias("bm25"),
        )
    )


_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), ' +')) AS term
    FROM documents) u
  WHERE term <> ''),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
qtf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks
  WHERE term IN ({", ".join("'" + t + "'" for t in BM25_QUERY_TERMS)})
  GROUP BY doc_id, term),
qdf AS (SELECT term, COUNT(*)::BIGINT AS df FROM qtf GROUP BY term),
parts AS (
  SELECT q.doc_id,
         ln(1.0 + (n.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (q.tf * ({BM25_K1} + 1.0))
           / (q.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * d.dl / a.avgdl))
           AS part
  FROM qtf q
  JOIN qdf f ON q.term = f.term
  JOIN dl d ON q.doc_id = d.doc_id, n, avgdl a),
scored AS (
  SELECT doc_id,
         CAST(floor(SUM(part) * 10000.0 + 0.5) AS BIGINT) AS score_fp
  FROM parts GROUP BY doc_id)
SELECT doc_id, CAST(score_fp AS DOUBLE) / 10000.0 AS bm25
FROM scored ORDER BY score_fp DESC, doc_id ASC LIMIT {BM25_TOP}
"""


POSTINGS_TOP = 20


def rank_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: for the POSTINGS_TOP highest-df
    terms, the full sorted posting list (doc ids) as an array column —
    the retrieval-side data structure BM25/TF-IDF queries probe.

    Scale shape: explode -> distinct (doc, term) -> per-term aggregate
    with ``sort_array(collect_list(...))``; posting lists live one per
    term key, so the shuffle is on the term and each task materializes
    only its own terms' lists. (At web scale, cap or shard giant
    stopword postings — here the top-k selection itself bounds output.)
    Arrays hash-compare: DuckDB builds the same list with
    ``list(... ORDER BY ...)``.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    pairs = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), " +")).alias("term"))
        .filter("term <> ''")
        .distinct()
    )
    per_term = pairs.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    return per_term.orderBy(F.desc("df"), F.asc("term")).limit(POSTINGS_TOP)


_POSTINGS_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), ' +')) AS term
  FROM documents),
clean AS (SELECT * FROM pairs WHERE term <> '')
SELECT term, COUNT(*) AS df,
       list(doc_id ORDER BY doc_id) AS postings
FROM clean GROUP BY term
ORDER BY df DESC, term ASC
LIMIT {POSTINGS_TOP}
"""


QUERIES = {
    "rank_tfidf_topterms": rank_tfidf_topterms,
    "rank_bm25_search": rank_bm25_search,
    "rank_postings": rank_postings,
}

ORACLES = {
    "rank_tfidf_topterms": _TFIDF_SQL,
    "rank_bm25_search": _BM25_SQL,
    "rank_postings": _POSTINGS_SQL,
}
