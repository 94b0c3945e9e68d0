"""Corpus-level operators for training-data pipelines.

The other half of the North-Star text surface (operators/text.py is
per-document): corpus-wide term statistics, PII scrubbing, and
deterministic corpus splitting — the operations that precede/follow
dedup in an LLM data pipeline. All built-ins, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catme_etl_j_spark.functions.numeric import rdet, rdet_sql
from catme_etl_j_spark.sources.tables import load_table

# RE2-safe (and Java-regex-identical) patterns — keep to character
# classes and bounded quantifiers so both engines match byte-for-byte.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9./_%?&=#-]+"

TOP_TERMS = 50
EVAL_PCT = 10  # percent of docs routed to the eval split


def corpus_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequencies, top-k — the canonical map-reduce.

    Scale shape: explode -> partial count (map-side combine) -> final
    count -> per-partition top-k merge. No driver-side loops.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    words = F.explode(F.split(F.trim("text"), " +")).alias("word")
    counts = docs.select(words).groupBy("word").agg(F.count("*").alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(TOP_TERMS)


_WORD_COUNTS_SQL = f"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS word FROM documents) t
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT {TOP_TERMS}
"""


def corpus_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency + smoothed IDF per term (distinct per doc)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # one scalar action; reused as a literal
    terms = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " +"))).alias("word"),
    )
    df_counts = terms.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    idf = rdet(F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6)
    return (
        df_counts.select("word", "df", idf.alias("idf"))
        .orderBy(F.desc("df"), F.asc("word"))
        .limit(TOP_TERMS)
    )


_DOC_FREQ_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), ' +'))) AS word
  FROM documents),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dfc AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY word)
SELECT word, df,
       {rdet_sql("ln((n.n_docs + 1.0) / (df + 1.0))", 6)} AS idf
FROM dfc, n
ORDER BY df DESC, word ASC
LIMIT {TOP_TERMS}
"""


def corpus_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails/URLs; report per-doc redaction counts.

    (The synthetic corpus contains none — the counts prove it — but the
    operator is the real production shape: two vectorized
    regexp_replace passes, zero shuffles.)
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    n_emails = F.regexp_count("text", F.lit(EMAIL_RE)).cast("long")
    n_urls = F.regexp_count("text", F.lit(URL_RE)).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    )


_SCRUB_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{URL_RE}', '<URL>', 'g')) AS scrubbed_md5,
       length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{URL_RE}', '<URL>', 'g')) AS scrubbed_len
FROM documents
"""


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/eval split.

    The portable-hash trick again (int(md5[:8],16)): the split is a pure
    function of doc_id — reproducible across engines, runs, cluster
    sizes, and insertion order, which ``rand(seed)``-based sampling is
    not (it depends on partitioning).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    split = F.when(bucket < EVAL_PCT, "eval").otherwise("train")
    per_doc = docs.select("doc_id", split.alias("split"))
    return per_doc.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_SPLIT_SQL = f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {EVAL_PCT}
              THEN 'eval' ELSE 'train' END AS split
  FROM documents)
SELECT split, COUNT(*) AS n_docs, min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM tagged GROUP BY split
"""


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation in one plan:
    PII scrub -> quality filter -> normalized dedup -> train/eval split.

    This is the composition the engine exists for; Catalyst collapses
    the whole chain into scan -> project/filter -> one aggregate
    (dedup) -> project, so it costs ONE shuffle regardless of how many
    "stages" the pipeline has conceptually.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    n_words = F.size(F.split(F.trim(F.col("scrubbed")), " +")).cast("long")
    norm = (
        "trim(regexp_replace(regexp_replace(lower(scrubbed), '[^a-z0-9 ]', ''), ' +', ' '))"
    )
    staged = (
        docs.select("doc_id", scrubbed.alias("scrubbed"))
        .withColumn("n_words", n_words)
        .filter(F.col("n_words") >= 20)
        .select("doc_id", "n_words", F.md5(F.expr(norm)).alias("fp"))
    )
    deduped = staged.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_copies"),
        F.min("n_words").alias("n_words"),
    )
    bucket = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    return deduped.select(
        "doc_id",
        "fp",
        "n_copies",
        "n_words",
        F.when(bucket < EVAL_PCT, "eval").otherwise("train").alias("split"),
    )


_CLEAN_PIPELINE_SQL = f"""
WITH scrub AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'), '{URL_RE}', '<URL>', 'g') AS scrubbed
  FROM documents),
staged AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(scrubbed), ' +')) AS n_words,
         md5(trim(regexp_replace(regexp_replace(lower(scrubbed), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
  FROM scrub
  WHERE len(regexp_split_to_array(trim(scrubbed), ' +')) >= 20),
deduped AS (
  SELECT fp, min(doc_id) AS doc_id, count(*) AS n_copies, min(n_words) AS n_words
  FROM staged GROUP BY fp)
SELECT doc_id, fp, n_copies, n_words,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {EVAL_PCT}
            THEN 'eval' ELSE 'train' END AS split
FROM deduped
"""


QUERIES = {
    "corpus_clean_pipeline": corpus_clean_pipeline,
    "corpus_word_counts": corpus_word_counts,
    "corpus_doc_frequency": corpus_doc_frequency,
    "corpus_scrub_pii": corpus_scrub_pii,
    "corpus_split": corpus_split,
}

ORACLES = {
    "corpus_clean_pipeline": _CLEAN_PIPELINE_SQL,
    "corpus_word_counts": _WORD_COUNTS_SQL,
    "corpus_doc_frequency": _DOC_FREQ_SQL,
    "corpus_scrub_pii": _SCRUB_SQL,
    "corpus_split": _SPLIT_SQL,
}
