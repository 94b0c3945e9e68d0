"""Synthesize an IN-CONTRACT but maximally degenerate fixture set.

The per-operator degenerate fixtures (convention #9) test one operator
against one trap each; this tool builds a complete 10-table star schema
where EVERY table is adversarial at once, so the FULL oracle sweep can
run against it — a cross-engine probe of the whole 288-query surface on
exactly the inputs where Spark and DuckDB disagree most readily (empty
frames, zero divisors, all-ties, descending sequence(), NULL-producing
guards feeding ORDER BY).

"In contract" means the documented structural preconditions hold, so
any sweep failure is a real bug, not a broken precondition:

* every table has >= 1 row; keys unique; FKs valid;
* region/nation are the SF-invariant dimensions, copied verbatim;
* embeddings contain QUERY_VEC_ID (=0) and are 64-dim;
* documents keep n_chars == length(text) (in CHARACTERS, matching the
  driver generator — the multimodal operators measure bytes themselves);
* events.props is a JSON-ish varchar (some malformed — both engines'
  json extraction NULLs on it);
* value domains (event_type, lang, mktsegment, orderstatus, ...) stay
  inside the driver generator's domains.

Degenerate axes packed in:

* documents: empty text, whitespace-only, 1/2-word (below shingle n=3),
  punctuation-only, one char x 2000, one word x 300 (pathological
  repetition), multi-byte-heavy text, EXACT cross-source duplicates,
  near-duplicates, a lone normal doc;
* embeddings: the all-zero vector (norm 0), 1e-9 components (fxp rounds
  to the zero vector), five IDENTICAL vectors (cosine ties), one-hot
  axes, a singleton label whose only member has no same-label neighbor;
* events: one user entirely within one second (inter-arrival 0,
  sessionization collapse), a single-event user, value=0 everywhere for
  one user, duplicate (user, ts) pairs, malformed/empty props;
* orders/lineitem: one order day for everything (windows collapse to
  one frame), discount 0 AND 1 (zero revenue terms), quantity 0,
  price ties everywhere, an order with no lineitems, a single-lineitem
  order; customer with no orders; all suppliers in one nation.

Usage: python tools/gen_degenerate.py [dst_dir]
       (default /root/repo/.scaledata/degenerate)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.001"


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/degenerate"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    # SF-invariant dims: verbatim.
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")

    # customer: 5 rows, one nation-less of orders, balance ties incl 0/negative.
    con.sql(f"""
    COPY (
      SELECT * FROM (VALUES
        (1::BIGINT, 'Customer#1', 0, 0.0::DOUBLE,   'HOUSEHOLD'),
        (2::BIGINT, 'Customer#2', 0, 0.0::DOUBLE,   'HOUSEHOLD'),
        (3::BIGINT, 'Customer#3', 1, -10.5::DOUBLE, 'MACHINERY'),
        (4::BIGINT, 'Customer#4', 1, 999.99::DOUBLE,'MACHINERY'),
        (5::BIGINT, 'Customer#5', 2, 999.99::DOUBLE,'AUTOMOBILE')
      ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    ) TO '{dst}/customer.parquet' (FORMAT PARQUET)""")

    # supplier: 2 rows, both in ONE nation (max skew).
    con.sql(f"""
    COPY (
      SELECT * FROM (VALUES
        (1::BIGINT, 'Supplier#1', 0, 0.0::DOUBLE),
        (2::BIGINT, 'Supplier#2', 0, 0.0::DOUBLE)
      ) t(s_suppkey, s_name, s_nationkey, s_acctbal)
    ) TO '{dst}/supplier.parquet' (FORMAT PARQUET)""")

    # part: 5 rows, size ties, price 0, duplicate names/brands.
    con.sql(f"""
    COPY (
      SELECT * FROM (VALUES
        (1::BIGINT, 'green part', 'Brand#1', 'STANDARD BRASS', 1, 0.0::DOUBLE),
        (2::BIGINT, 'green part', 'Brand#1', 'STANDARD BRASS', 1, 0.0::DOUBLE),
        (3::BIGINT, 'red part',   'Brand#1', 'PROMO BRASS',    1, 1.0::DOUBLE),
        (4::BIGINT, 'red part',   'Brand#2', 'PROMO COPPER',   1, 1.0::DOUBLE),
        (5::BIGINT, 'blue part',  'Brand#2', 'STANDARD COPPER',50, 100.0::DOUBLE)
      ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    ) TO '{dst}/part.parquet' (FORMAT PARQUET)""")

    # orders: 10 rows, ALL on one date except one; customer 5 has none;
    # order 10 will carry no lineitems; total-price ties everywhere.
    con.sql(f"""
    COPY (
      SELECT * FROM (VALUES
        (1::BIGINT, 1::BIGINT, 'O', 10.0::DOUBLE, TIMESTAMP '1995-06-15', '1-URGENT'),
        (2::BIGINT, 1::BIGINT, 'O', 10.0::DOUBLE, TIMESTAMP '1995-06-15', '1-URGENT'),
        (3::BIGINT, 1::BIGINT, 'F', 10.0::DOUBLE, TIMESTAMP '1995-06-15', '5-LOW'),
        (4::BIGINT, 2::BIGINT, 'F', 10.0::DOUBLE, TIMESTAMP '1995-06-15', '5-LOW'),
        (5::BIGINT, 2::BIGINT, 'P', 10.0::DOUBLE, TIMESTAMP '1995-06-15', '3-MEDIUM'),
        (6::BIGINT, 3::BIGINT, 'O', 0.0::DOUBLE,  TIMESTAMP '1995-06-15', '3-MEDIUM'),
        (7::BIGINT, 3::BIGINT, 'O', 0.0::DOUBLE,  TIMESTAMP '1995-06-15', '2-HIGH'),
        (8::BIGINT, 4::BIGINT, 'O', 0.0::DOUBLE,  TIMESTAMP '1995-06-15', '2-HIGH'),
        (9::BIGINT, 4::BIGINT, 'O', 0.0::DOUBLE,  TIMESTAMP '1995-06-15', '4-NOT SPECIFIED'),
        (10::BIGINT, 4::BIGINT,'O', 0.0::DOUBLE,  TIMESTAMP '1996-01-01', '4-NOT SPECIFIED')
      ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

    # lineitem: 20 rows; discount 0 AND 1; quantity 0; price 0; every
    # row same shipdate except one; order 9 has ONE lineitem; order 10
    # none; heavy (orderkey, price) ties for tie-break stress.
    con.sql(f"""
    COPY (
      WITH base AS (
        SELECT
          1 + (i % 8)                          AS l_orderkey,
          1 + (i % 5)                          AS l_partkey,
          1 + (i % 2)                          AS l_suppkey,
          1 + CAST(i / 8 AS INT)               AS l_linenumber,
          CASE WHEN i = 0 THEN 0.0 ELSE 1.0 END            AS l_quantity,
          CASE WHEN i < 2 THEN 0.0 ELSE 100.0 END          AS l_extendedprice,
          CASE WHEN i % 3 = 0 THEN 0.0
               WHEN i % 3 = 1 THEN 1.0 ELSE 0.05 END       AS l_discount,
          0.0                                              AS l_tax,
          CASE WHEN i % 2 = 0 THEN 'R' ELSE 'N' END        AS l_returnflag,
          CASE WHEN i % 2 = 0 THEN 'F' ELSE 'O' END        AS l_linestatus,
          TIMESTAMP '1995-06-20'                           AS l_shipdate
        FROM range(19) r(i)
      )
      SELECT l_orderkey::BIGINT AS l_orderkey, l_partkey::BIGINT AS l_partkey,
             l_suppkey::BIGINT AS l_suppkey, l_linenumber::INT AS l_linenumber,
             l_quantity::DOUBLE AS l_quantity,
             l_extendedprice::DOUBLE AS l_extendedprice,
             l_discount::DOUBLE AS l_discount, l_tax::DOUBLE AS l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM base
      UNION ALL
      SELECT 9, 5, 2, 1, 1.0, 100.0, 0.05, 0.0, 'A', 'F', TIMESTAMP '1996-02-01'
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

    # events: 25 rows. user 1: 10 events in ONE second (dup timestamps,
    # two event types); user 2: a single event; user 3: value=0 run over
    # 5 distinct seconds; user 4: 9 events incl malformed/empty props
    # and the full type domain.
    con.sql(f"""
    COPY (
      WITH u1 AS (
        SELECT i AS event_id, TIMESTAMP '2024-01-01 00:00:00' AS ts,
               1::BIGINT AS user_id,
               CASE WHEN i % 2 = 0 THEN 'view' ELSE 'click' END AS event_type,
               1.0::DOUBLE AS value, '{{"k": 1}}' AS props
        FROM range(10) r(i)
      ), u3 AS (
        SELECT 11 + i AS event_id,
               TIMESTAMP '2024-01-02 00:00:00' + INTERVAL (i) SECOND AS ts,
               3::BIGINT, 'view', 0.0::DOUBLE, '{{}}'
        FROM range(5) r(i)
      ), u4 AS (
        SELECT 16 + i AS event_id,
               TIMESTAMP '2024-01-03 00:00:00' + INTERVAL (i * 3600) SECOND AS ts,
               4::BIGINT,
               ['view','click','purchase','signup','error'][1 + (i % 5)],
               CASE WHEN i % 2 = 0 THEN -5.5 ELSE 1e9 END,
               CASE WHEN i % 3 = 0 THEN 'not json'
                    WHEN i % 3 = 1 THEN '' ELSE '{{"k": 87}}' END
        FROM range(9) r(i)
      )
      SELECT event_id::BIGINT AS event_id, ts, user_id, event_type, value, props FROM u1
      UNION ALL SELECT 10, TIMESTAMP '2024-01-01 12:00:00', 2, 'purchase', 1.0, '{{"k": 0}}'
      UNION ALL SELECT * FROM u3
      UNION ALL SELECT * FROM u4
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")

    # documents: 14 rows across 3 sources. n_chars == length(text) in
    # CHARACTERS (driver-generator invariant).
    docs = [
        (0, "", "en", "src0"),
        (1, "   ", "en", "src0"),
        (2, "word", "en", "src0"),
        (3, "two words", "en", "src0"),
        (4, "exactly three words", "en", "src0"),
        (5, "!!! ??? ... ,,,", "en", "src1"),
        (6, "x" * 2000, "en", "src1"),
        (7, " ".join(["spam"] * 300), "en", "src1"),
        (8, "héllo wörld élan café naïve résumé déjà vu encore une fois", "fr", "src1"),
        (9, "the quick brown fox jumps over the lazy dog again and again", "en", "src1"),
        (10, "the quick brown fox jumps over the lazy dog again and again", "en", "src2"),
        (11, "the quick brown fox jumps over the lazy dog again and once", "en", "src2"),
        (12, "ein völlig anderes dokument über etwas ganz anderes hier", "de", "src2"),
        (13, "一 二 三 四 五 六 七 八 九 十 one two three", "zh", "src2"),
    ]
    con.sql("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
        [(d, t, lang, s, len(t)) for d, t, lang, s in docs],
    )
    con.sql(f"COPY docs TO '{dst}/documents.parquet' (FORMAT PARQUET)")

    # embeddings: 12 rows, 64-dim FLOAT[], QUERY_VEC_ID=0 present.
    # vec 0: one-hot (the query vector must have nonzero norm for the
    # driver-side literal — everything else may be degenerate);
    # vec 1: ALL-ZERO (norm 0); vec 2: 1e-9s (fxp rounds to zero vector);
    # vecs 3-7: IDENTICAL (perfect cosine ties); vec 8: negative of 3;
    # vec 9/10: one-hot on other axes; vec 11: the ONLY label-1 member
    # (no same-label neighbor).
    import numpy as np  # noqa: PLC0415

    def vec(fill):
        v = np.zeros(64, dtype=np.float32)
        if callable(fill):
            fill(v)
        return [float(x) for x in v]

    rows = [
        (0, vec(lambda v: v.__setitem__(0, 1.0)), 0),
        (1, vec(None), 0),
        (2, vec(lambda v: v.fill(1e-9)), 0),
        (3, vec(lambda v: v.fill(0.5)), 0),
        (4, vec(lambda v: v.fill(0.5)), 0),
        (5, vec(lambda v: v.fill(0.5)), 0),
        (6, vec(lambda v: v.fill(0.5)), 0),
        (7, vec(lambda v: v.fill(0.5)), 0),
        (8, vec(lambda v: v.fill(-0.5)), 0),
        (9, vec(lambda v: v.__setitem__(1, 1.0)), 0),
        (10, vec(lambda v: v.__setitem__(2, 1.0)), 0),
        (11, vec(lambda v: v.__setitem__(3, 1.0)), 1),
    ]
    con.sql("CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO emb VALUES (?, ?, ?)", rows)
    con.sql(f"COPY emb TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
