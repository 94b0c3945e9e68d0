"""SCD2 / MERGE operator invariants and plan shapes (value equality vs
DuckDB is covered by selfcheck)."""

from collections import defaultdict

from catme_etl_j_spark.operators.etl import etl_merge_upsert, etl_scd2_intervals


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scd2_intervals_contiguous(spark, sf_dir):
    rows = etl_scd2_intervals(spark, sf_dir).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["custkey"]].append(r)
    for segs in by_key.values():
        segs.sort(key=lambda r: r["version"])
        assert [s["version"] for s in segs] == list(range(1, len(segs) + 1))
        # exactly one current row, and it is the last segment
        assert [s["is_current"] for s in segs] == [0] * (len(segs) - 1) + [1]
        for prev, nxt in zip(segs, segs[1:]):
            # intervals chain: valid_to of one segment = valid_from of next
            assert prev["valid_to"] == nxt["valid_from"]
            # segments exist because the priority CHANGED
            assert prev["priority"] != nxt["priority"]
        assert segs[-1]["valid_to"] is None


def test_scd2_single_sort_pass(spark, sf_dir):
    """lag + running-sum + segment agg must reuse ONE (key, time) sort:
    no more than 2 exchanges (the window partition + the segment agg)."""
    plan = _plan(etl_scd2_intervals(spark, sf_dir))
    assert plan.count("Exchange") <= 2


def test_merge_upsert_ops(spark, sf_dir):
    from pyspark.sql import functions as F

    from catme_etl_j_spark.sources.tables import load_table

    rows = etl_merge_upsert(spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    ops = defaultdict(int)
    for r in rows:
        ops[r["op"]] += 1
    assert ops["insert"] == 5
    assert ops["update"] + ops["keep"] == n_cust
    assert len(rows) == n_cust + 5
    inserted = [r for r in rows if r["op"] == "insert"]
    assert all(r["custkey"] > 1000000 and r["name"].startswith("NEW-") for r in inserted)


def test_scd2_fact_join_covers_every_lineitem(spark, sf_dir):
    """Every lineitem lands in exactly one bucket (a validity interval
    or PRE-HISTORY), so n_items must total |lineitem| and revenue must
    total the exact sum of extendedprice."""
    from catme_etl_j_spark.operators.etl import etl_scd2_fact_join
    from catme_etl_j_spark.sources.tables import load_table

    rows = etl_scd2_fact_join(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.selectExpr(
        "COUNT(*) AS n",
        "CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev",
    ).first()
    assert sum(r["n_items"] for r in rows) == exact["n"]
    assert abs(sum(r["revenue"] for r in rows) - exact["rev"]) < 0.02
    assert all(r["is_current"] in (-1, 0, 1) for r in rows)
    pre = [r for r in rows if r["priority"] == "PRE-HISTORY"]
    assert all(r["is_current"] == -1 for r in pre)


def test_k_anonymity_flags(spark, sf_dir):
    from catme_etl_j_spark.operators.etl import K_ANON, L_DIVERSE, etl_k_anonymity
    from catme_etl_j_spark.sources.tables import load_table

    rows = etl_k_anonymity(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    assert sum(r["group_size"] for r in rows) == cust.count()
    for r in rows:
        assert 1 <= r["n_sensitive"] <= r["group_size"]
        assert r["k_violation"] == (r["group_size"] < K_ANON)
        assert r["l_violation"] == (r["n_sensitive"] < L_DIVERSE)
    assert any(r["k_violation"] for r in rows)  # synthetic QI is sparse


def test_constraint_violations_all_pass_on_fixtures(spark, sf_dir):
    """Seven rules, all green on the synthetic data; checked counts
    match the underlying tables; passed flag follows violations."""
    from catme_etl_j_spark.operators.etl import etl_constraint_violations
    from catme_etl_j_spark.sources.tables import load_table

    rows = {r["rule"]: r for r in etl_constraint_violations(spark, sf_dir).collect()}
    assert len(rows) == 7
    n_orders = load_table(spark, sf_dir, "orders").count()
    n_lines = load_table(spark, sf_dir, "lineitem").count()
    for r in rows.values():
        assert r["passed"] == (1 if r["n_violations"] == 0 else 0)
        assert r["n_violations"] >= 0
    assert rows["orders.o_orderkey NOT NULL"]["n_checked"] == n_orders
    assert rows["lineitem.l_orderkey REFERENCES orders"]["n_checked"] == n_lines
    assert all(r["n_violations"] == 0 for r in rows.values())


def test_schema_evolution_conservation(spark, sf_dir):
    """The union loses nothing: per-version null-fills are exactly the
    other version's row count for the drifted columns, the __ALL__ row
    is the sum of the versions, and the merged totalprice sum equals a
    direct sum over the v1 slice (v2 carries no totalprice)."""
    from catme_etl_j_spark.operators.etl import etl_schema_evolution
    from catme_etl_j_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = {r["schema_version"]: r for r in etl_schema_evolution(spark, sf_dir).collect()}
    assert set(rows) == {"v1", "v2", "__ALL__"}
    v1, v2, al = rows["v1"], rows["v2"], rows["__ALL__"]
    # v1 predates priority: every v1 row null-fills it, no totalprice nulls
    assert v1["n_null_priority"] == v1["n_rows"]
    assert v1["n_null_totalprice"] == 0
    assert v1["n_priorities"] == 0
    # v2 dropped totalprice: mirror image
    assert v2["n_null_totalprice"] == v2["n_rows"]
    assert v2["n_null_priority"] == 0
    assert v2["n_priorities"] > 0
    # rollup total = sum of parts
    assert al["n_rows"] == v1["n_rows"] + v2["n_rows"]
    assert al["n_null_totalprice"] == v2["n_rows"]
    assert al["n_null_priority"] == v1["n_rows"]
    # conservation of money through the union (exact DECIMAL path)
    direct = (
        load_table(spark, sf_dir, "orders")
        .filter(F.expr("o_orderkey % 2 = 0"))
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).cast("double").alias("s"))
        .collect()[0]["s"]
    )
    assert al["sum_totalprice"] == direct == v1["sum_totalprice"]


def test_scd3_matches_direct_latest_two(spark, sf_dir):
    """Current/previous equal the two most recent orders' priorities
    under the (date DESC, orderkey DESC) order; changed is the exact
    inequality flag; n_orders matches the group size."""
    from collections import defaultdict

    from catme_etl_j_spark.operators.etl import etl_scd3_previous_value
    from catme_etl_j_spark.sources.tables import load_table

    rows = {r["o_custkey"]: r for r in etl_scd3_previous_value(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    ).collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o["o_custkey"]].append(o)
    assert set(rows) == set(by_cust)
    for ck, os_ in by_cust.items():
        os_.sort(key=lambda o: (o["o_orderdate"], o["o_orderkey"]), reverse=True)
        r = rows[ck]
        assert r["n_orders"] == len(os_)
        assert r["current_priority"] == os_[0]["o_orderpriority"]
        want_prev = os_[1]["o_orderpriority"] if len(os_) > 1 else None
        assert r["previous_priority"] == want_prev
        want_changed = int(want_prev is not None and want_prev != os_[0]["o_orderpriority"])
        assert r["changed"] == want_changed


def test_interval_coalesce_islands_disjoint(spark, sf_dir):
    """Per customer: islands are ordered, strictly disjoint (next
    start > previous end), contiguous ids from 1, and order counts sum
    to the customer's order count."""
    from collections import defaultdict

    from catme_etl_j_spark.operators.etl import etl_interval_coalesce
    from catme_etl_j_spark.sources.tables import load_table

    rows = etl_interval_coalesce(spark, sf_dir).collect()
    per_cust = defaultdict(list)
    for r in rows:
        per_cust[r["o_custkey"]].append(r)
    n_orders = dict(
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .count()
        .collect()
    )
    assert set(per_cust) == set(n_orders)
    for cust, islands in per_cust.items():
        islands.sort(key=lambda r: r["island_id"])
        assert [r["island_id"] for r in islands] == list(
            range(1, len(islands) + 1)
        )
        assert sum(r["n_orders"] for r in islands) == n_orders[cust]
        for a, b in zip(islands, islands[1:]):
            assert b["island_start"] > a["island_end"], (
                f"cust {cust}: island {b['island_id']} overlaps predecessor"
            )
        for r in islands:
            assert r["island_start"] <= r["island_end"]


def test_interval_coalesce_randomized_bruteforce(spark, tmp_path):
    """200 random fulfillment intervals (seeded RNG) across 12
    customers, including ordersless orders, same-day ties, and
    ship-before-order inversions: the operator's islands equal a
    Python brute-force interval merge, and the DuckDB twin
    hash-matches on the same synthetic dir."""
    import random
    from collections import defaultdict
    from datetime import datetime, timedelta

    import duckdb as ddb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry_mod
    from catme_etl_j_spark.operators.etl import etl_interval_coalesce

    rng = random.Random(0xC0A1E5CE)
    base = datetime(1995, 1, 1)
    orders, lines = [], []
    for ok in range(1, 201):
        cust = rng.randint(1, 12)
        s = rng.randint(0, 400)
        orders.append((ok, cust, "O", 100.0, base + timedelta(days=s), "1-URGENT"))
        # 15%: no lineitems (point interval); ships may precede orders
        if rng.random() > 0.15:
            for ln in range(1, rng.randint(1, 4) + 1):
                ship = s + rng.randint(-3, 45)
                lines.append(
                    (ok, 1, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O",
                     base + timedelta(days=ship))
                )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array([o[2] for o in orders]),
                "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
                "o_orderdate": pa.array([o[4] for o in orders], pa.timestamp("us")),
                "o_orderpriority": pa.array([o[5] for o in orders]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
                "l_partkey": pa.array([l[1] for l in lines], pa.int64()),
                "l_suppkey": pa.array([l[2] for l in lines], pa.int64()),
                "l_linenumber": pa.array([l[3] for l in lines], pa.int32()),
                "l_quantity": pa.array([l[4] for l in lines], pa.float64()),
                "l_extendedprice": pa.array([l[5] for l in lines], pa.float64()),
                "l_discount": pa.array([l[6] for l in lines], pa.float64()),
                "l_tax": pa.array([l[7] for l in lines], pa.float64()),
                "l_returnflag": pa.array([l[8] for l in lines]),
                "l_linestatus": pa.array([l[9] for l in lines]),
                "l_shipdate": pa.array([l[10] for l in lines], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )

    rows = etl_interval_coalesce(spark, str(tmp_path)).collect()

    # brute force: merge intervals per customer in (start, orderkey) order
    epoch = datetime(1970, 1, 1)
    last_ship = defaultdict(lambda: None)
    for l in lines:
        d = (l[10] - epoch).days
        k = l[0]
        last_ship[k] = d if last_ship[k] is None else max(last_ship[k], d)
    per_cust = defaultdict(list)
    for ok, cust, *_rest in orders:
        s = (orders[ok - 1][4] - epoch).days
        e = max(s, last_ship[ok]) if last_ship[ok] is not None else s
        per_cust[cust].append((s, ok, e))
    want = []
    for cust, ivs in per_cust.items():
        ivs.sort()
        islands = []
        for s, ok, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
                islands[-1][0] = min(islands[-1][0], s)
            else:
                islands.append([s, e, 1])
        for i, (s, e, n) in enumerate(islands, 1):
            want.append((cust, i, n,
                         (epoch + timedelta(days=s)).strftime("%Y-%m-%d"),
                         (epoch + timedelta(days=e)).strftime("%Y-%m-%d"),
                         e - s + 1))
    got = sorted(
        (r["o_custkey"], r["island_id"], r["n_orders"], r["island_start"],
         r["island_end"], r["span_days"])
        for r in rows
    )
    assert got == sorted(want)

    # and the oracle twin hash-matches on the same synthetic dir
    con = ddb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    orc = con.sql(entry_mod.oracle_sql()["etl_interval_coalesce"]).fetchall()
    assert sorted(tuple(r) for r in orc) == got
