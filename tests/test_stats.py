"""Semantic checks for operators/stats.py (oracle equality is covered
by tools/selfcheck.py; these pin the statistics' mathematical shape)."""

from catme_etl_j_spark.operators import stats


def test_ols_regression_shape(spark, sf_dir):
    rows = {r["l_returnflag"]: r for r in stats.stats_ols_regression(spark, sf_dir).collect()}
    assert set(rows) == {"A", "N", "R"}
    for r in rows.values():
        # NB: unlike real TPC-H, the driver's synthetic testdata draws
        # extendedprice INDEPENDENTLY of quantity (measured r ~ -0.01),
        # so only the mathematical invariants are pinned here.
        assert 0.0 <= r["r2"] <= 1.0
        assert r["n_rows"] > 0
        assert r["intercept"] != 0.0  # mean price is far from zero


def test_corr_matrix_bounds(spark, sf_dir):
    rows = stats.stats_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    by_pair = {(r["col_x"], r["col_y"]): r["pearson_r"] for r in rows}
    assert all(-1.0 <= v <= 1.0 for v in by_pair.values())
    # all four columns are (near-)independent draws in the synthetic
    # testdata: every pairwise correlation is small but well-defined
    assert all(abs(v) < 0.2 for v in by_pair.values())


def test_wow_growth_first_week_null(spark, sf_dir):
    from catme_etl_j_spark.operators.events import events_wow_growth

    rows = events_wow_growth(spark, sf_dir).collect()
    assert rows
    seen_first = set()
    for r in rows:  # ordered by (event_type, week)
        if r["event_type"] not in seen_first:
            assert r["wow_growth"] is None  # no prior week to compare
            seen_first.add(r["event_type"])
        assert r["n_events"] > 0


def test_mad_outliers_invariants(spark, sf_dir):
    rows = stats.stats_mad_outliers(spark, sf_dir).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] < r["n_rows"]
        # MAD <= max deviation implies median-MAD band is inside range
        assert r["median_price"] > 0


def test_bpe_pairs_weighted_by_word_freq(spark, sf_dir):
    from catme_etl_j_spark.operators.corpus import corpus_bpe_pair_counts

    rows = corpus_bpe_pair_counts(spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["a"]) == 1 and len(r["b"]) == 1 for r in rows)


def test_dau_wau_mau_monotone(spark, sf_dir):
    from catme_etl_j_spark.operators.events import events_dau_wau_mau

    rows = events_dau_wau_mau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dau"] <= r["wau"] <= r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0


def test_chi2_cells_marginal_identity(spark, sf_dir):
    rows = stats.stats_chi2_cells(spark, sf_dir).collect()
    assert len(rows) == 6  # 3 returnflags x 2 linestatuses
    total_obs = sum(r["observed"] for r in rows)
    total_exp = sum(r["expected"] for r in rows)
    # expected counts preserve the grand total (up to rounding)
    assert abs(total_obs - total_exp) < 0.01 * total_obs
    assert all(r["chi2_contrib"] >= 0 for r in rows)


def test_readability_bounds(spark, sf_dir):
    from catme_etl_j_spark.operators.text import text_readability

    rows = text_readability(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert r["n_words"] >= 1
        assert r["n_sentences"] >= 1
        assert r["n_syllables"] >= 1
        assert r["flesch"] < 206.835  # formula upper bound


def test_cluster_sizes_account_for_all_docs(spark, sf_dir):
    from catme_etl_j_spark.operators.dedup import dedup_cluster_sizes

    rows = dedup_cluster_sizes(spark, sf_dir).collect()
    assert rows
    n_docs = sum(r["cluster_size"] * r["n_clusters"] for r in rows)
    from catme_etl_j_spark.sources.tables import load_table

    assert n_docs == load_table(spark, sf_dir, "documents").count()
    assert rows[0]["cluster_size"] == 1  # unique docs exist


def test_streaks_are_consistent_islands(spark, sf_dir):
    import datetime

    from catme_etl_j_spark.operators.events import events_streaks

    rows = events_streaks(spark, sf_dir).collect()
    assert rows
    lens = [r["streak_days"] for r in rows]
    assert lens == sorted(lens, reverse=True)
    for r in rows:
        start = datetime.date.fromisoformat(r["start_day"])
        end = datetime.date.fromisoformat(r["end_day"])
        assert (end - start).days == r["streak_days"] - 1  # island identity


def test_mix_epochs_budget_identity(spark, sf_dir):
    from catme_etl_j_spark.operators.corpus import corpus_mix_epochs

    rows = corpus_mix_epochs(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    n_src = len(rows)
    for r in rows:
        assert r["epochs_e4"] == (2 * total * 10000) // (n_src * r["n_tokens"])
        assert r["epochs"] > 0


def test_mode_share_identity(spark, sf_dir):
    rows = stats.stats_mode_quantity(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["mode_quantity"] == int(r["mode_quantity"])  # integral qty
        assert 0 < r["share_ppm"] <= 1_000_000
        assert r["n_mode"] > 0


def test_bounce_rate_bounds(spark, sf_dir):
    from catme_etl_j_spark.operators.events import events_bounce_rate

    rows = events_bounce_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounces"] <= r["n_sessions"]
        assert 0.0 <= r["bounce_rate"] <= 1.0


def test_welch_ttest_shape(spark, sf_dir):
    [r] = stats.stats_welch_ttest(spark, sf_dir).collect()
    assert r["n1"] > 1 and r["n2"] > 1
    assert r["welch_dof"] > 0
    # dof is bounded above by n1+n2-2 (pooled) for Welch
    assert r["welch_dof"] <= r["n1"] + r["n2"] - 2


def test_gini_bounds_and_mass(spark, sf_dir):
    rows = stats.stats_gini_doc_length(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["total_chars"] > 0 and r["n_docs"] > 0


def test_dedup_report_signal_consistency(spark, sf_dir):
    from catme_etl_j_spark.operators.dedup import dedup_report

    rows = {r["signal"]: r for r in dedup_report(spark, sf_dir).collect()}
    assert set(rows) == {"exact_norm", "minhash_near", "simhash_near"}
    n_docs = rows["exact_norm"]["n_docs"]
    for r in rows.values():
        assert 0 <= r["n_affected"] <= n_docs
        assert 0 <= r["affected_ppm"] <= 1_000_000
    # exact copies are near-dups too: minhash flags at least 2x the
    # exact surplus (each exact group >1 contributes ALL members)
    assert rows["minhash_near"]["n_affected"] >= rows["exact_norm"]["n_affected"]


def test_benford_ppm_totals(spark, sf_dir):
    rows = stats.stats_benford_first_digit(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["benford_ppm"] for r in rows) - 1_000_000) <= 5
    assert sum(r["observed_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert r["delta_ppm"] == r["observed_ppm"] - r["benford_ppm"]


def test_new_vs_returning_day_one(spark, sf_dir):
    from catme_etl_j_spark.operators.events import events_new_vs_returning

    rows = events_new_vs_returning(spark, sf_dir).collect()
    assert rows
    first = rows[0]
    assert first["new_users"] == first["dau"]  # day 1: everyone is new
    assert first["returning_users"] == 0
    for r in rows:
        assert r["new_users"] + r["returning_users"] == r["dau"]


def test_vocab_growth_monotone(spark, sf_dir):
    from catme_etl_j_spark.operators.corpus import corpus_vocab_growth

    rows = corpus_vocab_growth(spark, sf_dir).collect()
    assert len(rows) > 3  # a real curve, not a single point
    cums = [r["cum_vocab"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["new_words"] for r in rows)


def test_time_to_purchase_nonneg(spark, sf_dir):
    from catme_etl_j_spark.operators.events import events_time_to_purchase

    rows = events_time_to_purchase(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_converting"] > 0
        assert r["total_lag_s"] >= 0  # purchase never precedes its session start
        assert r["mean_lag_s"] >= 0.0


def test_rev_7dma_window_width(spark, sf_dir):
    from catme_etl_j_spark.operators.relational3 import window_revenue_7dma

    rows = window_revenue_7dma(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_days_in_window"] <= 7
        # average consistent with the window total (rdet-rounded)
        assert abs(r["rev_7dma"] - r["rev_7d_total"] / r["n_days_in_window"]) < 0.02


def test_scd2_asof_one_row_per_customer(spark, sf_dir):
    from catme_etl_j_spark.operators.etl import SCD2_ASOF_DATE, etl_scd2_asof_snapshot

    rows = etl_scd2_asof_snapshot(spark, sf_dir).collect()
    assert rows
    keys = [r["custkey"] for r in rows]
    assert len(keys) == len(set(keys))  # intervals partition time per key
    for r in rows:
        assert r["valid_from"] <= SCD2_ASOF_DATE
        assert r["valid_to"] is None or r["valid_to"] > SCD2_ASOF_DATE


def test_ewma_scatter_weighting(spark, sf_dir):
    """The EWMA is a weighted mean over the window's PRESENT days, so
    it must sit between their min and max daily cents (minus one for
    DIV truncation); the first day's window is itself, so its EWMA is
    exactly its own value; no mass can exceed 2^14 - 1."""
    from catme_etl_j_spark.operators.relational3 import window_ewma_scatter

    rows = window_ewma_scatter(spark, sf_dir).collect()
    assert rows, "no daily revenue rows"
    by_day = {r["day"]: r for r in rows}
    first = rows[0]
    assert first["ewma_cents"] == first["day_cents"]
    assert all(r["weight_mass"] <= (1 << 14) - 1 for r in rows)
    full = sorted(rows, key=lambda r: -r["weight_mass"])[:50]
    import datetime as dt

    for r in full:
        d0 = dt.date.fromisoformat(r["day"])
        window = [
            by_day[(d0 - dt.timedelta(days=k)).isoformat()]["day_cents"]
            for k in range(14)
            if (d0 - dt.timedelta(days=k)).isoformat() in by_day
        ]
        assert min(window) - 1 <= r["ewma_cents"] <= max(window)


def test_ks_test_against_scipy_definition(spark, sf_dir):
    """Cross-check D against a direct numpy ECDF computation on the
    collected cents (small at test scale)."""
    from catme_etl_j_spark.operators.stats import stats_ks_test
    from catme_etl_j_spark.sources.tables import load_table

    row = stats_ks_test(spark, sf_dir).first()
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type IN ('purchase', 'view')"
    )
    import math

    pdf = ev.selectExpr(
        "event_type", "CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c"
    ).toPandas()
    a = sorted(pdf[pdf.event_type == "purchase"].c)
    b = sorted(pdf[pdf.event_type == "view"].c)
    n1, n2 = len(a), len(b)
    assert (row["n1"], row["n2"]) == (n1, n2)
    import bisect

    grid = sorted(set(a) | set(b))
    d_num = max(
        abs(bisect.bisect_right(a, x) * n2 - bisect.bisect_right(b, x) * n1)
        for x in grid
    )
    assert row["d_num"] == d_num
    assert abs(row["ks_d"] - d_num / (n1 * n2)) < 1e-6
    crit = 1.358 * math.sqrt((n1 + n2) / (n1 * n2))
    assert row["reject_at_5pct"] == (d_num / (n1 * n2) > crit)


def test_km_survival_monotone_and_lifelines_free_check(spark, sf_dir):
    """KM invariants: survival is non-increasing from <=1; n_at_risk is
    non-increasing; and the curve equals a direct Python KM recompute
    from the raw events."""
    from catme_etl_j_spark.operators.events import events_survival_km
    from catme_etl_j_spark.sources.tables import load_table

    rows = events_survival_km(spark, sf_dir).collect()
    assert rows
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    risks = [r["n_at_risk"] for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "unix_micros(ts) AS us", "event_type"
    ).collect()
    import collections
    import math

    birth, purch, last = {}, {}, {}
    for r in ev:
        u = r["user_id"]
        birth[u] = min(birth.get(u, r["us"]), r["us"])
        last[u] = max(last.get(u, r["us"]), r["us"])
        if r["event_type"] == "purchase":
            purch[u] = min(purch.get(u, r["us"]), r["us"])
    durs = []
    for u in birth:
        if u in purch:
            durs.append(((purch[u] - birth[u]) // 86400000000, 1))
        else:
            durs.append(((last[u] - birth[u]) // 86400000000, 0))
    n = len(durs)
    per_day = collections.Counter(t for t, _ in durs)
    deaths = collections.Counter(t for t, e in durs if e == 1)
    s = 1.0
    expect = []
    done = 0
    for t in sorted(per_day):
        at_risk = n - done
        done += per_day[t]
        d = deaths.get(t, 0)
        if d == 0:
            continue
        if d < at_risk:
            s *= (at_risk - d) / at_risk
            expect.append((t, at_risk, d, False))
        else:
            expect.append((t, at_risk, d, True))
    assert [(r["t_day"], r["n_at_risk"], r["n_events"]) for r in rows] == [
        (t, a, d) for t, a, d, _ in expect
    ]
    for r, (t, a, d, zero) in zip(rows, expect):
        if zero:
            assert r["survival"] == 0.0


def test_bpe_merge_step_semantics(spark, sf_dir):
    """After applying the argmax merge, the merged 2-char symbol must
    appear in the recount (touches_merge rows exist), the old top pair
    (a b as single chars) must no longer be the argmax, and a pure-
    Python replay of the merge over the vocab agrees on the top row."""
    import collections

    from catme_etl_j_spark.operators.corpus import corpus_bpe_merge_step
    from catme_etl_j_spark.sources.tables import load_table

    rows = corpus_bpe_merge_step(spark, sf_dir).collect()
    assert len(rows) == 20
    merged_pair = rows[0]["merged_pair"]
    assert len(merged_pair) == 2
    assert any(r["touches_merge"] for r in rows)

    words = collections.Counter(
        w
        for r in load_table(spark, sf_dir, "documents").collect()
        for w in r["text"].split()
        if len(w) >= 2
    )
    pre: collections.Counter = collections.Counter()
    for w, n in words.items():
        for x, y in zip(w, w[1:]):
            pre[(x, y)] += n
    (ta, tb), _ = min(pre.items(), key=lambda kv: (-kv[1], kv[0]))
    assert merged_pair == ta + tb
    post: collections.Counter = collections.Counter()
    for w, n in words.items():
        sp = " ".join(w).replace(f"{ta} {tb}", ta + tb).split(" ")
        for x, y in zip(sp, sp[1:]):
            post[(x, y)] += n
    (ba, bb), bc = min(post.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (rows[0]["a"], rows[0]["b"], rows[0]["pair_count"]) == (ba, bb, bc)


def test_anova_matches_direct_computation(spark, sf_dir):
    """F must equal a direct per-group computation on collected cents."""
    import collections

    from catme_etl_j_spark.operators.stats import stats_anova_oneway
    from catme_etl_j_spark.sources.tables import load_table

    rows = stats_anova_oneway(spark, sf_dir).collect()
    assert len(rows) == 5
    assert len({r["f_stat"] for r in rows}) == 1  # shared statistic
    data = collections.defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderpriority AS g",
            "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c",
        )
        .collect()
    ):
        data[r["g"]].append(r["c"])
    k = len(data)
    n = sum(len(v) for v in data.values())
    sum_s2n = sum((sum(v)) ** 2 / len(v) for v in sorted(data.items()) for v in [v[1]])
    ts = sum(sum(v) for v in data.values())
    tss = sum(x * x for v in data.values() for x in v)
    ssb = sum_s2n - ts * ts / n
    ssw = tss - sum_s2n
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(rows[0]["f_stat"] - f) < 1e-4
    for r in rows:
        got = sum(data[r["grp"]]) / len(data[r["grp"]]) / 100.0
        assert abs(r["mean_price"] - got) < 0.01


def test_seasonal_index_centers_on_one(spark, sf_dir):
    """Seasonal indices over a full window hover around 1 (the trend
    IS the windowed mean), and the full-window count is 13."""
    from catme_etl_j_spark.operators.relational3 import window_seasonal_index

    rows = window_seasonal_index(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r["month"])
    full = [r for r in rows if r["n_months_in_window"] == 13]
    assert full
    mean_idx = sum(r["seasonal_index"] for r in full) / len(full)
    assert 0.9 < mean_idx < 1.1
    for r in rows:
        assert r["seasonal_index"] > 0
        assert abs(r["trend"] * r["n_months_in_window"]) > 0


def test_psi_drift_matches_python(spark, sf_dir):
    """Total PSI equals a direct Python recompute with the same Laplace
    smoothing; shares on each side sum to ~1."""
    import math

    from catme_etl_j_spark.operators.stats import PSI_BUCKETS, stats_psi_drift
    from catme_etl_j_spark.sources.tables import load_table

    rows = stats_psi_drift(spark, sf_dir).collect()
    assert len(rows) == PSI_BUCKETS
    assert len({r["total_psi_e9"] for r in rows}) == 1
    data = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS c",
            "CAST(o_orderdate >= TIMESTAMP'1998-01-01' AS INT) AS cur",
        )
        .collect()
    )
    cs = [r["c"] for r in data]
    mn, mx = min(cs), max(cs)
    nb = [0] * PSI_BUCKETS
    nc = [0] * PSI_BUCKETS
    for r in data:
        b = ((r["c"] - mn) * PSI_BUCKETS) // (mx - mn + 1)
        (nc if r["cur"] else nb)[b] += 1
    tb, tc = sum(nb), sum(nc)
    total = 0
    for b in range(PSI_BUCKETS):
        p1 = (nb[b] + 1) / (tb + PSI_BUCKETS)
        p2 = (nc[b] + 1) / (tc + PSI_BUCKETS)
        total += math.floor((p1 - p2) * math.log(p1 / p2) * 1e9 + 0.5)
    assert rows[0]["total_psi_e9"] == total
    assert abs(sum(r["share_base"] for r in rows) - 1.0) < 0.001
    assert abs(sum(r["share_cur"] for r in rows) - 1.0) < 0.001


def test_basket_lift_identities(spark, sf_dir):
    """Support/confidence/lift relate by their defining identities, and
    the pair count never exceeds either singleton count."""
    from catme_etl_j_spark.operators.stats import stats_basket_lift

    rows = stats_basket_lift(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 15  # C(6,2) pairs of 6 part types
    for r in rows:
        assert r["n_pair"] <= min(r["n_x"], r["n_y"])
        assert 0 < r["support"] <= 1
        assert 0 < r["conf_x_to_y"] <= 1 and 0 < r["conf_y_to_x"] <= 1
        # lift identity: lift = conf_x_to_y / P(y), with
        # P(y) = n_y / n_orders and n_orders = n_pair / support
        n_orders = r["n_pair"] / r["support"]
        p_y = r["n_y"] / n_orders
        assert abs(r["lift"] - r["conf_x_to_y"] / p_y) < 0.01


def test_padding_waste_sorted_wins(spark, sf_dir):
    """Length-bucketed batching must waste strictly less than
    arrival-order batching; both conserve the true token total."""
    from catme_etl_j_spark.operators.corpus import corpus_padding_waste

    rows = {r["strategy"]: r for r in corpus_padding_waste(spark, sf_dir).collect()}
    assert set(rows) == {"length_bucketed", "arrival_order"}
    lb, ar = rows["length_bucketed"], rows["arrival_order"]
    assert lb["total_tokens"] == ar["total_tokens"]
    assert lb["n_batches"] == ar["n_batches"]
    assert lb["waste_tokens"] < ar["waste_tokens"]
    for r in rows.values():
        assert r["padded_tokens"] == r["total_tokens"] + r["waste_tokens"]
        assert 0 <= r["waste_ppm"] < 1_000_000


def test_mannwhitney_u_identities(spark, sf_dir):
    """U_a + U_b = n_a*n_b (doubled: u2_a + u2_b = 2*n_a*n_b); the
    doubled U matches a direct Python recompute with scipy-style
    tie-averaged ranks; rank_biserial follows its definition."""
    from collections import Counter

    from catme_etl_j_spark.operators.stats import stats_mannwhitney_u
    from catme_etl_j_spark.sources.tables import load_table

    [r] = stats_mannwhitney_u(spark, sf_dir).collect()
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]
    assert 0 <= r["u2_a"] <= 2 * r["n_a"] * r["n_b"]
    assert abs(r["rank_biserial"]) <= 1.0

    ev = (
        load_table(spark, sf_dir, "events")
        .filter("event_type IN ('purchase', 'click')")
        .selectExpr(
            "event_type = 'purchase' AS is_a",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v",
        )
        .collect()
    )
    vals = sorted(set(x["v"] for x in ev))
    cnt = Counter(x["v"] for x in ev)
    c = 0
    rank2 = {}
    for v in vals:
        rank2[v] = 2 * c + cnt[v] + 1
        c += cnt[v]
    n_a = sum(1 for x in ev if x["is_a"])
    r2a = sum(rank2[x["v"]] for x in ev if x["is_a"])
    assert r["n_a"] == n_a
    assert r["u2_a"] == r2a - n_a * (n_a + 1)


def test_mannwhitney_u_empty_group_matches_oracle(spark, tmp_path):
    """Code-review r6 repro: a fixture with clicks but NO purchases
    made rank_biserial divide by n_a*n_b = 0 — Spark ANSI crash vs a
    DuckDB NULL row. Both engines must now agree on the NULL-guarded
    row. NULL values must also be dropped identically (Spark sorts
    NULLS FIRST, DuckDB NULLS LAST)."""
    import duckdb as ddb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry_mod

    rows = [(i, 1_700_000_000_000_000 + i * 1_000_000, "click",
             float(i % 7) if i % 5 else None) for i in range(40)]
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))

    from catme_etl_j_spark.operators.stats import stats_mannwhitney_u

    sdf = stats_mannwhitney_u(spark, str(tmp_path))
    [r] = sdf.collect()  # must not crash
    assert r["n_a"] == 0 and r["n_b"] == 32  # NULL values dropped
    assert r["z"] is None and r["rank_biserial"] is None

    con = ddb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    rel = con.sql(entry_mod.oracle_sql()["stats_mannwhitney_u"])
    scols = [c.lower() for c in sdf.columns]
    ocols = [c.lower() for c in rel.columns]
    assert sorted(scols) == sorted(ocols)

    def _norm(cols, rws):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(repr(x[i]) for i in order) for x in rws)

    assert _norm(scols, [tuple(x) for x in sdf.collect()]) == _norm(
        ocols, rel.fetchall()
    )


def test_theil_sen_median_identity(spark, sf_dir):
    """The fixed-point slope equals a Python recompute of the median of
    pairwise (cents*100 per day) slopes with truncating division."""
    from catme_etl_j_spark.operators.stats import stats_theil_sen
    from catme_etl_j_spark.sources.tables import load_table

    [r] = stats_theil_sen(spark, sf_dir).collect()
    import math
    from collections import defaultdict

    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "CAST(datediff(to_date(o_orderdate), DATE '1970-01-01') AS LONG) AS d",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    ).collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o["d"]] += o["cents"]
    days = sorted(daily)

    def tdiv(a, b):  # truncate toward zero like Spark DIV / DuckDB //
        return a // b if (a >= 0) == (b >= 0) else -((-a) // b) if b > 0 else None

    slopes = sorted(
        tdiv((daily[d2] - daily[d1]) * 100, d2 - d1)
        for i, d1 in enumerate(days)
        for d2 in days[i + 1:]
    )
    n = len(slopes)
    assert r["n_pairs"] == n
    lo, hi = (n + 1) // 2, n // 2 + 1
    mids = [slopes[lo - 1], slopes[hi - 1]]
    want = sum(mids)
    want = want // 2 if want >= 0 else -((-want) // 2)
    if lo == hi:
        want = slopes[lo - 1]
    assert r["slope_cents_fp"] == want
    assert r["slope_per_day"] == r["slope_cents_fp"] / 10000.0


def test_mutual_information_python_recompute(spark, sf_dir):
    """mi_nats / nmi match an independent Python recompute from the
    exact cell counts (same 1e12 fixed-point summation), and per-cell
    PMI signs agree with count ratios."""
    import math

    from catme_etl_j_spark.operators.stats import _MI_SCALE, stats_mutual_information

    rows = stats_mutual_information(spark, sf_dir).collect()
    assert rows, "sf0.001 must produce cells"
    n_tot = sum(r["n_xy"] for r in rows)
    mx: dict = {}
    my: dict = {}
    for r in rows:
        mx[r["segment"]] = r["n_x"]
        my[r["priority"]] = r["n_y"]
    assert sum(mx.values()) == n_tot and sum(my.values()) == n_tot
    mi_fp = sum(
        math.floor(
            (r["n_xy"] / n_tot)
            * math.log(r["n_xy"] * n_tot / (r["n_x"] * r["n_y"]))
            * _MI_SCALE
            + 0.5
        )
        for r in rows
    )
    want_mi = math.floor(mi_fp / _MI_SCALE * 1e8 + 0.5) / 1e8
    assert rows[0]["mi_nats"] == want_mi
    assert all(r["mi_nats"] == want_mi for r in rows)
    # NMI bounded and consistent: MI <= min(H) implies nmi <= 1 + eps
    assert rows[0]["nmi"] is None or -1e-9 <= rows[0]["nmi"] <= 1 + 1e-9
    for r in rows:
        expected_sign = (
            1 if r["n_xy"] * n_tot > r["n_x"] * r["n_y"] else -1
        )
        if abs(r["pmi_nats"]) > 1e-6:
            assert (r["pmi_nats"] > 0) == (expected_sign > 0)
