"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Each query is executed through the ``noop`` write sink, which forces
full computation of the plan (unlike ``count()``, which lets Catalyst
prune projection work) while writing nothing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from catme_etl_j_spark.session import get_spark  # noqa: E402

# Headline set: covers joins+aggs (q01..q10), windows, sessionization,
# shingle/LSH dedup, blocked ANN, and text scoring — the engine's
# scale-critical paths.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q06_revenue_delta",
    "q10_returned_items",
    "window_running_total",
    "events_sessionize",
    "text_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_nn_within_label",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("bench")

    queries = entry_mod.queries()
    # Warm the JVM/session so the first timed query doesn't pay startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
