"""Ad-hoc subset bench: replicate bench.py's per-query protocol
(warm-up + median-of-3/5, noop sink, eager-set end-to-end timing) for
the names given on argv — the quiet-machine re-bench tool VERDICT r9
#3 asks for. Usage:

    python tools/bench_subset.py [-n RUNS] name [name ...]

The pinned q03_shipping_priority control (VERDICT r10 #2) is always
timed first, so every receipt carries its own machine-speed anchor.
With BENCH_RECORD=1 the run appends raw samples to BENCH_LOG.jsonl.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import EAGER_CONSTRUCTION as EAGER  # noqa: E402  (single source)
from bench import write_bench_log  # noqa: E402
from catme_etl_j_spark.session import get_spark  # noqa: E402

CONTROL = "q03_shipping_priority"


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    if CONTROL not in args:
        args = [CONTROL] + args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-subset")
    queries = entry_mod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    timings = {}
    raw: dict[str, list[float]] = {}
    for name in args:
        samples: list[float] = []

        def run_once(timed: bool) -> None:
            # mirror bench.py's r11 measurement fix: cached intermediates
            # must not carry across timed runs
            spark.catalog.clearCache()
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            if name not in EAGER:
                t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            if timed:
                samples.append(time.time() - t0)

        run_once(False)
        for _ in range(n_runs):
            run_once(True)
        if sorted(samples)[len(samples) // 2] < 1.0 and n_runs == 3:
            for _ in range(2):
                run_once(True)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        raw[name] = [round(s, 3) for s in samples]
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps(timings))
    if os.environ.get("BENCH_RECORD") == "1":
        write_bench_log(
            tool="bench_subset.py", sf_dir=sf_dir, timings=timings, raw=raw,
            n_runs=n_runs,
        )


if __name__ == "__main__":
    main()
