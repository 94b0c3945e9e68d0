"""Synthesize a LARGER-than-driver scale stress dataset (VERDICT r6 #8).

sf0.1 caught cross-engine breaks sf0.01 could not (the AMS one-ULP
DECIMAL-// drift, the r5 BFS-backbone threshold); the same logic says
threshold-sensitive operators (top-N %, quantile cuts, cap logic)
deserve one probe BEYOND the driver's largest scale before a real
driver run finds the break. This tool builds an sf0.3-equivalent by
KEY-OFFSET REPLICATION of the read-only sf0.1 tables — deterministic
(no RNG, no timestamps), so a re-run is byte-identical:

* every key column (order/cust/supp/part/doc/vec/event/user) gets
  +1_000_000 per replica — collision-free above every sf0.1 max key,
  FK consistency preserved within a replica;
* region/nation stay fixed (they are SF-invariant dimensions);
* document text gets a per-replica suffix token (and n_chars keeps its
  n_chars == length(text) invariant) so replicated docs are NEAR-dups,
  not exact dups — dedup operators see realistic growth, not a
  pathological all-duplicate corpus;
* embeddings replicate vectors unchanged: identical-cosine ties are
  exactly the degenerate case conv. #6 tie-breaks must absorb.

The output is a cross-engine stress fixture, not a statistical claim:
selfcheck compares Spark vs DuckDB on the SAME data, so replication
only needs to grow volumes past the thresholds, which it does (3x rows
per fact table, 3x entities).

Usage: python tools/gen_scale.py [dst_dir] [replicas]
       (default /root/repo/.scaledata/sf0.3, 3 replicas — ~2 min)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000  # per-replica key offset, > every sf0.1 max key

# key columns to offset, per table (all other columns pass through)
KEYS = {
    "region": set(),
    "nation": set(),
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey"},
    "events": {"event_id", "user_id"},
    "embeddings": {"vec_id"},
    "documents": {"doc_id"},
}


def main() -> int:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf0.3"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        if not keys:  # SF-invariant dimension: copy through once
            con.sql(
                f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
                f"'{dst}/{table}.parquet' (FORMAT PARQUET)"
            )
            print(f"{table}: copied (dimension)")
            continue
        selects = []
        for i in range(replicas):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i * OFF} AS {c}")
                elif table == "documents" and c == "text" and i > 0:
                    exprs.append(f"text || ' rep{i}' AS text")
                elif table == "documents" and c == "n_chars" and i > 0:
                    exprs.append(f"n_chars + {len(f' rep{i}')} AS n_chars")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows ({replicas} replicas)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
