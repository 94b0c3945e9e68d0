"""Driver-witness ledger: which queries have ever had a driver-verified
row, and which current gate-window slots are re-spending evidence.

The driver's correctness gate records only the FIRST 50 ``queries()``
entries per round (CORRECTNESS_r{N}.json), so witnessing all ~150
queries takes several rounds of ``_PRIORITY`` rotation. This tool reads
every CORRECTNESS artifact and prints:

* per-family counts of never-witnessed queries,
* current window members that are already green in >=2 prior rounds
  (prime swap-out candidates),
* never-witnessed queries NOT in the current window (swap-in pool).

Usage: python tools/witness.py
"""

from __future__ import annotations

import glob
import json
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402


def _family(name: str) -> str:
    for fam in (
        "convert_", "stream_", "dedup_", "ann_", "text_", "corpus_",
        "rank_", "etl_", "graph_", "embed_", "events_", "asof_",
        "range_", "multimodal_", "sketch_", "window_", "setop_",
        "pivot_", "unpivot_", "lateral_", "agg_", "fn_", "scale_",
    ):
        if name.startswith(fam):
            return fam.rstrip("_")
    return "relational" if name[0] == "q" else "other"


def main() -> int:
    witnessed: dict[str, list[tuple[int, bool]]] = defaultdict(list)
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        data = json.load(open(path))
        for name, rec in data.items():
            ok = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match", True)  # rows-only entries
                and not rec.get("err")
            )
            witnessed[name].append((rnd, ok))

    # VERDICT r7 #3: "witnessed" means a GREEN driver row, not a mere
    # appearance — a failed attempt (rank_postings r7) must stay in the
    # never-witnessed pool. Mirrors tests/test_operators.py's
    # _driver_witnessed ok-predicate.
    green_ever = {
        name for name, rows in witnessed.items()
        if any(ok for _, ok in rows)
    }
    queries = list(entry_mod.queries())
    window = queries[:50]
    never = [q for q in queries if q not in green_ever]
    green2 = [
        q for q in window
        if sum(1 for _, ok in witnessed.get(q, []) if ok) >= 2
    ]
    pool = [q for q in never if q not in window]

    by_fam: dict[str, int] = defaultdict(int)
    for q in never:
        by_fam[_family(q)] += 1
    print(f"queries: {len(queries)}  green-ever: {len(green_ever)}  "
          f"never-green: {len(never)}")
    print("never-witnessed by family:",
          dict(sorted(by_fam.items(), key=lambda kv: -kv[1])))
    print(f"\nwindow members green in >=2 rounds (swap-out candidates, "
          f"{len(green2)}):")
    for q in green2:
        rounds = [r for r, ok in witnessed[q] if ok]
        print(f"  {q}  (green r{rounds})")
    print(f"\nnever-witnessed outside the window (swap-in pool, {len(pool)}):")
    for q in pool:
        print(f"  {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
