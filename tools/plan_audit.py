"""Regenerate PLANS.md: formatted physical plans of the scale-critical
queries, so the plan-shape claims in SCALE.md and the operator
docstrings are verifiable receipts rather than prose.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plans,
not timings, so the smallest data is fine; plan shape is SF-invariant
for everything here except AQE's broadcast-threshold choices, which
SCALE.md §Relational already discusses.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catme_etl_j_spark.plans.explain import formatted_plan  # noqa: E402
from catme_etl_j_spark.session import get_spark  # noqa: E402

# (query, what the plan must show) — one line of intent per receipt.
AUDIT = [
    ("q01_pricing_summary", "partial + final HashAggregate; pruned scan"),
    ("q05_local_supplier", "dims broadcast; filters pushed to scans"),
    ("q06_revenue_delta", "every predicate in PushedFilters; 4-column ReadSchema"),
    ("q10_returned_items", "TakeOrderedAndProject (no global sort)"),
    ("dedup_minhash_lsh", "band-bucket equi-join; no cartesian anywhere"),
    ("dedup_incremental_index", "batch bands probe index bands; equi-joins only"),
    ("ann_nn_within_label", "salted (label, salt) join key"),
    ("ann_topk_ivf_kmeans", "tiny codebook broadcast; TakeOrdered probe"),
    ("embed_covariance", "vec_id co-partitioned self-join; partial_sum combine"),
    ("sketch_kmv_distinct", "broadcast tau prefilter before the bottom-k sort"),
    ("rank_bm25_search", "per-term stats broadcast; per-doc lengths shuffle join"),
    ("corpus_e2e_funnel", "one staged text frame; no repeated scans of documents"),
    ("etl_scd2_fact_join", "custkey equi-join with residual interval filter"),
    ("scale_salted_group_sum", "two-phase aggregate: (key, salt) then key"),
    ("events_sessionize", "single user-partitioned sort window"),
    ("scale_zorder_locality", "two global sorts only (layout compare); pruned scans"),
    # round-6 additions (VERDICT r5 #9: every bench entry >=1 s gets a receipt)
    ("range_month_in_flight", "sweep-line deltas; no per-month explode of the fact, no BroadcastNestedLoopJoin"),
    ("embed_e2e_pipeline", "bucket equi-join for candidates; no cartesian; single-row stat joins broadcast"),
    ("corpus_bpe_tokenize", "50-merge replace chain in ONE projection over the (source, word) aggregate"),
    ("sketch_ams_f2", "16-estimator explode combines map-side to 16 keys"),
    # round-7 additions: the data-scaled iterative loops and the planner
    ("graph_pagerank_users", "per-round ranks-onto-edges hash equi-joins; checkpointed edge list; no nested loop"),
    ("graph_lpa_communities", "per-round label equi-join + partial-aggregated struct-max argmax (no per-round sort); no nested loop"),
    ("scale_compaction_plan", "single partial+final aggregate over the fact scan; 3-column ReadSchema"),
    ("stats_theil_sen", "histogram range-partitioned; pid-partitioned cumsum window (no global single-partition sort)"),
    # round-7 second wave: warehouse/feature-store/LLM-curation archetypes
    ("events_feature_asof", "ONE fused Window operator for all four trailing frames; single (user_id) exchange"),
    ("etl_bitemporal_asof", "one pruned scan (pushed o_orderdate range); inline version-array explode; 2-row spine broadcast"),
    ("etl_late_arriving_dim", "pushed cutoff filter; broadcast dim joins; spine is the only nested-loop join"),
    ("corpus_dsir_importance", "checkpointed compressed frame feeds weights AND scoring (zero corpus re-scan); weight table broadcast"),
    ("embed_pca_outliers", "map-only projection onto the solved axis; TakeOrderedAndProject, no join"),
    # round-7 third wave: zone maps, sketch set algebra, data mixing, drift
    ("scale_minmax_pruning", "ONE fact scan posexploded into both layouts; broadcast 1-row bounds; 2-column ReadSchema"),
    ("sketch_theta_setops", "data-sized work is one distinct; all set ops over broadcast/bounded <=2K-row states"),
    ("corpus_token_budget_mix", "one corpus scan combines to |sources| rows; allocation windows over the bounded aggregate"),
    ("etl_schema_evolution", "zero-shuffle union; single rollup aggregate; 4-column ReadSchema per slice"),
    # round-7 fourth wave
    ("ann_matryoshka_recall", "one checkpointed scored frame; per-dim TakeOrdered pulls read Scan ExistingRDD, no parquet rescans"),
    ("graph_s_core_peeling", "per-round LEFT SEMI hash equi-joins + partial strength aggregate; checkpointed edge list"),
    ("etl_scd3_previous_value", "rank + lead + count in ONE Window operator behind a single (o_custkey) exchange"),
    ("multimodal_chunk_manifest", "scan -> generate -> project; the only exchange is the output sort"),
    # round-8 additions: the new iterative loops and heavy shapes
    ("graph_connected_components", "per-round min-label hash equi-joins + partial_min combine; checkpointed symmetric edges; no nested loop"),
    ("embed_kmeans_sse", "K x 64 centroid table broadcast every round; partial-combined distance sums; no cartesian"),
    ("sketch_kmv_jaccard", "hash-keyed exact-intersection equi-join; nested loops only against the bounded pair grid"),
    ("rank_query_likelihood", "query-term broadcast prune before aggregation; TakeOrderedAndProject top-k"),
    ("stats_spearman_corr", "two value-keyed hash joins back to rows; DECIMAL moment aggregate partial-combines"),
    ("etl_changelog_compaction", "row_number + per-key depth fused behind ONE key exchange; no self-join"),
    ("multimodal_payload_entropy", "one-pass hex chunking (no O(len^2) substring); (doc, byte) partial_count combine"),
    ("window_max_drawdown", "fact collapses to |days| before the running-peak window; TakeOrderedAndProject"),
    # round 9
    ("text_quality_classifier", "ONE map-only codegen projection; no exchange/join/window"),
    ("corpus_dedup_paragraphs", "one posexplode; seg-keyed exchange into a partition-only min-struct window"),
    ("stats_bootstrap_ci", "bounded B x |days| index frame equi-joins the ranked calendar; per-replicate partial sums"),
    ("scale_merge_binpack", "part_id-partitioned running-sum window (no global sort); map-side file aggregate"),
    # round 9, second wave
    ("corpus_cdc_chunking", "ONE explode; lag-gram + chunk-id cumsum share one (doc_id) exchange; no join; TakeOrderedAndProject"),
    ("stats_kendall_tau", "checkpointed |nations| frame: zero parquet in the pair grid; bounded nested loops only"),
    ("stats_permutation_test", "checkpointed |days| frame feeds obs + K-flip explode; per-replicate partial sums"),
    ("rank_smart_lnc_ltc", "checkpointed (doc, term) weights: zero tokenize explodes in the final plan; per-doc norm join never broadcast-hinted"),
    # round 9, third wave
    ("stats_mutual_information", "checkpointed cell frame feeds marginals/entropies/MI: zero parquet re-scans; scalar frames attach broadcast"),
    ("etl_interval_coalesce", "two gaps-and-islands Windows over ONE (custkey, start, key) sort; island aggregate reuses the partitioning"),
    ("window_bollinger_bands", "n/sum/sum-of-squares fused into ONE Window over the collapsed daily frame; single pruned scan"),
    ("graph_katz_centrality", "checkpointed node + edge invariants: zero parquet scans in the 4-round loop; audit attaches broadcast"),
    ("text_kneser_ney_bigram", "checkpointed bigram-type frame: one corpus explode feeds ctx/cont/D/final; no re-tokenization"),
    ("sketch_linear_counting", "one distinct (grp,user,bit) pass; merged row is a union over the checkpoint, not a self-join"),
    # --- round 10: convention-#12 closure (VERDICT r9 #1/#2) + newborns ---
    ("graph_lpa_communities", "shipped plan: zero parquet, ONE audit equi-join over the truncated final/prev label RDDs"),
    ("graph_pagerank_users", "shipped plan: node set + final ranks checkpointed — zero parquet, one audit equi-join, TakeOrdered"),
    ("dedup_url_keep_first", "one pruned scan -> codegen canonicalization -> single map-side-combining aggregate; no join"),
    ("corpus_doremi_mixture", "two map-side-combined corpus aggregates; reweight windows over the |sources|-row frame only"),
    ("corpus_decontaminate_13gram", "gram-hash equi-join after map-side DISTINCT; the 8-gram plan with fewer exploded rows"),
    # --- round 11: graph perf rework receipts + newborns ---
    ("graph_s_core_peeling", "shipped plan: zero parquet, <= SCORE_ITERS scalar crossJoins, literal Range rows past the fixpoint"),
    ("dedup_semdedup_prune", "zero parquet re-scans (checkpointed Lloyd state); salted (cluster, salt) pool probe; Arrow-batched dot"),
    ("corpus_decontaminate_vs", "eval gram set BROADCAST into the overlap probe; train source predicate pushed; 3 scans total"),
]

HEADER = """# PLANS — physical-plan receipts

`.explain("formatted")` output of the scale-critical queries (regenerate
with `python tools/plan_audit.py`). Each section names the property the
plan must exhibit; tests/test_plans.py asserts the load-bearing ones.
Plans below were captured on {sf} (plan SHAPE is what matters; AQE may
re-plan exchanges at runtime from real sizes).
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    import __spark_entry__ as entry

    queries = entry.queries()
    out = [HEADER.format(sf=os.path.basename(sf_dir.rstrip("/")))]
    for name, intent in AUDIT:
        df = queries[name](spark, sf_dir)
        plan = formatted_plan(df)
        out.append(f"\n## {name}\n\n*Must show:* {intent}\n\n```\n{plan}```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("".join(out))
    print(f"wrote {path} ({len(AUDIT)} plans)")


if __name__ == "__main__":
    main()
