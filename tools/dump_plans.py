"""Regenerate PLANS.md: the formatted physical plans of the flagship
and scale-critical queries at sf0.01, annotated with what to look for.
Run: python tools/dump_plans.py  (rewrites /root/repo/PLANS.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402
from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# query -> the plan property that makes it scale (what the reader
# should find in the dump; tests/test_plan_shapes.py asserts these)
SHOW = {
    "q1_pricing_summary": "PushedFilters on l_shipdate; pruned ReadSchema; "
                          "partial_ aggregates before the exchange",
    "q5_regional_revenue": "BroadcastHashJoin for every dim; no cartesian",
    "dedup_minhash_lsh": "NO join anywhere - bucket-grouped pair emission "
                         "(Generate over collected buckets)",
    "dedup_lsh_verified": "ReusedExchange of the shingle subtree; verify "
                          "shuffles candidate pairs only",
    "ann_bruteforce_topk": "broadcast of the FILTERED query vectors; the "
                           "corpus is never broadcast or shuffled",
    "contamination_check": "distinct 8-byte shingle hashes equi-join; "
                           "never corpus x corpus",
    "doc_chunk_plan": "no aggregate/join exchange at all (scan -> "
                      "project -> explode)",
    "event_rate_cusum": "one corpus-sized aggregate to day grain, then "
                        "Window over the grain; 1-row ref broadcast",
    "cdc_snapshot_diff": "each side reduced to (key, md5) BEFORE the "
                         "full-outer SortMergeJoin",
    "more_like_this": "anchors + anchor norms broadcast; corpus norms "
                      "stay an equi-join",
    "minhash_estimate_report": "signatures computed once (shared "
                               "relation); pairs bounded by banding; "
                               "1-row output aggregate",
    "embedding_outliers": "K x d integer centroid relation broadcast; "
                          "one shuffle at vec_id grain; per-label "
                          "moments are K rows",
    "verbatim_overlap_pairs": "winnowing select via trailing-min window; "
                              "bucket-grouped generator pairs, no "
                              "self-join",
    "brand_affinity": "DISTINCT (order,brand) reduction; generator "
                      "pair emission; O(brand^2) output aggregate",
    "multimodal_ahash_pairs": "r7 collapse: distinct-signature grain "
                              "bucketing, sub-window refinement "
                              "Generate, membership expansion via "
                              "equi-joins on sig_key (no pair "
                              "distinct at corpus grain)",
    "source_zipf_slope": "vocabulary-grain rank window partitioned "
                         "by source; e9-floored integer terms "
                         "partial-aggregate before the exchange",
    "revenue_autocorrelation": "one corpus aggregate to day grain; "
                               "lag windows + closed-form r on the "
                               "O(days) relation; O(lags) output",
    "dedup_drop_list": "CC labels come pre-materialized (checkpoint "
                       "leaf); quality join ships slim (doc_id, "
                       "score) rows; keeper window over bounded "
                       "cluster membership only",
    "source_topic_mix": "slim (doc_id, source)x(vec_id, label) "
                        "equi-join; shares/lift window over the "
                        "dim-sized (source, label) aggregate",
    "source_divergence_matrix": "vocab-grain (source, token, count) "
                                "shuffles; pair join fans a token "
                                "only to sources containing it; "
                                "S-row totals broadcast both sides",
    "embedding_top_component": "one corpus pass (partial-Gram "
                               "mapInPandas); iteration reads the "
                               "checkpointed d^2 relation, never "
                               "the corpus",
    "embedding_intrinsic_dim": "single aggregate over the d^2 "
                               "covariance relation; corpus touched "
                               "once in the Gram stage",
    "dedup_threshold_sweep": "NO thresholds-x-pairs theta-join: "
                             "suffix-cumulative window over the 10 "
                             "fixed buckets, grid joins are "
                             "broadcast EQUI-joins on idx",
    "dedup_cascade_report": "stage semi-joins on digests; the three "
                            "BNLJs are 1-row anchored count "
                            "crossJoins, never data joins",
    "source_quality_calibration": "join-free: source carried through "
                                  "the explode; zero-token docs "
                                  "union in from a scan",
    "event_trigram_paths": "windows partition on (user_id, day); "
                           "the zone re-sequence window runs over "
                           "O(active buckets) rows, never events",
    "decontamination_manifest": "positional shingles semi-join the "
                                "DISTINCT eval hash set; island "
                                "windows run over HITS only",
    "ivf_nprobe_sweep": "ONE pass for the whole tuning curve: "
                        "K-row centroid broadcasts, the "
                        "n_queries*k truth anchor broadcast, and "
                        "the 8-row grid prefix-cumulative — the "
                        "corpus appears only in the truth pass "
                        "and the assignment window",
    "hard_negative_mining": "the candidate relation IS the "
                            "cell-bounded pair pipeline; the "
                            "bidirectional union + per-anchor rank "
                            "window add no join",
    "embedding_coreset_sample": "one cent_id shuffle for the "
                                "in-cell rank/size windows; no "
                                "quadratic stage anywhere",
    "split_embedding_leakage": "split columns are scan-level md5 "
                               "projections over the pair pipeline "
                               "— zero added exchanges",
    "knn_label_propagation": "two unrolled vote rounds on the "
                             "checkpointed O(k*n) edge leaf; "
                             "integer vote counts partial-aggregate "
                             "before each exchange",
    "user_burstiness": "one lag window per user and the same-key "
                       "aggregate — the window partition key IS "
                       "the groupBy key, so the agg reuses the "
                       "window's exchange",
    "token_heavy_hitters": "the CMS aggregate is <=4096 cells "
                           "however large the corpus and broadcasts "
                           "onto the top-k probes; the vocabulary "
                           "top-k is TakeOrdered, never a global "
                           "window",
    "revenue_changepoint": "day-grain prefix window + TakeOrdered "
                           "argmax; the totals anchor is a 1-row "
                           "broadcast",
    "dedup_weighted_sample": "the size relation and the join-back "
                             "both key on 16-byte digests — "
                             "document text never shuffles",
    "quality_drift_ks": "the corpus collapses map-side to "
                        "(type, cent) counts; the cumulative window "
                        "orders DISTINCT cents per type, not rows",
    "dedup_bloom_audit": "the bit array (<= 2^18 positions) and the "
                         "membership probe broadcast; both corpus "
                         "passes collapse to digests",
    "ann_pq_distortion_report": "one corpus pass vs the broadcast "
                                "codebook — the encode cost itself; "
                                "no joins, no vector shuffle",
    "hybrid_search_rrf": "the fusion join runs over the parents' "
                         "bounded top-k outputs — plan-constant "
                         "whatever the corpus",
    "quality_expectations": "the whole rule suite is one scan + one "
                            "1-row aggregate; only the uniqueness "
                            "rule shuffles",
    "temporal_split_plan": "2-value time bounds broadcast; the "
                           "leakage count runs on the (user, side) "
                           "distinct relation",
    "quantile_sketch_audit": "ONE (type, cent) collapse shuffle "
                             "reused (AQE) by bounds / weighted "
                             "percentile / histogram; BNLJ is the "
                             "3-row target grid",
    "zorder_layout_plan": "rank-free layout: 1-row bounds BNLJ, "
                          "both layout labels from one Generate, "
                          "≤128-cell aggregate — no global sort",
    "takedown_manifest": "erase predicate at SCAN level on 3 "
                         "tables; one LeftSemi cascade hop onto "
                         "lineitem",
    "distinct_kmv_audit": "one (type, hash) distinct shuffle; "
                          "salted two-phase min-k — no per-type "
                          "global sort of the key space",
    "join_skew_advisor": "key-grain count relations on both sides; "
                         "the join carries keys+counts, never rows; "
                         "TakeOrdered caps output",
    "range_partition_plan": "corpus collapses to ≤1024 cells; "
                            "boundary planning and balance rollup "
                            "never touch rows again",
    "neyman_allocation_plan": "ONE corpus aggregate to |strata| "
                              "rows; allocation math vs the 1-row "
                              "totals broadcast",
    "series_downsample_m4": "four role branches over ONE runtime "
                            "(type, bkt) shuffle (ReusedExchange); "
                            "output is plan-constant per pixel "
                            "budget",
    "er_name_pairs": "bucket-grouped pair emission (Generate over "
                     "collected blocks, NO self-join node); "
                     "levenshtein verify on paired rows only",
    "forecast_backtest_report": "one day-grain collapse; the 4-method "
                                "explode and error aggregation ride "
                                "the bounded O(days) relation",
    "k_anonymity_audit": "QI-class collapse, then every threshold in "
                         "ONE pass over the bounded class-size "
                         "relation (stack, no re-shuffle)",
    "fk_orphan_audit": "per-edge parent DISTINCT-keys + child agg; "
                       "legs union with no cross-edge barrier",
    "boilerplate_removal_report": "digest-only shuffles; the digest "
                                  "join-back is the only join — no "
                                  "broadcast assumed (corpus-"
                                  "dependent boilerplate set)",
    "series_sax_symbols": "day-grain collapse + bounded ordered "
                          "window; whole-series stats broadcast as "
                          "a 1-row anchor",
    "cdc_incremental_agg": "four independent group-grain aggregates; "
                           "full-outer joins only over bounded "
                           "group relations",
    "sax_motif_novelty": "everything below the day-grain collapse "
                         "rides the bounded symbol relation",
    "catalog_stats_report": "one wide single-pass aggregate per "
                            "table; no joins anywhere",
    "detector_incident_rollup": "four detector legs composed "
                                "verbatim; BNLJs are the parents' "
                                "1-row anchors",
    "er_name_links": "name collapse BEFORE blocking — block "
                     "occupancy bounded by distinct names; "
                     "multiplicities ride columns, not rows",
}


def main() -> None:
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# PLANS — formatted physical plans (sf0.01, regenerate with "
           "`python tools/dump_plans.py`)\n",
           "Each section names the plan property the 100 TB design "
           "depends on; tests/test_plan_shapes.py asserts them so a "
           "regression goes red before it ships.\n"]
    qs = registry.queries()
    for name, note in SHOW.items():
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        out.append(f"\n## {name}\n\n*Look for: {note}.*\n\n```\n{plan}```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOW)} plans)")


if __name__ == "__main__":
    main()
