"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is built fresh and driven to completion with a count-style
action (foreach-noop via write to noop sink would skip result
materialization; collect of aggregates is small, so collect for
small outputs and count for large ones).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402
from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "q10_returned_items",
    "revenue_anomaly",
    "transaction_volume_anomaly",
    "pattern_break_product",
    "reconciliation_orders_lineitem",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_bruteforce_topk",
    "text_quality_score",
    "doc_fingerprint",
    "asof_purchase_attribution",
    "q7_nation_trade_volume",
    "funnel_view_click_purchase",
    "dedup_lsh_verified",
    "embedding_centroids",
    # r2 additions (baseline floor starts at BENCH_r02)
    "dedup_embedding_cells",
    "contamination_check",
    "quality_filter_pipeline",
    "vector_quantize",
    "multimodal_features",
    "revenue_forecast",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("shdp-bench")
    queries = registry.queries()

    # One warm run (plan analysis + whole-stage codegen compilation,
    # driver-side one-time cost), then TWO measured runs reporting the
    # MINIMUM: identical plans on identical data swing several × on
    # this shared heap when a GC pause lands mid-query (measured,
    # BASELINE.md), so a single sample can fake a regression. The min
    # of two steady-state runs is what a long-running cluster actually
    # sees per execution.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        queries[name](spark, sf_dir).collect()  # warm: codegen + JIT
        best = float("inf")
        for _ in range(2):
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
