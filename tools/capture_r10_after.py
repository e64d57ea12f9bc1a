"""Capture plans/r10/<name>_after.txt for the queries touched in the
r10 optimization round — the explain("formatted") of each final
DataFrame at sf0.1, the same capture protocol as the *_before.txt
files (BUILD_EXECUTES builders run their iterative work during the
build; the captured plan is the final result relation's plan, which
for driver-leg hybrids is the materialized local relation — that IS
the optimization evidence: the per-round distributed subtrees are
gone).

Run: python tools/capture_r10_after.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402
from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r10")

DEFAULT = [
    "embedding_top_component", "dedup_clusters", "dedup_verified_clusters",
    "dedup_drop_list", "dedup_rate_report", "dedup_cluster_size_histogram",
    "dedup_cascade_report", "leakage_safe_split", "er_name_clusters",
    "streaming_er_guard", "knn_label_propagation",
    "bpe_vocab", "bpe_vocab_deep", "bpe_token_ids",
]


def main(names: list[str]) -> None:
    spark = get_spark("r10-after-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names or DEFAULT:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT, f"{name}_after.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}: {len(plan.splitlines())} lines")


if __name__ == "__main__":
    main(sys.argv[1:])
