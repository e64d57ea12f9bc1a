"""Audit: which registered queries end in a TRAILING global Sort?

Builds every registry entry at sf0.001 and walks the physical plan
from the root past AdaptiveSparkPlan / WholeStageCodegen / Project /
*QueryStage wrappers: if the first substantive node is a Sort
(global=true), the query pays a rangepartitioning Exchange + global
Sort purely for output presentation (guide §2.4: "an orderBy used
only to make output deterministic" — the driver's value hash sorts
rows on both engines before comparing, so the row multiset, i.e. the
declared result, is order-insensitive). orderBy+limit compiles to
TakeOrderedAndProject and is NOT flagged (semantic top-N).

Usage: python tools/audit_trailing_sort.py > /tmp/trailing_sorts.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402
from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

SKIP_WRAPPERS = ("AdaptiveSparkPlanExec", "WholeStageCodegenExec",
                 "ProjectExec", "InputAdapter", "CollectMetricsExec",
                 "ResultQueryStageExec")


def top_sort(df) -> str | None:
    node = df._jdf.queryExecution().executedPlan()
    while True:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            node = node.executedPlan() if node.isFinalPlan() else \
                node.initialPlan()
            continue
        if cls in SKIP_WRAPPERS or cls.endswith("QueryStageExec"):
            it = node.children().iterator()
            if not it.hasNext():
                return None
            node = it.next()
            continue
        if cls == "SortExec":
            is_global = getattr(node, "global")()
            return node.sortOrder().toString() if is_global else None
        return None


def main() -> None:
    spark = get_spark("audit-trailing-sort")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    flagged: dict[str, str] = {}
    errs: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            so = top_sort(fn(spark, SF))
            if so is not None:
                flagged[name] = so
                print(f"SORT {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            errs[name] = f"{type(e).__name__}: {e}"[:160]
            print(f"ERR {name}: {errs[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"flagged": flagged, "errors": errs,
                      "n_flagged": len(flagged),
                      "n_total": len(qs)}, indent=1))


if __name__ == "__main__":
    main()
