"""Per-query job/stage profile for optimization work (guide §1).

Runs the named registry queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the noop sink, labelled jobs and the status-store API,
then prints one line per Spark job (description, wall ms, n stages)
so driver-roundtrip-heavy operators (iterative loops) show their
per-round cost, plus the executed-plan Exchange/join counts.

Usage: python tools/profile_query.py name [name ...]
       BUILD=1 to time the builder call too (BUILD_EXECUTES ops).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "0")

from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402
from selfhealingdatapipeline_gcp_spark import registry  # noqa: E402


def main(argv: list[str]) -> None:
    names = argv or ["dedup_drop_list"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shdp-profile")
    sc = spark.sparkContext
    qs = registry.queries()
    tracker = sc.statusTracker()
    for name in names:
        # warm run (codegen etc.)
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        jobs_before = set(tracker.getJobIdsForGroup() or [])
        sc.setJobGroup(f"prof-{name}", name)
        t0 = time.perf_counter()
        tb0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        build_s = time.perf_counter() - tb0
        df.write.format("noop").mode("overwrite").save()
        total_s = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sorted(set(tracker.getJobIdsForGroup(f"prof-{name}") or []))
        print(f"== {name}: total {total_s:.3f}s (build {build_s:.3f}s), "
              f"{len(jobs)} jobs")
        jsc = sc._jsc.sc().statusStore()
        for jid in jobs:
            try:
                jd = jsc.job(jid).get()
                sub = jd.submissionTime().get()
                comp = jd.completionTime().get()
                ms = comp.getTime() - sub.getTime()
                desc = (jd.description().get()
                        if jd.description().isDefined() else "")
                nstg = jd.stageIds().size()
                print(f"   job {jid}: {ms:6d} ms  stages={nstg}  {desc[:60]}")
            except Exception as exc:  # noqa: BLE001
                print(f"   job {jid}: <no data: {exc}>")
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re
        counts = {n: len(re.findall(rf"\b{n}\b", plan))
                  for n in ("Exchange", "BroadcastHashJoin",
                            "SortMergeJoin", "BroadcastNestedLoopJoin",
                            "BatchEvalPython", "ArrowEvalPython")}
        print(f"   final-plan nodes: {counts}")


if __name__ == "__main__":
    main(sys.argv[1:])
