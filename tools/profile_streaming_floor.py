"""Phase-level profile of the structured-streaming guard family
(VERDICT r10 #5): where do the per-guard seconds actually go —
query start/stop machinery, the foreachBatch epoch write(s), or the
downstream report + action?

Phases per guard (timed separately, min over N repeats):
  build   — builder call up to (not including) stream start; for the
            guards this includes the schema read
  stream  — writeStream.start() .. awaitTermination() (machinery +
            the micro-batch epoch write jobs)
  report  — building the downstream report DataFrame over the epoch
            store
  action  — driving it (collect or JVM noop-equivalent)

Plus a MINIMAL floor probe: a trivial availableNow foreachBatch
stream over a 1-row parquet, which bounds the irreducible
start/stop cost on this host.

Usage: python tools/profile_streaming_floor.py [sf_dir] [n_repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402


def minimal_floor(spark, tmpdir: str) -> float:
    path = f"{tmpdir}/one_row.parquet"
    if not os.path.exists(path):
        spark.range(1).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    t0 = time.perf_counter()
    q = (spark.readStream.schema(schema).parquet(path)
         .writeStream.foreachBatch(lambda df, eid: None)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-streaming-floor")
    spark.sparkContext.setLogLevel("ERROR")

    floors = [minimal_floor(spark, "/tmp/shdp_floor") for _ in range(n + 1)]
    print(json.dumps({"minimal_floor_runs": [round(f, 3) for f in floors],
                      "min": round(min(floors[1:]), 3)}), flush=True)

    from selfhealingdatapipeline_gcp_spark.streaming import monitors

    guards = ["streaming_churn_guard", "streaming_heavy_hitters",
              "streaming_bloom_guard", "streaming_expectations_guard",
              "streaming_er_guard", "streaming_quantile_guard",
              "streaming_kmv_guard"]
    out = {}
    for g in guards:
        fn = getattr(monitors, g)
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            if g == "streaming_er_guard":
                df._jdf.queryExecution().executedPlan().execute().count()
            else:
                df.collect()
            t2 = time.perf_counter()
            phases = (round(t1 - t0, 3), round(t2 - t1, 3))
            if best is None or sum(phases) < sum(best):
                best = phases
        out[g] = {"builder_incl_stream": best[0], "report_action": best[1]}
        print(json.dumps({g: out[g]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
