"""Interleaved A/B probe (ordering-bias control): the sequential
probes gave contradictory verdicts between stages (front-end HOF 1.8x
faster, full pipeline 1.2x slower), consistent with later-leg JVM/GC
drift. Alternate the legs run-by-run and report min + median of 5.

Legs at $SPARK_GRAFT_SF_DIR:
  distinct:  A window-lead vs B2 fused-lambda array_distinct
  pairs   :  _hash_pair_counts over each front-end
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_UI", "0")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from selfhealingdatapipeline_gcp_spark.session import get_spark  # noqa: E402
from selfhealingdatapipeline_gcp_spark.functions import textfn  # noqa: E402
from selfhealingdatapipeline_gcp_spark.operators import dedup  # noqa: E402


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.testdata/sf1")
    n_runs = int(os.environ.get("N_RUNS", "5"))
    spark = get_spark("shdp-hof-probe3")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    t = textfn.tokens("text")
    idx = F.sequence(F.lit(1), F.size(t) - 2)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(t, i), F.element_at(t, i + 1),
        F.element_at(t, i + 2))

    def leg_a() -> DataFrame:
        return (dedup._shingle_rows(docs)
                .select("doc_id", textfn.md5int(F.col("s")).alias("h"))
                .dropDuplicates(["doc_id", "h"]))

    def leg_b() -> DataFrame:
        fused = lambda i: textfn.md5int(gram(i))  # noqa: E731
        hs = F.array_distinct(
            F.when(F.size(t) >= 3, F.transform(idx, fused))
            .otherwise(F.array().cast("array<bigint>")))
        return (dedup._spread(docs, "doc_id")
                .select("doc_id", F.explode(hs).alias("h")))

    builds = {
        "A distinct": leg_a,
        "B distinct": leg_b,
        "A pairs": lambda: dedup._hash_pair_counts(leg_a(), 10_000),
        "B pairs": lambda: dedup._hash_pair_counts(leg_b(), 10_000),
    }
    for b in builds.values():
        _noop(b())  # warm every leg before any timing
    times: dict[str, list[float]] = {k: [] for k in builds}
    for _ in range(n_runs):
        for k, b in builds.items():
            t0 = time.perf_counter()
            _noop(b())
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k:<12s} min {min(ts):7.3f}  med {statistics.median(ts):7.3f}"
              f"  all {[round(x, 2) for x in ts]}")


if __name__ == "__main__":
    main()
