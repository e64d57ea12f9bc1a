"""Follow-up isolation for the hof_shingle_probe anomaly: B-distinct
standalone read 17 s while the full pair pipeline on the same leg read
2.18 s (faster than A's 2.91 s). Isolate which expression shape causes
the 23x, and whether the pair-pipeline delta is stable.

Variants (all noop-drained, warm + min of 3):
  A  : window-lead -> md5int column -> dropDuplicates      (current)
  B  : array_distinct(transform(transform(idx,gram), md5int)) explode
  B1 : transform(idx,gram) explode -> md5int column -> dropDuplicates
  B2 : array_distinct on HASH array built with ONE transform
       (gram+md5 fused in a single lambda)
plus the pair pipelines over A and B1, re-timed, and a count() action
cross-check on A/B distinct.
"""

from __future__ import annotations

import os
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


def timed(tag: str, build, n: int = 3, action=_noop) -> float:
    action(build())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        action(build())
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<52s} {best:8.3f}s")
    return best


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shdp-hof-probe2")
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
        hs = F.array_distinct(
            F.when(F.size(t) >= 3,
                   F.transform(F.transform(idx, gram), textfn.md5int))
            .otherwise(F.array().cast("array<bigint>")))
        return (dedup._spread(docs, "doc_id")
                .select("doc_id", F.explode(hs).alias("h")))

    def leg_b1() -> DataFrame:
        arr = F.when(F.size(t) >= 3, F.transform(idx, gram)) \
               .otherwise(F.array().cast("array<string>"))
        return (dedup._spread(docs, "doc_id")
                .select("doc_id", F.explode(arr).alias("s"))
                .select("doc_id", textfn.md5int(F.col("s")).alias("h"))
                .dropDuplicates(["doc_id", "h"]))

    def leg_b2() -> DataFrame:
        fused = lambda i: textfn.md5int(gram(i))  # noqa: E731
        hs = F.array_distinct(
            F.when(F.size(t) >= 3, F.transform(idx, fused))
            .otherwise(F.array().cast("array<bigint>")))
        return (dedup._spread(docs, "doc_id")
                .select("doc_id", F.explode(hs).alias("h")))

    timed("A  window distinct (noop)", leg_a)
    timed("B  distinct-of-hash-array (noop)", leg_b)
    timed("B1 HOF grams, column hash, dropDup (noop)", leg_b1)
    timed("B2 fused-lambda distinct (noop)", leg_b2)
    timed("A  window distinct (count)", leg_a,
          action=lambda df: df.count())
    timed("B  distinct-of-hash-array (count)", leg_b,
          action=lambda df: df.count())
    timed("A  pairs (noop)",
          lambda: dedup._hash_pair_counts(leg_a(), 10_000))
    timed("B1 pairs (noop)",
          lambda: dedup._hash_pair_counts(leg_b1(), 10_000))
    timed("B  pairs (noop)",
          lambda: dedup._hash_pair_counts(leg_b(), 10_000))


if __name__ == "__main__":
    main()
