"""One-off A/B probe (guide §1): window-lead shingle build vs
higher-order-function array build, on this Spark version, this data.

The _shingle_rows docstring carries an r2-era measurement ("HOFs are
interpreted, ~20ms/doc") that justified the posexplode+lead() form;
OPTIMIZATION_r10.md item 2 says re-measure on Spark 4.1 before
touching the shingle family. This probe times, at $SPARK_GRAFT_SF_DIR:

  A. current long-format build: _spread -> posexplode -> lead() window
     -> md5int -> dropDuplicates(doc_id, h)      [2 exchanges + sort]
  B. HOF build: _spread -> array_distinct(transform(shingle_arr,
     md5int)) -> explode                          [1 exchange, no sort]
  C. both drained through the full _hash_pair_counts pair machinery
     (the dedup_ngram_jaccard shape) so the downstream plan is priced
     identically.

Each leg: warm once, then min of 3, noop sink. Also asserts the two
distinct-(doc_id, h) relations are row-identical (exceptAll both ways)
before any timing is trusted.
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


def timed(tag: str, build, n: int = 3) -> float:
    _noop(build())  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _noop(build())
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:<48s} {best:8.3f}s")
    return best


def hof_distinct_hashes(documents: DataFrame) -> DataFrame:
    t = textfn.tokens("text")
    idx = F.sequence(F.lit(1), F.size(t) - 2)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(t, i), F.element_at(t, i + 1),
        F.element_at(t, i + 2))
    hs = F.array_distinct(
        F.when(F.size(t) >= 3,
               F.transform(F.transform(idx, gram), textfn.md5int))
        .otherwise(F.array().cast("array<bigint>")))
    return (dedup._spread(documents, "doc_id")
            .select("doc_id", F.explode(hs).alias("h")))


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shdp-hof-probe")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    n_docs = docs.count()
    print(f"docs: {n_docs}")

    def leg_a() -> DataFrame:
        return (dedup._shingle_rows(docs)
                .select("doc_id", textfn.md5int(F.col("s")).alias("h"))
                .dropDuplicates(["doc_id", "h"]))

    def leg_b() -> DataFrame:
        return hof_distinct_hashes(docs)

    # correctness first: identical (doc_id, h) multisets
    d1 = leg_a().exceptAll(leg_b()).count()
    d2 = leg_b().exceptAll(leg_a()).count()
    assert d1 == 0 and d2 == 0, (d1, d2)
    print("distinct (doc_id,h) relations identical")

    ta = timed("A window-lead distinct hashes", leg_a)
    tb = timed("B HOF distinct hashes", leg_b)

    tap = timed("A full pair counts (ngram_jaccard shape)",
                lambda: dedup._hash_pair_counts(leg_a(), 10_000))
    tbp = timed("B full pair counts (ngram_jaccard shape)",
                lambda: dedup._hash_pair_counts(leg_b(), 10_000))

    # long-format WITH duplicates (the minhash/signature consumer shape)
    def leg_a_dup() -> DataFrame:
        return dedup._shingle_rows(docs).select(
            "doc_id", textfn.md5int(F.col("s")).alias("h"))

    def leg_b_dup() -> DataFrame:
        t = textfn.tokens("text")
        idx = F.sequence(F.lit(1), F.size(t) - 2)
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", F.element_at(t, i), F.element_at(t, i + 1),
            F.element_at(t, i + 2))
        arr = F.when(F.size(t) >= 3, F.transform(idx, gram)) \
               .otherwise(F.array().cast("array<string>"))
        return (dedup._spread(docs, "doc_id")
                .select("doc_id", F.explode(arr).alias("s"))
                .select("doc_id", textfn.md5int(F.col("s")).alias("h")))

    d3 = leg_a_dup().exceptAll(leg_b_dup()).count()
    assert d3 == 0, d3
    tad = timed("A window-lead dup hashes", leg_a_dup)
    tbd = timed("B HOF dup hashes", leg_b_dup)

    print(f"summary: distinct {ta:.3f} vs {tb:.3f}; "
          f"pairs {tap:.3f} vs {tbp:.3f}; dup {tad:.3f} vs {tbd:.3f}")


if __name__ == "__main__":
    main()
