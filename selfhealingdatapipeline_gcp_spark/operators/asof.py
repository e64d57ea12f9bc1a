"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the scalable union-sort-carry composition (SURVEY §2):
tag the two sides, union them, and carry the most recent right-side
row forward with a running ``last(ignorenulls)`` window — one shuffle
on the join key, no per-group Python, no range explosion. This is
the standard large-scale formulation (vs pd.merge_asof per group,
which needs applyInPandas and bounded groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, left_ts: str,
              right_ts: str, right_cols: tuple[str, ...]) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts < left_ts (strict) within the same ``on`` key.

    Left rows with no prior right row keep NULLs (left as-of join).
    """
    lhs = left.withColumn("__kind", F.lit(0)).withColumn("__ts", F.col(left_ts))
    rhs = (
        right.select(
            on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols])
        .withColumn("__kind", F.lit(1))
    )
    lhs_aligned = lhs.select(
        *[F.lit(None).cast(rhs.schema[f"__r_{c}"].dataType).alias(f"__r_{c}")
          for c in right_cols],
        *[c for c in lhs.columns],
    )
    rhs_aligned = rhs.select(
        *[f"__r_{c}" for c in right_cols],
        *[F.lit(None).cast(dict(lhs.dtypes)[c]).alias(c)
          if c not in (on, "__kind", "__ts") else F.col(c)
          for c in lhs.columns],
    )
    unioned = lhs_aligned.unionByName(rhs_aligned)
    # at equal __ts, left rows sort FIRST (kind 0) so a same-instant
    # right row is NOT visible — strict "<" semantics, matching
    # ASOF JOIN ... ON l.ts > r.ts
    w = (Window.partitionBy(on).orderBy("__ts", "__kind")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.select(
        *lhs.columns,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in right_cols],
    )
    return (
        carried
        .filter(F.col("__kind") == 0)
        .drop("__kind", "__ts")
    )
