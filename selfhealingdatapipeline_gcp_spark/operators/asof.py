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
    # ASOF JOIN ... ON l.ts > r.ts. Third key: when SEVERAL right rows
    # share (key, ts), the carried row is the struct-MIN over
    # right_cols (ties sort desc, last() takes the window-nearest) —
    # deterministic instead of partition-order-dependent (ADVICE r7).
    tie = F.struct(*[F.col(f"__r_{c}") for c in right_cols]).desc()
    w = (Window.partitionBy(on).orderBy("__ts", "__kind", tie)
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


def range_join_purchase_context(events: DataFrame,
                                window_hours: int = 1) -> DataFrame:
    """Bucketed RANGE JOIN: for every purchase, count the same user's
    view/click events in the trailing ``window_hours`` interval.

    The scale trap this avoids: a naive interval join keyed only on
    user_id fans out events-per-user² for hot users (and with no equi
    key at all, Spark falls back to a nested-loop join). Here the
    prior side buckets by hour and each purchase probes exactly the
    two covering buckets (an exploded 2-element array), so the join
    key is (user_id, hour_bucket) — fan-out is bounded per user-hour,
    skew-resistant, and always a hash/sort-merge equi-join. The exact
    interval predicate filters after the bucket join.
    """
    us = 3_600_000_000 * window_hours  # window in microseconds
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .distinct()
    )
    prior = (
        events.filter(F.col("event_type").isin("view", "click"))
        .select(
            "user_id", "ts", "event_type",
            F.floor(F.unix_micros("ts") / us).alias("bucket"))
    )
    # floor((t-w)/w) == floor(t/w) - 1 exactly (integer micros), so the
    # two probe buckets are always distinct — no double-join of a
    # prior event.
    probes = purch.withColumn(
        "bucket",
        F.explode(F.array(
            F.floor(F.unix_micros("p_ts") / us) - 1,
            F.floor(F.unix_micros("p_ts") / us))),
    )
    in_window = (
        (F.col("ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_hours} HOURS"))
        & (F.col("ts") < F.col("p_ts"))
    )
    agg = (
        probes.join(prior, ["user_id", "bucket"])
        .filter(in_window)
        .groupBy("user_id", "p_ts")
        .agg(
            F.sum((F.col("event_type") == "view").cast("bigint"))
             .alias("n_views"),
            F.sum((F.col("event_type") == "click").cast("bigint"))
             .alias("n_clicks"),
        )
    )
    return (
        purch.join(agg, ["user_id", "p_ts"], "left")
        .select(
            "user_id", "p_ts",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        )
    )


def asof_join_forward(left: DataFrame, right: DataFrame, on: str,
                      left_ts: str, right_ts: str,
                      right_cols: tuple[str, ...]) -> DataFrame:
    """Forward as-of join: for each left row, attach the EARLIEST
    right row with right_ts > left_ts (strict) within the same key —
    the "next event" direction (kdb window joins, QuestDB LT JOIN
    mirrored, DuckDB ``ASOF JOIN ... ON l.ts < r.ts``). Same
    union-sort-carry shape as asof_join with the scan order
    reversed: one shuffle on the key, carry the nearest FUTURE right
    row backward with last(ignorenulls) over a descending window.

    Left rows with no later right row keep NULLs (left join)."""
    lhs = (left.withColumn("__kind", F.lit(0))
           .withColumn("__ts", F.col(left_ts)))
    rhs = (
        right.select(
            on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols])
        .withColumn("__kind", F.lit(1))
    )
    lhs_aligned = lhs.select(
        *[F.lit(None).cast(rhs.schema[f"__r_{c}"].dataType)
          .alias(f"__r_{c}") for c in right_cols],
        *[c for c in lhs.columns],
    )
    rhs_aligned = rhs.select(
        *[f"__r_{c}" for c in right_cols],
        *[F.lit(None).cast(dict(lhs.dtypes)[c]).alias(c)
          if c not in (on, "__kind", "__ts") else F.col(c)
          for c in lhs.columns],
    )
    unioned = lhs_aligned.unionByName(rhs_aligned)
    # descending time; at equal __ts left rows sort FIRST (kind 0) so
    # a same-instant right row is NOT visible — strict ">" semantics.
    # Third key: when SEVERAL right rows share (key, ts), carry the
    # struct-MIN over right_cols (ties sort desc, last() takes the
    # window-nearest) — deterministic instead of
    # partition-order-dependent (ADVICE r7: latent parity flake on
    # asof_next_purchase's next_purchase_id).
    tie = F.struct(*[F.col(f"__r_{c}") for c in right_cols]).desc()
    w = (Window.partitionBy(on)
         .orderBy(F.col("__ts").desc(), F.col("__kind"), tie)
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.select(
        *lhs.columns,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w)
          .alias(f"next_{c}") for c in right_cols],
    )
    return (
        carried
        .filter(F.col("__kind") == 0)
        .drop("__kind", "__ts")
    )
