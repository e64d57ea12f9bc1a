"""CDC / slowly-changing-dimension operators.

No Delta/Iceberg jars in this environment, so MERGE semantics are
composed from primitive ops (the pyspark guide's emulation): upsert =
anti-join + union; SCD2 = close-out changed rows + append new
versions. Plan shapes are one shuffle on the business key each —
swap the sink for Delta's MERGE INTO on a real deployment without
changing callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins upsert: rows of ``current`` whose key is not
    updated, plus all update rows."""
    surviving = current.join(updates.select(key), key, "left_anti")
    return surviving.unionByName(updates)


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               compare_cols: tuple[str, ...],
               effective_col: str = "effective_from",
               end_col: str = "effective_to",
               current_flag: str = "is_current") -> DataFrame:
    """Apply a batch of updates to an SCD2 dimension.

    dim: (key, compare_cols..., effective_from, effective_to,
    is_current). updates: (key, compare_cols..., effective_from).
    Changed keys get their current row closed out (effective_to :=
    update's effective_from) and a new current row appended; unchanged
    keys pass through untouched.
    """
    cmp = None
    for c in compare_cols:
        ne = F.col(f"d.{c}") != F.col(f"u.{c}")
        cmp = ne if cmp is None else (cmp | ne)

    d, u = dim.alias("d"), updates.alias("u")
    joined = d.join(u, F.col(f"d.{key}") == F.col(f"u.{key}"), "left")

    changed_current = (
        joined
        .filter(F.col(f"d.{current_flag}") & F.col(f"u.{key}").isNotNull() & cmp)
    )
    # close out the old version
    closed = changed_current.select(
        *[F.col(f"d.{c}") for c in (key, *compare_cols, effective_col)],
        F.col(f"u.{effective_col}").alias(end_col),
        F.lit(False).alias(current_flag),
    )
    # untouched rows: history rows, unchanged current rows, and
    # current rows with no update
    untouched = (
        joined
        .filter(~(F.col(f"d.{current_flag}")
                  & F.col(f"u.{key}").isNotNull() & cmp))
        .select("d.*")
    )
    # new current versions for changed keys + brand-new keys
    new_versions = (
        u.join(d.filter(F.col(f"d.{current_flag}")),
               F.col(f"u.{key}") == F.col(f"d.{key}"), "left")
        .filter(F.col(f"d.{key}").isNull() | cmp)
        .select(
            *[F.col(f"u.{c}") for c in (key, *compare_cols, effective_col)],
            F.lit(None).cast("timestamp").alias(end_col),
            F.lit(True).alias(current_flag),
        )
    )
    return untouched.unionByName(closed).unionByName(new_versions)


def latest_snapshot(history: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Collapse an append-only change log to the latest row per key
    (window top-1 — the read side of CDC)."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col))
    return (
        history.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_snapshot_det(history: DataFrame, key: str, ts_col: str,
                        tiebreak: str) -> DataFrame:
    """latest_snapshot with an explicit unique tie-break column: two
    change rows can share a timestamp (same-micro batch loads), and a
    window top-1 on ts alone picks whichever row the shuffle happened
    to order first — a nondeterministic snapshot that breaks
    retry-stability. The tie-break makes the pick a pure function of
    the data."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (
        history.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_from_log(log: DataFrame, key: str, ts_col: str,
                  tiebreak: str, value_cols: tuple[str, ...]) -> DataFrame:
    """Build an SCD2 dimension history directly from an append-only
    change log: each change row becomes a version effective from its
    own timestamp until the key's NEXT change (lead window), with the
    open-ended row flagged current. The write-side scd2_apply merges
    a batch into an existing dimension; this is the from-scratch
    backfill of that same shape — one shuffle on the key, the
    standard lead() plan.

    Tie-break column keeps version order deterministic when change
    timestamps collide (same discipline as latest_snapshot_det)."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return (
        log.select(key, *value_cols,
                   F.col(ts_col).alias("effective_from"),
                   F.lead(ts_col).over(w).alias("effective_to"))
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  compare: tuple[str, ...]) -> DataFrame:
    """Row-level diff between two snapshot versions of a table — the
    CDC audit read (what changed between yesterday's load and
    today's?) and the input a reconciliation alert consumes:
    (key, change_type ∈ added|removed|changed|unchanged).

    One full-outer shuffle join on the business key, with each side
    reduced to (key, fingerprint) BEFORE the exchange — the shuffle
    carries a 32-char digest per row, never the payload, and
    bucketed snapshots co-locate it to zero-shuffle (sources/
    writers.write_bucketed_table). The fingerprint md5s each compare
    column SEPARATELY to a fixed 32-char block (no delimiter to
    collide with values containing it), with NULL encoded as 32 'N's
    — non-hex, so it cannot collide with any real md5 — then hashes
    the concatenation: ('a', NULL) != ('a',) and ('a|b','c') !=
    ('a','b|c'). Callers must pass integer/string columns (floats
    format differently across engines/locales — convert money to
    cents first, the repo-wide rule)."""
    null_mark = F.lit("N" * 32)
    fp = F.md5(F.concat(*[
        F.coalesce(F.md5(F.col(c).cast("string")), null_mark)
        for c in compare]))
    o = old.select(F.col(key).alias("key"), fp.alias("fp_old"))
    n = new.select(F.col(key).alias("key"), fp.alias("fp_new"))
    ct = (F.when(F.col("fp_old").isNull(), "added")
           .when(F.col("fp_new").isNull(), "removed")
           .when(F.col("fp_old") != F.col("fp_new"), "changed")
           .otherwise("unchanged"))
    return (
        o.join(n, "key", "full_outer")
        .select("key", ct.alias("change_type"))
        .orderBy("key")
    )


def churn_report(log: DataFrame, key: str) -> DataFrame:
    """Change-log CHURN audit: the versions-per-key histogram plus
    key/change shares — the number a CDC merge plan is sized from
    (a fat tail means hot keys that dominate every MERGE shuffle and
    deserve salting or a separate compaction cadence; all-1s means
    the log is effectively insert-only and SCD2 is overkill).

    Two bounded shuffles: per-key version counts (the shuffle carries
    keys + counts, never payloads), then the O(max versions)
    histogram; totals ride a broadcast 1-row anchor — never a data
    join. Reference parity: the reference replays BigQuery snapshots
    wholesale (scripts/transform_script); this is the audit that says
    whether incremental MERGE beats that replay."""
    per_key = log.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_versions"))
    return churn_from_version_counts(per_key)


def churn_from_version_counts(per_key: DataFrame) -> DataFrame:
    """The histogram/share tail of churn_report over a prepared
    (key, n_versions) relation — exposed so the streaming admission
    guard can SUM per-epoch counts (version counts are associative,
    which is what makes the streaming form chop-invariant) and reuse
    the identical report shape."""
    hist = per_key.groupBy("n_versions").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    tot = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("total_keys"),
        F.sum("n_versions").cast("bigint").alias("total_changes"))
    n_changes = (F.col("n_versions") * F.col("n_keys")).cast("bigint")
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("n_versions").cast("bigint").alias("n_versions"),
            "n_keys",
            n_changes.alias("n_changes"),
            F.floor(F.col("n_keys") * 1e6 / F.col("total_keys"))
             .cast("bigint").alias("keys_share_e6"),
            F.floor(n_changes * 1e6 / F.col("total_changes"))
             .cast("bigint").alias("changes_share_e6"),
        )
        .orderBy("n_versions")
    )


def incremental_agg_maintain(view_old: DataFrame,
                             minus: DataFrame, plus: DataFrame,
                             new: DataFrame,
                             group_col: str,
                             amount_col: str) -> DataFrame:
    """Incremental view maintenance of a (count, money-sum) aggregate
    under a CDC log, SELF-VERIFIED against full recomputation: the
    maintained view = old-snapshot aggregate + signed delta from the
    log's old-images (``minus``) and new-images (``plus``); the
    ``matches`` flag compares it per group against recomputing from
    the new snapshot. At 100 TB this is the difference between
    touching the delta (minutes) and rescanning the fact table
    (hours) every refresh — and the flag is the trust gate an IVM
    deployment runs on a sampled grain before it retires the
    recompute job. Classic change-propagation for distributive
    aggregates (count/sum propagate; min/max would need the log to
    carry group maxima — deliberately out of scope here).

    All four inputs aggregate INDEPENDENTLY at group grain (map-side
    partials, shuffles carry group keys + two int64s); the maintained
    view is two bounded full-outer joins over group-grain relations,
    the verification one more. Money flows as exact integer cents —
    maintained-vs-recomputed equality is bit-exact, never a tolerance.
    Groups that vanish entirely (all rows deleted) survive as zero
    rows rather than disappearing, so a recomputed-side absence still
    compares (0 == absent-coalesced-0) instead of dropping the row."""
    from selfhealingdatapipeline_gcp_spark.functions import money

    def agg(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        return (df.groupBy(F.col(group_col).alias("g"))
                .agg(F.count(F.lit(1)).cast("bigint").alias(n_name),
                     F.sum(money.acc(money.cents(F.col(amount_col))))
                      .cast("bigint").alias(c_name)))

    base = agg(view_old, "n_old", "c_old")
    dm = agg(minus, "n_minus", "c_minus")
    dp = agg(plus, "n_plus", "c_plus")
    maintained = (
        base.join(dm, "g", "full_outer").join(dp, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("n_old", F.lit(0)) - F.coalesce("n_minus", F.lit(0))
             + F.coalesce("n_plus", F.lit(0))).cast("bigint").alias("n_rows"),
            (F.coalesce("c_old", F.lit(0)) - F.coalesce("c_minus", F.lit(0))
             + F.coalesce("c_plus", F.lit(0))).cast("bigint")
             .alias("amount_cents")))
    rec = agg(new, "n_rec", "c_rec")
    return (
        maintained.join(rec, "g", "full_outer")
        .select(
            F.col("g").alias(group_col),
            F.coalesce("n_rows", F.lit(0)).cast("bigint").alias("n_rows"),
            F.coalesce("amount_cents", F.lit(0)).cast("bigint")
             .alias("amount_cents"),
            F.coalesce("n_rec", F.lit(0)).cast("bigint")
             .alias("n_rows_recomputed"),
            F.coalesce("c_rec", F.lit(0)).cast("bigint")
             .alias("amount_cents_recomputed"),
            ((F.coalesce("n_rows", F.lit(0))
              == F.coalesce("n_rec", F.lit(0)))
             & (F.coalesce("amount_cents", F.lit(0))
                == F.coalesce("c_rec", F.lit(0)))).alias("matches"))
        .orderBy(group_col)
    )
