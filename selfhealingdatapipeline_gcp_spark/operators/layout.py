"""Storage-layout advisors: the file-clustering decisions that drive
min-max scan pruning — at 100 TB the dominant cost lever is not the
plan but which files a predicate lets the scan SKIP (parquet
row-group / file statistics pruning; Delta/Iceberg OPTIMIZE ZORDER is
this exact operation productized).

Everything is exact integer arithmetic over quantized dimension
values: layout assignment is a deterministic function of the row (no
rand(), no global sort — cell membership comes from the TOP BITS of
the interleaved z-value, so the "optimize" pass is one scan + one
cell-grain aggregate, not a total order), and the report is the
per-file min-max span a pruning-capable reader would see.

Reference scope note: the reference pipeline materializes transformed
tables with no layout control (scripts/transform_script writes
straight to the warehouse); this family adds the layout QA a 100 TB
deployment of the same pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QBITS = 16  # per-dimension quantization width
_CELL_BITS = 3  # top bits per dimension -> 2^(2*3) = 64 files


def _interleave_top(b1, b2, bits: int):
    """Interleave the low ``bits`` bits of b1 (odd positions) and b2
    (even positions) — the classic Morton/z-order key, as a plain sum
    of shift-and-mask terms (codegen-friendly, engine-portable)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)),
                           2 * i + 1)
             + F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)),
                           2 * i))
    return z


def zorder_layout_plan(lineitem: DataFrame, n_cell_bits: int = _CELL_BITS
                       ) -> DataFrame:
    """Z-order clustering benefit report: lay lineitem out two ways —
    'natural' (equal-width slices of l_orderkey, the insertion-order
    proxy) and 'zorder' (cells = top bits of the Morton interleave of
    quantized (ship-date, partkey)) — and report each file's row count
    and min-max SPAN of both dimensions in quantized units. The span
    is what parquet/Delta/Iceberg min-max pruning sees: a point or
    range predicate must read every file whose span covers it, so
    sum-of-spans per dimension is proportional to the files scanned.
    Natural order leaves the partkey span near-full in every file
    (pruning skips nothing); z-order bounds BOTH dimensions, which is
    the whole argument for OPTIMIZE ZORDER before a 100 TB backfill.

    Determinism: quantization and cell assignment are pure integer
    functions of the row and the broadcast 1-row bounds; no rand(),
    no rank. Scale shape: ONE corpus pass (bounds broadcast in), the
    two layout labels exploded from the same row, then a ≤ 2·4^bits
    cell-grain aggregate — no global sort, unlike rank-based
    binning (a real OPTIMIZE rewrite would range-partition on the
    z-key; the REPORT never needs the sort)."""
    n_files = 1 << (2 * n_cell_bits)
    dt = F.datediff(F.col("l_shipdate"), F.lit("1992-01-01").cast("date"))
    pk = F.col("l_partkey")
    ok = F.col("l_orderkey")
    bounds = lineitem.agg(
        F.min(dt).cast("long").alias("mn_dt"),
        F.max(dt).cast("long").alias("mx_dt"),
        F.min(pk).cast("long").alias("mn_pk"),
        F.max(pk).cast("long").alias("mx_pk"),
        F.min(ok).cast("long").alias("mn_ok"),
        F.max(ok).cast("long").alias("mx_ok"),
    )

    def _q(v, mn, mx):
        # equal-width 16-bit quantization; (mx-mn)*65536 < 2^53 keeps
        # the double division exact-floorable
        return F.floor((v.cast("long") - F.col(mn)) * (1 << _QBITS)
                       / (F.col(mx) - F.col(mn) + 1)).cast("long")

    q_dt = _q(dt, "mn_dt", "mx_dt")
    q_pk = _q(pk, "mn_pk", "mx_pk")
    cell = _interleave_top(F.shiftright(q_dt, _QBITS - n_cell_bits),
                           F.shiftright(q_pk, _QBITS - n_cell_bits),
                           n_cell_bits)
    nat = F.floor((ok.cast("long") - F.col("mn_ok")) * n_files
                  / (F.col("mx_ok") - F.col("mn_ok") + 1)).cast("long")
    labeled = (
        lineitem.join(F.broadcast(bounds))
        .select(q_dt.alias("q_dt"), q_pk.alias("q_pk"),
                F.explode(F.array(
                    F.struct(F.lit("natural").alias("layout"),
                             nat.cast("int").alias("file_id")),
                    F.struct(F.lit("zorder").alias("layout"),
                             cell.cast("int").alias("file_id")),
                )).alias("f"))
        .select(F.col("f.layout").alias("layout"),
                F.col("f.file_id").alias("file_id"), "q_dt", "q_pk")
    )
    return (
        labeled.groupBy("layout", "file_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.min("q_dt").alias("dt_min"), F.max("q_dt").alias("dt_max"),
             F.min("q_pk").alias("pk_min"), F.max("q_pk").alias("pk_max"))
        .select("layout", "file_id", "n_rows", "dt_min", "dt_max",
                "pk_min", "pk_max",
                (F.col("dt_max") - F.col("dt_min") + 1).cast("bigint")
                 .alias("dt_span"),
                (F.col("pk_max") - F.col("pk_min") + 1).cast("bigint")
                 .alias("pk_span"))
        .orderBy("layout", "file_id")
    )


def compaction_plan(df: DataFrame, target_rows_per_file: int = 1_000_000
                    ) -> DataFrame:
    """Small-files compaction advisor — the sizing half of the layout
    family (zorder_layout_plan is the clustering half): assign every
    underlying file of a parquet-backed DataFrame to a merge group by
    CUMULATIVE-offset bin packing (group = cum_rows_before div
    target), the same rule Delta/Iceberg OPTIMIZE bin-packing uses on
    bytes. The output is the rewrite manifest: which files coalesce
    into which target file, and how far each group lands from the
    target (a group can exceed target only by part of one straddling
    file).

    Scale shape: input_file_name() resolves at the scan, the plan
    carries (file, count) at FILE grain — O(files) rows through one
    groupBy and one ordered window over file names (metadata-sized:
    even 100 TB is ~1e5 files). Deterministic: files order by name,
    no timestamps, no rand.

    Non-query component: DuckDB's pre-registered views cannot see
    file boundaries, so this is tested against fabricated multi-file
    dirs rather than oracled (same class as input_files_profile)."""
    per = (
        df.select(F.element_at(
            F.split(F.input_file_name(), "/"), -1).alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    from pyspark.sql import Window
    w = (Window.orderBy("file_name")
         .rowsBetween(Window.unboundedPreceding, -1))
    assigned = (
        per.withColumn("cum_before",
                       F.coalesce(F.sum("n_rows").over(w), F.lit(0)))
        .withColumn("group_id",
                    F.floor(F.col("cum_before") / target_rows_per_file)
                     .cast("int"))
    )
    wg = Window.partitionBy("group_id")
    return (
        assigned
        .select("file_name", "n_rows", "group_id",
                F.count(F.lit(1)).over(wg).cast("bigint")
                 .alias("group_n_files"),
                F.sum("n_rows").over(wg).cast("bigint")
                 .alias("group_rows"))
        .withColumn("target_rows", F.lit(target_rows_per_file)
                     .cast("bigint"))
        .orderBy("group_id", "file_name")
    )


def range_partition_plan(lineitem: DataFrame, n_partitions: int = 32,
                         n_buckets: int = 1024) -> DataFrame:
    """Range-shuffle balance audit — the partitioning third of the
    layout family (zorder = clustering, compaction = sizing, this =
    shuffle planning): plan repartitionByRange boundaries for
    l_orderkey from a ``n_buckets`` equal-width histogram instead of
    Spark's nondeterministic reservoir sample, and report the row
    balance those boundaries would achieve. Each histogram bucket is
    assigned the planned partition floor(cum_before·N/total) — whole
    buckets never split, so bucket width is the planning fidelity —
    and the report rolls the cell grid up to per-partition rows,
    share, and signed deviation from the perfect 1/N split. A skewed
    or clustered key shows up as partitions far off dev 0 BEFORE the
    100 TB sort launches.

    Determinism: bucket assignment, cumulative counts, and the
    partition rule are pure integer arithmetic over the broadcast
    1-row bounds; re-runs are byte-identical (unlike sampling).

    Scale shape: one corpus pass collapses to ≤ n_buckets cells (the
    same fixed state the quantile audit keeps), then windows and
    aggregates run on the cell grid only."""
    key = F.col("l_orderkey")
    bounds = lineitem.agg(
        F.min(key).cast("long").alias("mn"),
        F.max(key).cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"))
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(n_buckets - 1),
                F.floor((key.cast("long") - F.col("mn")) * n_buckets
                        / (F.col("mx") - F.col("mn") + 1)))).cast("int")
    hist = (
        lineitem.join(F.broadcast(bounds), how="inner")
        .select(bucket.alias("b"), "n")
        .groupBy("b", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    from pyspark.sql import Window
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    assigned = (
        hist.withColumn("cum_before",
                        F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .withColumn("partition_id",
                    F.floor(F.col("cum_before") * n_partitions
                            / F.col("n")).cast("int"))
    )
    return (
        assigned.groupBy("partition_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
             F.sum("cnt").cast("bigint").alias("n_rows"),
             F.max("n").alias("__n"))
        .select(
            "partition_id", "n_buckets", "n_rows",
            F.floor(F.col("n_rows") * 1_000_000 / F.col("__n"))
             .cast("bigint").alias("share_e6"),
            (F.floor(F.col("n_rows") * 1_000_000 / F.col("__n"))
             - F.floor(F.lit(1_000_000) / F.lit(n_partitions)))
             .cast("bigint").alias("dev_from_even_e6"))
        .orderBy("partition_id")
    )
