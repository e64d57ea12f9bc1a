"""Table catalog over the driver-generated parquet test data.

Reference parity: scripts/transform_script:11-14 reads one BigQuery
table per job. Here the source layer is a catalog of parquet tables
(the portable, pushdown-friendly format); BigQuery/JDBC connectors
live in sources/readers.py behind import-tries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at any realistic SF.
# (region/nation are constant-size; supplier/part/customer grow with
# SF but stay far below fact tables — broadcast decisions for those
# are left to AQE + autoBroadcastJoinThreshold rather than forced.)
BROADCAST_DIMS = ("region", "nation")

# The fact tables' natural bucketing keys (the orders⋈lineitem join
# family: q3/q5/q10/q12/q18/q21 and every reconciliation detector).
BUCKET_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}

# (sf_dir, table) → managed bucketed table name. Populated by
# use_bucketed_tables; catalog.load routes reads through it so EVERY
# registered query transparently consumes the pre-bucketed layout —
# the 100 TB deployment shape where the facts are bucketed once at
# ingest and every later join on the key is Exchange-free.
_BUCKETED: dict[tuple[str, str], str] = {}


def use_bucketed_tables(spark: SparkSession, sf_dir: str,
                        tables: tuple[str, ...] = ("orders", "lineitem"),
                        n_buckets: int = 32) -> None:
    """Materialize bucketed managed copies of the fact tables ONCE
    (bucketBy + sortBy on the join key) and route every subsequent
    ``catalog.load`` for (sf_dir, table) to them. Idempotent per
    (sf_dir, table); ``clear_bucketed_tables`` restores raw parquet
    reads. The write cost is the amortized ingest-time investment —
    downstream orders⋈lineitem joins run with zero Exchange
    (plan-asserted in tests/test_plan_shapes.py)."""
    import os
    import shutil

    from selfhealingdatapipeline_gcp_spark.sources import writers

    for t in tables:
        key = BUCKET_KEYS[t]
        if (sf_dir, t) in _BUCKETED:
            continue
        safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
        name = f"shdp_bkt_{safe}_{t}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        writers.write_bucketed_table(load(spark, sf_dir, t), name, key,
                                     n_buckets=n_buckets, sort_col=key)
        _BUCKETED[(sf_dir, t)] = name


def clear_bucketed_tables() -> None:
    _BUCKETED.clear()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one catalog table. Parquet scan → column pruning and
    predicate pushdown come free from whatever the caller selects."""
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; catalog has {TABLES}")
    if (sf_dir, table) in _BUCKETED:
        return spark.table(_BUCKETED[(sf_dir, table)])
    # Defensive session conf: the caller's SparkSession (e.g. the
    # driver harness) may not come from session.get_spark. Both are
    # runtime-settable SQL confs; without them events.parquet
    # (TIMESTAMP NANOS) fails to read and date/hour functions shift
    # against the UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # Normalize the event-time column to session-tz TIMESTAMP no matter
    # which vintage of the driver testdata we read:
    #   - TIMESTAMP(NANOS) parquet arrives as long under nanosAsLong;
    #     floor to micros exactly like DuckDB's TIMESTAMP_NS cast.
    #   - TIMESTAMP(MICROS) without a tz annotation is inferred as
    #     TIMESTAMP_NTZ by Spark 4; cast to TIMESTAMP (value-preserving
    #     under the pinned UTC session tz) so downstream unix_micros /
    #     window / watermark call sites see one stable dtype.
    for name, dtype in df.dtypes:
        if name == "ts" and dtype == "bigint":
            df = df.withColumn(name, F.expr(f"timestamp_micros({name} div 1000)"))
        elif name == "ts" and dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
