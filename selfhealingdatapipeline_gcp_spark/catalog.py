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


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one catalog table. Parquet scan → column pruning and
    predicate pushdown come free from whatever the caller selects."""
    if table not in TABLES:
        raise KeyError(f"unknown table {table!r}; catalog has {TABLES}")
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
