"""Sink connectors (reference: scripts/transform_script:17-24 writes
BigQuery with overwrite + schema-relax options).

Parquet writes support date/column partitioning (partition pruning
for every downstream reader) and explicit file sizing — at 100 TB the
difference between 1e6 tiny files and right-sized files is the whole
game for the next job's scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: tuple[str, ...] = (),
                  target_partitions: int | None = None) -> None:
    """Partitioned parquet write. ``target_partitions`` controls file
    count via repartition on the partition keys (hash-clusters rows so
    each output dir gets few, large files)."""
    out = df
    if target_partitions is not None:
        out = (df.repartition(target_partitions, *partition_by)
               if partition_by else df.repartition(target_partitions))
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bigquery(df: DataFrame, table: str, mode: str = "overwrite",
                   **options: str) -> None:
    """BigQuery sink mirroring transform_script:17-24 (direct write,
    create-if-needed, schema relaxation). Connector jar required."""
    try:
        writer = (df.write.format("bigquery")
                  .option("writeMethod", "direct")
                  .option("createDisposition", "CREATE_IF_NEEDED")
                  .option("allowFieldAddition", "true")
                  .option("allowFieldRelaxation", "true")
                  .mode(mode))
        for k, v in options.items():
            writer = writer.option(k, v)
        writer.save(table)
    except NotImplementedError:
        raise
    except Exception as e:
        raise NotImplementedError(
            "spark-bigquery-connector not on classpath; on Dataproc use "
            "--jars gs://spark-lib/bigquery/spark-bigquery-latest.jar") from e


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "overwrite",
               num_partitions: int | None = 8,
               **options: str) -> None:
    """JDBC sink. Every write partition opens its own database
    connection, so ``num_partitions`` caps the fan-in (32 tasks
    hammering one warehouse endpoint is an outage, not parallelism);
    pass None to keep the DataFrame's own partitioning."""
    out = (df.coalesce(num_partitions)
           if num_partitions is not None else df)
    writer = (out.write.format("jdbc")
              .option("url", url).option("dbtable", table).mode(mode))
    for k, v in options.items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as e:
        if ("No suitable driver" in str(e)
                or "ClassNotFoundException" in str(e)):
            raise NotImplementedError(
                "JDBC driver not on classpath in this environment; "
                "add the driver jar via spark.jars on a real cluster"
            ) from e
        raise


def write_bucketed_table(df: DataFrame, table_name: str, bucket_col: str,
                         n_buckets: int = 32, mode: str = "overwrite",
                         sort_col: str | None = None) -> None:
    """Bucketed managed table (bucketBy + saveAsTable): downstream
    joins/aggregations on the bucket column need NO shuffle — the
    co-location is persisted in the file layout. At 100 TB, bucketing
    the fact tables on their join key once pays for itself on every
    subsequent join."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: tuple[str, ...] = ()) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
