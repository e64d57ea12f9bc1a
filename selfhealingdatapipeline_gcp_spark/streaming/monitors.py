"""Structured Streaming forms of the monitoring detectors.

The reference's detectors poll BigQuery on a schedule; the streaming-
native form is a continuous windowed aggregation over the event feed.
Here the same parquet events drive a real ``readStream`` →
``writeStream`` pipeline with an ``availableNow`` trigger, so the
batch-equivalent result is produced synchronously and is oracle-
checkable; on a live feed you'd swap the source for Kafka and keep
the plan.
"""

from __future__ import annotations

import hashlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_sink_counter = itertools.count()


def _fresh_sink_dir(prefix: str) -> str:
    """A sink directory unique per RUN: mkdtemp under the shared
    stream-scratch root. The per-process _sink_counter alone is NOT
    unique across processes — two concurrent runs (or a stale dead
    one) would share lsh_ingest_0 and the epoch-dir union would read
    foreign epochs (found by the r7 sf10 sweep)."""
    import tempfile
    root = "/tmp/shdp_stream"
    os.makedirs(root, exist_ok=True)
    return tempfile.mkdtemp(prefix=f"{prefix}_", dir=root)


def _staged_dir(path: str) -> str:
    """Spark's file-stream source monitors a DIRECTORY; the test data
    is a single parquet file. Stage a symlink under scratch space —
    on a real deployment the source is already a directory/bucket
    prefix (or Kafka) and this is a no-op.

    Directory-shaped parquet (a Spark-written table) must stage its
    DATA FILES, not the directory: the file source does not descend
    into a symlinked subdirectory, so a directory symlink silently
    yields zero micro-batches (caught by the sf1-replica probe, where
    streaming_lsh_ingest returned empty on a directory source)."""
    d = f"/tmp/shdp_stream/{hashlib.md5(('v2|' + path).encode()).hexdigest()[:12]}"
    os.makedirs(d, exist_ok=True)
    if os.path.isdir(path):
        for f in os.listdir(path):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                link = os.path.join(d, f)
                if not os.path.exists(link):
                    os.symlink(os.path.join(path, f), link)
    else:
        link = os.path.join(d, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
    return d


def _events_stream(spark: SparkSession, sf_dir: str,
                   max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet; nanos ts normalized
    exactly like catalog.load. ``max_files_per_trigger`` forces
    per-file micro-batches (chop-invariance tests)."""
    path = f"{sf_dir}/events.parquet"
    # defensive conf (see catalog.load): callers may pass an untuned
    # session; events.parquet is TIMESTAMP(NANOS)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # Normalize NTZ to the session-tz TIMESTAMP type for consistency
        # with the bigint branch and catalog.load (Spark >= 3.4 accepts
        # NTZ event time; the cast is value-preserving under pinned UTC).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(agg: DataFrame, mode: str) -> DataFrame:
    name = f"shdp_stream_sink_{next(_sink_counter)}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return agg.sparkSession.table(name)


def streaming_txn_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event volume per type as a streaming windowed count
    (streaming form of transaction_detector). Complete-mode memory
    sink: every window emits, matching the batch equivalent."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        "event_type", "n_events")


def streaming_txn_volume_kafka(spark: SparkSession,
                               bootstrap_servers: str, topic: str,
                               starting_offsets: str = "earliest",
                               **kafka_options: str) -> DataFrame:
    """streaming_txn_volume fed from a REAL Kafka topic instead of
    the file-staged replay: JSON event records on the topic's value
    are parsed to the events schema, then the identical hourly
    windowed count runs. Requires the spark-sql-kafka connector
    (session.get_spark adds it under SPARK_GRAFT_KAFKA_PACKAGE;
    sources.read_stream_kafka translates the missing-jar failure to
    a clear setup error). availableNow over earliest offsets makes
    the call a bounded, checkable drain — swap the trigger for a
    processing-time one on a live deployment."""
    from pyspark.sql import types as T

    from selfhealingdatapipeline_gcp_spark.sources import readers

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    raw = readers.read_stream_kafka(
        spark, bootstrap_servers, topic,
        starting_offsets=starting_offsets, **kafka_options)
    events = (
        raw.select(F.from_json(F.col("value").cast("string"),
                               schema).alias("e"))
        .select("e.*")
    )
    agg = (
        events
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("window_start"),
        "event_type", "n_events")


def streaming_sessionize(spark: SparkSession, sf_dir: str,
                         gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (session_window = built-in stateful
    sessionization; events < gap apart merge). Runs the same plan the
    streaming engine executes with state-store sessions."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select("user_id", "session_start", "session_end", "n_events")


def streaming_stateful_volume_monitor(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per feed, keep running batch-volume statistics in managed state
    and flag batches whose volume doubles the running average.

    This is the arbitrary-state form the reference's detectors would
    take on a live feed — state survives across micro-batches in the
    state store; with availableNow the whole file set is one batch,
    which keeps the output deterministic for the rows-only check.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir)
    out_schema = ("event_type string, batch_count bigint, "
                  "prior_batches bigint, prior_avg double, "
                  "is_anomaly boolean")
    state_schema = "n bigint, total bigint"

    def track(key, pdfs, state: GroupState):
        cnt = 0
        for pdf in pdfs:
            cnt += len(pdf)
        n, total = state.get if state.exists else (0, 0)
        prior_avg = (total / n) if n else 0.0
        state.update((n + 1, total + cnt))
        yield pd.DataFrame([{
            "event_type": key[0],
            "batch_count": cnt,
            "prior_batches": n,
            "prior_avg": round(prior_avg, 4),
            "is_anomaly": bool(n > 0 and cnt > 2 * prior_avg),
        }])

    agg = (
        stream
        .groupBy("event_type")
        .applyInPandasWithState(track, out_schema, state_schema,
                                "update", GroupStateTimeout.NoTimeout)
    )
    return _run_to_memory(agg, "update")


def streaming_spend_watch(spark: SparkSession, sf_dir: str,
                          threshold: float = 1_000.0) -> DataFrame:
    """Per-user cumulative purchase tracking on the V2 arbitrary-state
    API (``transformWithStateInPandas``, Spark 4): a ValueState holds
    each user's running integer-cents total; the FIRST micro-batch
    that lifts a user across ``threshold`` emits one alert row. The
    v1 sibling (streaming_stateful_volume_monitor,
    applyInPandasWithState) keeps tuple state; this is the typed-state
    form with the same state-store scaling contract (state keyed by
    user, O(1) per key) plus access to timers/list/map state for
    richer monitors.

    Deterministic for the rows-only check: cents accumulate as exact
    integers and the crossing batch is a pure function of event-time
    order under availableNow.

    Environment gate: the V2 state protocol speaks protobuf between
    the JVM and the Python driver worker — absent protobuf this
    raises with setup instructions (same seam discipline as the
    connector stubs); the v1 applyInPandasWithState monitors carry
    the arbitrary-state surface everywhere else."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package "
            "(pip install protobuf) — the V2 state protocol runs over "
            "it; use streaming_stateful_volume_monitor "
            "(applyInPandasWithState) where protobuf is unavailable"
        ) from e
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    threshold_c = int(round(threshold * 100))

    class SpendWatch(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total_c", "total bigint")

        def handleInputRows(self, key, rows, timerValues):
            add_c = 0
            for pdf in rows:
                add_c += int(round(float(pdf["value"].sum()) * 100))
            before = (self._total.get()[0]
                      if self._total.exists() else 0)
            after = before + add_c
            self._total.update((after,))
            if before < threshold_c <= after:
                yield pd.DataFrame([{
                    "user_id": int(key[0]),
                    "total_spend": after / 100.0,
                    "batch_spend": add_c / 100.0,
                }])

        def close(self) -> None:
            pass

    stream = (_events_stream(spark, sf_dir)
              .filter(F.col("event_type") == "purchase")
              .select("user_id", "value"))
    out = (
        stream.groupBy("user_id")
        .transformWithStateInPandas(
            SpendWatch(),
            "user_id bigint, total_spend double, batch_spend double",
            outputMode="append", timeMode="none")
    )
    return _run_to_memory(out, "append").orderBy("user_id")


def streaming_dedup(spark: SparkSession, sf_dir: str,
                    bounded_state: bool = True) -> DataFrame:
    """Streaming exact dedup on the natural key with state-store
    backing: duplicated/replayed events are emitted once. Output is
    the per-type unique count — deterministic regardless of which
    physical row the state keeps.

    DEFAULT is the watermark-bounded form (VERDICT r2 #7):
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` expires
    dedup state once rows age past the lateness horizon — on an
    unbounded feed the plain ``dropDuplicates`` state store grows
    forever and eventually OOMs the cluster. The unbounded escape
    (``bounded_state=False``) remains for replaying bounded archives
    where duplicates can be arbitrarily far apart. With availableNow
    the file set is one micro-batch (state never expires mid-batch),
    so both forms are oracle-exact here."""
    stream = _events_stream(spark, sf_dir)
    if bounded_state:
        deduped = (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id", "event_type", "value"])
        )
    else:
        deduped = stream.dropDuplicates(["user_id", "event_type", "value"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique"))
    return _run_to_memory(agg, "complete")


def streaming_feed_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form of the freshness detector: running max(ts) +
    arrival count per feed, updated every micro-batch — the state the
    reference polls BigQuery for, maintained incrementally instead."""
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy(F.col("event_type").alias("source")).agg(
        F.max("ts").alias("last_update"),
        F.count(F.lit(1)).alias("n_arrivals"),
    )
    return _run_to_memory(agg, "complete")


def streaming_click_attribution(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases joined to the same
    user's clicks in the trailing hour — the canonical streaming
    attribution shape. Both sides carry watermarks so the state store
    can expire buffered rows once the interval condition can no
    longer match (without the time bound the join state grows
    forever). Append mode: each matched pair emits exactly once."""
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("user_id", "p_ts", "c_ts")
    return _run_to_memory(joined, "append")


def streaming_static_enrichment(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a STATIC
    per-type baseline relation (historical average value), flagging
    events that exceed 2× their type's baseline. The static side is
    computed once from batch data and broadcast into every
    micro-batch — stateless, no watermark needed, the standard
    dim-enrichment shape for streams. Output is an aggregate per
    type (complete mode) so the result is deterministic and tiny."""
    # exact integer-cents baseline per type from the batch view
    from selfhealingdatapipeline_gcp_spark.functions import money
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    static_baseline = (
        batch.groupBy(F.col("event_type").alias("bt"))
        .agg((F.sum(money.cents(F.col("value")))
              / (100.0 * F.count(F.lit(1)))).alias("avg_value"))
    )
    stream = _events_stream(spark, sf_dir)
    enriched = stream.join(
        F.broadcast(static_baseline),
        stream["event_type"] == static_baseline["bt"])
    agg = (
        enriched
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") > 2 * F.col("avg_value")).cast("bigint"))
             .alias("n_above_2x"),
        )
    )
    return _run_to_memory(agg, "complete")


def streaming_to_parquet_sink(spark: SparkSession, sf_dir: str,
                              output_path: str) -> int:
    """Streaming → parquet via foreachBatch with epoch-keyed
    idempotent writes (the exactly-once sink pattern: each micro-batch
    lands in its own epoch directory with overwrite, so replays after
    failure rewrite the same epoch instead of duplicating it).
    Returns the number of epochs written."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "n_events")
    )
    epochs = []

    def write_epoch(batch_df, epoch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(f"{output_path}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (agg.writeStream.outputMode("complete")
         .foreachBatch(write_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return len(epochs)


def streaming_alert_delivery(spark: SparkSession, sf_dir: str,
                             alert_dir: str,
                             threshold: int = 100) -> dict:
    """Streaming detector → alert routing → file delivery, end to end
    (the streaming form of the reference's detect→alert loop:
    monitoring detectors feeding alert_manager.py's severity routing
    and senders). Hourly event volumes stream in; each micro-batch's
    over-threshold windows become alert rows (severity from how far
    past the threshold the hour ran) and are delivered through
    FileAlertSender inside foreachBatch — per-channel jsonl files, so
    a replayed epoch appends the same alerts deterministically and
    downstream dedup (dedup_against_history) can suppress them.

    Returns {"n_epochs", "n_delivered"}."""
    from selfhealingdatapipeline_gcp_spark.plans import alerts as alerts_mod

    stream = _events_stream(spark, sf_dir)
    agg = (
        stream
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "n_events")
    )
    sender = alerts_mod.FileAlertSender(alert_dir)
    counts = {"n_epochs": 0, "n_delivered": 0}

    def deliver_epoch(batch_df, epoch_id: int) -> None:
        fired = (
            batch_df.filter(F.col("n_events") > threshold)
            .select(
                F.lit("streaming_txn_volume").alias("detector"),
                F.concat_ws(
                    "|", F.col("window_start").cast("string"),
                    F.col("event_type")).alias("alert_key"),
                # severity ladder on overshoot ratio, mirroring
                # severity_from_deviation's 10/20/30 rungs
                (F.when(F.col("n_events") > 3 * threshold, "CRITICAL")
                  .when(F.col("n_events") > 2 * threshold, "HIGH")
                  .otherwise("MEDIUM")).alias("severity"),
                F.to_json(F.struct("window_start", "event_type",
                                   "n_events")).alias("detail"),
            )
        )
        counts["n_delivered"] += sender.deliver(fired)
        counts["n_epochs"] += 1

    q = (agg.writeStream.outputMode("complete")
         .foreachBatch(deliver_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return counts


def streaming_live_alert_loop(spark: SparkSession, alert_dir: str,
                              rows_per_second: int = 500,
                              threshold: int = 100,
                              run_seconds: float = 15.0) -> dict:
    """The detect→alert loop on a GENUINELY unbounded source: the
    built-in rate stream plays the feed (availableNow file stages — a
    bounded replay — are what every other streaming op here uses;
    this one runs with a processing-time trigger and is STOPPED
    mid-flight, which is the actual production shape: the query never
    ends, monitoring is continuous, shutdown is external).

    Per-second tumbling volumes; over-threshold windows become alert
    rows delivered through FileAlertSender inside foreachBatch — the
    identical severity ladder and sink as the bounded
    streaming_alert_delivery, so swapping the rate source for a Kafka
    feed (sources.read_stream_kafka) changes one line.

    Returns {"n_epochs", "n_delivered", "stopped_clean"}."""
    import time as _time

    from selfhealingdatapipeline_gcp_spark.plans import alerts as alerts_mod

    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", str(rows_per_second))
              .option("numPartitions", "2").load())
    agg = (
        stream.withWatermark("timestamp", "5 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )
    sender = alerts_mod.FileAlertSender(alert_dir)
    counts = {"n_epochs": 0, "n_delivered": 0}

    def deliver_epoch(batch_df, epoch_id: int) -> None:
        fired = (
            batch_df.filter(F.col("n_events") > threshold)
            .select(
                F.lit("streaming_rate_volume").alias("detector"),
                F.col("window_start").cast("string").alias("alert_key"),
                (F.when(F.col("n_events") > 3 * threshold, "CRITICAL")
                  .when(F.col("n_events") > 2 * threshold, "HIGH")
                  .otherwise("MEDIUM")).alias("severity"),
                F.to_json(F.struct("window_start", "n_events"))
                 .alias("detail"),
            )
        )
        counts["n_delivered"] += sender.deliver(fired)
        counts["n_epochs"] += 1

    q = (agg.writeStream.outputMode("update")
         .foreachBatch(deliver_epoch)
         .trigger(processingTime="2 seconds").start())
    deadline = _time.time() + run_seconds
    # stop as soon as something was delivered (bounded test time), or
    # at the deadline
    while _time.time() < deadline and counts["n_delivered"] == 0:
        _time.sleep(0.5)
    q.stop()
    return {**counts, "stopped_clean": not q.isActive}


def streaming_lsh_ingest(spark: SparkSession, sf_dir: str,
                         max_files_per_trigger: int | None = None
                         ) -> DataFrame:
    """Streaming-ingest near-dup check — the streaming form of
    dedup_incremental: each arriving micro-batch of documents is
    LSH-checked against the STATIC existing corpus, the shape a
    continuously-fed training-data pipeline actually runs (nobody
    re-dedups 100 TB per batch; each batch probes the corpus's band
    buckets).

    foreachBatch runs the batch-exact ``dedup_incremental`` per
    epoch and lands each epoch's candidate pairs in an epoch-keyed
    parquet dir (the idempotent exactly-once sink pattern of
    streaming_to_parquet_sink — a replayed epoch overwrites itself).
    The union of per-epoch outputs equals the whole-batch result
    because a new doc's collision set depends only on (doc, corpus),
    never on its micro-batch peers — which is what makes the result
    oracle-checkable regardless of how the stream was chopped. At
    steady state the corpus bucket relation is persisted per corpus
    version (see dedup_incremental's docstring); here it rebuilds
    per run."""
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators.dedup import (
        dedup_incremental)

    corpus = catalog.load(spark, sf_dir, "documents").filter(
        "doc_id % 20 != 0")
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # force multi-epoch runs (chop-invariance tests chop on file
        # boundaries; production availableNow batches however it likes)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(_staged_dir(path))
        .filter("doc_id % 20 = 0")
    )
    # unique per RUN, not per process: the old per-process counter
    # reused lsh_ingest_0 across processes, so a concurrent or stale
    # run's epoch=N dirs leaked into the final read (caught by the
    # sf10 sweep: 2 extra pairs from another SF's leftover epochs)
    out_dir = _fresh_sink_dir("lsh_ingest")
    epochs = []

    def check_epoch(batch_df, epoch_id: int) -> None:
        (dedup_incremental(batch_df, corpus)
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(check_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        # an empty source yields zero micro-batches (nothing ever
        # creates out_dir) — totality on empty catalogs demands a
        # well-typed empty result, not a missing-path error
        return spark.createDataFrame(
            [], "new_doc_id bigint, corpus_doc_id bigint")
    return (
        spark.read.parquet(out_dir)
        .select("new_doc_id", "corpus_doc_id")
        .orderBy("new_doc_id", "corpus_doc_id")
    )


def streaming_cdc_apply(spark: SparkSession, sf_dir: str,
                        max_files_per_trigger: int | None = None
                        ) -> DataFrame:
    """Streaming CDC apply: the event feed streams in as change
    records and each micro-batch MERGEs into a running snapshot —
    the standard CDC-ingestion workload (Debezium/stream → table),
    composed from this repo's primitives inside foreachBatch.

    The merge keeps the latest row per user_id by (ts, event_id) —
    EVENT-time ordering, not arrival order — which is what makes the
    result chop-invariant: however the stream is chopped into
    micro-batches, the final snapshot equals the batch
    cdc_latest_snapshot over all records (tested with forced
    multi-epoch runs). Each epoch writes a fresh snapshot directory
    and flips a pointer (alternating-dir pattern — a parquet source
    cannot overwrite itself mid-read); a replayed epoch rewrites the
    same directory, so the sink stays exactly-once. On Delta/Iceberg
    this whole function is MERGE INTO with the same ordering rule."""
    from pyspark.sql import Window

    stream = _events_stream(spark, sf_dir, max_files_per_trigger)
    base = _fresh_sink_dir("cdc_apply")  # unique per run (see above)
    state = {"dir": None}
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))

    def apply_epoch(batch_df, epoch_id: int) -> None:
        combined = batch_df
        if state["dir"] is not None:
            combined = batch_df.unionByName(
                batch_df.sparkSession.read.parquet(state["dir"]))
        snap = (
            combined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
        out = f"{base}/epoch={epoch_id}"
        snap.write.mode("overwrite").parquet(out)
        state["dir"] = out

    q = (stream.writeStream.foreachBatch(apply_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if state["dir"] is None:
        schema = ("event_id bigint, ts timestamp, user_id bigint, "
                  "event_type string, value double, props string")
        return spark.createDataFrame([], schema)
    return (
        spark.read.parquet(state["dir"])
        .select("event_id", "ts", "user_id", "event_type", "value",
                "props")
        .orderBy("user_id")
    )


def streaming_contamination_guard(spark: SparkSession, sf_dir: str,
                                  max_files_per_trigger: int | None = None
                                  ) -> DataFrame:
    """Streaming ADMISSION guard: each arriving micro-batch of
    candidate training documents is contamination-scored against the
    STATIC eval/benchmark shingle set before anything enters the
    corpus — the live-feed form of contamination_check (which audits
    a corpus after the fact; this is the gate a continuously-fed
    pipeline runs at the door).

    foreachBatch reuses the batch-exact ``contamination_check`` with
    the roles swapped (train side = the eval suite's shingles, eval
    side = the arriving batch) and lands each epoch's per-doc scores
    in an epoch-keyed parquet dir (the idempotent exactly-once sink
    pattern — a replayed epoch overwrites itself). The epoch union
    equals the whole-batch result because a doc's contamination
    depends only on (doc, eval set), never on its micro-batch peers —
    chop-invariant, hence oracle-checkable.

    Scale: the eval relation is the small side (a benchmark suite)
    and its DISTINCT 48-bit shingle-hash set broadcasts in practice;
    per epoch the work is one equi-join on the 8-byte key bounded by
    the batch's shingle count."""
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators.dataprep import (
        contamination_check)

    eval_docs = catalog.load(spark, sf_dir, "documents").filter(
        "doc_id % 10 = 0")
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(_staged_dir(path))
              .filter("doc_id % 10 != 0"))
    out_dir = _fresh_sink_dir("contamination_guard")
    epochs = []

    def score_epoch(batch_df, epoch_id: int) -> None:
        (contamination_check(eval_docs, batch_df)
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(score_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "doc_id bigint, n_shingles bigint, n_contaminated "
                "bigint, contamination_rate double, "
                "is_contaminated boolean")
    return (
        spark.read.parquet(out_dir)
        .select("doc_id", "n_shingles", "n_contaminated",
                "contamination_rate", "is_contaminated")
        .orderBy("doc_id")
    )


def streaming_churn_guard(spark: SparkSession, sf_dir: str,
                          max_files_per_trigger: int | None = None
                          ) -> DataFrame:
    """Streaming ADMISSION form of cdc_churn_report: per-key change
    counts accumulate per micro-batch and the versions-per-key
    histogram is re-derived over the running totals — the hot-key
    monitor a live CDC ingest runs to decide salting/compaction
    BEFORE a skewed MERGE lands, not after.

    Chop-invariance is by ASSOCIATIVITY, not recomputation: a key's
    version count is a plain count, so per-epoch counts land in an
    epoch-keyed parquet dir (the idempotent exactly-once sink
    pattern) and SUM to exactly the whole-log counts regardless of
    how the stream chops — the final report equals batch
    cdc_churn_report row for row, hence the shared SQL oracle.

    Scale: each epoch shuffles only (key, count) partials; the
    cross-epoch re-aggregate reads count relations bounded by
    |distinct keys|, never the payload log."""
    from selfhealingdatapipeline_gcp_spark.operators import cdc

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(_staged_dir(path))
              .filter(F.col("event_type") == "purchase"))
    out_dir = _fresh_sink_dir("churn_guard")
    epochs = []

    def count_epoch(batch_df, epoch_id: int) -> None:
        (batch_df.groupBy("user_id")
         .agg(F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(count_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "n_versions bigint, n_keys bigint, n_changes bigint, "
                "keys_share_e6 bigint, changes_share_e6 bigint")
    per_key = (spark.read.parquet(out_dir)
               .groupBy("user_id")
               .agg(F.sum("n").alias("n_versions")))
    return cdc.churn_from_version_counts(per_key)


def streaming_heavy_hitters(spark: SparkSession, sf_dir: str,
                            max_files_per_trigger: int | None = None
                            ) -> DataFrame:
    """Streaming ADMISSION form of token_heavy_hitters: per-epoch
    token-count partials accumulate through the idempotent epoch-dir
    sink, and the Count-Min audit re-derives over the running totals
    — the token-drift monitor a live ingest runs while admitting
    documents, deciding from a fixed-size sketch whether the incoming
    mix is flooding a token before the batch pipeline would see it.

    Chop-invariance is by ASSOCIATIVITY, not recomputation: token
    counts are plain sums, and the CMS cell counts are sums of token
    counts — so summed per-epoch partials feed the SAME factored
    core (textanalysis.heavy_hitters_from_counts) and the report
    equals the batch operator row for row regardless of how the
    stream chops; hence the shared SQL oracle.

    Scale: each epoch shuffles its own (token, count) vocabulary
    partials; the cross-epoch re-aggregate reads count relations
    bounded by |vocabulary|, never re-reading documents. A
    production deployment that only needs the sketch keeps the
    ≤ depth·width cell partials per epoch instead — the exact side
    exists because the AUDIT (estimate vs exact) is the operator's
    point."""
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    from selfhealingdatapipeline_gcp_spark.operators import textanalysis

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("heavy_hitters")
    epochs = []

    def count_epoch(batch_df, epoch_id: int) -> None:
        (batch_df
         .select(F.explode(textfn.tokens("text")).alias("w"))
         .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(count_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "rank int, token string, exact_count bigint, "
                "cms_estimate bigint, overestimate bigint")
    counts = (spark.read.parquet(out_dir)
              .groupBy("w").agg(F.sum("n").alias("exact_count")))
    return textanalysis.heavy_hitters_from_counts(counts)


def streaming_bloom_guard(spark: SparkSession, sf_dir: str,
                          max_files_per_trigger: int | None = None
                          ) -> DataFrame:
    """Streaming ADMISSION form of dedup_bloom_audit: the Bloom bit
    set and the reference hash set accumulate per micro-batch through
    the idempotent epoch-dir sink, and the membership audit re-derives
    over the running union — the ingest-time structure the batch
    operator sizes, exercised AS an ingest: each arriving epoch
    contributes its reference-half positions, and the final pass
    measures what the accumulated filter would answer for the
    query half.

    Chop-invariance is by ASSOCIATIVITY: a bit set is a UNION of
    per-epoch distinct-position sets and the reference hash set is a
    union of per-epoch hash sets, so however the stream chops, the
    accumulated state equals the batch build bit for bit and the
    report row matches dedup_bloom_audit exactly — hence the shared
    SQL oracle.

    Scale: each epoch ships ≤ m_bits distinct positions + its
    digest partials; the cross-epoch re-aggregate reads position/
    digest relations, never documents."""
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    from selfhealingdatapipeline_gcp_spark.operators import dedup

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("bloom_guard")
    epochs = []

    def keyed_epoch(batch_df, epoch_id: int) -> None:
        (batch_df
         .select("doc_id", F.md5("text").alias("h"),
                 (textfn.md5int(F.col("doc_id").cast("string")) % 2 == 0)
                 .alias("is_ref"))
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(keyed_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "n_ref_distinct bigint, n_query_docs bigint, "
                "n_true_dups bigint, n_bloom_hits bigint, "
                "n_false_pos bigint, fp_rate_e6 bigint, "
                "bits_set bigint, fill_e6 bigint")
    keyed = spark.read.parquet(out_dir).select("doc_id", "h", "is_ref")
    return dedup.bloom_audit_from_keyed(keyed)


def streaming_expectations_guard(spark: SparkSession, sf_dir: str,
                                 max_files_per_trigger: int | None = None
                                 ) -> DataFrame:
    """Streaming ADMISSION form of quality_expectations: the rule
    counters accumulate per micro-batch and the expectation report
    re-derives over the running totals — the gate a live feed runs
    WHILE admitting orders, failing the suite before bad data lands
    in the batch table (the reference's quality gate moved to the
    ingest edge).

    Chop-invariance is by ASSOCIATIVITY: four rule counts and the
    row count are plain sums; the uniqueness rule's distinct-key
    count is a distinct over the UNION of per-epoch key sets — so
    however the stream chops, the accumulated counters equal the
    batch aggregate and the report matches quality_expectations row
    for row (shared SQL oracle, via the factored
    quality.expectations_report_from_wide).

    Scale: each epoch ships a 1-row counter relation plus its
    distinct-key partials (key grain — the irreducible state of an
    exact uniqueness rule; swap in approx_count_distinct partials
    when exactness can yield)."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    path = f"{sf_dir}/orders.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("expect_guard")
    epochs = []

    def count_epoch(batch_df, epoch_id: int) -> None:
        (batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_orderkey").isNotNull().cast("bigint"))
             .alias("r1"),
            F.sum((F.col("o_totalprice") > 0).cast("bigint")).alias("r3"),
            F.sum(F.col("o_orderstatus").isin("O", "F", "P")
                  .cast("bigint")).alias("r4"),
            F.sum(F.col("o_orderdate").between("1992-01-01", "2026-12-31")
                  .cast("bigint")).alias("r5"))
         .write.mode("overwrite").parquet(f"{out_dir}/counters/epoch={epoch_id}"))
        (batch_df.select("o_orderkey").distinct()
         .write.mode("overwrite").parquet(f"{out_dir}/keys/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(count_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "rule_id string, rule string, n_rows bigint, "
                "observed_e6 bigint, threshold_e6 bigint, passed boolean")
    counters = (spark.read.parquet(f"{out_dir}/counters")
                .agg(F.sum("n").alias("n"), F.sum("r1").alias("r1"),
                     F.sum("r3").alias("r3"), F.sum("r4").alias("r4"),
                     F.sum("r5").alias("r5")))
    distinct_keys = (spark.read.parquet(f"{out_dir}/keys")
                     .agg(F.countDistinct("o_orderkey").alias("r2")))
    wide = counters.crossJoin(F.broadcast(distinct_keys))
    return quality.expectations_report_from_wide(wide)


def streaming_quantile_guard(spark: SparkSession, sf_dir: str,
                             max_files_per_trigger: int | None = None
                             ) -> DataFrame:
    """Streaming ADMISSION form of quantile_sketch_audit: per-epoch
    (event_type, cent, count) value-count partials accumulate through
    the idempotent epoch-dir sink, and the histogram-vs-exact
    percentile audit re-derives over the running totals — the
    latency/value-distribution monitor a live ingest runs while
    admitting events, measuring from fixed state whether p50/p90/p99
    are moving before the batch percentile job would see it.

    Chop-invariance is by ASSOCIATIVITY: value-counts are plain sums,
    and every downstream relation (bounds, weighted exact percentile,
    ≤1024-bucket histogram) derives from the summed (type, cent,
    count) relation — so however the stream chops, the report equals
    quantile_sketch_audit row for row (shared SQL oracle, via the
    factored quality.quantile_audit_from_counts).

    Scale: each epoch ships distinct-cent partials, never raw events;
    the cross-epoch re-aggregate reads cent relations. A deployment
    needing only the sketch keeps ≤ n_buckets cells per type per
    epoch instead — the exact side exists because the AUDIT is the
    operator's point."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("quantile_guard")
    epochs = []

    def count_epoch(batch_df, epoch_id: int) -> None:
        (batch_df
         .select("event_type",
                 F.round(F.col("value") * 100, 0).cast("bigint")
                  .alias("v_c"))
         .groupBy("event_type", "v_c")
         .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(count_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "event_type string, q int, n bigint, exact_c bigint, "
                "est_c bigint, abs_err_c bigint")
    counts = (spark.read.parquet(out_dir)
              .groupBy("event_type", "v_c")
              .agg(F.sum("cnt").cast("bigint").alias("cnt")))
    return quality.quantile_audit_from_counts(counts)


def streaming_kmv_guard(spark: SparkSession, sf_dir: str,
                        max_files_per_trigger: int | None = None
                        ) -> DataFrame:
    """Streaming ADMISSION form of distinct_kmv_audit: per-epoch
    DISTINCT (event_type, hash) partials accumulate through the
    idempotent epoch-dir sink, and the KMV-vs-exact cardinality audit
    re-derives over the running union — the cardinality monitor a
    live ingest runs while admitting events, asking from O(k) state
    whether the distinct-user count is moving.

    Chop-invariance is by ASSOCIATIVITY: a distinct-hash set is the
    UNION of per-epoch distinct sets, so the accumulated relation
    equals the batch distinct exactly and the report matches
    distinct_kmv_audit row for row (shared SQL oracle, via the
    factored quality.kmv_audit_from_distinct). A deployment needing
    only the sketch keeps the k smallest hashes per type per epoch
    (min-k of unions = min-k of concatenated min-ks); the exact side
    exists because the AUDIT is the operator's point.

    Scale: each epoch ships its distinct (type, hash) partials —
    16-byte-hash grain, never raw events."""
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    from selfhealingdatapipeline_gcp_spark.operators import quality

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("kmv_guard")
    epochs = []

    def distinct_epoch(batch_df, epoch_id: int) -> None:
        (batch_df
         .select("event_type",
                 textfn.md5int(F.col("user_id").cast("string")).alias("h"))
         .distinct()
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(distinct_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "event_type string, exact_distinct bigint, "
                "kmv_estimate bigint, abs_err bigint, err_e6 bigint")
    d = spark.read.parquet(out_dir).select("event_type", "h").distinct()
    return quality.kmv_audit_from_distinct(d)


def streaming_er_guard(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None
                       ) -> DataFrame:
    """Streaming ADMISSION form of er_name_pairs: each arriving
    micro-batch of customer records lands its per-position masked
    keys in the idempotent epoch-dir sink, and the typo-linkage
    report re-derives by block-group-verify over the accumulated key
    store — the duplicate-account watch a live signup/ingest feed
    runs, catching a typo'd re-registration as it arrives instead of
    in the nightly batch.

    Chop-invariance is by CONSTRUCTION, not recomputation: the epoch
    sink lands each record's normalized (id, name) — a per-row map —
    so the union of epoch relations equals the batch record relation
    regardless of how the stream chops, and the downstream
    mask-then-pair (operators/er.py _masked_keys + pairs_from_masked,
    the exact code path the batch operator runs) is a deterministic
    function of that union — the report equals batch er_name_pairs
    row for row, hence the shared SQL oracle.

    Scale: each epoch writes O(batch) normalized key rows (id + name,
    never payloads — optimization r10, guide §2.3 "shuffle/write keys
    instead of payloads": masking is applied AFTER the store read,
    which cuts the epoch sink volume window× (4×) since mask∘union ≡
    union∘mask for a per-row map); the cross-epoch pairing reads the
    key store, blocks stay alphabet-bounded with the batch operator's
    loud cap. A production form would keep the key store as a
    compacted table and pair only NEW keys against it per epoch
    (delta-join); the full re-pair here keeps the audit exact."""
    from selfhealingdatapipeline_gcp_spark.operators import er

    path = f"{sf_dir}/customer.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("er_guard")
    epochs = []

    def land_epoch(batch_df, epoch_id: int) -> None:
        (batch_df.select(F.col("c_custkey").alias("id"),
                         F.lower(F.col("c_name")).alias("name"))
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(land_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "id_a bigint, id_b bigint, name_a string, "
                "name_b string, edit_distance int")
    return er.pairs_from_masked(
        er._masked_keys(spark.read.parquet(out_dir), window=4))


def streaming_pii_guard(spark: SparkSession, sf_dir: str,
                        max_files_per_trigger: int | None = None
                        ) -> DataFrame:
    """Streaming PII ADMISSION guard: every arriving micro-batch of
    candidate documents is PII-scored at the door (card → phone →
    email with pii_redact's sequential-redaction counting, so kinds
    never double-count) and flagged BEFORE anything enters the
    corpus — the live-feed form of pii_density_report's batch audit,
    and the gate that keeps a takedown from ever being needed.

    foreachBatch lands each epoch's per-doc counts in an epoch-keyed
    parquet dir (idempotent exactly-once sink — a replayed epoch
    overwrites itself). A doc's PII score depends only on its own
    text, never on micro-batch peers — chop-invariant, so the epoch
    union equals the batch result and the oracle is plain SQL.

    Scale: per-epoch work is scan-stage regexp counting (codegen, no
    UDF, no shuffle) — the cheapest possible admission gate."""
    from selfhealingdatapipeline_gcp_spark.operators.dataprep import (
        PII_PATTERNS)

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(_staged_dir(path))
    out_dir = _fresh_sink_dir("pii_guard")
    epochs = []

    def score_epoch(batch_df, epoch_id: int) -> None:
        red = F.col("text")
        counts: dict[str, F.Column] = {}
        for kind in ("card", "phone", "email"):
            pat = PII_PATTERNS[kind]
            counts[kind] = (F.size(F.split(red, pat)) - 1)\
                .cast("bigint")
            red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
        scored = batch_df.select(
            "doc_id", "source",
            counts["email"].alias("n_email"),
            counts["phone"].alias("n_phone"),
            counts["card"].alias("n_card"))
        (scored.withColumn(
            "has_pii",
            (F.col("n_email") + F.col("n_phone") + F.col("n_card"))
            > 0)
         .write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}"))
        epochs.append(epoch_id)

    q = (stream.writeStream.foreachBatch(score_epoch)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not epochs:
        return spark.createDataFrame(
            [], "doc_id bigint, source string, n_email bigint, "
                "n_phone bigint, n_card bigint, has_pii boolean")
    return (
        spark.read.parquet(out_dir)
        .select("doc_id", "source", "n_email", "n_phone", "n_card",
                "has_pii")
        .orderBy("doc_id")
    )
