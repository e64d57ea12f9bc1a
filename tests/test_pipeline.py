"""Control-plane tests: healer classification, fix application, and
the self-healing pipeline runner (model: reference
tests/test_pipeline.py, widened to the full rule table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.plans import healer
from selfhealingdatapipeline_gcp_spark.plans.pipeline import Pipeline, Task


@pytest.mark.parametrize("log,expected_type,expected_cause_kw", [
    ("pyspark.errors.AnalysisException: [PARSE_SYNTAX_ERROR] Syntax error "
     "near 'selfhealing..employee_data'", "CODE", "double dot"),
    ("AnalysisException: [UNRESOLVED_COLUMN.WITH_SUGGESTION] A column with "
     "name `revnue` cannot be resolved", "MANUAL", "column"),
    ("AnalysisException: [TABLE_OR_VIEW_NOT_FOUND] The table `x` cannot be "
     "found", "CONFIG", "missing"),
    ("java.lang.OutOfMemoryError: Java heap space", "CONFIG", "memory"),
    ("org.apache.spark.shuffle.FetchFailedException: Failed to connect",
     "RETRY", "transient"),
    ("SparkException: Cannot broadcast the table that is larger than 8GB",
     "CONFIG", "broadcast"),
    ("Caused by: java.nio.file.AccessDeniedException: Permission denied",
     "MANUAL", "permission"),
    ("some totally novel failure mode", "RETRY", "unclassified"),
])
def test_analyze_error_rules(log, expected_type, expected_cause_kw):
    fix = healer.analyze_error(log)
    assert fix.fix_type == expected_type
    assert expected_cause_kw.lower() in fix.root_cause.lower()


def test_apply_code_fix_double_dot():
    # the reference's marquee auto-fix (auto_healer.py:97-102)
    src = 'df = spark.read.table("proj.selfhealing..employee_data")'
    fix = healer.analyze_error("Syntax error near 'selfhealing..employee'")
    fixed = healer.apply_code_fix(src, fix)
    assert "selfhealing.employee_data" in fixed
    assert ".." not in fixed


def test_extract_error_section_traceback():
    log = ("INFO lots of noise\n" * 200
           + "Traceback (most recent call last):\n"
             '  File "job.py", line 3\nKeyError: boom\n'
           + "INFO trailing\n" * 50)
    out = healer.extract_error_section(log)
    assert out.startswith("Traceback (most recent call last):")
    assert "KeyError: boom" in out
    # the extracted section classifies the same as the raw error
    assert healer.analyze_error(out).fix_type == healer.analyze_error(
        "KeyError: boom").fix_type


def test_extract_error_section_head_tail():
    log = "A" * 3000 + "B" * 3000
    out = healer.extract_error_section(log)
    assert out.startswith("=== START ===") and "=== END ===" in out
    assert len(out) < len(log)
    short = "tiny log, no traceback"
    assert healer.extract_error_section(short) == short


def test_fix_script_file_roundtrip(tmp_path):
    # file round-trip parity (auto_healer.py:76-90 fix_local_file):
    # read → patch → write-back only when changed
    script = tmp_path / "job.py"
    script.write_text('df = spark.read.table("proj.selfhealing..t")\n')
    fix = healer.analyze_error("Syntax error near 'selfhealing..t'")
    rec = healer.apply_fix(fix, script_path=str(script))
    assert rec["applied"] is True
    assert ".." not in script.read_text()
    # idempotent second pass: nothing to change, file untouched
    rec2 = healer.apply_fix(fix, script_path=f"file://{script}")
    assert rec2["applied"] is False


def test_fix_script_file_object_store_is_gated(tmp_path):
    fix = healer.analyze_error("Syntax error near 'a..b'")
    with pytest.raises(NotImplementedError):
        healer.fix_script_file("gs://bucket/job.py", fix)


def test_apply_conf_fix_doubles_partitions(spark):
    before = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fix = healer.analyze_error("java.lang.OutOfMemoryError: GC overhead")
    applied = healer.apply_fix(fix, spark=spark)
    after = int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        assert applied["applied"] is True
        assert after == before * 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(before))


def test_pipeline_retries_transient_and_succeeds(spark):
    attempts = {"n": 0}

    def flaky(s, ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("FetchFailed: shuffle fetch failed (injected)")
        return s.range(5).count()

    p = Pipeline("flaky", [Task("t", flaky, max_retries=3)])
    res = p.run(spark)["t"]
    assert res.status == "SUCCESS"
    assert res.attempts == 3
    assert res.result == 5
    assert len(res.fixes) == 2


def test_pipeline_heals_real_ansi_overflow_via_decimal_mode(spark):
    """Chaos test (VERDICT r5 #7): a REAL Spark ANSI overflow — not a
    fabricated message — raised inside a running pipeline task must
    drive the full detect → classify → engine-patch → retry cycle:
    the healer flips money.set_decimal_mode(True) and the identical
    task succeeds on the next attempt with the exact result."""
    from selfhealingdatapipeline_gcp_spark.functions import money
    from selfhealingdatapipeline_gcp_spark.operators import analytics

    # sf30-shaped HHI input: one supplier with $4e9 of flow squares
    # past int64 in the Σd² accumulator
    def hhi_task(s, ctx):
        li = s.createDataFrame([(1, 1.0e9)] * 4,
                               "l_suppkey int, l_extendedprice double")
        supp = s.createDataFrame([(1, 0)],
                                 "s_suppkey int, s_nationkey int")
        nat = s.createDataFrame([(0, "ZERO")],
                                "n_nationkey int, n_name string")
        return analytics.supplier_concentration_hhi(li, supp, nat).collect()

    assert not money.decimal_mode()
    try:
        p = Pipeline("chaos", [Task("hhi", hhi_task, max_retries=2)])
        res = p.run(spark)["hhi"]
        assert res.status == "SUCCESS"
        assert res.attempts == 2          # one genuine failure, one heal
        assert money.decimal_mode()        # the patch actually landed
        assert res.fixes[0]["engine_patch"] == "money_decimal_mode"
        assert "overflow" in res.fixes[0]["root_cause"].lower()
        assert res.result[0].hhi == 1.0    # exact post-heal result
    finally:
        money.set_decimal_mode(False)


def test_pipeline_nonretryable_stops_early(spark):
    calls = {"n": 0}

    def bad(s, ctx):
        calls["n"] += 1
        raise RuntimeError("[TABLE_OR_VIEW_NOT_FOUND] table `nope` not found")

    p = Pipeline("bad", [Task("t", bad, max_retries=5)])
    res = p.run(spark)["t"]
    assert res.status == "FAILED"
    assert calls["n"] == 1  # non-retryable: no wasted attempts


def test_pipeline_skips_downstream_and_passes_context(spark):
    def make(s, ctx):
        return s.range(10)

    def consume(s, ctx):
        return ctx["make"].count()

    def boom(s, ctx):
        raise RuntimeError("Permission denied on bucket")

    p = Pipeline("dag", [
        Task("make", make),
        Task("boom", boom, max_retries=0),
        Task("consume", consume, depends_on=("make",)),
        Task("after_boom", consume, depends_on=("boom",)),
    ])
    res = p.run(spark)
    assert res["make"].status == "SUCCESS"
    assert res["consume"].status == "SUCCESS" and res["consume"].result == 10
    assert res["boom"].status == "FAILED"
    assert res["after_boom"].status == "SKIPPED"


def test_pipeline_quality_gate(spark):
    def produce(s, ctx):
        return s.range(3)

    def gate(df):
        if df.filter(F.col("id") < 0).count() > 0:
            raise ValueError("negative ids")

    p = Pipeline("gated", [Task("t", produce, validate=gate)])
    assert p.run(spark)["t"].status == "SUCCESS"


def test_pipeline_rejects_cycles():
    t1 = Task("a", lambda s, c: 1, depends_on=("b",))
    t2 = Task("b", lambda s, c: 1, depends_on=("a",))
    with pytest.raises(ValueError, match="cycle"):
        Pipeline("cyclic", [t1, t2]).run(None)


def test_alerts_routing(spark):
    from selfhealingdatapipeline_gcp_spark import registry
    from selfhealingdatapipeline_gcp_spark.plans import alerts
    from conftest import SF_ORACLE

    qs = registry.queries()
    outputs = {
        "revenue_anomaly": qs["revenue_anomaly"](spark, SF_ORACLE),
        "freshness_check": qs["freshness_check"](spark, SF_ORACLE),
    }
    out = alerts.collect_alerts(outputs)
    rows = out.collect()
    assert set(out.columns) == {"detector", "alert_key", "severity",
                                "detail", "recommendations"}
    assert all(r.severity in alerts.SEVERITIES for r in rows)
    # dedup key is unique
    keys = [(r.detector, r.alert_key) for r in rows]
    assert len(keys) == len(set(keys))
    # every alert carries its rule's recommended actions (reference
    # alert_manager.py:24 `recommendations` parity)
    by_rule = {r.detector: r.recommendations for r in alerts.DEFAULT_RULES}
    for r in rows:
        assert list(r.recommendations) == list(by_rule[r.detector])
        assert len(r.recommendations) >= 2


def test_run_etl_job_end_to_end(spark, tmp_path):
    from selfhealingdatapipeline_gcp_spark import jobs
    out = jobs.run_etl_job(spark, "/root/testdata/sf0.001",
                           str(tmp_path / "sink"))
    assert out["statuses"] == {
        "transform": "SUCCESS", "sink": "SUCCESS", "monitoring": "SUCCESS"}
    assert out["alerts"] is not None
    back = spark.read.parquet(str(tmp_path / "sink"))
    assert back.count() == 1500


def test_llm_analyzer_hook():
    """The optional LLM hook (reference: Gemini in vertex_ai_handler)
    is consulted only for unclassified errors and is cleanly
    detachable."""
    calls = []

    def fake_llm(log):
        calls.append(log)
        return healer.Fix(fix_type="CONFIG", root_cause="llm-classified",
                          suggested_fix="from hook")

    healer.set_llm_analyzer(fake_llm)
    try:
        # rule engine wins — hook not consulted
        fix = healer.analyze_error("java.lang.OutOfMemoryError")
        assert fix.root_cause != "llm-classified" and not calls
        # unclassified falls through to the hook
        fix = healer.analyze_error("mysterious failure xyz")
        assert fix.root_cause == "llm-classified" and len(calls) == 1
    finally:
        healer.set_llm_analyzer(None)
    assert healer.analyze_error("mysterious failure xyz").fix_type == "RETRY"


def test_alert_routing_and_history_dedup(spark):
    import datetime
    from selfhealingdatapipeline_gcp_spark.plans import alerts

    assert alerts.route_channels("CRITICAL") == ("slack", "email", "log")
    assert alerts.route_channels("HIGH") == ("email", "slack")
    assert alerts.route_channels("MEDIUM") == ("slack",)
    assert alerts.route_channels("LOW") == ("log",)

    now = datetime.datetime(2024, 1, 30, 12, 0, 0)
    cur = spark.createDataFrame(
        [("revenue_anomaly", "2024-01-29", "HIGH", "{}"),
         ("freshness_check", "error", "HIGH", "{}")],
        "detector string, alert_key string, severity string, detail string")
    hist = spark.createDataFrame(
        [("revenue_anomaly", "2024-01-29",
          now - datetime.timedelta(minutes=30)),   # suppressed (< 1h)
         ("freshness_check", "error",
          now - datetime.timedelta(hours=3))],     # expired → resend
        "detector string, alert_key string, sent_ts timestamp")
    out = alerts.dedup_against_history(cur, hist, now)
    assert [r.detector for r in out.collect()] == ["freshness_check"]

    sender = alerts.AlertSender()  # unconfigured → all channels log
    n = sender.deliver(alerts.with_routing(cur).drop("channels"))
    assert n == 2
    assert all(ch == "log" for ch, _ in sender.sent)


def test_run_monitoring_sweep(spark):
    from selfhealingdatapipeline_gcp_spark import jobs
    out = jobs.run_monitoring_sweep(spark, "/root/testdata/sf0.01")
    assert all(v == "SUCCESS" for v in out["statuses"].values())
    assert out["report"]["feed_status"] == 5
    assert out["alerts"]["n_delivered"] >= 1
    # unconfigured sender logs everything
    assert all(ch == "log" for ch, _ in out["alerts"]["audit"])
    # r2 drill-down/context relations ride along in the daily report
    assert out["report"]["revenue_forecast"] == 1
    assert out["report"]["feed_trends"] == 30
    assert out["report"]["reconciliation_hourly_breakdown"] > 0
    assert out["report"]["transaction_breakdown"] == 10


def test_feed_alert_severity_ladder(spark):
    """Mirror of feed_detector.py:182-193 _calculate_severity: the
    missing/total ratio drives severity; rule fires one alert per
    missing feed through the standard pipeline."""
    from selfhealingdatapipeline_gcp_spark.plans import alerts

    def status_df(n_missing, n_total):
        rows = [(f"f{i}", i >= n_total - n_missing) for i in range(n_total)]
        return spark.createDataFrame(rows, "feed_id string, is_missing boolean")

    rule = next(r for r in alerts.DEFAULT_RULES if r.detector == "feed_status")
    for n_missing, n_total, want in [
            (5, 10, "CRITICAL"), (3, 10, "HIGH"), (1, 10, "MEDIUM"),
            (1, 20, "LOW")]:
        out = alerts.alerts_from(
            "feed_status", status_df(n_missing, n_total), rule).collect()
        assert len(out) == n_missing
        assert all(r.severity == want for r in out), (n_missing, n_total, want)
    # nothing missing → no alert rows at all
    assert not alerts.alerts_from(
        "feed_status", status_df(0, 10), rule).collect()


def test_quality_alert_rules_fire(spark):
    """quality_detector.py:225-236: degradation rows become MEDIUM
    alerts, severe (>5 pct point) increases become HIGH."""
    from selfhealingdatapipeline_gcp_spark.plans import alerts

    null_df = spark.createDataFrame(
        [("value", 9.0, 2.0, 7.0, True),    # > 5 → HIGH
         ("props", 3.5, 2.0, 1.5, True),    # <= 5 → MEDIUM
         ("other", 2.0, 2.0, 0.0, False)],  # not degraded → no alert
        "col_name string, today_null_pct double, baseline_null_pct double, "
        "delta_pct double, is_degraded boolean")
    rule = next(r for r in alerts.DEFAULT_RULES
                if r.detector == "quality_null_trend")
    got = {r.alert_key: r.severity
           for r in alerts.alerts_from("quality_null_trend", null_df, rule)
           .collect()}
    assert got == {"value": "HIGH", "props": "MEDIUM"}

    dup_rule = next(r for r in alerts.DEFAULT_RULES
                    if r.detector == "quality_duplicate_trend")
    dup_df = spark.createDataFrame(
        [("2024-01-02", 100, 9, 9.0, 1.0, 8.0, True),
         ("2024-01-03", 100, 2, 2.0, 1.5, 0.5, False)],
        "d string, n_rows bigint, n_dup bigint, dup_pct double, "
        "baseline_dup_pct double, increase_pct double, is_degraded boolean")
    got = {r.alert_key: r.severity
           for r in alerts.alerts_from(
               "quality_duplicate_trend", dup_df, dup_rule).collect()}
    assert got == {"2024-01-02": "HIGH"}


def test_sweep_routes_feed_and_quality_alerts(spark):
    """The sweep's detector outputs must be routable through the
    feed/quality rules end-to-end (r2 gap: those detectors ran in the
    sweep but could never fire an alert)."""
    from selfhealingdatapipeline_gcp_spark import registry
    from selfhealingdatapipeline_gcp_spark.plans import alerts
    from conftest import SF_ORACLE

    covered = {r.detector for r in alerts.DEFAULT_RULES}
    assert {"feed_status", "quality_null_trend",
            "quality_duplicate_trend"} <= covered
    qs = registry.queries()
    outputs = {n: qs[n](spark, SF_ORACLE)
               for n in ("feed_status", "quality_null_trend",
                         "quality_duplicate_trend")}
    out = alerts.collect_alerts(outputs)  # plan builds + executes clean
    assert set(out.columns) == {"detector", "alert_key", "severity",
                                "detail", "recommendations"}
    assert all(r.severity in alerts.SEVERITIES for r in out.collect())


def test_sweep_persists_history_and_suppresses_repeats(spark, tmp_path):
    """E2E round-trip of the persisted monitoring state
    (monitoring/setup_bigquery.sql:45-70): sweep 1 delivers alerts and
    appends them to the monitoring_alerts sink; sweep 2 reads that
    history from disk and suppresses every repeat. Baseline snapshot
    lands in baseline_metrics."""
    from selfhealingdatapipeline_gcp_spark import jobs
    from selfhealingdatapipeline_gcp_spark.plans import history as hist

    root = str(tmp_path / "state")
    out1 = jobs.run_monitoring_sweep(spark, "/root/testdata/sf0.001",
                                     state_root=root)
    assert all(v == "SUCCESS" for v in out1["statuses"].values())
    n1 = out1["alerts"]["n_delivered"]
    assert n1 >= 1
    persisted = hist.read_alert_history(spark, root)
    assert persisted.count() == n1
    assert set(persisted.columns) == {"detector", "alert_key", "sent_ts"}

    out2 = jobs.run_monitoring_sweep(spark, "/root/testdata/sf0.001",
                                     state_root=root)
    assert out2["alerts"]["n_delivered"] == 0          # all suppressed
    assert hist.read_alert_history(spark, root).count() == n1  # no growth

    base = hist.read_baseline_metrics(spark, root)
    rows = base.filter(F.col("metric_name") == "daily_revenue").collect()
    assert len(rows) == 2                              # one snapshot per sweep
    r = rows[0]
    assert r.sample_size > 0 and r.min_value <= r.baseline_value <= r.max_value


def test_run_every_schedules_and_paces(spark):
    """Pipeline.run_every: N runs, injectable sleep between them (the
    reference DAG's cron interval, in-process), run_index/prev_statuses
    in context, stop_when early exit."""
    from selfhealingdatapipeline_gcp_spark.plans.pipeline import (
        Pipeline, Task)

    seen = []
    naps = []

    def tick(s, ctx):
        seen.append((ctx["run_index"], ctx.get("prev_statuses")))
        return ctx["run_index"]

    pipe = Pipeline("sched", [Task("tick", tick)])
    runs = pipe.run_every(spark, interval_s=60.0, max_runs=3,
                          sleep=naps.append)
    assert len(runs) == 3
    assert [r["tick"].result for r in runs] == [0, 1, 2]
    # sleeps BETWEEN runs only (2 gaps for 3 runs), at the interval
    assert naps == [60.0, 60.0]
    assert seen[0] == (0, None)
    assert seen[1] == (1, {"tick": "SUCCESS"})
    # stop_when ends the loop after the matching run
    runs = pipe.run_every(spark, interval_s=0, max_runs=10,
                          stop_when=lambda r: r["tick"].result >= 1)
    assert len(runs) == 2


def test_scheduled_sweeps_suppress_repeats_across_ticks(spark, tmp_path):
    """Three scheduled sweeps over the same (static) data: tick 1
    delivers the firing alerts and persists them; ticks 2-3 read the
    history back and suppress EVERY repeat (VERDICT r7 #4 done-gate:
    dedup_against_history works across scheduled runs)."""
    from selfhealingdatapipeline_gcp_spark import jobs

    naps = []
    outs = jobs.run_scheduled_sweeps(
        spark, "/root/testdata/sf0.001", str(tmp_path / "state"),
        interval_s=3600.0, max_runs=3, sleep=naps.append)
    assert len(outs) == 3
    assert naps == [3600.0, 3600.0]
    assert outs[0]["alerts"]["n_delivered"] >= 1
    assert outs[1]["alerts"]["n_delivered"] == 0
    assert outs[2]["alerts"]["n_delivered"] == 0


def test_read_alert_history_empty_when_absent(spark, tmp_path):
    from selfhealingdatapipeline_gcp_spark.plans import history as hist
    df = hist.read_alert_history(spark, str(tmp_path / "nowhere"))
    assert df.count() == 0
    assert set(df.columns) == {"detector", "alert_key", "sent_ts"}


@pytest.mark.parametrize("log,expected_type,kw", [
    ("java.io.IOException: No space left on device", "CONFIG", "disk"),
    ("com.esotericsoftware.kryo.KryoException: Buffer overflow. Available: 0",
     "CONFIG", "buffer"),
    ("java.lang.RuntimeException: file:/x.parquet is not a Parquet file",
     "CONFIG", "corrupt"),
    ("_pickle.PicklingError: Could not serialize object", "MANUAL",
     "unserializable"),
    ("py4j.protocol.Py4JNetworkError: Answer from Java side is empty",
     "RETRY", "transient"),
    ("org.apache.spark.SparkArithmeticException: [ARITHMETIC_OVERFLOW] "
     "long overflow", "CONFIG", "overflow"),
])
def test_analyze_error_extended_rules(log, expected_type, kw):
    fix = healer.analyze_error(log)
    assert fix.fix_type == expected_type
    assert kw.lower() in (fix.root_cause + fix.suggested_fix).lower()


def test_file_alert_sender_lands_per_severity(spark, tmp_path):
    """E2E file transport (VERDICT r3 #6): routed alerts land in
    per-channel jsonl files according to the severity ladder."""
    from selfhealingdatapipeline_gcp_spark.plans import alerts

    cur = spark.createDataFrame(
        [("revenue_anomaly", "k1", "CRITICAL", "{}"),
         ("pattern_break_region", "k2", "HIGH", "{}"),
         ("feed_status", "k3", "MEDIUM", "{}"),
         ("quality_null_trend", "k4", "LOW", "{}")],
        "detector string, alert_key string, severity string, detail string")
    sender = alerts.FileAlertSender(str(tmp_path / "alerts"))
    n = sender.deliver(cur)
    assert n == 4
    slack = {a["alert_key"] for a in sender.read_back("slack")}
    email = {a["alert_key"] for a in sender.read_back("email")}
    log = {a["alert_key"] for a in sender.read_back("log")}
    # CRITICAL -> slack+email+log, HIGH -> email+slack,
    # MEDIUM -> slack, LOW -> log
    assert slack == {"k1", "k2", "k3"}
    assert email == {"k1", "k2"}
    assert log == {"k1", "k4"}
    # audit trail mirrors the files, with real channel names
    assert ("slack", "revenue_anomaly:k1") in sender.sent


def test_monitoring_sweep_delivers_to_alert_dir(spark, tmp_path):
    from selfhealingdatapipeline_gcp_spark import jobs

    out = jobs.run_monitoring_sweep(
        spark, "/root/testdata/sf0.01", alert_dir=str(tmp_path / "al"))
    assert all(v == "SUCCESS" for v in out["statuses"].values())
    assert out["alerts"]["n_delivered"] >= 1
    import json, os
    files = os.listdir(tmp_path / "al")
    assert files, "no alert channel files written"
    rows = []
    for fn in files:
        with open(tmp_path / "al" / fn, encoding="utf-8") as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) >= out["alerts"]["n_delivered"]
    assert {"detector", "alert_key", "severity", "detail",
            "recommendations"} <= set(rows[0])
    # the delivered payload carries the rule's recommended actions
    # (reference alert_manager.py:24 — every channel format includes
    # the recommendations list); every DEFAULT_RULES detector has one
    from selfhealingdatapipeline_gcp_spark.plans import alerts
    by_rule = {r.detector: list(r.recommendations)
               for r in alerts.DEFAULT_RULES}
    for r in rows:
        assert r["recommendations"] == by_rule[r["detector"]]
        assert r["recommendations"]


def test_fix_script_file_object_store_via_opener_hook():
    """Pluggable opener (VERDICT r3 #7): heal a script living in a
    fake object store — the portable auto_healer.py:48 fix_gcs_file."""
    import contextlib
    import io

    store = {"gs://bucket/job.py":
             'df = spark.read.table("proj.selfhealing..t")\n'}

    @contextlib.contextmanager
    def fake_fs_open(path, mode):
        if mode == "r":
            yield io.StringIO(store[path])
        else:
            buf = io.StringIO()
            yield buf
            store[path] = buf.getvalue()

    fix = healer.analyze_error("Syntax error near 'selfhealing..t'")
    rec = healer.fix_script_file("gs://bucket/job.py", fix,
                                 opener=fake_fs_open)
    assert rec["applied"] is True
    assert ".." not in store["gs://bucket/job.py"]
    # second pass: idempotent, no write
    rec2 = healer.fix_script_file("gs://bucket/job.py", fix,
                                  opener=fake_fs_open)
    assert rec2["applied"] is False


def test_streaming_alert_delivery_end_to_end(spark, tmp_path):
    """Streaming detector -> severity routing -> per-channel files:
    the full detect-to-deliver loop in streaming form."""
    import json
    import os

    from selfhealingdatapipeline_gcp_spark.streaming import monitors

    out = monitors.streaming_alert_delivery(
        spark, "/root/testdata/sf0.01", str(tmp_path / "sa"), threshold=4)
    assert out["n_epochs"] >= 1
    assert out["n_delivered"] >= 1
    rows = []
    for fn in os.listdir(tmp_path / "sa"):
        with open(tmp_path / "sa" / fn, encoding="utf-8") as f:
            rows += [json.loads(line) for line in f]
    assert rows and all(r["detector"] == "streaming_txn_volume"
                        for r in rows)
    assert {r["severity"] for r in rows} <= {"MEDIUM", "HIGH", "CRITICAL"}


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """The self-healing scenario the epoch-idempotent sink exists for:
    a query dies AFTER writing a micro-batch but BEFORE committing its
    offsets, restarts from the same checkpoint, replays that epoch
    (overwriting the same epoch directory), and finishes — the final
    sink holds every input row exactly once."""
    import pytest
    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    (spark.range(400)
     .select(F.col("id").alias("event_id"),
             (F.col("id") % 7).alias("user_id"))
     .repartition(4).write.parquet(src))
    schema = spark.read.parquet(src).schema
    seen = {"n": 0}

    def start(fail_after):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        def write_epoch(batch_df, epoch_id):
            (batch_df.write.mode("overwrite")
             .parquet(f"{out}/epoch={epoch_id}"))
            seen["n"] += 1
            if fail_after is not None and seen["n"] >= fail_after:
                raise RuntimeError("injected crash between write and commit")

        return (stream.writeStream.foreachBatch(write_epoch)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start())

    q = start(fail_after=2)
    with pytest.raises(Exception, match="injected crash|Writing job aborted|STREAM"):
        q.awaitTermination()
    assert seen["n"] == 2  # two epochs written, second uncommitted

    q2 = start(fail_after=None)
    q2.awaitTermination()

    got = spark.read.parquet(out).select("event_id")
    assert got.count() == 400          # no duplicated epoch rows
    assert got.distinct().count() == 400


def test_webhook_alert_sender_posts_routed_alerts(spark):
    """WebhookAlertSender delivers each slack-routed alert as one
    JSON POST (reference parity: alert_manager's Slack webhook); a
    non-2xx response raises instead of dropping the alert."""
    import http.server
    import json
    import threading

    import pytest
    from pyspark.sql import functions as F
    from selfhealingdatapipeline_gcp_spark.plans import alerts as A

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append(json.loads(body))
            code = 500 if self.server.fail else 200
            self.send_response(code)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    srv.fail = False
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/hook"
        fired = spark.createDataFrame(
            [("revenue_anomaly", "2024-03-01", "HIGH", "{}"),
             ("freshness_check", "events", "CRITICAL", "{}")],
            "detector string, alert_key string, severity string, "
            "detail string")
        sender = A.WebhookAlertSender(url)
        n = sender.deliver(fired)
        assert n == 2
        texts = {r["text"] for r in received}
        assert "[HIGH] revenue_anomaly: 2024-03-01" in texts
        assert any(r["severity"] == "CRITICAL" for r in received)
        # slack was actually used, not the log fallback
        assert {"slack"} <= {c for c, _ in sender.sent}

        srv.fail = True
        with pytest.raises(Exception):
            A.WebhookAlertSender(url).deliver(fired)
    finally:
        srv.shutdown()


def test_smtp_alert_sender_delivers_routed_alerts(spark):
    """SmtpAlertSender delivers email-routed alerts through a real
    SMTP conversation against a local debug server (reference parity:
    alert_manager._send_email), with the severity-tagged subject and
    HTML body; a dead server raises instead of dropping the alert."""
    import socket
    import threading

    import pytest
    from selfhealingdatapipeline_gcp_spark.plans import alerts as A

    received = []

    def smtp_server(sock):
        # minimal RFC-5321 conversation: enough protocol for smtplib
        while True:
            try:
                conn, _ = sock.accept()
            except OSError:
                return
            with conn:
                f = conn.makefile("rb")
                conn.sendall(b"220 localhost test SMTP\r\n")
                data_lines = None
                while True:
                    line = f.readline()
                    if not line:
                        break
                    if data_lines is not None:
                        if line.rstrip(b"\r\n") == b".":
                            received.append(b"".join(data_lines))
                            data_lines = None
                            conn.sendall(b"250 OK\r\n")
                        else:
                            data_lines.append(line)
                        continue
                    cmd = line.split()[0].upper() if line.split() else b""
                    if cmd == b"EHLO":
                        conn.sendall(b"250-localhost\r\n250 HELP\r\n")
                    elif cmd == b"HELO":
                        conn.sendall(b"250 localhost\r\n")
                    elif cmd == b"DATA":
                        data_lines = []
                        conn.sendall(b"354 go ahead\r\n")
                    elif cmd == b"QUIT":
                        conn.sendall(b"221 bye\r\n")
                        break
                    else:
                        conn.sendall(b"250 OK\r\n")

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    sock.listen(5)
    port = sock.getsockname()[1]
    t = threading.Thread(target=smtp_server, args=(sock,), daemon=True)
    t.start()
    try:
        fired = spark.createDataFrame(
            [("revenue_anomaly", "2024-03-01", "HIGH", "{}",
              ["check for system issues"]),
             ("freshness_check", "events", "CRITICAL", "{}",
              ["check upstream systems", "verify network connectivity"])],
            "detector string, alert_key string, severity string, "
            "detail string, recommendations array<string>")
        sender = A.SmtpAlertSender(
            "127.0.0.1", smtp_port=port,
            to_addresses=("ops@example.com",), use_tls=False)
        n = sender.deliver(fired)
        assert n == 2
        # HIGH routes to email+slack, CRITICAL to slack+email+log —
        # both alerts land over SMTP
        mails = [m.decode("utf-8", "replace") for m in received]
        assert len(mails) == 2
        joined = "\n".join(mails)
        assert "[CRITICAL] freshness_check: events" in joined
        assert "[HIGH] revenue_anomaly: 2024-03-01" in joined
        assert "#FF0000" in joined  # critical heading color
        assert "#FF6600" in joined  # non-critical heading color
        assert "ops@example.com" in joined
        # the Recommended Actions block rides in the email body
        # (reference alert_manager.py:90-94 _format_alert parity) —
        # the body is base64/quoted-printable MIME, so check the
        # decoded message built for a row instead
        msg = sender.build_message(fired.collect()[1])
        body = msg.get_payload()[0].get_payload(decode=True).decode()
        assert "Recommended Actions" in body
        assert "check upstream systems" in body
        assert "verify network connectivity" in body
        assert ("email", "freshness_check:events") in sender.sent
    finally:
        sock.close()

    # dead server: loud failure, never a silent drop. A FRESH port
    # (bound and closed with no server thread) — the live server's
    # accept() can keep the old port's kernel socket alive after
    # close() until the thread unblocks
    s2 = socket.socket()
    s2.bind(("127.0.0.1", 0))
    dead_port = s2.getsockname()[1]
    s2.close()
    dead = A.SmtpAlertSender("127.0.0.1", smtp_port=dead_port,
                             to_addresses=("ops@example.com",),
                             use_tls=False, timeout_s=2.0)
    crit_only = spark.createDataFrame(
        [("freshness_check", "events", "CRITICAL", "{}")],
        "detector string, alert_key string, severity string, "
        "detail string")
    with pytest.raises(Exception):
        dead.deliver(crit_only)


def test_healer_catches_own_scale_guards(spark, monkeypatch):
    """The loop that makes the guards self-healing: each quadratic
    guard's REAL raised text (not a hand-typed copy) must classify to
    its documented remediation rule."""
    import pytest

    from selfhealingdatapipeline_gcp_spark.operators import dedup
    from selfhealingdatapipeline_gcp_spark.plans import healer

    # minhash band-bucket overflow: identical docs share every band
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(6)],
        "doc_id long, text string")
    with pytest.raises(Exception) as e1:
        dedup.dedup_minhash_lsh(docs, max_bucket_docs=3).collect()
    fix = healer.analyze_error(str(e1.value))
    assert "max_bucket_docs" in fix.root_cause
    assert "dedup_exact" in fix.suggested_fix

    # all-pairs escape over the guard limit: the raise now sits under
    # force_all_pairs=True (without it the call auto-routes to the
    # cell-bounded form, VERDICT r7 #2) — the healer rule still maps
    # the forced failure
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], 0) for i in range(5)],
        "vec_id long, embedding array<float>, label int")
    with pytest.raises(ValueError) as e2:
        dedup.dedup_embedding(emb, allow_all_pairs=True,
                              max_all_pairs_rows=2,
                              force_all_pairs=True)
    fix = healer.analyze_error(str(e2.value))
    assert "max_all_pairs_rows" in fix.root_cause

    # connected components non-convergence: the raise lives in the
    # DISTRIBUTED pointer-doubling loop (the r10 driver fast path is
    # a one-pass union-find that cannot exhaust an iteration cap), so
    # pin the distributed leg for the guard text to fire
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGE_CAP", "0")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError) as e3:
        dedup.dedup_clusters(docs, max_iterations=1, edges=edges)
    fix = healer.analyze_error(str(e3.value))
    assert "max_iterations" in fix.root_cause
    assert fix.fix_type == "CONFIG"


def test_healer_catches_incremental_bucket_guard(spark):
    """dedup_incremental's REAL guard text (and therefore the
    streaming_lsh_ingest / split_leakage_check paths that share the
    bucket relation) must classify to its remediation rule."""
    import pytest

    from selfhealingdatapipeline_gcp_spark.operators import dedup
    from selfhealingdatapipeline_gcp_spark.plans import healer

    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(6)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string")
    with pytest.raises(Exception) as e:
        dedup.dedup_incremental(new, corpus, max_bucket_docs=3).collect()
    fix = healer.analyze_error(str(e.value))
    assert "max_bucket_docs" in fix.root_cause
    assert "standing corpus" in fix.root_cause
    assert "dedup_exact" in fix.suggested_fix


def test_run_curation_job_end_to_end(spark, tmp_path):
    """The training-data curation DAG: filter -> dedup (exact + LSH
    verified) -> split/pack -> partitioned sink -> dup-rate alert,
    through the self-healing runner. Asserts every stage succeeded,
    the sink is readable and partitioned by split, kept docs carry
    pack assignments, and the dup-rate accounting is conserved."""
    from selfhealingdatapipeline_gcp_spark import jobs

    out = jobs.run_curation_job(spark, "/root/testdata/sf0.001",
                                str(tmp_path / "curated"))
    assert all(s == "SUCCESS" for s in out["statuses"].values()), out
    assert 0 < out["n_out"] <= out["n_in"]
    assert out["dup_rate_e6"] == (
        (out["n_in"] - out["n_out"]) * 1_000_000 // out["n_in"])
    curated = spark.read.parquet(out["output_path"])
    assert curated.count() == out["n_out"]
    assert set(r.split for r in
               curated.select("split").distinct().collect()) <= {
        "train", "val"}
    row = curated.first()
    assert row.pack_id >= 0 and row.tokens_before >= 0


def test_curation_sink_gate_failure_publishes_nothing(spark, tmp_path,
                                                      monkeypatch):
    """Write-audit-publish (ADVICE r6): when the sink's null-key gate
    fires, the FINAL output path must not exist — the write lands at
    a staging path and is only promoted after the observed metrics
    pass. A write-then-check at the final path would already have
    published the bad data when the gate raises."""
    from selfhealingdatapipeline_gcp_spark import jobs
    from selfhealingdatapipeline_gcp_spark.operators import quality

    # Null every text at the sink boundary (an inner-join poison
    # upstream would just drop the rows — null equi-join keys never
    # match — and the gate would pass on an empty write). The REAL
    # gate observes the nulls during its own write.
    orig_gate = quality.observed_quality_gate

    def poisoned_gate(df, cols, name="gate"):
        return orig_gate(df.withColumn("text",
                                       F.lit(None).cast("string")),
                         cols, name=name)

    monkeypatch.setattr(quality, "observed_quality_gate", poisoned_gate)
    out_path = str(tmp_path / "curated")
    out = jobs.run_curation_job(spark, "/root/testdata/sf0.001", out_path)
    assert out["statuses"]["sink"] == "FAILED"
    assert not os.path.exists(out_path), (
        "gated-out data was published at the final path")
    assert not os.path.exists(out_path + ".__staging__"), (
        "failed staging output not cleaned up")


def test_observed_quality_gate_single_pass(spark, tmp_path):
    """The observation must ride the sink write itself (no second
    scan) and report exact row/null counts."""
    from selfhealingdatapipeline_gcp_spark.operators import quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")],
        "k int, v string")
    observed, obs = quality.observed_quality_gate(df, ("v",))
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 5
    assert got["nulls_v"] == 2
    # the written data is intact
    assert spark.read.parquet(str(tmp_path / "out")).count() == 5


def test_rocksdb_state_store_runs_stateful_query(spark, tmp_path):
    """The RocksDB state store provider (the 100 TB streaming-state
    setting) must run a stateful windowed aggregation and produce
    the same results as the default provider."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [(dt.datetime(2024, 1, 1, h, m), f"t{h % 2}")
            for h in range(4) for m in (0, 30)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "ts timestamp, event_type string") \
        .coalesce(1).write.parquet(src)

    def run():
        stream = (spark.readStream.schema("ts timestamp, event_type string")
                  .parquet(src))
        agg = (stream.groupBy(F.window("ts", "1 hour"), "event_type")
               .agg(F.count(F.lit(1)).alias("n")))
        name = f"rocksdb_sink_{abs(hash(tmp_path)) % 10**6}"
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        return sorted(map(tuple, spark.table(name).select(
            F.col("window.start"), "event_type", "n").collect()))

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    default = run()
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        rocks = run()
    finally:
        spark.conf.unset(provider_key)
    # 4 hours × one event_type per hour (h%2 tracks h) = 4 windows
    assert rocks == default and len(rocks) == 4


def test_task_lint_preflight_blocks_cartesian(spark):
    """A task that builds a cartesian plan with lint_plans=True must
    fail BEFORE any action executes it; the same task without the
    flag passes through (the preflight is opt-in)."""
    def build_cartesian(s, ctx):
        return s.range(5).crossJoin(
            s.range(5).withColumnRenamed("id", "id2"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    # keep broadcast OFF through the lint call — planning is lazy, so
    # the threshold must still be -1 when the preflight reads the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        linted = Pipeline("lint_on", [
            Task("cart", build_cartesian, max_retries=0,
                 lint_plans=True)])
        res = linted.run(spark)["cart"]
        assert res.status == "FAILED" and "cartesian" in res.error

        unlinted = Pipeline("lint_off", [
            Task("cart", build_cartesian, max_retries=0)])
        assert unlinted.run(spark)["cart"].status == "SUCCESS"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_scheduled_sweep_delivers_recommendations_once(spark, tmp_path):
    """The full reference parity path in one run (VERDICT r8 #7):
    detector fires → rule severity routes channels → the delivered
    jsonl carries the rule's RECOMMENDATIONS text → scheduled repeats
    are suppressed, so after 3 ticks each (detector, alert_key,
    channel) line exists EXACTLY once and still carries its
    recommended actions."""
    from selfhealingdatapipeline_gcp_spark import jobs
    from selfhealingdatapipeline_gcp_spark.plans import alerts

    alert_dir = str(tmp_path / "alerts")
    outs = jobs.run_scheduled_sweeps(
        spark, "/root/testdata/sf0.001", str(tmp_path / "state"),
        interval_s=3600.0, max_runs=3, alert_dir=alert_dir,
        sleep=lambda s: None)
    assert len(outs) == 3
    n_first = outs[0]["alerts"]["n_delivered"]
    assert n_first >= 1
    assert outs[1]["alerts"]["n_delivered"] == 0       # suppressed
    assert outs[2]["alerts"]["n_delivered"] == 0

    rules = {r.detector: r for r in alerts.DEFAULT_RULES}
    sender = alerts.FileAlertSender(alert_dir)
    seen = []
    for channel in ("slack", "email", "log"):
        for line in sender.read_back(channel):
            det = line["detector"]
            # channel agrees with the severity routing table
            assert channel in alerts.route_channels(line["severity"])
            # the jsonl carries the REGISTERED rule's recommendation
            # text verbatim — the reference's alert_manager payload
            assert tuple(line["recommendations"]) \
                == rules[det].recommendations
            assert len(line["recommendations"]) >= 2
            seen.append((det, line["alert_key"], channel))
    # 3 ticks, zero duplicate deliveries: every routed line is unique
    assert len(seen) == len(set(seen))
    assert len({(d, k) for d, k, _ in seen}) == n_first
