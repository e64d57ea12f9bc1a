"""Parity tests for the extended analytics surface (SURVEY §2)."""

from __future__ import annotations

import pytest

from selfhealingdatapipeline_gcp_spark import registry

from conftest import SF_ORACLE, assert_parity

EXTENDED = [
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q18_large_orders",
    "pivot_event_daily",
    "rollup_revenue_region_nation",
    "revenue_moving_avg",
    "user_activity_summary",
    "asof_purchase_attribution",
    "customer_rfm",
    "event_transition_matrix",
    "event_trigram_paths",
    "source_token_stats",
    "brand_price_trend",
    "supplier_concentration_hhi",
    "cdc_churn_report",
    "funnel_time_to_convert",
    "event_audience_overlap",
]


@pytest.mark.parametrize("name", EXTENDED)
def test_parity(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_asof_semantics(spark):
    """Every attributed click strictly precedes its purchase, and is
    the latest such click for that user."""
    df = registry.queries()["asof_purchase_attribution"](spark, SF_ORACLE)
    rows = df.collect()
    assert rows
    n_attributed = sum(1 for r in rows if r.prev_click_ts is not None)
    assert n_attributed > 0
    for r in rows[:200]:
        if r.prev_click_ts is not None:
            assert r.prev_click_ts < r.ts
            assert r.gap_s > 0


@pytest.mark.parametrize("name", ["q7_nation_trade_volume",
                                  "q8_brand_market_share"])
def test_parity_q7_q8(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_parity_percentiles(spark, duck):
    q = registry.queries()["event_value_percentiles"]
    sql = registry.oracle_sql()["event_value_percentiles"]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_approx_distinct_close_to_exact(spark):
    # operator's full output carries the raw estimates
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import analytics
    full = analytics.approx_distinct_stats(
        catalog.load(spark, SF_ORACLE, "events")).collect()
    assert full
    for r in full:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, f"{r.event_type}: HLL rel err {rel_err}"
        assert r.hll_ok and r.p90_ok
    # registered projection exposes only the deterministic gate
    rows = registry.queries()["approx_distinct_stats"](
        spark, SF_ORACLE).collect()
    assert [r.asDict() for r in rows] == [
        {"event_type": r.event_type, "exact_users": r.exact_users,
         "hll_ok": True, "p90_ok": True} for r in full]


@pytest.mark.parametrize("name", ["parts_supplier_stats",
                                  "q17_small_quantity_revenue",
                                  "funnel_view_click_purchase"])
def test_parity_batch4(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


@pytest.mark.parametrize("name", ["cube_orders_status_priority",
                                  "quality_column_profile"])
def test_parity_batch5(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


@pytest.mark.parametrize("name", ["event_props_stats",
                                  "customers_without_orders",
                                  "missing_order_days"])
def test_parity_batch6(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_parity_session_stats(spark, duck):
    q = registry.queries()["session_duration_stats"]
    sql = registry.oracle_sql()["session_duration_stats"]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_parity_sliding_window(spark, duck):
    q = registry.queries()["sliding_event_rate"]
    sql = registry.oracle_sql()["sliding_event_rate"]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_event_hourly_heatmap_parity(spark, duck):
    q = registry.queries()["event_hourly_heatmap"]
    sql = registry.oracle_sql()["event_hourly_heatmap"]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_dedup_verified_clusters_consistent(spark):
    """The registered LSH->verify->cluster composition must produce
    clusters whose members all appear in verified pairs."""
    qs = registry.queries()
    clusters = qs["dedup_verified_clusters"](spark, SF_ORACLE).collect()
    assert clusters
    pair_docs = set()
    for r in qs["dedup_lsh_verified"](spark, SF_ORACLE).collect():
        pair_docs.add(r.doc_a)
        pair_docs.add(r.doc_b)
    for c in clusters:
        assert c.cluster_size >= 2
        assert c.keeper_doc_id in pair_docs


def test_cdc_snapshot_diff_parity_and_classes(spark, duck):
    from conftest import SF_ORACLE, assert_parity

    from selfhealingdatapipeline_gcp_spark import registry
    assert_parity(registry.queries()["cdc_snapshot_diff"](spark, SF_ORACLE),
                  duck, registry.oracle_sql()["cdc_snapshot_diff"])
    rows = registry.queries()["cdc_snapshot_diff"](
        spark, SF_ORACLE).collect()
    by = {}
    for r in rows:
        by.setdefault(r.change_type, []).append(r.key)
    # the fabricated split: %10==0 keys added, %13==0 removed,
    # %7==0 changed (when present in both), everything else unchanged
    assert all(k % 10 == 0 and k % 13 != 0 for k in by["added"])
    assert all(k % 13 == 0 and k % 10 != 0 for k in by["removed"])
    assert all(k % 7 == 0 for k in by["changed"])
    assert set(by) == {"added", "removed", "changed", "unchanged"}


def test_cdc_snapshot_diff_null_and_delimiter_safe(spark):
    """The fingerprint must distinguish ('a', NULL) from ('a',
    'NULL'-ish collapses) and ('a|b','c') from ('a','b|c') — the
    concat_ws('|') form misreported both as unchanged (ADVICE r5)."""
    from selfhealingdatapipeline_gcp_spark.operators import cdc

    old = spark.createDataFrame(
        [(1, "a", None), (2, "a|b", "c"), (3, "x", "y")],
        "k int, c1 string, c2 string")
    new = spark.createDataFrame(
        [(1, "a", "NNNN"), (2, "a", "b|c"), (3, "x", "y")],
        "k int, c1 string, c2 string")
    out = {r.key: r.change_type
           for r in cdc.snapshot_diff(old, new, "k", ("c1", "c2")).collect()}
    assert out == {1: "changed", 2: "changed", 3: "unchanged"}


def test_user_activity_salted_identical_to_unsalted(spark, duck):
    """The explicit two-phase salted aggregation must be
    value-invisible: identical rows to the unsalted operator and
    strict parity against the SAME oracle."""
    qs = registry.queries()
    assert_parity(qs["user_activity_salted"](spark, SF_ORACLE),
                  duck, registry.oracle_sql()["user_activity_salted"])
    a = sorted(map(tuple, qs["user_activity_salted"](
        spark, SF_ORACLE).collect()))
    b = sorted(map(tuple, qs["user_activity_summary"](
        spark, SF_ORACLE).collect()))
    assert a == b


def test_brand_affinity_parity_and_math(spark, duck):
    """Strict parity; and on a fabricated basket set the lift math
    must match hand-computed association values (always-together
    brands lift > 1, never-together pairs absent)."""
    from selfhealingdatapipeline_gcp_spark.operators import analytics

    assert_parity(registry.queries()["brand_affinity"](
        spark, SF_ORACLE), duck, registry.oracle_sql()["brand_affinity"])

    # 20 orders: A+B always together, C alone in half
    rows, parts = [], [(1, "A"), (2, "B"), (3, "C")]
    for o in range(20):
        rows.append((o, 1))
        rows.append((o, 2))
        if o < 10:
            rows.append((o, 3))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    pt = spark.createDataFrame(parts, "p_partkey long, p_brand string")
    out = {(r.brand_a, r.brand_b): r
           for r in analytics.brand_affinity(li, pt,
                                             min_pair_orders=1).collect()}
    ab = out[("A", "B")]
    assert ab.n_both == 20 and ab.lift_e6 == 1_000_000  # 20*20/(20*20)
    ac = out[("A", "C")]
    assert ac.n_both == 10 and ac.lift_e6 == 1_000_000  # 10*20/(20*10)
    assert ac.support_e6 == 500_000
    assert ac.confidence_a_to_b_e6 == 500_000


def test_event_trigram_paths_stitch_is_value_invisible(spark):
    """The (user, day)-bucketed stitch must reproduce the naive
    single-window trigrams exactly, including paths spanning two and
    three buckets (a single-event middle day forces the 3-bucket
    case), and Σ n_paths = Σ_users max(n_events − 2, 0)."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import analytics

    def e(i, day, hh, u, t):
        return (i, dt.datetime(2024, 3, day, hh, 0, 0), u, t, 0.0, "")
    rows = [
        # user 1: 4 events day 1, 1 event day 2, 2 events day 3
        e(1, 1, 9, 1, "view"), e(2, 1, 10, 1, "click"),
        e(3, 1, 11, 1, "view"), e(4, 1, 12, 1, "cart"),
        e(5, 2, 9, 1, "purchase"),
        e(6, 3, 9, 1, "view"), e(7, 3, 10, 1, "click"),
        # user 2: exactly 2 events → no trigrams
        e(8, 1, 9, 2, "view"), e(9, 1, 10, 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {(r.step_1, r.step_2, r.step_3): r.n_paths
           for r in analytics.event_trigram_paths(df).collect()}
    want = {
        ("view", "click", "view"): 1,
        ("click", "view", "cart"): 1,
        ("view", "cart", "purchase"): 1,      # spans day 1 → day 2
        ("cart", "purchase", "view"): 1,      # spans days 1 → 2 → 3
        ("purchase", "view", "click"): 1,     # spans day 2 → day 3
    }
    assert got == want
    assert sum(got.values()) == 7 - 2


def test_cdc_churn_report_known_histogram(spark):
    """Fabricated log with an exact versions-per-key histogram."""
    from selfhealingdatapipeline_gcp_spark.operators import cdc
    rows = ([("k%d" % i, 1) for i in range(3)]          # 3 keys x1
            + [("dup%d" % i, j) for i in range(2) for j in range(2)]
            + [("hot", j) for j in range(5)])           # 1 key x5
    df = spark.createDataFrame(rows, "k string, seq int")
    out = {r.n_versions: r for r in cdc.churn_report(df, "k").collect()}
    assert set(out) == {1, 2, 5}
    assert (out[1].n_keys, out[1].n_changes) == (3, 3)
    assert (out[2].n_keys, out[2].n_changes) == (2, 4)
    assert (out[5].n_keys, out[5].n_changes) == (1, 5)
    # shares: 6 keys, 12 changes
    assert out[1].keys_share_e6 == 500000
    assert out[5].changes_share_e6 == 416666
    assert sum(r.n_changes for r in out.values()) == 12


def test_funnel_time_to_convert_fabricated(spark):
    """3 viewers, exactly one converts 100 s after the view; a
    pre-view purchase must NOT count as a conversion."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import analytics
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=100), 1, "purchase", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=500), 1, "purchase", 1.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
        (4, t0 - dt.timedelta(seconds=10), 3, "purchase", 1.0, "{}"),
        (5, t0, 3, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = analytics.funnel_time_to_convert(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_viewers, r.n_converters, r.conversion_e6) \
        == (3, 1, 333333)
    assert (r.p50_latency_s, r.p90_latency_s, r.mean_latency_s) \
        == (100, 100, 100)


def test_event_audience_overlap_fabricated(spark):
    """view={1,2}, click={2,3}, purchase={3}: jaccard(click,view)=1/3,
    jaccard(click,purchase)=1/2; disjoint pairs are absent."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import analytics
    t0 = dt.datetime(2024, 1, 1)
    rows = [(0, t0, 1, "view", 1.0, "{}"),
            (1, t0, 2, "view", 1.0, "{}"),
            (2, t0, 2, "click", 1.0, "{}"),
            (3, t0, 3, "click", 1.0, "{}"),
            (4, t0, 3, "purchase", 1.0, "{}"),
            (5, t0, 3, "purchase", 2.0, "{}")]  # dup (type,user) row
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    out = {(r.type_a, r.type_b): r
           for r in analytics.event_audience_overlap(df).collect()}
    assert set(out) == {("click", "view"), ("click", "purchase")}
    cv = out[("click", "view")]
    assert (cv.n_a, cv.n_b, cv.n_both, cv.jaccard_e6) == (2, 2, 1, 333333)
    cp = out[("click", "purchase")]
    assert (cp.n_a, cp.n_b, cp.n_both, cp.jaccard_e6) == (2, 1, 1, 500000)


def test_zorder_layout_plan_bounds_both_dimensions(spark):
    """The point of z-ordering: with 64 files on an 8x8 grid, each
    zorder cell bounds BOTH quantized dimensions to ~1/8 of their
    range, while natural (orderkey) order leaves partkey AND shipdate
    spans near-full per file — so per-dimension sum-of-spans (the
    min-max pruning cost proxy) must drop by several x. Both layouts
    must also partition every row exactly once."""
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import layout

    li = catalog.load(spark, SF_ORACLE, "lineitem")
    rows = layout.zorder_layout_plan(li).collect()
    n_li = li.count()
    by = {"natural": [r for r in rows if r.layout == "natural"],
          "zorder": [r for r in rows if r.layout == "zorder"]}
    for name, rs in by.items():
        assert sum(r.n_rows for r in rs) == n_li, name
        assert all(0 <= r.file_id < 64 for r in rs), name
        assert all(r.pk_span == r.pk_max - r.pk_min + 1 for r in rs)
    nat_pk = sum(r.pk_span for r in by["natural"])
    z_pk = sum(r.pk_span for r in by["zorder"])
    nat_dt = sum(r.dt_span for r in by["natural"])
    z_dt = sum(r.dt_span for r in by["zorder"])
    assert z_pk * 4 < nat_pk, (z_pk, nat_pk)
    assert z_dt * 4 < nat_dt, (z_dt, nat_dt)


def test_zorder_layout_plan_parity(spark, duck):
    assert_parity(registry.queries()["zorder_layout_plan"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["zorder_layout_plan"])


def test_range_partition_plan_balance_on_uniform_key(spark):
    """l_orderkey is near-uniform, so histogram-planned boundaries
    must land every partition within ~one bucket of the even 1/32
    split, rows must be conserved, and partitions must be contiguous
    0..31."""
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import layout

    li = catalog.load(spark, SF_ORACLE, "lineitem")
    rows = layout.range_partition_plan(li).collect()
    assert [r.partition_id for r in rows] == list(range(32))
    assert sum(r.n_rows for r in rows) == li.count()
    assert sum(r.n_buckets for r in rows) <= 1024
    # even split = 31250 e6-share; allow one 1024-bucket granule
    for r in rows:
        assert abs(r.dev_from_even_e6) < 1_000_000 // 1024 + 2500, r


def test_range_partition_plan_skew_visible(spark):
    """A key distribution with half its mass on one hot value must
    surface as one planned partition holding ~half the rows — the
    audit's entire point is making this visible pre-shuffle."""
    from selfhealingdatapipeline_gcp_spark.operators import layout

    data = [(500_000,) for _ in range(5000)]
    data += [(i,) for i in range(0, 1_000_000, 200)]
    df = spark.createDataFrame(data, ["l_orderkey"])
    rows = layout.range_partition_plan(df).collect()
    hot = max(rows, key=lambda r: r.n_rows)
    assert hot.share_e6 > 400_000
    assert hot.dev_from_even_e6 > 300_000


def test_range_partition_plan_parity(spark, duck):
    assert_parity(registry.queries()["range_partition_plan"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["range_partition_plan"])


def test_series_downsample_m4_witness_properties(spark):
    """M4 guarantees per (type, bucket): exactly one point per role;
    the min witness carries the bucket's true minimum value and the
    first witness its earliest timestamp; every witness is a REAL
    input row (error-free reduction, not an aggregate)."""
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.operators import analytics
    from pyspark.sql import functions as F

    ev = catalog.load(spark, SF_ORACLE, "events")
    out = analytics.series_downsample_m4(ev).collect()
    seen = {}
    for r in out:
        key = (r.event_type, r.bkt)
        seen.setdefault(key, {})[r.role] = r
        assert r.role in ("first", "last", "min", "max")
    for key, roles in seen.items():
        assert set(roles) == {"first", "last", "min", "max"}, key
        assert roles["min"].v_c <= roles["max"].v_c
        assert roles["first"].t_us <= roles["last"].t_us
    # witnesses are real rows: check the min role against a recompute
    truth = {(r.event_type, r.bkt): r for r in out if r.role == "min"}
    ids = {r.eid for r in out}
    real = {r.event_id for r in
            ev.filter(F.col("event_id").isin([int(i) for i in ids]))
              .select("event_id").collect()}
    assert ids == real


def test_series_downsample_m4_parity(spark, duck):
    assert_parity(registry.queries()["series_downsample_m4"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["series_downsample_m4"])


def test_asof_forward_semantics(spark):
    """Every matched next-purchase strictly FOLLOWS its view and is
    the earliest such purchase for that user; a planted same-instant
    purchase must NOT match (strict >), and the nearest later one
    must win over farther ones."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import asof

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    views = spark.createDataFrame(
        [(1, 7, t), (2, 7, t + 10 * s), (3, 8, t)],
        ["event_id", "user_id", "ts"])
    purchases = spark.createDataFrame(
        [(100, 7, t),            # same instant as view 1: must NOT match
         (101, 7, t + 5 * s),    # nearest future for view 1
         (102, 7, t + 20 * s),   # nearest future for view 2
         (103, 9, t + 1 * s)],   # other user: never matches
        ["p_id", "user_id", "p_ts"])
    out = {r.event_id: r for r in asof.asof_join_forward(
        views, purchases, on="user_id", left_ts="ts", right_ts="p_ts",
        right_cols=("p_ts", "p_id")).collect()}
    assert out[1].next_p_id == 101   # strict: 100 at t excluded
    assert out[2].next_p_id == 102
    assert out[3].next_p_id is None  # user 8 has no purchases

    # deterministic tie resolution (ADVICE r7): TWO purchases at the
    # same (user, ts) — the struct-MIN (here: smaller p_id) is carried,
    # not whichever row a partition happened to order first
    tied = spark.createDataFrame(
        [(201, 7, t + 5 * s), (200, 7, t + 5 * s)],
        ["p_id", "user_id", "p_ts"])
    got = {r.event_id: r for r in asof.asof_join_forward(
        views, tied, on="user_id", left_ts="ts", right_ts="p_ts",
        right_cols=("p_ts", "p_id")).collect()}
    assert got[1].next_p_id == 200
    back = {r.event_id: r for r in asof.asof_join(
        views.filter("event_id = 2"), tied, on="user_id",
        left_ts="ts", right_ts="p_ts",
        right_cols=("p_ts", "p_id")).collect()}
    assert back[2].asof_p_id == 200

    full = registry.queries()["asof_next_purchase"](spark, SF_ORACLE)
    rows = full.collect()
    assert any(r.next_purchase_ts is not None for r in rows)
    for r in rows[:200]:
        if r.next_purchase_ts is not None:
            assert r.next_purchase_ts > r.ts and r.gap_s > 0


def test_asof_next_purchase_parity(spark, duck):
    assert_parity(registry.queries()["asof_next_purchase"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["asof_next_purchase"])


def test_cdc_incremental_agg_fabricated_episode(spark):
    """3-group episode: group A loses a $10 row (delete), B gains a
    $20 row (insert), C has a $5→$7 update. Maintained = recomputed
    everywhere; then a CORRUPTED log (the update's new-image lost)
    must flip C's matches flag to False — the self-verification is
    live, not vacuously true."""
    from selfhealingdatapipeline_gcp_spark.operators import cdc

    old = spark.createDataFrame(
        [("A", 10.0), ("A", 1.0), ("B", 2.0), ("C", 5.0)], ["g", "amt"])
    new = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("B", 20.0), ("C", 7.0)], ["g", "amt"])
    minus = spark.createDataFrame([("A", 10.0), ("C", 5.0)], ["g", "amt"])
    plus = spark.createDataFrame([("B", 20.0), ("C", 7.0)], ["g", "amt"])
    out = {r.g: r for r in cdc.incremental_agg_maintain(
        old, minus, plus, new, "g", "amt").collect()}
    assert all(r.matches for r in out.values())
    assert out["A"].n_rows == 1 and out["A"].amount_cents == 100
    assert out["B"].n_rows == 2 and out["B"].amount_cents == 2200
    assert out["C"].n_rows == 1 and out["C"].amount_cents == 700

    plus_broken = spark.createDataFrame([("B", 20.0)], ["g", "amt"])
    out2 = {r.g: r for r in cdc.incremental_agg_maintain(
        old, minus, plus_broken, new, "g", "amt").collect()}
    assert not out2["C"].matches          # maintained 0 rows vs 1
    assert out2["A"].matches and out2["B"].matches


def test_cdc_incremental_agg_parity(spark, duck):
    assert_parity(registry.queries()["cdc_incremental_agg"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["cdc_incremental_agg"])


def test_supplier_scorecard_fabricated(spark):
    """One supplier, 4 lines ($100 each, one 'R', discounts 0/.1/.2/.1,
    2 distinct parts): revenue Σ price·(1-d) = 360, return rate
    250000 e6, avg discount 1000 e4."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import analytics

    li = spark.createDataFrame(
        [(1, 10, 7, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
          dt.datetime(2024, 1, 1)),
         (2, 10, 7, 1, 1.0, 100.0, 0.1, 0.0, "R", "O",
          dt.datetime(2024, 1, 2)),
         (3, 11, 7, 1, 1.0, 100.0, 0.2, 0.0, "N", "O",
          dt.datetime(2024, 1, 3)),
         (4, 11, 7, 1, 1.0, 100.0, 0.1, 0.0, "N", "O",
          dt.datetime(2024, 1, 4))],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"])
    supp = spark.createDataFrame([(7, "Acme", 0)],
                                 ["s_suppkey", "s_name", "s_nationkey"])
    nat = spark.createDataFrame([(0, "FRANCE", 0)],
                                ["n_nationkey", "n_name", "n_regionkey"])
    out = analytics.supplier_scorecard(li, supp, nat).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.supplier_key, r.nation, r.n_lines) == (7, "FRANCE", 4)
    assert r.revenue == 360.0
    assert r.n_distinct_parts == 2
    assert r.return_rate_e6 == 250_000
    assert r.avg_discount_e4 == 1000


def test_supplier_scorecard_parity(spark, duck):
    assert_parity(registry.queries()["supplier_scorecard"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["supplier_scorecard"])
