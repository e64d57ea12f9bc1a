"""Training-data-prep operator tests: DuckDB parity for all registry
entries plus behavioral checks (injected-PII redaction, split
determinism, quantization error bounds)."""

from __future__ import annotations

import pytest

from selfhealingdatapipeline_gcp_spark import registry
from selfhealingdatapipeline_gcp_spark.operators import dataprep

from conftest import SF_ORACLE, assert_parity

DATAPREP = [
    "train_val_split",
    "stratified_sample",
    "source_mixing_plan",
    "contamination_check",
    "repetition_score",
    "quality_filter_pipeline",
    "pii_redact",
    "vector_quantize",
    "cap_per_source",
    "seq_pack_plan",
    "token_histogram",
    "temperature_mixing_weights",
    "doc_chunk_plan",
    "source_topic_mix",
    "source_epoch_plan",
    "source_quality_calibration",
    "decontamination_manifest",
    "drop_reason_matrix",
    "split_balance_report",
    "temporal_split_plan",
]


@pytest.mark.parametrize("name", DATAPREP)
def test_parity(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def test_split_deterministic_and_balanced(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    docs = catalog.load(spark, SF_ORACLE, "documents")
    a = {r.doc_id: r.split for r in dataprep.train_val_split(docs).collect()}
    b = {r.doc_id: r.split for r in dataprep.train_val_split(docs).collect()}
    assert a == b  # byte-identical on re-run
    n_val = sum(1 for s in a.values() if s == "val")
    assert 0.04 < n_val / len(a) < 0.20  # ~10% ± hash noise at n=500


def test_stratified_sample_covers_strata(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    docs = catalog.load(spark, SF_ORACLE, "documents")
    rows = dataprep.stratified_sample(docs).collect()
    frac = len(rows) / docs.count()
    assert 0.1 < frac < 0.3  # target 0.2
    assert len({r.stratum for r in rows}) >= 15  # most of 20 sources hit


def test_pii_redact_injected(spark):
    rows = [
        (1, "contact me at alice@example.com today"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "card 4111 1111 1111 1111 on file"),
        (4, "no pii here at all"),
        (5, "two mails a@b.io and c@d.org"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dataprep.pii_redact(df).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].redacted_text
    assert "alice@example.com" not in out[1].redacted_text
    assert out[2].n_phone == 1 and "<PHONE>" in out[2].redacted_text
    assert out[3].n_card == 1 and "<CARD>" in out[3].redacted_text
    assert "4111" not in out[3].redacted_text
    assert out[4].redacted_text == "no pii here at all"
    assert out[5].n_email == 2


def test_vector_quantize_error_bound(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    emb = catalog.load(spark, SF_ORACLE, "embeddings")
    orig = {(r.vec_id, i): float(x)
            for r in emb.select("vec_id", "embedding").limit(20).collect()
            for i, x in enumerate(r.embedding)}
    q = {(r.vec_id, r.dim_idx): r
         for r in dataprep.vector_quantize(emb).collect()
         if (r.vec_id, r.dim_idx) in orig}
    assert q, "limit(20) vec_ids must appear"
    for key, r in q.items():
        assert -127 <= r.q8 <= 127
        scale = r.scale_e6 / 1e6
        recon = r.q8 / 127.0 * scale
        # floor-quantization error is one step of scale/127 (+ the
        # 1e-6 truncation of the stored scale)
        assert abs(orig[key] - recon) <= scale / 127.0 + 1e-4


def test_quality_filter_reasons_are_first_match(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    docs = catalog.load(spark, SF_ORACLE, "documents")
    rows = dataprep.quality_filter_pipeline(docs).collect()
    assert rows
    for r in rows:
        assert r.keep == (r.drop_reason is None)
        if r.n_tokens < 20:
            assert r.drop_reason == "too_short"


def test_contamination_rates_bounded(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    docs = catalog.load(spark, SF_ORACLE, "documents")
    out = dataprep.contamination_check(
        docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0"))
    rows = out.collect()
    assert len(rows) == docs.filter("doc_id % 10 = 0").count()
    for r in rows:
        assert 0.0 <= r.contamination_rate <= 1.0
        assert r.n_contaminated <= r.n_shingles
    # a train document evaluated against itself must be 100% contaminated
    self_check = dataprep.contamination_check(docs, docs.limit(5)).collect()
    assert all(r.contamination_rate >= 0.999999 for r in self_check)

def test_seq_pack_plan_packs_are_contiguous_and_near_budget(spark):
    """Within every (source, stream) packing stream: pack ids are
    non-decreasing in the deterministic order, every pack except
    possibly the last holds ≥ the budget minus its final straddling
    doc (i.e. tokens_before of a pack's first doc lands inside the
    pack's budget window), and no pack mixes sources."""
    from collections import defaultdict
    rows = registry.queries()["seq_pack_plan"](spark, SF_ORACLE).collect()
    budget = 2048
    by_stream = defaultdict(list)
    for r in rows:
        by_stream[(r.source, r.stream)].append(r)
    assert sum(len(v) for v in by_stream.values()) == 500
    for (_, _), docs in by_stream.items():
        docs.sort(key=lambda r: (r.tokens_before, r.doc_id))
        cum = 0
        for r in docs:
            assert r.tokens_before == cum
            # the assignment rule, re-derived independently
            assert r.pack_id == cum // budget
            cum += r.est_tokens


def test_token_histogram_covers_corpus(spark):
    from selfhealingdatapipeline_gcp_spark import catalog
    rows = registry.queries()["token_histogram"](spark, SF_ORACLE).collect()
    n_docs = catalog.load(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.bucket_lo == 2 ** r.log2_bucket


def test_temperature_mixing_flattens_toward_uniform(spark):
    """T=2 tempering must move every stratum's probability toward
    uniform: boost > 1 for under-represented strata, < 1 for
    over-represented ones, and tempered probabilities ~sum to 1."""
    rows = registry.queries()["temperature_mixing_weights"](
        spark, SF_ORACLE).collect()
    uniform_e6 = 1_000_000 // len(rows)
    for r in rows:
        if r.share_e6 < uniform_e6:
            assert r.tempered_e6 >= r.share_e6, r
            assert r.boost_e4 >= 10_000, r
        elif r.share_e6 > uniform_e6 + 1:
            assert r.tempered_e6 <= r.share_e6 + 1, r
            assert r.boost_e4 <= 10_000, r
    total = sum(r.tempered_e6 for r in rows)
    assert abs(total - 1_000_000) < len(rows) + 1


def test_doc_chunk_plan_tiles_documents(spark):
    """Chunks tile each doc: first starts at 0, consecutive starts
    step by the stride, the last chunk's end equals n_tokens (for
    non-empty docs), and every doc emits >= 1 chunk."""
    from selfhealingdatapipeline_gcp_spark import catalog
    docs = catalog.load(spark, SF_ORACLE, "documents")
    rows = dataprep.doc_chunk_plan(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_docs = docs.count()
    assert len(by_doc) == n_docs
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[0].start_token == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_token - a.start_token == 48
            assert a.end_token > b.start_token  # overlap is real
        last = chunks[-1]
        assert last.end_token == last.n_tokens or last.n_tokens == 0
        for c in chunks:
            assert c.chunk_len == c.end_token - c.start_token >= 0


def test_benford_detector_shape(spark):
    """Digits are 1-9, counts sum to the order count, shares sum to
    ~1e6 (floor-truncation loses < 9 units)."""
    from selfhealingdatapipeline_gcp_spark import catalog, registry
    rows = registry.queries()["benford_first_digit"](
        spark, SF_ORACLE).collect()
    n_orders = catalog.load(spark, SF_ORACLE, "orders").count()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert sum(r.n for r in rows) == n_orders
    tot = sum(r.share_e6 for r in rows)
    assert 1_000_000 - 9 <= tot <= 1_000_000


def test_packing_efficiency_consistent_with_plan(spark, duck):
    from conftest import assert_parity
    assert_parity(registry.queries()["packing_efficiency_report"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["packing_efficiency_report"])
    plan = registry.queries()["seq_pack_plan"](spark, SF_ORACLE).collect()
    rep = {r.source: r for r in registry.queries()[
        "packing_efficiency_report"](spark, SF_ORACLE).collect()}
    from collections import defaultdict
    docs, packs, toks = (defaultdict(int), defaultdict(set),
                         defaultdict(int))
    for r in plan:
        docs[r.source] += 1
        packs[r.source].add((r.stream, r.pack_id))
        toks[r.source] += r.est_tokens
    for s, row in rep.items():
        assert row.n_docs == docs[s]
        assert row.n_packs == len(packs[s])
        assert row.total_tokens == toks[s]
        assert row.fill_e6 == (toks[s] * 1_000_000) // (len(packs[s]) * 2048)


def test_source_topic_mix_shares_consistent(spark):
    """n_docs sums to the joined corpus; per-source shares sum to 1
    within floor-truncation slack; lift ~= source_share/corpus_share."""
    from selfhealingdatapipeline_gcp_spark import catalog
    rows = registry.queries()["source_topic_mix"](
        spark, SF_ORACLE).collect()
    assert rows
    n_docs_total = catalog.load(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, members in by_source.items():
        s = sum(m.source_share for m in members)
        # floor-truncated at 4 decimals: sum <= 1, off by < 1e-4/label
        assert 1.0 - 1e-4 * len(members) <= s <= 1.0 + 1e-9
        for m in members:
            if m.corpus_share > 0:
                approx = m.source_share / m.corpus_share
                assert abs(m.lift - approx) < 2e-3


def test_source_epoch_plan_tempering_behavior(spark):
    """T=2 tempering must up-sample the small source past one epoch
    and down-sample the large one below it, with the token budget
    conserved (Σ target ≤ corpus tokens, off only by floor)."""
    rows = ([(i, "big " + "w " * 99, "big") for i in range(90)]
            + [(1000 + i, "small " + "w " * 99, "small")
               for i in range(10)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r for r in dataprep.source_epoch_plan(df).collect()}
    assert out["big"].n_tokens == 90 * 100
    assert out["small"].n_tokens == 10 * 100
    # sqrt tempering: weights ∝ sqrt(9000):sqrt(1000) = 3:1
    assert out["small"].epochs_e4 > 10000      # repeated
    assert out["big"].epochs_e4 < 10000        # subsampled
    assert abs(out["big"].tempered_share_e6 - 750000) <= 1
    assert abs(out["small"].tempered_share_e6 - 250000) <= 1
    total = out["big"].n_tokens + out["small"].n_tokens
    target_sum = out["big"].target_tokens + out["small"].target_tokens
    assert total - 2 <= target_sum <= total


def test_source_quality_calibration_percentiles(spark):
    """Empty-doc sources surface as all-zero percentiles (the LEFT
    join + coalesce path); mixed sources show monotone percentiles
    and an exact below-cut share."""
    rows = ([(i, "", "empty") for i in range(5)]
            + [(100 + i, "the a of and is " * 30, "good")
               for i in range(8)]
            + [(200 + i, "zz", "terse") for i in range(4)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r
           for r in dataprep.source_quality_calibration(df).collect()}
    e = out["empty"]
    assert (e.p10_q_e4, e.p50_q_e4, e.p90_q_e4) == (0.0, 0.0, 0.0)
    assert e.below_half_share_e6 == 1000000
    for r in out.values():
        assert (r.p10_q_e4 <= r.p25_q_e4 <= r.p50_q_e4
                <= r.p75_q_e4 <= r.p90_q_e4)
    # "good" docs: 150 tokens (len_score 1.0), all stopwords
    # (stop_ratio 1.0), mean_len in [2,10] → score = 1.0 exactly
    g = out["good"]
    assert g.p10_q_e4 == 10000.0 and g.below_half_share_e6 == 0


def test_decontamination_manifest_spans(spark):
    """Planted eval sentence inside a train doc → one merged span at
    the right token range; two separated plants → two spans."""
    dirty = "the secret benchmark answer is forty two exactly"
    filler = ("alpha beta gamma delta epsilon zeta eta theta iota "
              "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
    train = spark.createDataFrame(
        [
            # dirty tokens 20..27 (8 tokens after the 20-token filler)
            (1, filler + " " + dirty + " " + filler),
            # two plants separated by 20 clean tokens → two spans
            (2, dirty + " " + filler + " " + dirty),
            (3, filler),
        ],
        ["doc_id", "text"])
    ev = spark.createDataFrame([(100, dirty)], ["doc_id", "text"])
    rows = dataprep.decontamination_manifest(train, ev).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    (s1,) = by_doc[1]
    # 8 dirty tokens at positions 20..27: shingle starts 20..25,
    # span covers [20, 27]
    assert (s1.span_start, s1.span_end, s1.span_tokens) == (20, 27, 8)
    assert s1.n_matched_shingles == 6
    assert [(-r.span_start, r.span_end) for r in by_doc[2]] \
        and len(by_doc[2]) == 2
    a, b = sorted(by_doc[2], key=lambda r: r.span_start)
    assert (a.span_start, a.span_end) == (0, 7)
    assert (b.span_start, b.span_end) == (28, 35)


def test_drop_reason_matrix_accounts_for_every_doc(spark):
    """Per source: Σ n_docs over reasons == source doc count, shares
    sum to ~1e6, zero-token docs land in 'too_short', and the
    reason totals agree with quality_filter_pipeline's verdicts."""
    from collections import Counter
    from selfhealingdatapipeline_gcp_spark import catalog
    docs = catalog.load(spark, SF_ORACLE, "documents")
    rows = dataprep.drop_reason_matrix(docs).collect()
    per_src = {r.source: r.n
               for r in docs.groupBy("source").count()
                            .withColumnRenamed("count", "n").collect()}
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(per_src)
    for src, rs in by_src.items():
        assert sum(r.n_docs for r in rs) == per_src[src]
        assert 1_000_000 - len(rs) <= sum(r.share_e6 for r in rs) \
            <= 1_000_000
    # cross-check totals against the per-doc verdicts
    verd = Counter()
    for v in dataprep.quality_filter_pipeline(docs).collect():
        verd["kept" if v.keep else v.drop_reason] += 1
    got = Counter()
    for r in rows:
        got[r.reason] += r.n_docs
    missing = docs.count() - sum(verd.values())  # zero-token docs
    verd["too_short"] += missing
    assert got == verd
    # fabricated: an all-empty source reports 100% too_short
    tiny = spark.createDataFrame(
        [(1, "", "empty"), (2, "", "empty")],
        ["doc_id", "text", "source"])
    out = dataprep.drop_reason_matrix(tiny).collect()
    assert len(out) == 1 and out[0].reason == "too_short" \
        and out[0].share_e6 == 1_000_000


def test_split_balance_report_exact_shares(spark):
    """Doc/token masses per side recomputed in Python from the md5
    rule must match exactly; shares are floor micro-units."""
    import hashlib

    def is_val(doc_id):
        return int(hashlib.md5(str(doc_id).encode())
                   .hexdigest()[:12], 16) % 100 < 10

    rows = [(i, "w " * (i % 7 + 1), "s" + str(i % 2))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r
           for r in dataprep.split_balance_report(df).collect()}
    for src in ("s0", "s1"):
        docs = [(i, i % 7 + 1) for i in range(200)
                if "s" + str(i % 2) == src]
        vd = sum(1 for i, _ in docs if is_val(i))
        vt = sum(t for i, t in docs if is_val(i))
        td = len(docs) - vd
        tt = sum(t for _, t in docs) - vt
        r = out[src]
        assert (r.train_docs, r.val_docs, r.train_tokens, r.val_tokens) \
            == (td, vd, tt, vt)
        assert r.val_doc_share_e6 == vd * 1_000_000 // len(docs)
        assert r.val_token_share_e6 == vt * 1_000_000 // (tt + vt)


def test_temporal_split_plan_fabricated(spark):
    """10 days of events, 80% cutoff at day 8, 1-day embargo: day-9
    events are discarded, day-10 events are val; user 1 (active both
    sides) is leaky, user 2 (train only) and user 3 (val only) are
    not."""
    import datetime as dt
    from selfhealingdatapipeline_gcp_spark.operators import dataprep
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # span exactly 10 days: t0 .. t0+10d
    for d in range(9):                              # days 0..8 -> train side
        rows.append((eid, t0 + dt.timedelta(days=d), 1, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, t0 + dt.timedelta(days=d), 2, "view", 1.0, "{}"))
        eid += 1
    rows.append((eid, t0 + dt.timedelta(days=8, hours=6), 1,
                 "view", 1.0, "{}")); eid += 1      # embargo zone
    for h in (0, 6):                                # val side (day 10)
        rows.append((eid, t0 + dt.timedelta(days=9, hours=12 + h), 1,
                     "view", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + dt.timedelta(days=9, hours=12 + h), 3,
                     "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    r = dataprep.temporal_split_plan(df).collect()[0]
    # range = 9.75 days -> cutoff at 7.8 days: days 0..7 train (16
    # events), day 8 + embargo-zone event inside cutoff+1d embargo
    assert r.n_train == 16
    assert r.n_embargoed == 3
    assert r.n_val == 4
    assert (r.train_only_users, r.val_only_users, r.leaky_users) \
        == (1, 1, 1)
    assert r.val_user_leak_e6 == 500_000


def test_takedown_manifest_purge_reaches_zero(spark):
    """The manifest's defining property: applying the purge it
    describes (drop erased persons from the three keyed tables, drop
    lineitem rows of erased orders) and re-running the manifest must
    report ZERO affected rows everywhere; the cascade count must also
    cohere (lineitem purge keys = erased orders that have lines)."""
    from selfhealingdatapipeline_gcp_spark import catalog
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    from selfhealingdatapipeline_gcp_spark.operators import dataprep
    from pyspark.sql import functions as F

    cu, o, li, ev = [catalog.load(spark, SF_ORACLE, t)
                     for t in ("customer", "orders", "lineitem", "events")]
    before = {r.tbl: r for r in
              dataprep.takedown_manifest(cu, o, li, ev).collect()}
    assert set(before) == {"customer", "orders", "lineitem", "events"}
    assert before["customer"].n_affected > 0
    assert before["lineitem"].n_keys <= before["orders"].n_affected

    def keep(df, key):
        return df.filter(textfn.md5int(key.cast("string")) % 100 >= 5)

    eo = keep(o, F.col("o_custkey"))
    purged_li = li.join(eo.select("o_orderkey"),
                        li.l_orderkey == F.col("o_orderkey"), "left_semi")
    after = dataprep.takedown_manifest(
        keep(cu, F.col("c_custkey")), eo, purged_li,
        keep(ev, F.col("user_id"))).collect()
    assert all(r.n_affected == 0 and r.n_keys == 0 for r in after)


def test_takedown_manifest_parity(spark, duck):
    assert_parity(registry.queries()["takedown_manifest"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["takedown_manifest"])


def test_neyman_allocation_favors_high_variance_strata(spark):
    """Two equal-size strata, one constant-valued and one wide: the
    constant stratum has sd 0 so Neyman sends it (near) nothing and
    the wide stratum (almost) everything, while proportional splits
    50/50 — the gap IS the operator's value. Allocations never exceed
    the stratum size."""
    rows = [("flat", 5.00)] * 1000
    rows += [("wide", float(v)) for v in range(1000)]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    out = {r.event_type: r
           for r in dataprep.neyman_allocation_plan(
               df, sample_budget=500).collect()}
    assert out["flat"].sd_c == 0 and out["flat"].alloc_neyman == 0
    assert out["wide"].alloc_neyman == 500
    assert out["flat"].alloc_proportional == 250
    assert out["wide"].alloc_proportional == 250
    for r in out.values():
        assert r.alloc_neyman <= r.n_rows


def test_neyman_allocation_plan_parity(spark, duck):
    assert_parity(registry.queries()["neyman_allocation_plan"](
        spark, SF_ORACLE), duck,
        registry.oracle_sql()["neyman_allocation_plan"])


def test_boilerplate_fabricated_corpus(spark):
    """4 docs in one source: a 8-token banner prefixes three of them
    (count 3 = boilerplate at min_count=3); the tails are unique.
    Doc 3 is the banner alone; doc 4 is 4 unique tokens; an empty-text
    doc still counts in n_docs. Segment grain is DISJOINT 8-token
    windows, so the banner occupies exactly segment 0 of its docs."""
    banner = " ".join(f"b{i}" for i in range(8))
    rows = [
        (1, banner + " " + " ".join(f"x{i}" for i in range(8)), "en", "s1", 0),
        (2, banner + " " + " ".join(f"y{i}" for i in range(8)), "en", "s1", 0),
        (3, banner, "en", "s1", 0),
        (4, "u1 u2 u3 u4", "en", "s1", 0),
        (5, "", "en", "s1", 0),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = dataprep.boilerplate_removal_report(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 5
    assert r.n_docs_affected == 3
    assert r.total_tokens == 8 + 8 + 8 + 8 + 8 + 4   # 44
    assert r.boilerplate_tokens == 24                # 3 banner segments
    assert r.n_boilerplate_segments == 3
    assert r.boilerplate_rate_e6 == 545_454          # floor(24e6/44)


def test_boilerplate_parity(spark, duck):
    assert_parity(
        registry.queries()["boilerplate_removal_report"](spark, SF_ORACLE),
        duck, registry.oracle_sql()["boilerplate_removal_report"])
