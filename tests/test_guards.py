"""Round-4 regression tests: catalog timestamp normalization across
testdata vintages, and the dedup fan-out guards (VERDICT r3 #2/#4/#5).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import dedup

from conftest import SF_ORACLE


# ---------------------------------------------------------------------------
# catalog.load must yield TIMESTAMP for every parquet vintage the
# driver has shipped: TIMESTAMP(NANOS) (read as bigint under
# nanosAsLong) and TIMESTAMP(MICROS) isAdjustedToUTC=false (read as
# TIMESTAMP_NTZ by Spark 4). The testdata changed shape twice between
# rounds; don't get caught a third time.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("vintage", ["nanos", "ntz_micros", "micros_utc"])
def test_catalog_load_ts_is_timestamp_for_any_vintage(spark, tmp_path, vintage):
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    if vintage == "nanos":
        arr = pa.array([m * 1000 for m in micros],
                       type=pa.timestamp("ns"))
    elif vintage == "ntz_micros":
        arr = pa.array(micros, type=pa.timestamp("us"))
    else:
        arr = pa.array(micros, type=pa.timestamp("us", tz="UTC"))
    table = pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "ts": arr,
    })
    pq.write_table(table, os.path.join(tmp_path, "events.parquet"))

    df = catalog.load(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"vintage={vintage}: expected timestamp, got {dict(df.dtypes)['ts']}")
    got = [r.ts.isoformat() for r in
           df.orderBy("event_id").select("ts").collect()]
    # value-preserving under the pinned UTC session tz (nanos floor to
    # micros exactly like DuckDB's TIMESTAMP_NS -> TIMESTAMP cast)
    assert got == ["2023-11-14T22:13:20", "2023-11-14T22:15:23.456789"]


def test_catalog_load_real_testdata_ts_is_timestamp(spark):
    df = catalog.load(spark, SF_ORACLE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard df ceiling: a corpus-common trigram must not
# drive a quadratic self-join fan-out.
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in rows])


def test_ngram_jaccard_df_ceiling_drops_ubiquitous_shingle(spark):
    # 40 documents all sharing one ubiquitous trigram, otherwise
    # unique; plus one genuine near-dup pair (docs 100/101).
    common = "terms of service"
    rows = [(i, f"{common} unique{i}a unique{i}b unique{i}c unique{i}d")
            for i in range(40)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta"),
        (101, "alpha beta gamma delta epsilon eta"),
    ]
    docs = _docs(spark, rows)

    out = dedup.dedup_ngram_jaccard(docs, threshold=0.5, max_df=5)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    # the near-dup pair survives (its shingles are rare) ...
    assert (100, 101) in pairs
    # ... and no pair exists only via the ubiquitous trigram
    assert all(a >= 100 for a, _ in pairs), pairs

    # the ubiquitous shingle must be FILTERED before the self-join:
    # count the join-input rows contributed per shingle hash
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    sh = (
        dedup._shingle_rows(docs)
        .select("doc_id", textfn.md5int(F.col("s")).alias("h"))
        .dropDuplicates(["doc_id", "h"])
        .groupBy("h").count()
    )
    assert sh.agg(F.max("count")).first()[0] == 40  # skew exists pre-filter


def test_ngram_jaccard_unfiltered_mode_still_available(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
    ]
    out = dedup.dedup_ngram_jaccard(_docs(spark, rows), max_df=None)
    assert {(r.doc_a, r.doc_b) for r in out.collect()} == {(1, 2)}


def test_ngram_jaccard_default_ceiling_inert_on_driver_tables(spark, duck):
    """max_df=10000 never fires at driver scale (<= 5000 docs), so the
    guarded default stays oracle-exact (the oracle mirrors the filter
    anyway; this asserts the guarded and unfiltered plans agree)."""
    docs = catalog.load(spark, SF_ORACLE, "documents")
    guarded = dedup.dedup_ngram_jaccard(docs).collect()
    exact = dedup.dedup_ngram_jaccard(docs, max_df=None).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, exact))


# ---------------------------------------------------------------------------
# dedup_simhash bucket cap: a skewed corpus auto-routes to the 4-window
# multitable split (VERDICT r9 #2); force_single_table restores the old
# loud raise instead of launching a quadratic in-bucket join.
# ---------------------------------------------------------------------------

def test_simhash_auto_routes_on_skewed_corpus(spark):
    # 30 near-identical docs -> one simhash top-byte bucket; cap at 10
    rows = [(i, f"lorem ipsum dolor sit amet consectetur adipiscing v{i % 2}")
            for i in range(30)]
    docs = _docs(spark, rows)
    out = dedup.dedup_simhash(docs, max_bucket_rows=10).collect()
    # routed: same schema, sentinel bucket, candidate set == multitable's
    assert out, "skewed corpus must still produce near-dup pairs"
    assert all(r.bucket == -1 for r in out)
    mt = dedup.dedup_simhash_multitable(docs).collect()
    assert ({(r.doc_a, r.doc_b, r.hamming) for r in out}
            == {(r.doc_a, r.doc_b, r.hamming) for r in mt})


def test_simhash_force_single_table_still_raises(spark):
    rows = [(i, f"lorem ipsum dolor sit amet consectetur adipiscing v{i % 2}")
            for i in range(30)]
    out = dedup.dedup_simhash(_docs(spark, rows), max_bucket_rows=10,
                              force_single_table=True)
    with pytest.raises(Exception, match="max_bucket_rows"):
        out.collect()


def test_simhash_guard_inert_below_cap(spark):
    rows = [(1, "alpha beta gamma delta"),
            (2, "alpha beta gamma zeta"),
            (3, "totally different words here now")]
    docs = _docs(spark, rows)
    guarded = dedup.dedup_simhash(docs).collect()
    unguarded = dedup.dedup_simhash(docs, max_bucket_rows=None).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, unguarded))


def test_component_labels_converges_on_long_chain(spark):
    """r10 regression: GENERATED sf1 embeddings chain template→donor
    into near-dup paths longer than 2^15 hops, which blew the old
    max_iterations=15 cap. Pointer doubling over a diameter-40k path
    must converge (≈16 rounds) under the raised 25-round cap, and
    every node must land on the chain's min id."""
    n = 40_000
    edges = spark.range(n - 1).selectExpr(
        "id AS doc_a", "id + 1 AS doc_b")
    labels = dedup.component_labels(edges)
    agg = labels.agg(
        F.countDistinct("label").alias("n_labels"),
        F.max("label").alias("max_label"),
        F.count(F.lit(1)).alias("n_nodes")).first()
    assert (agg.n_labels, agg.max_label, agg.n_nodes) == (1, 0, n)


def test_dedup_clusters_accepts_external_edges(spark):
    """dedup_clusters composes with any candidate generator: feeding
    an explicit edge list produces the expected components."""
    from pyspark.sql import Row
    edges = spark.createDataFrame([
        Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3),   # {1,2,3}
        Row(doc_a=10, doc_b=11),                        # {10,11}
    ])
    out = dedup.dedup_clusters(None, edges=edges).collect()
    got = {(r.cluster_id, r.cluster_size, r.keeper_doc_id) for r in out}
    assert got == {(1, 3, 1), (10, 2, 10)}


def test_dedup_clusters_chain_graph_converges(spark):
    """A diameter-3000 chain (serial near-dup boilerplate) must
    converge inside the default round budget — pointer doubling makes
    rounds logarithmic in diameter, where plain propagation would
    need ~3000 rounds."""
    from pyspark.sql import functions as F
    from selfhealingdatapipeline_gcp_spark.operators import dedup
    edges = spark.range(3000).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    out = dedup.dedup_clusters(None, edges=edges).collect()
    assert len(out) == 1
    assert out[0].cluster_size == 3001
    assert out[0].keeper_doc_id == 0
    assert out[0].cluster_id == 0


def test_dedup_clusters_10k_path_converges_in_log_rounds(spark):
    """VERDICT r5 #2's acceptance case: a fabricated 10k-node PATH
    graph (diameter 9999 — the chained-boilerplate shape LSH
    candidate chains produce) must cluster within ~14 rounds
    (log2(10000) ≈ 13.3) under the default budget, cross-checked
    against union-find. Pointer doubling makes rounds logarithmic in
    diameter — measured, not asserted: with max_iterations=15 this
    converges; plain propagation would need 9999 rounds."""
    from pyspark.sql import functions as F
    from selfhealingdatapipeline_gcp_spark.operators import dedup

    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")  # test speed
    try:
        edges = spark.range(9999).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
        out = dedup.dedup_clusters(None, edges=edges,
                                   max_iterations=15).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    # union-find on a path: one component of all 10k nodes, keeper 0
    assert len(out) == 1
    assert out[0].cluster_size == 10000
    assert out[0].keeper_doc_id == 0 and out[0].cluster_id == 0


def test_dedup_clusters_nonconvergence_raises(spark, monkeypatch):
    """Exhausting max_iterations must fail loudly, never silently
    emit partial components. The guard lives in the DISTRIBUTED
    pointer-doubling loop — the r10 driver fast path is a one-pass
    exact union-find with no iteration cap (it cannot fail to
    converge), so pin the distributed leg via the edge cap."""
    import pytest
    from pyspark.sql import functions as F
    from selfhealingdatapipeline_gcp_spark.operators import dedup
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGE_CAP", "0")
    edges = spark.range(3000).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(None, edges=edges, max_iterations=3)


def test_cross_source_overlap_hot_shingle_bounded(spark):
    """A shingle present in EVERY source cannot blow up pair
    emission: the bucket emits C(|sources|, 2) pairs regardless of
    how many documents carry it — the boundedness claim in the
    operator's docstring, fabricated directly."""
    from selfhealingdatapipeline_gcp_spark.operators import dedup

    # 200 docs, 20 sources, all sharing one trigram + a per-source one
    rows = [(i, f"alpha beta gamma uniq{i % 20} tail{i % 20} end{i % 20}",
             f"s{i % 20:02d}")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    out = dedup.cross_source_overlap(docs).collect()
    # every source pair shares the hot shingles -> exactly C(20,2)
    assert len(out) == 190
    for r in out:
        assert r.shared_shingles <= min(r.n_a, r.n_b)
