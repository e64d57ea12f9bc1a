"""Property tests for the determinism-critical primitives
(SURVEY §3): exact money arithmetic, truncation semantics, healer
rule stability, and as-of join correctness against a reference
implementation."""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.plans import healer


@given(st.integers(min_value=-10**12, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_cents_roundtrip_pure(c):
    """For any integer cents value c, the double c/100 converts back
    to exactly c via round(x*100) — the invariant money.cents relies
    on (float error of 2-decimal values is ≪ 0.5 cents)."""
    x = c / 100.0
    assert round(x * 100) == c


@given(st.floats(min_value=-1e9, max_value=1e9,
                 allow_nan=False, allow_infinity=False))
@settings(max_examples=300, deadline=None)
def test_trunc_is_floor_pure(x):
    """floor(x·1e4)/1e4 never exceeds x and differs < 1e-4 — the
    truncation contract both engines satisfy identically."""
    t = math.floor(x * 1e4) / 1e4
    assert t <= x + 1e-12
    assert x - t <= 1e-4 * (1 + 1e-9) + abs(x) * 1e-12


@given(st.text(min_size=0, max_size=500))
@settings(max_examples=200, deadline=None)
def test_healer_total_and_stable(log):
    """analyze_error is total (never raises) and deterministic."""
    f1 = healer.analyze_error(log)
    f2 = healer.analyze_error(log)
    assert f1.fix_type in ("CODE", "CONFIG", "RETRY", "MANUAL")
    assert (f1.fix_type, f1.root_cause) == (f2.fix_type, f2.root_cause)


def test_money_cents_batch(spark):
    """Spark-side cents() recovers exact integers for a batch of
    random 2-decimal money values (single job, not per-example)."""
    from selfhealingdatapipeline_gcp_spark.functions import money
    rng = random.Random(7)
    cents_vals = [rng.randint(-10**10, 10**10) for _ in range(2000)]
    df = spark.createDataFrame(
        [(c, c / 100.0) for c in cents_vals], "c long, x double")
    bad = df.filter(money.cents(F.col("x")) != F.col("c")).count()
    assert bad == 0


def test_asof_join_matches_reference(spark):
    """asof_join against a brute-force pandas reference on random
    data: for every left row, the attached right row must be the
    max right_ts strictly before left_ts within the key."""
    import pandas as pd

    from selfhealingdatapipeline_gcp_spark.operators.asof import asof_join

    rng = random.Random(13)
    left = [(i, rng.randint(0, 20), rng.randint(0, 10**6))
            for i in range(400)]
    right = [(j, rng.randint(0, 20), rng.randint(0, 10**6))
             for j in range(400)]
    ldf = spark.createDataFrame(left, "lid long, k long, lts long")
    rdf = spark.createDataFrame(right, "rid long, k long, rts long")
    out = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                    right_cols=("rts", "rid"))
    got = {r.lid: (r.asof_rts, r.asof_rid) for r in out.collect()}

    rpd = pd.DataFrame(right, columns=["rid", "k", "rts"])
    for lid, k, lts in left:
        cand = rpd[(rpd.k == k) & (rpd.rts < lts)]
        if cand.empty:
            assert got[lid] == (None, None), lid
        else:
            best_ts = cand.rts.max()
            assert got[lid][0] == best_ts, lid
            # tie on rts: the carried rid is one of the max-ts rows
            assert got[lid][1] in set(cand[cand.rts == best_ts].rid), lid


def test_split_and_sample_deterministic_batch(spark):
    """Hash-split and stratified-sample decisions are pure functions
    of the row: permuting input order never changes any assignment
    (the retry-stability contract at 100 TB)."""
    from selfhealingdatapipeline_gcp_spark.operators import dataprep
    rng = random.Random(11)
    rows = [(i, f"src{rng.randint(0, 5)}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    shuffled = spark.createDataFrame(
        sorted(rows, key=lambda r: hash((r[0] * 7919) % 1001)),
        "doc_id long, source string")
    a = {r.doc_id: r.split for r in dataprep.train_val_split(df).collect()}
    b = {r.doc_id: r.split
         for r in dataprep.train_val_split(shuffled).collect()}
    assert a == b
    sa = {r.doc_id for r in dataprep.stratified_sample(df).collect()}
    sb = {r.doc_id for r in dataprep.stratified_sample(shuffled).collect()}
    assert sa == sb
    # ~10% val / ~20% sample within hash-noise bounds at n=3000
    n_val = sum(1 for s in a.values() if s == "val")
    assert 0.07 < n_val / len(a) < 0.13
    assert 0.16 < len(sa) / len(rows) < 0.24


@given(st.lists(st.floats(min_value=-100.0, max_value=100.0,
                          allow_nan=False, width=32),
                min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_quantize_math_pure(vec):
    """The int8 quantization arithmetic (pure twin of
    dataprep.vector_quantize): |q8| <= 127 and reconstruction error
    <= one quantization step for any vector."""
    scale = max(abs(x) for x in vec)
    for x in vec:
        q = math.floor(x / scale * 127) if scale > 0 else 0
        assert -128 <= q <= 127
        if scale > 0:
            assert abs(x - q / 127 * scale) <= scale / 127 * (1 + 1e-9)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_pii_placeholder_free_pure(text):
    """No ASCII input can smuggle a pre-existing placeholder through
    the redaction counts: the patterns never match the placeholder
    tokens themselves (idempotence precondition)."""
    import re
    from selfhealingdatapipeline_gcp_spark.operators.dataprep import (
        PII_PATTERNS)
    red = text
    for kind in ("card", "phone", "email"):
        red = re.sub(PII_PATTERNS[kind], f"<{kind.upper()}>", red)
    # second pass changes nothing: replacements are fixpoints
    red2 = red
    for kind in ("card", "phone", "email"):
        red2 = re.sub(PII_PATTERNS[kind], f"<{kind.upper()}>", red2)
    assert red == red2


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_pagerank_reference_pure(edge_list):
    """Pure-python integer power iteration must equal the DataFrame
    plan's arithmetic contract: floor per-edge contribution, base
    150000, 3 rounds — verified here against random graphs with
    self-loops/duplicates allowed (the operator's semantics, not a
    float approximation)."""
    edges = [(a, b) for a, b in edge_list]
    nodes = sorted({x for e in edges for x in e} | set(range(3)))
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    mass = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for a, b in edges:
            inc[b] += (mass[a] * 85) // (out_deg[a] * 100)
        mass = {n: 150_000 + inc[n] for n in nodes}
    # invariants the Spark/SQL forms rely on
    assert all(m >= 150_000 for m in mass.values())
    assert sum(mass.values()) <= len(nodes) * 1_000_000 + 1


def test_pagerank_edges_matches_pure_reference(spark):
    """The Spark pagerank_edges plan equals the integer reference on a
    random graph (single job, not per-example)."""
    from selfhealingdatapipeline_gcp_spark.operators import graph

    rng = random.Random(11)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    nodes = list(range(n))
    out_deg = {}
    for a, _ in edges:
        out_deg[a] = out_deg.get(a, 0) + 1
    mass = {v: 1_000_000 for v in nodes}
    for _ in range(3):
        inc = {v: 0 for v in nodes}
        for a, b in edges:
            inc[b] += (mass[a] * 85) // (out_deg[a] * 100)
        mass = {v: 150_000 + inc[v] for v in nodes}
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pagerank_e6
           for r in graph.pagerank_edges(ndf, edf).collect()}
    assert got == mass


@given(st.lists(st.integers(1, 5000), min_size=1, max_size=80))
@settings(max_examples=100, deadline=None)
def test_seq_pack_rule_pure(token_counts):
    """The packing rule (pack = cum_before // budget): ids start at 0
    and never decrease; an id can only JUMP when the previous doc
    spanned multiple budget windows (jump ≤ its window count); and a
    doc's pack is a pure function of the tokens before it — the
    loader-facing contract. (Contiguity deliberately NOT claimed: an
    oversize doc legitimately skips pack ids.)"""
    budget = 2048
    cum = 0
    packs = []
    for t in token_counts:
        packs.append(cum // budget)
        cum += t
    assert packs[0] == 0
    assert packs == sorted(packs)
    for (p1, t1), p2 in zip(zip(packs, token_counts), packs[1:]):
        assert p2 - p1 <= t1 // budget + 1


@given(st.integers(min_value=0, max_value=5000))
@settings(max_examples=300, deadline=None)
def test_chunk_plan_tiling_pure(n_tokens):
    """The doc_chunk_plan arithmetic (64-token chunks, stride 48)
    tiles ANY document length: chunks cover [0, n_tokens) exactly,
    overlap consecutive chunks by 16, and never emit an empty middle
    chunk — the pure-integer invariant behind the operator."""
    chunk, stride = 64, 48
    n_chunks = max(1, math.floor((n_tokens - 16 + 47) / 48.0))
    spans = []
    for i in range(n_chunks):
        start = i * stride
        end = min(start + chunk, n_tokens)
        spans.append((start, max(end - start, 0)))
    # first starts at 0; last ends at n_tokens (or the doc is empty)
    assert spans[0][0] == 0
    last_start, last_len = spans[-1]
    assert last_start + last_len == n_tokens or n_tokens == 0
    # coverage: every token position falls in >= 1 chunk
    covered = set()
    for start, ln in spans:
        covered.update(range(start, start + ln))
    assert covered == set(range(n_tokens))
    # middle chunks are always full-stride advances
    for (a, _), (b, _) in zip(spans, spans[1:]):
        assert b - a == stride


@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=200))
@settings(max_examples=300, deadline=None)
def test_cusum_closed_form_equals_recursion_pure(xs):
    """cum − min(0, running_min(cum)) == the textbook one-sided CUSUM
    recursion for ANY integer series and drift floor — the identity
    event_rate_cusum's windowed plan rests on."""
    mean = sum(xs) / len(xs)
    var = (sum(x * x for x in xs) - sum(xs) * mean) / len(xs)
    drift = math.floor(mean + 0.5 * math.sqrt(max(var, 0.0)))
    s = 0
    cum = 0
    run_min = 0
    for x in xs:
        s = max(0, s + x - drift)           # recursion
        cum += x - drift                    # closed form
        run_min = min(run_min, cum)
        assert s == cum - run_min


@given(st.lists(st.integers(min_value=0, max_value=100),
                min_size=16, max_size=16))
@settings(max_examples=300, deadline=None)
def test_ahash_above_mean_bit_rule_pure(counts):
    """The aHash bit rule (count·16 > total) sets a bit for strictly-
    above-mean buckets only, and never sets all 16 bits (some bucket
    is always ≤ the mean) — the signature can't saturate."""
    total = sum(counts)
    bits = [1 if c * 16 > total else 0 for c in counts]
    for c, b in zip(counts, bits):
        assert b == (c > total / 16)
    assert sum(bits) < 16


# ---------------------------------------------------------------------------
# round-10 continuation: curation/eval integer disciplines
# ---------------------------------------------------------------------------

@given(st.integers(min_value=1, max_value=10))
@settings(max_examples=50, deadline=None)
def test_ndcg_weights_shape(k):
    """Weights are positive, strictly decreasing integers; prefix
    sums strictly increase — the bigint-DCG precondition."""
    from selfhealingdatapipeline_gcp_spark.operators.similarity import (
        ndcg_weights)
    ws, prefix = ndcg_weights(k)
    assert len(ws) == k and len(prefix) == k + 1
    assert all(isinstance(w, int) and w > 0 for w in ws)
    assert all(a > b for a, b in zip(ws, ws[1:]))
    assert prefix[0] == 0 and all(
        prefix[i + 1] - prefix[i] == ws[i] for i in range(k))


@given(st.sets(st.integers(min_value=1, max_value=5), max_size=5))
@settings(max_examples=300, deadline=None)
def test_ndcg_bounded_by_ideal(ranks):
    """For ANY set of relevant ranks with |ranks| <= R, the e6 nDCG
    floor((Σ w[rank])·1e6 / prefix[R]) lands in [0, 1e6] — the
    invariant that makes the per-label mean a share."""
    from selfhealingdatapipeline_gcp_spark.operators.similarity import (
        ndcg_weights)
    ws, prefix = ndcg_weights(5)
    r_avail = max(len(ranks), 1)
    dcg = sum(ws[r - 1] for r in ranks)
    idcg = prefix[r_avail]
    ndcg_e6 = dcg * 10**6 // idcg
    assert 0 <= ndcg_e6 <= 10**6


@given(st.lists(st.integers(min_value=1, max_value=10**9),
                min_size=1, max_size=60))
@settings(max_examples=300, deadline=None)
def test_gini_rank_formula_bounds(freqs):
    """The token_gini integer numerator Σ(2r−T−1)·n_r over
    ascending-sorted frequencies is >= 0 and < T·Σn — so gini_e6
    lands in [0, 1e6)."""
    ns = sorted(freqs)
    t, s = len(ns), sum(ns)
    num = sum((2 * (i + 1) - t - 1) * n for i, n in enumerate(ns))
    assert 0 <= num < t * s
    g = math.floor(num / (t * s) * 1e6)
    assert 0 <= g < 10**6
    if len(set(ns)) == 1:
        assert num == 0              # perfectly equal → Gini 0


@given(st.integers(min_value=1, max_value=10**7),
       st.integers(min_value=1, max_value=20))
@settings(max_examples=300, deadline=None)
def test_bucket_div_total_and_monotone(hi, nb):
    """bucket = id·nb DIV hi for id in [0, hi) always lands in
    [0, nb) and is monotone in id — the corpus_novelty_curve /
    heaps_law_fit bucketing contract."""
    ids = sorted({0, hi - 1, hi // 2, hi // 3, min(hi - 1, 12345)})
    buckets = [(i * nb) // hi for i in ids]
    assert all(0 <= b < nb for b in buckets)
    assert buckets == sorted(buckets)


@given(st.integers(min_value=0, max_value=10**6),
       st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_sample_size_fpc_never_exceeds_raw(n_pass, n_docs):
    """ceil-FPC is <= the asymptotic n and <= N+1 for any observed
    pass rate — the sample_size_calculator contract."""
    from selfhealingdatapipeline_gcp_spark.operators.curation import (
        CI_HALF_WIDTHS, ci_coefficient)
    n_pass = min(n_pass, n_docs)
    p = n_pass / n_docs
    for w in CI_HALF_WIDTHS:
        n_req = math.ceil(ci_coefficient(w) * p * (1 - p))
        if n_req > 0:
            n_fpc = math.ceil(n_req / (1 + (n_req - 1) / n_docs))
        else:
            n_fpc = 0                 # the operator's degenerate rule
        assert n_fpc <= max(n_req, 1)
        assert n_fpc <= n_docs + 1
