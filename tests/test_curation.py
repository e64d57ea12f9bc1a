"""Corpus-curation operators (operators/curation.py): oracle parity
on the sf0.01 tables plus hand-built semantic cases for the span
merge, the prune rule, the importance-weight ordering, and the two
capacity planners' closed forms."""

from __future__ import annotations

import math

import pytest
from conftest import SF_ORACLE, assert_parity

from selfhealingdatapipeline_gcp_spark import registry
from selfhealingdatapipeline_gcp_spark.operators import curation

NAMES = ("dedup_substring_spans", "semdedup_prune",
         "dsir_importance_weights", "text_bigram_logprob",
         "minhash_band_tuning", "bloom_size_advisor")


@pytest.mark.parametrize("name", NAMES)
def test_parity(name, spark, duck):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_parity(q(spark, SF_ORACLE), duck, sql)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_substring_spans_planted_duplicate(spark):
    """Two docs sharing a 10-token run: every position whose 8-token
    shingle falls inside the shared run is marked, and the marked
    positions merge into ONE maximal span per doc."""
    shared = "a b c d e f g h i j"          # 10 tokens → 3 dup shingles
    d = _docs(spark, [
        f"{shared} unique1 tail1 xx yy",
        f"lead2 zz {shared} unique2",
        "short doc only",                    # < 8 tokens → no rows
    ])
    out = {r.doc_id: r for r in
           curation.dedup_substring_spans(d).collect()}
    assert set(out) == {0, 1}
    # doc 0: run starts at position 0, 3 shingle starts (0,1,2),
    # span covers tokens 0..9
    assert (out[0].span_start, out[0].span_end,
            out[0].span_tokens, out[0].n_dup_shingles) == (0, 9, 10, 3)
    # doc 1: run starts at position 2 → span 2..11
    assert (out[1].span_start, out[1].span_end,
            out[1].span_tokens, out[1].n_dup_shingles) == (2, 11, 10, 3)


def test_substring_spans_merges_adjacent_islands(spark):
    """Two dup runs separated by > k tokens stay SEPARATE spans."""
    run1 = "a b c d e f g h"                 # 8 tokens, 1 shingle
    run2 = "p q r s t u v w"
    gap = " ".join(f"g{i}" for i in range(12))
    d = _docs(spark, [
        f"{run1} {gap} {run2}",
        f"{run1} x1 x2 x3 {run2}",           # repeats both runs
    ])
    rows = curation.dedup_substring_spans(d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 2               # far apart → two islands
    assert [r.span_tokens for r in by_doc[0]] == [8, 8]


def test_semdedup_prune_is_total_and_min_id_kept(spark):
    out = registry.queries()["semdedup_prune"](spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == 500                   # one row per vector
    assert len({r.vec_id for r in rows}) == 500
    # the globally smallest vec_id can never have a smaller-id
    # partner → always kept
    assert min(rows, key=lambda r: r.vec_id).kept is True
    # the prune rule fires on this corpus (planted near-dups exist)
    assert any(not r.kept for r in rows)


def test_dsir_separates_disjoint_vocabularies(spark):
    """Docs written purely in target-slice vocabulary must outweigh
    docs written purely in raw-slice vocabulary (the defining DSIR
    property); source 'a' (lexicographically smallest) is target."""
    tgt_text = "alpha beta gamma delta " * 8
    raw_text = "omega psi chi phi " * 8
    d = spark.createDataFrame(
        [(1, tgt_text.strip(), "en", "a", 1),
         (2, tgt_text.strip(), "en", "a", 1),
         (3, raw_text.strip(), "en", "b", 1),
         (4, raw_text.strip(), "en", "b", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    w = {r.doc_id: r.dsir_logweight
         for r in curation.dsir_importance_weights(d).collect()}
    assert w[1] > 0 > w[3]
    assert w[1] == w[2] and w[3] == w[4]


def test_bigram_logprob_hand_case(spark):
    """Corpus 'a b' + 'a c': c(a)=2, c(a,b)=1 → nll(a b) = ln 2."""
    d = _docs(spark, ["a b", "a c"])
    rows = {r.doc_id: r for r in
            curation.text_bigram_logprob(d).collect()}
    expect = math.floor(math.floor(math.log(2) * 1e6) / 100.0) / 1e4
    assert rows[0].n_bigrams == 1
    assert rows[0].avg_neg_logprob == expect
    assert rows[1].avg_neg_logprob == expect


def test_band_tuning_recall_monotone_in_rows(spark):
    """For a fixed 32-hash budget, detection probability is pointwise
    decreasing in rows-per-band — so est_recall must be non-increasing
    and (32,1) must dominate."""
    out = (registry.queries()["minhash_band_tuning"](spark, SF_ORACLE)
           .collect())
    assert [r.rows_per_band for r in out] == [1, 2, 4, 8, 16, 32]
    recalls = [r.est_recall for r in out if r.est_recall is not None]
    assert recalls == sorted(recalls, reverse=True)
    fps = [r.est_fp_share for r in out if r.est_fp_share is not None]
    assert fps == sorted(fps, reverse=True)
    assert all(r.n_candidates == out[0].n_candidates for r in out)


def test_bloom_advisor_closed_form(spark, duck):
    out = (registry.queries()["bloom_size_advisor"](spark, SF_ORACLE)
           .collect())
    n = duck.execute(
        "SELECT count(DISTINCT md5(text)) FROM documents").fetchone()[0]
    assert [r.fpp for r in out] == sorted(curation.BLOOM_FPPS)
    for r in out:
        c, k = curation.bloom_constants(r.fpp)
        assert r.n_distinct == n
        assert r.m_bits == math.ceil(n * c)
        assert r.k_hashes == k
    # tighter fpp → strictly more bits
    bits = [r.m_bits for r in out]
    assert bits == sorted(bits, reverse=True)


def test_pow2_chain_matches_pow():
    for e in (1, 2, 4, 8, 16, 32):
        assert curation._pow2_chain(3.0, e) == 3.0 ** e
        sql = curation._pow2_chain_sql("3.0", e)
        assert eval(sql.replace(" ", "")) == 3.0 ** e  # noqa: S307
