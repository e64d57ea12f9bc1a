"""Registry entries for the corpus-curation operators
(operators/curation.py): sub-document exact-substring dedup,
SemDeDup-style semantic pruning, DSIR importance weights, bigram LM
scoring, and the two dedup capacity planners. Oracle SQL mirrors
every hash, floor, and multiplication chain of the Spark
expressions — the S-curve and Bloom constants are generated from the
SAME Python helpers on both sides so the formulas cannot drift."""

from __future__ import annotations

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import curation
from selfhealingdatapipeline_gcp_spark.registry import register
from selfhealingdatapipeline_gcp_spark.registry_data_ops import (  # noqa: F401
    _EMB_NORMED, _K_AUTO, _TOKENS, _dot, _lsh_verified_sql, _md5int)


def _t(spark, sf, *names):
    return [catalog.load(spark, sf, n) for n in names]


# ---------------------------------------------------------------------------
# dedup_substring_spans — sub-document exact dedup (k = 8 tokens)
# ---------------------------------------------------------------------------

register(
    "dedup_substring_spans",
    lambda spark, sf: curation.dedup_substring_spans(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, {_md5int('u.s')} AS h
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 6),
                 i -> {{'pos': i - 1,
                        's': array_to_string(t[i:i+7], ' ')}})) AS u
        FROM d WHERE len(t) >= 8
      )
    ), cnt AS (
      SELECT h FROM sh GROUP BY h HAVING count(*) >= 2
    ), dup AS (
      SELECT doc_id, pos FROM sh JOIN cnt USING (h)
    ), brk AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w > 8
                  THEN 1 ELSE 0 END AS brk
      FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM brk
    )
    SELECT doc_id,
           min(pos) AS span_start,
           max(pos) + 7 AS span_end,
           max(pos) - min(pos) + 8 AS span_tokens,
           count(*) AS n_dup_shingles
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
    tier="headline",
)

# ---------------------------------------------------------------------------
# semdedup_prune — cell-local greedy semantic prune list
# ---------------------------------------------------------------------------

register(
    "semdedup_prune",
    lambda spark, sf: curation.semdedup_prune(*_t(spark, sf, "embeddings")),
    # same cells grid + assignment CTE as dedup_embedding_cells (the
    # fixed-K md5int centroid pick and the floor-e6 argmax), then the
    # min-id greedy prune rule over in-cell pairs
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT {_K_AUTO}
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY CAST(floor({_dot('n.v', 'cv')} / (n.nrm * cnrm)
                               * 1000000) AS BIGINT) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), pruned AS (
      SELECT DISTINCT y.vec_id
      FROM assign x
      JOIN assign y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
      JOIN n a ON a.vec_id = x.vec_id
      JOIN n b ON b.vec_id = y.vec_id
      WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.35
    )
    SELECT e.vec_id, e.label, (p.vec_id IS NULL) AS kept
    FROM embeddings e LEFT JOIN pruned p ON e.vec_id = p.vec_id
    ORDER BY e.vec_id
    """,
    family="dedup",
    tier="headline",
)

# ---------------------------------------------------------------------------
# dsir_importance_weights — hashed-unigram importance resampling
# ---------------------------------------------------------------------------

register(
    "dsir_importance_weights",
    lambda spark, sf: curation.dsir_importance_weights(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKENS}) AS w FROM documents
    ), tb AS (
      SELECT doc_id, source, ({_md5int('w')} % 4096) AS b,
             CASE WHEN source = (SELECT min(source) FROM documents)
                  THEN 1 ELSE 0 END AS is_t
      FROM toks
    ), bc AS (
      SELECT b, CAST(sum(is_t) AS BIGINT) AS t_c,
             CAST(count(*) - sum(is_t) AS BIGINT) AS r_c
      FROM tb GROUP BY b
    ), tot AS (
      SELECT CAST(sum(t_c) AS BIGINT) AS t_tot,
             CAST(sum(r_c) AS BIGINT) AS r_tot
      FROM bc
    ), lam AS (
      SELECT b,
             CAST(floor((ln((t_c + 1) / (t_tot + 4096.0))
                         - ln((r_c + 1) / (r_tot + 4096.0))) * 1e6)
                  AS BIGINT) AS lam_micro
      FROM bc, tot
    )
    SELECT doc_id, source, count(*) AS n_tokens,
           (floor(sum(lam_micro) / 100.0) / 1e4) AS dsir_logweight
    FROM tb JOIN lam USING (b)
    GROUP BY doc_id, source
    ORDER BY doc_id
    """,
    family="dataprep",
)

# ---------------------------------------------------------------------------
# text_bigram_logprob — bigram MLE negative log-likelihood
# ---------------------------------------------------------------------------

register(
    "text_bigram_logprob",
    lambda spark, sf: curation.text_bigram_logprob(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ), big AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                 i -> {{'w1': t[i], 'w2': t[i+1]}})) AS u
        FROM d WHERE len(t) >= 2
      )
    ), uni AS (
      SELECT w1, count(*) AS c1
      FROM (SELECT unnest(t) AS w1 FROM d) GROUP BY w1
    ), bi AS (
      SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
    ), scored AS (
      SELECT doc_id,
             CAST(floor(-ln(c2 / c1) * 1e6) AS BIGINT) AS nll_micro
      FROM big JOIN bi USING (w1, w2) JOIN uni USING (w1)
    )
    SELECT doc_id, count(*) AS n_bigrams,
           (floor(sum(nll_micro) / (count(*) * 100.0)) / 1e4)
             AS avg_neg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)

# ---------------------------------------------------------------------------
# minhash_band_tuning — S-curve over the observed candidate set
# ---------------------------------------------------------------------------


def _band_combo_select(b: int, r: int) -> str:
    p = curation.band_detect_sql("s", b, r)
    n_sim = "sum(CASE WHEN s >= 0.5 THEN 1 ELSE 0 END)"
    return f"""
      SELECT CAST({b} AS INT) AS bands,
             CAST({r} AS INT) AS rows_per_band,
             count(*) AS n_candidates,
             CAST({n_sim} AS BIGINT) AS n_similar,
             CASE WHEN {n_sim} > 0 THEN
               floor(sum(CASE WHEN s >= 0.5 THEN p_micro ELSE 0 END)
                     / ({n_sim} * 100.0)) / 1e4
             END AS est_recall,
             CASE WHEN count(*) - {n_sim} > 0 THEN
               floor(sum(CASE WHEN s >= 0.5 THEN 0 ELSE p_micro END)
                     / ((count(*) - {n_sim}) * 100.0)) / 1e4
             END AS est_fp_share
      FROM (SELECT s, CAST(floor({p} * 1e6) AS BIGINT) AS p_micro
            FROM ex)
      GROUP BY 1, 2"""


register(
    "minhash_band_tuning",
    lambda spark, sf: curation.minhash_band_tuning(
        *_t(spark, sf, "documents")),
    # pairs = the LSH candidate relation with threshold 0 (all
    # verified candidates); the S-curve SQL is emitted by the SAME
    # repeated-squaring generator the Spark side uses
    f"""
    WITH pairs AS ({_lsh_verified_sql(threshold=0.0)}),
    ex AS (SELECT jaccard AS s FROM pairs)
    SELECT * FROM (
      {" UNION ALL ".join(_band_combo_select(b, r)
                          for b, r in curation.BAND_COMBOS)}
    ) ORDER BY rows_per_band
    """,
    family="dedup",
)

# ---------------------------------------------------------------------------
# bloom_size_advisor — Bloom capacity plan from the exact NDV
# ---------------------------------------------------------------------------

_BLOOM_GRID = ", ".join(
    f"(CAST({p!r} AS DOUBLE), CAST({curation.bloom_constants(p)[0]!r} "
    f"AS DOUBLE), {curation.bloom_constants(p)[1]})"
    for p in curation.BLOOM_FPPS)

register(
    "bloom_size_advisor",
    lambda spark, sf: curation.bloom_size_advisor(
        *_t(spark, sf, "documents")),
    # the bits-per-key coefficient and k are Python-computed double
    # literals inlined IDENTICALLY into both engines (repr round-trip)
    f"""
    WITH nd AS (
      SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) AS n
      FROM documents
    ), grid(fpp, c, k) AS (SELECT * FROM (VALUES {_BLOOM_GRID}))
    SELECT fpp, n AS n_distinct,
           CAST(ceil(n * c) AS BIGINT) AS m_bits,
           CAST(k AS INT) AS k_hashes,
           (floor(CAST(ceil(n * c) AS BIGINT) / 8.0 / 1048576.0 * 100)
            / 100.0) AS m_mib
    FROM nd, grid ORDER BY fpp
    """,
    family="dedup",
)

# ---------------------------------------------------------------------------
# quality_gopher_rules / quality_c4_rules — scan-stage admission filters
# ---------------------------------------------------------------------------

_GOPHER_STOPS = "['the', 'a', 'of', 'and', 'to', 'in', 'is']"

register(
    "quality_gopher_rules",
    lambda spark, sf: curation.quality_gopher_rules(
        *_t(spark, sf, "documents")),
    # every rule is integer cross-multiplication — zero doubles
    f"""
    WITH d AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n,
             CAST(coalesce(list_sum(list_transform(t, x -> length(x))),
                           0) AS BIGINT) AS chars,
             CAST(len(list_filter(t,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
               AS alpha,
             CAST(len(list_intersect(list_distinct(t),
                  {_GOPHER_STOPS})) AS BIGINT) AS stops,
             CAST(len(list_filter(t,
                  x -> x = '#' OR contains(x, '...'))) AS BIGINT) AS sym
      FROM d
    )
    SELECT doc_id, n AS n_words, chars AS n_chars_in_words,
           alpha AS n_alpha_words, stops AS n_stop_hits,
           sym AS n_symbol_words,
           (n >= 50 AND n <= 100000) AS pass_word_count,
           (chars >= 3 * n AND chars <= 10 * n) AS pass_mean_word_len,
           (5 * alpha >= 4 * n) AS pass_alpha_share,
           (stops >= 2) AS pass_stopwords,
           (10 * sym <= n) AS pass_symbol_ratio,
           ((n >= 50 AND n <= 100000)
            AND (chars >= 3 * n AND chars <= 10 * n)
            AND (5 * alpha >= 4 * n) AND (stops >= 2)
            AND (10 * sym <= n)) AS gopher_pass
    FROM m ORDER BY doc_id
    """,
)

register(
    "quality_c4_rules",
    lambda spark, sf: curation.quality_c4_rules(
        *_t(spark, sf, "documents")),
    f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_TOKENS}) AS BIGINT) AS n,
             CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)
               AS sents,
             regexp_matches(text, '[.!?]$') AS term,
             contains(lower(text), 'lorem ipsum') AS lorem,
             contains(text, '{{') AS brace
      FROM documents
    )
    SELECT doc_id, n AS n_words, sents AS n_sentences,
           term AS ends_terminal, lorem AS has_lorem_ipsum,
           brace AS has_curly_brace,
           (term AND sents >= 3 AND n >= 5
            AND NOT lorem AND NOT brace) AS c4_pass
    FROM m ORDER BY doc_id
    """,
)

# ---------------------------------------------------------------------------
# doc_winnow_fingerprints — MOSS-style winnowing selection (k=4, w=4)
# ---------------------------------------------------------------------------

register(
    "doc_winnow_fingerprints",
    lambda spark, sf: curation.doc_winnow_fingerprints(
        *_t(spark, sf, "documents")),
    # window-min via lexicographic struct min — identical tie rule
    # (smallest hash, then leftmost position) on both engines
    f"""
    WITH d AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ), g AS (
      SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
             {_md5int('u.s')} AS h,
             CAST(len(t) - 3 AS BIGINT) AS ng
      FROM (
        SELECT doc_id, t,
               unnest(list_transform(range(1, len(t) - 2),
                 i -> {{'pos': i - 1,
                        's': array_to_string(t[i:i+3], ' ')}})) AS u
        FROM d WHERE len(t) >= 7
      )
    ), wm AS (
      SELECT doc_id, pos, ng,
             min({{'h': h, 'p': pos}}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
      FROM g
    )
    SELECT DISTINCT doc_id, (m).p AS pos, (m).h AS fp_hash
    FROM wm WHERE pos <= ng - 4
    ORDER BY doc_id, pos
    """,
)

# ---------------------------------------------------------------------------
# semdedup_threshold_sweep — tuning table for semdedup_prune
# ---------------------------------------------------------------------------

register(
    "semdedup_threshold_sweep",
    lambda spark, sf: curation.semdedup_threshold_sweep(
        *_t(spark, sf, "embeddings")),
    # same cells+assign CTEs as semdedup_prune; grid LEFT join +
    # suffix-cumulative window over the 13 fixed rows
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT {_K_AUTO}
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY CAST(floor({_dot('n.v', 'cv')} / (n.nrm * cnrm)
                               * 1000000) AS BIGINT) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), p AS (
      SELECT y.vec_id AS vec_b,
             CAST(round(round({_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 6)
                        * 1e6) AS BIGINT) AS cos_e6
      FROM assign x
      JOIN assign y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
      JOIN n a ON a.vec_id = x.vec_id
      JOIN n b ON b.vec_id = y.vec_id
      WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.35
    ), pair_b AS (
      SELECT least(CAST(floor((cos_e6 - 350000) / 50000.0) AS BIGINT),
                   12) AS idx,
             count(*) AS np
      FROM p GROUP BY 1
    ), vec_b AS (
      SELECT least(CAST(floor((cos_e6 - 350000) / 50000.0) AS BIGINT),
                   12) AS idx,
             count(*) AS nv
      FROM (SELECT vec_b, max(cos_e6) AS cos_e6 FROM p GROUP BY vec_b)
      GROUP BY 1
    ), total AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total FROM embeddings
    ), grid AS (
      SELECT CAST(u.i AS BIGINT) AS idx,
             CAST(350000 + u.i * 50000 AS BIGINT) AS threshold_e6
      FROM (SELECT unnest(range(0, 13)) AS i) u
    ), j AS (
      SELECT grid.idx, grid.threshold_e6,
             coalesce(np, 0) AS np, coalesce(nv, 0) AS nv
      FROM grid LEFT JOIN pair_b USING (idx) LEFT JOIN vec_b USING (idx)
    )
    SELECT threshold_e6,
           CAST(sum(np) OVER w AS BIGINT) AS n_pairs,
           CAST(sum(nv) OVER w AS BIGINT) AS n_pruned,
           CAST(floor(sum(nv) OVER w * 1e6 / n_total) AS BIGINT)
             AS prune_rate_e6
    FROM j, total
    WINDOW w AS (ORDER BY idx DESC ROWS UNBOUNDED PRECEDING)
    ORDER BY threshold_e6
    """,
    family="dedup",
)
