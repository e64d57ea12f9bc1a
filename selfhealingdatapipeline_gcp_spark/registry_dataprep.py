"""Registry entries for the training-data-prep operators
(operators/dataprep.py). Oracle SQL mirrors every hash, floor, and
threshold — splits/samples are md5-deterministic so DuckDB reproduces
them exactly."""

from __future__ import annotations

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import dataprep
from selfhealingdatapipeline_gcp_spark.registry import register
from selfhealingdatapipeline_gcp_spark.registry_data_ops import (
    _md5int, _SHINGLES, _STOPS, _TOKENS)


def _t(spark, sf, *names):
    return [catalog.load(spark, sf, n) for n in names]


register(
    "train_val_split",
    lambda spark, sf: dataprep.train_val_split(*_t(spark, sf, "documents")),
    f"""
    SELECT doc_id,
           ({_md5int('CAST(doc_id AS VARCHAR)')} % 100) AS bucket,
           CASE WHEN {_md5int('CAST(doc_id AS VARCHAR)')} % 100 < 10
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)

register(
    "stratified_sample",
    lambda spark, sf: dataprep.stratified_sample(
        *_t(spark, sf, "documents")),
    f"""
    SELECT doc_id, source AS stratum
    FROM documents
    WHERE {_md5int("source || '|' || CAST(doc_id AS VARCHAR)")} % 10000 < 2000
    """,
)

register(
    "source_mixing_plan",
    lambda spark, sf: dataprep.source_mixing_plan(
        *_t(spark, sf, "documents"), target_total=200),
    """
    WITH per AS (
      SELECT source AS stratum, count(*) AS n_docs FROM documents GROUP BY 1
    ), w AS (
      SELECT stratum, n_docs, count(*) OVER () AS n_strata FROM per
    )
    SELECT stratum, n_docs,
           CAST(floor(200 / n_strata) AS BIGINT) AS target_docs,
           (floor((least(1.0, floor(200 / n_strata) / n_docs)) * 10000.0)
            / 10000.0) AS sample_rate,
           (n_docs < floor(200 / n_strata)) AS is_deficit
    FROM w
    """,
)

register(
    # train = 90% of docs, eval = doc_id % 10 == 0 — the standard
    # n-gram-overlap decontamination check over that split
    "contamination_check",
    lambda spark, sf: dataprep.contamination_check(
        catalog.load(spark, sf, "documents").filter("doc_id % 10 != 0"),
        catalog.load(spark, sf, "documents").filter("doc_id % 10 = 0")),
    f"""
    WITH tr AS (
      SELECT DISTINCT {_md5int('unnest(s)')} AS h
      FROM (
        SELECT {_SHINGLES} AS s
        FROM (SELECT {_TOKENS} AS t FROM documents WHERE doc_id % 10 != 0)
        WHERE len({_SHINGLES}) > 0
      )
    ), ev AS (
      SELECT DISTINCT doc_id, {_md5int('unnest(s)')} AS h
      FROM (
        SELECT doc_id, {_SHINGLES} AS s
        FROM (SELECT doc_id, {_TOKENS} AS t FROM documents
              WHERE doc_id % 10 = 0)
        WHERE len({_SHINGLES}) > 0
      )
    ), agg AS (
      SELECT ev.doc_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contaminated
      FROM ev LEFT JOIN tr ON ev.h = tr.h
      GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_contaminated,
           (floor((n_contaminated * 1.0 / n_shingles) * 1000000.0)
            / 1000000.0) AS contamination_rate,
           (n_contaminated * 1.0 / n_shingles >= 0.5) AS is_contaminated
    FROM agg
    """,
)

# NON-distinct shingle list (repetition needs duplicates)
_SHINGLES_ALL = ("list_transform(range(1, greatest(len(t) - 2, 0) + 1), "
                 "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])")

register(
    "repetition_score",
    lambda spark, sf: dataprep.repetition_score(*_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_ALL} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES_ALL}) > 0
    ), agg AS (
      SELECT doc_id, len(s) AS n_shingles,
             len(list_distinct(list_transform(s, g -> {_md5int('g')})))
               AS n_distinct
      FROM sh
    )
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           (floor((1.0 - n_distinct * 1.0 / n_shingles) * 1000000.0)
            / 1000000.0) AS repetition_ratio,
           (1.0 - n_distinct * 1.0 / n_shingles > 0.2) AS is_repetitive
    FROM agg
    """,
)

# Shared with the drop_reason_matrix oracle below.
_QFP_SQL = f"""
    WITH toks AS (
      SELECT doc_id, len(t) AS n_tokens,
             list_reduce([CAST(0 AS BIGINT)] ||
                         list_transform(t, x -> length(x)::BIGINT),
                         (a, x) -> a + x) AS sum_len,
             len(list_filter(t, x -> list_contains({_STOPS}, x))) AS n_stop,
             {_SHINGLES_ALL} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len(t) > 0
    ), rep AS (
      -- e6-truncate FIRST, mirroring the Spark side exactly: the
      -- operator consumes repetition_score's floor-e6 value and only
      -- then floor-e4s for output. Flooring the raw double at e4
      -- directly diverges at ratio boundaries (r10, generated sf10:
      -- 62/80 distinct shingles -> raw*1e4 rounds up to exactly
      -- 2250.0 while the e6-then-e4 composition lands 2249).
      SELECT doc_id,
             floor((CASE WHEN len(s) > 0
                  THEN 1.0 - len(list_distinct(list_transform(
                         s, g -> {_md5int('g')}))) * 1.0 / len(s)
                  ELSE 0.0 END) * 1000000.0) / 1000000.0 AS repetition
      FROM toks
    ), j AS (
      SELECT t.doc_id, t.n_tokens,
             t.sum_len * 1.0 / t.n_tokens AS mean_len,
             t.n_stop * 1.0 / t.n_tokens AS stop_ratio,
             rep.repetition
      FROM toks t JOIN rep ON t.doc_id = rep.doc_id
    ), r AS (
      SELECT doc_id, n_tokens, mean_len, stop_ratio, repetition,
             CASE WHEN n_tokens < 20 THEN 'too_short'
                  WHEN n_tokens > 100000 THEN 'too_long'
                  WHEN mean_len < 2.0 OR mean_len > 10.0 THEN 'word_length'
                  WHEN stop_ratio < 0.01 THEN 'low_stopwords'
                  WHEN repetition > 0.2 THEN 'repetitive'
             END AS drop_reason
      FROM j
    )
    SELECT doc_id, n_tokens,
           (floor(mean_len * 10000.0) / 10000.0) AS mean_token_len,
           (floor(stop_ratio * 10000.0) / 10000.0) AS stopword_ratio,
           (floor(repetition * 10000.0) / 10000.0) AS repetition_ratio,
           (drop_reason IS NULL) AS keep,
           drop_reason
    FROM r
    """

register(
    "quality_filter_pipeline",
    lambda spark, sf: dataprep.quality_filter_pipeline(
        *_t(spark, sf, "documents")),
    _QFP_SQL,
)

register(
    "pii_redact",
    lambda spark, sf: dataprep.pii_redact(*_t(spark, sf, "documents")),
    # same RE2-safe patterns; each kind counted on the text AFTER the
    # previous kinds were redacted (counts == placeholders inserted)
    """
    WITH s1 AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(text,
                  '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}')) - 1
                  AS INT) AS n_card,
             regexp_replace(text,
                  '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}',
                  '<CARD>', 'g') AS t1
      FROM documents
    ), s2 AS (
      SELECT doc_id, n_card,
             CAST(len(regexp_split_to_array(t1,
                  '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]')) - 1 AS INT) AS n_phone,
             regexp_replace(t1, '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]',
                  '<PHONE>', 'g') AS t2
      FROM s1
    ), s3 AS (
      SELECT doc_id, n_card, n_phone,
             CAST(len(regexp_split_to_array(t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) - 1
                  AS INT) AS n_email,
             regexp_replace(t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g') AS t3
      FROM s2
    )
    SELECT doc_id, n_email, n_phone, n_card,
           t3 AS redacted_text, md5(t3) AS redacted_md5
    FROM s3
    """,
)

register(
    "vector_quantize",
    lambda spark, sf: dataprep.vector_quantize(*_t(spark, sf, "embeddings")),
    """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e
    )
    SELECT vec_id, CAST(u.i - 1 AS INT) AS dim_idx,
           CAST(CASE WHEN scale > 0 THEN floor(v[u.i] / scale * 127)
                     ELSE 0 END AS BIGINT) AS q8,
           CAST(floor(scale * 1000000.0) AS BIGINT) AS scale_e6
    FROM s, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    """,
)


register(
    "cap_per_source",
    lambda spark, sf: dataprep.cap_per_source(*_t(spark, sf, "documents")),
    f"""
    SELECT doc_id, stratum, rank_in_stratum FROM (
      SELECT doc_id, source AS stratum,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY {_md5int("source || '|' || CAST(doc_id AS VARCHAR)")},
                        doc_id) AS INT) AS rank_in_stratum
      FROM documents
    ) WHERE rank_in_stratum <= 10
    """,
)


register(
    "seq_pack_plan",
    lambda spark, sf: dataprep.seq_pack_plan(*_t(spark, sf, "documents")),
    f"""
    WITH pre AS (
      SELECT doc_id, source,
             greatest(CAST(floor((n_chars + 3) / 4) AS BIGINT), 1)
               AS est_tokens,
             {_md5int("'pack' || '|' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ), cum AS (
      SELECT doc_id, source, (h % 8) AS stream, est_tokens,
             CAST(sum(est_tokens) OVER (
               PARTITION BY source, (h % 8) ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM pre
    )
    SELECT doc_id, source, CAST(stream AS BIGINT) AS stream, est_tokens,
           CAST(floor((cum_tokens - est_tokens) / 2048.0) AS BIGINT)
             AS pack_id,
           (cum_tokens - est_tokens) AS tokens_before
    FROM cum
    ORDER BY source, stream, tokens_before, doc_id
    """,
)


register(
    "token_histogram",
    lambda spark, sf: dataprep.token_histogram(*_t(spark, sf, "documents")),
    """
    WITH est AS (
      SELECT greatest(CAST(floor((n_chars + 3) / 4) AS BIGINT), 1) AS est
      FROM documents
    ), agg AS (
      SELECT CAST(length(bin(est)) - 1 AS INT) AS log2_bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(est) AS BIGINT) AS total_tokens
      FROM est GROUP BY 1
    ), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM agg)
    SELECT log2_bucket,
           CAST(1 << log2_bucket AS BIGINT) AS bucket_lo,
           n_docs, total_tokens,
           CAST(floor(n_docs * 1e6 / n_total) AS BIGINT) AS share_e6
    FROM agg, tot
    ORDER BY log2_bucket
    """,
)


register(
    "temperature_mixing_weights",
    lambda spark, sf: dataprep.temperature_mixing_weights(
        *_t(spark, sf, "documents")),
    """
    WITH per AS (
      SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(floor(sqrt(count(*)) * 1e9) AS BIGINT) AS sqrt_e9
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
             CAST(sum(sqrt_e9) AS BIGINT) AS sum_sqrt_e9
      FROM per
    )
    SELECT stratum, n_docs,
           CAST(floor(n_docs * 1e6 / n_total) AS BIGINT) AS share_e6,
           CAST(floor(CAST(sqrt_e9 AS DOUBLE) * 1e6
                      / CAST(sum_sqrt_e9 AS DOUBLE)) AS BIGINT)
             AS tempered_e6,
           CAST(floor(CAST(sqrt_e9 AS DOUBLE) * CAST(n_total AS DOUBLE)
                      * 1e4 / (CAST(sum_sqrt_e9 AS DOUBLE)
                               * CAST(n_docs AS DOUBLE))) AS BIGINT)
             AS boost_e4
    FROM per, tot
    ORDER BY stratum
    """,
)


register(
    "doc_chunk_plan",
    lambda spark, sf: dataprep.doc_chunk_plan(*_t(spark, sf, "documents")),
    f"""
    WITH d AS (
      SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             greatest(CAST(1 AS BIGINT),
                      CAST(floor((n_tokens - 16 + 47) / 48.0) AS BIGINT))
               AS n_chunks
      FROM d
    ), x AS (
      SELECT doc_id, n_tokens,
             unnest(range(0, n_chunks)) AS chunk_idx
      FROM c
    )
    SELECT doc_id, n_tokens, chunk_idx,
           chunk_idx * 48 AS start_token,
           least(chunk_idx * 48 + 64, n_tokens) AS end_token,
           greatest(least(chunk_idx * 48 + 64, n_tokens) - chunk_idx * 48,
                    CAST(0 AS BIGINT)) AS chunk_len
    FROM x
    ORDER BY doc_id, chunk_idx
    """,
)


register(
    "packing_efficiency_report",
    lambda spark, sf: dataprep.packing_efficiency_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH pre AS (
      SELECT doc_id, source,
             greatest(CAST(floor((n_chars + 3) / 4) AS BIGINT), 1)
               AS est_tokens,
             {_md5int("'pack' || '|' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ), cum AS (
      SELECT doc_id, source, (h % 8) AS stream, est_tokens,
             CAST(sum(est_tokens) OVER (
               PARTITION BY source, (h % 8) ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_tokens
      FROM pre
    ), plan AS (
      SELECT source, stream, est_tokens,
             CAST(floor((cum_tokens - est_tokens) / 2048.0) AS BIGINT)
               AS pack_id
      FROM cum
    )
    SELECT source, count(*) AS n_docs,
           CAST(count(DISTINCT (stream, pack_id)) AS BIGINT) AS n_packs,
           CAST(sum(est_tokens) AS BIGINT) AS total_tokens,
           CAST(floor(CAST(sum(est_tokens) AS BIGINT) * 1e6
                      / (CAST(count(DISTINCT (stream, pack_id)) AS BIGINT)
                         * 2048)) AS BIGINT) AS fill_e6
    FROM plan
    GROUP BY 1
    ORDER BY source
    """,
)


register(
    "source_topic_mix",
    # per-source topic composition vs the corpus: the data-mixing
    # read of the embedding labels (doc_id = vec_id 1:1 sidecar)
    lambda spark, sf: dataprep.source_topic_mix(
        *_t(spark, sf, "documents", "embeddings")),
    """
    WITH j AS (
      SELECT d.doc_id, d.source, e.label
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ), agg AS (
      SELECT source, label, CAST(count(*) AS BIGINT) AS n_docs
      FROM j GROUP BY source, label
    ), t AS (
      SELECT source, label, n_docs,
             CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
               AS src_total,
             CAST(sum(n_docs) OVER (PARTITION BY label) AS BIGINT)
               AS lbl_total,
             CAST(sum(n_docs) OVER () AS BIGINT) AS corpus_total
      FROM agg
    )
    SELECT source, label, n_docs,
           (floor((n_docs / src_total) * 10000.0) / 10000.0)
             AS source_share,
           (floor((lbl_total / corpus_total) * 10000.0) / 10000.0)
             AS corpus_share,
           (floor(((n_docs / src_total) / (lbl_total / corpus_total))
                  * 10000.0) / 10000.0) AS lift
    FROM t ORDER BY source, label
    """,
)


register(
    "source_epoch_plan",
    lambda spark, sf: dataprep.source_epoch_plan(
        *_t(spark, sf, "documents")),
    f"""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKENS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), u AS (
      SELECT *, CAST(floor(sqrt(n_tokens) * 1000000000.0) AS BIGINT)
                  AS sqrt_e9
      FROM per
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_total,
             CAST(sum(sqrt_e9) AS BIGINT) AS sum_sqrt_e9
      FROM u
    ), t AS (
      SELECT source, n_docs, n_tokens,
             CAST(floor(n_tokens * 1000000.0 / tok_total) AS BIGINT)
               AS natural_share_e6,
             CAST(floor(CAST(sqrt_e9 AS DOUBLE) * 1000000.0
                        / CAST(sum_sqrt_e9 AS DOUBLE)) AS BIGINT)
               AS tempered_share_e6,
             CAST(floor(CAST(tok_total AS DOUBLE)
                        * CAST(sqrt_e9 AS DOUBLE)
                        / CAST(sum_sqrt_e9 AS DOUBLE)) AS BIGINT)
               AS target_tokens
      FROM u, tot
    )
    SELECT source, n_docs, n_tokens, natural_share_e6,
           tempered_share_e6, target_tokens,
           CAST(floor(target_tokens * 10000.0 / n_tokens) AS BIGINT)
             AS epochs_e4
    FROM t ORDER BY source
    """,
)


register(
    "source_quality_calibration",
    lambda spark, sf: dataprep.source_quality_calibration(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (SELECT doc_id, source, {_TOKENS} AS t FROM documents),
    f AS (
      SELECT doc_id, source, len(t) AS n,
             list_reduce([CAST(0 AS BIGINT)]
                         || list_transform(t, x -> length(x)::BIGINT),
                         (acc, x) -> acc + x) AS sum_len,
             len(list_filter(t, x -> list_contains({_STOPS}, x)))
               AS n_stop
      FROM d
    ), g AS (
      SELECT source, n,
             sum_len / greatest(n, 1) AS mean_len,
             n_stop / greatest(n, 1) AS stop_ratio,
             least(n / 100.0, 1.0) AS len_score
      FROM f
    ), q AS (
      SELECT source,
             CAST(round((floor((0.5 * len_score + 0.3 * stop_ratio
                  + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 10.0
                           THEN 1.0 ELSE 0.0 END)) * 10000.0)
                  / 10000.0) * 10000.0) AS BIGINT) AS q_e4
      FROM g
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           (floor(quantile_cont(q_e4, 0.1) * 1000000.0) / 1000000.0)
             AS p10_q_e4,
           (floor(quantile_cont(q_e4, 0.25) * 1000000.0) / 1000000.0)
             AS p25_q_e4,
           (floor(quantile_cont(q_e4, 0.5) * 1000000.0) / 1000000.0)
             AS p50_q_e4,
           (floor(quantile_cont(q_e4, 0.75) * 1000000.0) / 1000000.0)
             AS p75_q_e4,
           (floor(quantile_cont(q_e4, 0.9) * 1000000.0) / 1000000.0)
             AS p90_q_e4,
           CAST(floor(sum(CASE WHEN q_e4 < 5000 THEN 1 ELSE 0 END)
                      * 1000000.0 / count(*)) AS BIGINT)
             AS below_half_share_e6
    FROM q GROUP BY source ORDER BY source
    """,
)


register(
    # same train/eval split convention as contamination_check
    "decontamination_manifest",
    lambda spark, sf: dataprep.decontamination_manifest(
        catalog.load(spark, sf, "documents").filter("doc_id % 10 != 0"),
        catalog.load(spark, sf, "documents").filter("doc_id % 10 = 0")),
    f"""
    WITH tr AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents WHERE doc_id % 10 != 0
    ), pos AS (
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             {_md5int("(t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2])")}
               AS h
      FROM tr, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i) u
    ), dirty AS (
      SELECT DISTINCT {_md5int('unnest(s)')} AS h
      FROM (SELECT {_SHINGLES} AS s
            FROM (SELECT {_TOKENS} AS t FROM documents
                  WHERE doc_id % 10 = 0)
            WHERE len({_SHINGLES}) > 0)
    ), m AS (
      SELECT DISTINCT p.doc_id, p.pos
      FROM pos p JOIN dirty d ON d.h = p.h
    ), i AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) > 3
                  THEN 1 ELSE 0 END AS brk
      FROM m
    ), sgrp AS (
      SELECT doc_id, pos,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS span_id
      FROM i
    )
    SELECT doc_id, span_id,
           min(pos) AS span_start,
           max(pos) + 2 AS span_end,
           max(pos) + 2 - min(pos) + 1 AS span_tokens,
           CAST(count(*) AS BIGINT) AS n_matched_shingles
    FROM sgrp GROUP BY doc_id, span_id
    ORDER BY doc_id, span_id
    """,
)


register(
    "drop_reason_matrix",
    lambda spark, sf: dataprep.drop_reason_matrix(
        *_t(spark, sf, "documents")),
    f"""
    WITH qfp AS ( {_QFP_SQL} ),
    lab AS (
      SELECT d.source,
             CASE WHEN q.keep IS NULL THEN 'too_short'
                  WHEN q.keep THEN 'kept'
                  ELSE q.drop_reason END AS reason
      FROM documents d LEFT JOIN qfp q ON q.doc_id = d.doc_id
    ), agg AS (
      SELECT source, reason, CAST(count(*) AS BIGINT) AS n_docs
      FROM lab GROUP BY 1, 2
    )
    SELECT source, reason, n_docs,
           CAST(floor(n_docs * 1000000.0 /
                sum(n_docs) OVER (PARTITION BY source)) AS BIGINT)
             AS share_e6
    FROM agg ORDER BY source, reason
    """,
)


register(
    "split_balance_report",
    lambda spark, sf: dataprep.split_balance_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH base AS (
      SELECT source,
             CASE WHEN {_md5int('CAST(doc_id AS VARCHAR)')} % 100 < 10
                  THEN 1 ELSE 0 END AS is_val,
             CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents
    ), per AS (
      SELECT source,
             CAST(sum(1 - is_val) AS BIGINT) AS train_docs,
             CAST(sum(is_val) AS BIGINT) AS val_docs,
             CAST(sum((1 - is_val) * n_tokens) AS BIGINT) AS train_tokens,
             CAST(sum(is_val * n_tokens) AS BIGINT) AS val_tokens
      FROM base GROUP BY source
    )
    SELECT source, train_docs, val_docs, train_tokens, val_tokens,
           CAST(floor(val_docs * 1000000.0 / (train_docs + val_docs))
                AS BIGINT) AS val_doc_share_e6,
           CASE WHEN train_tokens + val_tokens > 0
                THEN CAST(floor(val_tokens * 1000000.0
                                / (train_tokens + val_tokens)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS val_token_share_e6
    FROM per ORDER BY source
    """,
)


register(
    "temporal_split_plan",
    lambda spark, sf: dataprep.temporal_split_plan(
        *_t(spark, sf, "events")),
    """
    WITH bounds AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS t0,
             CAST(max(epoch_us(ts)) AS BIGINT) AS t1
      FROM events
    ), tagged AS (
      SELECT e.user_id,
             CASE WHEN epoch_us(e.ts)
                       < b.t0 + CAST(floor((b.t1 - b.t0) * 800000
                                           / 1000000.0) AS BIGINT)
                  THEN 'train'
                  WHEN epoch_us(e.ts)
                       < b.t0 + CAST(floor((b.t1 - b.t0) * 800000
                                           / 1000000.0) AS BIGINT)
                         + 86400000000
                  THEN 'embargo'
                  ELSE 'val' END AS side
      FROM events e CROSS JOIN bounds b
    ), counts AS (
      SELECT
        CAST(sum(CASE WHEN side = 'train' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_train,
        CAST(sum(CASE WHEN side = 'embargo' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_embargoed,
        CAST(sum(CASE WHEN side = 'val' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_val
      FROM tagged
    ), su AS (
      SELECT DISTINCT user_id, side FROM tagged WHERE side != 'embargo'
    ), per_user AS (
      SELECT user_id, count(*) AS n_sides,
             max(CASE WHEN side = 'val' THEN 1 ELSE 0 END) AS in_val
      FROM su GROUP BY 1
    ), users AS (
      SELECT
        CAST(sum(CASE WHEN n_sides = 2 THEN 0
                      WHEN in_val = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS train_only_users,
        CAST(sum(CASE WHEN n_sides = 2 THEN 0
                      WHEN in_val = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS val_only_users,
        CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS leaky_users
      FROM per_user
    )
    SELECT c.n_train, c.n_embargoed, c.n_val,
           u.train_only_users, u.val_only_users, u.leaky_users,
           CAST(floor(u.leaky_users * 1000000.0
                      / greatest(1, u.leaky_users + u.val_only_users))
                AS BIGINT) AS val_user_leak_e6
    FROM counts c CROSS JOIN users u
    """,
)


register(
    "takedown_manifest",
    lambda spark, sf: dataprep.takedown_manifest(
        *_t(spark, sf, "customer", "orders", "lineitem", "events")),
    f"""
    WITH cust AS (
      SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN ({_md5int("CAST(c_custkey AS VARCHAR)")}
                                 % 100) < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_affected,
             CAST(count(DISTINCT CASE
                 WHEN ({_md5int("CAST(c_custkey AS VARCHAR)")} % 100) < 5
                 THEN c_custkey END) AS BIGINT) AS n_keys
      FROM customer
    ), ords AS (
      SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN ({_md5int("CAST(o_custkey AS VARCHAR)")}
                                 % 100) < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_affected,
             CAST(count(DISTINCT CASE
                 WHEN ({_md5int("CAST(o_custkey AS VARCHAR)")} % 100) < 5
                 THEN o_custkey END) AS BIGINT) AS n_keys
      FROM orders
    ), eords AS (
      SELECT o_orderkey FROM orders
      WHERE ({_md5int("CAST(o_custkey AS VARCHAR)")} % 100) < 5
    ), li AS (
      SELECT 'lineitem' AS tbl,
             (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_affected,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys
      FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM eords)
    ), ev AS (
      SELECT 'events' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN ({_md5int("CAST(user_id AS VARCHAR)")}
                                 % 100) < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_affected,
             CAST(count(DISTINCT CASE
                 WHEN ({_md5int("CAST(user_id AS VARCHAR)")} % 100) < 5
                 THEN user_id END) AS BIGINT) AS n_keys
      FROM events
    ), stacked AS (
      SELECT * FROM cust UNION ALL SELECT * FROM ords
      UNION ALL SELECT * FROM li UNION ALL SELECT * FROM ev
    )
    SELECT tbl, n_rows, n_affected,
           CAST(floor(n_affected * 1000000.0 / greatest(1, n_rows))
                AS BIGINT) AS share_e6,
           n_keys
    FROM stacked ORDER BY tbl
    """,
)


register(
    "neyman_allocation_plan",
    lambda spark, sf: dataprep.neyman_allocation_plan(
        *_t(spark, sf, "events")),
    """
    WITH per AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s2
      FROM events GROUP BY 1
    ), sc AS (
      SELECT event_type, n_rows,
             CAST(floor(sqrt(
               CASE WHEN n_rows <= 1 THEN 0.0
                    ELSE greatest(0.0,
                         (CAST(s2 AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                            / n_rows)
                         / (n_rows - 1))
               END)) AS BIGINT) AS sd_c
      FROM per
    ), w AS (
      SELECT event_type, n_rows, sd_c,
             CAST(n_rows * sd_c AS BIGINT) AS weight
      FROM sc
    ), t AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS n_total,
             CAST(sum(weight) AS BIGINT) AS w_total
      FROM w
    )
    SELECT event_type, n_rows, sd_c, weight,
           CAST(least(n_rows,
                CASE WHEN w_total > 0
                     THEN CAST(floor(10000.0 * weight / w_total)
                               AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS alloc_neyman,
           CAST(least(n_rows,
                CAST(floor(10000.0 * n_rows / n_total) AS BIGINT))
                AS BIGINT) AS alloc_proportional
    FROM w, t ORDER BY event_type
    """,
)


register(
    "boilerplate_removal_report",
    # disjoint 8-token segments recurring >=3 times across the corpus
    # = boilerplate; per-source removal cost (operators/dataprep.py
    # boilerplate_removal_report)
    lambda spark, sf: dataprep.boilerplate_removal_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (
      SELECT doc_id, source, {_TOKENS} AS t FROM documents
    ), base AS (
      SELECT doc_id, source, t, CAST(len(t) AS BIGINT) AS nt FROM d
    ), seg0 AS (
      SELECT doc_id, source, t, nt,
             unnest(range(0, CAST(floor((nt + 7) / 8.0) AS BIGINT)))
               AS g
      FROM base WHERE nt > 0
    ), seg AS (
      SELECT doc_id, source,
             CAST(least(g * 8 + 8, nt) - g * 8 AS BIGINT) AS seg_len,
             md5(array_to_string(
               list_slice(t, g * 8 + 1, least(g * 8 + 8, nt)), ' '))
               AS h
      FROM seg0
    ), counts AS (
      SELECT h, CAST(count(*) AS BIGINT) AS c FROM seg GROUP BY h
    ), flagged AS (
      SELECT seg.doc_id, seg.source, seg.seg_len,
             CASE WHEN c >= 3 THEN 1 ELSE 0 END AS bp
      FROM seg JOIN counts USING (h)
    ), per_doc AS (
      SELECT source, doc_id,
             CAST(sum(seg_len) AS BIGINT) AS tok,
             CAST(sum(seg_len * bp) AS BIGINT) AS bp_tok,
             CAST(max(bp) AS BIGINT) AS affected,
             CAST(sum(bp) AS BIGINT) AS n_bp_seg
      FROM flagged GROUP BY 1, 2
    ), per_src AS (
      SELECT source,
             CAST(sum(affected) AS BIGINT) AS n_docs_affected,
             CAST(sum(tok) AS BIGINT) AS total_tokens,
             CAST(sum(bp_tok) AS BIGINT) AS boilerplate_tokens,
             CAST(sum(n_bp_seg) AS BIGINT) AS n_boilerplate_segments
      FROM per_doc GROUP BY 1
    ), docs_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    )
    SELECT ds.source, ds.n_docs,
           CAST(coalesce(n_docs_affected, 0) AS BIGINT)
             AS n_docs_affected,
           CAST(coalesce(total_tokens, 0) AS BIGINT) AS total_tokens,
           CAST(coalesce(boilerplate_tokens, 0) AS BIGINT)
             AS boilerplate_tokens,
           CAST(floor(coalesce(boilerplate_tokens, 0) * 1000000.0
                      / greatest(1, coalesce(total_tokens, 0)))
                AS BIGINT) AS boilerplate_rate_e6,
           CAST(coalesce(n_boilerplate_segments, 0) AS BIGINT)
             AS n_boilerplate_segments
    FROM docs_src ds LEFT JOIN per_src ps ON ds.source = ps.source
    ORDER BY ds.source
    """,
)


register(
    "pii_density_report",
    # the pii_redact sequential-redaction counting per doc, one
    # source-grain rollup (operators/dataprep.py pii_density_report)
    lambda spark, sf: dataprep.pii_density_report(
        *_t(spark, sf, "documents")),
    """
    WITH s1 AS (
      SELECT source, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_split_to_array(text,
                  '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}')) - 1
                  AS BIGINT) AS c,
             regexp_replace(text,
                  '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}',
                  '<CARD>', 'g') AS t1
      FROM documents
    ), s2 AS (
      SELECT source, n_chars, c,
             CAST(len(regexp_split_to_array(t1,
                  '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]')) - 1 AS BIGINT) AS p,
             regexp_replace(t1, '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]',
                  '<PHONE>', 'g') AS t2
      FROM s1
    ), s3 AS (
      SELECT source, n_chars, c, p,
             CAST(len(regexp_split_to_array(t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) - 1
                  AS BIGINT) AS e
      FROM s2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN e + p + c > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_with_pii,
           CAST(sum(e) AS BIGINT) AS n_email,
           CAST(sum(p) AS BIGINT) AS n_phone,
           CAST(sum(c) AS BIGINT) AS n_card,
           CASE WHEN sum(n_chars) > 0 THEN
             CAST(floor(sum(e + p + c) * 1e6 / sum(n_chars)) AS BIGINT)
           END AS hits_per_mchar
    FROM s3 GROUP BY source ORDER BY source
    """,
)
