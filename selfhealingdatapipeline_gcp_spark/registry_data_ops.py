"""Registry entries for dedup / similarity / text / multimodal /
streaming (SURVEY.md §2). Oracle SQL mirrors every hash, fold, and
rounding of the Spark expressions (see functions/textfn.py,
functions/vectorfn.py for the expression twins)."""

from __future__ import annotations

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import (
    dedup, detectors, er, graph, multimodal, similarity, textanalysis)
from selfhealingdatapipeline_gcp_spark.registry import register
from selfhealingdatapipeline_gcp_spark.streaming import monitors


def _t(spark, sf, *names):
    return [catalog.load(spark, sf, n) for n in names]


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB twins of functions/textfn.py + vectorfn.py)
# ---------------------------------------------------------------------------

_TOKENS = "list_filter(str_split(text, ' '), x -> x != '')"


def _md5int(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 12))::BIGINT)"


# distinct 3-gram shingles over tokens t
_SHINGLES = ("list_distinct(list_transform("
             "range(1, greatest(len(t) - 2, 0) + 1), "
             "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))")

# sequential-fold dot product of double lists a·b (vectorfn.dot twin)
def _dot(a: str, b: str) -> str:
    return (f"list_reduce([CAST(0.0 AS DOUBLE)] || "
            f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]), "
            f"(acc, x) -> acc + x)")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

register(
    "dedup_exact",
    lambda spark, sf: dedup.dedup_exact(*_t(spark, sf, "documents")),
    """
    SELECT min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies,
           (count(*) > 1) AS had_duplicates
    FROM documents
    GROUP BY md5(text)
    """,
)

register(
    "dedup_ngram_jaccard",
    lambda spark, sf: dedup.dedup_ngram_jaccard(*_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ex0 AS (
      SELECT doc_id, {_md5int('unnest(s)')} AS g FROM sh
    ), keep AS (
      -- df ceiling twin (max_df = 10000): shingles in this many docs
      -- or more carry no near-dup signal and explode the self-join
      SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 10000
    ), ex AS (
      SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, g
      FROM ex0 WHERE g IN (SELECT g FROM keep)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_common, max(a.n) AS n_a, max(b.n) AS n_b
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           (floor((n_common * 1.0 / (n_a + n_b - n_common)) * 1000000.0)
            / 1000000.0) AS jaccard
    FROM pairs
    WHERE n_common * 1.0 / (n_a + n_b - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)

_SIG = ("list_transform(range(1, 33), j -> "
        "list_min(list_transform(xs, x -> ((17 + j*13)*x + j*7919) % 1000000007)))")
_BKEYS = ("list_transform(range(0, 8), b -> "
          "b::VARCHAR || '|' || sig[b*4+1]::VARCHAR || '|' || sig[b*4+2]::VARCHAR"
          " || '|' || sig[b*4+3]::VARCHAR || '|' || sig[b*4+4]::VARCHAR)")
# Shared with the dedup_clusters connected-components oracle below.
_MINHASH_PAIRS_SQL = f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """

register(
    "dedup_minhash_lsh",
    lambda spark, sf: dedup.dedup_minhash_lsh(*_t(spark, sf, "documents")),
    _MINHASH_PAIRS_SQL,
)

_SIMHASH_BITS = (
    "list_transform(range(0, 32), k -> "
    "list_reduce([CAST(0 AS BIGINT)] || xs, "
    "(acc, x) -> acc + (CAST(floor(x / power(2, k)) AS BIGINT) % 2) * 2 - 1))")
_SIMHASH = ("list_reduce([CAST(0 AS BIGINT)] || range(0, 32), (acc, k) -> "
            "acc + CASE WHEN bits[k+1] > 0 "
            "THEN CAST(power(2, k) AS BIGINT) ELSE 0 END)")
register(
    "dedup_simhash",
    lambda spark, sf: dedup.dedup_simhash(*_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, list_transform({_TOKENS}, w -> {_md5int('w')}) AS xs
      FROM documents
    ), b AS (
      SELECT doc_id, {_SIMHASH_BITS} AS bits FROM toks
    ), s AS (
      SELECT doc_id, {_SIMHASH} AS simhash FROM b
    ), sh AS (
      SELECT doc_id, simhash,
             CAST(floor(simhash / power(2, 24)) AS BIGINT) AS bucket
      FROM s
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.bucket AS bucket,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    ORDER BY doc_a, doc_b
    """,
)

_EMB_NORMED = (
    "SELECT vec_id, label, v, sqrt({dot}) AS nrm "
    "FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)"
).format(dot=_dot("v", "v"))

# Grid size for the AUTO-sized cell operators (dedup_embedding cell
# mode, knn_graph_cells and everything built on it): the SQL twin of
# max(16, min(4096, ceil(n / 4000))) so the oracle tracks the Spark
# side at EVERY replica SF, not just the ones where auto resolves to
# 16 (r7: the sf10 sweep caught the pinned-16 oracle diverging at
# 200k vectors where auto = 50). Past 4096·4000 corpus rows the
# in-task hot-cell subdivision may fire and the oracle is no longer
# exact — the replicas stay far below that.
_K_AUTO = ("(SELECT greatest(16, least(4096, "
           "CAST(ceil(count(*) / 4000.0) AS BIGINT))) FROM embeddings)")
register(
    # explicit all-pairs escape: the exact verifier for modest corpora
    "dedup_embedding",
    lambda spark, sf: dedup.dedup_embedding(
        *_t(spark, sf, "embeddings"), allow_all_pairs=True),
    f"""
    WITH n AS ({_EMB_NORMED})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 6) AS cosine,
           (a.label = b.label) AS same_label
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.35
    ORDER BY vec_a, vec_b
    """,
    # exact all-pairs verifier; above max_all_pairs_rows it
    # auto-routes to the cell-bounded form (dedup_embedding_cells is
    # the registered scale default)
    tier="diagnostic",
)

register(
    # the scale default: candidate pairs bounded by IVF cell
    # co-membership (equi-join on cell id), then exact cosine verify
    "dedup_embedding_cells",
    lambda spark, sf: dedup.dedup_embedding(*_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS (
      -- fixed-K pick: K smallest md5int(vec_id); K auto-sizes with
      -- the corpus exactly like the Spark side (_K_AUTO)
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT {_K_AUTO}
    ), assign AS (
      -- floor(cos*1e6) micro-units, smallest cent_id on ties: the
      -- exact argmax of assign_cells_arrow (round(,6) differs from
      -- floor on quantization boundaries — diverged 23 rows at sf10)
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY CAST(floor({_dot('n.v', 'cv')} / (n.nrm * cnrm)
                               * 1000000) AS BIGINT) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 6) AS cosine,
           (a.label = b.label) AS same_label
    FROM assign x
    JOIN assign y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
    JOIN n a ON a.vec_id = x.vec_id
    JOIN n b ON b.vec_id = y.vec_id
    WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.35
    ORDER BY vec_a, vec_b
    """,
)

# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

register(
    "ann_bruteforce_topk",
    lambda spark, sf: similarity.ann_bruteforce_topk(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    p AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6) AS score
      FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id != q.vec_id
    ), r AS (
      SELECT query_id, neighbor_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS INT) AS rank
      FROM p
    )
    SELECT query_id, neighbor_id, score, rank FROM r
    WHERE rank <= 10 ORDER BY query_id, rank
    """,
)

register(
    "ann_ivf_topk",
    lambda spark, sf: similarity.ann_ivf_topk(*_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS (
      -- fixed-K pick: K smallest md5int(vec_id), constant w.r.t. corpus
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT 16
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, cent_id FROM (
        SELECT n.vec_id AS query_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents WHERE n.vec_id < 5
      ) WHERE rn <= 2
    ), cands AS (
      SELECT probes.query_id, assign.vec_id
      FROM probes JOIN assign ON probes.cent_id = assign.cent_id
      WHERE assign.vec_id != probes.query_id
    ), scored AS (
      SELECT cands.query_id, cands.vec_id AS neighbor_id,
             round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6) AS score
      FROM cands
      JOIN n c ON cands.vec_id = c.vec_id
      JOIN n q ON cands.query_id = q.vec_id
    )
    SELECT query_id, neighbor_id, score,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)

# squared-L2 sequential fold (vectorfn.l2sq twin)
def _l2sq(a: str, b: str) -> str:
    return (f"list_reduce([CAST(0.0 AS DOUBLE)] || "
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), "
            f"(acc, x) -> acc + x)")


_PQ_CENTS = """
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT 16
"""

register(
    # PQ/ADC search: codes = deterministic argmin per (vector,
    # subspace); approx distance = integer-unit sum of per-subspace
    # table lookups. dsub = 8 (dim 64 / n_sub 8) mirrored literally.
    "ann_pq_topk",
    lambda spark, sf: similarity.ann_pq_topk(*_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS ({_PQ_CENTS}),
    subm AS (SELECT unnest(range(0, 8)) AS m),
    enc AS (
      SELECT n.vec_id, cents.cent_id, subm.m,
             {_l2sq('(n.v[(subm.m*8+1):(subm.m*8+8)])',
                    '(cents.cv[(subm.m*8+1):(subm.m*8+8)])')} AS d
      FROM n, cents, subm
    ), codes AS (
      SELECT vec_id, m, (min({{'d': d, 'c': cent_id}})).c AS code
      FROM enc GROUP BY vec_id, m
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id < 5
    ), qt AS (
      SELECT query_id, cents.cent_id AS code, subm.m,
             CAST(floor({_l2sq('(q.qv[(subm.m*8+1):(subm.m*8+8)])',
                               '(cents.cv[(subm.m*8+1):(subm.m*8+8)])')}
                        * 1000000.0) AS BIGINT) AS qd_u
      FROM q, cents, subm
    ), scored AS (
      SELECT qt.query_id, codes.vec_id,
             CAST(sum(qd_u) AS BIGINT) AS adist_u
      FROM codes JOIN qt ON codes.m = qt.m AND codes.code = qt.code
      WHERE codes.vec_id != qt.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id AS neighbor_id,
           (adist_u / 1000000.0) AS approx_dist,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adist_u, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)

register(
    "embedding_stats",
    lambda spark, sf: similarity.embedding_stats(*_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED})
    SELECT label, count(*) AS n_vecs,
           max(len(v)) AS dim,
           (sum(CAST(floor(nrm * 1000000.0) AS BIGINT)) / 1000000.0) AS sum_norm,
           (floor(sum(CAST(floor(nrm * 1000000.0) AS BIGINT)) / count(*)) / 1000000.0)
             AS avg_norm
    FROM n GROUP BY label ORDER BY label
    """,
)

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

register(
    "text_token_count",
    lambda spark, sf: textanalysis.text_token_count(
        *_t(spark, sf, "documents")),
    f"""
    SELECT doc_id,
           len(t) AS n_tokens,
           len(list_distinct(t)) AS n_unique_tokens,
           length(text) AS n_chars_actual
    FROM (SELECT doc_id, text, {_TOKENS} AS t FROM documents)
    """,
)

_STOPS = "['the', 'a', 'of', 'and', 'to', 'in', 'is']"
register(
    "text_quality_score",
    lambda spark, sf: textanalysis.text_quality_score(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    f AS (
      SELECT doc_id,
             len(t) AS n,
             list_reduce([CAST(0 AS BIGINT)] || list_transform(t, x -> length(x)::BIGINT),
                         (acc, x) -> acc + x) AS sum_len,
             len(list_filter(t, x -> list_contains({_STOPS}, x))) AS n_stop
      FROM d
    ), g AS (
      SELECT doc_id, n,
             sum_len / greatest(n, 1) AS mean_len,
             n_stop / greatest(n, 1) AS stop_ratio,
             least(n / 100.0, 1.0) AS len_score
      FROM f
    )
    SELECT doc_id,
           n AS n_tokens,
           (floor(mean_len * 10000.0) / 10000.0) AS mean_token_len,
           (floor(stop_ratio * 10000.0) / 10000.0) AS stopword_ratio,
           (floor((0.5 * len_score + 0.3 * stop_ratio
                   + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 10.0
                            THEN 1.0 ELSE 0.0 END)) * 10000.0) / 10000.0)
             AS quality_score
    FROM g
    """,
)

_MARKER_SQL = {
    "en": "['the','a','of','and','is']",
    "de": "['der','die','das','und','ist']",
    "es": "['el','la','de','y','es']",
    "fr": "['le','la','de','et','est']",
}
_SCORES = ",\n             ".join(
    f"len(list_filter(t, x -> list_contains({arr}, x))) / greatest(len(t), 1)"
    f" AS s_{lang}" for lang, arr in _MARKER_SQL.items())
register(
    "text_language_id",
    lambda spark, sf: textanalysis.text_language_id(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    s AS (
      SELECT doc_id,
             {_SCORES}
      FROM d
    )
    SELECT doc_id,
           (floor(s_en * 10000.0) / 10000.0) AS score_en,
           (floor(s_de * 10000.0) / 10000.0) AS score_de,
           (floor(s_es * 10000.0) / 10000.0) AS score_es,
           (floor(s_fr * 10000.0) / 10000.0) AS score_fr,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0.0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM s
    """,
)

register(
    "doc_language_confusion",
    # labeled `lang` vs marker-detected language: the label-noise
    # audit; exact integer count ratios, per-label totals broadcast
    lambda spark, sf: textanalysis.doc_language_confusion(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    s AS (
      SELECT doc_id,
             {_SCORES}
      FROM d
    ), p AS (
      SELECT doc_id,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) <= 0.0
                    THEN 'unknown'
                  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr
                    THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM s
    ), per AS (
      SELECT doc.lang, p.predicted_lang,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents doc JOIN p ON p.doc_id = doc.doc_id
      GROUP BY 1, 2
    ), tot AS (
      SELECT lang, CAST(sum(n_docs) AS BIGINT) AS t FROM per GROUP BY 1
    )
    SELECT per.lang, per.predicted_lang, per.n_docs,
           CAST(floor(per.n_docs * 1000000.0 / tot.t) AS BIGINT)
             AS share_e6,
           (per.lang = per.predicted_lang) AS agree
    FROM per JOIN tot ON tot.lang = per.lang
    ORDER BY 1, 2
    """,
)

register(
    "doc_fingerprint",
    lambda spark, sf: textanalysis.doc_fingerprint(*_t(spark, sf, "documents")),
    f"""
    SELECT doc_id,
           list_reduce([CAST(0 AS BIGINT)] ||
                       list_transform({_TOKENS}, w -> {_md5int('w')}),
                       (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint,
           list_reduce([CAST(0 AS BIGINT)] ||
                       list_transform({_TOKENS}, w -> {_md5int('w')}),
                       (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS shard
    FROM documents
    """,
)

# ---------------------------------------------------------------------------
# multimodal plumbing (decode stubbed → rows-only check by design)
# ---------------------------------------------------------------------------

register(
    # the deterministic fake decode is pure byte arithmetic on ASCII
    # payloads, so the mapInPandas output IS SQL-expressible — the
    # oracle replicates the fake, upgrading this from rows-only
    "multimodal_meta",
    lambda spark, sf: multimodal.multimodal_meta(*_t(spark, sf, "documents")),
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(64 + ord(substr(text, 1, 1)) % 1920 AS INT) AS width,
           CAST(64 + ord(substr(text, length(text), 1)) % 1080 AS INT)
             AS height,
           source AS media_format
    FROM documents
    """,
)

register(
    # frame digest is the repo-standard md5-hex→int over
    # payload + '#' + frame_idx, so the sampling plan is fully
    # SQL-expressible (upgraded from rows-only in round 5)
    "multimodal_framesample",
    lambda spark, sf: multimodal.multimodal_framesample(
        *_t(spark, sf, "documents")),
    """
    SELECT doc_id,
           CAST(u.i AS INT) AS frame_idx,
           CAST(('0x' || substr(md5(text || '#' || CAST(u.i AS VARCHAR)),
                                1, 12)) AS BIGINT) AS frame_digest
    FROM documents,
         LATERAL (SELECT unnest(range(0,
                    1 + octet_length(encode(text)) % 10, 2)) AS i) u
    """,
)

# ---------------------------------------------------------------------------
# structured streaming
# ---------------------------------------------------------------------------

register(
    "streaming_txn_volume",
    monitors.streaming_txn_volume,
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)

register(
    "streaming_sessionize",
    monitors.streaming_sessionize,
    """
    WITH x AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), y AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events
    FROM y GROUP BY user_id, sid
    """,
)

register(
    "streaming_stateful_volume",
    monitors.streaming_stateful_volume_monitor,
    # VERDICT r9 #5, upgraded from rows-only: under availableNow the
    # file source delivers ONE micro-batch (no maxFilesPerTrigger),
    # so state associativity equates the operator's output to the
    # batch aggregate exactly — per event_type the batch count is the
    # full count, prior state is empty (0 batches, 0.0 running avg),
    # and the 2x-average anomaly rule cannot fire on the first batch.
    # The same streaming_*_guard discipline as the windowed monitors.
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS batch_count,
           CAST(0 AS BIGINT) AS prior_batches,
           CAST(0.0 AS DOUBLE) AS prior_avg,
           FALSE AS is_anomaly
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

register(
    "streaming_dedup",
    monitors.streaming_dedup,
    """
    SELECT event_type,
           count(DISTINCT (user_id, event_type, value)) AS n_unique
    FROM events GROUP BY 1
    """,
)

register(
    "streaming_click_attribution",
    monitors.streaming_click_attribution,
    """
    SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    """,
)

register(
    "streaming_static_enrichment",
    monitors.streaming_static_enrichment,
    """
    WITH base AS (
      SELECT event_type AS bt,
             (sum(CAST(round(value * 100) AS BIGINT)) / (100.0 * count(*)))
               AS avg_value
      FROM events GROUP BY 1
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN value > 2 * avg_value THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_2x
    FROM events JOIN base ON event_type = bt
    GROUP BY 1
    """,
)

register(
    "streaming_feed_freshness",
    monitors.streaming_feed_freshness,
    """
    SELECT event_type AS source,
           max(ts) AS last_update,
           count(*) AS n_arrivals
    FROM events GROUP BY 1
    """,
)

register(
    "embedding_centroids",
    lambda spark, sf: similarity.embedding_centroids(
        *_t(spark, sf, "embeddings")),
    """
    WITH ex AS (
      SELECT label, CAST(u.i - 1 AS INT) AS dim_idx, v[u.i] AS x
      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    )
    SELECT label, dim_idx, count(*) AS n_vecs,
           (floor(sum(CAST(floor(x * 1000000.0) AS BIGINT)) / count(*))
            / 1000000.0) AS centroid
    FROM ex
    GROUP BY label, dim_idx
    ORDER BY label, dim_idx
    """,
)

# Shared with the dedup_verified_clusters oracle below. The table is
# a parameter so the dedup_cascade_report oracle can run the same
# pipeline over a survivors CTE instead of the base view.
def _lsh_verified_sql(tbl: str = "documents",
                      threshold: float = 0.5) -> str:
    return f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM {tbl})
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), ex AS (
      SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh
    ), common AS (
      SELECT cand.doc_a, cand.doc_b, count(*) AS n_common,
             max(ea.n) AS n_a, max(eb.n) AS n_b
      FROM cand
      JOIN ex ea ON ea.doc_id = cand.doc_a
      JOIN ex eb ON eb.doc_id = cand.doc_b AND eb.g = ea.g
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           (floor((n_common * 1.0 / (n_a + n_b - n_common)) * 1000000.0)
            / 1000000.0) AS jaccard
    FROM common
    WHERE n_common * 1.0 / (n_a + n_b - n_common) >= {threshold}
    ORDER BY doc_a, doc_b
    """


_LSH_VERIFIED_SQL = _lsh_verified_sql()

register(
    "dedup_lsh_verified",
    lambda spark, sf: dedup.dedup_lsh_verified(*_t(spark, sf, "documents")),
    _LSH_VERIFIED_SQL,
)

register(
    # long-format variant (exact integer histogram) so the result is
    # canonicalizable + oracle-checkable; multimodal.multimodal_features
    # (array<float>) remains the library API
    "multimodal_features",
    lambda spark, sf: multimodal.multimodal_features_long(
        *_t(spark, sf, "documents")),
    """
    WITH chars AS (
      SELECT doc_id, ord(substr(text, u.i, 1)) % 16 AS b
      FROM documents,
           LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) u
    ), counts AS (
      SELECT doc_id, b AS dim_idx, count(*) AS cnt FROM chars GROUP BY 1, 2
    ), dims AS (
      SELECT doc_id, CAST(u.d AS INT) AS dim_idx
      FROM documents, LATERAL (SELECT unnest(range(0, 16)) AS d) u
    ), f AS (
      SELECT dims.doc_id, dims.dim_idx,
             CAST(coalesce(cnt, 0) AS BIGINT) AS bucket_count
      FROM dims LEFT JOIN counts
        ON dims.doc_id = counts.doc_id AND dims.dim_idx = counts.dim_idx
    )
    SELECT doc_id, dim_idx, bucket_count,
           CAST(sum(bucket_count * bucket_count)
                OVER (PARTITION BY doc_id) AS BIGINT) AS feat_norm_sq
    FROM f
    """,
)

register(
    # fake header parse is byte arithmetic → SQL-expressible oracle
    "multimodal_resize_plan",
    lambda spark, sf: multimodal.multimodal_resize_plan(
        *_t(spark, sf, "documents")),
    """
    SELECT doc_id,
           CAST(64 + ord(substr(text, 1, 1)) % 1920 AS INT) AS width,
           CAST(64 + ord(substr(text, length(text), 1)) % 1080 AS INT)
             AS height,
           CAST(224 AS INT) AS out_width,
           CAST(224 AS INT) AS out_height,
           CAST(224 * 224 * 3 AS INT) AS n_bytes_out
    FROM documents
    """,
)

register(
    "keyword_search_tfidf",
    lambda spark, sf: textanalysis.keyword_search_tfidf(
        *_t(spark, sf, "documents")),
    f"""
    WITH ex AS (
      SELECT doc_id, unnest({_TOKENS}) AS w FROM documents
    ), fex AS (
      SELECT doc_id, w FROM ex WHERE w IN ('spark', 'query', 'fast')
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM fex GROUP BY 1, 2
    ), dfc AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id,
           (floor(sum(tf * ln(n_docs * 1.0 / df)) * 10000.0) / 10000.0)
             AS score
    FROM tf JOIN dfc USING (w), n
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)

register(
    "ngram_frequencies",
    lambda spark, sf: textanalysis.ngram_frequencies(
        *_t(spark, sf, "documents")),
    f"""
    SELECT w, count(*) AS n
    FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, w
    LIMIT 50
    """,
)

def _bpe_rounds_sql(n_merges: int) -> str:
    """Unrolled-CTE twin of operators/textanalysis._bpe_learn
    (VERDICT r8 #4): ``n_merges`` BPE rounds as a static CTE chain —
    s0 is the char-segmented distinct-word relation; each round picks
    the argmax pair (ties: lexicographic) and applies it greedily
    left-to-right. The greedy non-overlap is relational: consecutive
    match positions only occur when left==right symbol, so keeping
    the even offsets within each run of consecutive matches is
    EXACTLY the left-to-right fold the Spark side computes."""
    parts = [f"""
    w0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
      GROUP BY w
    ), s0 AS MATERIALIZED (
      SELECT w, n,
             list_transform(generate_series(1, length(w)),
                            i -> substr(w, CAST(i AS INT), 1)) AS syms
      FROM w0
    )"""]
    for r in range(1, n_merges + 1):
        q = r - 1
        parts.append(f"""
    p{r} AS MATERIALIZED (
      SELECT list_extract(syms, CAST(gs AS INT)) AS p1,
             list_extract(syms, CAST(gs AS INT) + 1) AS p2,
             CAST(sum(n) AS BIGINT) AS cnt
      FROM (SELECT n, syms,
                   unnest(generate_series(1, len(syms) - 1)) AS gs
            FROM s{q} WHERE len(syms) >= 2)
      GROUP BY 1, 2
      ORDER BY cnt DESC, p1, p2
      LIMIT 1
    ), e{r} AS MATERIALIZED (
      SELECT w, n, CAST(gs AS INT) AS pos,
             list_extract(syms, CAST(gs AS INT)) AS sym
      FROM (SELECT w, n, syms,
                   unnest(generate_series(1, len(syms))) AS gs
            FROM s{q})
    ), m{r} AS MATERIALIZED (
      SELECT e.w, e.pos
      FROM e{r} e
      JOIN e{r} e2 ON e2.w = e.w AND e2.pos = e.pos + 1, p{r}
      WHERE e.sym = p{r}.p1 AND e2.sym = p{r}.p2
    ), g{r} AS MATERIALIZED (
      SELECT w, pos FROM (
        SELECT w, pos,
               pos - min(pos) OVER (PARTITION BY w, grp) AS off
        FROM (SELECT w, pos,
                     pos - row_number()
                           OVER (PARTITION BY w ORDER BY pos) AS grp
              FROM m{r})
      ) WHERE off % 2 = 0
    ), s{r} AS MATERIALIZED (
      SELECT e.w, e.n,
             list(CASE WHEN gm.pos IS NOT NULL THEN e.sym || ln.sym
                       ELSE e.sym END ORDER BY e.pos) AS syms
      FROM e{r} e
      LEFT JOIN g{r} gm ON gm.w = e.w AND gm.pos = e.pos
      LEFT JOIN g{r} gd ON gd.w = e.w AND gd.pos = e.pos - 1
      LEFT JOIN e{r} ln ON ln.w = e.w AND ln.pos = e.pos + 1
      WHERE gd.pos IS NULL
      GROUP BY e.w, e.n
    )""")
    return ", ".join(parts)


_BPE_N = 8

register(
    "bpe_vocab",
    lambda spark, sf: textanalysis.bpe_vocab(
        *_t(spark, sf, "documents"), n_merges=_BPE_N),
    "WITH " + _bpe_rounds_sql(_BPE_N) + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_round, p1 AS left_sym, "
        f"p2 AS right_sym, p1 || p2 AS merged, cnt AS pair_count "
        f"FROM p{r}" for r in range(1, _BPE_N + 1))
    + "\n    ORDER BY merge_round",
    family="text",
    tier="headline",
)

register(
    "bpe_token_ids",
    lambda spark, sf: textanalysis.bpe_token_ids(
        *_t(spark, sf, "documents"), n_merges=_BPE_N),
    "WITH " + _bpe_rounds_sql(_BPE_N) + f""",
    vs AS (
      SELECT n, unnest(syms) AS sym FROM s{_BPE_N}
    ), vid AS (
      SELECT sym,
             CAST(row_number() OVER (ORDER BY tok_n DESC, sym) AS INT)
               AS token_id
      FROM (SELECT sym, CAST(sum(n) AS BIGINT) AS tok_n
            FROM vs GROUP BY sym)
    ), docw AS (
      SELECT doc_id, CAST(gs AS INT) AS word_pos,
             list_extract(toks, CAST(gs AS INT)) AS w
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS gs
            FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents))
    ), sub AS (
      SELECT doc_id, word_pos, CAST(gs AS INT) AS sub_pos,
             list_extract(syms, CAST(gs AS INT)) AS token
      FROM (SELECT d.doc_id, d.word_pos, s.syms,
                   unnest(generate_series(1, len(s.syms))) AS gs
            FROM docw d JOIN s{_BPE_N} s ON s.w = d.w)
    )
    SELECT sub.doc_id, sub.word_pos, sub.sub_pos, v.token_id,
           sub.token
    FROM sub JOIN vid v ON v.sym = sub.token
    """,
    family="text",
    tier="headline",
)

# Tokenizer-realistic merge depth (VERDICT r9 #4): 64 sequential
# rounds. Measured rounds-cost curve at sf1 (local[32]): 8 merges
# 9.3 s cold, 16/32/64 merges 4.3/6.3/9.4 s warm — ~0.15 s/round
# steady-state, so round latency does NOT dominate and the
# frequency-gap batching contingency stays unimplemented by
# evidence, not by omission. The oracle is the same unrolled CTE,
# 64 rounds deep, each round MATERIALIZED (DuckDB's per-round
# checkpoint; 4.3 s at sf0.01).
_BPE_DEEP_N = 64

register(
    "bpe_vocab_deep",
    lambda spark, sf: textanalysis.bpe_vocab(
        *_t(spark, sf, "documents"), n_merges=_BPE_DEEP_N),
    "WITH " + _bpe_rounds_sql(_BPE_DEEP_N) + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_round, p1 AS left_sym, "
        f"p2 AS right_sym, p1 || p2 AS merged, cnt AS pair_count "
        f"FROM p{r}" for r in range(1, _BPE_DEEP_N + 1))
    + "\n    ORDER BY merge_round",
    family="text",
    # headline: BENCH tracks the 64-round induction cost per round
    tier="headline",
)

register(
    "bpe_merge_candidates",
    lambda spark, sf: textanalysis.bpe_merge_candidates(
        *_t(spark, sf, "documents")),
    f"""
    WITH words AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
      GROUP BY w
    ), pairs AS (
      SELECT w, substr(w, CAST(gs AS INT), 2) AS pair, n
      FROM (SELECT w, n,
                   unnest(generate_series(1, length(w) - 1)) AS gs
            FROM words WHERE length(w) >= 2)
    ), agg AS (
      SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words
      FROM pairs GROUP BY pair
    )
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair)
                AS INT) AS rank,
           pair, n_occurrences, n_distinct_words
    FROM agg ORDER BY rank LIMIT 50
    """,
    family="text",
)


def _cc_oracle(pair_sql: str, a: str = "doc_a", b: str = "doc_b") -> str:
    """Connected-components oracle over ANY candidate-pair subquery
    via a DuckDB recursive CTE (VERDICT r6 #3: upgrades the iterative
    clustering trio from rows-only to hash-exact at test SFs).

    ``walk`` is the transitive closure of the undirected edge set
    (UNION dedups, so it terminates); each node's component label is
    the MIN reachable id — exactly what the Spark side's min-label
    propagation + pointer doubling converges to. The closure is
    O(Σ|component|²) rows, fine at oracle scale; the Spark side stays
    the O(log diameter) pointer-doubling loop for real scale."""
    return f"""
    WITH RECURSIVE base AS (
      {pair_sql}
    ), edges AS (
      SELECT {a} AS src, {b} AS dst FROM base
      UNION ALL
      SELECT {b}, {a} FROM base
    ), walk(src, reach) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ), comp AS (
      SELECT src AS doc_id, least(src, min(reach)) AS label
      FROM walk GROUP BY src
    )
    SELECT label AS cluster_id,
           CAST(count(*) AS BIGINT) AS cluster_size,
           min(doc_id) AS keeper_doc_id
    FROM comp
    GROUP BY label
    HAVING count(*) > 1
    ORDER BY cluster_id
    """


register(
    "dedup_clusters",
    # iterative label propagation on the Spark side (pointer
    # doubling); the oracle computes the same components exactly via
    # a recursive CTE over the same MinHash-LSH candidate pairs
    lambda spark, sf: dedup.dedup_clusters(*_t(spark, sf, "documents")),
    _cc_oracle(_MINHASH_PAIRS_SQL),
)

def _kmeans_ctes(n_iter: int = 3, k: int = 16) -> str:
    """CTE chain replaying kmeans_centroids EXACTLY: the Spark loop
    has a fixed iteration count, md5-deterministic seeds, a
    round(cos,6)+cent_id argmax assignment, and floor-micro-unit
    integer centroid means — every step a pure function of the scan —
    so n_iter unrolled rounds of (rebuild cv/cnrm → assign → update)
    reproduce it bit-for-bit. cl{r} is the long-format centroid
    relation after round r; cl0 is the raw seed vectors (r7: this
    upgrades the Lloyd's pair from rows-only to hash-exact)."""
    ctes = [
        f"n AS ({_EMB_NORMED})",
        f"""seeds AS (
      SELECT vec_id AS cent_id, v FROM n
      ORDER BY {_md5int("CAST(vec_id AS VARCHAR)")}, vec_id LIMIT {k}
    )""",
        """cl0 AS (
      SELECT cent_id, CAST(u.i - 1 AS INT) AS dim_idx, v[u.i] AS c
      FROM seeds, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    )""",
    ]
    for r in range(1, n_iter + 1):
        ctes.append(f"""cn{r} AS (
      SELECT cent_id, cv, sqrt({_dot('cv', 'cv')}) AS cnrm
      FROM (SELECT cent_id, list(c ORDER BY dim_idx) AS cv
            FROM cl{r - 1} GROUP BY cent_id)
    )""")
        ctes.append(f"""asg{r} AS (
      SELECT vec_id, cent_id, v FROM (
        SELECT n.vec_id, c.cent_id, n.v,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'c.cv')} / (n.nrm * c.cnrm), 6)
                          DESC, c.cent_id) AS rn
        FROM n, cn{r} c) WHERE rn = 1
    )""")
        ctes.append(f"""cl{r} AS (
      SELECT cent_id, dim_idx,
             floor(sum(CAST(floor(x * 1000000.0) AS BIGINT)) / count(*))
               / 1000000.0 AS c
      FROM (SELECT cent_id, CAST(u.i - 1 AS INT) AS dim_idx, v[u.i] AS x
            FROM asg{r},
                 LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u)
      GROUP BY cent_id, dim_idx
    )""")
    return ",\n    ".join(ctes)


register(
    "ann_kmeans_centroids",
    # iterative Lloyd's refinement, fixed n_iter — replayed exactly by
    # the unrolled CTE rounds of _kmeans_ctes (hash-exact since r7)
    lambda spark, sf: similarity.kmeans_centroids(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_kmeans_ctes(3, 16)}
    SELECT cent_id, dim_idx, c FROM cl3 ORDER BY cent_id, dim_idx
    """,
)

_ROT_BUCKETS = " || ',' || ".join(
    f"('{t}|' || CAST(CAST(floor((((simhash * {2**(8*t)}) % {2**32}) + "
    f"CAST(floor(simhash / {float(2**(32-8*t))}) AS BIGINT)) / 65536.0) "
    f"AS BIGINT) AS VARCHAR))"
    for t in range(4))
register(
    "dedup_simhash_multitable",
    lambda spark, sf: dedup.dedup_simhash_multitable(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, list_transform({_TOKENS}, w -> {_md5int('w')}) AS xs
      FROM documents
    ), b AS (
      SELECT doc_id, {_SIMHASH_BITS} AS bits FROM toks
    ), s AS (
      SELECT doc_id, {_SIMHASH} AS simhash FROM b
    ), keys AS (
      SELECT doc_id, simhash,
             unnest(str_split({_ROT_BUCKETS}, ',')) AS bk
      FROM s
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM keys a JOIN keys b ON a.bk = b.bk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    ORDER BY doc_a, doc_b
    """,
)

register(
    "ann_ivf_kmeans_topk",
    # k-means training replayed via the unrolled _kmeans_ctes rounds,
    # then the same probe/search tail as the ann_ivf_topk oracle over
    # the refined centroids (hash-exact since r7)
    lambda spark, sf: similarity.ann_ivf_kmeans_topk(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_kmeans_ctes(3, 16)},
    cents AS (
      SELECT cent_id, cv, sqrt({_dot('cv', 'cv')}) AS cnrm
      FROM (SELECT cent_id, list(c ORDER BY dim_idx) AS cv
            FROM cl3 GROUP BY cent_id)
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, cent_id FROM (
        SELECT n.vec_id AS query_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents WHERE n.vec_id < 5
      ) WHERE rn <= 2
    ), cands AS (
      SELECT probes.query_id, assign.vec_id
      FROM probes JOIN assign ON probes.cent_id = assign.cent_id
      WHERE assign.vec_id != probes.query_id
    ), scored AS (
      SELECT cands.query_id, cands.vec_id AS neighbor_id,
             round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6) AS score
      FROM cands
      JOIN n c ON cands.vec_id = c.vec_id
      JOIN n q ON cands.query_id = q.vec_id
    )
    SELECT query_id, neighbor_id, score,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)


# ---------------------------------------------------------------------------
# r4 additions: prefix dedup, BPE-ish token estimate, RP-LSH ANN
# ---------------------------------------------------------------------------

register(
    "dedup_prefix_hash",
    lambda spark, sf: dedup.dedup_prefix_hash(*_t(spark, sf, "documents")),
    f"""
    SELECT min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies,
           (count(*) > 1) AS had_duplicates
    FROM (
      SELECT doc_id, md5(array_to_string(t[1:20], ' ')) AS ph
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
    )
    GROUP BY ph
    """,
)

register(
    "text_token_estimate",
    lambda spark, sf: textanalysis.text_token_estimate(
        *_t(spark, sf, "documents")),
    """
    WITH a AS (
      SELECT doc_id, n_chars,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]') AS arr
      FROM documents
    ), agg AS (
      SELECT doc_id,
             CAST(len(arr) AS BIGINT) AS n_pretokens,
             CAST(list_reduce(
               [CAST(0 AS BIGINT)] || list_transform(arr,
                 tk -> CAST(floor((length(tk) + 3) / 4) AS BIGINT)),
               (acc, x) -> acc + x) AS BIGINT) AS est_bpe_tokens,
             n_chars
      FROM a
    )
    SELECT doc_id, n_pretokens, est_bpe_tokens, n_chars,
           CASE WHEN est_bpe_tokens > 0
                THEN floor(n_chars * 1e4 / est_bpe_tokens) / 1e4
                ELSE 0.0 END AS chars_per_token
    FROM agg ORDER BY doc_id
    """,
)


def _rp_signed_sum(t: int, j: int, dim: int = 64) -> str:
    """DuckDB twin of similarity.ann_rp_lsh_topk's signed projection:
    same rp_sign values over the same integer micro-units (integer
    addition is order-independent, so the chain form here equals the
    Spark aggregate exactly)."""
    parts = []
    for d in range(dim):
        s = similarity.rp_sign(t, j, d)
        term = f"CAST(floor(v[{d + 1}] * 1e6) AS BIGINT)"
        if d == 0:
            parts.append(term if s > 0 else f"(- {term})")
        else:
            parts.append(f"{'+' if s > 0 else '-'} {term}")
    return " ".join(parts)


def _rp_bucket(t: int, n_planes: int = 4) -> str:
    return " + ".join(
        f"(CASE WHEN ({_rp_signed_sum(t, j)}) > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(n_planes))


_RP_KEYS = "\n      UNION ALL\n".join(
    f"      SELECT vec_id, v, nrm, {t} AS t, ({_rp_bucket(t)}) AS bucket FROM n"
    for t in range(4))
# The rp oracle unrolls dim=64 into literal SQL terms while the Spark
# side derives dim from the data — if the embeddings testdata ever
# changes dimension, fail loudly instead of silently hashing over
# missing/partial indices (ADVICE r4).
_EMB_NORMED_DIM64 = (
    f"SELECT * FROM ({_EMB_NORMED}) WHERE CASE WHEN len(v) = 64 THEN TRUE "
    "ELSE error('embeddings dim != 64: ann_rp_lsh_topk oracle unrolls "
    "exactly 64 projection terms; regenerate the oracle') END"
)
register(
    "ann_rp_lsh_topk",
    lambda spark, sf: similarity.ann_rp_lsh_topk(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED_DIM64}),
    keys AS (
{_RP_KEYS}
    ), p AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6) AS score
      FROM keys q JOIN keys c ON q.t = c.t AND q.bucket = c.bucket
      WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
    ), r AS (
      SELECT query_id, neighbor_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS INT) AS rank
      FROM p
    )
    SELECT query_id, neighbor_id, score, rank FROM r
    WHERE rank <= 10 ORDER BY query_id, rank
    """,
)


# IVF-PQ: coarse cells + residual PQ (r4). Fragments reuse the IVF
# assignment/probe CTEs and the PQ struct-min argmin.
_RESID = "list_transform(range(1, len(v) + 1), i -> v[i] - cv[i])"
_QRESID = "list_transform(range(1, len(qv) + 1), i -> qv[i] - cv[i])"
register(
    "ann_ivf_pq_topk",
    lambda spark, sf: similarity.ann_ivf_pq_topk(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS ({_PQ_CENTS}),
    cb AS (
      SELECT vec_id AS code, v AS cbv FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT 16
    ),
    subm AS (SELECT unnest(range(0, 8)) AS m),
    assign0 AS (
      -- integer micro-unit score: matches the Arrow-side
      -- floor(cosine*1e6) tie-break bit-exactly
      SELECT n.vec_id, cents.cent_id, n.v, cents.cv,
             row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY CAST(floor({_dot('n.v', 'cents.cv')}
                                   / (n.nrm * cents.cnrm) * 1e6)
                             AS BIGINT) DESC,
                        cents.cent_id) AS rn
      FROM n, cents
    ), assign AS (
      SELECT vec_id, cent_id, {_RESID} AS r
      FROM assign0 WHERE rn = 1
    ), enc AS (
      SELECT assign.vec_id, assign.cent_id, cb.code, subm.m,
             {_l2sq('(assign.r[(subm.m*8+1):(subm.m*8+8)])',
                    '(cb.cbv[(subm.m*8+1):(subm.m*8+8)])')} AS d
      FROM assign, cb, subm
    ), codes AS (
      SELECT vec_id, cent_id, m, (min({{'d': d, 'c': code}})).c AS code
      FROM enc GROUP BY vec_id, cent_id, m
    ), q AS (
      SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n
      WHERE vec_id < 5
    ), probes0 AS (
      SELECT q.query_id, cents.cent_id, q.qv, cents.cv,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round({_dot('q.qv', 'cents.cv')}
                              / (q.qnrm * cents.cnrm), 6) DESC,
                        cents.cent_id) AS rn
      FROM q, cents
    ), probes AS (
      SELECT query_id, cent_id, {_QRESID} AS qr
      FROM probes0 WHERE rn <= 4
    ), qt AS (
      SELECT probes.query_id, probes.cent_id, cb.code, subm.m,
             CAST(floor({_l2sq('(probes.qr[(subm.m*8+1):(subm.m*8+8)])',
                               '(cb.cbv[(subm.m*8+1):(subm.m*8+8)])')}
                        * 1000000.0) AS BIGINT) AS qd_u
      FROM probes, cb, subm
    ), scored AS (
      SELECT qt.query_id, codes.vec_id,
             CAST(sum(qd_u) AS BIGINT) AS adist_u
      FROM codes
      JOIN qt ON codes.cent_id = qt.cent_id AND codes.m = qt.m
             AND codes.code = qt.code
      WHERE codes.vec_id != qt.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id AS neighbor_id,
           (adist_u / 1000000.0) AS approx_dist,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adist_u, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10 ORDER BY query_id, rank
    """,
)


register(
    "text_unigram_logprob",
    lambda spark, sf: textanalysis.text_unigram_logprob(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS w FROM documents
    ), vocab AS (
      SELECT w, count(*) AS tf FROM toks GROUP BY w
    ), total AS (
      SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM vocab
    ), scored AS (
      -- per-token nll truncated to integer micro-units BEFORE the
      -- sum, mirroring the Spark side: the bigint sum is exact and
      -- order-independent across both engines
      SELECT doc_id,
             CAST(floor(-ln(tf / n_total) * 1e6) AS BIGINT) AS nll_micro
      FROM toks JOIN vocab USING (w), total
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           (floor(sum(nll_micro) / (count(*) * 100.0)) / 1e4)
             AS avg_neg_logprob
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)


register(
    "dedup_verified_clusters",
    # the full production dedup composition as one registered query:
    # MinHash-LSH candidates -> exact-Jaccard verify -> connected
    # components -> keeper per cluster (iterative on the Spark side;
    # oracle: recursive-CTE closure over the verified-pair SQL)
    lambda spark, sf: dedup.dedup_clusters(
        None,
        edges=dedup._lsh_verified_pairs(*_t(spark, sf, "documents"))),
    _cc_oracle(_LSH_VERIFIED_SQL),
)

# closure CTE chain shared by the per-doc cluster consumers
# (dedup_drop_list, leakage_safe_split): same recursive transitive
# closure as _cc_oracle, stopping at the per-doc (doc_id, label)
# relation instead of aggregating to clusters
_COMP_CTES = f"""base AS (
      {_LSH_VERIFIED_SQL}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM base
      UNION ALL
      SELECT doc_b, doc_a FROM base
    ), walk(src, reach) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ), comp AS (
      SELECT src AS doc_id, least(src, min(reach)) AS label
      FROM walk GROUP BY src
    )"""

register(
    "dedup_drop_list",
    # cluster resolution manifest: keep the highest-quality member of
    # every near-dup cluster, drop the rest (keeper = quality_score
    # DESC, doc_id ASC — both floor-truncated/integer, so the window
    # order is engine-exact)
    lambda spark, sf: dedup.dedup_drop_list(*_t(spark, sf, "documents")),
    f"""
    WITH RECURSIVE {_COMP_CTES}, sized AS (
      SELECT label, CAST(count(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY label HAVING count(*) > 1
    ), qd AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    qf AS (
      SELECT doc_id, len(t) AS n,
             list_reduce([CAST(0 AS BIGINT)]
                         || list_transform(t, x -> length(x)::BIGINT),
                         (acc, x) -> acc + x) AS sum_len,
             len(list_filter(t, x -> list_contains({_STOPS}, x))) AS n_stop
      FROM qd
    ), qg AS (
      SELECT doc_id,
             sum_len / greatest(n, 1) AS mean_len,
             n_stop / greatest(n, 1) AS stop_ratio,
             least(n / 100.0, 1.0) AS len_score
      FROM qf
    ), q AS (
      SELECT doc_id,
             (floor((0.5 * len_score + 0.3 * stop_ratio
                     + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 10.0
                              THEN 1.0 ELSE 0.0 END)) * 10000.0) / 10000.0)
               AS quality_score
      FROM qg
    ), k AS (
      SELECT comp.doc_id, comp.label, sized.cluster_size, q.quality_score,
             first_value(comp.doc_id) OVER (
               PARTITION BY comp.label
               ORDER BY q.quality_score DESC, comp.doc_id) AS keeper_doc_id
      FROM comp JOIN sized USING (label) JOIN q USING (doc_id)
    )
    SELECT doc_id, label AS cluster_id, cluster_size, quality_score,
           keeper_doc_id,
           CASE WHEN doc_id = keeper_doc_id THEN 'keep' ELSE 'drop' END
             AS action
    FROM k ORDER BY cluster_id, doc_id
    """,
)

register(
    "dedup_rate_report",
    # one-row corpus dedup audit: clustered docs, clusters, docs a
    # keep-one resolution drops, drop rate in integer micro-units
    lambda spark, sf: dedup.dedup_rate_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH RECURSIVE {_COMP_CTES}, sized AS (
      SELECT label, count(*) AS sz
      FROM comp GROUP BY label HAVING count(*) > 1
    ), stats AS (
      SELECT CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_clustered_docs,
             CAST(count(*) AS BIGINT) AS n_clusters
      FROM sized
    ), corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT n_docs, n_clustered_docs, n_clusters,
           CAST(n_clustered_docs - n_clusters AS BIGINT) AS n_to_drop,
           CAST(floor((n_clustered_docs - n_clusters) * 1000000.0
                      / n_docs) AS BIGINT) AS drop_rate_e6
    FROM corpus, stats
    """,
)

register(
    "chunk_dedup_exact",
    # chunk-grain exact dedup: recurring doc_chunk_plan token windows
    # (copy-pasted sections whole-doc dedup cannot see); shuffle
    # carries 32-char digests, output bounded by HAVING count > 1
    lambda spark, sf: dedup.chunk_dedup_exact(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    base AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS nt FROM d),
    nc AS (
      SELECT doc_id, t, nt,
             greatest(CAST(1 AS BIGINT),
                      CAST(floor((nt - 16 + 47) / 48.0) AS BIGINT))
               AS n_chunks
      FROM base
    ), ch AS (
      SELECT doc_id, t, nt, unnest(range(0, n_chunks)) AS chunk_idx
      FROM nc
    ), w AS (
      SELECT doc_id, chunk_idx, t,
             chunk_idx * 48 AS s,
             least(chunk_idx * 48 + 64, nt) AS e
      FROM ch
    ), h AS (
      -- e > s drops empty windows (zero-token docs would all collide
      -- on md5('')); struct-min exemplar is id-range-safe
      SELECT doc_id, chunk_idx,
             md5(array_to_string(list_slice(t, s + 1, e), ' '))
               AS chunk_hash
      FROM w WHERE e > s
    )
    SELECT chunk_hash,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           (min(struct_pack(d := doc_id, c := chunk_idx))).d
             AS exemplar_doc_id,
           (min(struct_pack(d := doc_id, c := chunk_idx))).c
             AS exemplar_chunk_idx
    FROM h GROUP BY chunk_hash HAVING count(*) > 1
    ORDER BY chunk_hash
    """,
)

register(
    "leakage_safe_split",
    # split by cluster label (own doc_id for singletons): near-dup
    # clusters can never straddle train/val — the fix for what
    # split_leakage_check detects
    lambda spark, sf: dedup.leakage_safe_split(
        *_t(spark, sf, "documents")),
    f"""
    WITH RECURSIVE {_COMP_CTES}, s AS (
      SELECT d.doc_id, coalesce(comp.label, d.doc_id) AS split_key
      FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id
    )
    SELECT doc_id, split_key,
           ({_md5int('CAST(split_key AS VARCHAR)')} % 100) AS bucket,
           CASE WHEN {_md5int('CAST(split_key AS VARCHAR)')} % 100 < 10
                THEN 'val' ELSE 'train' END AS split
    FROM s ORDER BY doc_id
    """,
)


# knn-graph CTE chain, shared by knn_graph_cells and pagerank_knn
_KNN_CTES = f"""n AS ({_EMB_NORMED}),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT {_K_AUTO}
    ), assign AS (
      -- floor micro-unit argmax: assign_cells_arrow's exact tie rule
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY CAST(floor({_dot('n.v', 'cv')} / (n.nrm * cnrm)
                               * 1000000) AS BIGINT) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), pairs AS (
      SELECT x.vec_id AS vec_id, y.vec_id AS neighbor_id,
             {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos_raw
      FROM assign x
      JOIN assign y ON x.cent_id = y.cent_id AND x.vec_id != y.vec_id
      JOIN n a ON a.vec_id = x.vec_id
      JOIN n b ON b.vec_id = y.vec_id
    ), r AS (
      SELECT vec_id, neighbor_id, cos_raw,
             CAST(row_number() OVER (PARTITION BY vec_id
                  ORDER BY cos_raw DESC, neighbor_id) AS INT) AS rank
      FROM pairs
    )"""

register(
    "knn_graph_cells",
    lambda spark, sf: similarity.knn_graph_cells(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_KNN_CTES}
    SELECT vec_id, neighbor_id, round(cos_raw, 6) AS cosine, rank
    FROM r WHERE rank <= 5
    ORDER BY vec_id, rank
    """,
)


def _pr_round(prev: str, cur: str) -> str:
    """One unrolled PageRank round: integer e6 mass, floor per-edge
    contribution, BIGINT-cast sums (DuckDB sums to HUGEINT
    otherwise)."""
    return f"""{cur} AS (
      SELECT nodes.node,
             CAST(150000 + coalesce(inc.in_mass, 0) AS BIGINT) AS mass
      FROM nodes LEFT JOIN (
        SELECT e.dst AS node,
               CAST(sum(CAST(floor(m.mass * 85 / (d.out_deg * 100))
                             AS BIGINT)) AS BIGINT) AS in_mass
        FROM edges e
        JOIN deg d ON e.src = d.src
        JOIN {prev} m ON e.src = m.node
        GROUP BY 1) inc ON nodes.node = inc.node
    )"""


register(
    "pagerank_knn",
    lambda spark, sf: graph.pagerank_knn(*_t(spark, sf, "embeddings")),
    f"""
    WITH {_KNN_CTES},
    edges AS (
      SELECT vec_id AS src, neighbor_id AS dst FROM r WHERE rank <= 5
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
            FROM edges GROUP BY 1),
    nodes AS (SELECT vec_id AS node FROM embeddings),
    m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass FROM nodes),
    {_pr_round('m0', 'm1')},
    {_pr_round('m1', 'm2')},
    {_pr_round('m2', 'm3')}
    SELECT node AS vec_id, mass AS pagerank_e6 FROM m3 ORDER BY vec_id
    """,
)


register(
    "multimodal_dedup_exact",
    lambda spark, sf: multimodal.multimodal_dedup_exact(
        *_t(spark, sf, "documents")),
    """
    SELECT min(doc_id) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           (count(*) > 1) AS had_duplicates
    FROM documents
    GROUP BY md5(text)
    ORDER BY keeper_doc_id
    """,
)


register(
    "dedup_incremental",
    lambda spark, sf: dedup.dedup_incremental(
        _t(spark, sf, "documents")[0].filter("doc_id % 20 = 0"),
        _t(spark, sf, "documents")[0].filter("doc_id % 20 != 0")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    )
    SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
    FROM keys n JOIN keys c ON n.bkey = c.bkey
    WHERE n.doc_id % 20 = 0 AND c.doc_id % 20 != 0
    ORDER BY new_doc_id, corpus_doc_id
    """,
)


register(
    "source_quality_report",
    lambda spark, sf: textanalysis.source_quality_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH d AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    f AS (
      SELECT doc_id,
             len(t) AS n,
             list_reduce([CAST(0 AS BIGINT)] || list_transform(t, x -> length(x)::BIGINT),
                         (acc, x) -> acc + x) AS sum_len,
             len(list_filter(t, x -> list_contains({_STOPS}, x))) AS n_stop
      FROM d
    ), g AS (
      SELECT doc_id, n,
             sum_len / greatest(n, 1) AS mean_len,
             n_stop / greatest(n, 1) AS stop_ratio,
             least(n / 100.0, 1.0) AS len_score
      FROM f
    ), q AS (
      SELECT doc_id,
             CAST(round((floor((0.5 * len_score + 0.3 * stop_ratio
                   + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 10.0
                            THEN 1.0 ELSE 0.0 END)) * 10000.0) / 10000.0)
                  * 10000.0) AS BIGINT) AS q_e4
      FROM g
    ), base AS (
      SELECT doc_id, source,
             greatest(CAST(floor((n_chars + 3) / 4) AS BIGINT), 1)
               AS est_tokens,
             md5(text) AS h
      FROM documents
    ), agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
             CAST(sum(est_tokens) AS BIGINT) AS total_est_tokens,
             CAST(sum(q_e4) AS BIGINT) AS sum_q,
             CAST(sum(CASE WHEN q_e4 >= 5000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good
      FROM base JOIN q USING (doc_id)
      GROUP BY 1
    )
    SELECT source, n_docs, n_unique,
           CAST(floor((n_docs - n_unique) * 1e6 / n_docs) AS BIGINT)
             AS dup_rate_e6,
           total_est_tokens,
           CAST(floor(sum_q / n_docs) AS BIGINT) AS mean_quality_e4,
           CAST(floor(n_good * 1e6 / n_docs) AS BIGINT) AS good_share_e6
    FROM agg
    ORDER BY source
    """,
)


register(
    "dedup_containment",
    lambda spark, sf: dedup.dedup_containment(*_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ex0 AS (
      SELECT doc_id, {_md5int('unnest(s)')} AS g FROM sh
    ), keep AS (
      SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 10000
    ), ex AS (
      SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, g
      FROM ex0 WHERE g IN (SELECT g FROM keep)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_common, max(a.n) AS n_a, max(b.n) AS n_b
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           (floor((n_common * 1.0 / least(n_a, n_b)) * 1000000.0)
            / 1000000.0) AS containment,
           CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc
    FROM pairs
    WHERE n_common * 1.0 / least(n_a, n_b) >= 0.7
    ORDER BY doc_a, doc_b
    """,
)

register(
    "cross_source_overlap",
    lambda spark, sf: dedup.cross_source_overlap(*_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, source, {_SHINGLES} AS s
      FROM (SELECT doc_id, source, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ex0 AS (
      SELECT source, {_md5int('unnest(s)')} AS h FROM sh
    ), ex AS (
      SELECT DISTINCT source, h FROM ex0
    ), per AS (
      SELECT source, count(*) AS n FROM ex GROUP BY 1
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             count(*) AS shared_shingles
      FROM ex a JOIN ex b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, shared_shingles, pa.n AS n_a, pb.n AS n_b,
           (floor((shared_shingles * 1.0 / (pa.n + pb.n - shared_shingles))
                  * 1000000.0) / 1000000.0) AS overlap_jaccard,
           (floor((shared_shingles * 1.0 / least(pa.n, pb.n))
                  * 1000000.0) / 1000000.0) AS containment
    FROM pairs
    JOIN per pa ON pairs.src_a = pa.source
    JOIN per pb ON pairs.src_b = pb.source
    ORDER BY src_a, src_b
    """,
)

register(
    "bm25_search",
    lambda spark, sf: textanalysis.bm25_search(*_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS w FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), st AS (
      SELECT CAST(sum(dl) AS BIGINT) AS sum_dl, count(*) AS n_docs FROM dl
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM toks
      WHERE w IN ('spark', 'query', 'fast') GROUP BY 1, 2
    ), dfc AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), sc AS (
      SELECT t.doc_id,
             CAST(floor(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                  * (t.tf * 2.2)
                  / (t.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * l.dl / (st.sum_dl / st.n_docs)))
                  * 1000000.0) AS BIGINT) AS c_e6
      FROM tf t JOIN dfc d USING (w) JOIN dl l USING (doc_id), st
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
           (floor(sum(c_e6) / 100.0) / 10000.0) AS score
    FROM sc GROUP BY 1
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)

register(
    "source_ngram_novelty",
    lambda spark, sf: textanalysis.source_ngram_novelty(
        *_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, source, {_SHINGLES} AS s
      FROM (SELECT doc_id, source, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ex0 AS (
      SELECT source, {_md5int('unnest(s)')} AS h FROM sh
    ), ex AS (
      SELECT DISTINCT source, h FROM ex0
    ), b AS (
      SELECT h, count(*) AS k FROM ex GROUP BY 1
    )
    SELECT source, count(*) AS distinct_shingles,
           CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_shingles,
           CAST(floor(CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      * 1000000.0 / count(*)) AS BIGINT) AS novelty_e6
    FROM ex JOIN b USING (h)
    GROUP BY 1
    ORDER BY source
    """,
)


register(
    "vocab_coverage",
    lambda spark, sf: textanalysis.vocab_coverage(
        *_t(spark, sf, "documents")),
    f"""
    WITH vocab AS (
      SELECT w, count(*) AS n
      FROM (SELECT unnest({_TOKENS}) AS w FROM documents) GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS vocab_size
      FROM vocab
    ), ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rank,
             CAST(sum(n) OVER (ORDER BY n DESC, w
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum
      FROM vocab
    )
    SELECT least(rank, vocab_size) AS k, cum AS covered_tokens, total,
           CAST(floor(cum * 1e6 / total) AS BIGINT) AS coverage_e6
    FROM ranked, tot
    WHERE rank IN (10, 100, 1000)
       OR (rank = vocab_size AND vocab_size < 1000)
    ORDER BY k
    """,
)

register(
    "source_token_entropy",
    lambda spark, sf: textanalysis.source_token_entropy(
        *_t(spark, sf, "documents")),
    f"""
    WITH stw AS (
      SELECT source, w, count(*) AS n
      FROM (SELECT source, unnest({_TOKENS}) AS w FROM documents)
      GROUP BY 1, 2
    ), per AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
             count(*) AS vocab_size,
             CAST(sum(CAST(floor(n * ln(n) * 1000000.0) AS BIGINT))
                  AS BIGINT) AS nlogn_e6
      FROM stw GROUP BY 1
    )
    SELECT source, n_tokens, vocab_size,
           (floor((ln(n_tokens) - nlogn_e6 / 1000000.0 / n_tokens)
                  * 1000000.0) / 1000000.0) AS entropy_nats
    FROM per ORDER BY source
    """,
)

register(
    "source_divergence_matrix",
    # pairwise JS divergence between per-source unigram distributions:
    # exact per-token double terms floored to e9 ints before the pair
    # sum; unique-token mass in closed form from exact bigint counts;
    # zero-overlap pairs kept by the all-pairs LEFT join (JS = ln 2)
    lambda spark, sf: textanalysis.source_divergence_matrix(
        *_t(spark, sf, "documents")),
    f"""
    WITH stw AS (
      SELECT source, w, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT source, unnest({_TOKENS}) AS w FROM documents)
      GROUP BY 1, 2
    ), totals AS (
      SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM stw GROUP BY 1
    ), per AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(CAST(floor(
               0.5 * ((a.n / CAST(ta.nt AS DOUBLE))
                        * ln((a.n / CAST(ta.nt AS DOUBLE))
                             / (((a.n / CAST(ta.nt AS DOUBLE))
                                 + (b.n / CAST(tb.nt AS DOUBLE))) / 2))
                      + (b.n / CAST(tb.nt AS DOUBLE))
                        * ln((b.n / CAST(tb.nt AS DOUBLE))
                             / (((a.n / CAST(ta.nt AS DOUBLE))
                                 + (b.n / CAST(tb.nt AS DOUBLE))) / 2)))
               * 1000000000.0) AS BIGINT)) AS BIGINT) AS sh_e9,
             CAST(sum(a.n) AS BIGINT) AS sh_na,
             CAST(sum(b.n) AS BIGINT) AS sh_nb,
             CAST(count(*) AS BIGINT) AS n_shared_vocab
      FROM stw a
      JOIN stw b ON a.w = b.w AND a.source < b.source
      JOIN totals ta ON ta.source = a.source
      JOIN totals tb ON tb.source = b.source
      GROUP BY 1, 2
    )
    SELECT ta.source AS src_a, tb.source AS src_b,
           ta.nt AS n_tokens_a, tb.nt AS n_tokens_b,
           coalesce(per.n_shared_vocab, 0) AS n_shared_vocab,
           (floor((coalesce(per.sh_e9, 0) / 1000000000.0
                   + 0.5 * ln(2)
                     * ((ta.nt - coalesce(per.sh_na, 0))
                          / CAST(ta.nt AS DOUBLE)
                        + (tb.nt - coalesce(per.sh_nb, 0))
                          / CAST(tb.nt AS DOUBLE)))
                  * 1000000.0) / 1000000.0) AS js_divergence
    FROM totals ta
    JOIN totals tb ON ta.source < tb.source
    LEFT JOIN per ON per.src_a = ta.source AND per.src_b = tb.source
    ORDER BY src_a, src_b
    """,
)


register(
    "streaming_lsh_ingest",
    monitors.streaming_lsh_ingest,
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    )
    SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
    FROM keys n JOIN keys c ON n.bkey = c.bkey
    WHERE n.doc_id % 20 = 0 AND c.doc_id % 20 != 0
    ORDER BY new_doc_id, corpus_doc_id
    """,
)


register(
    "multimodal_ahash_groups",
    lambda spark, sf: multimodal.multimodal_ahash_groups(
        *_t(spark, sf, "documents")),
    """
    WITH chars AS (
      SELECT doc_id, ord(substr(text, u.i, 1)) % 16 AS b
      FROM documents,
           LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) u
    ), counts AS (
      SELECT doc_id, b AS dim_idx, count(*) AS cnt FROM chars GROUP BY 1, 2
    ), dims AS (
      SELECT doc_id, CAST(u.d AS INT) AS dim_idx
      FROM documents, LATERAL (SELECT unnest(range(0, 16)) AS d) u
    ), f AS (
      SELECT dims.doc_id, dims.dim_idx,
             CAST(coalesce(cnt, 0) AS BIGINT) AS bucket_count
      FROM dims LEFT JOIN counts
        ON dims.doc_id = counts.doc_id AND dims.dim_idx = counts.dim_idx
    ), tot AS (
      SELECT doc_id, CAST(sum(bucket_count) AS BIGINT) AS tot
      FROM f GROUP BY 1
    ), sig AS (
      SELECT f.doc_id,
             CAST(sum(CASE WHEN f.bucket_count * 16 > t.tot
                           THEN CAST(power(2, f.dim_idx) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS ahash
      FROM f JOIN tot t USING (doc_id) GROUP BY 1
    )
    SELECT ahash, min(doc_id) AS keeper_doc_id,
           count(*) AS n_assets,
           (count(*) > 1) AS had_collisions
    FROM sig GROUP BY 1 ORDER BY ahash
    """,
)


register(
    "label_centroid_distances",
    lambda spark, sf: similarity.label_centroid_distances(
        *_t(spark, sf, "embeddings")),
    """
    WITH ex AS (
      SELECT label, CAST(u.i - 1 AS INT) AS dim_idx, v[u.i] AS x
      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    ), cent AS (
      SELECT label, dim_idx,
             CAST(floor(sum(CAST(floor(x * 1000000.0) AS BIGINT))
                        / count(*)) AS BIGINT) AS m
      FROM ex GROUP BY 1, 2
    ), norms AS (
      SELECT label, CAST(sum(m * m) AS BIGINT) AS nsq
      FROM cent GROUP BY 1
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(sum(a.m * b.m) AS BIGINT) AS dot
      FROM cent a JOIN cent b
        ON a.dim_idx = b.dim_idx AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           (floor(dot / sqrt(CAST(na.nsq AS DOUBLE)
                             * CAST(nb.nsq AS DOUBLE)) * 1000000.0)
            / 1000000.0) AS cosine
    FROM dots
    JOIN norms na ON dots.label_a = na.label
    JOIN norms nb ON dots.label_b = nb.label
    WHERE na.nsq > 0 AND nb.nsq > 0
    ORDER BY label_a, label_b
    """,
)


register(
    "token_collocations",
    lambda spark, sf: textanalysis.token_collocations(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, u.i AS pos, t[u.i] AS w
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents),
           LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
    ), big AS (
      SELECT a.w AS w, b.w AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ), nb AS (
      SELECT w, w2, count(*) AS n_ab FROM big GROUP BY 1, 2
    ), uni AS (
      SELECT w, count(*) AS n FROM toks GROUP BY 1
    ), tot AS (SELECT count(*) AS n_tok FROM toks),
       btot AS (SELECT count(*) AS n_big FROM big)
    SELECT nb.w AS w1, nb.w2, nb.n_ab,
           CAST(floor(ln((nb.n_ab / btot.n_big)
                         / ((ua.n / tot.n_tok) * (ub.n / tot.n_tok)))
                      * 1000000.0) AS BIGINT) AS pmi_e6
    FROM nb
    JOIN uni ua ON nb.w = ua.w
    JOIN uni ub ON nb.w2 = ub.w
    CROSS JOIN tot CROSS JOIN btot
    WHERE nb.n_ab >= 5
    ORDER BY pmi_e6 DESC, w1, w2
    LIMIT 50
    """,
)


def _split_leakage(spark, sf):
    """Near-dup leakage across the train/val split: val docs that
    LSH-collide with train docs — the dedup-grade leakage check that
    contamination_check's exact n-gram overlap cannot see (a light
    paraphrase shares bands but few exact shingles). Pure composition:
    train_val_split's hash rule picks the sides; dedup_incremental
    probes val against train's band buckets."""
    docs = _t(spark, sf, "documents")[0]
    from pyspark.sql import functions as F
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    bucket = textfn.md5int(F.col("doc_id").cast("string")) % 100
    val = docs.filter(bucket < 10)
    train = docs.filter(bucket >= 10)
    return (
        dedup.dedup_incremental(val, train)
        .select(F.col("new_doc_id").alias("val_doc_id"),
                F.col("corpus_doc_id").alias("train_doc_id"))
        .orderBy("val_doc_id", "train_doc_id")
    )


register(
    "split_leakage_check",
    _split_leakage,
    f"""
    WITH split AS (
      SELECT doc_id, text,
             ({_md5int('CAST(doc_id AS VARCHAR)')} % 100) AS bucket
      FROM documents
    ), sh AS (
      SELECT doc_id, bucket, {_SHINGLES} AS s
      FROM (SELECT doc_id, bucket, {_TOKENS} AS t FROM split)
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, bucket,
             list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, bucket, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, bucket, unnest({_BKEYS}) AS bkey FROM mh
    )
    SELECT DISTINCT v.doc_id AS val_doc_id, t.doc_id AS train_doc_id
    FROM keys v JOIN keys t ON v.bkey = t.bkey
    WHERE v.bucket < 10 AND t.bucket >= 10
    ORDER BY val_doc_id, train_doc_id
    """,
)


register(
    "more_like_this",
    lambda spark, sf: textanalysis.more_like_this(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS w FROM documents
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dfc AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    wgt AS (
      SELECT t.doc_id, t.w,
             CAST(floor(t.tf * ln(n.n_docs / d.df) * 1000.0) AS BIGINT)
               AS wt
      FROM tf t JOIN dfc d USING (w), n
    ), norms AS (
      SELECT doc_id, CAST(sum(wt * wt) AS BIGINT) AS nsq
      FROM wgt GROUP BY 1
    ), dots AS (
      SELECT a.doc_id AS anchor_id, b.doc_id AS doc_id,
             CAST(sum(a.wt * b.wt) AS BIGINT) AS dot
      FROM wgt a JOIN wgt b ON a.w = b.w AND a.doc_id != b.doc_id
      WHERE a.doc_id IN (0, 1, 2)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT anchor_id, dots.doc_id,
             (floor(dot / sqrt(CAST(na.nsq AS DOUBLE)
                               * CAST(nb.nsq AS DOUBLE))
                    * 1000000.0) / 1000000.0) AS cosine
      FROM dots
      JOIN norms na ON dots.anchor_id = na.doc_id
      JOIN norms nb ON dots.doc_id = nb.doc_id
    ), rr AS (
      SELECT anchor_id, doc_id, cosine,
             CAST(row_number() OVER (
               PARTITION BY anchor_id
               ORDER BY cosine DESC, doc_id) AS INT) AS rank
      FROM ranked
    )
    SELECT anchor_id, doc_id, cosine, rank
    FROM rr WHERE rank <= 10
    ORDER BY anchor_id, rank
    """,
)


register(
    "knn_degree_stats",
    lambda spark, sf: similarity.knn_degree_stats(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_KNN_CTES},
    edges AS (
      SELECT vec_id, neighbor_id FROM r WHERE rank <= 5
    ), indeg AS (
      SELECT neighbor_id, CAST(count(*) AS BIGINT) AS in_degree
      FROM edges GROUP BY 1
    ), hist AS (
      SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes
      FROM indeg GROUP BY 1
    ), tot AS (SELECT count(*) AS n_vecs FROM embeddings),
    ref AS (SELECT count(*) AS n_referenced FROM indeg),
    zero AS (
      SELECT CAST(0 AS BIGINT) AS in_degree,
             CAST(n_vecs - n_referenced AS BIGINT) AS n_nodes
      FROM tot, ref WHERE n_vecs - n_referenced > 0
    )
    SELECT * FROM hist
    UNION ALL SELECT * FROM zero
    ORDER BY in_degree
    """,
)


register(
    "knn_clustering_coefficient",
    lambda spark, sf: similarity.knn_clustering_coefficient(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_KNN_CTES},
    e AS (SELECT vec_id, neighbor_id FROM r WHERE rank <= 5),
    und AS (
      SELECT DISTINCT least(vec_id, neighbor_id) AS lo,
                      greatest(vec_id, neighbor_id) AS hi
      FROM e
    ), adj AS (
      SELECT lo AS node, hi AS m FROM und
      UNION ALL SELECT hi AS node, lo AS m FROM und
    ), b AS (
      SELECT node, count(*) AS deg FROM adj GROUP BY 1
    ), wt AS (
      SELECT count(*) AS n_nodes,
             CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS wedges
      FROM b
    ), wedge_pairs AS (
      SELECT a1.m AS m1, a2.m AS m2
      FROM adj a1 JOIN adj a2
        ON a1.node = a2.node AND a1.m < a2.m
    ), closed AS (
      SELECT count(*) AS closed_wedges
      FROM wedge_pairs JOIN und ON m1 = lo AND m2 = hi
    ), ne AS (SELECT count(*) AS n_edges FROM und)
    SELECT n_nodes, n_edges, wedges, closed_wedges,
           CASE WHEN wedges > 0
                THEN CAST(floor(closed_wedges * 1e6 / wedges) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS transitivity_e6
    FROM wt, closed, ne
    """,
)


register(
    "streaming_cdc_apply",
    monitors.streaming_cdc_apply,
    """
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)


register(
    "lsh_precision_report",
    lambda spark, sf: dedup.lsh_precision_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), ex AS (
      SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh
    ), common AS (
      SELECT cand.doc_a, cand.doc_b, count(*) AS n_common,
             max(ea.n) AS n_a, max(eb.n) AS n_b
      FROM cand
      JOIN ex ea ON ea.doc_id = cand.doc_a
      JOIN ex eb ON eb.doc_id = cand.doc_b AND eb.g = ea.g
      GROUP BY 1, 2
    ), nc AS (SELECT count(*) AS n_candidates FROM cand),
    nv AS (
      SELECT CAST(sum(CASE WHEN n_common * 1.0 / (n_a + n_b - n_common)
                                >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_verified
      FROM common
    )
    SELECT n_candidates, coalesce(n_verified, 0) AS n_verified,
           CASE WHEN n_candidates > 0
                THEN CAST(floor(coalesce(n_verified, 0) * 1000000.0
                                / n_candidates) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS precision_e6
    FROM nc, nv
    """,
)


register(
    "lsh_recall_report",
    lambda spark, sf: dedup.lsh_recall_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ex0 AS (
      SELECT doc_id, {_md5int('unnest(s)')} AS g FROM sh
    ), keep AS (
      SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 10000
    ), exj AS (
      SELECT doc_id, count(*) OVER (PARTITION BY doc_id) AS n, g
      FROM ex0 WHERE g IN (SELECT g FROM keep)
    ), truth AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM exj a JOIN exj b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2, a.n, b.n
      HAVING count(*) * 1.0 / (a.n + b.n - count(*)) >= 0.5
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), ex AS (
      SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh
    ), common AS (
      SELECT cand.doc_a, cand.doc_b, count(*) AS n_common,
             max(ea.n) AS n_a, max(eb.n) AS n_b
      FROM cand
      JOIN ex ea ON ea.doc_id = cand.doc_a
      JOIN ex eb ON eb.doc_id = cand.doc_b AND eb.g = ea.g
      GROUP BY 1, 2
    ), found AS (
      SELECT doc_a, doc_b FROM common
      WHERE n_common * 1.0 / (n_a + n_b - n_common) >= 0.5
    ), nt AS (SELECT count(*) AS n_true_pairs FROM truth),
    nh AS (
      SELECT count(*) AS n_recovered
      FROM truth JOIN found USING (doc_a, doc_b)
    )
    SELECT n_true_pairs, n_recovered,
           CASE WHEN n_true_pairs > 0
                THEN CAST(floor(n_recovered * 1000000.0 / n_true_pairs)
                          AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS recall_e6
    FROM nt, nh
    """,
)


register(
    "minhash_estimate_report",
    lambda spark, sf: dedup.minhash_estimate_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM (SELECT doc_id, {_TOKENS} AS t FROM documents)
      WHERE len({_SHINGLES}) > 0
    ), ints AS (
      SELECT doc_id, list_transform(s, g -> {_md5int('g')}) AS xs FROM sh
    ), mh AS (
      SELECT doc_id, {_SIG} AS sig FROM ints
    ), keys AS (
      SELECT doc_id, unnest({_BKEYS}) AS bkey FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), agree AS (
      SELECT cand.doc_a, cand.doc_b,
             list_sum(list_transform(range(1, 33), j ->
               CASE WHEN ma.sig[j] = mb.sig[j] THEN 1 ELSE 0 END))
               AS agreements
      FROM cand
      JOIN mh ma ON ma.doc_id = cand.doc_a
      JOIN mh mb ON mb.doc_id = cand.doc_b
    ), ex AS (
      SELECT doc_id, unnest(s) AS g FROM sh
    ), sizes AS (
      SELECT doc_id, len(list_distinct(s)) AS n FROM sh
    ), common AS (
      SELECT cand.doc_a, cand.doc_b,
             count(DISTINCT ea.g) AS n_common
      FROM cand
      JOIN ex ea ON ea.doc_id = cand.doc_a
      JOIN ex eb ON eb.doc_id = cand.doc_b AND eb.g = ea.g
      GROUP BY 1, 2
    ), err AS (
      -- LEFT JOIN + coalesce: a band-key collision between docs with
      -- ZERO common shingles is a real candidate pair the Spark side
      -- scores with exact_e6 = 0; an inner join here would drop it
      -- and diverge n_pairs and both error means (ADVICE r6).
      -- Sizes come from the per-doc relation, not the overlap join,
      -- so they exist for zero-overlap pairs too.
      SELECT CAST(a.agreements * 31250 AS BIGINT)
             - CAST(floor(coalesce(c.n_common, 0) * 1000000.0
                          / (na.n + nb.n - coalesce(c.n_common, 0)))
                    AS BIGINT)
               AS err
      FROM agree a
      JOIN sizes na ON na.doc_id = a.doc_a
      JOIN sizes nb ON nb.doc_id = a.doc_b
      LEFT JOIN common c ON c.doc_a = a.doc_a AND c.doc_b = a.doc_b
    )
    SELECT count(*) AS n_pairs,
           CAST(floor(sum(abs(err)) * 1.0 / count(*)) AS BIGINT)
             AS mean_abs_err_e6,
           CAST(max(abs(err)) AS BIGINT) AS max_abs_err_e6,
           CAST(floor(sum(err) * 1.0 / count(*)) AS BIGINT)
             AS mean_err_e6
    FROM err
    """,
)


# Upper-triangle dim-pair covariance in e12 integer units, as a CTE
# chain shared by the embedding_covariance oracle and the
# power-iteration oracle built on top of it.
_COV_CTES = """ex AS (
      SELECT vec_id, CAST(u.i - 1 AS INT) AS dim_idx,
             CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS u
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    ), cov AS (
      SELECT a.dim_idx AS dim_i, b.dim_idx AS dim_j,
             CAST(count(*) AS BIGINT) AS n,
             CAST(floor((CAST(sum(a.u * b.u) AS DOUBLE)
                         - CAST(sum(a.u) AS DOUBLE)
                           * CAST(sum(b.u) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE))
                        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS cov_e12
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim_idx <= b.dim_idx
      GROUP BY 1, 2
    )"""

register(
    "embedding_covariance",
    # upper-triangle dim-pair covariance in e12 integer units: exact
    # integer sums (order-independent, so the Arrow partial-Gram
    # batching is invisible), closed-form double cov floored at the end
    lambda spark, sf: similarity.embedding_covariance(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_COV_CTES}
    SELECT dim_i, dim_j, n, cov_e12 FROM cov ORDER BY 1, 2
    """,
)


register(
    "embedding_intrinsic_dim",
    # participation ratio tr(C)²/tr(C²): eigendecomposition-free
    # effective dimension; exact bigint trace, per-entry Frobenius
    # terms floored e12 before the sum (off-diagonals doubled inside
    # the floor, identically on both sides)
    lambda spark, sf: similarity.embedding_intrinsic_dim(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_COV_CTES},
    a AS (
      SELECT CAST(sum(CASE WHEN dim_i = dim_j THEN 1 ELSE 0 END)
                  AS BIGINT) AS dim,
             CAST(sum(CASE WHEN dim_i = dim_j THEN cov_e12 ELSE 0 END)
                  AS BIGINT) AS tr_e12,
             CAST(sum(CAST(floor(
               (CAST(cov_e12 AS DOUBLE) / 1000000000000.0)
               * (CAST(cov_e12 AS DOUBLE) / 1000000000000.0)
               * (CASE WHEN dim_i = dim_j THEN 1.0 ELSE 2.0 END)
               * 1000000000000.0) AS BIGINT)) AS BIGINT) AS fr2_e12
      FROM cov
    )
    SELECT dim,
           floor((CAST(tr_e12 AS DOUBLE) / 1000000000000.0)
                 * 1000000.0) / 1000000.0 AS trace,
           floor(((CAST(tr_e12 AS DOUBLE) / 1000000000000.0)
                  * (CAST(tr_e12 AS DOUBLE) / 1000000000000.0)
                  / (CAST(greatest(fr2_e12, 1) AS DOUBLE)
                     / 1000000000000.0))
                 * 1000000.0) / 1000000.0 AS participation_ratio,
           floor(((CAST(tr_e12 AS DOUBLE) / 1000000000000.0)
                  * (CAST(tr_e12 AS DOUBLE) / 1000000000000.0)
                  / (CAST(greatest(fr2_e12, 1) AS DOUBLE)
                     / 1000000000000.0))
                 / dim * 1000000.0) / 1000000.0 AS participation_share
    FROM a
    """,
)


def _power_ctes(n_rounds: int = 8) -> str:
    """CTE chain replaying embedding_top_component's fixed-round
    power iteration exactly (the _kmeans_ctes technique): v0 = the
    all-ones e6 iterate, then per round a mat-vec with per-term
    floor-e6 quantization and an exact-integer max-abs
    normalization (a window max, so each round references its
    mat-vec exactly once — a separate scalar CTE would double the
    inlined subtree per round, 2^n_rounds total). MATERIALIZED on
    the shared relations for the same reason: DuckDB inlines plain
    CTEs per reference. v{{n_rounds}} is the final iterate."""
    cov_materialized = _COV_CTES.replace("), cov AS (",
                                         "), cov AS MATERIALIZED (")
    ctes = [
        cov_materialized,
        """sym AS MATERIALIZED (
      SELECT dim_i AS i, dim_j AS j, cov_e12 FROM cov
      UNION ALL
      SELECT dim_j AS i, dim_i AS j, cov_e12 FROM cov
      WHERE dim_i != dim_j
    )""",
        """v0 AS (
      SELECT DISTINCT dim_i AS i, CAST(1000000 AS BIGINT) AS vu
      FROM cov
    )""",
    ]
    for r in range(1, n_rounds + 1):
        ctes.append(f"""w{r} AS (
      SELECT s.i, CAST(sum(CAST(floor(
               (CAST(s.cov_e12 AS DOUBLE) / 1000000000000.0)
               * (CAST(v.vu AS DOUBLE) / 1000000.0)
               * 1000000.0) AS BIGINT)) AS BIGINT) AS we
      FROM sym s JOIN v{r - 1} v ON s.j = v.i GROUP BY s.i
    )""")
        ctes.append(f"""v{r} AS MATERIALIZED (
      SELECT i, CAST(floor(CAST(we AS DOUBLE) * 1000000.0
                           / greatest(max(abs(we)) OVER (), 1))
                     AS BIGINT) AS vu
      FROM w{r}
    )""")
    return ",\n    ".join(ctes)


register(
    "embedding_top_component",
    # fixed-round power iteration over the covariance relation,
    # replayed by the unrolled CTE rounds of _power_ctes; Rayleigh
    # quotient from exact bigint dot products
    lambda spark, sf: similarity.embedding_top_component(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_power_ctes(8)},
    wf AS (
      SELECT s.i, CAST(sum(CAST(floor(
               (CAST(s.cov_e12 AS DOUBLE) / 1000000000000.0)
               * (CAST(v.vu AS DOUBLE) / 1000000.0)
               * 1000000.0) AS BIGINT)) AS BIGINT) AS we
      FROM sym s JOIN v8 v ON s.j = v.i GROUP BY s.i
    ), ray AS (
      SELECT CAST(sum(v.vu * w.we) AS BIGINT) AS num,
             CAST(sum(v.vu * v.vu) AS BIGINT) AS den
      FROM v8 v JOIN wf w ON v.i = w.i
    ), tr AS (
      SELECT greatest(CAST(sum(cov_e12) AS BIGINT), 1) AS tr_e12
      FROM cov WHERE dim_i = dim_j
    )
    SELECT v.i AS dim_idx,
           v.vu / 1000000.0 AS component,
           floor((CAST(num AS DOUBLE) / den) * 1000000.0)
             / 1000000.0 AS eigenvalue,
           floor((CAST(num AS DOUBLE) / den) * 1000000000000.0
                 / tr_e12 * 1000000.0) / 1000000.0 AS variance_share
    FROM v8 v, ray, tr ORDER BY dim_idx
    """,
)

register(
    "embedding_outliers",
    lambda spark, sf: similarity.embedding_outliers(
        *_t(spark, sf, "embeddings")),
    """
    WITH ex AS (
      SELECT vec_id, label, CAST(u.i - 1 AS INT) AS dim_idx,
             CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS u
      FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
           LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    ), cent AS (
      SELECT label, dim_idx,
             CAST(floor(sum(u) / count(*)) AS BIGINT) AS m
      FROM ex GROUP BY label, dim_idx
    ), per_vec AS (
      SELECT ex.vec_id, ex.label,
             CAST(sum(ex.u * cent.m) AS BIGINT) AS dot,
             CAST(sum(ex.u * ex.u) AS BIGINT) AS vsq
      FROM ex JOIN cent
        ON cent.label = ex.label AND cent.dim_idx = ex.dim_idx
      GROUP BY ex.vec_id, ex.label
    ), nsq AS (
      SELECT label, CAST(sum(m * m) AS BIGINT) AS nsq
      FROM cent GROUP BY label
    ), scored AS (
      SELECT vec_id, per_vec.label,
             CAST(floor(CAST(dot AS DOUBLE)
                        / sqrt(CAST(vsq AS DOUBLE)
                               * CAST(nsq.nsq AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS cos_e6
      FROM per_vec JOIN nsq ON nsq.label = per_vec.label
      WHERE vsq > 0 AND nsq.nsq > 0
    ), stats AS (
      SELECT label, count(*) AS n,
             CAST(sum(cos_e6) AS BIGINT) AS s1,
             CAST(sum(cos_e6 * cos_e6) AS BIGINT) AS s2
      FROM scored GROUP BY label
    ), zed AS (
      SELECT vec_id, scored.label,
             (cos_e6 / 1000000.0) AS centroid_cosine,
             (floor((CASE WHEN sqrt(greatest(
                       (CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / n))
                       / n, 0.0)) > 0
                     THEN (CAST(cos_e6 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) / n)
                          / sqrt(greatest(
                              (CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE)
                                 * (CAST(s1 AS DOUBLE) / n)) / n, 0.0))
                     ELSE 0.0 END) * 10000.0) / 10000.0) AS z_score
      FROM scored JOIN stats ON stats.label = scored.label
    )
    SELECT vec_id, label, centroid_cosine, z_score
    FROM zed WHERE z_score < -2.0
    ORDER BY vec_id
    """,
)


register(
    "tokenizer_fertility_by_source",
    lambda spark, sf: textanalysis.tokenizer_fertility_by_source(
        *_t(spark, sf, "documents")),
    f"""
    WITH a AS (
      SELECT doc_id, source,
             CAST(len({_TOKENS}) AS BIGINT) AS n_words,
             regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')
               AS arr
      FROM documents
    ), per_doc AS (
      SELECT doc_id, source, n_words,
             CAST(list_reduce(
               [CAST(0 AS BIGINT)] || list_transform(arr,
                 tk -> CAST(floor((length(tk) + 3) / 4) AS BIGINT)),
               (acc, x) -> acc + x) AS BIGINT) AS est
      FROM a
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(est) AS BIGINT) AS est_bpe_tokens,
           CASE WHEN sum(n_words) > 0
                THEN floor(sum(est) * 1e4 / sum(n_words)) / 1e4
                ELSE 0.0 END AS fertility
    FROM per_doc GROUP BY source ORDER BY source
    """,
)


register(
    "verbatim_overlap_pairs",
    lambda spark, sf: dedup.verbatim_overlap_pairs(
        *_t(spark, sf, "documents")),
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents
    ), g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(t) - 7, 0) + 1),
               i -> {_md5int("array_to_string(t[i:i+7], ' ')")}) AS hs
      FROM t
    ), sel AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(
                 list_filter(range(1, len(hs) + 1),
                   i -> hs[i] = list_min(hs[greatest(1, i-3):i])),
                 i -> hs[i]))) AS h
      FROM g
    ), dfc AS (
      SELECT h FROM sel GROUP BY h HAVING count(*) <= 10000
    ), kept AS (
      SELECT sel.doc_id, sel.h FROM sel JOIN dfc USING (h)
    ), nn AS (
      SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_shared_fp,
           (floor(n_common * 1000000.0 / least(na.n, nb.n)) / 1000000.0)
             AS overlap_share
    FROM pairs
    JOIN nn na ON na.doc_id = pairs.doc_a
    JOIN nn nb ON nb.doc_id = pairs.doc_b
    WHERE n_common >= 2
    ORDER BY doc_a, doc_b
    """,
)


from pyspark.sql import functions as F  # noqa: E402


def _embedding_clusters(spark, sf):
    """Embedding-space cluster discovery: the vector-side sibling of
    dedup_verified_clusters — cell-bounded exact kNN edges feed the
    same connected-components machinery, yielding (cluster_id, size,
    keeper) over the embedding manifold (duplicate-cluster mining and
    the canonical-representative pick for semantic dedup)."""
    emb = _t(spark, sf, "embeddings")[0]
    edges = (similarity.knn_graph_cells(emb, k=3)
             .select(F.col("vec_id").alias("doc_a"),
                     F.col("neighbor_id").alias("doc_b")))
    return dedup.dedup_clusters(None, edges=edges)


register(
    "embedding_clusters",
    _embedding_clusters,
    # recursive-CTE closure over the k=3 kNN edge relation (the same
    # CTE chain the knn_graph_cells oracle pins, rank cut at 3)
    _cc_oracle(f"""WITH {_KNN_CTES}
      SELECT vec_id AS doc_a, neighbor_id AS doc_b
      FROM r WHERE rank <= 3"""),
)


register(
    "ann_recall_report",
    lambda spark, sf: similarity.ann_recall_report(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6) DESC,
                 c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id != q.vec_id
      ) WHERE rank <= 10
    ),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT 16
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, cent_id FROM (
        SELECT n.vec_id AS query_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents WHERE n.vec_id < 5
      ) WHERE rn <= 2
    ), cands AS (
      SELECT probes.query_id, assign.vec_id
      FROM probes JOIN assign ON probes.cent_id = assign.cent_id
      WHERE assign.vec_id != probes.query_id
    ), scored AS (
      SELECT cands.query_id, cands.vec_id AS neighbor_id,
             round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6) AS score
      FROM cands
      JOIN n c ON cands.vec_id = c.vec_id
      JOIN n q ON cands.query_id = q.vec_id
    ), ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
      ) WHERE rank <= 10
    ), hits AS (
      SELECT count(*) AS n_recovered
      FROM bf JOIN ivf USING (query_id, neighbor_id)
    ), tot AS (SELECT count(*) AS n_true_pairs FROM bf)
    SELECT CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
           CAST(n_recovered AS BIGINT) AS n_recovered,
           CASE WHEN n_true_pairs > 0
                THEN CAST(floor(n_recovered * 1000000.0 / n_true_pairs)
                          AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS recall_e6
    FROM tot, hits
    """,
)


register(
    "multimodal_ahash_pairs",
    lambda spark, sf: multimodal.multimodal_ahash_pairs(
        *_t(spark, sf, "documents")),
    """
    WITH chars AS (
      SELECT doc_id, ord(substr(text, u.i, 1)) % 16 AS b
      FROM documents,
           LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) u
    ), counts AS (
      SELECT doc_id, b AS dim_idx, count(*) AS cnt FROM chars GROUP BY 1, 2
    ), dims AS (
      SELECT doc_id, CAST(u.d AS INT) AS dim_idx
      FROM documents, LATERAL (SELECT unnest(range(0, 16)) AS d) u
    ), f AS (
      SELECT dims.doc_id, dims.dim_idx,
             CAST(coalesce(cnt, 0) AS BIGINT) AS bucket_count
      FROM dims LEFT JOIN counts
        ON dims.doc_id = counts.doc_id AND dims.dim_idx = counts.dim_idx
    ), tot AS (
      SELECT doc_id, CAST(sum(bucket_count) AS BIGINT) AS tot
      FROM f GROUP BY 1
    ), sig AS (
      SELECT f.doc_id,
             CAST(sum(CASE WHEN f.bucket_count * 16 > t.tot
                           THEN CAST(power(2, f.dim_idx) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS w0,
             CAST(sum(CASE WHEN f.bucket_count * 32 > 3 * t.tot
                           THEN CAST(power(2, f.dim_idx) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS w1,
             CAST(sum(CASE WHEN f.bucket_count * 32 > t.tot
                           THEN CAST(power(2, f.dim_idx) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS w2,
             CAST(sum(CASE WHEN f.bucket_count * 8 > t.tot
                           THEN CAST(power(2, f.dim_idx) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS w3
      FROM f JOIN tot t USING (doc_id) GROUP BY 1
    ), keys AS (
      SELECT doc_id, w0, w1, w2, w3,
             unnest(['w0|' || CAST(w0 AS VARCHAR),
                     'w1|' || CAST(w1 AS VARCHAR),
                     'w2|' || CAST(w2 AS VARCHAR),
                     'w3|' || CAST(w3 AS VARCHAR)]) AS bkey
      FROM sig
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
                + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3))
                AS INT) AS hamming
    FROM keys a JOIN keys b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
          + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3)) <= 3
    ORDER BY doc_a, doc_b
    """,
)


register(
    "embedding_centroid_drift",
    # fabricated versions: even vec_ids play the old corpus, odd the
    # new — on this data the halves agree closely, the zero-drift
    # baseline the detector reads against
    lambda spark, sf: similarity.embedding_centroid_drift(
        _t(spark, sf, "embeddings")[0].filter("vec_id % 2 = 0"),
        _t(spark, sf, "embeddings")[0].filter("vec_id % 2 = 1")),
    f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), ex AS (
      SELECT vec_id, label, CAST(u.i - 1 AS INT) AS dim_idx,
             CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS x
      FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    ), ca AS (
      SELECT label, dim_idx,
             CAST(floor(sum(x) / count(*)) AS BIGINT) AS m_old,
             count(*) AS cnt_old
      FROM ex WHERE vec_id % 2 = 0 GROUP BY 1, 2
    ), cb AS (
      SELECT label, dim_idx,
             CAST(floor(sum(x) / count(*)) AS BIGINT) AS m_new,
             count(*) AS cnt_new
      FROM ex WHERE vec_id % 2 = 1 GROUP BY 1, 2
    ), j AS (
      SELECT ca.label,
             CAST(sum(m_old * m_new) AS BIGINT) AS dot,
             CAST(sum(m_old * m_old) AS BIGINT) AS nsq_old,
             CAST(sum(m_new * m_new) AS BIGINT) AS nsq_new,
             CAST(max(cnt_old) AS BIGINT) AS n_old,
             CAST(max(cnt_new) AS BIGINT) AS n_new
      FROM ca JOIN cb ON ca.label = cb.label AND ca.dim_idx = cb.dim_idx
      GROUP BY 1
    )
    SELECT label, n_old, n_new,
           (floor((CAST(dot AS DOUBLE)
                   / sqrt(CAST(nsq_old AS DOUBLE)
                          * CAST(nsq_new AS DOUBLE))) * 1000000.0)
            / 1000000.0) AS centroid_cosine,
           ((floor((CAST(dot AS DOUBLE)
                    / sqrt(CAST(nsq_old AS DOUBLE)
                           * CAST(nsq_new AS DOUBLE))) * 1000000.0)
             / 1000000.0) < 0.98) AS drifted
    FROM j WHERE nsq_old > 0 AND nsq_new > 0
    ORDER BY label
    """,
)


register(
    "dedup_exact_normalized",
    lambda spark, sf: dedup.dedup_exact_normalized(
        *_t(spark, sf, "documents")),
    """
    SELECT min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies,
           (count(*) > 1) AS had_duplicates
    FROM documents
    GROUP BY md5(trim(regexp_replace(
        regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        ' +', ' ', 'g')))
    """,
)


register(
    "source_language_mix",
    lambda spark, sf: textanalysis.source_language_mix(
        *_t(spark, sf, "documents")),
    f"""
    WITH grain AS (
      SELECT source, lang, count(*) AS n_docs,
             CAST(sum(len({_TOKENS})) AS BIGINT) AS n_words
      FROM documents GROUP BY 1, 2
    ), tot AS (
      SELECT source, CAST(sum(n_docs) AS BIGINT) AS src_docs
      FROM grain GROUP BY 1
    )
    SELECT grain.source AS source, lang, n_docs, n_words,
           CAST(floor(n_docs * 1000000.0 / src_docs) AS BIGINT)
             AS doc_share_e6
    FROM grain JOIN tot ON tot.source = grain.source
    ORDER BY grain.source, lang
    """,
)


# --------------------------------------------------------------------
# r7 additions: distribution diagnostics + dedup audit tables
# --------------------------------------------------------------------

register(
    "doc_length_profile_by_source",
    lambda spark, sf: textanalysis.doc_length_profile_by_source(
        *_t(spark, sf, "documents")),
    f"""
    WITH t AS (
      SELECT source, len({_TOKENS}) AS n_tok FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           (floor(quantile_cont(n_tok, 0.1) * 1000000.0) / 1000000.0)
             AS p10_tokens,
           (floor(quantile_cont(n_tok, 0.5) * 1000000.0) / 1000000.0)
             AS p50_tokens,
           (floor(quantile_cont(n_tok, 0.9) * 1000000.0) / 1000000.0)
             AS p90_tokens,
           (floor(CAST(sum(n_tok) AS BIGINT) * 10000.0 / count(*))
            / 10000.0) AS mean_tokens
    FROM t GROUP BY source ORDER BY source
    """,
)

register(
    "source_zipf_slope",
    lambda spark, sf: textanalysis.source_zipf_slope(
        *_t(spark, sf, "documents")),
    f"""
    WITH stw AS (
      SELECT source, w, count(*) AS n
      FROM (SELECT source, unnest({_TOKENS}) AS w FROM documents)
      GROUP BY 1, 2
    ), top AS (
      SELECT source, n, r FROM (
        SELECT source, w, n,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n DESC, w) AS r
        FROM stw)
      WHERE r <= 200
    ), terms AS (
      SELECT source,
             CAST(floor(ln(r) * 1000000000.0) AS BIGINT) AS x_e9,
             CAST(floor(ln(n) * 1000000000.0) AS BIGINT) AS y_e9,
             CAST(floor(ln(r) * ln(n) * 1000000000.0) AS BIGINT)
               AS xy_e9,
             CAST(floor(ln(r) * ln(r) * 1000000000.0) AS BIGINT)
               AS xx_e9
      FROM top
    ), agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(x_e9) AS BIGINT) AS sx,
             CAST(sum(y_e9) AS BIGINT) AS sy,
             CAST(sum(xy_e9) AS BIGINT) AS sxy,
             CAST(sum(xx_e9) AS BIGINT) AS sxx
      FROM terms GROUP BY source
    )
    SELECT source, n_types,
           (floor(CASE WHEN (CAST(n_types AS DOUBLE) * (sxx / 1e9)
                             - (sx / 1e9) * (sx / 1e9)) > 0
                  THEN (CAST(n_types AS DOUBLE) * (sxy / 1e9)
                        - (sx / 1e9) * (sy / 1e9))
                       / (CAST(n_types AS DOUBLE) * (sxx / 1e9)
                          - (sx / 1e9) * (sx / 1e9))
                  ELSE 0.0 END * 1000000.0) / 1000000.0)
             AS zipf_slope
    FROM agg WHERE n_types >= 20 ORDER BY source
    """,
)

register(
    "revenue_autocorrelation",
    lambda spark, sf: detectors.revenue_autocorrelation(
        *_t(spark, sf, "orders")),
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ), xs AS (
      SELECT d, CAST((rev_c - (rev_c % 10000)) / 10000 AS BIGINT) AS x
      FROM daily
    ), l AS (
      SELECT 1 AS lag_days, x, lag(x, 1) OVER (ORDER BY d) AS y FROM xs
      UNION ALL
      SELECT 7, x, lag(x, 7) OVER (ORDER BY d) FROM xs
      UNION ALL
      SELECT 14, x, lag(x, 14) OVER (ORDER BY d) FROM xs
      UNION ALL
      SELECT 28, x, lag(x, 28) OVER (ORDER BY d) FROM xs
    ), p AS (
      SELECT lag_days, x, y FROM l WHERE y IS NOT NULL
    ), s AS (
      SELECT lag_days, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM p GROUP BY lag_days
    )
    SELECT CAST(lag_days AS INT) AS lag_days, n_pairs,
           (floor(CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                        AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                  THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  ELSE 0.0 END * 1000000.0) / 1000000.0) AS autocorr
    FROM s WHERE n_pairs >= 10 ORDER BY lag_days
    """,
)

register(
    "cross_source_dup_matrix",
    lambda spark, sf: dedup.cross_source_dup_matrix(
        *_t(spark, sf, "documents")),
    f"""
    WITH v AS ( {_LSH_VERIFIED_SQL} )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM v
    JOIN documents da ON da.doc_id = v.doc_a
    JOIN documents db ON db.doc_id = v.doc_b
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)

register(
    "dedup_cluster_size_histogram",
    lambda spark, sf: dedup.dedup_cluster_size_histogram(
        *_t(spark, sf, "documents")),
    f"""
    WITH cc AS ( {_cc_oracle(_MINHASH_PAIRS_SQL)} ), b AS (
      SELECT CAST(length(bin(cluster_size)) - 1 AS INT) AS log2_bucket,
             cluster_size
      FROM cc
    )
    SELECT log2_bucket,
           CAST(1 << log2_bucket AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs
    FROM b GROUP BY log2_bucket ORDER BY log2_bucket
    """,
)


register(
    "dedup_threshold_sweep",
    lambda spark, sf: dedup.dedup_threshold_sweep(
        *_t(spark, sf, "documents")),
    f"""
    WITH vp AS ( {_LSH_VERIFIED_SQL} ),
    p AS (
      SELECT doc_a, doc_b,
             CAST(round(jaccard * 1000000.0) AS BIGINT) AS jac_e6
      FROM vp
    ), pb AS (
      SELECT CAST(least(floor((jac_e6 - 500000) / 50000.0), 9) AS BIGINT)
               AS idx,
             CAST(count(*) AS BIGINT) AS np,
             CAST(sum(jac_e6) AS BIGINT) AS sj
      FROM p GROUP BY 1
    ), dm AS (
      SELECT d, max(jac_e6) AS jac_e6 FROM (
        SELECT doc_a AS d, jac_e6 FROM p
        UNION ALL
        SELECT doc_b, jac_e6 FROM p)
      GROUP BY d
    ), db AS (
      SELECT CAST(least(floor((jac_e6 - 500000) / 50000.0), 9) AS BIGINT)
               AS idx,
             CAST(count(*) AS BIGINT) AS nd
      FROM dm GROUP BY 1
    ), th AS (
      SELECT CAST(u.i AS BIGINT) AS idx,
             CAST(500000 + 50000 * u.i AS BIGINT) AS threshold_e6
      FROM (SELECT unnest(range(0, 10)) AS i) u
    ), j AS (
      SELECT th.idx, th.threshold_e6,
             coalesce(np, 0) AS np, coalesce(sj, 0) AS sj,
             coalesce(nd, 0) AS nd
      FROM th LEFT JOIN pb ON pb.idx = th.idx
              LEFT JOIN db ON db.idx = th.idx
    ), c AS (
      SELECT threshold_e6,
             CAST(sum(np) OVER w AS BIGINT) AS n_pairs,
             CAST(sum(sj) OVER w AS BIGINT) AS sum_jac,
             CAST(sum(nd) OVER w AS BIGINT) AS n_docs
      FROM j
      WINDOW w AS (ORDER BY idx DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT threshold_e6, n_pairs, n_docs,
           CASE WHEN n_pairs > 0
                THEN CAST(floor(sum_jac / n_pairs) AS BIGINT)
                ELSE NULL END AS mean_jaccard_e6
    FROM c ORDER BY threshold_e6
    """,
)


# dedup_cascade_report: the sequenced funnel. Stage 3's components
# come from the same recursive-CTE closure as the clustering-trio
# oracles, but over the verified pairs of the stage-2 SURVIVORS
# (d2), which is why _lsh_verified_sql takes a table parameter.
register(
    "dedup_cascade_report",
    lambda spark, sf: dedup.dedup_cascade_report(
        *_t(spark, sf, "documents")),
    f"""
    WITH RECURSIVE d1 AS (
      SELECT d.* FROM documents d JOIN (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
      ) k USING (doc_id)
    ), d2 AS (
      SELECT d.* FROM d1 d JOIN (
        SELECT min(doc_id) AS doc_id FROM d1
        GROUP BY md5(trim(regexp_replace(
            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
            ' +', ' ', 'g')))
      ) k USING (doc_id)
    ), vp AS ( {_lsh_verified_sql("d2")} ),
    e AS (
      SELECT doc_a AS src, doc_b AS dst FROM vp
      UNION ALL
      SELECT doc_b, doc_a FROM vp
    ), walk(src, reach) AS (
      SELECT src, dst FROM e
      UNION
      SELECT w.src, x.dst FROM walk w JOIN e x ON x.src = w.reach
    ), comp AS (
      SELECT src AS doc_id, least(src, min(reach)) AS label
      FROM walk GROUP BY src
    ), cl AS (
      SELECT label, count(*) AS sz FROM comp GROUP BY label
      HAVING count(*) > 1
    ), c0 AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM documents),
    c1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM d1),
    c2 AS (SELECT CAST(count(*) AS BIGINT) AS n2 FROM d2),
    c3 AS (SELECT CAST(coalesce(sum(sz - 1), 0) AS BIGINT) AS dr3 FROM cl),
    r AS (SELECT * FROM c0, c1, c2, c3)
    SELECT CAST(1 AS INT) AS stage, 'exact' AS stage_name,
           n0 AS docs_in, n0 - n1 AS docs_dropped, n1 AS docs_out,
           CAST(floor((n0 - n1) * 1000000.0 / n0) AS BIGINT)
             AS drop_rate_e6
    FROM r
    UNION ALL
    SELECT CAST(2 AS INT), 'normalized', n1, n1 - n2, n2,
           CAST(floor((n1 - n2) * 1000000.0 / n1) AS BIGINT)
    FROM r
    UNION ALL
    SELECT CAST(3 AS INT), 'near_dup_lsh', n2, dr3, n2 - dr3,
           CAST(floor(dr3 * 1000000.0 / n2) AS BIGINT)
    FROM r
    ORDER BY stage
    """,
)


register(
    # streaming admission guard; oracle = the batch contamination
    # scoring with roles swapped (eval suite -> train-side docs),
    # valid because the epoch union is chop-invariant by construction
    "streaming_contamination_guard",
    monitors.streaming_contamination_guard,
    f"""
    WITH tr AS (
      SELECT DISTINCT {_md5int('unnest(s)')} AS h
      FROM (
        SELECT {_SHINGLES} AS s
        FROM (SELECT {_TOKENS} AS t FROM documents WHERE doc_id % 10 = 0)
        WHERE len({_SHINGLES}) > 0
      )
    ), ev AS (
      SELECT DISTINCT doc_id, {_md5int('unnest(s)')} AS h
      FROM (
        SELECT doc_id, {_SHINGLES} AS s
        FROM (SELECT doc_id, {_TOKENS} AS t FROM documents
              WHERE doc_id % 10 != 0)
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
    FROM agg ORDER BY doc_id
    """,
)


register(
    "multimodal_byte_entropy",
    lambda spark, sf: multimodal.multimodal_byte_entropy(
        *_t(spark, sf, "documents")),
    """
    WITH chars AS (
      SELECT doc_id, ord(substr(text, u.i, 1)) % 16 AS b
      FROM documents,
           LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) u
    ), counts AS (
      SELECT doc_id, b, count(*) AS n FROM chars GROUP BY 1, 2
    ), per AS (
      SELECT doc_id,
             CAST(sum(n) AS BIGINT) AS n_bytes,
             CAST(count(*) AS BIGINT) AS n_buckets,
             CAST(sum(CAST(floor(n * ln(n) * 1000000.0) AS BIGINT))
                  AS BIGINT) AS nlogn_e6
      FROM counts GROUP BY 1
    )
    SELECT doc_id, n_bytes, n_buckets,
           CAST(floor((ln(n_bytes) - nlogn_e6 / 1000000.0 / n_bytes)
                      * 1000000.0) AS BIGINT) AS entropy_e6,
           (CAST(floor((ln(n_bytes) - nlogn_e6 / 1000000.0 / n_bytes)
                       * 1000000.0) AS BIGINT) >= 2700000)
             AS is_near_uniform
    FROM per ORDER BY doc_id
    """,
)


register(
    "source_dup_rate",
    lambda spark, sf: dedup.source_dup_rate(*_t(spark, sf, "documents")),
    """
    WITH per_text AS (
      SELECT source, md5(text) AS h, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct_texts,
           CAST(sum(n) - count(*) AS BIGINT) AS dup_docs,
           CAST(max(n) AS BIGINT) AS largest_group,
           CAST(floor((sum(n) - count(*)) * 1000000.0 / sum(n)) AS BIGINT)
             AS dup_rate_e6
    FROM per_text GROUP BY source ORDER BY source
    """,
)


register(
    "split_embedding_leakage",
    lambda spark, sf: dedup.split_embedding_leakage(
        *_t(spark, sf, "embeddings")),
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
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round({_dot('a.v', 'b.v')} / (a.nrm * b.nrm), 6) AS cosine,
             (a.label = b.label) AS same_label
      FROM assign x
      JOIN assign y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
      JOIN n a ON a.vec_id = x.vec_id
      JOIN n b ON b.vec_id = y.vec_id
      WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.35
    ), s AS (
      SELECT vec_a, vec_b, cosine, same_label,
             CASE WHEN {_md5int('CAST(vec_a AS VARCHAR)')} % 100 < 10
                  THEN 'val' ELSE 'train' END AS split_a,
             CASE WHEN {_md5int('CAST(vec_b AS VARCHAR)')} % 100 < 10
                  THEN 'val' ELSE 'train' END AS split_b
      FROM p
    )
    SELECT CASE WHEN split_a = 'train' THEN vec_a ELSE vec_b END
             AS vec_train,
           CASE WHEN split_a = 'val' THEN vec_a ELSE vec_b END
             AS vec_val,
           cosine, same_label
    FROM s WHERE split_a != split_b
    ORDER BY vec_train, vec_val
    """,
)


register(
    "embedding_coreset_sample",
    lambda spark, sf: similarity.embedding_coreset_sample(
        *_t(spark, sf, "embeddings")),
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
    ), sz AS (
      SELECT cent_id, CAST(count(*) AS BIGINT) AS cell_size
      FROM assign GROUP BY 1
    ), r AS (
      SELECT a.vec_id, a.cent_id, sz.cell_size,
             CAST(row_number() OVER (
               PARTITION BY a.cent_id
               ORDER BY {_md5int('CAST(a.vec_id AS VARCHAR)')}, a.vec_id)
               AS INT) AS pick_rank
      FROM assign a JOIN sz ON a.cent_id = sz.cent_id
    )
    SELECT vec_id, cent_id, cell_size, pick_rank
    FROM r WHERE pick_rank <= ceil(cell_size * 10 / 100.0)
    ORDER BY vec_id
    """,
)


register(
    "ivf_nprobe_sweep",
    lambda spark, sf: similarity.ivf_nprobe_sweep(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS (
      SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM n
      ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 12))::BIGINT,
               vec_id
      LIMIT 16
    ), assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT n.vec_id, cents.cent_id,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                          cent_id) AS rn
        FROM n, cents
      ) WHERE rn = 1
    ), cellrank AS (
      SELECT n.vec_id AS query_id, cents.cent_id,
             row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY round({_dot('n.v', 'cv')} / (n.nrm * cnrm), 6) DESC,
                        cent_id) AS probe_rank
      FROM n, cents WHERE n.vec_id < 5
    ), bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round({_dot('c.v', 'q.v')} / (c.nrm * q.nrm), 6)
                          DESC, c.vec_id) AS rank
        FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id != q.vec_id
      ) WHERE rank <= 10
    ), found AS (
      SELECT cr.probe_rank
      FROM bf
      JOIN assign ON bf.neighbor_id = assign.vec_id
      JOIN cellrank cr ON cr.query_id = bf.query_id
                      AND cr.cent_id = assign.cent_id
    ), by_rank AS (
      SELECT probe_rank, CAST(count(*) AS BIGINT) AS cnt
      FROM found GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_true_pairs FROM bf
    ), grid AS (
      SELECT CAST(unnest(range(1, 9)) AS INT) AS n_probe
    )
    SELECT g.n_probe, tot.n_true_pairs,
           CAST(coalesce(sum(br.cnt), 0) AS BIGINT) AS n_hit,
           CASE WHEN tot.n_true_pairs > 0
                THEN CAST(floor(coalesce(sum(br.cnt), 0) * 1000000.0
                                / tot.n_true_pairs) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS recall_e6
    FROM grid g CROSS JOIN tot
    LEFT JOIN by_rank br ON br.probe_rank <= g.n_probe
    GROUP BY g.n_probe, tot.n_true_pairs
    ORDER BY n_probe
    """,
)


def _lpa_round(prev: str, cur: str) -> str:
    """One unrolled label-propagation round: majority out-neighbor
    label (vote count desc, smallest label on ties), keep-own for
    nodes without out-edges. MATERIALIZED: each round references its
    predecessor twice (keep-side + vote-side), so plain CTE inlining
    would re-expand the kNN pair subtree 2^rounds times — the
    embedding_top_component lesson."""
    return f"""{cur} AS MATERIALIZED (
      SELECT l.node, coalesce(w.new_label, l.label) AS label
      FROM {prev} l LEFT JOIN (
        SELECT node, label AS new_label FROM (
          SELECT e.src AS node, x.label,
                 row_number() OVER (PARTITION BY e.src
                   ORDER BY count(*) DESC, x.label) AS rn
          FROM edges e JOIN {prev} x ON e.dst = x.node
          GROUP BY e.src, x.label
        ) WHERE rn = 1
      ) w ON l.node = w.node
    )"""


register(
    "knn_label_propagation",
    lambda spark, sf: graph.label_propagation_knn(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH {_KNN_CTES},
    edges AS MATERIALIZED (
      SELECT vec_id AS src, neighbor_id AS dst FROM r WHERE rank <= 5
    ),
    l0 AS MATERIALIZED (
      SELECT vec_id AS node, CAST(label AS BIGINT) AS label
      FROM embeddings
    ),
    {_lpa_round('l0', 'l1')},
    {_lpa_round('l1', 'l2')}
    SELECT l0.node AS vec_id, l0.label AS label_seed,
           l2.label AS label_prop,
           (l0.label != l2.label) AS changed
    FROM l0 JOIN l2 ON l0.node = l2.node
    ORDER BY vec_id
    """,
)


register(
    "hard_negative_mining",
    lambda spark, sf: similarity.hard_negative_mining(
        *_t(spark, sf, "embeddings")),
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
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos_raw
      FROM assign x
      JOIN assign y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
      JOIN n a ON a.vec_id = x.vec_id
      JOIN n b ON b.vec_id = y.vec_id
      WHERE {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= 0.35
        AND a.label != b.label
    ), bidir AS (
      SELECT vec_a AS anchor_id, vec_b AS negative_id, cos_raw FROM p
      UNION ALL
      SELECT vec_b AS anchor_id, vec_a AS negative_id, cos_raw FROM p
    ), capped AS (
      -- mirrors the Spark per-anchor pool cap exactly: top
      -- pool_factor*n_neg = 12 candidates by RAW cosine desc,
      -- negative_id asc (the same doubles both engines compute)
      SELECT anchor_id, negative_id, cos_raw FROM (
        SELECT anchor_id, negative_id, cos_raw,
               row_number() OVER (PARTITION BY anchor_id
                 ORDER BY cos_raw DESC, negative_id) AS prank
        FROM bidir
      ) WHERE prank <= 12
    )
    SELECT anchor_id, negative_id, cosine, rank FROM (
      SELECT anchor_id, negative_id, round(cos_raw, 6) AS cosine,
             CAST(row_number() OVER (PARTITION BY anchor_id
               ORDER BY round(cos_raw, 6) DESC, negative_id) AS INT)
               AS rank
      FROM capped
    ) WHERE rank <= 3
    ORDER BY anchor_id, rank
    """,
)


register(
    "streaming_churn_guard",
    monitors.streaming_churn_guard,
    """
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), hist AS (
      SELECT n_versions, CAST(count(*) AS BIGINT) AS n_keys
      FROM per_key GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS total_keys,
             CAST(sum(n_versions) AS BIGINT) AS total_changes
      FROM per_key
    )
    SELECT n_versions, n_keys,
           CAST(n_versions * n_keys AS BIGINT) AS n_changes,
           CAST(floor(n_keys * 1000000.0 / total_keys) AS BIGINT)
             AS keys_share_e6,
           CAST(floor(n_versions * n_keys * 1000000.0 / total_changes)
                AS BIGINT) AS changes_share_e6
    FROM hist CROSS JOIN tot ORDER BY n_versions
    """,
)


register(
    "streaming_heavy_hitters",
    monitors.streaming_heavy_hitters,
    # chop-invariant by associativity: shares the batch oracle
    f"""
    WITH toks AS (
      SELECT unnest({_TOKENS}) AS w FROM documents
    ), cms AS (
      SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT d.j,
               ({_md5int("CAST(d.j AS VARCHAR) || ':' || w")} % 1024)
                 AS bucket
        FROM toks CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
      ) GROUP BY 1, 2
    ), exact AS (
      SELECT w, CAST(count(*) AS BIGINT) AS exact_count
      FROM toks GROUP BY 1
    ), top AS (
      SELECT w, exact_count,
             CAST(row_number() OVER (ORDER BY exact_count DESC, w)
                  AS INT) AS rank
      FROM exact ORDER BY exact_count DESC, w LIMIT 20
    ), probes AS (
      SELECT t.w, t.exact_count, t.rank, d.j,
             ({_md5int("CAST(d.j AS VARCHAR) || ':' || t.w")} % 1024)
               AS bucket
      FROM top t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
    ), est AS (
      SELECT p.rank, p.w, p.exact_count,
             CAST(min(c.cnt) AS BIGINT) AS cms_estimate
      FROM probes p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
      GROUP BY 1, 2, 3
    )
    SELECT rank, w AS token, exact_count, cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est ORDER BY rank
    """,
)


register(
    "token_heavy_hitters",
    lambda spark, sf: textanalysis.token_heavy_hitters(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT unnest({_TOKENS}) AS w FROM documents
    ), cms AS (
      SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT d.j,
               ({_md5int("CAST(d.j AS VARCHAR) || ':' || w")} % 1024)
                 AS bucket
        FROM toks CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
      ) GROUP BY 1, 2
    ), exact AS (
      SELECT w, CAST(count(*) AS BIGINT) AS exact_count
      FROM toks GROUP BY 1
    ), top AS (
      SELECT w, exact_count,
             CAST(row_number() OVER (ORDER BY exact_count DESC, w)
                  AS INT) AS rank
      FROM exact ORDER BY exact_count DESC, w LIMIT 20
    ), probes AS (
      SELECT t.w, t.exact_count, t.rank, d.j,
             ({_md5int("CAST(d.j AS VARCHAR) || ':' || t.w")} % 1024)
               AS bucket
      FROM top t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
    ), est AS (
      SELECT p.rank, p.w, p.exact_count,
             CAST(min(c.cnt) AS BIGINT) AS cms_estimate
      FROM probes p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
      GROUP BY 1, 2, 3
    )
    SELECT rank, w AS token, exact_count, cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est ORDER BY rank
    """,
)


register(
    "dedup_weighted_sample",
    lambda spark, sf: dedup.dedup_weighted_sample(
        *_t(spark, sf, "documents")),
    f"""
    WITH keyed AS (
      SELECT doc_id, source, md5(text) AS h FROM documents
    ), sizes AS (
      SELECT h, CAST(count(*) AS BIGINT) AS n_copies
      FROM keyed GROUP BY 1
    )
    SELECT k.doc_id, k.source, s.n_copies,
           CAST(floor(1000000.0 / s.n_copies) AS BIGINT) AS weight_e6
    FROM keyed k JOIN sizes s USING (h)
    WHERE ({_md5int("CAST(k.doc_id AS VARCHAR)")} % 1000000)
          < CAST(floor(1000000.0 / s.n_copies) AS BIGINT)
    ORDER BY k.doc_id
    """,
)


register(
    "doc_perplexity_buckets",
    lambda spark, sf: textanalysis.doc_perplexity_buckets(
        *_t(spark, sf, "documents")),
    f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKENS}) AS w FROM documents
    ), vocab AS (
      SELECT w, count(*) AS tf FROM toks GROUP BY w
    ), total AS (
      SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM vocab
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(floor(sum(CAST(floor(-ln(tf / n_total) * 1e6)
                                 AS BIGINT))
                        / count(*)) AS BIGINT) AS avg_nll_micro
      FROM toks JOIN vocab USING (w), total
      GROUP BY doc_id, source
    ), bucketed AS (
      SELECT source,
             CAST(least(15, floor(avg_nll_micro / 2000000)) AS INT)
               AS bucket
      FROM per_doc
    ), hist AS (
      SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs
      FROM bucketed GROUP BY 1, 2
    ), totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS source_docs
      FROM bucketed GROUP BY 1
    )
    SELECT h.source, h.bucket, h.n_docs,
           CAST(floor(h.n_docs * 1000000.0 / t.source_docs) AS BIGINT)
             AS share_e6
    FROM hist h JOIN totals t USING (source)
    ORDER BY source, bucket
    """,
)


register(
    "streaming_bloom_guard",
    monitors.streaming_bloom_guard,
    # chop-invariant by union associativity: shares the batch oracle
    f"""
    WITH keyed AS (
      SELECT doc_id, md5(text) AS h,
             ({_md5int("CAST(doc_id AS VARCHAR)")} % 2 = 0) AS is_ref
      FROM documents
    ), refh AS (
      SELECT DISTINCT h FROM keyed WHERE is_ref
    ), bits AS (
      SELECT DISTINCT
             ({_md5int("CAST(d.j AS VARCHAR) || ':' || h")} % 262144)
               AS pos
      FROM refh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
    ), qdocs AS (
      SELECT doc_id, h FROM keyed WHERE NOT is_ref
    ), probe AS (
      SELECT q.doc_id, q.h,
             ({_md5int("CAST(d.j AS VARCHAR) || ':' || q.h")} % 262144)
               AS pos
      FROM qdocs q CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
    ), hits AS (
      SELECT doc_id FROM probe p JOIN bits b USING (pos)
      GROUP BY doc_id, h HAVING count(*) = 4
    ), agg AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM refh) AS n_ref_distinct,
        (SELECT CAST(count(*) AS BIGINT) FROM qdocs) AS n_query_docs,
        (SELECT CAST(count(*) AS BIGINT) FROM qdocs q
          WHERE EXISTS (SELECT 1 FROM refh r WHERE r.h = q.h))
          AS n_true_dups,
        (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_bloom_hits,
        (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set
    )
    SELECT n_ref_distinct, n_query_docs, n_true_dups, n_bloom_hits,
           CAST(n_bloom_hits - n_true_dups AS BIGINT) AS n_false_pos,
           CAST(floor((n_bloom_hits - n_true_dups) * 1000000.0
                      / greatest(1, n_query_docs - n_true_dups))
                AS BIGINT) AS fp_rate_e6,
           bits_set,
           CAST(floor(bits_set * 1000000.0 / 262144) AS BIGINT)
             AS fill_e6
    FROM agg
    """,
)


register(
    "dedup_bloom_audit",
    lambda spark, sf: dedup.dedup_bloom_audit(
        *_t(spark, sf, "documents")),
    f"""
    WITH keyed AS (
      SELECT doc_id, md5(text) AS h,
             ({_md5int("CAST(doc_id AS VARCHAR)")} % 2 = 0) AS is_ref
      FROM documents
    ), refh AS (
      SELECT DISTINCT h FROM keyed WHERE is_ref
    ), bits AS (
      SELECT DISTINCT
             ({_md5int("CAST(d.j AS VARCHAR) || ':' || h")} % 262144)
               AS pos
      FROM refh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
    ), qdocs AS (
      SELECT doc_id, h FROM keyed WHERE NOT is_ref
    ), probe AS (
      SELECT q.doc_id, q.h,
             ({_md5int("CAST(d.j AS VARCHAR) || ':' || q.h")} % 262144)
               AS pos
      FROM qdocs q CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) d
    ), hits AS (
      SELECT doc_id FROM probe p JOIN bits b USING (pos)
      GROUP BY doc_id, h HAVING count(*) = 4
    ), agg AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM refh) AS n_ref_distinct,
        (SELECT CAST(count(*) AS BIGINT) FROM qdocs) AS n_query_docs,
        (SELECT CAST(count(*) AS BIGINT) FROM qdocs q
          WHERE EXISTS (SELECT 1 FROM refh r WHERE r.h = q.h))
          AS n_true_dups,
        (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_bloom_hits,
        (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set
    )
    SELECT n_ref_distinct, n_query_docs, n_true_dups, n_bloom_hits,
           CAST(n_bloom_hits - n_true_dups AS BIGINT) AS n_false_pos,
           CAST(floor((n_bloom_hits - n_true_dups) * 1000000.0
                      / greatest(1, n_query_docs - n_true_dups))
                AS BIGINT) AS fp_rate_e6,
           bits_set,
           CAST(floor(bits_set * 1000000.0 / 262144) AS BIGINT)
             AS fill_e6
    FROM agg
    """,
)


register(
    "ann_pq_distortion_report",
    lambda spark, sf: similarity.ann_pq_distortion_report(
        *_t(spark, sf, "embeddings")),
    f"""
    WITH n AS ({_EMB_NORMED}),
    cents AS ({_PQ_CENTS}),
    subm AS (SELECT unnest(range(0, 8)) AS m),
    enc AS (
      SELECT n.vec_id, subm.m,
             CAST(floor({_l2sq('(n.v[(subm.m*8+1):(subm.m*8+8)])',
                               '(cents.cv[(subm.m*8+1):(subm.m*8+8)])')}
                        * 1000000.0) AS BIGINT) AS d_u
      FROM n, cents, subm
    ), per_vec AS (
      SELECT vec_id, m, CAST(min(d_u) AS BIGINT) AS dmin_u
      FROM enc GROUP BY vec_id, m
    )
    SELECT CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(floor(CAST(sum(dmin_u) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_sq_err_u,
           CAST(max(dmin_u) AS BIGINT) AS max_sq_err_u
    FROM per_vec GROUP BY m ORDER BY m
    """,
)


register(
    "hybrid_search_rrf",
    lambda spark, sf: textanalysis.hybrid_search_rrf(
        *_t(spark, sf, "documents")),
    """
    WITH bm_base AS (WITH toks AS (
      SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x != '')) AS w FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), st AS (
      SELECT CAST(sum(dl) AS BIGINT) AS sum_dl, count(*) AS n_docs FROM dl
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM toks
      WHERE w IN ('spark', 'query', 'fast') GROUP BY 1, 2
    ), dfc AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), sc AS (
      SELECT t.doc_id,
             CAST(floor(ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5))
                  * (t.tf * 2.2)
                  / (t.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * l.dl / (st.sum_dl / st.n_docs)))
                  * 1000000.0) AS BIGINT) AS c_e6
      FROM tf t JOIN dfc d USING (w) JOIN dl l USING (doc_id), st
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
           (floor(sum(c_e6) / 100.0) / 10000.0) AS score
    FROM sc GROUP BY 1
    ORDER BY score DESC, doc_id
    LIMIT 20),
    tf_base AS (WITH ex AS (
      SELECT doc_id, unnest(list_filter(str_split(text, ' '), x -> x != '')) AS w FROM documents
    ), fex AS (
      SELECT doc_id, w FROM ex WHERE w IN ('spark', 'query', 'fast')
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM fex GROUP BY 1, 2
    ), dfc AS (
      SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id,
           (floor(sum(tf * ln(n_docs * 1.0 / df)) * 10000.0) / 10000.0)
             AS score
    FROM tf JOIN dfc USING (w), n
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20),
    bm AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                  AS INT) AS rank_bm25
      FROM bm_base
    ), tfr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                  AS INT) AS rank_tfidf
      FROM tf_base
    ), fused AS (
      SELECT coalesce(bm.doc_id, tfr.doc_id) AS doc_id,
             bm.rank_bm25, tfr.rank_tfidf,
             CAST(coalesce(CAST(floor(1000000.0 / (60 + bm.rank_bm25))
                                AS BIGINT), 0)
                  + coalesce(CAST(floor(1000000.0 / (60 + tfr.rank_tfidf))
                                  AS BIGINT), 0) AS BIGINT) AS rrf_e6
      FROM bm FULL OUTER JOIN tfr ON bm.doc_id = tfr.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id)
                AS INT) AS fused_rank,
           doc_id, rank_bm25, rank_tfidf, rrf_e6
    FROM fused ORDER BY fused_rank
""",
)


# ---------------------------------------------------------------------------
# entity resolution / record linkage (operators/er.py)
# ---------------------------------------------------------------------------

def _er_keys_sql(window: int) -> str:
    """Masked-key relation twin of er._masked_keys: for p = 1..window
    (position from the end), the name with that position replaced by
    chr(1) — equal keys ⟹ the two names differ only there."""
    return f"""
      SELECT id, name, CAST(u.p AS INT) AS p,
             substr(name, 1, length(name) - u.p) || chr(1) ||
             substr(name, length(name) - u.p + 2, u.p - 1) AS k
      FROM (SELECT c_custkey AS id, lower(c_name) AS name
            FROM customer) r,
           LATERAL (SELECT unnest(range(1, {window + 1})) AS p) u
      WHERE length(name) > u.p
    """


def _er_pair_core_sql(window: int) -> str:
    """Distinct candidate pairs sharing any masked key (flat — no
    WITH — so _cc_oracle can embed it as its base CTE)."""
    return f"""
      SELECT DISTINCT a.id AS id_a, a.name AS name_a,
                      b.id AS id_b, b.name AS name_b
      FROM ({_er_keys_sql(window)}) a
      JOIN ({_er_keys_sql(window)}) b
        ON a.p = b.p AND a.k = b.k AND b.id > a.id
    """


register(
    "er_name_pairs",
    lambda spark, sf: er.er_name_pairs(*_t(spark, sf, "customer")),
    f"""
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS edit_distance
    FROM ({_er_pair_core_sql(4)}) cand
    WHERE levenshtein(name_a, name_b) <= 1
    ORDER BY id_a, id_b
    """,
    # id-grain pair output grows ~SF² with identical-name mass; above
    # the block budget the operator auto-routes to keeper grain
    # (er_name_links is the registered scale form)
    tier="diagnostic",
)


register(
    "er_blocking_report",
    lambda spark, sf: er.er_blocking_report(*_t(spark, sf, "customer")),
    f"""
    WITH b AS (
      SELECT p, k, count(*) AS sz
      FROM ({_er_keys_sql(4)}) keys
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT p, CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(max(sz) AS BIGINT) AS max_block_size,
           CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_candidate_pairs
    FROM b GROUP BY p ORDER BY p
    """,
)


def _er_links_keys_sql(window: int) -> str:
    """Masked keys over the DISTINCT-name relation (er_name_links
    twin): id := keeper (min custkey of the name group)."""
    return f"""
      SELECT id, name, CAST(u.p AS INT) AS p,
             substr(name, 1, length(name) - u.p) || chr(1) ||
             substr(name, length(name) - u.p + 2, u.p - 1) AS k
      FROM (SELECT min(c_custkey) AS id, lower(c_name) AS name
            FROM customer GROUP BY lower(c_name)) r,
           LATERAL (SELECT unnest(range(1, {window + 1})) AS p) u
      WHERE length(name) > u.p
    """


def _er_clusters_name_grain_sql() -> str:
    """Name-grain CC oracle twin of the rewritten er_name_clusters:
    closure over keeper-to-keeper typo links of DISTINCT names (the
    id-grain edge relation is ~SF² under identical-name mass — the
    26.4M-pairs-at-sf1 measurement), identical-name groups ride
    n_ids, unlinked dup-names are singleton components. Output is
    id-grain-identical: Σ n_ids sizes, min-keeper labels/keepers."""
    links_core = f"""
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM ({_er_links_keys_sql(2)}) a
      JOIN ({_er_links_keys_sql(2)}) b
        ON a.p = b.p AND a.k = b.k AND b.id > a.id
      WHERE levenshtein(a.name, b.name) <= 1
    """
    return f"""
    WITH RECURSIVE names AS (
      SELECT lower(c_name) AS name,
             CAST(count(*) AS BIGINT) AS n_ids,
             min(c_custkey) AS keeper_id
      FROM customer GROUP BY 1
    ), base AS (
      {links_core}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM base
      UNION ALL
      SELECT id_b, id_a FROM base
    ), walk(src, reach) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ), comp AS (
      SELECT src AS keeper_id, least(src, min(reach)) AS label
      FROM walk GROUP BY src
    ), labeled AS (
      SELECT coalesce(c.label, n.keeper_id) AS label,
             n.n_ids, n.keeper_id
      FROM names n LEFT JOIN comp c ON c.keeper_id = n.keeper_id
    )
    SELECT label AS cluster_id,
           CAST(sum(n_ids) AS BIGINT) AS cluster_size,
           min(keeper_id) AS keeper_id
    FROM labeled
    GROUP BY label
    HAVING sum(n_ids) > 1
    ORDER BY cluster_id
    """


register(
    "er_name_clusters",
    # iterative pointer doubling on the Spark side; the oracle walks
    # the DISTINCT-NAME keeper-link relation to exact components
    # (window=2 keeps components alphabet-bounded, so the closure is
    # linear in distinct names — never in ids)
    lambda spark, sf: er.er_name_clusters(*_t(spark, sf, "customer")),
    _er_clusters_name_grain_sql(),
)


register(
    "streaming_er_guard",
    # admission-time er_name_pairs: per-epoch masked keys through the
    # idempotent epoch-dir sink, block-group-verify over the
    # accumulated store (chop-invariant by construction — masking is
    # a per-row map); shares the batch operator's oracle
    monitors.streaming_er_guard,
    f"""
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS edit_distance
    FROM ({_er_pair_core_sql(4)}) cand
    WHERE levenshtein(name_a, name_b) <= 1
    ORDER BY id_a, id_b
    """,
)


register(
    "er_name_links",
    # scale form of er_name_pairs: distinct-name grain with implied
    # id-pair multiplicities (operators/er.py er_name_links — the
    # collapse-first remedy the sf1 26.4M-pair measurement forced)
    lambda spark, sf: er.er_name_links(*_t(spark, sf, "customer")),
    f"""
    WITH names AS (
      SELECT lower(c_name) AS name,
             CAST(count(*) AS BIGINT) AS n_ids,
             min(c_custkey) AS keeper_id
      FROM customer GROUP BY 1
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, a.name AS name_a,
                      b.id AS id_b, b.name AS name_b
      FROM ({_er_links_keys_sql(4)}) a
      JOIN ({_er_links_keys_sql(4)}) b
        ON a.p = b.p AND a.k = b.k AND b.id > a.id
    ), verified AS (
      SELECT id_a, id_b, name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS INT) AS edit_distance
      FROM cand WHERE levenshtein(name_a, name_b) <= 1
    )
    SELECT v.name_a, v.name_b,
           v.id_a AS keeper_id_a, v.id_b AS keeper_id_b,
           na.n_ids AS n_ids_a, nb.n_ids AS n_ids_b,
           CAST(na.n_ids * nb.n_ids AS BIGINT) AS implied_id_pairs,
           v.edit_distance
    FROM verified v
    JOIN names na ON v.name_a = na.name
    JOIN names nb ON v.name_b = nb.name
    ORDER BY v.name_a, v.name_b
    """,
)


register(
    "doc_keyphrases",
    # per-doc top-3 TF-IDF terms (operators/textanalysis.py
    # doc_keyphrases); ln on bit-identical inputs, e4-floored BEFORE
    # ranking, token tie-break
    lambda spark, sf: textanalysis.doc_keyphrases(
        *_t(spark, sf, "documents")),
    f"""
    WITH ex AS (
      SELECT doc_id, unnest({_TOKENS}) AS w FROM documents
    ), ex2 AS (
      SELECT doc_id, w FROM ex
      WHERE NOT list_contains({_STOPS}, w)
    ), tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM ex2 GROUP BY 1, 2
    ), dfc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), nd AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    ), scored AS (
      SELECT doc_id, tf.w AS w, tf, df,
             CAST(floor(tf * ln(CAST(n AS DOUBLE) / df) * 10000)
                  AS BIGINT) AS score_e4
      FROM tf, dfc, nd WHERE tf.w = dfc.w
    ), ranked AS (
      SELECT doc_id, w, tf, df, score_e4,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY score_e4 DESC, w) AS INT) AS rank
      FROM scored
    )
    SELECT doc_id, rank, w AS token, tf, df, score_e4
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)


register(
    "ann_ndcg_report",
    lambda spark, sf: similarity.ann_ndcg_report(
        *_t(spark, sf, "embeddings")),
    # DCG weights are Python-precomputed e9 integers (ndcg_weights)
    # inlined into BOTH engines — ranking math is pure bigint
    f"""
    WITH {_KNN_CTES},
    ed AS (SELECT vec_id, neighbor_id, rank FROM r WHERE rank <= 5),
    e AS (
      SELECT ed.vec_id, a.label AS lab_a, b.label AS lab_n, ed.rank
      FROM ed JOIN embeddings a ON ed.vec_id = a.vec_id
              JOIN embeddings b ON ed.neighbor_id = b.vec_id
    ), per AS (
      SELECT vec_id, lab_a,
             CAST(sum(CASE WHEN lab_a = lab_n THEN
                    CASE rank WHEN 1 THEN 1000000000 WHEN 2 THEN 630929753 WHEN 3 THEN 500000000 WHEN 4 THEN 430676558 WHEN 5 THEN 386852807 ELSE 0 END
                  ELSE 0 END) AS BIGINT) AS dcg_e9,
             CAST(sum(CASE WHEN lab_a = lab_n THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel
      FROM e GROUP BY 1, 2
    ), counts AS (
      SELECT label, CAST(count(*) AS BIGINT) AS cnt
      FROM embeddings GROUP BY 1
    ), scored AS (
      SELECT counts.label, dcg_e9, n_rel,
             CASE least(5, cnt - 1) WHEN 0 THEN 0 WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929753 WHEN 3 THEN 2130929753 WHEN 4 THEN 2561606311 WHEN 5 THEN 2948459118 ELSE 0 END AS idcg_e9
      FROM per JOIN counts ON per.lab_a = counts.label
    ), s2 AS (
      SELECT label, n_rel,
             CASE WHEN idcg_e9 > 0 THEN
               CAST(floor(dcg_e9 * 1e6 / idcg_e9) AS BIGINT)
             END AS ndcg_e6
      FROM scored
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(count(ndcg_e6) AS BIGINT) AS n_scored,
           CAST(floor(sum(ndcg_e6) / count(ndcg_e6)) AS BIGINT)
             AS mean_ndcg_e6,
           CAST(floor(sum(n_rel) * 1e6 / (count(*) * 5)) AS BIGINT)
             AS precision_at_k_e6
    FROM s2 GROUP BY label ORDER BY label
    """,
    family="ann",
)

register(
    "embedding_silhouette",
    lambda spark, sf: similarity.embedding_silhouette(
        *_t(spark, sf, "embeddings")),
    # vectors AND centroids quantize to e6 ints; dots/norms are
    # bigint sums; one double division per cosine (the
    # label_centroid_distances discipline, member-grain)
    """
    WITH ex AS (
      SELECT vec_id, label, CAST(u.i - 1 AS INT) AS dim_idx,
             CAST(floor(v[u.i] * 1000000.0) AS BIGINT) AS xq
      FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings),
           LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
    ), cent AS (
      SELECT label AS clab, dim_idx,
             CAST(floor(sum(xq) / count(*)) AS BIGINT) AS m
      FROM ex GROUP BY 1, 2
    ), cnorm AS (
      SELECT clab, CAST(sum(m * m) AS BIGINT) AS nsq_c
      FROM cent GROUP BY 1
    ), vnorm AS (
      SELECT vec_id, CAST(sum(xq * xq) AS BIGINT) AS nsq_v
      FROM ex GROUP BY 1
    ), dots AS (
      SELECT vec_id, label, clab,
             CAST(sum(xq * m) AS BIGINT) AS dot
      FROM ex JOIN cent USING (dim_idx) GROUP BY 1, 2, 3
    ), sc AS (
      SELECT vec_id, label, clab,
             dot / sqrt(CAST(nsq_v AS DOUBLE) * CAST(nsq_c AS DOUBLE))
               AS cos
      FROM dots JOIN cnorm USING (clab) JOIN vnorm USING (vec_id)
      WHERE nsq_v > 0 AND nsq_c > 0
    ), per AS (
      SELECT vec_id, label,
             max(CASE WHEN clab = label THEN cos END) AS cos_own,
             max(CASE WHEN clab != label THEN cos END) AS cos_oth
      FROM sc GROUP BY 1, 2
    ), s AS (
      SELECT label,
             CASE WHEN cos_own IS NOT NULL AND cos_oth IS NOT NULL
                       AND greatest(1 - cos_own, 1 - cos_oth) > 0
                  THEN CAST(floor((cos_own - cos_oth)
                                  / greatest(1 - cos_own, 1 - cos_oth)
                                  * 1e6) AS BIGINT)
             END AS s_e6
      FROM per
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(s_e6) AS BIGINT) AS n_scored,
           CAST(floor(sum(s_e6) / count(s_e6)) AS BIGINT)
             AS mean_silhouette_e6
    FROM s GROUP BY label ORDER BY label
    """,
    family="ann",
)


register(
    "streaming_pii_guard",
    monitors.streaming_pii_guard,
    # chop-invariant per-doc PII scores: the epoch union equals the
    # batch result; same sequential-redaction chain as pii_redact
    """
    WITH s1 AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(text,
                  '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}')) - 1
                  AS BIGINT) AS n_card,
             regexp_replace(text,
                  '[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}',
                  '<CARD>', 'g') AS t1
      FROM documents
    ), s2 AS (
      SELECT doc_id, source, n_card,
             CAST(len(regexp_split_to_array(t1,
                  '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]')) - 1 AS BIGINT)
               AS n_phone,
             regexp_replace(t1, '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]',
                  '<PHONE>', 'g') AS t2
      FROM s1
    ), s3 AS (
      SELECT doc_id, source, n_card, n_phone,
             CAST(len(regexp_split_to_array(t2,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) - 1
                  AS BIGINT) AS n_email
      FROM s2
    )
    SELECT doc_id, source, n_email, n_phone, n_card,
           (n_email + n_phone + n_card) > 0 AS has_pii
    FROM s3 ORDER BY doc_id
    """,
    family="streaming",
)
