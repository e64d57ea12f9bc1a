"""Corpus-curation operators: the round-10 additions a large-scale
LLM training-data pipeline runs between raw ingest and tokenization —
exact-substring duplicate spans (the dedup granularity BELOW whole
documents), semantic prune lists over embeddings, DSIR-style
importance weights, bigram LM scoring, and the two capacity planners
(MinHash band tuning, Bloom filter sizing) that decide how the dedup
stages are PARAMETERIZED before a 100-TB run.

Everything is built-in DataFrame expressions (whole-stage codegen);
no Python UDFs. Reference parity note: the reference pipeline
(scripts/transform_script, monitoring/detectors/) has no sub-document
dedup or importance-weighting stage at all — these extend the §2
surface along the training-data axis the brief names first-class.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import textfn


def _spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-spread on the row key before explode-heavy work:
    single-file inputs otherwise pin the stage to one task
    (SURVEY §3b); downstream per-key aggs reuse the exchange."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, key)


# ---------------------------------------------------------------------------
# exact substring duplicate spans (sub-document dedup)
# ---------------------------------------------------------------------------

def dedup_substring_spans(documents: DataFrame, k: int = 8) -> DataFrame:
    """Duplicated-substring span report: every maximal token span
    covered by k-token shingles that occur MORE THAN ONCE anywhere in
    the corpus (including repeats inside the same document). This is
    the sub-document granularity of exact dedup — the spans a
    train-set curator cuts out of otherwise-unique documents
    (boilerplate headers, license blocks, templated paragraphs),
    as opposed to dropping whole near-duplicate documents.

    Method: shingle every token position (k consecutive tokens), hash
    the shingle, count occurrences corpus-wide, mark positions whose
    shingle count ≥ 2, then merge overlapping/adjacent marked
    intervals [pos, pos+k-1] per document (gaps-and-islands over the
    per-doc position sequence).

    Scale shape: the corpus-wide count is ONE groupBy on a 48-bit
    shingle hash — the shuffle carries (hash, count), never text; the
    join back is hash-keyed. The island merge is a per-document
    window (partitionBy doc_id), bounded by document length — no
    global ordering anywhere. At 100 TB this is the same shape as
    dedup_exact with a token-grain fan-out, and the fan-out rows are
    (doc_id, pos, hash) — fixed-width.

    Output: one row per merged span — (doc_id, span_start, span_end,
    span_tokens, n_dup_shingles), token positions 0-based inclusive.
    """
    t = textfn.tokens("text")
    d = (_spread(documents)
         .select("doc_id", t.alias("t"))
         .filter(F.size("t") >= k))
    # start positions are 1-based for slice(); pos output is 0-based
    sh = d.select(
        "doc_id",
        F.posexplode(F.expr(
            f"transform(sequence(1, size(t) - {k - 1}), "
            f"i -> concat_ws(' ', slice(t, i, {k})))")
        ).alias("pos0", "s"),
    ).select("doc_id", F.col("pos0").cast("bigint").alias("pos"),
             textfn.md5int(F.col("s")).alias("h"))
    dup_h = (sh.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
             .filter(F.col("c") >= 2).select("h"))
    dup = sh.join(dup_h, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    lag = F.lag("pos").over(w)
    # intervals are [pos, pos+k-1]; merge when the next start is
    # within (or exactly adjacent to) the previous interval
    brk = F.when(lag.isNull() | (F.col("pos") - lag > k), 1).otherwise(0)
    isl = (dup.withColumn("brk", brk)
           .withColumn("island",
                       F.sum("brk").over(
                           w.rowsBetween(Window.unboundedPreceding, 0))))
    return (
        isl.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + (k - 1)).alias("span_end"),
             (F.max("pos") - F.min("pos") + k).alias("span_tokens"),
             F.count(F.lit(1)).cast("bigint").alias("n_dup_shingles"))
        .select("doc_id", "span_start", "span_end", "span_tokens",
                "n_dup_shingles")
        .orderBy("doc_id", "span_start")
    )


# ---------------------------------------------------------------------------
# semantic dedup prune list (SemDeDup-style)
# ---------------------------------------------------------------------------

def semdedup_prune(embeddings: DataFrame,
                   threshold: float = 0.35) -> DataFrame:
    """SemDeDup-style semantic prune list: within IVF cells (the
    deterministic fixed-K grid shared with dedup_embedding_cells /
    ann_ivf_topk), a vector is PRUNED when a smaller-id vector in the
    same cell has cosine ≥ threshold with it — the greedy
    keep-the-minimum-id-representative rule, applied cell-locally
    exactly as SemDeDup applies it cluster-locally. Output is the
    full corpus with a kept flag, i.e. the admission list a training
    run consumes (prune list = NOT kept).

    Scale shape: candidate pairs are bounded by cell co-membership
    (equi-join on cell id — dedup_embedding's cell mode does the
    work); the prune set is a DISTINCT over pair rows; the final pass
    is one left join of the corpus against the prune set on vec_id.
    Nothing is all-pairs, nothing collects.
    """
    from selfhealingdatapipeline_gcp_spark.operators import dedup

    pairs = dedup.dedup_embedding(embeddings, threshold=threshold)
    pruned = (pairs.select(F.col("vec_b").alias("vec_id")).distinct()
              .withColumn("pruned", F.lit(True)))
    return (
        embeddings.select("vec_id", "label")
        .join(pruned, "vec_id", "left")
        .select("vec_id", "label",
                F.coalesce(~F.col("pruned"), F.lit(True)).alias("kept"))
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# DSIR-style hashed-ngram importance weights
# ---------------------------------------------------------------------------

def dsir_importance_weights(documents: DataFrame,
                            n_buckets: int = 4096) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR) weights over
    hashed unigram features: per-document log importance weight
    log p_target(x) - log p_raw(x) under bag-of-hashed-unigram
    models, target = the lexicographically smallest source (the
    deterministic stand-in for "the high-quality reference slice" —
    swap the aggregate for a literal in production). Documents that
    look like the target slice score high; resampling by these
    weights tilts a raw crawl toward the target distribution.

    Scale shape: ONE token-grain pass builds the 2×n_buckets count
    table (groupBy on a 12-bit bucket — the shuffle carries
    (bucket, count)); per-bucket log-ratios λ_b live on a ≤n_buckets
    row relation that BROADCASTS to the per-token join; the per-doc
    weight is a bigint sum of per-token floor(λ·1e6) micro-units —
    order-independent across partial aggregation, retries, and the
    oracle (the text_unigram_logprob discipline).

    Output: (doc_id, source, n_tokens, dsir_logweight), logweight at
    1e-4 precision.
    """
    toks = (_spread(documents)
            .select("doc_id", "source",
                    F.explode(textfn.tokens("text")).alias("w")))
    tgt = documents.agg(F.min("source").alias("tgt"))
    tb = (toks.crossJoin(F.broadcast(tgt))
          .select("doc_id", "source",
                  F.pmod(textfn.md5int(F.col("w")),
                         F.lit(n_buckets)).alias("b"),
                  (F.col("source") == F.col("tgt"))
                  .cast("bigint").alias("is_t")))
    bc = tb.groupBy("b").agg(
        F.sum("is_t").alias("t_c"),
        (F.count(F.lit(1)) - F.sum("is_t")).alias("r_c"))
    tot = bc.agg(F.sum("t_c").alias("t_tot"), F.sum("r_c").alias("r_tot"))
    lam = (bc.crossJoin(F.broadcast(tot))
           .select("b", F.floor(
               (F.log((F.col("t_c") + 1)
                      / (F.col("t_tot") + float(n_buckets)))
                - F.log((F.col("r_c") + 1)
                        / (F.col("r_tot") + float(n_buckets)))) * 1e6)
               .cast("bigint").alias("lam_micro")))
    return (
        tb.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             (F.floor(F.sum("lam_micro") / 100) / 1e4)
             .alias("dsir_logweight"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# bigram LM negative log-likelihood (perplexity-filter sibling)
# ---------------------------------------------------------------------------

def text_bigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-document average bigram negative log-probability under the
    corpus's own bigram MLE model: nll(w1 w2) = -ln(c(w1,w2)/c(w1)).
    The order-sensitive sibling of text_unigram_logprob — shuffled or
    templated word salad scores high even when its unigram profile
    looks normal. Documents need ≥ 2 tokens to have a bigram row.

    Scale shape: bigram counts are one (w1,w2)-grain groupBy (map-side
    combined; the shuffle carries (bigram, count) — bigram-vocabulary
    sized, sublinear in corpus); unigram counts reuse the token-grain
    relation; each document's bigram rows join both count relations on
    their keys. Per-bigram nll is floor-truncated to integer
    micro-units before the bigint per-doc sum (order-independent, the
    text_unigram_logprob discipline)."""
    t = textfn.tokens("text")
    d = (_spread(documents)
         .select("doc_id", t.alias("t"))
         .filter(F.size("t") >= 2))
    big = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, "
            "element_at(t, i + 1) AS w2))")).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    uni = (_spread(documents)
           .select(F.explode(t).alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        big.join(bi, ["w1", "w2"]).join(uni, "w1")
        .select("doc_id",
                F.floor(-F.log(F.col("c2") / F.col("c1")) * 1e6)
                 .cast("bigint").alias("nll_micro")))
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             (F.floor(F.sum("nll_micro") / (F.count(F.lit(1)) * 100.0))
              / 1e4).alias("avg_neg_logprob"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH band tuning (capacity planner)
# ---------------------------------------------------------------------------

#: (bands, rows_per_band) combos with bands·rows = 32 — both factors
#: powers of two so the S-curve evaluates with pure multiplication
BAND_COMBOS: tuple[tuple[int, int], ...] = (
    (32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32))


def _pow2_chain(x, e: int):
    """x**e for e a power of two, by repeated squaring — pure IEEE
    multiplications so Spark and the SQL oracle agree bit-for-bit
    (library pow() is only within-1-ulp and would flip floor()
    boundaries)."""
    r = x
    n = 1
    while n < e:
        r = r * r
        n *= 2
    return r


def _pow2_chain_sql(expr: str, e: int) -> str:
    r = expr
    n = 1
    while n < e:
        r = f"({r} * {r})"
        n *= 2
    return r


def band_detect_sql(s_expr: str, bands: int, rows: int) -> str:
    """SQL twin of the Spark S-curve below — generated from the same
    repeated-squaring structure so the formulas are identical."""
    sr = _pow2_chain_sql(f"({s_expr})", rows)
    return f"(1.0 - {_pow2_chain_sql(f'(1.0 - {sr})', bands)})"


def minhash_band_tuning(documents: DataFrame,
                        threshold: float = 0.5) -> DataFrame:
    """LSH band-parameter tuning curve evaluated on the corpus's OWN
    observed candidate-pair similarity distribution (not a synthetic
    s-grid): for every (bands, rows_per_band) split of the 32-hash
    signature, the expected detection probability 1-(1-s^r)^b
    averaged over observed similar pairs (est_recall, s ≥ threshold)
    and over observed dissimilar candidates (est_fp_share,
    s < threshold). This is the table you read BEFORE burning a
    100-TB pass with the wrong banding: more bands → recall up,
    false-candidate mass up.

    Scale shape: the pair relation is the LSH-verified candidate set
    (bucket-bounded, never all-pairs); the S-curve is pure arithmetic
    on its jaccard column (repeated squaring — power-of-two exponents
    only — so the oracle matches bit-for-bit); everything then
    collapses to |BAND_COMBOS| rows with map-side partials."""
    from selfhealingdatapipeline_gcp_spark.operators import dedup

    pairs = dedup._lsh_verified_pairs(documents, threshold=0.0)
    s = F.col("jaccard")
    combos = []
    for b, r in BAND_COMBOS:
        p = F.lit(1.0) - _pow2_chain(F.lit(1.0) - _pow2_chain(s, r), b)
        combos.append(F.struct(
            F.lit(b).alias("bands"), F.lit(r).alias("rows_per_band"),
            F.floor(p * 1e6).cast("bigint").alias("p_micro")))
    ex = (pairs.select(s.alias("s"),
                       F.explode(F.array(*combos)).alias("c"))
          .select("s", "c.*"))
    sim = (F.col("s") >= threshold).cast("bigint")
    agg = (ex.groupBy("bands", "rows_per_band").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(sim).alias("n_similar"),
        F.sum(F.col("p_micro") * sim).alias("sim_micro"),
        F.sum(F.col("p_micro") * (1 - sim)).alias("dis_micro")))
    est = lambda tot, n: F.when(  # noqa: E731
        F.col(n) > 0, F.floor(F.col(tot) / (F.col(n) * 100.0)) / 1e4)
    return (
        agg.select(
            "bands", "rows_per_band", "n_candidates", "n_similar",
            est("sim_micro", "n_similar").alias("est_recall"),
            F.when(F.col("n_candidates") - F.col("n_similar") > 0,
                   F.floor(F.col("dis_micro")
                           / ((F.col("n_candidates")
                               - F.col("n_similar")) * 100.0)) / 1e4)
             .alias("est_fp_share"))
        .orderBy("rows_per_band")
    )


# ---------------------------------------------------------------------------
# Bloom filter sizing (capacity planner)
# ---------------------------------------------------------------------------

#: target false-positive rates the advisor prices out
BLOOM_FPPS: tuple[float, ...] = (0.001, 0.005, 0.01, 0.02)


def bloom_constants(fpp: float) -> tuple[float, int]:
    """(bits-per-key coefficient, optimal k) for a target fpp —
    computed in PYTHON so the identical double literal is inlined
    into both the Spark plan and the SQL oracle (no cross-engine
    ln() of constants on the hot path)."""
    c = -math.log(fpp) / (math.log(2) ** 2)
    k = round(-math.log(fpp) / math.log(2))
    return c, int(k)


def bloom_size_advisor(documents: DataFrame) -> DataFrame:
    """Bloom-filter capacity plan for the exact-dedup key set: for
    each target false-positive rate, the optimal bit-array size
    m = ceil(n·(-ln p)/ln²2) and hash count k = round(-ln p/ln 2)
    sized from the corpus's EXACT distinct-key count (md5(text) —
    the same key dedup_exact groups on). This is the number a
    streaming admission guard (streaming_bloom_guard) or a
    broadcast-side dedup filter is allocated with before a 100-TB
    run; the fpp row chosen decides whether the filter fits executor
    memory.

    Scale shape: one count-distinct over 16-byte digests (the single
    corpus pass); the fpp grid is a literal array — output is
    |BLOOM_FPPS| rows. At real scale you would swap the exact NDV
    for approx_count_distinct; approx_distinct_stats already bounds
    that estimator's error against this exact count."""
    nd = documents.agg(
        F.count_distinct(F.md5("text")).cast("bigint").alias("n"))
    grid = []
    for p in BLOOM_FPPS:
        c, k = bloom_constants(p)
        grid.append(F.struct(F.lit(float(p)).alias("fpp"),
                             F.lit(c).alias("c"),
                             F.lit(int(k)).alias("k")))
    m_bits = F.ceil(F.col("n") * F.col("g.c")).cast("bigint")
    return (
        nd.select("n", F.explode(F.array(*grid)).alias("g"))
        .select(F.col("g.fpp").alias("fpp"),
                F.col("n").alias("n_distinct"),
                m_bits.alias("m_bits"),
                F.col("g.k").cast("int").alias("k_hashes"),
                (F.floor(m_bits / 8.0 / 1048576.0 * 100) / 100.0)
                .alias("m_mib"))
        .orderBy("fpp")
    )


# ---------------------------------------------------------------------------
# rule-based quality filters (Gopher / C4 rule sets)
# ---------------------------------------------------------------------------

#: the Gopher-style stopword presence list (shared with the text
#: analysis operators' STOPWORDS, fixed here for rule stability)
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "to", "in", "is")


def quality_gopher_rules(documents: DataFrame) -> DataFrame:
    """Gopher-style rule filter (the Rae-et-al. repetition-free rule
    subset that is meaningful on single-line documents): word-count
    bounds, mean-word-length bounds, minimum alphabetic-word share,
    minimum distinct-stopword hits, and a symbol-token cap. Every
    rule is evaluated with INTEGER cross-multiplication (3 ≤ mean ≤
    10 becomes 3·n ≤ Σchars ≤ 10·n) — no floating point anywhere, so
    the oracle is exact by construction.

    Scale shape: pure per-row array expressions (whole-stage codegen,
    no explode, no shuffle beyond the scan) — the cheapest possible
    admission filter to run FIRST in a 100-TB curation cascade,
    before anything that tokenizes into long format."""
    t = textfn.tokens("text")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n = F.size(t).cast("bigint")
    chars = F.aggregate(F.transform(t, lambda x: F.length(x)),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x)
    alpha = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]")))\
        .cast("bigint")
    stops = F.size(F.array_intersect(F.array_distinct(t), stop_arr))\
        .cast("bigint")
    sym = F.size(F.filter(
        t, lambda x: (x == "#") | x.contains("..."))).cast("bigint")
    r_wc = (n >= 50) & (n <= 100000)
    r_len = (chars >= 3 * n) & (chars <= 10 * n)
    r_alpha = 5 * alpha >= 4 * n
    r_stop = stops >= 2
    r_sym = 10 * sym <= n
    return (
        documents.select(
            "doc_id", n.alias("n_words"), chars.alias("n_chars_in_words"),
            alpha.alias("n_alpha_words"), stops.alias("n_stop_hits"),
            sym.alias("n_symbol_words"),
            r_wc.alias("pass_word_count"),
            r_len.alias("pass_mean_word_len"),
            r_alpha.alias("pass_alpha_share"),
            r_stop.alias("pass_stopwords"),
            r_sym.alias("pass_symbol_ratio"),
            (r_wc & r_len & r_alpha & r_stop & r_sym)
            .alias("gopher_pass"))
        .orderBy("doc_id")
    )


def quality_c4_rules(documents: DataFrame) -> DataFrame:
    """C4-style rule filter (the Raffel-et-al. cleanup subset that
    applies to single-line documents): terminal punctuation, minimum
    sentence count, minimum word count, and the lorem-ipsum /
    curly-brace blocklist. Booleans + integer counts only.

    Scale shape: per-row string expressions, zero shuffles — pairs
    with quality_gopher_rules as the scan-stage admission pass."""
    t = textfn.tokens("text")
    n = F.size(t).cast("bigint")
    sents = F.regexp_count(F.col("text"), F.lit("[.!?]")).cast("bigint")
    term = F.col("text").rlike("[.!?]$")
    lorem = F.lower(F.col("text")).contains("lorem ipsum")
    brace = F.col("text").contains("{")
    return (
        documents.select(
            "doc_id", n.alias("n_words"), sents.alias("n_sentences"),
            term.alias("ends_terminal"),
            lorem.alias("has_lorem_ipsum"),
            brace.alias("has_curly_brace"),
            (term & (sents >= 3) & (n >= 5) & ~lorem & ~brace)
            .alias("c4_pass"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS-style local sampling)
# ---------------------------------------------------------------------------

def doc_winnow_fingerprints(documents: DataFrame, k: int = 4,
                            w: int = 4) -> DataFrame:
    """Winnowing fingerprint selection (the MOSS local-sampling
    guarantee): hash every k-token gram, slide a w-gram window, keep
    the MINIMUM hash per window (position tie → leftmost), emit the
    distinct selected (position, hash) pairs per document. Any shared
    substring of length ≥ k + w - 1 tokens between two documents is
    guaranteed to share at least one selected fingerprint — the
    bounded-density alternative to storing every shingle
    (doc_fingerprint keeps ONE hash per doc; this keeps a provable
    covering sample).

    Scale shape: gram hashing is per-row array arithmetic; the window
    min is a per-document ROWS frame (bounded by doc length, never
    global); the output is the distinct-selection relation — ~2/(w+1)
    of gram count in expectation. Join two corpora on fp_hash for
    plagiarism-style overlap at 100 TB."""
    t = textfn.tokens("text")
    d = (_spread(documents)
         .select("doc_id", t.alias("t"))
         .filter(F.size("t") >= k + w - 1))
    grams = d.select(
        "doc_id", (F.size("t") - (k - 1)).cast("bigint").alias("ng"),
        F.posexplode(F.expr(
            f"transform(sequence(1, size(t) - {k - 1}), "
            f"i -> cast(conv(substring(md5(concat_ws(' ', "
            f"slice(t, i, {k}))), 1, 12), 16, 10) as bigint))")
        ).alias("pos0", "h"),
    ).select("doc_id", "ng", F.col("pos0").cast("bigint").alias("pos"),
             "h")
    win = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(0, w - 1))
    wm = grams.withColumn(
        "m", F.min(F.struct(F.col("h"), F.col("pos"))).over(win))
    return (
        wm.filter(F.col("pos") <= F.col("ng") - w)
        .select("doc_id", F.col("m.pos").alias("pos"),
                F.col("m.h").alias("fp_hash"))
        .distinct()
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# semantic-dedup threshold sweep (tuning table for semdedup_prune)
# ---------------------------------------------------------------------------

def semdedup_threshold_sweep(embeddings: DataFrame) -> DataFrame:
    """Cosine-threshold tuning curve for semantic dedup: for each
    candidate cut 0.35, 0.40, … 0.95, how many in-cell pairs survive
    and how many vectors the min-id greedy rule would prune — the
    table you read before fixing semdedup_prune's threshold on a
    100-TB corpus.

    Scale shape: the dedup_threshold_sweep discipline — NOT a
    thresholds×pairs theta-join. Each pair buckets once by its
    round-e6 cosine; each vector buckets once by the MAX cosine of
    the pairs where it is the larger id (it is pruned at cut t iff
    that max ≥ t); every "≥ t" count is a suffix-cumulative window
    over the 13 fixed grid rows. Empty cuts stay visible via the
    grid LEFT join."""
    from selfhealingdatapipeline_gcp_spark.operators import dedup

    spark = embeddings.sparkSession
    pairs = dedup.dedup_embedding(embeddings, threshold=0.35)
    cos_e6 = F.round(F.col("cosine") * 1e6).cast("bigint")
    p = pairs.select("vec_a", "vec_b", cos_e6.alias("cos_e6"))
    idx = F.least(F.floor((F.col("cos_e6") - 350000) / 50000),
                  F.lit(12)).cast("bigint")
    pair_b = (p.select(idx.alias("idx"))
              .groupBy("idx").agg(F.count(F.lit(1)).alias("__np")))
    vec_b = (p.groupBy("vec_b").agg(F.max("cos_e6").alias("cos_e6"))
             .select(idx.alias("idx"))
             .groupBy("idx").agg(F.count(F.lit(1)).alias("__nv")))
    n_total = embeddings.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    grid = (spark.range(13)
            .select(F.col("id").alias("idx"),
                    (350000 + F.col("id") * 50000).alias("threshold_e6")))
    j = (grid.join(F.broadcast(pair_b), "idx", "left")
         .join(F.broadcast(vec_b), "idx", "left")
         .crossJoin(F.broadcast(n_total)))
    w = (Window.orderBy(F.desc("idx"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_pairs = F.sum(F.coalesce(F.col("__np"), F.lit(0))).over(w)
    n_pruned = F.sum(F.coalesce(F.col("__nv"), F.lit(0))).over(w)
    return (
        j.select(
            "threshold_e6",
            n_pairs.cast("bigint").alias("n_pairs"),
            n_pruned.cast("bigint").alias("n_pruned"),
            F.floor(n_pruned * 1e6 / F.col("__n")).cast("bigint")
             .alias("prune_rate_e6"))
        .orderBy("threshold_e6")
    )


# ---------------------------------------------------------------------------
# corpus scaling-law / concentration statistics
# ---------------------------------------------------------------------------

def corpus_novelty_curve(documents: DataFrame, k: int = 8,
                         n_buckets: int = 10) -> DataFrame:
    """Dedup-saturation curve: split the corpus into ``n_buckets``
    ingest-order slices (doc_id range deciles) and report, per slice,
    how many k-token shingle OCCURRENCES it contributes vs how many
    DISTINCT shingles appear there for the first time. A flattening
    novelty rate is the the-next-10-TB-adds-nothing signal every
    scale-up decision reads; a rebound marks a genuinely new source
    landing mid-corpus.

    Scale shape: occurrences come from the per-doc arithmetic
    ``max(len(t)-k+1, 0)`` — NO explode; only the first-seen side
    explodes to (hash, doc_id) and immediately collapses to hash
    grain (min doc_id per 48-bit hash — the dedup_exact shuffle
    shape, fixed-width rows). Bucket ids are pure integer division
    ``doc_id*n DIV (max_id+1)`` — no floating point anywhere before
    the final rate. The cumulative window runs over ``n_buckets``
    rows.

    Output: one row per bucket (grid-total even when empty) —
    (bucket, n_docs, n_shingle_occurrences, n_new_shingles,
    cum_new_shingles, novelty_rate_e6 [null when no occurrences]).
    """
    spark = documents.sparkSession
    t = textfn.tokens("text")
    d = _spread(documents).select("doc_id", t.alias("t"))
    hi = d.agg((F.max("doc_id") + 1).alias("hi"))
    db = (d.crossJoin(F.broadcast(hi))
          .withColumn("bucket",
                      F.expr(f"CAST(doc_id * {n_buckets} DIV hi AS INT)")))
    occ = (db.select("bucket",
                     F.greatest(F.size("t") - (k - 1), F.lit(0))
                      .cast("bigint").alias("n_sh"))
           .groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("__nd"),
                F.sum("n_sh").alias("__occ")))
    sh = (db.filter(F.size("t") >= k)
          .select("doc_id",
                  F.explode(F.expr(
                      f"transform(sequence(1, size(t) - {k - 1}), "
                      f"i -> concat_ws(' ', slice(t, i, {k})))"))
                  .alias("s"))
          .select("doc_id", textfn.md5int(F.col("s")).alias("h")))
    nw = (sh.groupBy("h").agg(F.min("doc_id").alias("fd"))
          .crossJoin(F.broadcast(hi))
          .select(F.expr(f"CAST(fd * {n_buckets} DIV hi AS INT)")
                  .alias("bucket"))
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("__new")))
    grid = spark.range(n_buckets).select(F.col("id").cast("int")
                                         .alias("bucket"))
    j = (grid.join(F.broadcast(occ), "bucket", "left")
         .join(F.broadcast(nw), "bucket", "left"))
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_new = F.coalesce(F.col("__new"), F.lit(0)).cast("bigint")
    n_occ = F.coalesce(F.col("__occ"), F.lit(0)).cast("bigint")
    return (
        j.select(
            "bucket",
            F.coalesce(F.col("__nd"), F.lit(0)).cast("bigint")
             .alias("n_docs"),
            n_occ.alias("n_shingle_occurrences"),
            n_new.alias("n_new_shingles"),
            F.sum(n_new).over(w).cast("bigint")
             .alias("cum_new_shingles"),
            F.when(n_occ > 0, F.floor(n_new * 1e6 / n_occ))
             .cast("bigint").alias("novelty_rate_e6"))
        .orderBy("bucket")
    )


def heaps_law_fit(documents: DataFrame,
                  n_buckets: int = 10) -> DataFrame:
    """Per-source Heaps'-law fit V = K·N^b: OLS of ln(cumulative
    distinct types V) on ln(cumulative tokens N) at ingest-order
    checkpoints (doc_id range deciles). The exponent b is the
    vocabulary-growth rate a tokenizer-vocab budget and a
    novelty-per-token forecast extrapolate from; template spam shows
    b near 0 (vocab saturates instantly), natural text near 0.5.

    Determinism: the source_zipf_slope discipline exactly — each
    checkpoint's ln terms floor to e9 integers BEFORE the per-source
    sums, the closed-form slope/intercept then divide exact integer
    sums in doubles written identically in both engines, floor-e6.

    Scale shape: token totals are per-(source, bucket) arithmetic on
    the scan; first-seen buckets collapse the token-grain relation to
    (source, type) vocabulary grain (sublinear, Heaps' own law); the
    OLS runs on ≤ n_buckets rows per source. Output O(|sources|).
    """
    t = textfn.tokens("text")
    d = _spread(documents).select("doc_id", "source", t.alias("t"))
    hi = d.agg((F.max("doc_id") + 1).alias("hi"))
    db = (d.crossJoin(F.broadcast(hi))
          .withColumn("bucket",
                      F.expr(f"CAST(doc_id * {n_buckets} DIV hi AS INT)")))
    tok = (db.select("source", "bucket",
                     F.size("t").cast("bigint").alias("n_tok"))
           .groupBy("source", "bucket")
           .agg(F.sum("n_tok").alias("__tok")))
    first = (db.select("source", "bucket", F.explode("t").alias("w"))
             .groupBy("source", "w")
             .agg(F.min("bucket").alias("bucket"))
             .groupBy("source", "bucket")
             .agg(F.count(F.lit(1)).alias("__new")))
    j = tok.join(first, ["source", "bucket"], "left")
    w = (Window.partitionBy("source").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_n = F.sum("__tok").over(w)
    cum_v = F.sum(F.coalesce(F.col("__new"), F.lit(0))).over(w)
    ck = (j.select("source", "bucket",
                   cum_n.cast("bigint").alias("cn"),
                   cum_v.cast("bigint").alias("cv"))
          .filter((F.col("cn") > 0) & (F.col("cv") > 0)))
    lx = F.log(F.col("cn").cast("double"))
    ly = F.log(F.col("cv").cast("double"))
    terms = ck.select(
        "source", "cn", "cv",
        F.floor(lx * 1e9).cast("bigint").alias("x_e9"),
        F.floor(ly * 1e9).cast("bigint").alias("y_e9"),
        F.floor(lx * ly * 1e9).cast("bigint").alias("xy_e9"),
        F.floor(lx * lx * 1e9).cast("bigint").alias("xx_e9"))
    agg = terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_checkpoints"),
        F.max("cn").alias("total_tokens"),
        F.max("cv").alias("total_types"),
        F.sum("x_e9").alias("sx"), F.sum("y_e9").alias("sy"),
        F.sum("xy_e9").alias("sxy"), F.sum("xx_e9").alias("sxx"))
    kk = F.col("n_checkpoints").cast("double")
    sx = F.col("sx") / 1e9
    sy = F.col("sy") / 1e9
    num = kk * (F.col("sxy") / 1e9) - sx * sy
    den = kk * (F.col("sxx") / 1e9) - sx * sx
    slope = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    intercept = (sy - slope * sx) / kk
    return (
        agg.filter(F.col("n_checkpoints") >= 3)
        .select("source", "n_checkpoints", "total_tokens",
                "total_types",
                (F.floor(slope * 1e6) / 1e6).alias("heaps_exponent"),
                (F.floor(intercept * 1e6) / 1e6)
                 .alias("heaps_intercept"))
        .orderBy("source")
    )


def token_gini(documents: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Token-frequency concentration: the Lorenz curve over the
    vocabulary (types ranked by ascending frequency, bucketed into
    rank deciles) plus the EXACT Gini coefficient via the rank
    formula G = Σ(2r − T − 1)·n_r / (T·Σn) — pure integer arithmetic
    until one final double division. High Gini (~0.95+ for natural
    text, Zipf) collapsing toward 0 flags template floods where every
    token appears equally often; the decile rows show WHERE the mass
    sits (how little of the corpus the tail types cover).

    Scale shape: one token-grain groupBy to vocabulary grain, then
    rank + running-sum windows over the VOCAB relation (global-ordered
    but vocabulary-sized — the vocab_coverage discipline). Integer
    headroom: |2r−T−1|·n_r ≤ T·Σn, so the bigint Gini numerator holds
    while vocab_size·total_tokens < 2^63 (~9.2e18 — beyond any corpus
    whose token counts themselves fit bigints times a 1e5+ vocab;
    document-scale math long before that).

    Output: ``n_buckets`` rank-decile rows (ascending frequency) —
    (decile, n_types, n_tokens, cum_type_share_e6, cum_token_share_e6,
    gini_e6) with gini_e6 constant across rows.
    """
    vocab = (
        _spread(documents)
        .select(F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    )
    win = Window.orderBy("n", "w")
    ranked = vocab.select("n", F.row_number().over(win).alias("r"))
    tot = vocab.agg(F.count(F.lit(1)).alias("t_types"),
                    F.sum("n").alias("t_tokens"))
    rt = ranked.crossJoin(F.broadcast(tot))
    gini = rt.agg(
        F.sum((2 * F.col("r") - F.col("t_types") - 1) * F.col("n"))
         .alias("gnum"),
        F.max("t_types").alias("t_types"),
        F.max("t_tokens").alias("t_tokens"))
    dec = (rt.withColumn(
               "decile",
               F.expr(f"CAST((r - 1) * {n_buckets} DIV t_types AS INT)"))
           .groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n_types"),
                F.sum("n").alias("n_tokens")))
    w = (Window.orderBy("decile")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        dec.crossJoin(F.broadcast(gini))
        .select(
            "decile",
            F.col("n_types").cast("bigint").alias("n_types"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.floor(F.sum("n_types").over(w) * 1e6 / F.col("t_types"))
             .cast("bigint").alias("cum_type_share_e6"),
            F.floor(F.sum("n_tokens").over(w) * 1e6 / F.col("t_tokens"))
             .cast("bigint").alias("cum_token_share_e6"),
            F.floor(F.col("gnum")
                    / (F.col("t_types").cast("double")
                       * F.col("t_tokens")) * 1e6)
             .cast("bigint").alias("gini_e6"))
        .orderBy("decile")
    )


def doc_length_lorenz(documents: DataFrame) -> DataFrame:
    """Document-length concentration: power-of-two token-length bins
    (the token_histogram bit-length discipline, on REAL whitespace
    token counts) with cumulative document-share and token-share —
    the Lorenz table that answers "what fraction of the token budget
    do the longest docs hold". A packing plan (seq_pack_plan) and a
    per-length sampling cap read this before committing stream
    counts; token_histogram shows the distribution, this shows the
    MASS concentration.

    Scale shape: per-row arithmetic to (bucket) grain — one tiny
    groupBy (≤ ~40 bins), integer bit-length bucketing (no libm
    log2), cumulative windows over the bin rows only.

    Output: one row per occupied bin, ascending — (log2_bucket,
    bucket_lo, n_docs, n_tokens, cum_doc_share_e6,
    cum_token_share_e6).
    """
    n_tok = F.size(textfn.tokens("text")).cast("bigint")
    m = F.greatest(n_tok, F.lit(1))
    bucket = (F.length(F.bin(m)) - 1).cast("int")
    agg = (
        _spread(documents)
        .select(n_tok.alias("n_tok"), bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"))
    )
    tot = agg.agg(F.sum("n_docs").alias("t_docs"),
                  F.sum("n_tokens").alias("t_tokens"))
    w = (Window.orderBy("log2_bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "log2_bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), log2_bucket)")
             .cast("bigint").alias("bucket_lo"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.floor(F.sum("n_docs").over(w) * 1e6 / F.col("t_docs"))
             .cast("bigint").alias("cum_doc_share_e6"),
            F.floor(F.sum("n_tokens").over(w) * 1e6
                    / F.col("t_tokens"))
             .cast("bigint").alias("cum_token_share_e6"))
        .orderBy("log2_bucket")
    )


def perplexity_ttr_agreement(documents: DataFrame) -> DataFrame:
    """Per-source Pearson agreement between the bigram-LM score and
    the type-token ratio: docs that repeat themselves have LOW
    bigram NLL (the model memorizes their loops) and LOW TTR, so on
    honest data the two quality signals correlate positively; a
    source where they decouple is scoring well on one filter while
    flunking the other — the cross-check a curation cascade runs
    before trusting either signal alone as its admission gate.

    Determinism: per-doc scores quantize to e2 integers (NLL
    micro-sum DIV'd down, TTR via floor), the per-source Pearson
    keeps SIX integer sums (the revenue_volume_correlation
    discipline) and evaluates ONE closed-form double expression
    written identically in both engines, floor-e6. Integer headroom:
    x ≤ ~2.8e3 (ln of any bigint count × e2), so Σx² holds past 1e12
    documents.

    Scale shape: reuses the bigram/unigram count relations
    (vocabulary-grain shuffles); per-doc collapse then ONE
    source-grain agg. Output O(|sources|).
    """
    t = textfn.tokens("text")
    d = (_spread(documents)
         .select("doc_id", "source", t.alias("t"))
         .filter(F.size("t") >= 2))
    big = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, "
            "element_at(t, i + 1) AS w2))")).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    uni = (_spread(documents)
           .select(F.explode(t).alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    nll = (
        big.join(bi, ["w1", "w2"]).join(uni, "w1")
        .select("doc_id",
                F.floor(-F.log(F.col("c2") / F.col("c1")) * 1e6)
                 .cast("bigint").alias("nll_micro"))
        .groupBy("doc_id")
        .agg(F.floor(F.sum("nll_micro")
                     / (F.count(F.lit(1)) * 10000.0))
              .cast("bigint").alias("x"))
    )
    ttr = d.select(
        "doc_id", "source",
        F.floor(F.size(F.array_distinct("t")) * 100.0 / F.size("t"))
         .cast("bigint").alias("y"))
    xy = ttr.join(nll, "doc_id")
    agg = xy.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n = F.col("n_docs").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov = n * F.col("sxy").cast("double") - sx * sy
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    r = F.when((vx > 0) & (vy > 0),
               F.floor(cov / F.sqrt(vx * vy) * 1e6) / 1e6)
    return (
        agg.select("source",
                   F.col("n_docs").cast("bigint").alias("n_docs"),
                   r.alias("pearson_r"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# split integrity + epoch scheduling
# ---------------------------------------------------------------------------

def split_contamination_matrix(documents: DataFrame) -> DataFrame:
    """Pairwise shingle contamination between the three hash splits
    (train/val/test by md5(doc_id) percent buckets — val < 10,
    test < 20, train otherwise): for every split pair, how many
    distinct 3-gram shingles appear on BOTH sides, with the Jaccard
    overlap. split_leakage_check surfaces WHICH val docs collide
    with train via LSH; this is the 3×3-triangle summary a release
    gate thresholds on — and it covers val↔test, the boundary the
    pairwise checks usually forget.

    Scale shape: per-doc DISTINCT shingles explode once to 48-bit
    hash grain; ONE groupBy collapses to per-shingle presence flags
    (the shuffle carries hash + three bits); ONE aggregate computes
    all three intersections and sizes in the same pass; output is
    exactly 3 rows via stack. Nothing is pairwise at doc grain.
    """
    spl = F.pmod(textfn.md5int(F.col("doc_id").cast("string")),
                 F.lit(100))
    sh = (_spread(documents)
          .select(spl.alias("b"),
                  F.explode(textfn.shingles("text")).alias("s"))
          .select("b", textfn.md5int(F.col("s")).alias("h")))
    flags = sh.groupBy("h").agg(
        F.max((F.col("b") < 10).cast("bigint")).alias("v"),
        F.max(((F.col("b") >= 10) & (F.col("b") < 20)).cast("bigint"))
         .alias("x"),
        F.max((F.col("b") >= 20).cast("bigint")).alias("t"))
    wide = flags.agg(
        F.sum("t").cast("bigint").alias("n_train"),
        F.sum("v").cast("bigint").alias("n_val"),
        F.sum("x").cast("bigint").alias("n_test"),
        F.sum(F.col("t") * F.col("v")).cast("bigint").alias("s_tv"),
        F.sum(F.col("t") * F.col("x")).cast("bigint").alias("s_tx"),
        F.sum(F.col("v") * F.col("x")).cast("bigint").alias("s_vx"))
    long = wide.selectExpr(
        "stack(3, "
        "'train', 'test', n_train, n_test, s_tx, "
        "'train', 'val',  n_train, n_val,  s_tv, "
        "'val',   'test', n_val,   n_test, s_vx) "
        "AS (split_a, split_b, n_shingles_a, n_shingles_b, n_shared)")
    union = (F.col("n_shingles_a") + F.col("n_shingles_b")
             - F.col("n_shared"))
    return (
        long.select(
            "split_a", "split_b", "n_shingles_a", "n_shingles_b",
            "n_shared",
            F.when(union > 0,
                   F.floor(F.col("n_shared") * 1e6 / union))
             .cast("bigint").alias("jaccard_e6"))
        .orderBy("split_a", "split_b")
    )


def epoch_shuffle_plan(documents: DataFrame, n_epochs: int = 3,
                       n_buckets: int = 16) -> DataFrame:
    """Deterministic per-epoch shuffle plan: every document lands in
    bucket md5(doc_id ':' epoch) % n_buckets, so each epoch visits
    the corpus in a DIFFERENT but fully reproducible order (retry-
    and resume-stable — no rand(), the train_val_split discipline),
    and no epoch's order correlates with another's. The output is
    the (epoch, bucket) manifest a data loader streams — bucket
    sizes (share within the epoch) prove the per-epoch load is
    balanced BEFORE the run.

    Scale shape: per-row hash arithmetic, one explode by n_epochs
    (bounded fan-out), one groupBy to (epoch, bucket) grain — output
    is n_epochs × n_buckets rows regardless of corpus size."""
    t = textfn.tokens("text")
    epochs = F.explode(F.array(*[F.lit(e) for e in range(n_epochs)]))
    per = (_spread(documents)
           .select("doc_id", F.size(t).cast("bigint").alias("n_tok"))
           .withColumn("epoch", epochs))
    bucket = F.pmod(
        textfn.md5int(F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("epoch").cast("string"))),
        F.lit(n_buckets)).cast("int")
    agg = (per.withColumn("bucket", bucket)
           .groupBy("epoch", "bucket")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_tok").cast("bigint").alias("n_tokens")))
    ew = Window.partitionBy("epoch")
    return (
        agg.select(F.col("epoch").cast("int").alias("epoch"),
                   "bucket", "n_docs", "n_tokens",
                   F.floor(F.col("n_docs") * 1e6
                           / F.sum("n_docs").over(ew))
                    .cast("bigint").alias("share_e6"))
        .orderBy("epoch", "bucket")
    )


def source_bigram_nll_profile(documents: DataFrame) -> DataFrame:
    """Per-source distribution of the bigram-LM score: exact
    interpolated p10/p50/p90 and mean of each document's average
    bigram negative log-probability — the which-sources-produce-
    high-perplexity-text dashboard a perplexity-filter threshold is
    chosen from (text_bigram_logprob emits the per-doc scores; a
    500M-doc relation is not a decision table, this |sources|-row
    profile is).

    Determinism: per-doc scores are e4 INTEGERS (the
    text_bigram_logprob micro-sum, DIV'd down before anything
    averages); percentiles use the Spark percentile ↔ DuckDB
    quantile_cont identical-interpolation pairing pinned since
    event_value_percentiles, floor-e6; the mean is an integer-sum
    ratio, floor-e4.

    Scale shape: the bigram/unigram count relations are
    vocabulary-grain; per-doc collapse then ONE source-grain agg —
    output O(|sources|)."""
    t = textfn.tokens("text")
    d = (_spread(documents)
         .select("doc_id", "source", t.alias("t"))
         .filter(F.size("t") >= 2))
    big = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, "
            "element_at(t, i + 1) AS w2))")).alias("g"),
    ).select("doc_id", "g.w1", "g.w2")
    uni = (_spread(documents)
           .select(F.explode(t).alias("w1"))
           .groupBy("w1").agg(F.count(F.lit(1)).alias("c1")))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    nll = (
        big.join(bi, ["w1", "w2"]).join(uni, "w1")
        .select("doc_id",
                F.floor(-F.log(F.col("c2") / F.col("c1")) * 1e6)
                 .cast("bigint").alias("nll_micro"))
        .groupBy("doc_id")
        .agg(F.floor(F.sum("nll_micro") / (F.count(F.lit(1)) * 100.0))
              .cast("bigint").alias("nll_e4"))
    )
    per = d.select("doc_id", "source").join(nll, "doc_id")
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nll_e4").alias("nll_sum"),
        *[F.percentile("nll_e4", F.lit(p / 100.0)).alias(f"q{p}")
          for p in (10, 50, 90)])
    return (
        agg.select(
            "source", "n_docs",
            *[(F.floor(F.col(f"q{p}") * 1e6) / 1e6)
              .alias(f"nll_e4_p{p}") for p in (10, 50, 90)],
            (F.floor(F.col("nll_sum") / F.col("n_docs")) / 1e4)
             .alias("mean_nll"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# filter agreement + review sizing
# ---------------------------------------------------------------------------

def quality_rules_venn(documents: DataFrame) -> DataFrame:
    """Agreement matrix between the two rule-based admission filters:
    the 2×2 contingency of gopher_pass × c4_pass with counts and
    corpus shares — the redundancy audit run before stacking filters
    in a cascade (if the cells off the diagonal are empty, the second
    filter adds nothing; a big pass/fail cell is the population to
    hand-review). Composes the REGISTERED rule operators verbatim so
    the cells can never drift from the filters they describe.

    Scale shape: both rule sets are scan-stage per-row expressions;
    one doc_id equi-join, ONE aggregate with four conditional counts
    stacked to the grid — output is exactly 4 rows, total by
    construction."""
    g = quality_gopher_rules(documents).select("doc_id", "gopher_pass")
    c = quality_c4_rules(documents).select("doc_id", "c4_pass")
    j = g.join(c, "doc_id")
    gp, cp = F.col("gopher_pass"), F.col("c4_pass")
    cells = [("gg", gp & cp), ("gx", gp & ~cp),
             ("xg", ~gp & cp), ("xx", ~gp & ~cp)]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_total")]
    for nm, cond in cells:
        aggs.append(F.sum(cond.cast("bigint")).cast("bigint")
                    .alias(nm))
    wide = j.agg(*aggs)
    long = wide.selectExpr(
        "n_total",
        "stack(4, "
        "true,  true,  gg, "
        "true,  false, gx, "
        "false, true,  xg, "
        "false, false, xx) AS (gopher_pass, c4_pass, n_docs)")
    return (
        long.select(
            "gopher_pass", "c4_pass", "n_docs",
            F.floor(F.col("n_docs") * 1e6 / F.col("n_total"))
             .cast("bigint").alias("share_e6"))
        .orderBy(F.desc("gopher_pass"), F.desc("c4_pass"))
    )


#: (half-width, z²/w² coefficient) for a 95% CI — computed in PYTHON
#: so the identical double literal reaches both engines
CI_HALF_WIDTHS: tuple[float, ...] = (0.01, 0.02, 0.05)
_Z95 = 1.96


def ci_coefficient(w: float) -> float:
    return (_Z95 / w) ** 2


def sample_size_calculator(documents: DataFrame) -> DataFrame:
    """Human-review sample sizing per source: how many docs must be
    drawn to estimate that source's gopher pass rate within ±w at
    95% confidence — n = ceil(z²·p̂(1−p̂)/w²) from the OBSERVED pass
    rate, plus the finite-population-corrected size (small sources
    need far fewer than the asymptotic formula says). The table a QA
    budget is negotiated from; pairs with neyman_allocation_plan
    (which splits a FIXED budget; this prices the budget itself).

    Determinism: p̂(1−p̂) is computed from exact integer counts in
    one double expression; z²/w² are Python-inlined repr literals
    (the bloom_constants discipline); ceil on both engines.

    Scale shape: one source-grain aggregate over the scan-stage rule
    expressions; output |sources| × |CI_HALF_WIDTHS| rows."""
    g = quality_gopher_rules(documents).select("doc_id", "gopher_pass")
    per = (documents.select("doc_id", "source").join(g, "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.col("gopher_pass").cast("bigint"))
                 .cast("bigint").alias("n_pass")))
    grid = []
    for w in CI_HALF_WIDTHS:
        grid.append(F.struct(
            F.lit(int(round(w * 1e6))).cast("bigint")
             .alias("half_width_e6"),
            F.lit(float(ci_coefficient(w))).alias("c")))
    p = F.col("n_pass").cast("double") / F.col("n_docs")
    n_req = F.ceil(F.col("g.c") * p * (1 - p)).cast("bigint")
    # a degenerate p ∈ {0,1} gives n_req = 0, where the FPC
    # denominator 1 + (n_req-1)/N can hit 0 (N = 1): define the
    # corrected size as 0 — no sampling needed to confirm a rate the
    # whole source already agrees on (found by the hypothesis
    # property test, not by any oracle SF)
    n_fpc = F.when(
        n_req > 0,
        F.ceil(n_req.cast("double")
               / (1 + (n_req - 1).cast("double") / F.col("n_docs"))))\
        .otherwise(F.lit(0)).cast("bigint")
    return (
        per.select("source", "n_docs", "n_pass",
                   F.explode(F.array(*grid)).alias("g"))
        .select("source", "n_docs", "n_pass",
                F.floor(F.col("n_pass") * 1e6 / F.col("n_docs"))
                 .cast("bigint").alias("pass_rate_e6"),
                F.col("g.half_width_e6").alias("half_width_e6"),
                n_req.alias("n_required"),
                n_fpc.alias("n_required_fpc"))
        .orderBy("source", "half_width_e6")
    )


# ---------------------------------------------------------------------------
# unicode hygiene
# ---------------------------------------------------------------------------

#: (kind, Spark/Java regex, DuckDB/RE2 regex) — same character
#: classes spelled in each engine's escape syntax
UNICODE_ANOMALY_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("control", r"[\x00-\x08\x0B\x0C\x0E-\x1F]",
     r"[\x00-\x08\x0b\x0c\x0e-\x1f]"),
    ("zero_width", "[​-‍﻿]",
     r"[\x{200B}-\x{200D}\x{FEFF}]"),
    ("replacement", "�", r"\x{FFFD}"),
    ("non_ascii", r"[^\x00-\x7F]", r"[^\x00-\x7F]"),
)


def unicode_anomaly_scan(documents: DataFrame) -> DataFrame:
    """Per-source unicode hygiene audit: occurrences and affected-doc
    counts for control characters (mojibake / binary bleed-through),
    zero-width characters (the invisible-text prompt-injection and
    watermark channel), U+FFFD replacement characters (upstream
    decode failures), and total non-ASCII share — the four classes a
    crawl-ingest gate checks before any tokenizer sees the text.
    Rule-based filters count WORDS; this audits the BYTES under
    them.

    Scale shape: four regexp counts per row at the scan (codegen, no
    explode), ONE source-grain aggregate; output O(|sources|).
    Identical character classes are spelled in each engine's escape
    syntax side by side in UNICODE_ANOMALY_PATTERNS so they cannot
    drift silently."""
    counts = {k: F.regexp_count("text", F.lit(spark_pat)).cast("bigint")
              for k, spark_pat, _ in UNICODE_ANOMALY_PATTERNS}
    per = documents.select(
        "source", F.length("text").cast("bigint").alias("n_chars"),
        *[c.alias(k) for k, c in counts.items()])
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars")]
    for k, _, _ in UNICODE_ANOMALY_PATTERNS:
        aggs += [
            F.sum(k).cast("bigint").alias(f"n_{k}"),
            F.sum((F.col(k) > 0).cast("bigint")).cast("bigint")
             .alias(f"docs_with_{k}")]
    agg = per.groupBy("source").agg(*aggs)
    return (
        agg.select(
            "source", "n_docs", "n_chars",
            *[c for k, _, _ in UNICODE_ANOMALY_PATTERNS
              for c in (F.col(f"n_{k}"), F.col(f"docs_with_{k}"))],
            F.when(F.col("n_chars") > 0,
                   F.floor(F.col("n_non_ascii") * 1e6
                           / F.col("n_chars")))
             .cast("bigint").alias("non_ascii_per_mchar"))
        .orderBy("source")
    )
