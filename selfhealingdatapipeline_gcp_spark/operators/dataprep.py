"""Training-data preparation operators (build brief: the operations a
large-scale LLM training-data pipeline needs beyond the reference's
own surface).

All per-row work is built-in string/array expressions or integer hash
arithmetic (whole-stage codegen; no Python in the row path), and every
decision is a DETERMINISTIC function of the row — no rand(): sampling,
splits, and mixing must give byte-identical output on re-runs and
retries at 100 TB, so they key off md5 of stable identifiers.

Scale notes per operator are in the docstrings; the common theme:
splits/samples/filters are scan-level (zero shuffle), contamination is
one equi-join on a 48-bit shingle hash, mixing is a tiny per-source
grain aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import money, textfn
from selfhealingdatapipeline_gcp_spark.operators.dedup import _shingle_rows
from selfhealingdatapipeline_gcp_spark.operators.textanalysis import STOPWORDS


def train_val_split(documents: DataFrame, val_pct: int = 10) -> DataFrame:
    """Deterministic hash split: bucket = md5int(doc_id) mod 100,
    split = 'val' iff bucket < val_pct. A pure scan-level projection —
    no shuffle, stable under retries and re-ingestion (the split of a
    document never depends on what else is in the corpus)."""
    bucket = textfn.md5int(F.col("doc_id").cast("string")) % 100
    return documents.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
         .alias("split"),
    )


def stratified_sample(documents: DataFrame, fraction: float = 0.2,
                      strata: str = "source") -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    md5int(strata|doc_id) mod 10000 < fraction·10000. Uniform within
    every stratum by hash uniformity, reproducible, scan-level (the
    filter pushes to the scan output; no shuffle, no rand())."""
    h = textfn.md5int(
        F.concat_ws("|", F.col(strata).cast("string"),
                    F.col("doc_id").cast("string"))) % 10000
    return (
        documents
        .filter(h < int(fraction * 10000))
        .select("doc_id", F.col(strata).alias("stratum"))
    )


def source_mixing_plan(documents: DataFrame, target_total: int,
                       strata: str = "source") -> DataFrame:
    """Source-mixing plan for a uniform target mix: given a target
    corpus size, how many docs each source should contribute and the
    sampling rate to get there (rate capped at 1; a deficit flag marks
    under-resourced sources — the upsampling decision is the caller's).
    One tiny per-source aggregate; the plan relation is dim-sized."""
    n_strata_w = Window.rowsBetween(Window.unboundedPreceding,
                                    Window.unboundedFollowing)
    per = (
        documents.groupBy(F.col(strata).alias("stratum"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("n_strata", F.count(F.lit(1)).over(n_strata_w))
    )
    target = F.floor(F.lit(target_total) / F.col("n_strata")).cast("bigint")
    rate = F.least(F.lit(1.0), target / F.col("n_docs"))
    return per.select(
        "stratum", "n_docs",
        target.alias("target_docs"),
        money.trunc(rate).alias("sample_rate"),
        (F.col("n_docs") < target).alias("is_deficit"),
    )


def source_topic_mix(documents: DataFrame,
                     embeddings: DataFrame) -> DataFrame:
    """Topic composition per source feed: join each document to its
    embedding-space label (doc_id = vec_id, the corpus's 1:1 vector
    sidecar) and report, per (source, label): doc count, the label's
    share WITHIN the source, its share in the whole corpus, and the
    lift between the two — the table a data-mixing decision actually
    reads ("is source X over-feeding topic 7 relative to the
    corpus?"). Complements source_mixing_plan (volume per source)
    and source_language_mix (language per source) with the topic
    axis.

    Scale: one corpus join on doc_id (slim rows: id + label), one
    (source, label) aggregate; the share/lift arithmetic runs on the
    dim-sized aggregate relation with its per-source and per-label
    totals window-derived — no second pass over the corpus.
    Floor-truncated at 4 decimals (money.trunc) for oracle parity."""
    j = documents.select("doc_id", "source").join(
        embeddings.select(F.col("vec_id").alias("doc_id"), "label"),
        "doc_id")
    agg = j.groupBy("source", "label").agg(
        F.count(F.lit(1)).alias("n_docs"))
    w_src = Window.partitionBy("source")
    w_lbl = Window.partitionBy("label")
    w_all = Window.partitionBy()
    src_total = F.sum("n_docs").over(w_src)
    lbl_total = F.sum("n_docs").over(w_lbl)
    corpus_total = F.sum("n_docs").over(w_all)
    source_share = F.col("n_docs") / src_total
    corpus_share = lbl_total / corpus_total
    return agg.select(
        "source", "label", "n_docs",
        money.trunc(source_share).alias("source_share"),
        money.trunc(corpus_share).alias("corpus_share"),
        money.trunc(source_share / corpus_share).alias("lift"),
    ).orderBy("source", "label")


def contamination_check(train: DataFrame, eval_: DataFrame,
                        threshold: float = 0.5) -> DataFrame:
    """Train/eval contamination: for each eval document, the fraction
    of its distinct 3-gram shingles that appear anywhere in the train
    corpus (the standard n-gram-overlap decontamination check).

    The train side collapses to DISTINCT shingle hashes (48-bit
    md5int) — the join is an equi-join on an 8-byte key, fan-out
    bounded by eval shingle counts, never corpus×corpus. At 100 TB the
    train-distinct relation is the big side and shuffles once; a bloom
    filter pushdown (AQE does this for selective joins) prunes most
    eval probes."""
    train_sh = (
        _shingle_rows(train)
        .select(textfn.md5int(F.col("s")).alias("h"))
        .dropDuplicates(["h"])
        .withColumn("hit", F.lit(1))
    )
    eval_sh = (
        _shingle_rows(eval_)
        .select("doc_id", textfn.md5int(F.col("s")).alias("h"))
        .dropDuplicates(["doc_id", "h"])
    )
    rate = F.col("n_contaminated") / F.col("n_shingles")
    return (
        eval_sh.join(train_sh, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
        )
        .select(
            "doc_id", "n_shingles", "n_contaminated",
            (F.floor(rate * 1e6) / 1e6).alias("contamination_rate"),
            (rate >= threshold).alias("is_contaminated"),
        )
    )


def repetition_score(documents: DataFrame,
                     max_ratio: float = 0.2) -> DataFrame:
    """Per-document n-gram repetition (Gopher-style quality rule):
    ratio = 1 − distinct/total 3-gram shingles; repetitive boilerplate
    scores high. One doc_id-partitioned aggregate over the shingle
    explode — reuses the same exchange every other shingle op uses."""
    sh = _shingle_rows(documents).select(
        "doc_id", textfn.md5int(F.col("s")).alias("h"))
    agg = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.countDistinct("h").alias("n_distinct"),
    )
    ratio = 1.0 - F.col("n_distinct") / F.col("n_shingles")
    return agg.select(
        "doc_id", "n_shingles", "n_distinct",
        (F.floor(ratio * 1e6) / 1e6).alias("repetition_ratio"),
        (ratio > max_ratio).alias("is_repetitive"),
    )


def quality_filter_pipeline(documents: DataFrame,
                            min_tokens: int = 20,
                            max_tokens: int = 100000,
                            min_mean_len: float = 2.0,
                            max_mean_len: float = 10.0,
                            min_stop_ratio: float = 0.01,
                            max_repetition: float = 0.2) -> DataFrame:
    """C4/Gopher-style keep/drop decision with the FIRST failing rule
    as the drop reason: token-count bounds, mean-word-length band,
    stopword-ratio floor, repetition ceiling. Token metrics and the
    repetition metric are two doc_id-grain aggregates joined on
    doc_id — both sides arrive hash-partitioned on doc_id, so the
    join adds no exchange."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    ex = documents.select(
        "doc_id", F.explode(textfn.tokens("text")).alias("w"))
    toks = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("w")).alias("__sum_len"),
        F.sum(F.array_contains(stop_arr, F.col("w")).cast("bigint"))
         .alias("__n_stop"),
    )
    rep = repetition_score(documents).select("doc_id", "repetition_ratio")
    n = F.col("n_tokens")
    mean_len = F.col("__sum_len") / n
    stop_ratio = F.col("__n_stop") / n
    # left join: documents too short to shingle (< 3 tokens) have no
    # repetition row — they fail the token-count rule anyway
    j = toks.join(rep, "doc_id", "left")
    repetition = F.coalesce(F.col("repetition_ratio"), F.lit(0.0))
    reason = (
        F.when(n < min_tokens, F.lit("too_short"))
        .when(n > max_tokens, F.lit("too_long"))
        .when((mean_len < min_mean_len) | (mean_len > max_mean_len),
              F.lit("word_length"))
        .when(stop_ratio < min_stop_ratio, F.lit("low_stopwords"))
        .when(repetition > max_repetition, F.lit("repetitive"))
    )
    return j.select(
        "doc_id",
        n.alias("n_tokens"),
        money.trunc(mean_len).alias("mean_token_len"),
        money.trunc(stop_ratio).alias("stopword_ratio"),
        money.trunc(repetition).alias("repetition_ratio"),
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


# conservative patterns that parse identically under Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "card": r"[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}",
}


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII scrubbing: replace email/phone/card-shaped spans with
    typed placeholders, count replacements per kind. Pure
    regexp_replace/split-count chain — codegen, no UDF; order is
    card → phone → email so the longest patterns win overlaps.

    Each count is taken on the text AFTER the previous kinds were
    redacted, so counts equal the number of placeholders actually
    inserted (a card number is never also counted as a phone)."""
    red = F.col("text")
    counts: dict[str, F.Column] = {}
    for kind in ("card", "phone", "email"):
        pat = PII_PATTERNS[kind]
        counts[kind] = F.size(F.split(red, pat)) - 1
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return documents.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["card"].alias("n_card"),
        red.alias("redacted_text"),
        F.md5(red).alias("redacted_md5"),
    )


def pii_density_report(documents: DataFrame) -> DataFrame:
    """Per-source PII exposure profile: document counts and hit
    counts per PII kind (card/phone/email — the pii_redact patterns,
    counted with the SAME sequential-redaction rule so a card number
    is never double-counted as a phone), plus hits per million
    characters. pii_redact rewrites documents one at a time; this is
    the source-grain audit a curation run reads FIRST to decide
    which sources need the redaction pass at all — and the
    before/after evidence a takedown review asks for.

    Scale shape: pure per-row regexp counting at the scan (codegen,
    no UDF, no explode), ONE source-grain aggregate; output is
    O(|sources|). Density is floor-e6 over exact integer sums."""
    red = F.col("text")
    counts: dict[str, F.Column] = {}
    for kind in ("card", "phone", "email"):
        pat = PII_PATTERNS[kind]
        counts[kind] = (F.size(F.split(red, pat)) - 1).cast("bigint")
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    per = documents.select(
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        counts["email"].alias("e"), counts["phone"].alias("p"),
        counts["card"].alias("c"))
    hits = F.col("e") + F.col("p") + F.col("c")
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((hits > 0).cast("bigint")).cast("bigint")
         .alias("n_docs_with_pii"),
        F.sum("e").cast("bigint").alias("n_email"),
        F.sum("p").cast("bigint").alias("n_phone"),
        F.sum("c").cast("bigint").alias("n_card"),
        F.sum(hits).cast("bigint").alias("n_hits"),
        F.sum("n_chars").cast("bigint").alias("n_chars"))
    return (
        agg.select(
            "source", "n_docs", "n_docs_with_pii",
            "n_email", "n_phone", "n_card",
            F.when(F.col("n_chars") > 0,
                   F.floor(F.col("n_hits") * 1e6 / F.col("n_chars")))
             .cast("bigint").alias("hits_per_mchar"))
        .orderBy("source")
    )


def vector_quantize(embeddings: DataFrame) -> DataFrame:
    """Per-vector int8 scalar quantization in long format:
    scale = max |x| over the vector, q8 = floor(x/scale·127) — floor,
    not round, so both engines truncate identically. Emits
    (vec_id, dim_idx, q8, scale_e6); the reconstruction is
    q8/127·scale. posexplode + a per-vector max — one pass, the
    standard storage-shrink step before ANN indexing at scale."""
    v = F.transform(F.col("embedding"),
                    lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    ex = embeddings.select(
        "vec_id",
        scale.alias("scale"),
        F.posexplode(v).alias("dim_idx", "x"),
    )
    q8 = F.when(F.col("scale") > 0,
                F.floor(F.col("x") / F.col("scale") * 127).cast("bigint")
                ).otherwise(F.lit(0))
    return ex.select(
        "vec_id", "dim_idx",
        q8.alias("q8"),
        F.floor(F.col("scale") * 1e6).cast("bigint").alias("scale_e6"),
    )


def cap_per_source(documents: DataFrame, cap: int = 10,
                   strata: str = "source", n_salt: int = 32) -> DataFrame:
    """Cap documents per source (domain over-representation control):
    keep at most ``cap`` docs per stratum, selected by deterministic
    hash order — the same documents survive any re-run, any input
    partitioning, any corpus growth that doesn't touch their hashes.

    Two-phase ranking (VERDICT r2 #2): a single per-stratum window
    would send EVERY doc of a hot domain to one task — a billion-doc
    domain becomes one straggler. Phase 1 ranks within (stratum,
    salt = hash % n_salt) and keeps ≤ cap per slice, so the hot
    domain's scan+rank spreads over ``n_salt`` parallel tasks; phase 2
    runs the exact per-stratum rank over ≤ n_salt·cap survivors —
    bounded rows per stratum forever. Exact, not approximate: each of
    a stratum's true top-``cap`` rows (by hash, doc_id order) is also
    top-``cap`` within its own salt slice, so phase 1 can never drop a
    survivor and the result is identical to the one-window form."""
    h = textfn.md5int(
        F.concat_ws("|", F.col(strata).cast("string"),
                    F.col("doc_id").cast("string")))
    pre = documents.select(
        "doc_id", F.col(strata).alias("stratum"), h.alias("__h"),
        F.pmod(h, F.lit(n_salt)).alias("__salt"))
    w1 = Window.partitionBy("stratum", "__salt").orderBy(
        F.col("__h").asc(), F.col("doc_id"))
    survivors = (
        pre.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap)
    )
    w2 = Window.partitionBy("stratum").orderBy(
        F.col("__h").asc(), F.col("doc_id"))
    return (
        survivors
        .select("doc_id", "stratum",
                F.row_number().over(w2).alias("rank_in_stratum"))
        .filter(F.col("rank_in_stratum") <= cap)
    )


def seq_pack_plan(documents: DataFrame, budget_tokens: int = 2048,
                  n_streams: int = 8) -> DataFrame:
    """Sequence-packing plan: assign documents to fixed-token-budget
    packs for training-batch assembly. Token cost is the scan-level
    ~4-chars/token estimate (floor((n_chars+3)/4), min 1 — the real
    tokenizer runs later; the plan just needs a stable cost model).

    Packing semantics: documents are ordered deterministically
    (md5 hash, doc_id) and chunked contiguously — a document joins
    pack floor(cum_tokens_before / budget) of its stream. Streaming-
    chunk packing, not bin-packing: a straddling document stays with
    its running pack, so a pack can overshoot the budget by at most
    one document (training loaders truncate/continue; what matters is
    determinism and near-budget fill).

    Scale shape: packing is inherently sequential in its order, so a
    per-source window would serialize a hot source into one task.
    Instead each source hash-splits into ``n_streams`` independent
    packing streams (stream = md5 % n_streams) — each stream packs
    independently in parallel, and a pack never mixes sources. One
    shuffle on (source, stream); window cumsum inside."""
    est = F.greatest(F.floor((F.col("n_chars") + 3) / 4).cast("bigint"),
                     F.lit(1))
    h = textfn.md5int(F.concat_ws("|", F.lit("pack"),
                                  F.col("doc_id").cast("string")))
    pre = documents.select(
        "doc_id", "source", est.alias("est_tokens"), h.alias("__h"),
        F.pmod(h, F.lit(n_streams)).alias("stream"))
    w = (Window.partitionBy("source", "stream")
         .orderBy("__h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("est_tokens").over(w)
    return (
        pre.select(
            "doc_id", "source", "stream", "est_tokens",
            F.floor((cum - F.col("est_tokens")) / budget_tokens)
             .cast("bigint").alias("pack_id"),
            (cum - F.col("est_tokens")).alias("tokens_before"))
        .orderBy("source", "stream", "tokens_before", "doc_id")
    )


def token_histogram(documents: DataFrame) -> DataFrame:
    """Corpus token-length histogram in power-of-two buckets — the
    distribution every context-length / packing decision reads first.
    Buckets by bit length (length(bin(est)) - 1 = floor(log2(est)),
    integer-exact in any engine — floor(log2(double)) can flip at
    power-of-two boundaries across libm implementations).

    Scale: scan-level estimate, one tiny groupBy (≤ ~40 buckets),
    share in floor-e6 integer parts."""
    est = F.greatest(F.floor((F.col("n_chars") + 3) / 4).cast("bigint"),
                     F.lit(1))
    bucket = (F.length(F.bin(est)) - 1).cast("int")
    agg = (
        documents.select(est.alias("est"), bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("est").alias("total_tokens"))
    )
    total = agg.agg(F.sum("n_docs").alias("n_total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "log2_bucket",
            F.expr("shiftleft(1, log2_bucket)").cast("bigint")
             .alias("bucket_lo"),
            "n_docs", "total_tokens",
            F.floor(F.col("n_docs") * 1e6 / F.col("n_total"))
             .cast("bigint").alias("share_e6"))
        .orderBy("log2_bucket")
    )


def temperature_mixing_weights(documents: DataFrame,
                               strata: str = "source") -> DataFrame:
    """Temperature-based source mixing (the multilingual/multidomain
    LLM sampling scheme): sampling weight ∝ share^(1/T), flattening
    the natural distribution toward uniform. Registered with T = 2 —
    share^(1/2) = sqrt, which IEEE-754 rounds identically in every
    engine, so the plan is bit-reproducible (general T needs pow(),
    whose last-ULP varies across libm; run it knowing the weights may
    differ in the 15th digit).

    Output per stratum: natural share (floor e6), tempered sampling
    probability (floor e6), and the up/down-sampling factor vs
    natural (floor e4). Scale: one tiny per-stratum aggregate; the
    normalizing sum broadcasts as a 1-row scalar.

    Determinism: the normalizer Σ sqrt(n_j) is summed as floor-e9
    INTEGERS (sqrt is correctly-rounded IEEE, so floor(sqrt(n)·1e9)
    is engine-identical; integer sums are order-independent across
    partial-agg schedules — a raw double sum here would drift with
    partition order, the exact trap ADVICE r4 flagged for nll).
    Ratios then divide through doubles with explicit casts mirrored
    in the oracle."""
    per = (documents.groupBy(F.col(strata).alias("stratum"))
           .agg(F.count(F.lit(1)).alias("n_docs")))
    # sqrt(share_i)/Σ sqrt(share_j) = sqrt(n_i)/Σ sqrt(n_j): the
    # 1/sqrt(n_total) factor cancels — stay in sqrt(counts).
    u = F.floor(F.sqrt(F.col("n_docs")) * 1e9).cast("bigint")
    per = per.withColumn("sqrt_e9", u)
    tot = per.agg(F.sum("n_docs").alias("n_total"),
                  F.sum("sqrt_e9").alias("sum_sqrt_e9"))
    ud = F.col("sqrt_e9").cast("double")
    sd = F.col("sum_sqrt_e9").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "stratum", "n_docs",
            F.floor(F.col("n_docs") * 1e6 / F.col("n_total"))
             .cast("bigint").alias("share_e6"),
            F.floor(ud * 1e6 / sd).cast("bigint").alias("tempered_e6"),
            F.floor(ud * F.col("n_total").cast("double") * 1e4
                    / (sd * F.col("n_docs").cast("double")))
             .cast("bigint").alias("boost_e4"))
        .orderBy("stratum")
    )


def doc_chunk_plan(documents: DataFrame, chunk_tokens: int = 64,
                   overlap: int = 16) -> DataFrame:
    """Fixed-size token-window chunking plan with overlap — the
    RAG/context-window splitter every retrieval or packing pipeline
    runs before embedding: chunk i covers tokens
    [i·stride, i·stride + chunk_tokens) with stride =
    chunk_tokens − overlap; the last chunk clips to the doc length,
    and every doc (even an empty one) emits at least one chunk row so
    downstream joins never silently drop short docs.

    Scale shape: pure scan-level integer arithmetic + one
    sequence-explode — ZERO shuffle; the plan is a projection whose
    output is ~n_tokens/stride rows per doc. All chunk bounds are
    integer expressions (no floats anywhere), so the plan is
    engine-exact and retry-stable by construction."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    nt = F.size(textfn.tokens("text")).cast("bigint")
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor((nt - overlap + (stride - 1)) / F.lit(stride).cast("double"))
         .cast("bigint"))
    start = F.col("chunk_idx") * stride
    end = F.least(start + chunk_tokens, F.col("n_tokens"))
    return (
        documents
        .select("doc_id", nt.alias("n_tokens"), n_chunks.alias("__nc"))
        .select("doc_id", "n_tokens",
                F.explode(F.sequence(F.lit(0).cast("bigint"),
                                     F.col("__nc") - 1)).alias("chunk_idx"))
        .select("doc_id", "n_tokens", "chunk_idx",
                start.alias("start_token"), end.alias("end_token"),
                F.greatest(end - start, F.lit(0).cast("bigint"))
                 .alias("chunk_len"))
        .orderBy("doc_id", "chunk_idx")
    )


def packing_efficiency_report(documents: DataFrame,
                              budget_tokens: int = 2048,
                              n_streams: int = 8) -> DataFrame:
    """Per-source packing efficiency: how full the seq_pack_plan
    packs actually run — the number that decides whether the budget /
    stream count need retuning before a training run (fill well under
    1e6 means fragmented batches; well over means chronic overshoot
    from documents larger than the budget).

    Consumes the seq_pack_plan relation and collapses it to one row
    per source: the only work beyond the plan itself is a
    |sources|-grain aggregate with map-side partials. fill_e6 =
    total_tokens·1e6 / (n_packs·budget) — integer inputs, one
    division, floor-e6."""
    plan = seq_pack_plan(documents, budget_tokens, n_streams)
    return (
        plan.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("stream", "pack_id").alias("n_packs"),
             F.sum("est_tokens").alias("total_tokens"))
        .select(
            "source", "n_docs", "n_packs", "total_tokens",
            F.floor(F.col("total_tokens") * 1e6
                    / (F.col("n_packs") * budget_tokens))
             .cast("bigint").alias("fill_e6"))
        .orderBy("source")
    )


def source_epoch_plan(documents: DataFrame,
                      temperature_sqrt: bool = True) -> DataFrame:
    """Per-source token-budget allocation: how many tokens to DRAW
    from each source (and hence how many epochs over it) to realize
    the temperature-mixed distribution inside a fixed total budget —
    the table temperature_mixing_weights implies but doesn't emit.
    Budget = the corpus's own token count (one corpus-sized pass of
    training data), so epochs_e4 > 1e4 marks sources the mix
    up-samples (repeats) and < 1e4 sources it down-samples; the
    data-constrained scaling question ("how often does each source
    repeat?") reads straight off the epochs column.

    Shares are computed over TOKEN mass, not doc counts (documents
    vary 100x in length; a doc-count mix would starve long-doc
    sources). T = 2 via sqrt keeps the weights bit-reproducible
    across engines (general pow() drifts in the last ULP — the
    temperature_mixing_weights rule).

    Scale: token counting is F.size over the split array — scan-level
    per-row arithmetic, no explode; everything after is a
    |sources|-row aggregate with a broadcast 1-row normalizer.
    Determinism: the normalizer Σ floor(sqrt(tokens)·1e9) accumulates
    as integers (order-independent across partial-agg schedules);
    target_tokens then divides through doubles with the same two
    IEEE ops in both engines."""
    per = (documents
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size(textfn.tokens("text")).cast("bigint"))
                 .alias("n_tokens")))
    u = F.floor(F.sqrt(F.col("n_tokens")) * 1e9).cast("bigint")
    per = per.withColumn("__sqrt_e9", u)
    tot = per.agg(F.sum("n_tokens").alias("__tok_total"),
                  F.sum("__sqrt_e9").alias("__sum_sqrt_e9"))
    ud = F.col("__sqrt_e9").cast("double")
    sd = F.col("__sum_sqrt_e9").cast("double")
    target = F.floor(F.col("__tok_total").cast("double") * ud / sd) \
        .cast("bigint")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_tokens",
            F.floor(F.col("n_tokens") * 1e6 / F.col("__tok_total"))
             .cast("bigint").alias("natural_share_e6"),
            F.floor(ud * 1e6 / sd).cast("bigint").alias("tempered_share_e6"),
            target.alias("target_tokens"),
            F.floor(target * 1e4 / F.col("n_tokens")).cast("bigint")
             .alias("epochs_e4"),
        )
        .orderBy("source")
    )


def source_quality_calibration(documents: DataFrame) -> DataFrame:
    """Per-source quality-score DISTRIBUTION (exact p10/p25/p50/p75/
    p90 + below-cut share) — the threshold-picking table for
    quality_filter_pipeline. source_quality_report answers "how good
    is each source on average"; this answers "where would a cut at
    0.5 actually bite, per source" — a uniform global threshold can
    silently delete most of a terse-but-valuable source while
    keeping boilerplate from a verbose one, and the percentile table
    is how you see that before filtering.

    Scale: deliberately NOT text_quality_score + a corpus⋈corpus
    join-back (that shuffles the whole doc table a second time just
    to attach `source`): the score formula re-runs here with
    `source` CARRIED through the token explode, so the only
    corpus-sized shuffle is the doc-grain aggregate the explode
    needs anyway, and everything after is |sources| rows.
    Zero-token docs score exactly 0.0 but produce no explode rows,
    so they re-enter via a scan-level filter + union — a source full
    of empty docs must show its true p10 = 0, not vanish.
    Percentiles run per-source over floor(q·1e4) INTEGERS (scores
    are exact 1e-4 multiples, so the int form is lossless and the
    linear-interpolation arithmetic both engines apply to it is the
    same two IEEE ops — the doc_length_profile_by_source rule)."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    ex = documents.select(
        "doc_id", "source", F.explode(textfn.tokens("text")).alias("w"))
    agg = ex.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.length("w")).alias("__sum_len"),
        F.sum(F.array_contains(stop_arr, F.col("w")).cast("bigint"))
         .alias("__n_stop"))
    n = F.col("__n")
    mean_len = F.col("__sum_len") / F.greatest(n, F.lit(1))
    stop_ratio = F.col("__n_stop") / F.greatest(n, F.lit(1))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    wl_score = F.when((mean_len >= 2.0) & (mean_len <= 10.0),
                      F.lit(1.0)).otherwise(F.lit(0.0))
    score = 0.5 * len_score + 0.3 * stop_ratio + 0.2 * wl_score
    scored = agg.select(
        "source", F.floor(score * 1e4).cast("bigint").alias("q_e4"))
    zeros = (documents
             .filter(F.size(textfn.tokens("text")) == 0)
             .select("source", F.lit(0).cast("bigint").alias("q_e4")))
    base = scored.unionByName(zeros)

    def _p(q: float, name: str):
        return (F.floor(F.percentile("q_e4", F.lit(q)) * 1e6) / 1e6) \
            .alias(name)

    return (
        base.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             _p(0.1, "p10_q_e4"), _p(0.25, "p25_q_e4"),
             _p(0.5, "p50_q_e4"), _p(0.75, "p75_q_e4"),
             _p(0.9, "p90_q_e4"),
             F.sum((F.col("q_e4") < 5000).cast("bigint")).alias("__n_below"))
        .select("source", "n_docs",
                "p10_q_e4", "p25_q_e4", "p50_q_e4", "p75_q_e4", "p90_q_e4",
                F.floor(F.col("__n_below") * 1e6 / F.col("n_docs"))
                 .cast("bigint").alias("below_half_share_e6"))
        .orderBy("source")
    )


def decontamination_manifest(train: DataFrame,
                             eval_: DataFrame) -> DataFrame:
    """Per-TRAIN-document manifest of the token spans that match eval
    3-gram shingles — the ACTIONABLE side of decontamination.
    contamination_check rates each eval doc (detection direction);
    a decontamination pass edits the TRAIN side, and what it needs is
    exactly this: for every train doc, which token ranges to scrub
    (merged spans, not raw shingle hits).

    Span semantics: a matched shingle at token position p covers
    tokens [p, p+2]; overlapping and touching covers merge
    (gaps-and-islands: a new span starts when the position jump
    exceeds 3 — classic lag + running-sum-of-breaks, both windows on
    the doc_id partition). span_end is inclusive.

    Scale: positional train shingles hash to 48-bit keys and
    semi-join the DISTINCT eval shingle set on that 8-byte key —
    matched rows only survive to the windows, so the island pass runs
    over HITS, not the corpus; the eval side is the small relation
    (the benchmark suite) and broadcasts in practice. Output is
    bounded by matched spans."""
    toks = train.select(
        "doc_id", F.posexplode(textfn.tokens("text")).alias("pos", "w"))
    wd = Window.partitionBy("doc_id").orderBy("pos")
    sh = (toks
          .withColumn("__w2", F.lead("w", 1).over(wd))
          .withColumn("__w3", F.lead("w", 2).over(wd))
          .filter(F.col("__w3").isNotNull())
          .select("doc_id", F.col("pos").cast("bigint").alias("pos"),
                  textfn.md5int(
                      F.concat_ws(" ", "w", "__w2", "__w3")).alias("h")))
    dirty = (_shingle_rows(eval_)
             .select(textfn.md5int(F.col("s")).alias("h"))
             .dropDuplicates(["h"]))
    m = sh.join(dirty, "h", "semi").select("doc_id", "pos")
    wp = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos", 1).over(wp) > 3,
                 F.lit(1)).otherwise(F.lit(0))
    spans = (
        m.withColumn("__brk", brk)
        .withColumn("span_id",
                    F.sum("__brk").over(
                        wp.rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow))
                     .cast("bigint"))
        .groupBy("doc_id", "span_id")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + 2).alias("span_end"),
             F.count(F.lit(1)).alias("n_matched_shingles"))
    )
    return (
        spans.select(
            "doc_id", "span_id", "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
             .alias("span_tokens"),
            "n_matched_shingles")
        .orderBy("doc_id", "span_id")
    )


def drop_reason_matrix(documents: DataFrame) -> DataFrame:
    """Per-(source, reason) drop attribution for the quality filter —
    the one-page answer to "WHY is source X losing documents?":
    quality_filter_pipeline decides per doc; a mixing decision needs
    the aggregate (a source bleeding 40% to 'repetitive' is template
    spam; one bleeding to 'too_short' may just need a different
    chunker). Kept docs appear as reason 'kept' so shares sum to 1e6
    per source.

    Zero-token docs never enter the filter pipeline (no explode
    rows); they re-enter here via the LEFT join as 'too_short' —
    n_tokens = 0 fails the same rule, and a source of empty docs must
    show in its denominator.

    Scale: the filter relation is slim (doc_id + verdict) and joins
    the (doc_id, source) projection once on doc_id; everything after
    is an O(|sources| × |reasons|) aggregate with window-derived
    per-source totals."""
    verdicts = quality_filter_pipeline(documents).select(
        "doc_id", "keep", "drop_reason")
    reason = (F.when(F.col("keep").isNull(), F.lit("too_short"))
              .when(F.col("keep"), F.lit("kept"))
              .otherwise(F.col("drop_reason")))
    j = (documents.select("doc_id", "source")
         .join(verdicts, "doc_id", "left")
         .select("source", reason.alias("reason")))
    agg = j.groupBy("source", "reason").agg(
        F.count(F.lit(1)).alias("n_docs"))
    src_total = F.sum("n_docs").over(Window.partitionBy("source"))
    return (
        agg.select(
            "source", "reason", "n_docs",
            F.floor(F.col("n_docs") * 1e6 / src_total).cast("bigint")
             .alias("share_e6"))
        .orderBy("source", "reason")
    )


def split_balance_report(documents: DataFrame,
                         val_pct: int = 10) -> DataFrame:
    """Split BALANCE audit: per-source doc and token mass on each
    side of the train_val_split hash rule — a split can be leak-free
    (split_leakage_check / leakage_safe_split) and still broken if
    val under- or over-samples a source (the eval set then measures a
    different mixture than training sees). Each row carries the
    val-side shares in integer micro-units; a healthy hash split sits
    near val_pct·1e4 on every source, so a drifted row IS the alarm.

    Scan-level split + F.size token counts (no explode), ONE
    per-(source) aggregate — conditional sums fold the split sides in
    a single pass, so the whole audit is one shuffle of |sources|
    partial rows at any corpus size."""
    is_val = (textfn.md5int(F.col("doc_id").cast("string")) % 100
              < val_pct).cast("int")
    toks = F.size(textfn.tokens(F.col("text"))).cast("bigint")
    per = (
        documents
        .select("source", is_val.alias("is_val"), toks.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.sum(1 - F.col("is_val")).cast("bigint").alias("train_docs"),
            F.sum("is_val").cast("bigint").alias("val_docs"),
            F.sum((1 - F.col("is_val")) * F.col("n_tokens"))
             .cast("bigint").alias("train_tokens"),
            F.sum(F.col("is_val") * F.col("n_tokens"))
             .cast("bigint").alias("val_tokens"),
        )
    )
    n_docs = F.col("train_docs") + F.col("val_docs")
    n_tokens = F.col("train_tokens") + F.col("val_tokens")
    return (
        per.select(
            "source", "train_docs", "val_docs", "train_tokens",
            "val_tokens",
            F.floor(F.col("val_docs") * 1e6 / n_docs).cast("bigint")
             .alias("val_doc_share_e6"),
            F.when(n_tokens > 0,
                   F.floor(F.col("val_tokens") * 1e6 / n_tokens)
                    .cast("bigint"))
             .otherwise(F.lit(0).cast("bigint"))
             .alias("val_token_share_e6"),
        )
        .orderBy("source")
    )


def temporal_split_plan(events: DataFrame, train_frac_e6: int = 800_000,
                        embargo_us: int = 86_400_000_000) -> DataFrame:
    """Time-embargo train/val split plan — the TEMPORAL counterpart
    of train_val_split (hash split) and leakage_safe_split (cluster
    split): train = everything before the cutoff, an embargo gap is
    DISCARDED, val = everything after the gap. The embargo is what
    makes a temporal split honest for forecasting-style training:
    without it, an event straddling the boundary leaks near-future
    state into train. The report also counts ENTITY leakage — users
    active on both sides — because a temporal split never promises
    user disjointness, and a modeler needs that rate before treating
    val as out-of-sample users.

    Determinism: the cutoff is t0 + train_frac of the observed
    microsecond range (pure integer arithmetic on unix_micros) —
    content-derived, seedless, identical on retry.

    Scale shape: one pass for the 2-value time bounds (broadcast),
    one partial-agg pass for the split counts, one distinct
    (user, side) relation for the leakage counts — user_id grain,
    shuffled once."""
    bounds = events.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"))
    tagged = (
        events.crossJoin(F.broadcast(bounds))
        .withColumn(
            "cut_us",
            (F.col("t0") + F.floor((F.col("t1") - F.col("t0"))
                                   * train_frac_e6 / 1_000_000))
            .cast("bigint"))
        .withColumn(
            "side",
            F.when(F.unix_micros("ts") < F.col("cut_us"), F.lit("train"))
             .when(F.unix_micros("ts") < F.col("cut_us") + embargo_us,
                   F.lit("embargo"))
             .otherwise(F.lit("val")))
    )
    counts = tagged.groupBy().pivot(
        "side", ["train", "embargo", "val"]).count()
    su = tagged.filter(F.col("side") != "embargo") \
               .select("user_id", "side").distinct()
    users = (
        su.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sides"),
             F.max(F.when(F.col("side") == "val", 1).otherwise(0))
              .alias("in_val"))
        .agg(
            F.sum(F.when(F.col("n_sides") == 2, 0)
                   .when(F.col("in_val") == 0, 1).otherwise(0))
             .cast("bigint").alias("train_only_users"),
            F.sum(F.when(F.col("n_sides") == 2, 0)
                   .when(F.col("in_val") == 1, 1).otherwise(0))
             .cast("bigint").alias("val_only_users"),
            F.sum(F.when(F.col("n_sides") == 2, 1).otherwise(0))
             .cast("bigint").alias("leaky_users"))
    )
    return (
        counts.crossJoin(F.broadcast(users))
        .select(
            F.coalesce(F.col("train"), F.lit(0)).cast("bigint")
             .alias("n_train"),
            F.coalesce(F.col("embargo"), F.lit(0)).cast("bigint")
             .alias("n_embargoed"),
            F.coalesce(F.col("val"), F.lit(0)).cast("bigint")
             .alias("n_val"),
            "train_only_users", "val_only_users", "leaky_users",
            F.floor(F.col("leaky_users") * 1e6
                    / F.greatest(F.lit(1), F.col("leaky_users")
                                 + F.col("val_only_users")))
             .cast("bigint").alias("val_user_leak_e6"))
    )


def takedown_manifest(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, events: DataFrame,
                      erase_pct: int = 5) -> DataFrame:
    """Right-to-erasure propagation manifest: a deterministic
    person-key delete list (md5int(key) mod 100 < erase_pct — stands
    in for an uploaded takedown/DSAR list) is propagated through the
    FK graph, and each table reports how much of it the purge will
    touch: customer and orders by their custkey, events by user_id
    (same person-key domain), and lineitem by the CASCADE — rows
    whose order belongs to an erased customer. The manifest is what a
    compliance pipeline reviews before running the actual deletes,
    and re-running it post-purge must return zero affected rows.

    Scale shape: three tables test the erase predicate at SCAN level
    (a pure md5 projection — no delete-list materialization or
    join); the cascade hop is ONE semi-join of lineitem against the
    erased orders' keys (broadcast at small SF, sort-merge on the
    orderkey at 100 TB — the same join the purge itself needs, so
    the manifest costs what one purge pass costs). Output is four
    1-row aggregates unioned.

    n_keys is the distinct purge-key count at each table's own
    grain: custkeys for customer/orders, user_ids for events,
    orderkeys for lineitem — the size of the delete predicate the
    purge executor ships to that table."""
    def _erased(key):
        return textfn.md5int(key.cast("string")) % 100 < F.lit(erase_pct)

    def _row(df, table, key, affected):
        return (
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(affected.cast("bigint")).cast("bigint")
                 .alias("n_affected"),
                F.count_distinct(F.when(affected, key)).cast("bigint")
                 .alias("n_keys"))
            .select(F.lit(table).alias("tbl"), "n_rows", "n_affected",
                    F.floor(F.col("n_affected") * 1_000_000
                            / F.greatest(F.lit(1), F.col("n_rows")))
                     .cast("bigint").alias("share_e6"),
                    "n_keys")
        )

    erased_orders = (orders
                     .filter(_erased(F.col("o_custkey")))
                     .select("o_orderkey"))
    li_hit = lineitem.join(
        erased_orders, lineitem.l_orderkey == erased_orders.o_orderkey,
        "left_semi")
    li_row = (
        lineitem.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .crossJoin(li_hit.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_affected"),
            F.count_distinct(F.col("l_orderkey")).cast("bigint")
             .alias("n_keys")))
        .select(F.lit("lineitem").alias("tbl"), "n_rows", "n_affected",
                F.floor(F.col("n_affected") * 1_000_000
                        / F.greatest(F.lit(1), F.col("n_rows")))
                 .cast("bigint").alias("share_e6"),
                "n_keys")
    )
    return (
        _row(customer, "customer", F.col("c_custkey"),
             _erased(F.col("c_custkey")))
        .unionByName(_row(orders, "orders", F.col("o_custkey"),
                          _erased(F.col("o_custkey"))))
        .unionByName(li_row)
        .unionByName(_row(events, "events", F.col("user_id"),
                          _erased(F.col("user_id"))))
        .orderBy("tbl")
    )


def neyman_allocation_plan(events: DataFrame, sample_budget: int = 10_000
                           ) -> DataFrame:
    """Variance-optimal (Neyman) sampling allocation across strata —
    the labeling/eval budget design question of data curation: given
    ``sample_budget`` rows to inspect, how many should each stratum
    (event_type) get? Neyman allocation n_h ∝ N_h·S_h beats
    proportional allocation exactly when strata differ in spread, so
    the report carries both plans side by side; the caller compares
    and ships the sample sizes to stratified_sample.

    Determinism: one pass computes per-stratum N_h, Σx, Σx² in exact
    integer cents (Σx² through money.sum_sq — decimal-safe at extreme
    SF); S_h = floor(sqrt(·)) of the double variance — IEEE sqrt is
    correctly rounded and the variance expression mirrors the
    revenue_anomaly oracle pattern, so both engines floor the same
    value. Allocations are integer floor arithmetic; every stratum's
    Neyman share is capped at its own N_h (can't sample what isn't
    there). All-zero-variance degenerates to weight 0 — the report
    keeps the proportional column as the usable fallback.

    Scale shape: ONE corpus-grain aggregate to |strata| rows; the
    allocation math runs on that tiny relation against a broadcast
    1-row total. int64 bound: N_h·S_h_c ≲ 9e18 (e.g. 1e12 rows ×
    1e6-cent spread); widen via decimal mode past that."""
    c = money.cents(F.col("value"))
    per = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.sum(money.acc(c)).alias("s"),
             money.sum_sq(c).alias("s2"))
    )
    var_d = F.when(
        F.col("n_rows") <= 1, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0),
                   (F.col("s2").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double")
                    / F.col("n_rows"))
                   / (F.col("n_rows") - 1)))
    scored = per.select(
        "event_type", "n_rows",
        F.floor(F.sqrt(var_d)).cast("bigint").alias("sd_c"))
    scored = scored.withColumn(
        "weight", (F.col("n_rows") * F.col("sd_c")).cast("bigint"))
    tot = scored.agg(
        F.sum("n_rows").cast("bigint").alias("n_total"),
        F.sum("weight").cast("bigint").alias("w_total"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "event_type", "n_rows", "sd_c", "weight",
            # budget enters as a DOUBLE literal: an int64
            # budget·weight product would overflow under ANSI at the
            # very weights the operator exists for; the double path
            # is order-identical on both engines
            F.least(
                F.col("n_rows"),
                F.when(F.col("w_total") > 0,
                       F.floor(F.lit(float(sample_budget))
                               * F.col("weight")
                               / F.col("w_total")).cast("bigint"))
                 .otherwise(F.lit(0).cast("bigint")))
             .alias("alloc_neyman"),
            F.least(
                F.col("n_rows"),
                F.floor(F.lit(float(sample_budget)) * F.col("n_rows")
                        / F.col("n_total")).cast("bigint"))
             .alias("alloc_proportional"))
        .orderBy("event_type")
    )


def boilerplate_removal_report(documents: DataFrame,
                               seg_tokens: int = 8,
                               min_count: int = 3) -> DataFrame:
    """C4/CCNet-style boilerplate removal plan at SEGMENT grain:
    partition every document into disjoint ``seg_tokens``-token
    segments, count each segment's exact recurrence across the WHOLE
    corpus, and mark segments occurring ``min_count``+ times as
    boilerplate (navigation chrome, license headers, cookie banners —
    the text that recurs verbatim across otherwise-distinct pages).
    Output per source: docs, affected docs, total vs boilerplate
    tokens, floor-e6 boilerplate rate, flagged-segment instances —
    the measured cost of the cleanup BEFORE committing to it, the way
    C4 reports its line-level filter. chunk_dedup_exact lists the
    recurring windows themselves; this prices their removal.

    Scale shape: one explode to segment grain, one hash-groupBy whose
    shuffle carries 32-char digests + counts (never text), one
    digest equi-join back (SMJ on digests at scale — the boilerplate
    set is corpus-dependent, so no broadcast is assumed), then doc-
    and source-grain aggregates. Segment lengths partition each
    token list exactly, so Σseg_len reproduces token totals with no
    second tokenize pass. Empty docs emit no segments; the per-source
    doc count comes from a separate source-grain aggregate (tiny)
    joined back, so they still count in n_docs."""
    d = documents.select(
        "doc_id", "source", textfn.tokens("text").alias("t"))
    d = d.select("doc_id", "source", "t",
                 F.size("t").cast("bigint").alias("nt"))
    n_seg = F.floor((F.col("nt") + (seg_tokens - 1))
                    / F.lit(float(seg_tokens))).cast("bigint")
    seg = d.filter(F.col("nt") > 0).select(
        "doc_id", "source", "t", "nt",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             n_seg - 1)).alias("g"))
    s = F.col("g") * seg_tokens
    e = F.least(s + seg_tokens, F.col("nt"))
    seg = seg.select(
        "doc_id", "source",
        (e - s).cast("bigint").alias("seg_len"),
        F.md5(F.concat_ws(
            " ", F.slice("t", (s + 1).cast("int"),
                         (e - s).cast("int")))).alias("h"))
    counts = seg.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"))
    flagged = seg.join(counts, "h").withColumn(
        "bp", (F.col("c") >= min_count).cast("bigint"))
    per_doc = flagged.groupBy("source", "doc_id").agg(
        F.sum("seg_len").cast("bigint").alias("tok"),
        F.sum(F.col("seg_len") * F.col("bp")).cast("bigint")
         .alias("bp_tok"),
        F.max("bp").cast("bigint").alias("affected"),
        F.sum("bp").cast("bigint").alias("n_bp_seg"))
    per_src = per_doc.groupBy("source").agg(
        F.sum("affected").cast("bigint").alias("n_docs_affected"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
        F.sum("bp_tok").cast("bigint").alias("boilerplate_tokens"),
        F.sum("n_bp_seg").cast("bigint").alias("n_boilerplate_segments"))
    docs_src = documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        docs_src.join(per_src, "source", "left")
        .select(
            "source", "n_docs",
            F.coalesce("n_docs_affected", F.lit(0)).cast("bigint")
             .alias("n_docs_affected"),
            F.coalesce("total_tokens", F.lit(0)).cast("bigint")
             .alias("total_tokens"),
            F.coalesce("boilerplate_tokens", F.lit(0)).cast("bigint")
             .alias("boilerplate_tokens"),
            # numerator through the decimal funnel: token totals reach
            # ~9e12 per source (×1e6 = int64 edge) around 40 TB of
            # text in ONE source — decimal mode widens past it
            F.floor(money.acc(F.coalesce("boilerplate_tokens", F.lit(0)))
                    * 1_000_000
                    / F.greatest(F.lit(1),
                                 F.coalesce("total_tokens", F.lit(0))))
             .cast("bigint").alias("boilerplate_rate_e6"),
            F.coalesce("n_boilerplate_segments", F.lit(0)).cast("bigint")
             .alias("n_boilerplate_segments"))
        .orderBy("source")
    )
