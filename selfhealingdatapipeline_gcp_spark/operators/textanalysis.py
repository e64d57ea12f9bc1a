"""Text analysis operators over the documents table (SURVEY §2).

All per-row work is built-in array/string expressions (whole-stage
codegen) — token counting, ratio features, marker-based language ID,
and a rolling-hash fingerprint. No Python UDFs anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import money, textfn

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

def _spread(df: DataFrame) -> DataFrame:
    """Hash-spread on doc_id before per-row/explode work: single-file
    inputs otherwise pin the whole stage to one task (SURVEY §3b);
    downstream doc_id aggs reuse the exchange."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, "doc_id")


LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}


def text_token_count(documents: DataFrame) -> DataFrame:
    """Token counts: whitespace tokens, unique tokens, chars.

    Explode + aggregate (whole-stage codegen + map-side partial agg)
    instead of array expressions — HOFs are interpreted (SURVEY §3b).
    """
    ex = _spread(documents).select(
        "doc_id", F.length("text").alias("n_chars"),
        F.explode(textfn.tokens("text")).alias("w"))
    return (
        ex.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("w").alias("n_unique_tokens"),
            F.first("n_chars").alias("n_chars_actual"),
        )
    )


def text_quality_score(documents: DataFrame) -> DataFrame:
    """Length / stopword-ratio / word-length composite quality score —
    the standard cheap pre-filter in training-data pipelines."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    ex = _spread(documents).select(
        "doc_id", F.explode(textfn.tokens("text")).alias("w"))
    agg = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.length("w")).alias("__sum_len"),
        F.sum(F.array_contains(stop_arr, F.col("w")).cast("bigint"))
         .alias("__n_stop"),
    )
    n = F.col("__n")
    mean_len = F.col("__sum_len") / F.greatest(n, F.lit(1))
    stop_ratio = F.col("__n_stop") / F.greatest(n, F.lit(1))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    wl_score = F.when((mean_len >= 2.0) & (mean_len <= 10.0),
                      F.lit(1.0)).otherwise(F.lit(0.0))
    score = 0.5 * len_score + 0.3 * stop_ratio + 0.2 * wl_score
    return agg.select(
        "doc_id",
        n.alias("n_tokens"),
        money.trunc(mean_len).alias("mean_token_len"),
        money.trunc(stop_ratio).alias("stopword_ratio"),
        money.trunc(score).alias("quality_score"),
    )


def text_language_id(documents: DataFrame) -> DataFrame:
    """Marker-word language ID (n-gram-free heuristic): per-language
    marker hit rate, argmax with fixed preference order on ties."""
    ex = _spread(documents).select(
        "doc_id", F.explode(textfn.tokens("text")).alias("w"))
    marker_aggs = []
    for lang, words in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        marker_aggs.append(
            F.sum(F.array_contains(arr, F.col("w")).cast("bigint"))
             .alias(f"__m_{lang}"))
    d = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n"), *marker_aggs)
    n = F.greatest(F.col("__n"), F.lit(1))
    scores = {lang: F.col(f"__m_{lang}") / n for lang in LANG_MARKERS}
    langs = list(LANG_MARKERS)
    pred = F.lit("unknown")
    best = F.lit(-1.0)
    # fixed order: earlier language wins ties (>) against later ones
    for lang in reversed(langs):
        s = scores[lang]
        pred = F.when(s >= best, F.lit(lang)).otherwise(pred)
        best = F.when(s >= best, s).otherwise(best)
    cols = [money.trunc(scores[lang]).alias(f"score_{lang}") for lang in langs]
    return d.select("doc_id", *cols,
                    F.when(best <= 0.0, F.lit("unknown")).otherwise(pred)
                     .alias("predicted_lang"))


def doc_language_confusion(documents: DataFrame) -> DataFrame:
    """Labeled-vs-detected language confusion matrix: the documents
    table's `lang` column (what the upstream feed CLAIMS) against
    text_language_id's marker-based detection (what the text LOOKS
    like), with per-label shares — the label-noise audit a curation
    run consults before trusting `lang` for filtering or mixing
    (a feed that labels everything `en` flags here as one row of
    mass off the diagonal).

    Scale shape: rides text_language_id's one explode+groupBy pass,
    then reduces to an O(|langs|²) matrix; the per-label total join
    is broadcast. share_e6 is an exact integer ratio of counts."""
    pred = text_language_id(documents).select("doc_id", "predicted_lang")
    j = documents.select("doc_id", "lang").join(pred, "doc_id")
    per = j.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"))
    tot = per.groupBy("lang").agg(F.sum("n_docs").alias("__t"))
    return (
        per.join(F.broadcast(tot), "lang")
        .select(
            "lang", "predicted_lang", "n_docs",
            F.floor(F.col("n_docs") * F.lit(1000000) / F.col("__t"))
             .cast("bigint").alias("share_e6"),
            (F.col("lang") == F.col("predicted_lang")).alias("agree"),
        )
        .orderBy("lang", "predicted_lang")
    )


def doc_fingerprint(documents: DataFrame, n_shards: int = 64) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint + shard assignment
    (shard = fingerprint mod n_shards — the partitioning key a 100 TB
    dedup/snapshot pipeline would bucket by)."""
    ints = F.transform(textfn.tokens("text"), textfn.md5int)
    fp = textfn.poly_fingerprint(ints)
    return _spread(documents).select(
        "doc_id",
        fp.alias("fingerprint"),
        (fp % n_shards).alias("shard"),
    )


def keyword_search_tfidf(documents: DataFrame,
                         terms: tuple[str, ...] = ("spark", "query", "fast"),
                         k: int = 20) -> DataFrame:
    """TF-IDF keyword retrieval: score = Σ tf(t,d)·ln(N/df(t)) over the
    query terms, top-k docs. Term filtering happens at the explode
    (only query-term rows survive into the shuffle); df/N are tiny
    broadcast scalars."""
    term_arr = F.array(*[F.lit(t) for t in terms])
    ex = (
        _spread(documents)
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
        .filter(F.array_contains(term_arr, F.col("w")))
    )
    tf = ex.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_counts), "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("contrib",
                    F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .groupBy("doc_id")
        .agg((F.floor(F.sum("contrib") * 1e4) / 1e4).alias("score"))
    )
    return (
        scored
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def ngram_frequencies(documents: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-level token frequencies, top-k (the vocabulary/frequency
    table every text pipeline materializes). Map-side combine keeps
    the shuffle at vocabulary size."""
    return (
        _spread(documents)
        .select(F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(k)
    )


def bpe_merge_candidates(documents: DataFrame,
                         top_n: int = 50) -> DataFrame:
    """First byte-pair-encoding training round, corpus-wide: the
    frequency of every adjacent character pair inside whitespace
    tokens, weighted by token occurrences — the ranked merge table a
    BPE tokenizer's first iteration commits. Pairs with the broadest
    support also report how many DISTINCT words contain them (a merge
    that fires in one hot word vs across the vocabulary). The
    reference pipeline consumes pre-tokenized feeds; inducing the
    vocabulary from the corpus itself is the step a training-data
    engine adds in front (text_token_estimate's ~4 chars/token cost
    model is exactly what this table's merge depth calibrates).

    Scale shape: the corpus collapses to the DISTINCT-WORD relation
    first (one vocabulary-sized shuffle with map-side combine — the
    token_heavy_hitters exact-leg discipline); the bigram explosion
    runs over distinct words only (vocab × avg-word-length rows,
    corpus-size-independent), and the final aggregate is bounded by
    |alphabet|² distinct pairs — a few thousand rows at ANY corpus
    size, so the global rank sort is trivially safe."""
    words = (
        _spread(documents)
        .select(F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # guard length >= 2: Spark's sequence(1, 0) DESCENDS ([1, 0])
    # instead of returning empty, which would fabricate pairs for
    # single-char words (DuckDB's generate_series(1, 0) is empty)
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "w", "n",
            F.explode(F.expr(
                "transform(sequence(1, length(w) - 1), "
                "i -> substring(w, i, 2))")).alias("pair"),
        )
    )
    agg = (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"),
             F.countDistinct("w").cast("bigint").alias("n_distinct_words"))
    )
    w_rank = Window.orderBy(F.desc("n_occurrences"), "pair")
    return (
        agg.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .orderBy("rank")
        .limit(top_n)
        .select("rank", "pair", "n_occurrences", "n_distinct_words")
    )


def _bpe_apply_merge(syms, p1: str, p2: str):
    """One BPE merge rule (p1, p2) -> p1||p2 applied greedily
    left-to-right over a symbol array — the exact classic-BPE
    semantics: a left fold where the freshly merged symbol can never
    re-match as the left element in the same pass (p1||p2 == p1 would
    need p2 = "", and empty symbols never exist), so e.g. pair (a, a)
    turns "aaaa" into [aa, aa] and "aaa" into [aa, a]."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(p1))
            & (s == F.lit(p2)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.concat(F.element_at(acc, -1), s))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_apply_merge_py(syms: list, p1: str, p2: str) -> list:
    """Pure-Python twin of ``_bpe_apply_merge``: the identical
    greedy left fold (freshly merged symbol never re-matches as the
    left element in the same pass), used by the driver-side
    induction leg so both legs commit bit-identical states."""
    acc: list = []
    for s in syms:
        if acc and acc[-1] == p1 and s == p2:
            acc[-1] = p1 + p2
        else:
            acc.append(s)
    return acc


def _bpe_learn_driver(words: list, n_merges: int):
    """Driver-side BPE induction over the collected distinct-word
    relation ``[(w, n), ...]`` — the classic incremental-pair-stats
    algorithm (only words containing the committed pair update their
    pair counts each round). Commit order is identical to the
    distributed leg: max summed count, ties broken by (p1, p2)
    ascending (Python str comparison is code-point order, the same
    order Spark's UTF8String binary comparison yields for valid
    UTF-8). Returns (final [(w, n, syms)] state, merge records)."""
    state = [[list(w), n] for w, n in words]
    pair_counts: dict = {}
    pair_words: dict = {}
    for idx, (syms, n) in enumerate(state):
        for pr in zip(syms, syms[1:]):
            pair_counts[pr] = pair_counts.get(pr, 0) + n
            pair_words.setdefault(pr, set()).add(idx)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        if not pair_counts:
            break
        (p1, p2), cnt = min(pair_counts.items(),
                            key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, p1, p2, cnt))
        # stale indices (word no longer contains the pair after an
        # earlier round's merge) are harmless: subtract-then-re-add
        # of the CURRENT symbols cancels exactly
        for idx in sorted(pair_words.pop((p1, p2), ())):
            syms, n = state[idx]
            for pr in zip(syms, syms[1:]):
                left = pair_counts[pr] - n
                if left:
                    pair_counts[pr] = left
                else:
                    del pair_counts[pr]
            new = _bpe_apply_merge_py(syms, p1, p2)
            state[idx][0] = new
            for pr in zip(new, new[1:]):
                pair_counts[pr] = pair_counts.get(pr, 0) + n
                pair_words.setdefault(pr, set()).add(idx)
    return state, merges


def _bpe_learn(documents: DataFrame, n_merges: int):
    """Induce ``n_merges`` BPE rules from the corpus; returns
    (final word->symbols state, merge records).

    The kmeans/pagerank unrolled-round discipline: the corpus
    collapses ONCE to the distinct-word relation (one vocab-sized
    shuffle with map-side combine); every round after that touches
    only vocab-sized state. Hybrid execution (optimization r10,
    guide §1.2): the distributed loop pays ~2 Spark jobs per merge
    round (argmax + re-checkpoint) — pure scheduler overhead once
    the distinct-word relation is small. Below
    ``$SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP`` distinct words (default
    200k — the K×d centroid hand-broadcast discipline: the word
    relation is vocabulary-sized, sublinear in the corpus) the
    relation collects once and the induction runs incrementally on
    the driver, committing bit-identical merges; past the cap the
    original distributed loop runs — one argmax row per round to
    the driver, state never leaves the cluster."""
    words_agg = (
        _spread(documents)
        .select(F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cap = int(os.environ.get("SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP", "200000"))
    if cap > 0:
        head = words_agg.limit(cap + 1).toPandas()
        if len(head) <= cap:
            spark = documents.sparkSession
            state_py, merges = _bpe_learn_driver(
                list(zip(head["w"].tolist(),
                         (int(x) for x in head["n"].tolist()))),
                n_merges)
            import pandas as pd

            state_pdf = pd.DataFrame({
                "w": head["w"].tolist(),
                "n": head["n"].tolist(),
                "syms": [s for s, _ in state_py]})
            state_df = spark.createDataFrame(
                state_pdf,
                schema=("w string, n bigint, syms array<string>"))
            return state_df, merges
    state = (
        words_agg
        .withColumn("syms", F.expr(
            "transform(sequence(1, length(w)), "
            "i -> substring(w, i, 1))"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        best = (
            state.filter(F.size("syms") >= 2)
            .select("n", F.explode(F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(element_at(syms, i) AS p1, "
                "element_at(syms, i + 1) AS p2))")).alias("pr"))
            .groupBy("pr.p1", "pr.p2")
            .agg(F.sum("n").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "p1", "p2")
            .first()
        )
        if best is None:
            break
        merges.append((r, best["p1"], best["p2"], best["cnt"]))
        state = (
            state.withColumn(
                "syms", _bpe_apply_merge(F.col("syms"),
                                         best["p1"], best["p2"]))
            .localCheckpoint(eager=True)
        )
    return state, merges


def bpe_vocab(documents: DataFrame, n_merges: int = 8) -> DataFrame:
    """Multi-round BPE vocabulary induction (the real tokenizer-
    training loop ``bpe_merge_candidates`` is round 1 of): commit the
    highest-count adjacent symbol pair each round (ties broken by
    pair lexicographically — deterministic on both engines), merge it
    corpus-wide, repeat. Output is the ordered merge table a BPE
    tokenizer ships: one row per round with the committed pair and
    its support at commit time.

    Scale shape: see ``_bpe_learn`` — corpus read once, per-round
    state is the distinct-word relation, per-round driver traffic is
    one row. The reference pipeline consumes pre-tokenized feeds;
    inducing the tokenizer from the corpus itself is the step a
    training-data engine adds in front (same rationale as
    ``bpe_merge_candidates``, which this generalizes)."""
    spark = documents.sparkSession
    _, merges = _bpe_learn(documents, n_merges)
    rows = [(r, p1, p2, p1 + p2, cnt) for r, p1, p2, cnt in merges]
    return spark.createDataFrame(
        rows, "merge_round int, left_sym string, right_sym string, "
              "merged string, pair_count bigint")


def bpe_token_ids(documents: DataFrame, n_merges: int = 8) -> DataFrame:
    """Tokenizer APPLY: segment every document with the
    ``bpe_vocab``-induced merges and emit per-doc token ids — the
    loop-closer for ``text_token_estimate``'s ~4-chars/token cost
    model (compare count(*) per doc here against its estimate).

    Token ids are frequency ranks over the induced vocabulary
    (row_number by descending corpus frequency, then symbol — the
    id assignment real BPE vocabs ship). Output is token grain:
    (doc_id, word_pos, sub_pos, token_id, token), 1-based positions.

    Scale shape: merges induce on the distinct-word relation
    (``_bpe_learn``); the apply side is corpus-token-grain rows
    equi-joined to the vocab-sized word->symbols map and the
    vocab-sized id table (AQE broadcasts both when small; never a
    corpus×corpus join). The id-assignment window sorts the
    VOCABULARY relation only, never the corpus."""
    state, _ = _bpe_learn(documents, n_merges)
    vocab = (
        state.select("n", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("n").cast("bigint").alias("tok_n"))
        .withColumn("token_id", F.row_number().over(
            Window.orderBy(F.desc("tok_n"), "sym")).cast("int"))
    )
    docw = (
        _spread(documents)
        .select("doc_id", F.posexplode(textfn.tokens("text"))
                .alias("wp0", "w"))
        .select("doc_id", (F.col("wp0") + 1).cast("int")
                .alias("word_pos"), "w")
    )
    sub = (
        docw.join(state.select("w", "syms"), "w")
        .select("doc_id", "word_pos",
                F.posexplode("syms").alias("sp0", "token"))
        .select("doc_id", "word_pos",
                (F.col("sp0") + 1).cast("int").alias("sub_pos"), "token")
    )
    return (
        sub.join(vocab.select(F.col("sym").alias("token"), "token_id"),
                 "token")
        .select("doc_id", "word_pos", "sub_pos", "token_id", "token")
    )


def text_token_estimate(documents: DataFrame) -> DataFrame:
    """BPE-ish token estimate per document (the cost model every
    training-data pipeline needs before the real tokenizer runs):
    pre-tokenize with a GPT-2-style regex (letter runs | single
    digits | punctuation), then estimate subword count as
    ceil(len/4) per pre-token (~4 chars/BPE-token on English text).

    Codegen end-to-end: regexp_extract_all → explode → count/sum
    (map-side partial agg; the shuffle carries per-doc aggregates).
    The regex sticks to explicit ASCII classes so Java regex (Spark)
    and RE2 (DuckDB oracle) agree symbol-for-symbol."""
    pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
    ex = (
        _spread(documents)
        .select("doc_id", "n_chars",
                F.explode_outer(
                    F.regexp_extract_all("text", F.lit(pat), 0))
                 .alias("tok"))
    )
    return (
        ex.groupBy("doc_id")
        .agg(
            F.count("tok").alias("n_pretokens"),
            F.coalesce(F.sum(F.floor((F.length("tok") + 3) / 4)),
                       F.lit(0)).cast("bigint").alias("est_bpe_tokens"),
            F.max("n_chars").alias("n_chars"),
        )
        .withColumn(
            "chars_per_token",
            F.when(F.col("est_bpe_tokens") > 0,
                   F.floor(F.col("n_chars") * 1e4 / F.col("est_bpe_tokens"))
                   / 1e4).otherwise(F.lit(0.0)))
        .orderBy("doc_id")
    )


def tokenizer_fertility_by_source(documents: DataFrame) -> DataFrame:
    """Tokenizer fertility per source: estimated BPE subwords per
    whitespace word — the tokenizer-suitability number a multilingual
    mixing decision needs (English-ish text sits near ~1.2-1.5;
    a source reading ≫ that is paying a token tax the mixing weights
    should know about, the standard fertility metric from the
    multilingual-tokenizer literature).

    Same codegen machinery as text_token_estimate (GPT-2-style regex
    pre-tokens, ceil(len/4) subwords) and text_token_count
    (whitespace words), reduced straight to source grain: both
    numerators are exact integer sums (map-side combined, O(sources)
    output rows), the ratio floors at e4."""
    pat = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
    ex = (
        _spread(documents)
        .select("doc_id", "source",
                F.size(textfn.tokens("text")).alias("n_words"),
                F.explode_outer(
                    F.regexp_extract_all("text", F.lit(pat), 0))
                 .alias("tok"))
    )
    per_doc = (
        ex.groupBy("doc_id", "source")
        .agg(F.max("n_words").alias("n_words"),
             F.coalesce(F.sum(F.floor((F.length("tok") + 3) / 4)),
                        F.lit(0)).cast("bigint").alias("est"))
    )
    return (
        per_doc.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_words").alias("n_words"),
             F.sum("est").alias("est_bpe_tokens"))
        .withColumn(
            "fertility",
            F.when(F.col("n_words") > 0,
                   F.floor(F.col("est_bpe_tokens") * 1e4
                           / F.col("n_words")) / 1e4)
             .otherwise(F.lit(0.0)))
        .orderBy("source")
    )


def source_language_mix(documents: DataFrame) -> DataFrame:
    """Language composition per source from the table's own lang
    labels — the first mixing-table input a multilingual curation
    plan reads (tokenizer_fertility_by_source prices the token tax;
    this says how much of each source pays it). One grain-reducing
    groupBy to (source, lang) plus per-source totals re-aggregated
    from the grain (never a second corpus scan); shares floor at e6.
    O(sources × languages) output at any SF."""
    grain = (
        documents.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.size(textfn.tokens("text"))).alias("n_words"))
    )
    totals = grain.groupBy("source").agg(
        F.sum("n_docs").alias("src_docs"))
    return (
        grain.join(F.broadcast(totals), "source")
        .select("source", "lang", "n_docs", "n_words",
                F.floor(F.col("n_docs") * 1e6 / F.col("src_docs"))
                 .cast("bigint").alias("doc_share_e6"))
        .orderBy("source", "lang")
    )


def text_unigram_logprob(documents: DataFrame) -> DataFrame:
    """Perplexity-proxy quality score: per-doc average unigram
    negative log-probability under the corpus's own unigram model
    (the cheap stand-in for model-based perplexity filtering — wildly
    out-of-distribution docs score high, boilerplate scores low).

    Scale shape: vocabulary = one token-grain groupBy (map-side
    combined, shuffle carries (token, count)); docs then join their
    token rows to the vocab on the token key — the join is the only
    corpus-sized shuffle and it carries 8-byte hashes + counts, not
    text. ln() of identical doubles agrees across engines (same
    libm contract as keyword_search_tfidf); each token's nll is then
    floor-truncated to integer MICRO-units before summation so the
    per-doc sum is a bigint — order-independent across Spark partial
    aggregation, retries, and the DuckDB oracle (the same
    integer-accumulator discipline as event_anomaly_mad)."""
    toks = (
        _spread(documents)
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n_total"))
    scored = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.floor(-F.log(F.col("tf") / F.col("n_total")) * 1e6)
             .cast("bigint").alias("nll_micro"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # sum of bigints is exact; one double divide at the end
            (F.floor(F.sum("nll_micro") / (F.count(F.lit(1)) * 100.0))
             / 1e4).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


def source_quality_report(documents: DataFrame) -> DataFrame:
    """Per-source curation report — the table a data-mixing decision
    actually reads: volume (docs, estimated tokens), exact-duplicate
    rate, and quality-score distribution (mean + share ≥ 0.5) for
    every source.

    Scale shape: the per-doc quality pipeline (token explode + one
    doc-grain aggregate) joins back to the doc row ONCE on doc_id,
    then everything collapses to a |sources|-row aggregate with
    map-side partials. All averages accumulate in integer units
    (scores are exact 1e-4 multiples, so round(q·1e4) is lossless) —
    order-independent across engines and retries."""
    qs = text_quality_score(documents).select("doc_id", "quality_score")
    est = F.greatest(F.floor((F.col("n_chars") + 3) / 4).cast("bigint"),
                     F.lit(1))
    base = documents.select("doc_id", "source", est.alias("est_tokens"),
                            F.md5("text").alias("__h"))
    q_e4 = F.round(F.col("quality_score") * 1e4).cast("bigint")
    agg = (
        base.join(qs, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("__h").alias("n_unique"),
             F.sum("est_tokens").alias("total_est_tokens"),
             F.sum(q_e4).alias("__sum_q"),
             F.sum((q_e4 >= 5000).cast("bigint")).alias("__n_good"))
    )
    return agg.select(
        "source", "n_docs", "n_unique",
        F.floor((F.col("n_docs") - F.col("n_unique")) * 1e6
                / F.col("n_docs")).cast("bigint").alias("dup_rate_e6"),
        "total_est_tokens",
        F.floor(F.col("__sum_q") / F.col("n_docs")).cast("bigint")
         .alias("mean_quality_e4"),
        F.floor(F.col("__n_good") * 1e6 / F.col("n_docs")).cast("bigint")
         .alias("good_share_e6"),
    ).orderBy("source")


def bm25_search(documents: DataFrame,
                terms: tuple[str, ...] = ("spark", "query", "fast"),
                k: int = 20, k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 keyword retrieval, top-k — the production ranking function
    keyword_search_tfidf approximates: doc-length-normalized term
    frequency saturation (k1) and length penalty (b), with the
    standard Robertson idf = ln(1 + (N − df + ½)/(df + ½)).

    Same scale shape as tfidf: only query-term token rows survive the
    explode into any shuffle; df and the corpus length stats are tiny
    broadcast scalars; the one corpus-sized aggregate is the per-doc
    length relation (doc_id grain). Determinism: every per-(doc,term)
    contribution is floor-truncated to an e6 INTEGER before the
    per-doc sum (the text_unigram_logprob discipline — order-
    independent across partial aggregation and engines); ln() of
    identical doubles agrees across engines."""
    term_arr = F.array(*[F.lit(t) for t in terms])
    toks = (
        _spread(documents)
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.sum("dl").alias("sum_dl"),
                   F.count(F.lit(1)).alias("n_docs"))
    tf = (
        toks.filter(F.array_contains(term_arr, F.col("w")))
        .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                            + F.lit(b) * F.col("dl") / avgdl))
    contrib_e6 = F.floor(
        idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom * 1e6).cast("bigint")
    scored = (
        tf.join(F.broadcast(dfc), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib_e6.alias("c_e6"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("matched_terms"),
             (F.floor(F.sum("c_e6") / 100.0) / 1e4).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def source_ngram_novelty(documents: DataFrame) -> DataFrame:
    """Per-source 3-gram novelty: the share of a source's distinct
    shingles that appear in NO other source — the uniqueness signal a
    mixing decision reads next to volume (source_token_stats) and
    quality (source_quality_report): a source whose n-grams are
    almost all shared adds little new signal at any mixing weight.

    Join-free: one groupBy on the 48-bit shingle hash builds the
    per-hash source set (collect_set dedups in-bucket — the shuffle
    carries (hash, source), never text), explode + a |sources|-grain
    aggregate reads novelty straight off the set size. Two exchanges
    total, both on small keys; output is O(|sources|) rows."""
    from selfhealingdatapipeline_gcp_spark.operators.dedup import _shingle_rows
    sh = _shingle_rows(documents, carry=("source",))
    buckets = (
        sh.select("source", textfn.md5int(F.col("s")).alias("h"))
        .groupBy("h")
        .agg(F.collect_set("source").alias("srcs"))
    )
    per = (
        buckets
        .select(F.explode("srcs").alias("source"),
                F.size("srcs").alias("k"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("distinct_shingles"),
             F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
              .cast("bigint").alias("novel_shingles"))
    )
    return (
        per.select(
            "source", "distinct_shingles", "novel_shingles",
            F.floor(F.col("novel_shingles") * 1e6
                    / F.col("distinct_shingles"))
             .cast("bigint").alias("novelty_e6"))
        .orderBy("source")
    )


def vocab_coverage(documents: DataFrame,
                   ks: tuple[int, ...] = (10, 100, 1000)) -> DataFrame:
    """Vocabulary coverage curve: what share of all token OCCURRENCES
    the k most frequent token types cover, for each target k — the
    number a tokenizer-vocab or stopword-list decision reads (if 1k
    types cover 99%, a 50k-entry vocab is waste).

    Scale shape: one token-grain groupBy (map-side combined; the
    shuffle carries (token, count) — vocabulary-sized, not
    corpus-sized), then rank + running-sum windows over the VOCAB
    relation. The windows are global-ordered but their input is the
    vocabulary, which is sublinear in corpus size (Heaps' law) and
    fits one stage at any SF the token groupBy survives. Counts and
    running sums are bigints (order-independent); coverage is
    floor-e6. Ties rank deterministically (count desc, token asc).
    Output is |ks| rows."""
    vocab = (
        _spread(documents)
        .select(F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    )
    win = Window.orderBy(F.desc("n"), "w")
    ranked = vocab.select(
        "n", F.row_number().over(win).alias("rank"),
        F.sum("n").over(win.rowsBetween(Window.unboundedPreceding, 0))
         .alias("cum"))
    total = vocab.agg(F.sum("n").alias("total"),
                      F.count(F.lit(1)).alias("vocab_size"))
    karr = F.array(*[F.lit(k) for k in sorted(ks)])
    return (
        ranked.crossJoin(F.broadcast(total))
        # a target k beyond the vocabulary clamps to the last rank
        .filter(F.array_contains(karr, F.col("rank"))
                | ((F.col("rank") == F.col("vocab_size"))
                   & (F.col("vocab_size") < F.lit(max(ks)))))
        .select(
            F.least(F.col("rank"), F.col("vocab_size")).alias("k"),
            F.col("cum").alias("covered_tokens"),
            "total",
            F.floor(F.col("cum") * 1e6 / F.col("total")).cast("bigint")
             .alias("coverage_e6"))
        .orderBy("k")
    )


def source_divergence_matrix(documents: DataFrame) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats, ∈ [0, ln 2]) between
    the per-source unigram token distributions — the quantitative
    input behind a mixing decision: temperature_mixing_weights says
    how much of each source to take, this says how redundant two
    sources are with each other (near-0 = same distribution, near
    ln 2 = disjoint vocabularies).

    Decomposition that keeps the plan count-grain: shared tokens get
    the exact per-token JS term; tokens unique to one side contribute
    p·ln 2 in closed form, so only Σp over SHARED tokens is needed —
    carried as exact bigint token counts, never a second pass.
    Per-token terms are doubles from exact integer counts (identical
    in any engine), floored to e9 integers before the per-pair sum
    (order-independent — the source_token_entropy discipline).

    Scale shape: shuffles carry (source, token, count) — vocab-grain,
    never corpus-grain; the pair join fans a token out only to the
    sources that contain it (≤ S rows), so the joined relation is
    O(S²·V) worst case with S = #sources ≪ corpus; totals are S rows
    and broadcast; output is S(S-1)/2 rows. Zero-overlap pairs are
    kept via the all-pairs LEFT join (the minhash_estimate_report
    oracle lesson, ADVICE r6): JS = ln 2 exactly."""
    import math

    stw = (
        _spread(documents)
        .select("source", F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    )
    totals = stw.groupBy("source").agg(
        F.sum("n").alias("nt"), F.count(F.lit(1)).alias("vocab"))
    ta = totals.select(F.col("source").alias("src_a"),
                       F.col("nt").alias("na_tot"),
                       F.col("vocab").alias("vocab_a"))
    tb = totals.select(F.col("source").alias("src_b"),
                       F.col("nt").alias("nb_tot"),
                       F.col("vocab").alias("vocab_b"))
    shared = (
        stw.select(F.col("source").alias("src_a"), "w",
                   F.col("n").alias("na"))
        .join(stw.select(F.col("source").alias("src_b"), "w",
                         F.col("n").alias("nb")), "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta.select("src_a", "na_tot")), "src_a")
        .join(F.broadcast(tb.select("src_b", "nb_tot")), "src_b")
    )
    p = F.col("na") / F.col("na_tot")
    q = F.col("nb") / F.col("nb_tot")
    m = (p + q) / 2
    term = 0.5 * (p * F.log(p / m) + q * F.log(q / m))
    per = shared.groupBy("src_a", "src_b").agg(
        F.sum(F.floor(term * 1e9).cast("bigint")).alias("__sh_e9"),
        F.sum("na").alias("__sh_na"),
        F.sum("nb").alias("__sh_nb"),
        F.count(F.lit(1)).alias("n_shared_vocab"),
    )
    pairs = (ta.crossJoin(tb).filter(F.col("src_a") < F.col("src_b"))
             .join(per, ["src_a", "src_b"], "left"))
    ln2 = math.log(2.0)
    sh_na = F.coalesce(F.col("__sh_na"), F.lit(0))
    sh_nb = F.coalesce(F.col("__sh_nb"), F.lit(0))
    js = (F.coalesce(F.col("__sh_e9"), F.lit(0)) / 1e9
          + 0.5 * ln2 * ((F.col("na_tot") - sh_na) / F.col("na_tot")
                         + (F.col("nb_tot") - sh_nb) / F.col("nb_tot")))
    return (
        pairs.select(
            "src_a", "src_b",
            F.col("na_tot").alias("n_tokens_a"),
            F.col("nb_tot").alias("n_tokens_b"),
            F.coalesce(F.col("n_shared_vocab"), F.lit(0).cast("bigint"))
             .alias("n_shared_vocab"),
            (F.floor(js * 1e6) / 1e6).alias("js_divergence"),
        )
        .orderBy("src_a", "src_b")
    )


def source_token_entropy(documents: DataFrame) -> DataFrame:
    """Per-source Shannon entropy of the token distribution (nats) —
    the diversity signal next to novelty and volume: near-zero
    entropy means a source is template spam regardless of its size.

    H = ln(N) − (Σ n_w·ln n_w)/N computed from per-(source, token)
    counts; each n·ln(n) term floors to an e6 INTEGER before the
    per-source sum (order-independent across engines and retries —
    the unigram_logprob discipline), with one double ln(N) and one
    division at the end, floor-e6. Shuffles carry (source, token,
    count); output is O(|sources|) rows."""
    stw = (
        _spread(documents)
        .select("source", F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    )
    per = (
        stw.groupBy("source")
        .agg(F.sum("n").alias("n_tokens"),
             F.count(F.lit(1)).alias("vocab_size"),
             F.sum(F.floor(F.col("n") * F.log("n") * 1e6).cast("bigint"))
              .alias("nlogn_e6"))
    )
    ent = (F.log("n_tokens")
           - F.col("nlogn_e6") / 1e6 / F.col("n_tokens"))
    return (
        per.select(
            "source", "n_tokens", "vocab_size",
            (F.floor(ent * 1e6) / 1e6).alias("entropy_nats"))
        .orderBy("source")
    )


def token_collocations(documents: DataFrame, k: int = 50,
                       min_count: int = 5) -> DataFrame:
    """Top-k collocations by pointwise mutual information: adjacent
    token pairs whose co-occurrence beats the independence baseline —
    the multi-word-expression detector (tokenizer merge candidates,
    boilerplate phrase discovery) next to raw ngram_frequencies.

    pmi = ln( (n_ab/M) / ((n_a/N)·(n_b/N)) ) with bigram total M and
    token total N; ``min_count`` suppresses the classic PMI
    pathology (hapax pairs scoring +∞-ish).

    Scale shape: bigrams come from the same posexplode + lead()
    window as the shingle machinery (codegen; one doc_id shuffle);
    counts aggregate map-side to bigram-vocabulary grain; the two
    unigram joins are token-key equi-joins carrying counts, never
    text; totals broadcast as 1-row aggregates. One ln per OUTPUT
    row, floor-e6 — never summed, so float-order drift cannot
    arise."""
    toks = (
        _spread(documents)
        .select("doc_id",
                F.posexplode(textfn.tokens("text")).alias("pos", "w"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.select("w", F.lead("w", 1).over(win).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    nb = big.groupBy("w", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    btot = big.agg(F.count(F.lit(1)).alias("n_big"))
    pmi = F.log(
        (F.col("n_ab") / F.col("n_big"))
        / ((F.col("n_a") / F.col("n_tok"))
           * (F.col("n_b") / F.col("n_tok"))))
    return (
        nb.filter(F.col("n_ab") >= min_count)
        .join(uni.select(F.col("w").alias("w"),
                         F.col("n").alias("n_a")), "w")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("n").alias("n_b")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(F.col("w").alias("w1"), F.col("w2"),
                "n_ab",
                F.floor(pmi * 1e6).cast("bigint").alias("pmi_e6"))
        .orderBy(F.desc("pmi_e6"), "w1", "w2")
        .limit(k)
    )


def more_like_this(documents: DataFrame,
                   anchor_ids: tuple[int, ...] = (0, 1, 2),
                   k: int = 10, max_df: int | None = None) -> DataFrame:
    """Anchor-document retrieval ("more like this"): top-k most
    similar documents to each anchor by TF-IDF cosine — the
    related-content / expand-a-seed-set query next to term search
    (bm25_search) and pairwise dedup.

    Scale shape: the anchor side reduces to its term rows and
    BROADCASTS (a handful of docs); the corpus side joins on the
    token key, so the shuffle carries (token, doc, weight) — never
    text. Unlike the pairwise dedups, NO df ceiling is needed for
    scale: one join side is |anchors| docs, so worst-case fan-out is
    |anchors|·corpus — linear, not quadratic (a ubiquitous term costs
    a corpus scan per anchor, which is the job being asked for).
    ``max_df`` remains as an optional noise-pruning knob; it defaults
    OFF because an absolute ceiling silently empties the result on
    small-vocabulary corpora (caught by the sf1 probe).
    Determinism: TF-IDF weights floor to e3 INTEGERS; dots and
    squared norms are bigint sums of integer products
    (order-independent; e3 keeps Σ w_a·w_b inside int64 at any
    realistic doc size); one sqrt/divide per output row."""
    toks = (
        _spread(documents)
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    if max_df is not None:
        dfc = dfc.filter(F.col("df") <= max_df)
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    wgt = (
        # dfc is VOCABULARY-sized here (every term's df, not a few
        # query terms like keyword_search_tfidf) — it must join on
        # the token key, not broadcast; Heaps' law keeps it sublinear
        # but at 100 TB it is still far beyond broadcast budgets
        tf.join(dfc, "w")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "w",
                F.floor(F.col("tf")
                        * F.log(F.col("n_docs") / F.col("df")) * 1e3)
                 .cast("bigint").alias("wt"))
    )
    norms = wgt.groupBy("doc_id").agg(
        F.sum(F.col("wt") * F.col("wt")).alias("nsq"))
    anchor_arr = F.array(*[F.lit(int(a)) for a in anchor_ids])
    anchors = (
        wgt.filter(F.array_contains(anchor_arr, F.col("doc_id")))
        .select(F.col("doc_id").alias("anchor_id"),
                "w", F.col("wt").alias("wt_a"))
    )
    dots = (
        wgt.join(F.broadcast(anchors), "w")
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .groupBy("anchor_id", "doc_id")
        .agg(F.sum(F.col("wt_a") * F.col("wt")).alias("dot"))
    )
    cos = (F.col("dot")
           / F.sqrt(F.col("nsq_a").cast("double")
                    * F.col("nsq_b").cast("double")))
    ranked = (
        dots
        .join(F.broadcast(
                  norms.filter(F.array_contains(anchor_arr,
                                                F.col("doc_id")))
                  .select(F.col("doc_id").alias("anchor_id"),
                          F.col("nsq").alias("nsq_a"))),
              "anchor_id")
        .join(norms.select(F.col("doc_id").alias("doc_id"),
                           F.col("nsq").alias("nsq_b")), "doc_id")
        .select("anchor_id", "doc_id",
                (F.floor(cos * 1e6) / 1e6).alias("cosine"))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("anchor_id")
            .orderBy(F.desc("cosine"), "doc_id")))
        .filter(F.col("rank") <= k)
    )
    return ranked.orderBy("anchor_id", "rank")


def doc_length_profile_by_source(documents: DataFrame) -> DataFrame:
    """Per-source token-length distribution (exact p10/p50/p90 +
    mean) — the number a chunking budget, packing stream count, and
    per-source context-window policy are actually tuned from (the
    corpus-wide token_histogram can hide a source whose docs are 100x
    longer than the mix average).

    Determinism: exact interpolated percentiles over integer token
    counts (Spark percentile ↔ DuckDB quantile_cont — identical
    linear interpolation, pinned since event_value_percentiles),
    floor-e6; the mean is an integer-sum ratio, floor-e4. One
    shuffle to source grain; O(|sources|) output at any corpus."""
    n_tok = F.size(textfn.tokens("text"))
    agg = (
        _spread(documents)
        .select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("tok_sum"),
             *[F.percentile("n_tok", F.lit(p / 100.0)).alias(f"q{p}")
               for p in (10, 50, 90)])
    )
    return (
        agg.select(
            "source", "n_docs",
            *[(F.floor(F.col(f"q{p}") * 1e6) / 1e6)
              .alias(f"p{p}_tokens") for p in (10, 50, 90)],
            (F.floor(F.col("tok_sum") * 1e4 / F.col("n_docs")) / 1e4)
             .alias("mean_tokens"))
        .orderBy("source")
    )


def source_zipf_slope(documents: DataFrame, top_k: int = 200,
                      min_types: int = 20) -> DataFrame:
    """Per-source Zipf exponent: the OLS slope of ln(frequency) on
    ln(rank) over the source's top-``top_k`` token types. Natural
    text runs ≈ −1; template spam and boilerplate floods flatten or
    cliff the curve — the shape diagnostic next to
    source_token_entropy (which compresses the same distribution to
    one number and can't see WHERE it deviates).

    Determinism: every per-type term (ln r, ln n, their product and
    squares) floors to an e9 integer BEFORE the per-source sum
    (order-independent partial aggregation — the entropy/unigram
    discipline); the closed-form slope then divides exact integer
    sums in doubles, floor-e6. Ranks tie-break on the token string.

    Scale: runs entirely on the (source, token) vocabulary relation
    — sublinear in corpus size; the rank window partitions by source
    over ≤ vocab rows; output O(|sources|)."""
    stw = (
        _spread(documents)
        .select("source", F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    )
    rw = Window.partitionBy("source").orderBy(F.desc("n"), F.col("w"))
    top = (stw.withColumn("r", F.row_number().over(rw))
           .filter(F.col("r") <= top_k))
    lr = F.log(F.col("r").cast("double"))
    ln = F.log(F.col("n").cast("double"))
    terms = top.select(
        "source",
        F.floor(lr * 1e9).cast("bigint").alias("x_e9"),
        F.floor(ln * 1e9).cast("bigint").alias("y_e9"),
        F.floor(lr * ln * 1e9).cast("bigint").alias("xy_e9"),
        F.floor(lr * lr * 1e9).cast("bigint").alias("xx_e9"))
    agg = terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("x_e9").alias("sx"), F.sum("y_e9").alias("sy"),
        F.sum("xy_e9").alias("sxy"), F.sum("xx_e9").alias("sxx"))
    k = F.col("n_types").cast("double")
    sx = F.col("sx") / 1e9
    sy = F.col("sy") / 1e9
    num = k * (F.col("sxy") / 1e9) - sx * sy
    den = k * (F.col("sxx") / 1e9) - sx * sx
    slope = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return (
        agg.filter(F.col("n_types") >= min_types)
        .select("source", "n_types",
                (F.floor(slope * 1e6) / 1e6).alias("zipf_slope"))
        .orderBy("source")
    )


def token_heavy_hitters(documents: DataFrame, depth: int = 4,
                        width: int = 1024, top_k: int = 20) -> DataFrame:
    """Count-Min-Sketch heavy-hitter audit: the top-``top_k`` tokens
    by exact count, each with its CMS estimate and the sketch's
    overestimate. The reference's quality scan counts values exactly
    (/root/reference/monitoring/quality_scan.py drives per-column
    GROUP BYs); at 100 TB an exact per-token count relation is the
    vocabulary size, while the CMS is ``depth × width`` cells TOTAL
    regardless of corpus — this operator runs both and measures the
    error the fixed-state path would pay, which is the number that
    decides whether streaming ingest can monitor token drift from a
    sketch instead of a vocabulary-sized state store.

    Determinism: bucket j for token w is md5int(j || ':' || w) mod
    ``width`` — the engine-portable md5 discipline (functions/
    textfn.py); no engine-native hash(). CMS guarantees estimate ≥
    exact, so ``overestimate`` is provably ≥ 0 (asserted in tests).

    Scale shape: one token explode collapses map-side to the
    (token, count) vocabulary relation — already the cost of any
    top-k; the CMS cells then derive from that relation (a ×depth
    explode over DISTINCT tokens, summed to ≤ depth·width counter
    cells), only ``top_k`` survivors probe the sketch, and the sketch
    broadcasts (≤ 4096 rows however large the corpus)."""
    counts = (
        _spread(documents)
        .select(F.explode(textfn.tokens("text")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return heavy_hitters_from_counts(counts, depth=depth, width=width,
                                     top_k=top_k)


def heavy_hitters_from_counts(counts: DataFrame, depth: int = 4,
                              width: int = 1024,
                              top_k: int = 20) -> DataFrame:
    """The heavy-hitter report from a (w, exact_count) token-count
    relation. Factored out so the batch operator and the streaming
    admission form (streaming/monitors.py streaming_heavy_hitters)
    are ROW-IDENTICAL by construction: token counts are associative
    sums, so summed per-epoch partials feed the same code path and
    the two share one SQL oracle.

    The CMS cell counts derive from the count relation (cell = Σ
    counts of tokens hashing there — exactly the per-occurrence
    count, by associativity), so the ×``depth`` explode runs over
    DISTINCT tokens, not every occurrence."""
    bucket_structs = lambda col: F.array(*[  # noqa: E731
        F.struct(
            F.lit(j).alias("j"),
            (textfn.md5int(F.concat(F.lit(f"{j}:"), col))
             % width).alias("bucket"))
        for j in range(depth)
    ])
    cells = counts.select(
        "exact_count", F.explode(bucket_structs(F.col("w"))).alias("c"))
    cms = (cells.groupBy(F.col("c.j").alias("j"),
                         F.col("c.bucket").alias("bucket"))
           .agg(F.sum("exact_count").alias("cnt")))
    # TakeOrderedAndProject (per-partition top-k merged at the driver)
    # — NOT a global row_number window, which would funnel the whole
    # vocabulary through one task; the rank window then runs on the
    # ``top_k`` survivors only.
    top = (counts.orderBy(F.desc("exact_count"), F.col("w"))
           .limit(top_k)
           .withColumn("rank", F.row_number().over(
               Window.orderBy(F.desc("exact_count"), F.col("w")))))
    probes = top.select(
        "w", "exact_count", "rank",
        F.explode(bucket_structs(F.col("w"))).alias("p"))
    est = (
        probes.join(F.broadcast(cms),
                    (F.col("p.j") == F.col("j"))
                    & (F.col("p.bucket") == F.col("bucket")))
        .groupBy("w", "exact_count", "rank")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return (
        est.select(
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("token"),
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("exact_count"))
             .cast("bigint").alias("overestimate"))
        .orderBy("rank")
    )


def doc_perplexity_buckets(documents: DataFrame,
                           bucket_micro_nats: int = 2_000_000,
                           max_bucket: int = 15) -> DataFrame:
    """Per-source histogram of the unigram perplexity proxy — the
    table a threshold-picking decision reads (the CCNet-style
    "perplexity bucket" view): how much of each source sits in each
    2-nat-wide band of avg negative log-probability. A source whose
    mass piles into the lowest buckets is boilerplate; a long high
    tail is OCR noise / wrong-language contamination. Composes the
    text_unigram_logprob scoring discipline; the histogram grain is
    what makes the score actionable per source.

    Determinism: per-token nll floors to integer micro-nats BEFORE
    the per-doc sum (bigint, order-independent); the per-doc average
    floors to integer micro-nats; bucket = that integer divided by
    ``bucket_micro_nats`` (pure integer ops), capped at
    ``max_bucket``.

    Scale shape: vocabulary groupBy + one corpus-sized token⋈vocab
    join (8-byte keys + counts, never text) — the
    text_unigram_logprob plan — then doc-grain and (source, bucket)
    aggregates, each partial-aggregated; the source-total join
    broadcasts O(|sources|) rows. Output ≤ |sources|·(max_bucket+1)."""
    toks = (
        _spread(documents)
        .select("doc_id", "source",
                F.explode(textfn.tokens("text")).alias("w"))
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n_total"))
    per_doc = (
        toks.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id", "source",
            F.floor(-F.log(F.col("tf") / F.col("n_total")) * 1e6)
             .cast("bigint").alias("nll_micro"))
        .groupBy("doc_id", "source")
        .agg(F.floor(F.sum("nll_micro") / F.count(F.lit(1)))
              .cast("bigint").alias("avg_nll_micro"))
    )
    bucketed = per_doc.select(
        "source",
        F.least(F.lit(max_bucket),
                F.floor(F.col("avg_nll_micro") / bucket_micro_nats))
         .cast("int").alias("bucket"))
    hist = bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    totals = bucketed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("source_docs"))
    return (
        hist.join(F.broadcast(totals), "source")
        .select(
            "source", "bucket", "n_docs",
            F.floor(F.col("n_docs") * 1e6 / F.col("source_docs"))
             .cast("bigint").alias("share_e6"))
        .orderBy("source", "bucket")
    )


def hybrid_search_rrf(documents: DataFrame,
                      terms: tuple[str, ...] = ("spark", "query", "fast"),
                      k: int = 20, rrf_k: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of the two registered retrievers
    (bm25_search and keyword_search_tfidf) — the standard hybrid-
    search combiner: score(d) = Σ_rankers 1/(rrf_k + rank_r(d)).
    RRF needs no score calibration between rankers (only ranks),
    which is exactly why production retrieval stacks use it to merge
    lexical and second-stage rankers with incomparable score scales.

    Determinism: each ranker's rank is a row_number over its own
    (score desc, doc_id) order; contributions floor to e6 integers
    before the sum; the fused order ties-break on doc_id.

    Scale shape: both parents already bound their output to ``k``
    rows, so the fusion is a full-outer join + window over ≤ 2k rows
    — plan-constant whatever the corpus; the corpus-sized work is
    the parents', unchanged."""
    def ranked(df: DataFrame, name: str) -> DataFrame:
        w = Window.orderBy(F.desc("score"), F.col("doc_id"))
        return df.select("doc_id", "score").withColumn(
            name, F.row_number().over(w)).drop("score")

    bm = ranked(bm25_search(documents, terms=terms, k=k), "rank_bm25")
    tf = ranked(keyword_search_tfidf(documents, terms=terms, k=k),
                "rank_tfidf")
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(),
        F.floor(F.lit(1_000_000) / (F.lit(rrf_k) + F.col(c)))).otherwise(0)
    fused = (
        bm.join(tf, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("rank_bm25").cast("int").alias("rank_bm25"),
            F.col("rank_tfidf").cast("int").alias("rank_tfidf"),
            (contrib("rank_bm25") + contrib("rank_tfidf"))
            .cast("bigint").alias("rrf_e6"))
    )
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number().over(
                Window.orderBy(F.desc("rrf_e6"), F.col("doc_id")))
            .cast("int"))
        .select("fused_rank", "doc_id", "rank_bm25", "rank_tfidf",
                "rrf_e6")
        .orderBy("fused_rank")
    )


def doc_keyphrases(documents: DataFrame, top_n: int = 3) -> DataFrame:
    """Per-document keyphrase extraction: the ``top_n`` non-stopword
    tokens by TF-IDF within each document — the doc-tagging primitive
    (faceting, routing, weak topic labels) next to the corpus-level
    retrieval forms (keyword_search_tfidf scores docs for GIVEN
    terms; this finds each doc's own terms).

    Same determinism treatment as the retrieval pair: the only double
    is ln(N/df) (bit-identical inputs, single call — no accumulation
    ordering), and the score is FLOORED to an e4 integer before
    ranking, with the token as tie-break, so both engines rank
    identical integers. Scale shape: token explode → (doc, token) tf
    collapse → token-grain df collapse → join back on token (SMJ at
    vocabulary scale; nothing assumes the vocabulary broadcasts) →
    per-doc window over ≤ |doc vocabulary| rows. Output is exactly
    ≤ top_n rows per doc."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    ex = (
        _spread(documents)
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
        .filter(~F.array_contains(stop_arr, F.col("w")))
    )
    tf = ex.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfc = tf.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.desc("score_e4"), F.col("w"))
    return (
        tf.join(dfc, "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_e4",
                    F.floor(F.col("tf")
                            * F.log(F.col("n") / F.col("df")) * 1e4)
                     .cast("bigint"))
        .withColumn("rank", F.row_number().over(w_doc).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "rank", F.col("w").alias("token"),
                "tf", "df", "score_e4")
        .orderBy("doc_id", "rank")
    )
