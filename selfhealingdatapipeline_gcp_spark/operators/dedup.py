"""Deduplication operators for document-scale corpora.

These are the LLM-training-data operators the build brief adds on top
of the reference's own surface (SURVEY.md §2). Designed for 100 TB:

- exact: one hash-groupBy shuffle on a 12-byte key, never on raw text.
- MinHash+LSH: shingle → signature entirely inside codegen (per-row
  array ops, no shuffle), then ONE equi-join on (band|hash) keys —
  candidate pairs are bounded by bucket collisions, never all-pairs.
- n-gram Jaccard: explode-and-count — linear in total shingles, join
  keyed on the shingle string; used as the exact verifier at small
  candidate counts (at full scale you run LSH first, then verify).
- SimHash: 32-bit signature per row in codegen; candidates bucketed
  by the top byte; hamming distance via xor/bit_count.
- embedding cosine: explicit-fold dot products (bit-identical across
  engines); all-pairs form is for modest corpora / verification — the
  scale path is IVF/LSH in similarity.py.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from selfhealingdatapipeline_gcp_spark.functions import textfn, vectorfn

_log = logging.getLogger(__name__)


def _spread(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition before compute-heavy per-row work.

    Small-file inputs (and single hot files at any scale) otherwise
    pin the whole shingle/signature computation to one task; the
    repartition cost is one shuffle of the raw rows, repaid 32× in
    the expensive stage. When ``key`` is given, hash-partition on it
    so the downstream window/agg on the same key REUSES this exchange
    (one shuffle total instead of two) — and note the shuffle moves
    RAW rows, strictly smaller than the post-explode shuffle the
    window would otherwise pay, so the keyed form is load-bearing at
    any input partitioning. The unkeyed form is gated on the input's
    partition count: a well-partitioned 100 TB input skips it."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if key:
        return df.repartition(n, key)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup by content hash, keep lowest doc_id
    (hash-groupBy; the shuffle key is md5, never the document)."""
    return (
        documents
        .select(F.col("doc_id"), F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keeper_doc_id", "n_copies",
                (F.col("n_copies") > 1).alias("had_duplicates"))
    )


def dedup_exact_normalized(documents: DataFrame) -> DataFrame:
    """Exact dedup over NORMALIZED text: lowercase, strip everything
    but [a-z0-9 ], collapse whitespace runs — the standard
    pre-hash canonicalization that catches trivial reformatting
    (case changes, punctuation edits, double spaces) byte-exact
    dedup misses, at identical cost: one hash-groupBy, the shuffle
    key a 32-char digest. Sits between dedup_exact (byte-identical)
    and the near-dup families (MinHash/winnowing) on the
    aggressiveness ladder.

    Normalization is explicit ASCII-class regex (Java and RE2 agree
    symbol-for-symbol — the pii_redact discipline)."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
    return (
        documents
        .select("doc_id", F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count(F.lit(1)).alias("n_copies"),
             (F.count(F.lit(1)) > 1).alias("had_duplicates"))
        .select("keeper_doc_id", "n_copies", "had_duplicates")
    )


def _shingle_rows(documents: DataFrame,
                  carry: tuple[str, ...] = ()) -> DataFrame:
    """Long-format 3-gram shingles: (doc_id, *carry, s), duplicates
    included — ``carry`` rides extra doc-level columns (e.g. source)
    through the explode so callers never join back to the doc table.

    Built with posexplode + windowed lead() instead of array
    expressions: higher-order array functions are interpreted
    (no whole-stage codegen), while split+explode+window+concat all
    stay inside codegen. Re-measured on Spark 4.1 (r10,
    tools/hof_shingle_probe3.py, interleaved min-of-5 at the sf1
    replica): a fused transform+md5 array build is ~4x slower than
    this form at the distinct-(doc_id,h) stage (2.2s vs 0.6s) and
    ~1.4x slower through the full pair pipeline — the per-element
    interpreted lambda costs more than the window sort it removes.
    The window shuffle is on doc_id — the same key every downstream
    agg needs (the _spread exchange serves both).
    """
    toks = (
        _spread(documents, "doc_id")
        .select("doc_id", *carry, F.posexplode(textfn.tokens("text"))
                .alias("pos", "w"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks
        .select(
            "doc_id", *carry,
            F.concat_ws(" ", F.col("w"),
                        F.lead("w", 1).over(win),
                        F.lead("w", 2).over(win)).alias("s"),
            F.lead("w", 2).over(win).alias("__w2"),
        )
        # stop at n-2 like the array form (concat_ws would silently
        # drop the missing tail tokens otherwise)
        .filter(F.col("__w2").isNotNull())
        .drop("__w2")
    )


def dedup_ngram_jaccard(documents: DataFrame,
                        threshold: float = 0.5,
                        max_df: int | None = 10_000) -> DataFrame:
    """Near-duplicate pairs by exact 3-gram Jaccard ≥ threshold.

    Distinct shingle rows → self-join on the 48-bit shingle hash →
    count common per pair. Joining on md5int instead of the raw
    shingle string shuffles 8-byte longs, not ~20-byte strings —
    less shuffle I/O and GC pressure at identical results (the
    oracle hashes identically, so even a 48-bit collision — ~1e-6
    odds at 10^5 distinct shingles — cannot diverge from it).

    Fan-out guard (VERDICT r3 #4): the self-join fans out
    quadratically in shingle document frequency — one corpus-common
    trigram ("terms of service") makes a hot key with df² pairs at
    100 TB. ``max_df`` drops shingles appearing in more than that
    many documents BEFORE the join (standard in MinHash pipelines;
    a df-ubiquitous shingle carries no near-dup signal), bounding the
    join to max_df² pairs per shingle. Jaccard is then computed over
    the df-filtered shingle universe on both sides of the ratio, so
    it stays a true Jaccard of the filtered sets. ``max_df=None``
    restores the exact unfiltered semantics.

    Pairing is bucket-grouped, not a self-join (r5): group the
    distinct (doc, shingle) rows by shingle, keep buckets whose size
    is within the df ceiling (the ceiling becomes a size filter on
    the SAME aggregation — the old broadcast-anti-join df pass is
    gone), and emit in-bucket pairs with two generators. The sf10
    scaling probe caught the self-join form at 20× on 10× data —
    both aliases re-evaluated the whole shingle subtree and the join
    probed a corpus-sized hash relation; the grouped form computes
    the shingle relation once and touches it with one exchange.
    Σ df² pair emission within the ceiling is the exact-Jaccard
    semantics itself — the ceiling is what bounds it, and
    dedup_lsh_verified remains the production path when even that is
    too much. Per-doc sizes (the Jaccard denominator over the
    df-filtered universe) come from re-aggregating the KEPT buckets,
    so df-dropped shingles leave both sides of the ratio
    consistently."""
    return (_ngram_jaccard_pairs(documents, threshold, max_df)
            .orderBy("doc_a", "doc_b"))


def _ngram_jaccard_pairs(documents: DataFrame, threshold: float,
                         max_df: int | None) -> DataFrame:
    """UNSORTED exact-Jaccard pairs — the internal relation form of
    dedup_ngram_jaccard (same rationale as _lsh_verified_pairs: the
    public orderBy is cosmetic and executes for real below a join,
    e.g. lsh_recall_report's truth side)."""
    pairs = _shingle_pair_counts(documents, max_df)
    jac = (F.col("n_common") * 1.0
           / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
    return (
        pairs
        .filter(jac >= threshold)
        .select("doc_a", "doc_b",
                (F.floor(jac * 1e6) / 1e6).alias("jaccard"))
    )


def _shingle_pair_counts(documents: DataFrame,
                         max_df: int | None) -> DataFrame:
    """Common-3-gram counts per candidate doc pair, bucket-grouped
    (no self-join): (doc_a, doc_b, n_common, n_a, n_b) where n_a/n_b
    are each doc's distinct-shingle count over the df-filtered
    universe. Shared by dedup_ngram_jaccard (symmetric Jaccard) and
    dedup_containment (asymmetric overlap); the scale/guard notes
    live on dedup_ngram_jaccard's docstring."""
    distinct_sh = (
        _shingle_rows(documents)
        .select("doc_id", textfn.md5int(F.col("s")).alias("h"))
        .dropDuplicates(["doc_id", "h"])
    )
    return _hash_pair_counts(distinct_sh, max_df)


def _hash_pair_counts(distinct_sh: DataFrame,
                      max_df: int | None) -> DataFrame:
    """Bucket-grouped common-hash counts over any distinct
    (doc_id, h) relation — the join-free pair machinery shared by the
    shingle metrics and the winnowing fingerprints."""
    kept = distinct_sh.groupBy("h").agg(
        F.collect_list("doc_id").alias("ids"))
    if max_df is not None:
        kept = kept.filter(F.size("ids") <= max_df)
    # per-doc filtered sizes computed IN the pipeline (window on the
    # exploded kept rows) and carried inside the bucket structs — no
    # denominator joins at all. An earlier join-back form let the
    # static planner broadcast-BUILD the candidate-pair relation
    # (post-agg, no stats → wildly under-estimated): a >1 GiB driver
    # collect that tripped maxResultSize at sf10. No joins, no
    # broadcast hazard at any scale.
    exn = (
        kept.select("h", F.explode("ids").alias("doc_id"))
        .withColumn("n",
                    F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    buckets = (
        exn.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n")))
              .alias("mem"))
        .filter(F.size("mem") >= 2)
    )
    pairs = (
        buckets
        .select(F.explode("mem").alias("a"), "mem")
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("a.n").alias("n_a"), "mem")
        .select("doc_a", "n_a",
                F.explode(F.filter(
                    "mem", lambda m: m["doc_id"] > F.col("doc_a")))
                 .alias("b"))
        .groupBy("doc_a", F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"),
             F.max("n_a").alias("n_a"),
             F.max(F.col("b.n")).alias("n_b"))
    )
    return pairs


def dedup_containment(documents: DataFrame,
                      threshold: float = 0.7,
                      max_df: int | None = 10_000) -> DataFrame:
    """Asymmetric near-duplicate pairs by 3-gram CONTAINMENT:
    |A∩B| / min(|A|, |B|) ≥ threshold.

    Jaccard misses the quote/boilerplate-inclusion case that matters
    in web corpora: a short document wholly embedded in a much longer
    one has tiny Jaccard (the union is dominated by the long doc) but
    containment ≈ 1. This is the standard companion metric in
    corpus-dedup pipelines (containment a.k.a. overlap coefficient).

    Same plan shape and df-ceiling guard as dedup_ngram_jaccard —
    one bucket-grouped pair emission, no self-join, no broadcast
    hazard (see that docstring for the scale analysis). Output marks
    which doc is the contained (smaller shingle-set) side, ties to
    the lower doc_id."""
    pairs = _shingle_pair_counts(documents, max_df)
    cont = F.col("n_common") * 1.0 / F.least("n_a", "n_b")
    return (
        pairs
        .filter(cont >= threshold)
        .select(
            "doc_a", "doc_b",
            (F.floor(cont * 1e6) / 1e6).alias("containment"),
            F.when(F.col("n_a") <= F.col("n_b"), F.col("doc_a"))
             .otherwise(F.col("doc_b")).alias("contained_doc"),
        )
        .orderBy("doc_a", "doc_b")
    )


def cross_source_overlap(documents: DataFrame) -> DataFrame:
    """3-gram vocabulary overlap between source PAIRS — the
    crawl-vs-crawl diagnostic a corpus merge reads before mixing:
    how much of dump B's n-gram vocabulary is already in dump A
    decides dedup order and whether B adds signal at any weight.

    Plan: one groupBy on the 48-bit shingle hash builds the per-hash
    source set (the shuffle carries (hash, source), never text); the
    buckets emit source pairs with the same two-generator pattern as
    the shingle dedups (no self-join; a hash shared by k sources
    emits C(k,2) ≤ C(|sources|,2) pairs — bounded by the source
    count, not the corpus). Per-source distinct totals re-aggregate
    the SAME bucket relation (reused exchange) and join back
    broadcast (|sources| rows). Output per pair: shared distinct
    shingles, each side's distinct total, Jaccard and containment
    shares — all counts integer, shares floor-e6."""
    sh = (
        _shingle_rows(documents, carry=("source",))
        .select("source", textfn.md5int(F.col("s")).alias("h"))
    )
    buckets = sh.groupBy("h").agg(
        F.sort_array(F.collect_set("source")).alias("srcs"))
    per_src = (
        buckets.select(F.explode("srcs").alias("source"))
        .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    )
    shared = (
        buckets
        .filter(F.size("srcs") >= 2)
        .select(F.explode("srcs").alias("src_a"), "srcs")
        .select("src_a",
                F.explode(F.filter(
                    "srcs", lambda s: s > F.col("src_a"))).alias("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    jac = (F.col("shared_shingles") * 1.0
           / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles")))
    cont = F.col("shared_shingles") * 1.0 / F.least("n_a", "n_b")
    return (
        shared
        .join(F.broadcast(per_src.withColumnRenamed("source", "src_a")
                          .withColumnRenamed("n", "n_a")), "src_a")
        .join(F.broadcast(per_src.withColumnRenamed("source", "src_b")
                          .withColumnRenamed("n", "n_b")), "src_b")
        .select("src_a", "src_b", "shared_shingles", "n_a", "n_b",
                (F.floor(jac * 1e6) / 1e6).alias("overlap_jaccard"),
                (F.floor(cont * 1e6) / 1e6).alias("containment"))
        .orderBy("src_a", "src_b")
    )


N_PERM = 32


def minhash_signatures(documents: DataFrame,
                       shingles: DataFrame | None = None) -> DataFrame:
    """(doc_id, mh1..mh32) MinHash signatures: shingle rows → scalar
    hash columns → 32 min() aggregates — everything stays in
    whole-stage codegen (array-fold HOFs are interpreted), and the
    groupBy gets map-side partial aggregation, so the signature
    shuffle carries ~32 longs per doc. MinHash is
    duplicate-insensitive (min over a multiset), so no distinct. The
    single definition of the permutation family — band_keys and
    minhash_estimate_report both consume it, so they cannot drift."""
    if shingles is None:
        shingles = _shingle_rows(documents)
    ex = shingles.select(
        "doc_id", textfn.md5int(F.col("s")).alias("x"))
    hashes = [
        (((F.lit(17) + j * 13) * F.col("x") + j * 7919) % textfn.HASH_MOD)
        .alias(f"h{j}") for j in range(1, N_PERM + 1)
    ]
    return (
        ex.select("doc_id", *hashes)
        .groupBy("doc_id")
        .agg(*[F.min(f"h{j}").alias(f"mh{j}")
               for j in range(1, N_PERM + 1)])
    )


def winnow_fingerprints(documents: DataFrame, w: int = 8,
                        window_k: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    algorithm): hash every ``w``-token gram, then select a gram iff
    its hash is the minimum of its trailing ``window_k`` grams —
    content-defined selection, so two documents sharing a verbatim
    run of ≥ w + 2·window_k − 2 tokens (14 with the defaults) are
    GUARANTEED to select at least one identical fingerprint, at
    ~1/window_k the storage of full gram hashing.

    Same codegen discipline as _shingle_rows: posexplode + lead()
    window per doc (both shuffles on doc_id), min() over a trailing
    row frame — no interpreted array lambdas. Output: distinct
    (doc_id, h)."""
    toks = (
        _spread(documents, "doc_id")
        .select("doc_id", F.posexplode(textfn.tokens("text"))
                .alias("pos", "w0"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("w0")] + [F.lead("w0", i).over(win)
                             for i in range(1, w)]
    grams = (
        toks
        .select("doc_id", "pos",
                F.concat_ws(" ", *leads).alias("g"),
                F.lead("w0", w - 1).over(win).alias("__tail"))
        .filter(F.col("__tail").isNotNull())
        .select("doc_id", "pos", textfn.md5int(F.col("g")).alias("h"))
    )
    sel_win = (Window.partitionBy("doc_id").orderBy("pos")
               .rowsBetween(-(window_k - 1), 0))
    return (
        grams
        .withColumn("__mn", F.min("h").over(sel_win))
        .filter(F.col("h") == F.col("__mn"))
        .select("doc_id", "h")
        .dropDuplicates(["doc_id", "h"])
    )


def verbatim_overlap_pairs(documents: DataFrame, w: int = 8,
                           window_k: int = 4, min_shared: int = 2,
                           max_df: int | None = 10_000) -> DataFrame:
    """Document pairs sharing VERBATIM token runs — the quote /
    copy-paste / licence-block detector 3-gram Jaccard underweights
    (a 30-token verbatim quote inside two otherwise-different pages
    is a handful of 3-grams but a guaranteed winnowing collision).
    Pairs sharing ≥ ``min_shared`` selected fingerprints emit with
    the shared count and the overlap share of the smaller doc's
    fingerprint set.

    Same scale shape as dedup_ngram_jaccard: bucket-grouped pair
    emission over the (df-ceilinged) fingerprint buckets — no
    self-join, no broadcast; winnowing keeps the fingerprint relation
    ~window_k× smaller than full gram hashing."""
    fps = winnow_fingerprints(documents, w, window_k)
    pairs = _hash_pair_counts(fps, max_df)
    share = F.col("n_common") * 1.0 / F.least("n_a", "n_b")
    return (
        pairs
        .filter(F.col("n_common") >= min_shared)
        .select("doc_a", "doc_b",
                F.col("n_common").alias("n_shared_fp"),
                (F.floor(share * 1e6) / 1e6).alias("overlap_share"))
        .orderBy("doc_a", "doc_b")
    )


def band_keys(documents: DataFrame,
              shingles: DataFrame | None = None) -> DataFrame:
    """(doc_id, bkey) LSH band keys over the minhash_signatures
    relation. Shared by dedup_minhash_lsh (corpus self-dedup) and
    dedup_incremental (new-batch vs corpus)."""
    sig = F.array(*[F.col(f"mh{j}") for j in range(1, N_PERM + 1)])
    return (
        minhash_signatures(documents, shingles)
        .select("doc_id",
                F.explode(textfn.lsh_band_keys(sig)).alias("bkey"))
    )


def dedup_minhash_lsh(documents: DataFrame,
                      shingles: DataFrame | None = None,
                      max_bucket_docs: int = 10_000) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4 rows) candidate pairs.

    Signature computation is per-row array math inside whole-stage
    codegen; the only shuffle is the groupBy on band keys. Banding
    at b=8/r=4 targets Jaccard ≳ 0.5 (P(candidate) = 1-(1-s⁴)⁸).

    Pair generation is bucket-grouped, NOT a self-join (r5): collect
    each band bucket's doc ids and emit in-bucket pairs with two
    generators. The sf1 scaling run caught the self-join form at 16×
    on 10× data — the join re-evaluated the entire shingle→signature
    subtree on BOTH sides and broadcast-built a corpus-sized relation
    on the driver; the grouped form computes signatures once, touches
    the corpus with ONE exchange, and ships each bucket as one row.
    A bucket above ``max_bucket_docs`` fails loudly (raise_error)
    before its quadratic pair emission — same discipline as
    dedup_simhash; near-identical boilerplate floods are exactly how
    that fires at 100 TB.

    ``shingles`` lets a caller (dedup_lsh_verified) feed a shared —
    typically persisted — shingle relation so the explode, the most
    expensive stage of the corpus path, runs exactly once."""
    sigs = band_keys(documents, shingles)
    overflow_msg = F.concat(
        F.lit("dedup_minhash_lsh: band bucket holds "),
        F.size("ids").cast("string"),
        F.lit(f" docs (> max_bucket_docs={max_bucket_docs}); in-bucket"
              " pairing would be quadratic — dedup first with"
              " dedup_exact, or raise max_bucket_docs"))
    buckets = (
        sigs.groupBy("bkey")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .filter(F.when(F.size("ids") > max_bucket_docs,
                       F.raise_error(overflow_msg))
                 .otherwise(F.lit(True)))
    )
    return (
        buckets
        .select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a",
                F.explode(F.filter("ids", lambda x: x > F.col("doc_a")))
                 .alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def dedup_incremental(new_docs: DataFrame, corpus: DataFrame,
                      max_bucket_docs: int = 10_000) -> DataFrame:
    """Incremental-ingest near-dup check: which NEW documents LSH-
    collide with the EXISTING corpus — the steady-state production
    dedup shape (a pipeline rarely re-dedups the whole corpus; it
    checks each incoming batch against what it already holds, the
    same asymmetry as contamination_check for eval sets).

    Scale shape: the corpus side groups its band keys into bucket
    arrays ONCE (one exchange, cap-guarded like every bucket pairing
    here — and at steady state a deployment persists that relation
    per corpus version via the public band_keys), then the new
    batch's keys equi-join the buckets — AQE broadcasts the batch
    side when it is genuinely small, which is the whole point of
    incremental ingest. Output: distinct (new_doc_id,
    corpus_doc_id) candidate pairs; verify with dedup_embedding's
    candidates mode or exact Jaccard as needed."""
    nk = band_keys(new_docs).select(
        F.col("doc_id").alias("new_doc_id"), "bkey")
    overflow_msg = F.concat(
        F.lit("dedup_incremental: corpus band bucket holds "),
        F.size("ids").cast("string"),
        F.lit(f" docs (> max_bucket_docs={max_bucket_docs});"
              " dedup_exact the corpus first or raise the cap"))
    cb = (
        band_keys(corpus)
        .groupBy("bkey")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.when(F.size("ids") > max_bucket_docs,
                       F.raise_error(overflow_msg))
                 .otherwise(F.lit(True)))
    )
    return (
        nk.join(cb, "bkey")
        .select("new_doc_id", F.explode("ids").alias("corpus_doc_id"))
        .distinct()
        .orderBy("new_doc_id", "corpus_doc_id")
    )


def dedup_simhash(documents: DataFrame,
                  bucket_shift_bits: int = 24,
                  max_hamming: int = 6,
                  max_bucket_rows: int = 10_000,
                  force_single_table: bool = False) -> DataFrame:
    """SimHash(32-bit) near-dup candidates: bucket on the top byte,
    keep in-bucket pairs with hamming ≤ max_hamming (xor+bit_count).

    Scale caveat: corpora with homogeneous token distributions skew
    into few buckets (in-bucket pairing is quadratic). The production
    shape is multi-table SimHash (bucket on several rotated bit
    windows); at 32 bits this single-table form is the verifier.

    Scale auto-fallback (VERDICT r9 #2, same discipline as
    er_name_pairs): before pairing, the measured max bucket occupancy
    — one cheap aggregate over the signature relation — is checked;
    above ``max_bucket_rows`` (realistic corpora DO concentrate: the
    generated-mode fidelity probe put 11,861 rows in one top-byte
    bucket) the operator routes to the 4-window
    ``dedup_simhash_multitable`` split with a loud warning, emitting
    the SAME output schema with ``bucket = -1`` (pairs in the
    multitable route need not share a top-byte bucket, so no honest
    bucket id exists). The trade, stated plainly: the 16-bit windows
    can miss a pair that agrees only on its top 8 bits, and can admit
    pairs the top-byte form never sees — recall shifts toward the
    rotation windows, which is exactly the production multi-table
    behavior. ``force_single_table=True`` skips the occupancy probe
    and restores the in-plan loud raise.

    Belt-and-braces: the normal (non-overflow) path KEEPS the r3 #5
    in-plan raise_error guard (bucket-size window over the same
    partition key as the join, exchange reused) — if the data grew
    between the probe and execution, the raise still fires before a
    quadratic fan-out."""
    # token explode → scalar hash → 32 conditional-sum aggregates
    # (codegen + map-side partial agg), then the signature assembles
    # from the 32 sums as a plain scalar expression.
    ex = (
        _spread(documents, "doc_id")
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
        .select("doc_id", textfn.md5int(F.col("w")).alias("x"))
    )
    bit_sums = [
        F.sum((F.floor(F.col("x") / F.lit(float(2 ** k))).cast("bigint") % 2)
              * 2 - 1).alias(f"b{k}")
        for k in range(32)
    ]
    simhash = sum(
        (F.when(F.col(f"b{k}") > 0, F.lit(2 ** k)).otherwise(F.lit(0))
         for k in range(32)),
        start=F.lit(0),
    ).cast("bigint")
    sh = (
        ex.groupBy("doc_id").agg(*bit_sums)
        .select("doc_id", simhash.alias("simhash"))
        .withColumn(
            "bucket",
            F.floor(F.col("simhash") / F.pow(F.lit(2.0), F.lit(bucket_shift_bits)))
             .cast("bigint"))
    )
    if max_bucket_rows is not None and not force_single_table:
        occupancy = (sh.groupBy("bucket")
                     .agg(F.count(F.lit(1)).alias("sz"))
                     .agg(F.max("sz")).first()[0]) or 0
        if occupancy > max_bucket_rows:
            _log.warning(
                "dedup_simhash: largest top-byte bucket holds %d rows "
                "(> max_bucket_rows=%d) — auto-routing to the 4-window "
                "dedup_simhash_multitable split (bucket column = -1; "
                "pass force_single_table=True for the strict top-byte "
                "form with its loud in-plan raise)",
                occupancy, max_bucket_rows)
            return (
                dedup_simhash_multitable(documents,
                                         max_hamming=max_hamming)
                .select("doc_a", "doc_b",
                        F.lit(-1).cast("bigint").alias("bucket"),
                        "hamming")
                .orderBy("doc_a", "doc_b")
            )
    if max_bucket_rows is not None:
        bucket_win = Window.partitionBy("bucket")
        overflow_msg = F.concat(
            F.lit("dedup_simhash: bucket "), F.col("bucket").cast("string"),
            F.lit(" holds "), F.col("__bn").cast("string"),
            F.lit(f" rows (> max_bucket_rows={max_bucket_rows}); in-bucket"
                  " pairing would be quadratic — use"
                  " dedup_simhash_multitable or raise max_bucket_rows"))
        sh = (
            sh.withColumn("__bn", F.count(F.lit(1)).over(bucket_win))
            .filter(F.when(F.col("__bn") > max_bucket_rows,
                           F.raise_error(overflow_msg))
                     .otherwise(F.lit(True)))
            .drop("__bn")
        )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.bucket").alias("bucket"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
             .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def dedup_embedding(embeddings: DataFrame,
                    threshold: float = 0.35,
                    candidates: DataFrame | None = None,
                    allow_all_pairs: bool = False,
                    n_centroids: int | str = "auto",
                    max_all_pairs_rows: int = 100_000,
                    target_cell_rows: int = 4_000,
                    force_all_pairs: bool = False) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    Three modes, safest first:
    - ``candidates`` given: score ONLY those (vec_a, vec_b) pairs —
      feed it LSH buckets / IVF probes / any bounded generator.
    - default: derive candidates from IVF cell co-membership
      (deterministic fixed-K centroids, same K-row grid as
      ann_ivf_topk — the broadcast never grows with the corpus) —
      the pair join is an equi-join on cell id, never all-pairs.
    - ``allow_all_pairs=True``: exact all-pairs verifier — explicit
      escape for modest corpora; at 100 TB this is a corpus² join and
      deliberately NOT the default (VERDICT r1 #5). Guarded: above
      ``max_all_pairs_rows`` (the count is one cheap scan) the escape
      AUTO-ROUTES to the cell-bounded default with a loud log line
      (VERDICT r7 #2) — the exact verifier degrades to the bounded
      approximate form instead of refusing to run; pass
      ``force_all_pairs=True`` to keep the old hard raise when
      exactness is a correctness requirement and silent degradation
      would be worse than failure."""
    from selfhealingdatapipeline_gcp_spark.operators import similarity

    n_rows = None
    if candidates is None and allow_all_pairs:
        n_rows = embeddings.count()
        if n_rows > max_all_pairs_rows:
            if force_all_pairs:
                raise ValueError(
                    f"all-pairs dedup_embedding over {n_rows} vectors "
                    f"is a corpus-squared join (limit "
                    f"{max_all_pairs_rows}); use the cell-bounded "
                    "default, pass bounded candidates, or raise "
                    "max_all_pairs_rows explicitly")
            _log.warning(
                "dedup_embedding: all-pairs escape over %d vectors "
                "exceeds max_all_pairs_rows=%d — auto-routing to the "
                "cell-bounded form (recall bounded by cell "
                "co-membership; pass force_all_pairs=True to make "
                "this a hard error instead)", n_rows,
                max_all_pairs_rows)
            allow_all_pairs = False
    v = vectorfn.to_double(F.col("embedding"))
    n = _spread(embeddings).select(
        "vec_id", "label", v.alias("v"), vectorfn.norm(v).alias("nrm"))
    if candidates is None and not allow_all_pairs:
        # Cell-bounded default, fully Arrow-vectorized (VERDICT r4
        # #3). Stage 1: numpy per-dim centroid assignment inside
        # mapInPandas (similarity.assign_cells_arrow) with v/nrm/label
        # passed through. Stage 2: ONE shuffle on cent_id, then each
        # cell scores its own pairs in numpy — the Gram matrix is
        # accumulated dim-by-dim (G += outer(V[:,d], V[:,d])), the
        # exact left-fold IEEE op order of vectorfn.dot, so scores
        # are bit-identical to the SQL oracle. Every vector crosses
        # the wire ONCE; the old candidates equi-join shipped both
        # 64-dim vectors per candidate PAIR (quadratic Arrow/shuffle
        # volume in cell size). round(.,6) stays Spark-side so
        # engine rounding semantics never enter Python.
        #
        # Scale contract: in-cell scoring is quadratic in cell size
        # BY DESIGN (that is the cell-bounded dedup algorithm);
        # max_cell_rows fails loudly before an O(m^2) cell runs —
        # the fix at scale is more centroids, not a bigger buffer
        # (same loud-guard discipline as the simhash bucket cap).
        # centroid pick from the raw table (norm fold only on the K
        # picked rows); corpus norms come out of the Arrow assignment
        # pass itself — no interpreted fold ever touches the corpus.
        # "auto" grows the grid with the corpus (cells stay near
        # target_cell_rows; quadratic in-cell work demands it) and
        # resolves to exactly 16 below 16·target rows, so the
        # 16-pinning DuckDB oracle stays valid at every oracle SF.
        # grid capped at 4096 (cell assignment is O(K) per row); past
        # the cap, arriving cells exceed target and the in-task
        # subdivision below carries them — the two-level composition
        # (see knn_graph_cells' docstring for the full analysis)
        if n_centroids == "auto":
            import math
            # the auto-routed escape already counted the corpus for
            # its guard — don't run a second full-scan job for the
            # same number
            if n_rows is None:
                n_rows = embeddings.count()
            n_centroids = max(16, min(4_096,
                                      math.ceil(n_rows
                                                / target_cell_rows)))
        cents = similarity.fixed_k_centroids_raw(embeddings, n_centroids)
        assigned = similarity.assign_cells_arrow(
            n.drop("nrm"), cents, passthrough=True, compute_norm=True)
        max_cell_rows = 500_000

        def score_cell(pdf):
            import numpy as np
            import pandas as pd
            m = len(pdf)
            empty = pd.DataFrame({
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine_raw": pd.Series([], dtype="float64"),
                "same_label": pd.Series([], dtype="bool")})
            if m < 2:
                return empty
            if m > max_cell_rows:
                raise ValueError(
                    f"dedup_embedding cell holds {m} vectors "
                    f"(cap {max_cell_rows}): the cap bounds one "
                    "task's arrival memory (oversized cells subdivide "
                    "in-task below it) — raise n_centroids so cells "
                    "shrink")
            pdf = pdf.sort_values("vec_id")
            all_V = np.array([list(v) for v in pdf["v"]],
                             dtype=np.float64)
            all_nr = pdf["nrm"].to_numpy(dtype=np.float64)
            all_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            all_labels = pdf["label"].to_numpy()

            def pairs_subset(sel):
                ids, V = all_ids[sel], all_V[sel]
                nr, labels = all_nr[sel], all_labels[sel]
                ms = len(ids)
                if ms < 2:
                    return empty
                # in-place accumulation (same adds, same order): the
                # `G = G + outer(...)` form allocated two fresh m×m
                # temporaries per dim — pure memory-bandwidth burn on
                # large cells
                G = np.zeros((ms, ms), dtype=np.float64)
                tmp = np.empty((ms, ms), dtype=np.float64)
                for d in range(V.shape[1]):
                    col = V[:, d]
                    np.outer(col, col, out=tmp)
                    G += tmp
                cos = G / np.outer(nr, nr)
                ia, ib = np.triu_indices(ms, k=1)
                keep = cos[ia, ib] >= threshold
                ia, ib = ia[keep], ib[keep]
                return pd.DataFrame({
                    "vec_a": ids[ia],
                    "vec_b": ids[ib],
                    "cosine_raw": cos[ia, ib],
                    "same_label": labels[ia] == labels[ib],
                })

            # hot-cell subdivision (similarity.subdivide_oversized_cell):
            # past 2·target the O(m²) Gram is the memory bound, so the
            # cell splits into ~target-row sub-cells in-task and pairs
            # are emitted per sub-cell. Cross-sub pairs are forgone —
            # the documented recall trade on pathologically hot cells;
            # near-identical blobs that would create them belong to
            # dedup_exact, which should run first.
            if m > 2 * target_cell_rows:
                sub = similarity.subdivide_oversized_cell(
                    all_ids, all_V, all_nr, target_cell_rows)
                frames = [pairs_subset(sub == s) for s in np.unique(sub)]
                frames = [f for f in frames if len(f)]
                return (pd.concat(frames, ignore_index=True)
                        if frames else empty)
            return pairs_subset(np.ones(m, dtype=bool))

        return (
            assigned.groupBy("cent_id")
            .applyInPandas(score_cell,
                           "vec_a bigint, vec_b bigint, "
                           "cosine_raw double, same_label boolean")
            .select("vec_a", "vec_b",
                    F.round(F.col("cosine_raw"), 6).alias("cosine"),
                    "same_label")
            .orderBy("vec_a", "vec_b")
        )
    if candidates is not None:
        av = n.select(F.col("vec_id").alias("vec_a"),
                      F.col("v").alias("va"), F.col("nrm").alias("na"),
                      F.col("label").alias("la"))
        bv = n.select(F.col("vec_id").alias("vec_b"),
                      F.col("v").alias("vb"), F.col("nrm").alias("nb"),
                      F.col("label").alias("lb"))
        cos = vectorfn.cosine(F.col("va"), F.col("vb"),
                              F.col("na"), F.col("nb"))
        return (
            candidates.join(av, "vec_a").join(bv, "vec_b")
            .filter(cos >= threshold)
            .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"),
                    (F.col("la") == F.col("lb")).alias("same_label"))
            .orderBy("vec_a", "vec_b")
        )
    # All-pairs escape, blocked-Arrow form (r5): the inequality
    # self-join evaluated the interpreted cosine fold per PAIR —
    # measured 124 s on just 20k vectors at sf1. Blocked Gram instead:
    # vectors hash into n_blocks row blocks, each of the
    # n_blocks·(n_blocks+1)/2 block PAIRS cogroups into one Arrow
    # task that matmuls its two blocks (accumulated dim-ascending —
    # vectorfn.dot's left-fold IEEE order, so scores stay bit-exact
    # against the SQL oracle). Shuffle volume = corpus × n_blocks
    # (linear), compute = the same O(n²·d) the escape explicitly
    # opted into, now vectorized. Same guard, same results.
    n_blocks = 8
    base = n.select(
        "vec_id", "v", "label",
        F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int").alias("__b"))
    grid = F.explode(F.array(*[F.lit(j) for j in range(n_blocks)]))
    left = (base.select("vec_id", "v", "label",
                        F.col("__b").alias("bi"), grid.alias("bj"))
            .filter(F.col("bj") >= F.col("bi")))
    # fresh aliases on the right: a self-cogroup whose sides share
    # attribute ids gets its right side pruned down to the grouping
    # keys by the optimizer (observed: pb arrives with only bi/bj) —
    # distinct names force distinct expression ids
    right = (base.select(F.col("vec_id").alias("r_vec_id"),
                         F.col("v").alias("r_v"),
                         F.col("label").alias("r_label"),
                         grid.alias("bi"), F.col("__b").alias("bj"))
             .filter(F.col("bj") >= F.col("bi")))

    def score_blocks(key, pa, pb):
        import numpy as np
        import pandas as pd
        empty = pd.DataFrame({
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "cosine_raw": pd.Series([], dtype="float64"),
            "same_label": pd.Series([], dtype="bool")})
        if not len(pa) or not len(pb):
            return empty
        bi, bj = key
        pa = pa.sort_values("vec_id")
        pb = pb.sort_values("r_vec_id")
        VA = np.array([list(v) for v in pa["v"]], dtype=np.float64)
        VB = np.array([list(v) for v in pb["r_v"]], dtype=np.float64)
        dim = VA.shape[1]
        sqa = np.zeros(len(pa)); sqb = np.zeros(len(pb))
        G = np.zeros((len(pa), len(pb)), dtype=np.float64)
        tmp = np.empty((len(pa), len(pb)), dtype=np.float64)
        for d in range(dim):
            ca, cb = VA[:, d], VB[:, d]
            sqa = sqa + ca * ca
            sqb = sqb + cb * cb
            np.outer(ca, cb, out=tmp)
            G += tmp
        cos = G / np.outer(np.sqrt(sqa), np.sqrt(sqb))
        ia, ib = np.nonzero(cos >= threshold)
        ids_a = pa["vec_id"].to_numpy(dtype=np.int64)[ia]
        ids_b = pb["r_vec_id"].to_numpy(dtype=np.int64)[ib]
        la = pa["label"].to_numpy()[ia]
        lb = pb["r_label"].to_numpy()[ib]
        c = cos[ia, ib]
        if bi == bj:
            keep = ids_a < ids_b
            va, vb_ = ids_a[keep], ids_b[keep]
            la, lb, c = la[keep], lb[keep], c[keep]
        else:
            # disjoint blocks: every cross pair lands here exactly
            # once; normalize to (min, max)
            va = np.minimum(ids_a, ids_b)
            vb_ = np.maximum(ids_a, ids_b)
        return pd.DataFrame({
            "vec_a": pd.Series(va, dtype="int64"),
            "vec_b": pd.Series(vb_, dtype="int64"),
            "cosine_raw": pd.Series(c, dtype="float64"),
            "same_label": pd.Series(la == lb, dtype="bool")})

    return (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(score_blocks,
                       "vec_a bigint, vec_b bigint, "
                       "cosine_raw double, same_label boolean")
        .select("vec_a", "vec_b",
                F.round(F.col("cosine_raw"), 6).alias("cosine"),
                "same_label")
        .orderBy("vec_a", "vec_b")
    )


def _lsh_verified_pairs(documents: DataFrame,
                        threshold: float = 0.5) -> DataFrame:
    """UNSORTED verified near-dup pairs — the internal edge/pair form
    of dedup_lsh_verified, for consumers that treat the output as a
    relation (CC edge lists, recall/precision joins, bucket sweeps).
    The public query's cosmetic orderBy is NOT free below those
    consumers: EliminateSorts only prunes a sort sitting directly
    under an aggregate, so a Generate/join/eager-checkpoint in
    between executes the rangepartitioning Exchange + global Sort of
    the whole pair relation for nothing (seen live in
    dedup_threshold_sweep's doc-grain branch and in
    component_labels' eager edge checkpoint, r10 final plans)."""
    sh = _shingle_rows(documents)
    cand = dedup_minhash_lsh(documents, shingles=sh)
    sets_ = sh.groupBy("doc_id").agg(F.collect_set("s").alias("ss"))
    a = sets_.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("sa"))
    b = sets_.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("sb"))
    j = (
        cand.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b",
                F.size(F.array_intersect("sa", "sb")).alias("n_common"),
                F.size("sa").alias("n_a"), F.size("sb").alias("n_b"))
    )
    jac = F.col("n_common") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        j.filter(jac >= threshold)
        .select("doc_a", "doc_b",
                (F.floor(jac * 1e6) / 1e6).alias("jaccard"))
    )


def dedup_lsh_verified(documents: DataFrame,
                       threshold: float = 0.5) -> DataFrame:
    """The production near-dup composition: MinHash-LSH generates
    candidates, exact Jaccard verifies ONLY those candidates.

    At 100 TB this is the whole point of LSH — the exact-verify join
    fans out per candidate pair, never across the corpus. Output =
    verified pairs with their exact Jaccard.

    One SHARED shingle subtree feeds both the signature and verify
    sides: identical plan subtrees collapse into a ReusedExchange, so
    the shingle explode's map work runs once (measured: an explicit
    persist is SLOWER than exchange reuse here — the memory-store
    round-trip costs more than the post-exchange recompute). The
    verify is per-doc sorted shingle SETS + array_intersect: one
    groupBy on the already-doc_id-partitioned rows, then each LSH
    candidate pair joins to exactly two arrays — O(|a|+|b|) per pair,
    rows shuffled = pairs, not pair×shingle fan-out. Caveat: a
    pathological mega-document makes a mega-array; the long-format
    join handles that better, but LSH shingle sets are doc-length
    bounded in practice."""
    return (_lsh_verified_pairs(documents, threshold)
            .orderBy("doc_a", "doc_b"))


def minhash_estimate_report(documents: DataFrame) -> DataFrame:
    """Sketch-accuracy audit: MinHash-ESTIMATED Jaccard (share of
    agreeing signature components) vs EXACT Jaccard over the LSH
    candidate pairs — the number that justifies trusting 32
    permutations at 100 TB, next to lsh_precision_report /
    lsh_recall_report (which audit the banding; this audits the
    sketch itself). Theory: per-component agreement probability IS
    the Jaccard, so the estimator is unbiased with σ = √(J(1-J)/32)
    ≈ 0.09 — a drifting mean or fat error tail means the hash family
    is broken for this corpus.

    Everything integer: est_e6 = agreements·31250 (1e6/32 exactly),
    exact_e6 = floor(n_common·1e6/n_union); one row out
    (n_pairs, mean/max abs error, signed mean = bias). Pairs come
    from the bounded LSH pipeline; signatures join per-pair (two
    32-long rows), never corpus×corpus."""
    sh = _shingle_rows(documents)
    cand = dedup_minhash_lsh(documents, shingles=sh)
    sigs = minhash_signatures(documents, sh)
    a = sigs.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"mh{j}").alias(f"a{j}")
                      for j in range(1, N_PERM + 1)])
    b = sigs.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"mh{j}").alias(f"b{j}")
                      for j in range(1, N_PERM + 1)])
    agree = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("bigint")
        for j in range(1, N_PERM + 1))
    sets_ = sh.groupBy("doc_id").agg(F.collect_set("s").alias("ss"))
    sa = sets_.select(F.col("doc_id").alias("doc_a"),
                      F.col("ss").alias("sa"))
    sb = sets_.select(F.col("doc_id").alias("doc_b"),
                      F.col("ss").alias("sb"))
    per_pair = (
        cand.join(a, "doc_a").join(b, "doc_b")
        .join(sa, "doc_a").join(sb, "doc_b")
        .select(
            (agree * F.lit(31250)).alias("est_e6"),
            F.floor(F.size(F.array_intersect("sa", "sb")) * 1e6
                    / (F.size("sa") + F.size("sb")
                       - F.size(F.array_intersect("sa", "sb"))))
             .cast("bigint").alias("exact_e6"))
        .select((F.col("est_e6") - F.col("exact_e6")).alias("err"))
    )
    return per_pair.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.floor(F.sum(F.abs(F.col("err"))) / F.count(F.lit(1)))
         .cast("bigint").alias("mean_abs_err_e6"),
        F.max(F.abs(F.col("err"))).alias("max_abs_err_e6"),
        F.floor(F.sum("err") / F.count(F.lit(1)))
         .cast("bigint").alias("mean_err_e6"),
    )


def _component_labels_driver(edges: DataFrame,
                             id_type: "T.DataType") -> DataFrame:
    """Exact min-label connected components via driver-side
    union-find over an ALREADY-CHECKPOINTED, cap-checked edge
    relation — the bounded-small-state leg of component_labels'
    hybrid execution (same result contract: one (doc_id, label) row
    per node appearing in edges, label = min reachable doc_id).

    Path compression + union-by-root-min keeps this O(E α(E)); at
    the 2M-edge cap that is well under a second of driver CPU, vs
    ~3 Spark jobs per pointer-doubling round. The collect moves
    16 bytes/edge once — strictly less traffic than a single round's
    shuffle of the same relation."""
    pdf = edges.toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["doc_a"].tolist(), pdf["doc_b"].tolist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller: every root is
            # then its component's min id seen so far
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    import pandas as pd

    schema = T.StructType([T.StructField("doc_id", id_type, True),
                           T.StructField("label", id_type, True)])
    if not parent:
        return edges.sparkSession.createDataFrame([], schema)
    out = pd.DataFrame({"doc_id": list(parent),
                        "label": [find(n) for n in parent]})
    return edges.sparkSession.createDataFrame(out, schema)


def component_labels(edges: DataFrame,
                     max_iterations: int = 25) -> DataFrame:
    """doc_id → connected-component label (the MIN reachable doc_id)
    over an undirected (doc_a, doc_b) edge relation — the shared
    clustering core of dedup_clusters, dedup_drop_list, and
    leakage_safe_split. Only nodes that appear in ``edges`` get a
    row; singletons are the caller's concern.

    Iterative (non-SQL-expressible): each round (a) joins current
    labels across candidate edges and takes the neighbor min, then
    (b) shortcuts label := label(label) — pointer doubling, so the
    min label hops 2^round edges per round and a DIAMETER-d chain
    (serial boilerplate dedup, the pathological shape for plain
    propagation) converges in O(log d) rounds, not O(d). Each
    iteration is two bounded shuffles on doc_id; the edge set comes
    from LSH so it is bounded. The convergence check is one monotone
    Σlabel aggregate per round over the checkpointed labels (labels
    only decrease, so equal consecutive sums ⟺ fixed point — no
    old-vs-new join needed). If the loop exhausts
    ``max_iterations`` without converging it raises loudly instead
    of silently emitting partial components (VERDICT r4 #8).

    The cap is 25 (2^25 ≈ 33M-hop coverage): the loop breaks at the
    fixed point, so unused headroom is FREE — only graphs that truly
    need the rounds pay for them. 15 (32k hops) proved too low on
    GENERATED sf1 embeddings (r10): convex-mixture vectors chain
    template→donor into long thin near-dup paths, a realistic shape
    ciphered replicas never produce.

    Guard asymmetry note (VERDICT r10 #6): below the
    ``SPARK_GRAFT_CC_DRIVER_EDGE_CAP`` edge count the driver-side
    union-find fast path is exact and always converges by
    construction, so the ``max_iterations`` non-convergence raise is
    unreachable on that leg; the distributed loop above the cap keeps
    the guard (pinned in tests)."""
    # Materialize the edge relation ONCE before looping: the loop
    # joins adj against labels twice per round, and without this the
    # whole candidate-generation subtree (at worst the full
    # LSH-verify pipeline) re-evaluates in EVERY round — measured as
    # the dominant cost of dedup_verified_clusters at sf1 (~4 s of
    # upstream × 2 joins × rounds). Edges are near-dup pairs —
    # bounded, tiny next to the corpus — so the checkpoint is cheap.
    edges = edges.select("doc_a", "doc_b").localCheckpoint(eager=True)
    # undirected edge list, both directions
    fwd = edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    adj = fwd.unionByName(rev)

    # Hybrid small-state leg (r10 optimization): when the
    # checkpointed edge relation is under the driver cap, compute the
    # identical fixed point with one exact union-find pass instead of
    # ~3 Spark jobs per doubling round. count() runs on materialized
    # checkpoint blocks (no recompute); the distributed loop below is
    # untouched for bigger graphs and non-integral id types.
    cap = int(os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGE_CAP", "2000000"))
    id_type = adj.schema["src"].dataType
    if (cap > 0 and isinstance(id_type, (T.LongType, T.IntegerType))
            and edges.count() <= cap):
        return _component_labels_driver(edges, id_type)

    nodes = (adj.select(F.col("src").alias("doc_id")).distinct())
    labels = nodes.withColumn("label", F.col("doc_id")) \
                  .localCheckpoint(eager=True)

    # Convergence check: labels only ever DECREASE (every update is a
    # least()), so Σlabel is strictly monotone — equal consecutive
    # sums ⟺ a fixed point. One agg over the already-checkpointed
    # relation per round, replacing the old-vs-new join + count
    # (one fewer shuffle per round). DECIMAL(38,0): md5-derived
    # 48-bit ids × 1e9 nodes overflows int64.
    def _label_sum(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        # neighbor labels: for each node, the min label among neighbors
        neighbor_min = (
            adj.join(labels, adj["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "doc_id")
        )
        propagated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"),
                        F.coalesce(F.col("nbr_label"), F.col("label")))
                 .alias("label"),
            )
        )
        # pointer doubling: label := label(label). Labels only ever
        # decrease and every label value is itself a node id, so the
        # self-join always resolves; this is what turns a diameter-d
        # chain from d rounds into log2(d).
        lbl_map = propagated.select(F.col("doc_id").alias("l_doc"),
                                    F.col("label").alias("l_lbl"))
        new_labels = (
            propagated.join(lbl_map,
                            propagated["label"] == lbl_map["l_doc"], "left")
            .select(
                "doc_id",
                F.least(F.col("label"),
                        F.coalesce(F.col("l_lbl"), F.col("label")))
                 .alias("label"),
            )
        )
        # localCheckpoint truncates the growing lineage each round
        labels = new_labels.localCheckpoint(eager=True)
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"component_labels did not converge within {max_iterations} "
            "rounds — the candidate graph has a larger diameter than "
            "expected (pointer doubling covers 2^rounds hops); raise "
            "max_iterations rather than trusting partial components")
    return labels


def dedup_clusters(documents: DataFrame,
                   max_iterations: int = 25,
                   edges: DataFrame | None = None) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: connected components
    (component_labels — min-label propagation + pointer doubling),
    then keeper selection (lowest doc_id per component) — what a
    dedup pipeline actually emits.

    ``edges`` accepts any (doc_a, doc_b) candidate relation —
    dedup_lsh_verified pairs, simhash candidates, embedding-cell
    pairs — so one clustering implementation serves every candidate
    generator; default is MinHash-LSH over ``documents``."""
    if edges is None:
        edges = dedup_minhash_lsh(documents)
    labels = component_labels(edges, max_iterations)
    clusters = (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cluster_size"),
             F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("cluster_size") > 1)
        .select(
            F.col("label").alias("cluster_id"),
            "cluster_size", "keeper_doc_id",
        )
        .orderBy("cluster_id")
    )
    return clusters


def dedup_drop_list(documents: DataFrame,
                    edges: DataFrame | None = None,
                    max_iterations: int = 25) -> DataFrame:
    """Per-document dedup RESOLUTION manifest: for every member of a
    near-dup cluster, which copy to keep and which to drop — the
    artifact a production dedup pipeline actually applies to the
    corpus (dedup_clusters reports the clusters; this resolves them).

    Keeper rule: highest text_quality_score wins, lowest doc_id on
    ties — keep the best-written copy, not an arbitrary one (the
    min-doc_id keeper of dedup_clusters biases toward whichever
    duplicate was ingested first). Output is bounded by CLUSTERED
    docs (the duplicates), never corpus-sized.

    Scale: component_labels is the O(log diameter) pointer-doubling
    loop over bounded LSH-verified edges; quality is scored ONLY for
    cluster members (semi-join before the token explode, so the
    corpus-wide scoring pass never runs); keeper pick is one window
    over the bounded cluster membership.

    Reference parity: the reference dedups nothing (its detectors
    only COUNT duplicates — monitoring/detectors/
    data_quality_detector.py duplicate trend); this is the curation
    counterpart the training-data brief adds."""
    from selfhealingdatapipeline_gcp_spark.operators import textanalysis

    if edges is None:
        edges = _lsh_verified_pairs(documents)
    labels = component_labels(edges, max_iterations)
    sized = (labels.groupBy("label")
             .agg(F.count(F.lit(1)).alias("cluster_size"))
             .filter(F.col("cluster_size") > 1))
    # Score ONLY the clustered docs: text_quality_score explodes and
    # aggregates every token it sees, so a semi-join down to cluster
    # membership first saves the corpus-wide explode (the operator's
    # dominant cost at scale — output is bounded by clustered docs).
    clustered_docs = documents.join(
        labels.select("doc_id"), "doc_id", "semi")
    quality = textanalysis.text_quality_score(clustered_docs).select(
        "doc_id", "quality_score")
    # LEFT join + the formula's empty-doc value: a zero-token doc has
    # no explode rows, hence no quality row — but the score formula
    # evaluates to exactly 0.0 for it (len/stop/word-len all zero),
    # which is what the SQL twin yields; coalesce keeps such a
    # cluster member in the manifest instead of silently dropping it.
    j = (labels.join(sized, "label")
         .join(quality, "doc_id", "left")
         .withColumn("quality_score",
                     F.coalesce(F.col("quality_score"), F.lit(0.0))))
    w = Window.partitionBy("label").orderBy(
        F.desc("quality_score"), F.asc("doc_id"))
    keeper = F.first("doc_id").over(w)
    return (
        j.select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            "quality_score",
            keeper.alias("keeper_doc_id"),
        )
        .withColumn("action",
                    F.when(F.col("doc_id") == F.col("keeper_doc_id"),
                           F.lit("keep")).otherwise(F.lit("drop")))
        .orderBy("cluster_id", "doc_id")
    )


def leakage_safe_split(documents: DataFrame,
                       edges: DataFrame | None = None,
                       val_pct: int = 10,
                       max_iterations: int = 25) -> DataFrame:
    """Train/val split that near-dup clusters cannot straddle: the
    split key is the doc's connected-component label when it has one
    (coalesced to its own doc_id otherwise), so every member of a
    near-dup cluster hashes into the SAME split — the fix for what
    split_leakage_check detects (train_val_split hashes raw doc_ids,
    so two near-identical docs can land on opposite sides and leak
    val content into train).

    Same md5int(key) % 100 < val_pct rule as train_val_split —
    deterministic, retry-stable, and scan-level for the singleton
    majority; clustered docs add one left join against the bounded
    label relation."""
    if edges is None:
        edges = _lsh_verified_pairs(documents)
    labels = component_labels(edges, max_iterations)
    s = (documents.select("doc_id")
         .join(labels, "doc_id", "left")
         .select("doc_id",
                 F.coalesce(F.col("label"), F.col("doc_id"))
                  .alias("split_key")))
    bucket = textfn.md5int(F.col("split_key").cast("string")) % 100
    # no orderBy: the output is corpus-sized and a global sort would
    # add a range-partition exchange for nothing (consumers join or
    # filter on it; the strict gate hashes order-independently)
    return s.select(
        "doc_id", "split_key",
        bucket.alias("bucket"),
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train"))
         .alias("split"),
    )


def dedup_rate_report(documents: DataFrame,
                      edges: DataFrame | None = None,
                      max_iterations: int = 25) -> DataFrame:
    """One-row corpus dedup audit: how much of the corpus is
    duplicated and how much a resolution pass would remove — the
    number a curation run reports up front (n_docs, docs in near-dup
    clusters, cluster count, docs a keep-one resolution drops, and
    the drop rate in integer micro-units).

    Scale: one corpus count aggregate + the bounded cluster-size
    aggregate, composed by a 1-row × 1-row crossJoin (the anchored
    broadcast pattern — never a data join)."""
    if edges is None:
        edges = _lsh_verified_pairs(documents)
    labels = component_labels(edges, max_iterations)
    corpus = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = (labels.groupBy("label")
             .agg(F.count(F.lit(1)).alias("sz"))
             .filter(F.col("sz") > 1)
             .agg(F.coalesce(F.sum("sz"), F.lit(0)).cast("bigint")
                   .alias("n_clustered_docs"),
                  F.count(F.lit(1)).alias("n_clusters")))
    n_to_drop = (F.col("n_clustered_docs") - F.col("n_clusters")) \
        .cast("bigint")
    return (
        corpus.crossJoin(F.broadcast(stats))
        .select(
            "n_docs", "n_clustered_docs", "n_clusters",
            n_to_drop.alias("n_to_drop"),
            F.floor(n_to_drop * 1000000.0 / F.col("n_docs"))
             .cast("bigint").alias("drop_rate_e6"),
        )
    )


def chunk_dedup_exact(documents: DataFrame,
                      chunk_tokens: int = 64,
                      overlap: int = 16) -> DataFrame:
    """Exact duplicate detection at CHUNK grain: hash every
    doc_chunk_plan token window (same chunk/stride geometry) and
    report windows whose text recurs — catches copy-pasted sections
    and boilerplate blocks inside otherwise-distinct documents, the
    partial-duplication case whole-doc dedup_exact cannot see and
    winnowing only samples.

    Pure hash-groupBy at chunk grain (the dedup_exact discipline one
    level down): the shuffle carries 32-char digests, never chunk
    text; output is bounded by recurring windows (HAVING count > 1).
    The exemplar (lowest doc_id, then chunk_idx) rides a single
    packed bigint min — integer-exact across engines."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    d = _spread(documents).select(
        "doc_id", textfn.tokens("text").alias("t"))
    d = d.select("doc_id", "t", F.size("t").cast("bigint").alias("nt"))
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor((F.col("nt") - overlap + (stride - 1))
                / F.lit(float(stride))).cast("bigint"))
    ch = d.select(
        "doc_id", "t", "nt",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             n_chunks - 1)).alias("chunk_idx"))
    s = F.col("chunk_idx") * stride
    e = F.least(s + chunk_tokens, F.col("nt"))
    h = ch.filter(e > s).select(
        "doc_id", "chunk_idx",
        F.md5(F.concat_ws(
            " ", F.slice("t", (s + 1).cast("int"),
                         (e - s).cast("int")))).alias("chunk_hash"))
    # empty windows (zero-token docs) are excluded above: every empty
    # doc hashes md5("") and N of them would collide into one bogus
    # "recurring chunk" group — a chunking rule (each doc emits >= 1
    # chunk) that is right for doc_chunk_plan and wrong for dedup.
    # Exemplar pick: lexicographic struct min — id-range-safe (the
    # old doc_id*1e9+idx packing overflowed int64 past ~9.2e9 ids).
    exemplar = F.min(F.struct(F.col("doc_id"), F.col("chunk_idx")))
    return (
        h.groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.countDistinct("doc_id").alias("n_docs"),
             exemplar.alias("__ex"))
        .filter(F.col("n_chunks") > 1)
        .select(
            "chunk_hash", "n_chunks", "n_docs",
            F.col("__ex.doc_id").alias("exemplar_doc_id"),
            F.col("__ex.chunk_idx").alias("exemplar_chunk_idx"),
        )
        .orderBy("chunk_hash")
    )


def dedup_simhash_multitable(documents: DataFrame,
                             max_hamming: int = 6,
                             n_tables: int = 4) -> DataFrame:
    """Multi-table SimHash: bucket each signature on ``n_tables``
    byte-rotated 16-bit windows; a pair is a candidate if ANY window
    matches exactly. Larger (16-bit) buckets bound the in-bucket
    quadratic pairing that the single-table top-byte form suffers on
    homogeneous corpora, while the rotations preserve recall for
    hamming ≤ max_hamming pairs (a close pair almost always agrees on
    at least one 16-bit window). Pure integer arithmetic — oracle-
    exact across engines."""
    ex = (
        _spread(documents, "doc_id")
        .select("doc_id", F.explode(textfn.tokens("text")).alias("w"))
        .select("doc_id", textfn.md5int(F.col("w")).alias("x"))
    )
    bit_sums = [
        F.sum((F.floor(F.col("x") / F.lit(float(2 ** k))).cast("bigint") % 2)
              * 2 - 1).alias(f"b{k}")
        for k in range(32)
    ]
    simhash = sum(
        (F.when(F.col(f"b{k}") > 0, F.lit(2 ** k)).otherwise(F.lit(0))
         for k in range(32)),
        start=F.lit(0),
    ).cast("bigint")
    sigs = ex.groupBy("doc_id").agg(*bit_sums).select(
        "doc_id", simhash.alias("simhash"))

    # rotate by 8·t bits: ((sig · 2^(8t)) mod 2^32) + (sig div 2^(32-8t));
    # bucket key embeds the table id
    def bucket(t: int):
        shift = 8 * t
        rot = ((F.col("simhash") * (2 ** shift)) % (2 ** 32)
               + F.floor(F.col("simhash") / F.lit(float(2 ** (32 - shift))))
               .cast("bigint"))
        return F.concat_ws("|", F.lit(str(t)),
                           F.floor(rot / F.lit(float(2 ** 16)))
                           .cast("bigint").cast("string"))

    keys = sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[bucket(t) for t in range(n_tables)])).alias("bk"))
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(b, (F.col("a.bk") == F.col("b.bk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
             .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def dedup_prefix_hash(documents: DataFrame,
                      n_prefix_tokens: int = 20) -> DataFrame:
    """Prefix dedup: documents sharing their first ``n_prefix_tokens``
    whitespace tokens are duplicates (the leading-boilerplate /
    truncated-scrape case exact dedup misses — identical openings with
    divergent tails). Same plan shape as dedup_exact: the shuffle key
    is the 16-byte md5 of the token prefix, never the document, so at
    100 TB this costs one hash-groupBy like any count."""
    prefix = F.concat_ws(
        " ", F.slice(textfn.tokens("text"), 1, n_prefix_tokens))
    return (
        documents
        .select("doc_id", F.md5(prefix).alias("prefix_hash"))
        .groupBy("prefix_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keeper_doc_id", "n_copies",
                (F.col("n_copies") > 1).alias("had_duplicates"))
    )


def lsh_precision_report(documents: DataFrame) -> DataFrame:
    """Banding quality report: what share of MinHash-LSH candidate
    pairs survive the exact-Jaccard verify — THE number that tunes
    the (bands × rows) trade-off (precision near 1 means banding is
    too conservative and recall is leaking; near 0 means the verify
    stage is eating the savings). One row out: candidates, verified,
    floor-e6 precision.

    Runs both registered plans (candidates and the verified
    composition share the shingle machinery; within one query each
    subtree is planned independently) and reduces each to a 1-row
    count — nothing beyond the two existing scale-bounded pipelines
    ever materializes."""
    nc = dedup_minhash_lsh(documents).agg(
        F.count(F.lit(1)).alias("n_candidates"))
    nv = _lsh_verified_pairs(documents).agg(
        F.count(F.lit(1)).alias("n_verified"))
    return nc.crossJoin(F.broadcast(nv)).select(
        "n_candidates", "n_verified",
        F.when(F.col("n_candidates") > 0,
               F.floor(F.col("n_verified") * 1e6 / F.col("n_candidates")))
         .otherwise(F.lit(0)).cast("bigint").alias("precision_e6"))


def lsh_recall_report(documents: DataFrame,
                      threshold: float = 0.5) -> DataFrame:
    """Banding recall: what share of TRUE near-dup pairs (exact
    3-gram Jaccard ≥ threshold, computed by dedup_ngram_jaccard) the
    LSH+verify composition recovers — precision's partner; together
    they pin the bands × rows operating point. Ground truth via the
    exact pipeline is affordable at audit scale (the df ceiling
    bounds it); at 100 TB you run this on a sampled slice, which is
    exactly how recall audits are done in production dedup.

    One equi-join of two slim pair relations on (doc_a, doc_b) +
    three 1-row counts; output is a single row."""
    truth = _ngram_jaccard_pairs(documents, threshold, 10_000)
    found = _lsh_verified_pairs(documents)
    hit = truth.join(found.select("doc_a", "doc_b"), ["doc_a", "doc_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    nh = hit.agg(F.count(F.lit(1)).alias("n_recovered"))
    return nt.crossJoin(F.broadcast(nh)).select(
        "n_true_pairs", "n_recovered",
        F.when(F.col("n_true_pairs") > 0,
               F.floor(F.col("n_recovered") * 1e6
                       / F.col("n_true_pairs")))
         .otherwise(F.lit(0)).cast("bigint").alias("recall_e6"))


def cross_source_dup_matrix(documents: DataFrame) -> DataFrame:
    """Source-pair VERIFIED near-duplicate counts: which crawls
    duplicate which — the merge/provenance decision table
    cross_source_overlap approximates at vocabulary grain, here
    computed on actual verified near-dup PAIRS (dedup_lsh_verified).
    A high (A, B) count means ingesting both sources double-pays
    tokens; a high (A, A) count means the source self-duplicates.

    Scale: the pair relation is LSH-bounded; two broadcast-friendly
    joins attach sources by doc id (slim (id, source) projection,
    never text); output is O(|sources|²) forever."""
    pairs = _lsh_verified_pairs(documents).select("doc_a", "doc_b")
    src = documents.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"),
                    F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"),
                    F.col("source").alias("sb"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select(F.least("sa", "sb").alias("source_a"),
                F.greatest("sa", "sb").alias("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
        .orderBy("source_a", "source_b")
    )


def dedup_cluster_size_histogram(documents: DataFrame) -> DataFrame:
    """Cluster-size histogram of the duplicate components in
    power-of-two buckets — the one-page audit of a dedup run: a fat
    tail (big buckets) means boilerplate floods / mirror sites where
    near-dup clustering is doing the heavy lifting; all-size-2 means
    simple re-ingests that exact dedup would mostly catch.

    Buckets by integer bit length (floor(log2) via length(bin(n))-1,
    engine-exact — floor(log2(double)) flips at boundaries across
    libms, the token_histogram lesson). Composes dedup_clusters, so
    the scale contract is the clustering one; the histogram itself is
    O(log max-cluster) rows."""
    clusters = dedup_clusters(documents)
    bucket = (F.length(F.bin(F.col("cluster_size"))) - 1).cast("int")
    return (
        clusters
        .select(bucket.alias("log2_bucket"), "cluster_size")
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).alias("n_clusters"),
             F.sum("cluster_size").alias("n_docs"))
        .select("log2_bucket",
                F.expr("shiftleft(1, log2_bucket)").cast("bigint")
                 .alias("bucket_lo"),
                "n_clusters", "n_docs")
        .orderBy("log2_bucket")
    )


def dedup_threshold_sweep(documents: DataFrame,
                          edges: DataFrame | None = None) -> DataFrame:
    """Jaccard-threshold tuning curve over the verified near-dup
    pairs: for each candidate cut 0.50, 0.55, … 0.95, how many pairs
    and how many distinct documents a dedup run at that threshold
    would touch, plus the mean Jaccard of the surviving pairs — the
    one-page table you read before committing to a threshold
    (lsh_precision/recall_report audit the LSH banding at a FIXED
    threshold; this sweeps the decision variable itself).

    Scale shape — deliberately NOT a thresholds×pairs theta-join:
    the grid is uniform, so each pair buckets once by
    floor((jac−500000)/50000) and each count "≥ threshold k" is a
    SUFFIX-cumulative sum over the 10 fixed buckets. Distinct-doc
    counts suffix-sum too because they bucket by each doc's MAX pair
    Jaccard (a doc participates at cut t iff its best pair ≥ t).
    Everything after the bounded pair relation is a 10-row frame;
    the global window runs over those 10 rows, never data.

    Empty buckets stay visible (LEFT join from the full grid +
    coalesce 0 — the ADVICE r6 minhash_estimate_report rule);
    mean_jaccard_e6 is NULL where no pairs survive.

    Laziness caveat (ADVICE r10): when ``edges`` is None, BUILDING
    this DataFrame eagerly materializes the verified-pair relation
    (``localCheckpoint(eager=True)``) — construction runs real jobs,
    and the checkpointed lineage is not recoverable on executor loss
    (local, non-reliable storage). Pass a pre-built ``edges`` to keep
    construction lazy."""
    spark = documents.sparkSession
    if edges is None:
        # Materialize the verified pairs ONCE (eager, builder-time —
        # the query is in bench BUILD_EXECUTES for it): the sweep
        # consumes the relation at TWO grains (pair buckets and
        # per-doc max buckets), and exchange reuse alone leaves the
        # a-side shingle-set aggregation executing twice — it sits
        # directly on the _spread partitioning with no exchange of
        # its own to reuse (r10 final-plan evidence). Pairs are
        # LSH-bounded, tiny next to the corpus — the same
        # checkpoint-the-edges discipline as component_labels.
        edges = _lsh_verified_pairs(documents).localCheckpoint(eager=True)
    jac_e6 = F.round(F.col("jaccard") * 1e6).cast("bigint")
    p = edges.select("doc_a", "doc_b", jac_e6.alias("jac_e6"))
    idx = F.least(F.floor((F.col("jac_e6") - 500000) / 50000),
                  F.lit(9)).cast("bigint")
    pair_b = (p.select(idx.alias("idx"), "jac_e6")
              .groupBy("idx")
              .agg(F.count(F.lit(1)).alias("__np"),
                   F.sum("jac_e6").alias("__sj")))
    doc_b = (p.select(F.explode(F.array("doc_a", "doc_b")).alias("d"),
                      "jac_e6")
             .groupBy("d").agg(F.max("jac_e6").alias("jac_e6"))
             .select(idx.alias("idx"))
             .groupBy("idx").agg(F.count(F.lit(1)).alias("__nd")))
    th = (spark.range(10)
          .select(F.col("id").alias("idx"),
                  (500000 + F.col("id") * 50000).alias("threshold_e6")))
    j = (th.join(F.broadcast(pair_b), "idx", "left")
         .join(F.broadcast(doc_b), "idx", "left"))
    w = (Window.orderBy(F.desc("idx"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_pairs = F.sum(F.coalesce(F.col("__np"), F.lit(0))).over(w)
    sum_jac = F.sum(F.coalesce(F.col("__sj"), F.lit(0))).over(w)
    n_docs = F.sum(F.coalesce(F.col("__nd"), F.lit(0))).over(w)
    return (
        j.select(
            "threshold_e6",
            n_pairs.cast("bigint").alias("n_pairs"),
            n_docs.cast("bigint").alias("n_docs"),
            F.when(n_pairs > 0, F.floor(sum_jac / n_pairs).cast("bigint"))
             .alias("mean_jaccard_e6"),
        )
        .orderBy("threshold_e6")
    )


def dedup_cascade_report(documents: DataFrame,
                         max_iterations: int = 25) -> DataFrame:
    """The curation FUNNEL: run the dedup ladder in production order
    — byte-exact → normalized-exact → MinHash-LSH-verified near-dup
    clustering — with each stage applied only to the previous stage's
    survivors, and report per-stage docs_in / dropped / out / rate.
    This is the one-page attribution table a curation run publishes
    ("how much did each rung actually remove?"): the standalone
    operators each report against the FULL corpus, which double-counts
    (every byte-dup is also a near-dup), so incremental attribution
    needs the sequenced composition.

    Scale: stages 1-2 are hash-groupBys whose shuffles carry 32-char
    digests; stage 3 is the bounded LSH-verify pipeline + the
    O(log diameter) pointer-doubling components, both on survivors
    only (each stage SHRINKS the input for the next — the cheap rungs
    run first for exactly this reason). The final report composes
    five 1-row aggregates by anchored broadcast crossJoins — never a
    data join.

    Preconditions and laziness (ADVICE r10): ``doc_id`` must be
    unique in ``documents`` — stage counts are read as |keeper set|
    (|d1| = |keep1|, |d2| = |keep2|), which holds only when the
    semi-join keeps exactly one row per keeper id. And building this
    DataFrame eagerly runs the two keeper-set aggregation jobs
    (``localCheckpoint(eager=True)``) — construction is not lazy,
    and the checkpointed sets are lost on executor failure (local,
    non-reliable storage)."""
    # The keeper-id sets are eagerly checkpointed (builder-time; the
    # query is in bench BUILD_EXECUTES already for its CC loop):
    # without this, the exact-dedup md5 groupBy evaluates THREE times
    # (the LSH edge build over d2, c1, c2) and the normalized groupBy
    # twice — each a full corpus aggregation pass. The sets are
    # doc_id-only (8 B/row, ~1000× slimmer than the corpus text), the
    # slim-relation end of the checkpoint-the-edges discipline.
    # Measured (interleaved min-of-5): sf0.1 4.42→3.79 s,
    # sf1 replica 11.41→9.26 s, identical rows at both SFs.
    keep1 = (documents.groupBy(F.md5("text"))
             .agg(F.min("doc_id").alias("doc_id"))
             .select("doc_id").localCheckpoint(eager=True))
    d1 = documents.join(keep1, "doc_id", "semi")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
    keep2 = (d1.groupBy(F.md5(norm))
             .agg(F.min("doc_id").alias("doc_id"))
             .select("doc_id").localCheckpoint(eager=True))
    d2 = d1.join(keep2, "doc_id", "semi")
    edges = _lsh_verified_pairs(d2)
    labels = component_labels(edges, max_iterations)
    dr3 = (labels.groupBy("label")
           .agg(F.count(F.lit(1)).alias("sz"))
           .filter(F.col("sz") > 1)
           .agg(F.coalesce(F.sum(F.col("sz") - 1), F.lit(0))
                 .cast("bigint").alias("dr3")))
    c0 = documents.agg(F.count(F.lit(1)).alias("n0"))
    # |d1| = |keep1| and |d2| = |keep2| (keepers are a subset of doc
    # ids and the semi-join keeps exactly them), so the stage counts
    # read the materialized keeper sets — no re-scan, no re-join
    c1 = keep1.agg(F.count(F.lit(1)).alias("n1"))
    c2 = keep2.agg(F.count(F.lit(1)).alias("n2"))
    row = (c0.crossJoin(F.broadcast(c1))
           .crossJoin(F.broadcast(c2))
           .crossJoin(F.broadcast(dr3)))
    out = row.selectExpr("""stack(3,
        1, 'exact',        n0, n0 - n1,  n1,
        2, 'normalized',   n1, n1 - n2,  n2,
        3, 'near_dup_lsh', n2, dr3,      n2 - dr3
      ) AS (stage, stage_name, docs_in, docs_dropped, docs_out)""")
    return (
        out.select(
            F.col("stage").cast("int").alias("stage"),
            "stage_name", "docs_in", "docs_dropped", "docs_out",
            F.floor(F.col("docs_dropped") * 1e6 / F.col("docs_in"))
             .cast("bigint").alias("drop_rate_e6"),
        )
        .orderBy("stage")
    )


def split_embedding_leakage(embeddings: DataFrame,
                            threshold: float = 0.35,
                            val_pct: int = 10,
                            candidates: DataFrame | None = None) -> DataFrame:
    """EMBEDDING-grain split audit: near-duplicate vector pairs that
    straddle the deterministic train/val hash split — semantic
    leakage the token-shingle check (split_leakage_check) cannot see
    (a paraphrase shares no 3-gram but sits at cosine ~0.9). Each
    surviving row is a (train vector, val vector) pair a leakage-safe
    re-split or a val-side drop must resolve.

    Composes dedup_embedding's cell-bounded pair generation (the
    corpus never all-pairs joins) with train_val_split's hash rule
    applied to vec_id — both sides pure scan-level projections, so
    the audit adds ZERO shuffles beyond the pair pipeline itself.
    At 100 TB the pair relation is the bounded near-dup set; the
    split columns are free.

    Reference parity: the reference has no embedding surface; this is
    brief-mandated LLM-data-pipeline tooling (near-dup + split audit).

    ``candidates`` passes through to dedup_embedding — feed LSH
    buckets or any bounded (vec_a, vec_b) generator; the default is
    the cell-bounded pipeline (which needs a corpus larger than the
    centroid grid: below K vectors every vector is its own cell)."""
    pairs = dedup_embedding(embeddings, threshold=threshold,
                            candidates=candidates)

    def _split(c):
        return F.when(
            textfn.md5int(F.col(c).cast("string")) % 100 < val_pct,
            F.lit("val")).otherwise(F.lit("train"))

    flagged = (
        pairs.withColumn("split_a", _split("vec_a"))
             .withColumn("split_b", _split("vec_b"))
             .filter(F.col("split_a") != F.col("split_b"))
    )
    return (
        flagged.select(
            F.when(F.col("split_a") == "train", F.col("vec_a"))
             .otherwise(F.col("vec_b")).alias("vec_train"),
            F.when(F.col("split_a") == "val", F.col("vec_a"))
             .otherwise(F.col("vec_b")).alias("vec_val"),
            "cosine", "same_label",
        )
        .orderBy("vec_train", "vec_val")
    )


def source_dup_rate(documents: DataFrame) -> DataFrame:
    """Per-SOURCE exact-duplicate audit: how much of each source is
    byte-identical repetition (dedup_rate_report is the corpus-grain
    near-dup number; a mixing decision needs the per-source exact
    inflation — a crawler stuck in a template farm shows up HERE).

    One hash-groupBy per (source, md5(text)) — the shuffle carries
    16-byte digests + counts, never documents — then a per-source
    rollup. Partial aggregation absorbs the duplicate mass map-side,
    so the second shuffle is bounded by DISTINCT texts per source."""
    per_text = (
        documents.groupBy("source", F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_distinct_texts"),
            (F.sum("n") - F.count(F.lit(1))).cast("bigint")
             .alias("dup_docs"),
            F.max("n").cast("bigint").alias("largest_group"),
        )
        .withColumn(
            "dup_rate_e6",
            F.floor((F.col("dup_docs")) * 1e6 / F.col("n_docs"))
             .cast("bigint"))
        .orderBy("source")
    )


def dedup_weighted_sample(documents: DataFrame) -> DataFrame:
    """Duplicate-aware downsampling: keep each document with
    probability 1/(exact-copy cluster size), so every DISTINCT text
    contributes one expected survivor however many times the crawler
    re-fetched it. The alternative orderings both lose: dedup-then-
    sample throws away the duplication signal a mixing plan may want;
    sample-then-dedup biases the mix toward template farms. This is
    the standard "soft dedup" curation step (cap_per_source's
    within-cluster analog).

    Determinism: the keep decision is md5int(doc_id) mod 1e6 <
    floor(1e6/cluster_size) — scan-level, seedless, retry-stable
    (the dataprep discipline: no rand(), a task retry reproduces the
    same sample bit-for-bit).

    Scale shape: one hash-groupBy over 16-byte digests for cluster
    sizes; the join back ships (doc_id, source, digest) — never text
    — and partial aggregation has already collapsed the duplicate
    mass, so the size relation is bounded by distinct texts."""
    keyed = documents.select(
        "doc_id", "source", F.md5("text").alias("h"))
    sizes = keyed.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"))
    weight = F.floor(F.lit(1_000_000) / F.col("n_copies")).cast("bigint")
    return (
        keyed.join(sizes, "h")
        .withColumn("weight_e6", weight)
        .filter(textfn.md5int(F.col("doc_id").cast("string")) % 1_000_000
                < F.col("weight_e6"))
        .select("doc_id", "source", "n_copies", "weight_e6")
        .orderBy("doc_id")
    )


def dedup_bloom_audit(documents: DataFrame, m_bits: int = 262_144,
                      k_hashes: int = 4) -> DataFrame:
    """Bloom-filter membership audit — the fixed-state counterpart of
    token_heavy_hitters' Count-Min audit, for the DEDUP side: an
    incremental ingest at 100 TB cannot semi-join every arriving
    batch against the full corpus hash set, it tests a Bloom filter
    (``m_bits`` bits TOTAL, however large the corpus) and only the
    hits pay the exact check. This operator builds the filter over
    one deterministic half of the corpus, streams the other half
    through it, and measures the false-positive rate the fixed-state
    path would pay against the exact semi-join ground truth — the
    number that sizes m for a target precision.

    Determinism: the split is md5int(doc_id) mod 2 (seedless,
    retry-stable); bit j for text-hash h is md5int(j || ':' || h)
    mod ``m_bits`` — the engine-portable discipline. Bloom filters
    have NO false negatives, so hits ⊇ true duplicates (asserted in
    tests and visible as n_false_pos ≥ 0).

    Scale shape: the filter relation is ≤ ``m_bits`` distinct
    positions (broadcastable at any corpus size — 2^18 ints ≈ 2 MB);
    both corpus passes collapse map-side to 16-byte digests; the
    membership test is k broadcast probes per query doc + one
    doc-grain count; everything downstream is a single-row
    aggregate."""
    keyed = documents.select(
        "doc_id", F.md5("text").alias("h"),
        (textfn.md5int(F.col("doc_id").cast("string")) % 2 == 0)
        .alias("is_ref"))
    return bloom_audit_from_keyed(keyed, m_bits=m_bits,
                                  k_hashes=k_hashes)


def bloom_audit_from_keyed(keyed: DataFrame, m_bits: int = 262_144,
                           k_hashes: int = 4) -> DataFrame:
    """The Bloom membership report from a (doc_id, h, is_ref) keyed
    relation. Factored out so the streaming admission form
    (streaming/monitors.py streaming_bloom_guard) feeds its
    epoch-accumulated state into the SAME code path: bit sets and
    hash sets are unions, so summed epochs equal the batch build and
    the two share one SQL oracle."""
    refh = keyed.filter("is_ref").select("h").distinct()
    positions = lambda col: F.array(*[  # noqa: E731
        (textfn.md5int(F.concat(F.lit(f"{j}:"), col)) % m_bits)
        for j in range(k_hashes)
    ])
    bits = (refh.select(F.explode(positions(F.col("h"))).alias("pos"))
            .distinct())
    qdocs = keyed.filter(~F.col("is_ref")).select("doc_id", "h")
    probe = qdocs.select(
        "doc_id", "h", F.explode(positions(F.col("h"))).alias("pos"))
    hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == k_hashes)
        .select("doc_id", "h")
    )
    true_dups = qdocs.join(refh, "h", "left_semi")
    counts = (
        qdocs.agg(F.count(F.lit(1)).cast("bigint").alias("n_query_docs"))
        .crossJoin(F.broadcast(refh.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ref_distinct"))))
        .crossJoin(F.broadcast(bits.agg(
            F.count(F.lit(1)).cast("bigint").alias("bits_set"))))
        .crossJoin(F.broadcast(hits.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bloom_hits"))))
        .crossJoin(F.broadcast(true_dups.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true_dups"))))
    )
    return counts.select(
        "n_ref_distinct", "n_query_docs", "n_true_dups", "n_bloom_hits",
        (F.col("n_bloom_hits") - F.col("n_true_dups")).cast("bigint")
         .alias("n_false_pos"),
        F.floor((F.col("n_bloom_hits") - F.col("n_true_dups")) * 1e6
                / F.greatest(F.lit(1),
                             F.col("n_query_docs") - F.col("n_true_dups")))
         .cast("bigint").alias("fp_rate_e6"),
        "bits_set",
        F.floor(F.col("bits_set") * 1e6 / m_bits).cast("bigint")
         .alias("fill_e6"))
