"""Text analysis operators over the documents table (SURVEY §2).

All per-row work is built-in array/string expressions (whole-stage
codegen) — token counting, ratio features, marker-based language ID,
and a rolling-hash fingerprint. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import money, textfn

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def text_token_count(documents: DataFrame) -> DataFrame:
    """Token counts: whitespace tokens, unique tokens, chars."""
    t = textfn.tokens("text")
    return documents.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def text_quality_score(documents: DataFrame) -> DataFrame:
    """Length / stopword-ratio / word-length composite quality score —
    the standard cheap pre-filter in training-data pipelines."""
    d = documents.select("doc_id", "text", textfn.tokens("text").alias("t"))
    n = F.size("t")
    sum_len = F.aggregate(F.col("t"), F.lit(0).cast("bigint"),
                          lambda acc, x: acc + F.length(x))
    mean_len = sum_len / F.greatest(n, F.lit(1))
    stop_ratio = _count_in(F.col("t"), STOPWORDS) / F.greatest(n, F.lit(1))
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    wl_score = F.when((mean_len >= 2.0) & (mean_len <= 10.0),
                      F.lit(1.0)).otherwise(F.lit(0.0))
    score = 0.5 * len_score + 0.3 * stop_ratio + 0.2 * wl_score
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        money.trunc(mean_len).alias("mean_token_len"),
        money.trunc(stop_ratio).alias("stopword_ratio"),
        money.trunc(score).alias("quality_score"),
    )


def text_language_id(documents: DataFrame) -> DataFrame:
    """Marker-word language ID (n-gram-free heuristic): per-language
    marker hit rate, argmax with fixed preference order on ties."""
    d = documents.select("doc_id", textfn.tokens("text").alias("t"))
    n = F.greatest(F.size("t"), F.lit(1))
    scores = {lang: _count_in(F.col("t"), words) / n
              for lang, words in LANG_MARKERS.items()}
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


def doc_fingerprint(documents: DataFrame, n_shards: int = 64) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint + shard assignment
    (shard = fingerprint mod n_shards — the partitioning key a 100 TB
    dedup/snapshot pipeline would bucket by)."""
    ints = F.transform(textfn.tokens("text"), textfn.md5int)
    fp = textfn.poly_fingerprint(ints)
    return documents.select(
        "doc_id",
        fp.alias("fingerprint"),
        (fp % n_shards).alias("shard"),
    )
