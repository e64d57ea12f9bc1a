"""Text expression library — pure built-in column expressions (JVM
codegen, no Python in the row path) with exact DuckDB twins.

Determinism rules (SURVEY.md §3): hashing is md5-hex→int (identical
in any engine), folds are explicit left-to-right ``aggregate`` calls,
never engine-native hash()/sum-order-dependent reductions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for all integer hashing (fits products in int64: a < 2^10,
# md5int < 2^48).
HASH_MOD = 1_000_000_007


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empties dropped.
    DuckDB twin: list_filter(str_split(c, ' '), x -> x != '')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda x: x != F.lit(""))


def md5int(col: Column) -> Column:
    """First 12 hex chars of md5 as a bigint (< 2^48).
    DuckDB twin: ('0x' || substr(md5(c), 1, 12))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("bigint")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram word shingles as strings.
    DuckDB twin: list_distinct(list_transform(range(1,
    greatest(len(t)-n+1, 0)+1), i -> t[i] || ' ' ... ))."""
    t = tokens(col)
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)])
    return F.array_distinct(
        F.when(F.size(t) >= n, F.transform(idx, gram))
        .otherwise(F.array().cast("array<string>")))


def minhash_signature(shingle_ints: Column, num_perm: int = 32) -> Column:
    """MinHash signature: sig[j] = min over shingles of
    ((17 + 13j)·x + 7919j) mod HASH_MOD, j = 1..num_perm.

    One pass over the shingle array per permutation, all inside
    codegen — the classic a·x+b universal-hash family, deterministic
    across engines."""
    # Single fold over the shingle array maintaining all num_perm
    # running minima — the shingle hash (md5) is evaluated exactly
    # once per shingle, not once per permutation. Init sentinel is
    # HASH_MOD (> any hash value), so any non-empty input replaces it.
    return F.aggregate(
        shingle_ints,
        F.array_repeat(F.lit(HASH_MOD).cast("bigint"), num_perm),
        lambda acc, x: F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(num_perm)),
            lambda m, j: F.least(
                m, ((F.lit(17) + j * 13) * x + j * 7919) % HASH_MOD)),
    )


def lsh_band_keys(sig: Column, bands: int = 8, rows: int = 4) -> Column:
    """LSH banding: band id embedded in the key string so a single
    equi-join on the key realizes the (band, hash) bucket join."""
    def key(b: Column) -> Column:
        parts = [b.cast("string")] + [
            F.element_at(sig, b * rows + j).cast("string")
            for j in range(1, rows + 1)
        ]
        return F.concat_ws("|", *parts)
    return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), key)


def simhash32(token_ints: Column) -> Column:
    """32-bit SimHash over (frequency-weighted) token hashes: bit k is
    set iff sum over tokens of ±1 (bit k of md5int) is positive."""
    def bit_sum(k: Column) -> Column:
        # floor(x / 2^k) is exact in double for x < 2^53 (md5int < 2^48)
        return F.aggregate(
            token_ints,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc
            + (F.floor(x / F.pow(F.lit(2.0), k)).cast("bigint") % 2) * 2 - 1,
        )
    # single nested fold: each bit's ±1 sum is evaluated exactly once
    # (a separate bits-array column would get re-inlined by
    # CollapseProject and recomputed per bit)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("bigint"),
        lambda acc, k: acc + F.when(
            bit_sum(k) > 0,
            F.pow(F.lit(2.0), k).cast("bigint")).otherwise(F.lit(0)),
    )


def poly_fingerprint(token_ints: Column) -> Column:
    """Rolling polynomial hash over the token sequence:
    h = fold (acc·31 + x) mod HASH_MOD. Order-sensitive by design
    (document fingerprint, not a bag hash)."""
    return F.aggregate(
        token_ints,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % HASH_MOD,
    )
