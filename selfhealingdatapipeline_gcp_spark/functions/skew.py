"""Skew-handling join helper: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; explicit salting is the tool for EXTREME hot keys (one
key >> a whole executor's capacity) or for aggregations, where AQE
can't split a single hash partition. The pattern: explode the small
side ``salt_factor`` ways, salt the big side randomly-but-
deterministically (hash of a row-unique column, not rand(), so
retries and oracle checks stay stable), and join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_factor: int = 8,
                big_salt_source: str | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join big⋈small on ``key`` with the hot-key pressure spread
    over ``salt_factor`` buckets.

    ``big_salt_source``: a column of the big side whose per-row hash
    picks the salt bucket (defaults to the key itself plus a
    monotonically increasing id — prefer a real row-unique column)."""
    salt_src = (F.col(big_salt_source) if big_salt_source
                else F.monotonically_increasing_id())
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_factor)))
    small_exploded = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("bigint"),
                             F.lit(salt_factor - 1).cast("bigint"))))
    out = big_salted.join(small_exploded, [key, "__salt"], how)
    return out.drop("__salt")


def with_salt(df: DataFrame, key_col: str, salt_factor: int,
              salt_source: Column | None = None) -> DataFrame:
    """Add a composite salted key column for skewed AGGREGATIONS:
    groupBy the salted key first (spreads the hot key), then re-agg
    on the true key — the classic two-phase combine."""
    src = salt_source if salt_source is not None \
        else F.monotonically_increasing_id()
    return df.withColumn(
        "__salted_key",
        F.concat_ws("#", F.col(key_col).cast("string"),
                    F.pmod(F.xxhash64(src), F.lit(salt_factor)).cast("string")))
