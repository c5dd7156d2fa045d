"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these helpers cover the two places AQE can't:

- **salted aggregation**: a groupBy on a key where one value dominates
  (a stop-shingle, a null-ish sentinel, a celebrity vertex) bottlenecks
  the one reducer holding it — even with map-side partial aggregation,
  when upstream is already partitioned by that key. Two-phase salting
  spreads the hot key over ``salt_buckets`` reducers, then combines.
- **salted broadcast-unfriendly join**: replicate the small side per
  salt so a hot probe key fans out. (For joins where one side fits in
  memory, prefer broadcast — this is for mid-size dimension tables.)

Both are pure DataFrame transforms: deterministic, no RDDs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
    agg: Callable[[Column], Column] = F.sum,
) -> DataFrame:
    """Two-phase skew-safe aggregation: ``agg(value) GROUP BY keys``.

    Phase 1 groups by (keys, salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 combines the per-salt partials.
    Valid for any commutative/associative ``agg`` (sum, count, min,
    max). The salt is derived from a hash of the value column so rows
    spread evenly without RNG state.
    """
    salt = (F.abs(F.hash(F.col(value_col))) % salt_buckets).alias("_salt")
    phase1 = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(agg(F.col(value_col)).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(agg(F.col("_partial")).alias(f"{value_col}_agg"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner join where ``big`` has hot values of ``key``: salt the big
    side, replicate the small side per salt value, join on (key, salt).

    The replication factor is ``salt_buckets`` — size it to the skew,
    not the cluster. Output columns = big's + small's (minus the
    duplicate key), like a plain ``join(small, key)``.
    """
    salted_big = big.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % salt_buckets)
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    replicated = small.select("*", salts)
    out = salted_big.join(replicated, [key, "_salt"]).drop("_salt")
    return out
