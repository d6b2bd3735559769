"""Skew-resilience utilities: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in :mod:`..session`) covers
sort-merge joins at runtime; these utilities cover the cases AQE cannot:
pre-planned broadcast-incompatible joins against a replicable side, and
heavy-hitter aggregations where one key dominates a partition.

Salting is DETERMINISTIC (hash of the row's own columns, not rand()):
task retries and speculative execution must land a row in the same salt
bucket, or results become retry-dependent.

Result contract: each function is value-equal to its unsalted
counterpart — pinned by tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n))


def salted_join(skewed: DataFrame, other: DataFrame, on: str,
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join where ``skewed``'s join-key distribution has heavy
    hitters: the skewed side gets a deterministic salt in [0, salt); the
    other side is replicated ``salt`` times — the hot key's rows spread
    over ``salt`` tasks instead of one.

    Cost model: replication multiplies the small side's shuffle volume
    by ``salt`` — use when (hot-key rows / salt) still exceeds the
    per-task comfort zone and the other side is modest."""
    s = skewed.withColumn("__salt", _salt_col(skewed, salt))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("bigint"),
                                       F.lit(salt - 1).cast("bigint"))))
    out = s.join(o, [on, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, str], salt: int = 16) -> DataFrame:
    """Two-phase aggregation for heavy-hitter group keys: partial
    aggregate on (keys + salt), then combine on keys.

    ``aggs`` maps column → one of sum|count|min|max (the combinable
    subset; avg = sum/count composed by the caller).  Spark's own
    partial aggregation already does this map-side — the explicit salted
    REDUCE phase matters when a single group's partials still
    concentrate on one reducer (e.g. high-cardinality payloads per
    group)."""
    partial_exprs, final_exprs = [], []
    for col, how in aggs.items():
        p = f"__p_{col}"
        if how == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{how}_{col}"))
        elif how == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{how}_{col}"))
        elif how == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(f"{how}_{col}"))
        elif how == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(f"{how}_{col}"))
        else:
            raise ValueError(f"uncombinable aggregate: {how}")
    salted = df.withColumn("__salt", _salt_col(df, salt))
    return (salted.groupBy(*keys, "__salt").agg(*partial_exprs)
            .groupBy(*keys).agg(*final_exprs))


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Shuffle-health diagnostic for a prospective join/agg key: one row
    of key-frequency distribution stats — key count, max and p50/p99
    frequency, the heaviest key, and the share of rows the top key owns.
    This is the measurement that decides salting (operators/skew) or an
    AQE skew-join threshold BEFORE a 100 TB shuffle, not after it spills.

    One groupBy on the key (the same shuffle the real job would do, but
    counting only) and a single-row rollup; exact percentiles over the
    per-key counts via sort-free percentile_approx? No — counts are one
    row per key, so the exact percentile window is cheap at any scale
    where the diagnostic itself is feasible."""
    counts = (df.groupBy(F.col(key_col).alias("k"))
              .agg(F.count(F.lit(1)).alias("c")))
    return counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.expr("CAST(percentile(c, 0.5) AS DOUBLE)").alias("p50_key_rows"),
        F.expr("CAST(percentile(c, 0.99) AS DOUBLE)").alias("p99_key_rows"),
        F.max_by("k", "c").cast("string").alias("heaviest_key"),
        F.round(F.max("c") / F.sum("c"), 6).alias("top_key_row_share"))
