"""Count-min sketch: mergeable frequency estimation in pure expressions.

The sketch every streaming/telemetry pipeline reaches for when exact
per-key counts stop fitting: ``depth`` hash rows × ``width`` buckets of
counters; estimate = min over rows of the probed counter.  Guarantees:
never an underestimate, overestimate ≤ n/width with probability
1 - (1/2)^depth (classic Cormode-Muthukrishnan bounds).

Engine fit (SURVEY §7.1 step 7 — sketches as first-class operators):

- **Building** is one explode (×depth) + one (row, bucket) partial-agg
  shuffle — the sketch IS a d×w count table, so shuffle volume is d·w
  regardless of input size.
- **Merging** is free by construction: sketches add cell-wise, and a
  cell-wise add is exactly what re-aggregating the union does — the
  property that lets every executor sketch its shard independently at
  100 TB (tested: sketch(A) ⊎ sketch(B) == sketch(A ∪ B)).
- **Hashes are md5-derived** (first 8 hex digits per seeded row) rather
  than xxhash64: both engines compute md5 identically, so the whole
  sketch — not just its error bounds — is DuckDB-oracle-checkable
  bit-for-bit, same trick as the LSH hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(value: Column, row: Column, width: int) -> Column:
    """Bucket of ``value`` in hash row ``row``: first 32 bits of
    md5('cm<row>|<value>') mod width — portable integer arithmetic."""
    h = F.md5(F.concat(F.lit("cm"), row.cast("string"), F.lit("|"), value))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
            % F.lit(width))


def countmin_sketch(df: DataFrame, value_col: str,
                    depth: int = 4, width: int = 256) -> DataFrame:
    """Build the d×w sketch: (row d, bucket, c) — d·w rows total."""
    rows = df.select(
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
        F.col(value_col).alias("__v"))
    return (rows
            .select("d", cm_bucket(F.col("__v"), F.col("d"), width)
                    .alias("bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def countmin_estimate(sketch: DataFrame, probes: DataFrame,
                      value_col: str, depth: int = 4,
                      width: int = 256) -> DataFrame:
    """Estimate each probe value's frequency: min over hash rows of its
    counter (absent bucket ⇒ 0).  The sketch (d·w rows) broadcasts; the
    probe stream is never shuffled."""
    p = probes.select(F.col(value_col).alias("__v")).distinct()
    per_row = p.select(
        "__v",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"))
    per_row = per_row.withColumn(
        "bucket", cm_bucket(F.col("__v"), F.col("d"), width))
    joined = (per_row.join(F.broadcast(sketch), ["d", "bucket"], "left")
              .withColumn("c", F.coalesce(F.col("c"), F.lit(0))))
    return (joined.groupBy("__v")
            .agg(F.min("c").cast("bigint").alias("cm_estimate"))
            .withColumnRenamed("__v", value_col))
