"""Distributed exact global ranking / NTILE — no single-partition window.

A window with no PARTITION BY (``ROW_NUMBER() OVER (ORDER BY ...)``,
``NTILE(n) OVER (ORDER BY ...)``) moves EVERY row into one partition in
Spark's physical plan — correct, but a one-task sort that dies at scale.
The standard distributed replacement (what zipWithIndex does for RDDs,
re-expressed on DataFrames):

1. range-repartition on the order keys (ordered, parallel partitions);
2. partition-LOCAL ranks via a window keyed by the stable partition id —
   every partition sorts in parallel;
3. per-partition row counts → cumulative offsets (one tiny collect,
   bounded by the partition count, never by the data);
4. global rank = partition offset + local rank, NTILE from the rank by
   the SQL-standard floor-division formula.

The output is EXACTLY the single-window result for any total order
(unique tie-break keys required): range boundaries vary run to run, but
ranks depend only on the order, not on where partitions split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from .materialize import materialize


def with_global_rank(df: DataFrame, order_cols: list[Column],
                     rank_col: str = "__rank",
                     num_partitions: int | None = None) -> DataFrame:
    """Add a 1-based exact global rank by ``order_cols`` (which must be
    a total order — include a unique tie-break) without a
    single-partition window."""
    spark = df.sparkSession
    n_parts = int(num_partitions
                  or spark.sparkContext.defaultParallelism)
    ranged = (df.repartitionByRange(n_parts, *order_cols)
              .withColumn("__pid", F.spark_partition_id())
              .transform(materialize))  # pin the pid assignment
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn("__lrank", F.row_number().over(w))
    sizes = (ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
             .orderBy("__pid").collect())
    offset, offsets = 0, {}
    for r in sizes:
        offsets[r["__pid"]] = offset
        offset += r["__n"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off bigint")
    return (local.join(F.broadcast(off_df), "__pid")
            .withColumn(rank_col,
                        (F.col("__off") + F.col("__lrank")).cast("bigint"))
            .drop("__pid", "__lrank", "__off"))


def ntile_expr(rank_col: str, total: int, n: int) -> Column:
    """SQL-standard NTILE from a 1-based global rank: the first
    ``total mod n`` tiles hold ``total div n + 1`` rows, the rest
    ``total div n`` — identical to Spark's and DuckDB's NTILE
    distribution, computed as a pure expression."""
    size, rem = total // n, total % n
    big = rem * (size + 1)
    if size == 0:  # fewer rows than tiles: tile = rank
        return F.col(rank_col).cast("int")
    # integer `div`, exact at any scale (a double round-trip is not)
    return (F.when(F.col(rank_col) - 1 < big,
                   F.expr(f"({rank_col} - 1) div {size + 1}"))
            .otherwise(rem + F.expr(f"(({rank_col} - 1) - {big})"
                                    f" div {size}"))
            .cast("int") + 1)


def distributed_ntile(df: DataFrame, order_cols: list[Column], n: int,
                      out_col: str) -> DataFrame:
    """NTILE(n) OVER (ORDER BY order_cols) without a single-partition
    window; bit-identical to the window form for any total order."""
    total = df.count()
    ranked = with_global_rank(df, order_cols)
    return (ranked.withColumn(out_col, ntile_expr("__rank", total, n))
            .drop("__rank"))


def with_range_frame_count(df: DataFrame, value_col: str, id_cols: list[str],
                           lo: float, hi: float,
                           out_col: str = "__n_within",
                           num_partitions: int | None = None) -> DataFrame:
    """``COUNT(*) OVER (ORDER BY value RANGE BETWEEN |lo| PRECEDING AND
    hi FOLLOWING)`` without a single-partition window.

    The value-RANGE frame count is a pure CDF difference —
    ``cnt_le(v + hi) - cnt_lt(v + lo)`` — so it reduces to distributed
    global prefix-sums: union the data points (weight 1) with two query
    points per row (weight 0, tagged ``le``/``lt``), range-repartition on
    the merged sort key, run partition-local running sums in parallel,
    and lift them to global sums with the partition-count-bounded offset
    collect (same discipline as :func:`with_global_rank`).  Tie-break:
    ``lt`` queries sort BEFORE data at an equal value (strict <), ``le``
    queries AFTER (inclusive <=) — boundary arithmetic is the identical
    IEEE ``v + const`` both Spark's and DuckDB's window operators
    evaluate, so results are bit-equal to the single-window form.

    ``id_cols`` must uniquely key ``df`` rows; work is O(n log n) across
    ALL partitions (3 rows per input row), never a one-task sort.
    """
    spark = df.sparkSession
    n_parts = int(num_partitions or spark.sparkContext.defaultParallelism)
    v = F.col(value_col).cast("double")
    base = df.select(*id_cols, v.alias("__v")).transform(materialize)
    data = base.select(
        *[F.lit(None).cast(base.schema[c].dataType).alias(c)
          for c in id_cols],
        F.col("__v"), F.lit(0).alias("__tb"), F.lit(1).alias("__w"))
    q_lt = base.select(*id_cols, (F.col("__v") + F.lit(float(lo))).alias("__v"),
                       F.lit(-1).alias("__tb"), F.lit(0).alias("__w"))
    q_le = base.select(*id_cols, (F.col("__v") + F.lit(float(hi))).alias("__v"),
                       F.lit(1).alias("__tb"), F.lit(0).alias("__w"))
    merged = (data.unionByName(q_lt).unionByName(q_le)
              .repartitionByRange(n_parts, F.col("__v"), F.col("__tb"))
              .withColumn("__pid", F.spark_partition_id())
              .transform(materialize))  # pin the pid assignment
    w = (Window.partitionBy("__pid").orderBy("__v", "__tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = merged.withColumn("__csum", F.sum("__w").over(w))
    sizes = (merged.groupBy("__pid").agg(F.sum("__w").alias("__n"))
             .orderBy("__pid").collect())
    offset, offsets = 0, {}
    for r in sizes:
        offsets[r["__pid"]] = offset
        offset += int(r["__n"] or 0)
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off bigint")
    counts = (local.where(F.col("__tb") != 0)
              .join(F.broadcast(off_df), "__pid")
              .withColumn("__cnt", F.col("__off") + F.col("__csum"))
              .groupBy(*id_cols)
              .agg(F.sum(F.when(F.col("__tb") == 1, F.col("__cnt"))
                         .otherwise(-F.col("__cnt")))
                   .cast("bigint").alias(out_col)))
    return df.join(counts, id_cols)


def topk_with_rank(df: DataFrame, order_cols: list[Column], k: int,
                   rank_col: str = "rank") -> DataFrame:
    """Global top-k WITH a rank column, without ranking the whole
    relation: a distributed TakeOrdered (`orderBy().limit(k)`) prunes
    to k rows per partition before the single-partition step, then the
    rank window runs over exactly k rows.  Bit-identical to
    `row_number() OVER (ORDER BY ...) <= k` for any total order — the
    window form shuffles EVERY row to one partition first (Spark does
    not WindowGroupLimit-prune empty-partition windows)."""
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return top.withColumn(rank_col,
                          F.row_number().over(w).cast("int"))


def with_global_cumsum(df: DataFrame, order_cols: list[Column],
                       value_col: str, out_col: str = "__cum",
                       num_partitions: int | None = None) -> DataFrame:
    """Exact global running sum of ``value_col`` by ``order_cols``
    (a total order) without a single-partition window — the cumsum
    sibling of :func:`with_global_rank`: range-repartition, partition-
    local cumulative window, per-partition totals lifted to offsets by
    one bounded collect (partition-count rows, never data).

    ``value_col`` must be INTEGRAL: the lifted offsets go through
    ``int()`` and the output is cast to bigint, so fractional weights
    would be silently floored — raise instead."""
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType)
    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (ByteType, ShortType, IntegerType,
                              LongType)):
        raise TypeError(
            f"with_global_cumsum needs an integral value column; "
            f"{value_col} is {vtype.simpleString()}")
    spark = df.sparkSession
    n_parts = int(num_partitions
                  or spark.sparkContext.defaultParallelism)
    ranged = (df.repartitionByRange(n_parts, *order_cols)
              .withColumn("__pid", F.spark_partition_id())
              .transform(materialize))  # pin the pid assignment
    w = (Window.partitionBy("__pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, 0))
    local = ranged.withColumn("__lc", F.sum(value_col).over(w))
    sizes = (ranged.groupBy("__pid")
             .agg(F.sum(value_col).alias("__s"))
             .orderBy("__pid").collect())
    offset, offsets = 0, {}
    for r in sizes:
        offsets[r["__pid"]] = offset
        offset += r["__s"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __off bigint")
    return (local.join(F.broadcast(off_df), "__pid")
            .withColumn(out_col,
                        (F.col("__off") + F.col("__lc")).cast("bigint"))
            .drop("__pid", "__lc", "__off"))
