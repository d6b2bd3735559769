"""Weighted percentile — the exact form of DataFusion-40's
``approx_percentile_cont_with_weight(value, weight, q)`` ([P]
datafusion-functions-aggregate 40.0.0, Cargo.lock:1187, reachable via
ctx.sql at iceberg-datafusion-arrow-flight/src/lib.rs:678; SURVEY §2.4 listed it as a
documented gap — closed here).

Definition (inverse weighted CDF, lower rule): the q-th weighted
percentile of (v_i, w_i) is the smallest v such that
``sum(w_j for v_j <= v) >= q * sum(w)``.  DF's t-digest sketch
approximates exactly this; we compute it exactly, which is strictly
stronger and lets a DuckDB oracle verify value-for-value.

Plan shape / scale: one hash-partition shuffle on the group keys, a
per-group sort for the running sum (window), then a partial+final hash
aggregate.  All percentiles are answered in ONE pass over the window —
adding a percentile adds a conditional-min aggregate, not a scan.  No
Python, no collect; survives arbitrarily many groups.  Skewed single
groups sort within one partition — for a 100 TB single-group quantile
prefer ``percentile_approx`` (sketch, mergeable) and accept the
approximation, same tradeoff the reference makes.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_percentile(df: DataFrame, value_col: str, weight_col,
                        percentiles: Mapping[str, float],
                        by: Sequence[str] = ()) -> DataFrame:
    """Exact weighted percentiles per group.

    ``percentiles`` maps output alias -> q in (0, 1].  ``weight_col``
    may be a column name or a Column (e.g. an exactness-preserving
    cast — integer weights make the running sum order-independent and
    therefore fully deterministic under ties).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    keys = [F.col(k) for k in by]
    run = (Window.partitionBy(*keys).orderBy(value_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    whole = Window.partitionBy(*keys)
    base = (df.select(*keys, F.col(value_col), w.alias("__w"))
              .withColumn("__cw", F.sum("__w").over(run))
              .withColumn("__tot", F.sum("__w").over(whole)))
    aggs = [F.min(F.when(F.col("__cw") >= F.lit(q) * F.col("__tot"),
                         F.col(value_col))).alias(alias)
            for alias, q in percentiles.items()]
    return base.groupBy(*keys).agg(*aggs)
