"""Binned (interval-bucketed) range join — the scale path for
band/interval predicates.

A plain ``l.ts BETWEEN r.start AND r.end`` join plans as a nested-loop
(BroadcastNestedLoopJoin when one side broadcasts, else O(n·m)).  At
100 TB neither side broadcasts.  The standard fix (same idea DuckDB's
IEJoin and Databricks' range-join optimization implement in-engine):

1. pick a bin width w;
2. explode each interval [start, end] onto every bin it overlaps
   (⌈len/w⌉ rows — bounded when intervals are bounded);
3. map each point to its single bin;
4. EQUI-join on the bin id (hash shuffle, partial-aggregation friendly);
5. re-check the exact predicate as a residual filter.

Result is value-identical to the naive join (tests pin it); the plan is
a hash join instead of a nested loop.  Bin width trades replication
(long intervals → many bins) against selectivity (wide bins → more
residual-filtered rows); set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_interval_range_join(points: DataFrame, intervals: DataFrame,
                              point_col: str, start_col: str, end_col: str,
                              bin_width: float, how: str = "inner",
                              ) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` via bin-bucketed equi-join + residual.

    Numeric or epoch-second columns; for timestamps pass unix seconds."""
    p_bin = F.floor(F.col(point_col) / F.lit(bin_width)).cast("bigint")
    p = points.withColumn("__bin", p_bin)
    i_bins = F.sequence(
        F.floor(F.col(start_col) / F.lit(bin_width)).cast("bigint"),
        F.floor(F.col(end_col) / F.lit(bin_width)).cast("bigint"))
    i = intervals.withColumn("__bin", F.explode(i_bins))
    joined = p.join(i, "__bin", how)
    return (joined
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) <= F.col(end_col)))
            .drop("__bin"))
