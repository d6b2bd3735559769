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

    Numeric or epoch-second columns; for timestamps pass unix seconds.

    Inner-join only: the residual BETWEEN runs as a post-join filter,
    which would silently drop the null-extended rows of any outer
    variant (turning it back into an inner join) — refuse rather than
    mis-answer."""
    if how != "inner":
        raise ValueError(
            "point_interval_range_join supports how='inner' only: the "
            "residual interval predicate is applied after the join and "
            "would drop outer-join null-extended rows")
    p_bin = F.floor(F.col(point_col) / F.lit(bin_width)).cast("bigint")
    p = points.withColumn("__bin", p_bin)
    i_bins = F.sequence(
        F.floor(F.col(start_col) / F.lit(bin_width)).cast("bigint"),
        F.floor(F.col(end_col) / F.lit(bin_width)).cast("bigint"))
    i = intervals.withColumn("__bin", F.explode(i_bins))
    joined = p.join(i, "__bin", "inner")  # guard above is the only consumer of `how`
    return (joined
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) <= F.col(end_col)))
            .drop("__bin"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bin_width: float) -> DataFrame:
    """INTERVAL × INTERVAL overlap join (`l_start <= r_end AND
    r_start <= l_end`) as a bin-bucketed equi-join — the second half of
    the range-join family beside the point-in-interval form.

    Both sides explode onto every bin their interval covers and
    equi-join on the bin id; the residual re-checks exact overlap.  An
    overlapping pair would then match in EVERY shared bin, so instead
    of a dedup shuffle the join emits each pair exactly once at the bin
    containing the OVERLAP START, ``floor(max(l_start, r_start) / w)``
    — a pure filter inside the join stage (the standard trick
    Databricks' range-join optimization and interval libraries use;
    associativity of the bin grid guarantees that bin is shared).

    Value-identical to the naive theta join; plans as a hash join with
    bounded replication (⌈len/w⌉ rows per interval) instead of a
    nested loop.  Numeric or epoch-second columns."""
    lb = F.sequence(
        F.floor(F.col(l_start) / F.lit(bin_width)).cast("bigint"),
        F.floor(F.col(l_end) / F.lit(bin_width)).cast("bigint"))
    rb = F.sequence(
        F.floor(F.col(r_start) / F.lit(bin_width)).cast("bigint"),
        F.floor(F.col(r_end) / F.lit(bin_width)).cast("bigint"))
    lx = left.withColumn("__bin", F.explode(lb))
    rx = right.withColumn("__rbin", F.explode(rb))
    overlap_start_bin = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bin_width)
    ).cast("bigint")
    return (lx.join(rx, lx["__bin"] == rx["__rbin"])
            .where((F.col(l_start) <= F.col(r_end))
                   & (F.col(r_start) <= F.col(l_end))
                   & (F.col("__bin") == overlap_start_bin))
            .drop("__bin", "__rbin"))
