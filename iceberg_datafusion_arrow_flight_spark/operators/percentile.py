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


# --- mergeable HDR-histogram quantile sketch ----------------------------

def hdr_sketch(df: DataFrame, value_col: str, group_cols: Sequence[str],
               scale: int = 100) -> DataFrame:
    """Mergeable quantile sketch: HDR-histogram-family base-10 binning at
    2 significant digits.  A value is scaled to an integer
    (``round(value * scale)``) and binned by (sign, decimal digit count
    of |v|, leading two digits of |v|) — pure integer/string
    expressions, so the sketch is byte-identical on any engine (unlike
    log2 binning, where the last ulp of a C vs JVM log differs).
    Binning the magnitude with an explicit sign column makes the whole
    real line valid input: negative values land in sign=-1 bins (a raw
    signed stringify would put the '-' into the mantissa substring and
    yield NULL bins), zero gets its own exact sign=0 bin.  Relative
    error of any reconstructed quantile is bounded by half a bin:
    <= 5% of |value| at 2 significant digits (exact for zero).

    The sketch IS a (group, sign, bin, count) relation: merging two
    sketches is ``union -> groupBy -> sum`` (counts add), which makes it
    the shuffle-friendly distributed form — partial sketches combine
    map-side exactly like partial aggregates.  Completes the mergeable-
    sketch family next to HLL (events_hll_sketch_merge) and count-min
    (sketch_count_min)."""
    iv = F.round(F.col(value_col) * scale).cast("bigint")
    sign = (F.when(iv < 0, F.lit(-1)).when(iv > 0, F.lit(1))
            .otherwise(F.lit(0))).cast("int")
    s = F.abs(iv).cast("string")
    d = F.length(s)
    mant = F.substring(s, 1, 2).cast("bigint")
    return (df.select(*group_cols, sign.alias("sign"),
                      d.alias("n_digits"), mant.alias("mantissa"))
            .groupBy(*group_cols, "sign", "n_digits", "mantissa")
            .agg(F.count(F.lit(1)).cast("bigint").alias("bin_count")))


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches by bin-count addition (associative + commutative)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "bin_count"]
    return (out.groupBy(*keys)
            .agg(F.sum("bin_count").cast("bigint").alias("bin_count")))


def hdr_quantiles(sketch: DataFrame, group_cols: Sequence[str],
                  quantiles: Sequence[float] = (0.5, 0.9, 0.99),
                  scale: int = 100) -> DataFrame:
    """Answer quantiles from a sketch: per group, the smallest bin whose
    cumulative count reaches ``ceil(q * n)``; the reported value is the
    bin midpoint un-scaled.  One window pass answers EVERY requested
    quantile (a new quantile adds a conditional-min aggregate, not a
    scan).  Threshold compares integer cross-products — no float
    boundary flake."""
    # Value order over sign-magnitude bins, in pure integer keys: sign
    # ascending, then magnitude ascending for positives but DESCENDING
    # for negatives — i.e. (sign, sign*n_digits, sign*mantissa).
    sgn = F.col("sign")
    w = (Window.partitionBy(*group_cols)
         .orderBy(sgn, sgn * F.col("n_digits"), sgn * F.col("mantissa"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy(*group_cols)
    # signed bin midpoint in scaled units:
    # sign * (mantissa + 0.5) * 10^(n_digits - len(mantissa));
    # sign=0 (the exact zero bin) makes the midpoint exactly 0.
    mant_digits = F.length(F.col("mantissa").cast("string"))
    rep = (sgn * (F.col("mantissa") + 0.5)
           * F.pow(F.lit(10.0), (F.col("n_digits") - mant_digits)
                   .cast("double"))) / scale
    cum = (sketch
           .withColumn("__cum", F.sum("bin_count").over(w))
           .withColumn("__n", F.sum("bin_count").over(wg))
           .withColumn("__rep", rep))
    aggs = []
    for q in quantiles:
        qnum = int(round(q * 10000))
        cond = (10000 * F.col("__cum")) >= (qnum * F.col("__n"))
        aggs.append(F.round(F.min(F.when(cond, F.col("__rep"))), 6)
                     .alias(f"q{str(q).replace('0.', '')}"))
    return (cum.groupBy(*group_cols)
            .agg(F.max("__n").alias("n_values"), *aggs))


def equi_width_histogram(df: DataFrame, value_col: str,
                         lo: float, hi: float,
                         n_bins: int = 20,
                         group_cols: Sequence[str] = ()) -> DataFrame:
    """Equi-width histogram over a fixed [lo, hi) range: bin i covers
    [lo + i·w, lo + (i+1)·w); values outside clamp to the edge bins so
    counts always total the input.  Complements the HDR log-bin sketch:
    equi-width for a known range (dashboards, bounded metrics), log
    bins for heavy-tailed unknowns.  Mergeable the same way — counts
    add.  One groupBy on (groups, bin); identical IEEE arithmetic on
    any engine makes the bin assignment exactly reproducible."""
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w))
    bin_ = F.least(F.lit(n_bins - 1),
                   F.greatest(F.lit(0), raw)).cast("int")
    return (df.select(*group_cols, bin_.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("bin_count")))
