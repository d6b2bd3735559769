"""Window-function plans (SURVEY §2.5).

DF40 window surface: row_number, rank, dense_rank, percent_rank,
cume_dist, ntile, lag/lead, first/last/nth_value, any aggregate as a
window, ROWS/RANGE frames, named WINDOW clauses.  All are same-name Spark
built-ins via ``Window.partitionBy().orderBy().rowsBetween()/
rangeBetween()``.  The one DF40 feature Spark lacks — the GROUPS frame —
is emulated exactly via the dense_rank→RANGE identity
(``window_groups_frame`` below; documented gap, SURVEY §7.1 step 5).

Determinism: every ORDER BY ends in a unique key (orderkey, linenumber)
so ranking/offset functions are stable across engines.

Scale: a window over PARTITION BY k is one shuffle on k + a per-partition
sort; skewed partition keys are the hazard (here the partition keys are
low-cardinality but the fixture is small; at 100 TB you'd partition
windows by a higher-cardinality key or pre-bucket).

Window semantics are [P] datafusion 40.0.0 (Cargo.toml:20) reachable
through ctx.sql at iceberg-datafusion-arrow-flight/src/lib.rs:678 (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import register, table


@register(
    "window_ranking",
    oracle="""
SELECT o_orderkey,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST()    OVER w, 6) AS cd,
       NTILE(4)       OVER w AS quartile
FROM orders
WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
    doc="All six ranking functions over one named window (DF40 named "
        "WINDOW clause, SURVEY §2.5).",
    tags=("window",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderkey,
               ROW_NUMBER()   OVER w AS rn,
               RANK()         OVER w AS rnk,
               DENSE_RANK()   OVER w AS drnk,
               ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
               ROUND(CUME_DIST()    OVER w, 6) AS cd,
               NTILE(4)       OVER w AS quartile
        FROM orders
        WHERE o_custkey % 50 = 0
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)""")


@register(
    "window_offset_lag_lead",
    oracle="""
SELECT l_orderkey, l_linenumber,
       LAG(l_quantity)           OVER w AS prev_qty,
       LAG(l_quantity, 2, -1.0)  OVER w AS prev2_qty,
       LEAD(l_quantity)          OVER w AS next_qty,
       LEAD(l_quantity, 1, 0.0)  OVER w AS next_qty_dflt
FROM lineitem
WHERE l_orderkey <= 400
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
""",
    doc="lag/lead with offsets and defaults.",
    tags=("window",),
)
def window_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lag("l_quantity", 2, -1.0).over(w).alias("prev2_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.lead("l_quantity", 1, 0.0).over(w).alias("next_qty_dflt"))


@register(
    "window_value_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       FIRST_VALUE(l_partkey) OVER w AS first_part,
       LAST_VALUE(l_partkey)  OVER w AS last_part,
       NTH_VALUE(l_partkey, 2) OVER w AS second_part
FROM lineitem
WHERE l_orderkey <= 400
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="first/last/nth_value with an explicit full-partition frame (the "
        "default frame would make last_value degenerate).",
    tags=("window",),
)
def window_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 400)
    w = (Window.partitionBy("l_orderkey").orderBy("l_linenumber")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return li.select(
        "l_orderkey", "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
        F.nth_value("l_partkey", 2).over(w).alias("second_part"))


@register(
    "window_sales_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       ROUND(AVG(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
FROM orders
""",
    doc="Aggregate-as-window: running total + 3-row moving average per "
        "customer (bench headline).",
    tags=("window", "bench"),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return ords.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, Window.currentRow)), 4)
        .alias("moving_avg3"))


@register(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_totalprice_r,
       COUNT(*) OVER (ORDER BY o_totalprice_r
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1k
FROM (SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice_r
      FROM orders WHERE o_custkey % 100 = 0) t
""",
    doc="RANGE frame with numeric offsets (value-based window bounds). "
        "NOT the naive single-partition window (the input is a fixed "
        "FRACTION of orders, so it grows with the table): the value-"
        "RANGE count is the CDF difference cnt_le(v+1000) - "
        "cnt_lt(v-1000), computed by operators/ranking.py:"
        "with_range_frame_count — range-repartitioned parallel prefix "
        "sums over data+query points, offsets lifted by a partition-"
        "count-bounded collect; bit-equal to the window form (identical "
        "IEEE v+const boundary arithmetic to Spark's and DuckDB's RANGE "
        "operators).  Swept by tests/test_plan_shape.py's registry-wide "
        "no-global-window audit.",
    tags=("window",),
)
def window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import with_range_frame_count
    ords = (table(spark, sf_dir, "orders")
            .where(F.col("o_custkey") % 100 == 0)
            .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice_r")))
    return (with_range_frame_count(ords, "o_totalprice_r",
                                   ["o_orderkey"], -1000.0, 1000.0,
                                   out_col="n_within_1k")
            .select("o_orderkey", "o_totalprice_r", "n_within_1k"))


@register(
    "window_agg_mixed_with_groupby",
    oracle="""
SELECT l_returnflag, l_shipyear, yr_qty,
       ROUND(yr_qty / SUM(yr_qty) OVER (PARTITION BY l_returnflag), 6) AS share
FROM (
  SELECT l_returnflag, CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_shipyear,
         ROUND(SUM(l_quantity), 2) AS yr_qty
  FROM lineitem GROUP BY l_returnflag, EXTRACT(year FROM l_shipdate)
) t
""",
    doc="Window over an aggregate (share-of-total pattern): groupBy then "
        "windowed normalization.",
    tags=("window", "aggregate"),
)
def window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = (li.groupBy("l_returnflag", F.year("l_shipdate").alias("l_shipyear"))
           .agg(F.round(F.sum("l_quantity"), 2).alias("yr_qty")))
    w = Window.partitionBy("l_returnflag")
    return agg.select("l_returnflag", "l_shipyear", "yr_qty",
                      F.round(F.col("yr_qty") / F.sum("yr_qty").over(w), 6).alias("share"))


@register(
    "window_groups_frame",
    oracle="""
WITH r AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         DENSE_RANK() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_orderdate) AS dr
  FROM orders WHERE o_orderkey <= 5000
)
SELECT o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_orderpriority ORDER BY dr
           RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS grp_sum
FROM r
""",
    doc="GROUPS window frame (DF40 supports it; Spark and DuckDB do not "
        "— SURVEY §2.5 gap) emulated EXACTLY: dense_rank() collapses "
        "peer groups to consecutive integers, so a RANGE frame of ±k "
        "over the rank ≡ a GROUPS frame of ±k over the original key. "
        "Both engines compute the identity independently.",
    tags=("window", "dialect"),
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 5000)
    by_date = Window.partitionBy("o_orderpriority").orderBy("o_orderdate")
    dr = F.dense_rank().over(by_date)
    grp = (Window.partitionBy("o_orderpriority").orderBy("__dr")
           .rangeBetween(-1, 1))
    return (o.withColumn("__dr", dr)
            .select("o_orderkey",
                    F.round(F.sum("o_totalprice").over(grp), 2)
                     .alias("grp_sum")))


@register(
    "window_named_clause",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(SUM(l_extendedprice) OVER w, 2) AS run_price,
       RANK() OVER w AS rnk
FROM lineitem
WHERE l_orderkey <= 2000
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    doc="Named WINDOW clause (DF40 SQL + Spark SQL both support it, "
        "SURVEY §2.5) — one definition shared by multiple window "
        "functions; identical text runs on the DuckDB oracle.",
    tags=("window", "dialect"),
)
def window_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_orderkey, l_linenumber,
               ROUND(SUM(l_extendedprice) OVER w, 2) AS run_price,
               RANK() OVER w AS rnk
        FROM lineitem
        WHERE l_orderkey <= 2000
        WINDOW w AS (PARTITION BY l_orderkey
                     ORDER BY l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")


@register(
    "window_distinct_count",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) OVER (
            PARTITION BY o_orderstatus
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 99 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS distinct_custs_trailing
FROM orders
""",
    doc="DISTINCT aggregate over a sliding window frame — distinct "
        "customers among the trailing 100 orders per status.  Spark "
        "window functions REJECT `COUNT(DISTINCT …) OVER` outright "
        "(DISTINCT_WINDOW_FUNCTION_UNSUPPORTED), the same class of "
        "engine gap as the GROUPS frame: the faithful emulation is "
        "`size(collect_set(x) OVER w)` — set semantics inside the "
        "frame, then cardinality.  State per row is bounded by the "
        "ROWS frame (≤100 values), so executor memory holds at any "
        "corpus size; the frame's uniquely-ordered (date, key) sort "
        "makes every prefix deterministic.  DuckDB runs the native "
        "DISTINCT window as the oracle.",
    tags=("window",),
)
def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_orderstatus")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(-99, Window.currentRow))
    return (table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus",
                    F.size(F.collect_set("o_custkey").over(w))
                     .cast("bigint").alias("distinct_custs_trailing")))


@register(
    "window_moving_median",
    oracle="""
WITH m AS (
  SELECT o_orderkey, o_orderstatus,
         MEDIAN(o_totalprice) OVER (
            PARTITION BY o_orderstatus
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 50 PRECEDING AND CURRENT ROW) AS moving_median,
         ROW_NUMBER() OVER (
            PARTITION BY o_orderstatus
            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT o_orderkey, o_orderstatus, moving_median
FROM m WHERE rn > 50
""",
    doc="MOVING MEDIAN over a sliding frame — Spark rejects median() "
        "with an ORDER BY / frame outright "
        "(INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), the third member "
        "of the engine-gap family next to GROUPS frames and DISTINCT "
        "windows.  Emulation: sort_array(collect_list) over the frame, "
        "take the middle element — state per row bounded by the 51-row "
        "frame.  The first 50 rows per partition are excluded so every "
        "emitted frame has EXACTLY 51 values: an odd count means the "
        "median is a single element on both engines and no "
        "interpolation arithmetic (whose float spelling differs across "
        "engines) ever runs.  DuckDB runs its native MEDIAN window as "
        "the oracle.",
    tags=("window",),
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_orderstatus")
         .orderBy("o_orderdate", "o_orderkey"))
    frame = w.rowsBetween(-50, Window.currentRow)
    vals = F.sort_array(F.collect_list("o_totalprice").over(frame))
    return (table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus",
                    F.element_at(vals, 26).alias("moving_median"),
                    F.row_number().over(w).alias("rn"))
            .where(F.col("rn") > 50)
            .drop("rn"))


@register(
    "window_filtered_aggregate",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT')
             OVER (PARTITION BY o_orderstatus
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS urgent_running
FROM orders
""",
    doc="FILTER clause on a window aggregate — `agg(x) FILTER (WHERE c) "
        "OVER w` is standard SQL that DuckDB (and Postgres) run "
        "natively; Spark accepts FILTER only on plain aggregates, so "
        "the window form translates to the conditional-expression "
        "equivalent sum(CASE WHEN c THEN x END) OVER w — identical "
        "semantics incl. the all-filtered-frame → NULL case.  Running "
        "urgent-order revenue per status; coarse 2-digit rounding "
        "absorbs the engines' running-sum association order.",
    tags=("window",),
)
def window_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_orderstatus")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cond = F.when(F.col("o_orderpriority") == "1-URGENT",
                  F.col("o_totalprice"))
    return (table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus",
                    F.round(F.sum(cond).over(w), 2)
                     .alias("urgent_running")))


@register(
    "window_time_range_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n_last_hour,
       ROUND(SUM(value) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW), 4)
         AS value_last_hour
FROM events
""",
    doc="Time-interval RANGE frame — `RANGE BETWEEN INTERVAL '1 hour' "
        "PRECEDING` is the per-row trailing-window primitive (rate "
        "limiting, rolling activity).  Spark's RANGE frames take only "
        "numeric offsets on the sort key, so the translation orders by "
        "epoch seconds and ranges over [-3600, 0] — value-based frame "
        "bounds, identical row sets (ties at equal ts are PEERS in "
        "RANGE frames on both engines, so the per-row aggregate is "
        "order-insensitive and needs no unique tie-break).  The sums "
        "round at 4 digits for summation-order ulps.",
    tags=("window", "events"),
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MICROsecond epoch, not unix_timestamp (seconds): truncation would
    # pull in rows just beyond the hour at sub-second offsets — caught
    # by the sf0.1 gate, invisible at sf0.01's sparser per-user series.
    # (unix_micros needs TIMESTAMP; the NTZ cast is UTC under the
    # gate's session timezone, and any constant epoch shift cancels in
    # the frame's value differences anyway)
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
         .rangeBetween(-3_600_000_000, 0))
    return (table(spark, sf_dir, "events")
            .select("event_id", "user_id",
                    F.count(F.lit(1)).over(w).cast("bigint")
                     .alias("n_last_hour"),
                    F.round(F.sum("value").over(w), 4)
                     .alias("value_last_hour")))


@register(
    "window_frame_exclusion",
    oracle="""
SELECT o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
            PARTITION BY o_orderpriority ORDER BY o_orderkey
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
            EXCLUDE CURRENT ROW), 2) AS neighbor_sum,
       CAST(COUNT(*) OVER (
            PARTITION BY o_orderpriority ORDER BY o_orderkey
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
            EXCLUDE CURRENT ROW) AS BIGINT) AS neighbor_n,
       ROUND(AVG(o_totalprice) OVER (
            PARTITION BY o_orderpriority ORDER BY o_orderkey
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
            EXCLUDE CURRENT ROW), 4) AS neighbor_avg
FROM orders
WHERE o_orderkey <= 3000
""",
    doc="Frame EXCLUDE CURRENT ROW (standard SQL:2011 frame exclusion; "
        "DuckDB runs it natively as the oracle) — the fifth engine-gap "
        "window emulation: Spark has no frame-exclusion clause, but "
        "over a ROWS frame the excluded aggregate is EXACTLY the full-"
        "frame aggregate minus the current row's contribution — "
        "sum − x, count − 1, avg = (sum − x)/(count − 1) — all pure "
        "projections on top of one window pass, so the emulation costs "
        "nothing extra.  The leave-one-out window is the local-outlier "
        "primitive ('how do my neighbors look WITHOUT me').  Rounds at "
        "the compare boundary absorb subtraction-order ulps. "
        "plans/windows.py:window_frame_exclusion.",
    tags=("window",),
)
def window_frame_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
         .rowsBetween(-3, 3))
    full_sum = F.sum("o_totalprice").over(w)
    full_n = F.count(F.lit(1)).over(w)
    ex_n = (full_n - 1).cast("bigint")
    # SQL semantics for an EMPTY excluded frame (single-row partition):
    # SUM/AVG over zero rows are NULL, not 0 — gate the subtraction form
    # on ex_n > 0 so the emulation matches DuckDB's native EXCLUDE.
    ex_sum = F.when(ex_n > 0, full_sum - F.col("o_totalprice"))
    return (table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") <= 3000)
            .select("o_orderkey",
                    F.round(ex_sum, 2).alias("neighbor_sum"),
                    ex_n.alias("neighbor_n"),
                    F.round(F.when(ex_n > 0, ex_sum / ex_n), 4)
                     .alias("neighbor_avg")))


@register(
    "window_cume_dist_percent_rank",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey
                                  ORDER BY EXTRACT(year FROM o_orderdate)),
             6) AS pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                               ORDER BY EXTRACT(year FROM o_orderdate)),
             6) AS cume
FROM orders WHERE o_custkey % 50 = 0
ORDER BY o_custkey, o_orderkey
""",
    doc="PERCENT_RANK + CUME_DIST relative-rank window functions "
        "(DF40 window surface, datafusion-functions-window) over a "
        "HIGH-CARDINALITY partition key (per-customer order-year "
        "ranking) — deliberately ordered by a coarse key so peer "
        "groups are real: CUME_DIST counts peers-inclusive, "
        "PERCENT_RANK (rank-1)/(n-1) with the n=1 partition yielding "
        "0.  Scale: partition count grows with customers, per-"
        "partition cardinality stays orders-per-customer — the shape "
        "that keeps relative-rank windows parallel at 100 TB (the "
        "global form is banned by the plan-sweep test). "
        "plans/windows.py:window_cume_pct.",
    tags=("window",),
)
def window_cume_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = (table(spark, sf_dir, "orders")
            .where(F.col("o_custkey") % 50 == 0)
            .select("o_custkey", "o_orderkey",
                    F.year("o_orderdate").alias("yr")))
    w = Window.partitionBy("o_custkey").orderBy("yr")
    return (ords.select("o_custkey", "o_orderkey",
                        F.col("yr").cast("int").alias("yr"),
                        F.round(F.percent_rank().over(w), 6)
                         .alias("pct_rank"),
                        F.round(F.cume_dist().over(w), 6).alias("cume"))
            .orderBy("o_custkey", "o_orderkey"))


@register(
    "window_value_ignore_nulls",
    oracle="""
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_linenumber % 2 = 0 THEN l_quantity END AS q
  FROM lineitem WHERE l_orderkey <= 400
)
SELECT l_orderkey, l_linenumber, q,
       LAST_VALUE(q IGNORE NULLS) OVER w AS carry_fwd,
       FIRST_VALUE(q IGNORE NULLS)
         OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS first_obs
FROM base
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY l_orderkey, l_linenumber
""",
    doc="IGNORE NULLS window navigation: LAST_VALUE(... IGNORE NULLS) "
        "over a running frame is the gap-fill / last-observation-"
        "carried-forward primitive (the sparse-sensor pattern every "
        "time-series backfill needs — and exactly how the as-of join "
        "operator carries its payloads internally); FIRST_VALUE "
        "IGNORE NULLS over the full partition gives the first "
        "observation.  NULLs injected on odd line numbers so the "
        "skipping is genuinely exercised.  Spark spelling: "
        "F.last/F.first(col, ignorenulls=True). "
        "plans/windows.py:window_ignore_nulls.",
    tags=("window",),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (table(spark, sf_dir, "lineitem")
          .where(F.col("l_orderkey") <= 400)
          .select("l_orderkey", "l_linenumber",
                  F.when(F.col("l_linenumber") % 2 == 0,
                         F.col("l_quantity")).alias("q")))
    run = (Window.partitionBy("l_orderkey").orderBy("l_linenumber")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    full = (Window.partitionBy("l_orderkey").orderBy("l_linenumber")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    return (li.select("l_orderkey", "l_linenumber", "q",
                      F.last("q", ignorenulls=True).over(run)
                       .alias("carry_fwd"),
                      F.first("q", ignorenulls=True).over(full)
                       .alias("first_obs"))
            .orderBy("l_orderkey", "l_linenumber"))


@register(
    "window_match_recognize_vshape",
    oracle="""
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS centi
  FROM events
), stepped AS (
  SELECT user_id, ts, event_id, centi,
         CASE WHEN centi > lag_c THEN 1
              WHEN centi < lag_c THEN -1 ELSE 0 END AS s
  FROM (SELECT *, LAG(centi) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS lag_c
        FROM e)
  WHERE lag_c IS NOT NULL
), runs_marked AS (
  SELECT user_id, ts, event_id, centi, s,
         SUM(CASE WHEN s IS DISTINCT FROM lag_s THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM (SELECT *, LAG(s) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS lag_s
        FROM stepped)
), runs AS (
  SELECT user_id, run_id, MIN(s) AS s,
         CAST(COUNT(*) AS BIGINT) AS len,
         MIN(centi) AS lo, MAX(centi) AS hi
  FROM runs_marked GROUP BY user_id, run_id
), vs AS (
  SELECT d.user_id,
         d.hi - d.lo AS depth_centi,
         u.hi - u.lo AS recovery_centi
  FROM runs d JOIN runs u
    ON u.user_id = d.user_id AND u.run_id = d.run_id + 1
  WHERE d.s = -1 AND u.s = 1 AND d.len >= 2 AND u.len >= 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_vshapes,
       CAST(MAX(depth_centi) AS BIGINT) AS max_depth_centi,
       CAST(MAX(recovery_centi) AS BIGINT) AS max_recovery_centi
FROM vs
GROUP BY user_id
HAVING COUNT(*) >= 3
ORDER BY user_id
""",
    doc="MATCH_RECOGNIZE emulation (row-pattern recognition, SQL:2016 "
        "— absent from BOTH Spark and DF40): detect the canonical "
        "V-shape pattern A DOWN{2,} UP{2,} over each user's "
        "event-value series with pure window algebra — per-partition "
        "LAG sign, run-length islands (the gaps-and-islands cumsum), "
        "one self-join of ADJACENT runs (equi on user + run_id+1), "
        "strict-monotone runs make depth/recovery exact endpoint "
        "differences.  Values fold to integer centi-units so every "
        "metric is exact.  Scale: all windows are PARTITIONed by "
        "user_id (shuffle on the natural key, parallel per-user "
        "sorts); the run table is runs-sized, the adjacency join "
        "keyed.  Per-user V counts + deepest drawdown/recovery, "
        "frequent-pattern users only (>= 3). "
        "plans/windows.py:window_match_recognize_vshape.",
    tags=("window", "events"),
)
def window_match_recognize_vshape(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = (table(spark, sf_dir, "events")
         .select("user_id", "ts", "event_id",
                 F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                  .alias("centi")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = (e.withColumn("lag_c", F.lag("centi").over(w))
               .where(F.col("lag_c").isNotNull())
               .withColumn("s",
                           F.when(F.col("centi") > F.col("lag_c"), 1)
                            .when(F.col("centi") < F.col("lag_c"), -1)
                            .otherwise(0)))
    marked = (stepped.withColumn("lag_s", F.lag("s").over(w))
              .withColumn("run_id",
                          F.sum((~F.col("s").eqNullSafe(F.col("lag_s")))
                                .cast("int"))
                           .over(w.rowsBetween(Window.unboundedPreceding,
                                               0))))
    runs = (marked.groupBy("user_id", "run_id")
            .agg(F.min("s").alias("s"),
                 F.count(F.lit(1)).cast("bigint").alias("len"),
                 F.min("centi").alias("lo"), F.max("centi").alias("hi")))
    d = runs.select(F.col("user_id").alias("u"),
                    F.col("run_id").alias("rid"),
                    F.col("s").alias("ds"), F.col("len").alias("dl"),
                    (F.col("hi") - F.col("lo")).alias("depth_centi"))
    u_ = runs.select(F.col("user_id").alias("u"),
                     F.col("run_id").alias("rid2"),
                     F.col("s").alias("us"), F.col("len").alias("ul"),
                     (F.col("hi") - F.col("lo")).alias("recovery_centi"))
    vs = (d.join(u_, (d["u"] == u_["u"]) & (u_["rid2"] == d["rid"] + 1))
          .where((F.col("ds") == -1) & (F.col("us") == 1)
                 & (F.col("dl") >= 2) & (F.col("ul") >= 2))
          .select(d["u"].alias("user_id"), "depth_centi",
                  "recovery_centi"))
    return (vs.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vshapes"),
                 F.max("depth_centi").cast("bigint")
                  .alias("max_depth_centi"),
                 F.max("recovery_centi").cast("bigint")
                  .alias("max_recovery_centi"))
            .where(F.col("n_vshapes") >= 3)
            .orderBy("user_id"))
