"""Aggregate plans: GROUP BY, GROUPING SETS/CUBE/ROLLUP, DISTINCT and
FILTER modifiers, the full DataFusion-40 aggregate function inventory
(SURVEY §2.4), plus tolerance-checked approximate aggregates.

Scale notes: every plan here is a partial+final hash aggregate (map-side
combine), so shuffle traffic is proportional to group count, not row
count.  CUBE/ROLLUP expand rows *after* partial aggregation in Spark
(Expand over grouping-set ids), which is the right side of the tradeoff
at 100 TB.

Approximate aggregates (HLL distinct, quantile sketches) return
engine-specific values, so they cannot hash-match a DuckDB oracle
directly; instead the plan asserts the approximation is within tolerance
of the exact value and emits the *boolean* — both engines then agree.

All aggregate semantics here are [P] behavior of the pinned
datafusion-functions-aggregate 40.0.0 (Cargo.lock:1187), reachable only
through ctx.sql at iceberg-datafusion-arrow-flight/src/lib.rs:678 (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table


@register(
    "agg_global_stats",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(SUM(l_linenumber) AS BIGINT) AS sum_line,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem
""",
    doc="Global (no GROUP BY) multi-aggregate: count/count-distinct/sum/"
        "avg/min/max. DuckDB SUM(int)→HUGEINT, hence the BIGINT cast.",
    tags=("aggregate",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum("l_linenumber").cast("bigint").alias("sum_line"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"))


@register(
    "agg_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="GROUPING SETS with grouping() indicators (SURVEY §2.4).",
    tags=("aggregate", "grouping"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")


@register(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="CUBE: all 2^k grouping combinations.",
    tags=("aggregate", "grouping"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "lineitem")
            .cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n")))


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    doc="ROLLUP: hierarchical prefixes of the grouping keys.",
    tags=("aggregate", "grouping"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


@register(
    "agg_having_filter_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
       ROUND(SUM(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS sum_heavy
FROM lineitem
GROUP BY l_returnflag
HAVING COUNT(*) > 10
""",
    doc="DISTINCT aggregate + FILTER (WHERE ...) clause + HAVING "
        "(SURVEY §2.4 modifiers).",
    tags=("aggregate",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
               ROUND(SUM(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS sum_heavy
        FROM lineitem
        GROUP BY l_returnflag
        HAVING COUNT(*) > 10""")


@register(
    "agg_variance_stddev",
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_samp,
       ROUND(STDDEV_POP(l_quantity), 6) AS sd_pop,
       ROUND(VAR_SAMP(l_quantity), 6) AS var_samp,
       ROUND(VAR_POP(l_quantity), 6) AS var_pop
FROM lineitem GROUP BY l_returnflag
""",
    doc="stddev/variance, sample and population forms.",
    tags=("aggregate", "stats"),
)
def agg_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_quantity"), 6).alias("sd_samp"),
                 F.round(F.stddev_pop("l_quantity"), 6).alias("sd_pop"),
                 F.round(F.var_samp("l_quantity"), 6).alias("var_samp"),
                 F.round(F.var_pop("l_quantity"), 6).alias("var_pop")))


@register(
    "agg_corr_covar_regr",
    oracle="""
SELECT l_returnflag,
       ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_pq,
       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 4) AS covs,
       ROUND(COVAR_POP(l_extendedprice, l_quantity), 4) AS covp,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
       ROUND(REGR_AVGX(l_extendedprice, l_quantity), 6) AS avgx,
       ROUND(REGR_AVGY(l_extendedprice, l_quantity), 4) AS avgy,
       CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
    doc="Bivariate stats: corr, covar_samp/pop, regr_* family "
        "(SURVEY §2.4 — DF40 datafusion-functions-aggregate).",
    tags=("aggregate", "stats"),
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (table(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.corr(y, x), 6).alias("corr_pq"),
                 F.round(F.covar_samp(y, x), 4).alias("covs"),
                 F.round(F.covar_pop(y, x), 4).alias("covp"),
                 F.round(F.regr_slope(y, x), 6).alias("slope"),
                 F.round(F.regr_intercept(y, x), 4).alias("intercept"),
                 F.round(F.regr_r2(y, x), 6).alias("r2"),
                 F.round(F.regr_avgx(y, x), 6).alias("avgx"),
                 F.round(F.regr_avgy(y, x), 4).alias("avgy"),
                 F.regr_count(y, x).cast("bigint").alias("n")))


@register(
    "agg_min_max_by",
    oracle="""
SELECT l_returnflag,
       (MIN(struct_pack(a := l_shipdate, b := l_orderkey))).b AS first_order,
       (MAX(struct_pack(a := l_shipdate, b := l_orderkey))).b AS last_order
FROM lineitem GROUP BY l_returnflag
""",
    doc="min_by/max_by ≡ DF40 first_value/last_value aggregate forms with "
        "ORDER BY (deterministic arg-min/arg-max).",
    tags=("aggregate",),
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ties on l_shipdate are possible; make arg-min/max deterministic by
    # composing a unique ordering key (shipdate, orderkey) into a struct —
    # struct comparison is lexicographic in both engines.
    li = table(spark, sf_dir, "lineitem")
    key = F.struct(F.col("l_shipdate"), F.col("l_orderkey"))
    return (li.groupBy("l_returnflag")
            .agg(F.min_by("l_orderkey", key).alias("first_order"),
                 F.max_by("l_orderkey", key).alias("last_order")))


@register(
    "agg_array_collect",
    oracle="""
SELECT o_orderstatus,
       CAST(to_json(LIST_SORT(LIST(o_orderpriority)))          AS VARCHAR) AS priorities,
       CAST(to_json(LIST_SORT(LIST(DISTINCT o_orderpriority))) AS VARCHAR) AS distinct_priorities
FROM orders
WHERE o_custkey % 100 = 0
GROUP BY o_orderstatus
""",
    doc="array_agg / array_agg DISTINCT (DF40) ≡ collect_list/collect_set; "
        "sorted on both sides because collection order is engine-defined. "
        "Result arrays are JSON-serialized: the driver's canonicalizer can "
        "only hash scalar columns (CORRECTNESS_r02 ERR class).",
    tags=("aggregate", "array"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "orders")
            .where(F.col("o_custkey") % 100 == 0)
            .groupBy("o_orderstatus")
            .agg(F.to_json(F.sort_array(F.collect_list("o_orderpriority"))).alias("priorities"),
                 F.to_json(F.sort_array(F.collect_set("o_orderpriority"))).alias("distinct_priorities")))


@register(
    "agg_string_agg",
    oracle="""
SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey
""",
    doc="string_agg with ORDER BY (DF40) ≡ ordered listagg / "
        "array_join(sort_array(collect_list)).",
    tags=("aggregate",),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "nation")
            .groupBy("n_regionkey")
            .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",")
                 .alias("nations")))


@register(
    "agg_bool_bit",
    oracle="""
SELECT o_orderstatus,
       BOOL_AND(o_totalprice > 1000) AS all_over_1k,
       BOOL_OR(o_totalprice > 500000) AS any_over_500k,
       CAST(BIT_AND(o_custkey) AS BIGINT) AS band,
       CAST(BIT_OR(o_custkey)  AS BIGINT) AS bor,
       CAST(BIT_XOR(o_custkey) AS BIGINT) AS bxor,
       CAST(COUNT_IF(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
FROM orders GROUP BY o_orderstatus
""",
    doc="bool_and/bool_or, bit_and/or/xor, count_if (SURVEY §2.4 table). "
        "COUNT_IF is BIGINT-cast on both sides: DuckDB widens it to HUGEINT, "
        "which breaks the driver's value hash (the tpch_q12 recipe).",
    tags=("aggregate",),
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
                 F.bool_or(F.col("o_totalprice") > 500000).alias("any_over_500k"),
                 F.bit_and("o_custkey").cast("bigint").alias("band"),
                 F.bit_or("o_custkey").cast("bigint").alias("bor"),
                 F.bit_xor("o_custkey").cast("bigint").alias("bxor"),
                 F.count_if(F.col("o_orderpriority") == "1-URGENT")
                 .cast("bigint").alias("n_urgent")))


@register(
    "agg_median_percentile",
    oracle="""
SELECT l_returnflag,
       ROUND(MEDIAN(l_extendedprice), 4) AS med_price,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.90), 4) AS p90,
       ROUND(QUANTILE_DISC(l_extendedprice, 0.50), 4) AS p50_disc
FROM lineitem GROUP BY l_returnflag
""",
    doc="median + exact continuous/discrete percentiles (DF40 "
        "approx_percentile_cont has an exact Spark analogue: percentile()).",
    tags=("aggregate", "stats"),
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = F.col("l_extendedprice")
    return (table(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.median(p), 4).alias("med_price"),
                 F.round(F.percentile(p, 0.25), 4).alias("p25"),
                 F.round(F.percentile(p, 0.90), 4).alias("p90"),
                 F.round(F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)"), 4)
                 .alias("p50_disc")))


@register(
    "agg_approx_within_tolerance",
    oracle="""
SELECT (ABS(APPROX_COUNT_DISTINCT(l_partkey) - COUNT(DISTINCT l_partkey))
          <= 0.05 * COUNT(DISTINCT l_partkey)) AS hll_ok,
       (ABS(APPROX_QUANTILE(l_extendedprice, 0.5)
            - QUANTILE_CONT(l_extendedprice, 0.5))
          <= 0.05 * QUANTILE_CONT(l_extendedprice, 0.5)) AS quantile_ok
FROM lineitem
""",
    doc="approx_distinct (HLL) + approx_percentile: sketch values are "
        "engine-specific, so the oracle-checkable contract is |approx - "
        "exact| <= 5% — both engines emit the same booleans.",
    tags=("aggregate", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        (F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
         <= 0.05 * F.countDistinct("l_partkey")).alias("hll_ok"),
        (F.abs(F.percentile_approx("l_extendedprice", 0.5, 10000)
               - F.percentile("l_extendedprice", F.lit(0.5)))
         <= 0.05 * F.percentile("l_extendedprice", F.lit(0.5))).alias("quantile_ok"))


@register(
    "agg_exact_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_part,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
       CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS nd_date
FROM lineitem GROUP BY l_returnflag
""",
    doc="Exact COUNT(DISTINCT) — the deterministic twin of "
        "agg_approx_within_tolerance, registered so the distinct-count "
        "family (SURVEY §2.4 approx_distinct row) has one hard driver "
        "row: the HLL query's oracle is a tolerance band, the weakest "
        "kind of evidence.  At scale the exact form is a two-stage "
        "shuffle (partial distinct per partition, then merge); the HLL "
        "twin is the single-pass mergeable-sketch path.",
    tags=("aggregate",),
)
def agg_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.count_distinct(F.col("l_partkey")).alias("nd_part"),
                 F.count_distinct(F.col("l_suppkey")).alias("nd_supp"),
                 F.count_distinct(F.col("l_shipdate")).alias("nd_date")))


@register(
    "agg_weighted_percentile",
    oracle="""
WITH c AS (
  SELECT l_returnflag,
         l_extendedprice AS v,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
             PARTITION BY l_returnflag ORDER BY l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(CAST(l_quantity AS BIGINT)) OVER (
             PARTITION BY l_returnflag) AS tot
  FROM lineitem)
SELECT l_returnflag,
       MIN(CASE WHEN cw >= 0.25 * tot THEN v END) AS p25,
       MIN(CASE WHEN cw >= 0.5 * tot THEN v END) AS p50,
       MIN(CASE WHEN cw >= 0.9 * tot THEN v END) AS p90
FROM c GROUP BY l_returnflag
""",
    doc="Weighted percentile — exact form of DF40's "
        "approx_percentile_cont_with_weight(v, w, q) (former GAPS.md "
        "row): price quantiles weighted by quantity per returnflag, "
        "inverse-weighted-CDF lower rule, all quantiles in one window "
        "pass.  Integer-cast weights make the running sum exact, so the "
        "result is deterministic under value ties and hash-matches the "
        "oracle.  operators/percentile.py:weighted_percentile.",
    tags=("aggregate",),
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentile import weighted_percentile
    li = table(spark, sf_dir, "lineitem")
    return weighted_percentile(
        li, "l_extendedprice", F.col("l_quantity").cast("bigint"),
        {"p25": 0.25, "p50": 0.5, "p90": 0.9}, by=("l_returnflag",))


@register(
    "agg_hdr_quantile_sketch",
    oracle="""
WITH scaled AS (
  SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS iv
  FROM lineitem
), sk AS (
  SELECT l_returnflag, length(CAST(iv AS VARCHAR)) AS n_digits,
         CAST(substr(CAST(iv AS VARCHAR), 1, 2) AS BIGINT) AS mantissa,
         CAST(COUNT(*) AS BIGINT) AS bin_count
  FROM scaled GROUP BY 1, 2, 3
), cum AS (
  SELECT l_returnflag, bin_count,
         SUM(bin_count) OVER (PARTITION BY l_returnflag
                              ORDER BY n_digits, mantissa
                              ROWS UNBOUNDED PRECEDING) AS c,
         SUM(bin_count) OVER (PARTITION BY l_returnflag) AS n,
         (mantissa + 0.5)
           * POWER(10, n_digits - length(CAST(mantissa AS VARCHAR))) / 100
           AS rep
  FROM sk
)
SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_values,
       ROUND(MIN(CASE WHEN 10000 * c >= 5000 * n THEN rep END), 6) AS q5,
       ROUND(MIN(CASE WHEN 10000 * c >= 9000 * n THEN rep END), 6) AS q9,
       ROUND(MIN(CASE WHEN 10000 * c >= 9900 * n THEN rep END), 6) AS q99
FROM cum GROUP BY l_returnflag
""",
    doc="Mergeable HDR-histogram quantile sketch (base-10, 2 significant "
        "digits — integer/string binning, engine-portable): build per "
        "l_returnflag over l_extendedprice, answer p50/p90/p99 from one "
        "window pass.  Counts add across partial sketches (merge "
        "invariant pinned by pytest) — the third mergeable sketch next "
        "to HLL and count-min. operators/percentile.py:hdr_sketch.",
    tags=("aggregate", "sketch"),
)
def agg_hdr_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentile import hdr_quantiles, hdr_sketch
    li = table(spark, sf_dir, "lineitem")
    sk = hdr_sketch(li, "l_extendedprice", ["l_returnflag"])
    return hdr_quantiles(sk, ["l_returnflag"])


@register(
    "agg_pivot_lang_by_source",
    oracle="""
SELECT source,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
       CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
       CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
       CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
       CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
FROM documents GROUP BY source ORDER BY source
""",
    doc="PIVOT — a Spark-side surplus (DF40's sqlparser has no PIVOT; "
        "GAPS.md surplus list): document counts by source pivoted on an "
        "explicit language list.  Explicit pivot values keep the plan a "
        "single partial+final aggregate (no distinct-values pre-pass); "
        "empty cells fill 0 to match the CASE-sum oracle.",
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .pivot("lang", ["en", "de", "fr", "es", "zh"])
            .count().na.fill(0)
            .select("source", *[F.col(c).cast("bigint").alias(c)
                                for c in ("en", "de", "fr", "es", "zh")])
            .orderBy("source"))


@register(
    "agg_equi_width_histogram",
    oracle="""
SELECT l_returnflag,
       CAST(LEAST(19, GREATEST(0,
            FLOOR((l_extendedprice - 900.0) / ((105000.0 - 900.0) / 20))))
            AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS bin_count
FROM lineitem
GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="Equi-width histogram (20 bins over [900, 105000)) of "
        "l_extendedprice per returnflag, edge-clamped so counts total "
        "the input — the fixed-range profiling complement to the HDR "
        "log-bin sketch; counts add across partial histograms. "
        "operators/percentile.py:equi_width_histogram.",
    tags=("aggregate", "sketch"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentile import equi_width_histogram
    li = table(spark, sf_dir, "lineitem")
    return (equi_width_histogram(li, "l_extendedprice", 900.0, 105000.0,
                                 n_bins=20, group_cols=("l_returnflag",))
            .orderBy("l_returnflag", "bin"))


@register(
    "agg_mode_deterministic",
    oracle="""
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
), ranked AS (
  SELECT o_orderpriority, o_orderstatus,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY n DESC, o_orderstatus) AS r
  FROM c
)
SELECT o_orderpriority, o_orderstatus AS modal_status
FROM ranked WHERE r = 1 ORDER BY o_orderpriority
""",
    doc="MODE aggregate, deterministic form: the most frequent order "
        "status per priority, ties broken toward the smallest value — "
        "Spark's mode(col, deterministic=true) contract, which the "
        "oracle spells as an explicit count-rank with the same "
        "tie-break (DuckDB's own mode() is first-encountered-wins and "
        "therefore not cross-engine comparable).  One grouped count "
        "plus a per-group argmax.",
    tags=("aggregate",),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.mode("o_orderstatus", True).alias("modal_status"))
            .orderBy("o_orderpriority"))


@register(
    "agg_higher_moments",
    oracle="""
WITH m AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         AVG(o_totalprice) AS mu,
         SUM(o_totalprice * o_totalprice) AS s2,
         SUM(o_totalprice * o_totalprice * o_totalprice) AS s3,
         SUM(o_totalprice * o_totalprice * o_totalprice * o_totalprice)
             AS s4
  FROM orders GROUP BY o_orderpriority
), c AS (
  SELECT o_orderpriority, n, mu,
         s2 / n - mu * mu                                   AS m2,
         s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu        AS m3,
         s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
               - 3 * mu * mu * mu * mu                      AS m4
  FROM m
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n,
       ROUND(m3 / pow(m2, 1.5), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
FROM c
ORDER BY o_orderpriority
""",
    doc="Skewness + excess kurtosis per group — the 3rd/4th-moment "
        "siblings of the variance entry (value-distribution shape "
        "checks: heavy tails and asymmetry that stddev cannot see).  "
        "Spark's skewness()/kurtosis() are POPULATION central-moment "
        "forms (m3/m2^1.5, m4/m2^2 − 3); DuckDB's builtins are "
        "sample-adjusted and would hash-mismatch, so the oracle "
        "recomputes Spark's exact definition from raw power sums — "
        "one partial-aggregable pass on both sides.  ROUND(...,6) "
        "absorbs the last-ulp difference between the central-moment "
        "and power-sum evaluation orders.",
    tags=("aggregate",),
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.skewness("o_totalprice"), 6).alias("skewness"),
                 F.round(F.kurtosis("o_totalprice"), 6).alias("kurtosis"))
            .orderBy("o_orderpriority"))


@register(
    "agg_equi_depth_histogram",
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT CAST(bin AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_centi
FROM ranked
GROUP BY bin
ORDER BY bin
""",
    doc="Exact equi-DEPTH histogram of order totals (10 bins of "
        "near-equal row count via NTILE with an id tie-break — the "
        "SQL-standard floor-division distribution both engines share), "
        "with exact per-bin extremes and centi-unit sums — the "
        "selectivity-estimation summary equi-width histograms get "
        "wrong on skewed value distributions (a heavy tail collapses "
        "into one overloaded width bin; depth bins track quantiles by "
        "construction).  Complements agg_equi_width_histogram and the "
        "HDR sketch: exact depths vs fixed widths vs mergeable "
        "approximation.  Scale: a DISTRIBUTED exact NTILE — range "
        "partition + parallel per-partition ranks + broadcast offsets "
        "(operators/ranking.py), never the single-partition global "
        "window; the approximate path is the HDR entry.  Then a "
        "10-group rollup. "
        "plans/aggregates.py:agg_equi_depth.",
    tags=("aggregate",),
)
def agg_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import distributed_ntile
    o = table(spark, sf_dir, "orders")
    # DISTRIBUTED exact NTILE (operators/ranking.py) — a global window
    # would single-partition the whole table; range partition + offset
    # keeps the sort parallel and is bit-identical.
    ranked = distributed_ntile(
        o.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice"), F.col("o_orderkey")], 10, "bin")
    return (ranked.groupBy(F.col("bin").cast("int").alias("bin"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi"),
                 F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                       .cast("bigint")).cast("bigint").alias("sum_centi"))
            .orderBy("bin"))


@register(
    "agg_grouping_id_bitmask",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    doc="GROUPING flags + the GROUPING_ID bitmask over CUBE — the "
        "disambiguator that tells a report's NULL-from-rollup apart "
        "from NULL-in-data (DF40 grouping_id surface).  Spelling map "
        "pinned: Spark grouping(c) == DuckDB GROUPING(c), Spark "
        "grouping_id() (all grouping columns, big-endian bit order) == "
        "DuckDB GROUPING(c1, c2). "
        "plans/aggregates.py:agg_grouping_id.",
    tags=("aggregate",),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
            .agg(F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int")
                  .alias("g_priority"),
                 F.grouping_id().cast("int").alias("gid"),
                 F.count(F.lit(1)).cast("bigint").alias("n"))
            .select("o_orderstatus", "o_orderpriority",
                    "g_status", "g_priority", "gid", "n")
            .orderBy("gid",
                     F.col("o_orderstatus").asc_nulls_first(),
                     F.col("o_orderpriority").asc_nulls_first()))
