"""Relational operator plans: joins (all types), set operations,
subqueries, CTEs (incl. recursive), sorts/limits, DISTINCT [ON].

Covers SURVEY §2.3 (joins), §2.6 (sorts/limits/top-k), §2.7 (set ops),
§2.8 (subqueries/CTEs).  Every operator here is reachable in the reference
only as DataFusion-40 SQL through ``ctx.sql`` (lib.rs:678); the Spark
expression is the idiomatic DataFrame/SQL equivalent, with physical
strategy (broadcast vs shuffle vs nested-loop) left to Catalyst + AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table


# ---------------------------------------------------------------- joins

@register(
    "join_inner_equi",
    oracle="""
SELECT o_orderkey, c_name, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 400000
""",
    doc="Inner equi-join orders↔customer. Scale: customer broadcasts; "
        "selective fact filter pushed to the Parquet scan.",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    cst = table(spark, sf_dir, "customer")
    return (ords.join(cst, F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "c_name",
                    F.round("o_totalprice", 2).alias("o_totalprice")))


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, o_orderkey
FROM customer
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) big
  ON c_custkey = o_custkey
""",
    doc="Left outer join with null-extended right side (unmatched "
        "customers surface NULL orderkeys).",
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (cst.join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
            .select("c_custkey", "o_orderkey"))


@register(
    "join_right_outer",
    oracle="""
SELECT o_orderkey, c_custkey
FROM (SELECT * FROM orders WHERE o_totalprice > 450000) big
RIGHT JOIN customer ON c_custkey = o_custkey
""",
    doc="Right outer join (mirror of left; Catalyst flips build side).",
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    cst = table(spark, sf_dir, "customer")
    return (big.join(cst, F.col("c_custkey") == F.col("o_custkey"), "right")
            .select("o_orderkey", "c_custkey"))


@register(
    "join_full_outer",
    oracle="""
SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
      WHERE c_nationkey % 3 = 0 GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
      WHERE s_nationkey % 2 = 0 GROUP BY s_nationkey) s
  ON c.nk = s.nk
""",
    doc="Full outer join of two asymmetric aggregates (mod filters "
        "guarantee unmatched rows on both sides).",
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (table(spark, sf_dir, "customer")
         .where(F.col("c_nationkey") % 3 == 0)
         .groupBy(F.col("c_nationkey").alias("nk"))
         .agg(F.count("*").alias("n_cust")))
    s = (table(spark, sf_dir, "supplier")
         .where(F.col("s_nationkey") % 2 == 0)
         .groupBy(F.col("s_nationkey").alias("nk"))
         .agg(F.count("*").alias("n_supp")))
    return (c.join(s, c.nk == s.nk, "full")
            .select(F.coalesce(c.nk, s.nk).alias("nationkey"),
                    "n_cust", "n_supp"))


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    doc="Cross join of two broadcast-size dims (125 rows). Scale: only "
        "ever sane on small×small or small×big — here both are small.",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "region").select("r_name")
            .crossJoin(table(spark, sf_dir, "nation").select("n_name")))


@register(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
    doc="Left semi join (EXISTS decorrelation — Catalyst "
        "RewritePredicateSubquery, = DataFusion decorrelate_predicate_subquery).",
    tags=("join", "subquery"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (cst.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .select("c_custkey", "c_name"))


@register(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    doc="Left anti join (NOT EXISTS): customers who never ordered.",
    tags=("join", "subquery"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders")
    return (cst.join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name"))


@register(
    "join_non_equi_range",
    oracle="""
SELECT s_suppkey, COUNT(*) AS n_gt
FROM supplier JOIN nation ON s_nationkey < n_nationkey
GROUP BY s_suppkey ORDER BY s_suppkey
""",
    doc="Theta (range-predicate) join → BroadcastNestedLoopJoin on the "
        "broadcast-size side (DF40: nested-loop fallback, SURVEY §2.3).",
    tags=("join",),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    return (sup.join(nat, F.col("s_nationkey") < F.col("n_nationkey"))
            .groupBy("s_suppkey").agg(F.count("*").alias("n_gt"))
            .orderBy("s_suppkey"))


# ------------------------------------------------------------ subqueries

@register(
    "subquery_scalar_uncorrelated",
    oracle="""
SELECT COUNT(*) AS n_above
FROM lineitem
WHERE l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)
""",
    doc="Uncorrelated scalar subquery in WHERE (DF40 scalar_subquery_to_join; "
        "Spark plans a ScalarSubquery reused as a literal after first eval).",
    tags=("subquery",),
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT COUNT(*) AS n_above
        FROM lineitem
        WHERE l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)""")


@register(
    "subquery_scalar_correlated",
    oracle="""
SELECT o_orderkey FROM orders o
WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
""",
    doc="Correlated scalar subquery (decorrelated to an aggregate+join — "
        "Catalyst RewriteCorrelatedScalarSubquery ≡ DF40 decorrelation).",
    tags=("subquery",),
)
def subq_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderkey FROM orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)""")


@register(
    "subquery_in",
    oracle="""
SELECT o_orderkey FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
""",
    doc="IN subquery → left semi join.",
    tags=("subquery", "join"),
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)""")


@register(
    "subquery_not_in",
    oracle="""
SELECT c_custkey FROM customer
WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
""",
    doc="NOT IN subquery (null-safe anti join; keys are non-null here so "
        "semantics match the anti join exactly).",
    tags=("subquery", "join"),
)
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql("""
        SELECT c_custkey FROM customer
        WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""")


# ----------------------------------------------------------------- CTEs

@register(
    "cte_multi",
    oracle="""
WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n_big FROM orders
  WHERE o_totalprice > 300000 GROUP BY o_custkey
), rich AS (
  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
)
SELECT rich.c_custkey, rich.c_name, big_orders.n_big
FROM rich JOIN big_orders ON rich.c_custkey = big_orders.o_custkey
""",
    doc="Multi-CTE WITH clause joined downstream.",
    tags=("cte",),
)
def cte_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        WITH big_orders AS (
          SELECT o_custkey, COUNT(*) AS n_big FROM orders
          WHERE o_totalprice > 300000 GROUP BY o_custkey
        ), rich AS (
          SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
        )
        SELECT rich.c_custkey, rich.c_name, big_orders.n_big
        FROM rich JOIN big_orders ON rich.c_custkey = big_orders.o_custkey""")


@register(
    "cte_recursive",
    oracle="""
WITH RECURSIVE series(n, total) AS (
  SELECT 1, 1
  UNION ALL
  SELECT n + 1, total + n + 1 FROM series WHERE n < 20
)
SELECT n, total FROM series
""",
    doc="Recursive CTE (DF40 has it; Spark 4 executes WITH RECURSIVE "
        "natively — the <4.0 driver-loop fallback lives in "
        "operators.recursive for older clusters).",
    tags=("cte", "recursive"),
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql("""
        WITH RECURSIVE series(n, total) AS (
          SELECT 1, 1
          UNION ALL
          SELECT n + 1, total + n + 1 FROM series WHERE n < 20
        )
        SELECT n, total FROM series""")


# --------------------------------------------------------------- set ops

def _status_proj(spark, sf_dir, status):
    return (table(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus") == status)
            .select("o_custkey", "o_orderpriority"))


@register(
    "setop_union_all",
    oracle="""
SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
    doc="UNION ALL (bag union, no shuffle).",
    tags=("setop",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_proj(spark, sf_dir, "F").unionAll(_status_proj(spark, sf_dir, "O"))


@register(
    "setop_union_distinct",
    oracle="""
SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
    doc="UNION (set union → hash-distinct after append).",
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_status_proj(spark, sf_dir, "F")
            .union(_status_proj(spark, sf_dir, "O")).distinct())


@register(
    "setop_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    doc="INTERSECT (set semantics → left semi + distinct).",
    tags=("setop",),
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "orders").where("o_orderstatus = 'F'").select("o_custkey")
    b = table(spark, sf_dir, "orders").where("o_orderstatus = 'O'").select("o_custkey")
    return a.intersect(b)


@register(
    "setop_intersect_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
    doc="INTERSECT ALL (bag semantics, multiplicity = min of the sides).",
    tags=("setop",),
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "orders").where("o_orderstatus = 'F'").select("o_orderpriority")
    b = table(spark, sf_dir, "orders").where("o_orderstatus = 'O'").select("o_orderpriority")
    return a.intersectAll(b)


@register(
    "setop_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
    doc="EXCEPT (set difference → left anti + distinct).",
    tags=("setop",),
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "orders").where("o_orderstatus = 'F'").select("o_custkey")
    b = table(spark, sf_dir, "orders").where("o_orderstatus = 'P'").select("o_custkey")
    return a.subtract(b)


@register(
    "setop_except_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
""",
    doc="EXCEPT ALL (bag difference, multiplicity-preserving).",
    tags=("setop",),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "orders").where("o_orderstatus = 'F'").select("o_orderpriority")
    b = table(spark, sf_dir, "orders").where("o_orderstatus = 'P'").select("o_orderpriority")
    return a.exceptAll(b)


# ------------------------------------------------ sort / limit / distinct

@register(
    "sort_limit_offset",
    oracle="""
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 10
""",
    doc="Total-order sort + LIMIT/OFFSET (DF40 SortExec+GlobalLimit; Spark "
        "TakeOrderedAndProject handles limit+offset in one pass).",
    tags=("sort", "topk"),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "orders")
            .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            # DataFrame API: offset() must precede limit() to get SQL
            # "LIMIT 50 OFFSET 10" semantics (skip 10, then take 50).
            .offset(10).limit(50))


@register(
    "sort_nulls_ordering",
    oracle="""
SELECT o_orderkey, disc FROM (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS disc FROM orders
) t ORDER BY disc ASC NULLS FIRST, o_orderkey
LIMIT 100
""",
    doc="Explicit NULLS FIRST ordering (DF default is Postgres-style nulls "
        "last on ASC, Spark default nulls first — always emitted explicitly, "
        "SURVEY §2.6).",
    tags=("sort",),
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "orders")
            .select("o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("disc"))
            .orderBy(F.col("disc").asc_nulls_first(), F.col("o_orderkey"))
            .limit(100))


@register(
    "distinct_simple",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT → hash aggregate on all columns.",
    tags=("distinct",),
)
def distinct_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "distinct_on",
    oracle="""
SELECT DISTINCT ON (l_returnflag)
       l_returnflag, l_orderkey, l_linenumber
FROM lineitem
ORDER BY l_returnflag, l_shipdate DESC, l_orderkey, l_linenumber
""",
    doc="Postgres DISTINCT ON (DF40 supports it; Spark lacks it) → "
        "row_number() rewrite, the §7.1-step-5 shim. Latest-shipped line "
        "per returnflag with unique tie-breaks.",
    tags=("distinct", "window"),
)
def distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    w = (Window.partitionBy("l_returnflag")
         .orderBy(F.col("l_shipdate").desc(), F.col("l_orderkey"), F.col("l_linenumber")))
    return (table(spark, sf_dir, "lineitem")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("l_returnflag", "l_orderkey", "l_linenumber"))


@register(
    "values_inline",
    oracle="""
SELECT t.code, t.label, n_name
FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) t(code, label)
JOIN nation ON n_nationkey = t.code
""",
    doc="VALUES literal relation (the reference builds one for its fake "
        "ROLLBACK result, lib.rs:683-696) joined to a table.",
    tags=("values",),
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql("""
        SELECT t.code, t.label, n_name
        FROM (VALUES (0, 'zero'), (1, 'one'), (2, 'two')) t(code, label)
        JOIN nation ON n_nationkey = t.code""")


@register(
    "filter_predicates",
    oracle="""
SELECT o_orderkey FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice BETWEEN 100000 AND 200000
  AND o_orderpriority LIKE '_-%'
  AND o_orderpriority NOT LIKE '%URGENT%'
  AND (o_custkey % 10) IS NOT NULL
  AND o_orderdate IS NOT NULL
""",
    doc="WHERE algebra: IN list, BETWEEN, LIKE/NOT LIKE with _ wildcard, "
        "IS [NOT] NULL (SURVEY §2.2). All push to the scan.",
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "orders")
            .where(F.col("o_orderstatus").isin("F", "P")
                   & F.col("o_totalprice").between(100000, 200000)
                   & F.col("o_orderpriority").like("_-%")
                   & ~F.col("o_orderpriority").like("%URGENT%")
                   & (F.col("o_custkey") % 10).isNotNull()
                   & F.col("o_orderdate").isNotNull())
            .select("o_orderkey"))


@register(
    "filter_ilike_null_safe",
    oracle="""
SELECT c_custkey,
       (NULLIF(c_mktsegment, 'MACHINERY') IS NOT DISTINCT FROM 'BUILDING') AS is_building
FROM customer
WHERE c_mktsegment ILIKE 'b%' OR c_mktsegment ILIKE '%machine%'
""",
    doc="ILIKE and IS [NOT] DISTINCT FROM (null-safe equality <=>).",
    tags=("filter",),
)
def filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (c.where(F.col("c_mktsegment").ilike("b%")
                    | F.col("c_mktsegment").ilike("%machine%"))
            .select("c_custkey",
                    F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
                    .eqNullSafe(F.lit("BUILDING")).alias("is_building")))


@register(
    "filter_is_true_unknown",
    oracle="""
SELECT o_orderkey,
       (o_totalprice > 200000) IS TRUE      AS is_big,
       (o_totalprice > 200000) IS NOT FALSE AS not_small,
       (NULL > 1) IS NULL                   AS is_unknown
FROM orders
WHERE o_orderkey <= 1000
""",
    doc="IS [NOT] TRUE/FALSE/UNKNOWN boolean tests (DF40 predicate "
        "surface, SURVEY §2.2; UNKNOWN spelled IS NULL on the DuckDB "
        "side — same three-valued semantics).",
    tags=("filter",),
)
def filter_is_true(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderkey,
               (o_totalprice > 200000) IS TRUE      AS is_big,
               (o_totalprice > 200000) IS NOT FALSE AS not_small,
               (NULL > 1) IS UNKNOWN                AS is_unknown
        FROM orders
        WHERE o_orderkey <= 1000""")


@register(
    "join_range_binned",
    oracle="""
SELECT band_id, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
JOIN (VALUES (1, 0.0, 50000.0),
             (2, 40000.0, 120000.0),
             (3, 100000.0, 400000.0)) AS b(band_id, lo, hi)
  ON o_totalprice >= lo AND o_totalprice <= hi
GROUP BY band_id
ORDER BY band_id
""",
    doc="Interval (band) join executed as a binned EQUI-join + residual "
        "filter (operators/range_join.py) — the scale path when neither "
        "side broadcasts; value-identical to the naive range join the "
        "oracle runs.",
    tags=("join", "range"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import point_interval_range_join
    orders = (table(spark, sf_dir, "orders")
              .select("o_orderkey", F.col("o_totalprice")))
    bands = spark.createDataFrame(
        [(1, 0.0, 50000.0), (2, 40000.0, 120000.0), (3, 100000.0, 400000.0)],
        "band_id int, lo double, hi double")
    joined = point_interval_range_join(
        orders, bands, "o_totalprice", "lo", "hi", bin_width=25000.0)
    return (joined.groupBy("band_id")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("band_id"))


@register(
    "project_star_except",
    oracle="""
SELECT * EXCLUDE (n_comment_placeholder) FROM (
  SELECT n_nationkey, n_name, n_regionkey,
         'x' AS n_comment_placeholder
  FROM nation) t
ORDER BY n_nationkey
""",
    doc="SELECT * EXCEPT(col) projection modifier (DF40 select "
        "modifiers, SURVEY §2.2; DuckDB spells it EXCLUDE).",
    tags=("projection",),
)
def star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql("""
        SELECT * EXCEPT (n_comment_placeholder) FROM (
          SELECT n_nationkey, n_name, n_regionkey,
                 'x' AS n_comment_placeholder
          FROM nation) t
        ORDER BY n_nationkey""")


@register(
    "join_skew_salted",
    oracle="""
SELECT s_name, COUNT(*) AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
""",
    doc="Deterministically SALTED equi-join (skew toolkit as a "
        "first-class query): the fact side gets pmod(xxhash64(row), 8) "
        "salt, the dim side replicates 8x, join keys become (suppkey, "
        "salt) — a single hot supplier spreads over 8 tasks instead of "
        "stalling one.  Value-equal to the plain join (the oracle IS "
        "the plain join).  operators/skew.py:salted_join; salting is "
        "hash-of-row, not rand(), so task retries are deterministic.",
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join
    li = (table(spark, sf_dir, "lineitem")
          .select(F.col("l_suppkey").alias("suppkey"),
                  "l_extendedprice", "l_discount"))
    sup = (table(spark, sf_dir, "supplier")
           .select(F.col("s_suppkey").alias("suppkey"), "s_name"))
    joined = salted_join(li, sup, on="suppkey", salt=8)
    return (joined.groupBy("s_name")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("s_name"))


@register(
    "setop_union_by_name",
    oracle="""
SELECT n_nationkey AS k, n_name AS name FROM nation
UNION ALL BY NAME
SELECT r_name AS name, r_regionkey + 100 AS k FROM region
ORDER BY k, name
""",
    doc="UNION BY NAME — a Spark-side surplus (DF40 positional-only "
        "set ops; GAPS.md surplus list): columns align by NAME across "
        "branches with different column orders.  DuckDB's native "
        "UNION ALL BY NAME is the oracle.",
    tags=("setop",),
)
def setop_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("name"))
    reg = table(spark, sf_dir, "region").select(
        F.col("r_name").alias("name"),
        (F.col("r_regionkey") + 100).alias("k"))
    return nat.unionByName(reg).orderBy("k", "name")


@register(
    "project_unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, val FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
         l_quantity AS val FROM lineitem WHERE l_orderkey <= 2000
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey <= 2000
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey <= 2000
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
  FROM lineitem WHERE l_orderkey <= 2000
) t
""",
    doc="UNPIVOT — wide measure columns to (measure, value) rows, the "
        "inverse of the pivot entry (agg_pivot_lang_by_source).  Spark "
        "side uses the native DataFrame.unpivot (melt) operator — a "
        "pure zero-shuffle Expand projection, 4× the rows in the same "
        "scan pass; the oracle spells the engine-neutral UNION ALL "
        "equivalent (DuckDB's UNPIVOT keyword has its own syntax).  "
        "Values pass through unchanged, so the compare is exact.",
    tags=("projection",),
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (table(spark, sf_dir, "lineitem")
            .where(F.col("l_orderkey") <= 2000)
            .unpivot(
                ids=["l_orderkey", "l_linenumber"],
                values=["l_quantity", "l_extendedprice", "l_discount",
                        "l_tax"],
                variableColumnName="measure",
                valueColumnName="val"))


@register(
    "join_interval_overlap",
    oracle="""
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS s_start,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) AS s_end
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), promos AS (
  SELECT promo_id,
         CAST(epoch(TIMESTAMP '2024-01-01 00:00:00')
              + (promo_id - 1) * 259200 AS BIGINT) AS p_start,
         CAST(epoch(TIMESTAMP '2024-01-01 00:00:00')
              + (promo_id - 1) * 259200 + 172800 AS BIGINT) AS p_end
  FROM range(1, 11) t(promo_id)
)
SELECT promo_id,
       CAST(COUNT(*) AS BIGINT) AS n_overlapping_spans,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(s_end - s_start) AS BIGINT) AS span_seconds_total
FROM spans JOIN promos
  ON s_start <= p_end AND p_start <= s_end
GROUP BY promo_id
ORDER BY promo_id
""",
    doc="INTERVAL x INTERVAL overlap join: per-user-day activity spans "
        "(min/max event time) against ten 48-hour promo windows every "
        "3 days — the campaign-exposure join every attribution system "
        "runs.  Spark side executes the scale path: both interval sets "
        "explode onto a 6-hour bin grid, equi-join on bin id, exact "
        "overlap residual, and each pair is emitted ONCE at the bin of "
        "the overlap start (floor(max(starts)/w) — a filter inside the "
        "join stage, so NO dedup shuffle; the trick Databricks' "
        "range-join optimization uses).  The oracle runs the naive "
        "theta join — value-identical by construction.  Epoch-second "
        "integers end-to-end. operators/range_join.py:"
        "interval_overlap_join.",
    tags=("join", "range"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import interval_overlap_join
    e = table(spark, sf_dir, "events")
    spans = (e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
             .agg(F.unix_timestamp(F.min("ts")).cast("bigint")
                  .alias("s_start"),
                  F.unix_timestamp(F.max("ts")).cast("bigint")
                  .alias("s_end")))
    base = F.unix_timestamp(F.lit("2024-01-01 00:00:00")
                            .cast("timestamp")).cast("bigint")
    promos = (spark.range(1, 11)
              .select(F.col("id").cast("int").alias("promo_id"))
              .select("promo_id",
                      (base + (F.col("promo_id") - 1) * 259200)
                      .alias("p_start"),
                      (base + (F.col("promo_id") - 1) * 259200 + 172800)
                      .alias("p_end")))
    joined = interval_overlap_join(spans, promos, "s_start", "s_end",
                                   "p_start", "p_end", bin_width=21600.0)
    return (joined.groupBy("promo_id")
            .agg(F.count(F.lit(1)).cast("bigint")
                 .alias("n_overlapping_spans"),
                 F.countDistinct("user_id").cast("bigint")
                 .alias("n_users"),
                 F.sum(F.col("s_end") - F.col("s_start")).cast("bigint")
                 .alias("span_seconds_total"))
            .orderBy("promo_id"))
