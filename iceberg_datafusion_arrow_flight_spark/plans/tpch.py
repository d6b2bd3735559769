"""TPC-H-style composite queries over the fixture star schema.

These are the headline plans the reference would run via ``ctx.sql`` (it
exposes the full DataFusion 40 SELECT surface at lib.rs:678); expressed here
with the DataFrame API so Catalyst picks the physical strategy.  Scale
notes per query explain why the plan survives 100 TB:

- Dimension tables (region/nation/customer/supplier/part) are tiny at any
  TPC-H ratio relative to lineitem — Catalyst broadcasts them (AQE converts
  to broadcast at runtime if the static estimate misses).
- All aggregations are partial+final hash aggregates (map-side combine),
  so shuffle volume is #groups × #partitions, not #rows.
- Filters sit directly on the scans → Parquet predicate pushdown +
  row-group pruning; only referenced columns are read (column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table


def _r(col, n=2):
    return F.round(col, n)


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                  AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                             AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                  AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                             AS avg_price,
       ROUND(AVG(l_discount), 4)                                  AS avg_disc,
       COUNT(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1: full-scan groupBy aggregate. Scale: 2-phase hash agg, "
        "4 groups — shuffle is O(groups), scan is the only heavy stage.",
    tags=("tpch", "aggregate"),
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(disc_price)).alias("sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r(F.avg("l_quantity"), 4).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 4).alias("avg_price"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3: dim-filtered 3-way join + group + top-k. Scale: customer "
        "(filtered) broadcasts into orders, orders side of the lineitem join "
        "shuffles on orderkey; top-k is TakeOrderedAndProject (no full sort).",
    tags=("tpch", "join", "topk"),
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    ords = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        cst.join(ords, cst.c_custkey == ords.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="TPC-H Q5: 6-way star join. Scale: region/nation/supplier/customer "
        "all broadcast; the only shuffle is lineitem↔orders on orderkey and "
        "the final tiny agg.",
    tags=("tpch", "join"),
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        cst.join(ords, cst.c_custkey == ords.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: selective scan + global agg. Scale: all three predicates "
        "push to Parquet (row-group stats prune most of 100 TB); single "
        "scalar result, near-zero shuffle.",
    tags=("tpch", "filter", "aggregate"),
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24))
        .agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q7_nation_volume",
    oracle="""
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                       AND TIMESTAMP '1996-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7: nation-pair volume with disjunctive join filter. Scale: "
        "both nation copies broadcast; lineitem↔orders is the single big "
        "shuffle; year extraction stays in codegen.",
    tags=("tpch", "join"),
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1995-01-01 00:00:00", "1996-12-31 00:00:00"))
    ords = table(spark, sf_dir, "orders")
    cst = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        sup.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cst, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
               | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9")))
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_r(F.sum("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: returned-item revenue by customer, top 20. Scale: "
        "nation broadcasts; group key is customer-grain (bounded), top-k "
        "avoids a global sort.",
    tags=("tpch", "join", "topk"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = table(spark, sf_dir, "nation")
    return (
        cst.join(ords, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                _r(F.col("c_acctbal")).alias("c_acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_shipping",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
       CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q12 adapted (no shipmode column): conditional counts per "
        "priority. Scale: one fact shuffle on orderkey; CASE stays in codegen.",
    tags=("tpch", "join", "aggregate"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    return (
        ords.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("bigint").alias("finished_count"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).cast("bigint").alias("open_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    doc="TPC-H Q14: promo revenue share. Scale: part broadcasts (hash join "
        "with no fact shuffle); single scalar out.",
    tags=("tpch", "join", "aggregate"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    prt = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(prt), F.col("l_partkey") == F.col("p_partkey"))
        .agg(_r(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev), 4).alias("promo_revenue"))
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19: disjunctive multi-branch predicate across join. Scale: "
        "part broadcasts; the OR-of-ANDs residual evaluates in codegen after "
        "the hash probe.",
    tags=("tpch", "join", "filter"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    prt = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(prt), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 120)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    doc="TPC-H Q18 (large-volume customer): agg-HAVING semi-filter into a "
        "3-way join + group + deterministic top-100. Scale: the HAVING "
        "subquery is one lineitem aggregate reused as a semi-join — "
        "Catalyst plans it as an aggregated build side, no double scan "
        "of the probe; threshold tuned to fixture line counts.",
    tags=("tpch", "join", "subquery", "topk"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__q"))
           .where(F.col("__q") > 120)
           .select("l_orderkey"))
    ords = table(spark, sf_dir, "orders")
    cst = table(spark, sf_dir, "customer")
    return (
        cst.join(ords, cst.c_custkey == ords.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(big, li.l_orderkey == big.l_orderkey, "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(_r(F.sum("l_quantity")).alias("total_qty"))
        .select("c_custkey", "c_name", "o_orderkey",
                F.col("o_orderdate").cast("timestamp_ntz").alias("o_orderdate"),
                _r(F.col("o_totalprice")).alias("o_totalprice"), "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q8_national_market_share",
    oracle="""
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type LIKE 'PROMO%'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    doc="TPC-H Q8 (national market share): 8-way star join (two roles for "
        "nation) + conditional share aggregate. Scale: every dimension "
        "broadcasts; lineitem shuffles once for the orders join; the "
        "aliased double-use of nation costs nothing extra (both sides "
        "broadcast).",
    tags=("tpch", "join", "aggregate"),
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(F.col("p_type").like("PROMO%"))
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    ords = table(spark, sf_dir, "orders")
    cst = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").alias("n1")
    n2 = table(spark, sf_dir, "nation").alias("n2")
    reg = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    all_nations = (
        part.join(li, part.p_partkey == li.l_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cst, ords.o_custkey == cst.c_custkey)
        .join(n1, cst.c_nationkey == F.col("n1.n_nationkey"))
        .join(reg, F.col("n1.n_regionkey") == reg.r_regionkey)
        .join(n2, sup.s_nationkey == F.col("n2.n_nationkey"))
        .select(F.year("o_orderdate").alias("o_year"),
                vol.alias("volume"),
                F.col("n2.n_name").alias("nation")))
    share = (F.sum(F.when(F.col("nation") == "NATION_7",
                          F.col("volume")).otherwise(0.0))
             / F.sum("volume"))
    return (all_nations.groupBy("o_year")
            .agg(F.round(share, 6).alias("mkt_share"))
            .orderBy("o_year"))


@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 (order priority checking), fixture-adapted predicate: "
        "correlated EXISTS with an inequality on both relations' columns "
        "— Catalyst decorrelates to a LEFT SEMI join "
        "(RewritePredicateSubquery; SURVEY §2.8).  Scale: semi-join "
        "shuffles on orderkey, never materializes matches.",
    tags=("tpch", "subquery", "join"),
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")


@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13 (customer order distribution): LEFT OUTER join with "
        "an extra join-side predicate (kept in the join, NOT pushed as a "
        "filter — outer semantics), aggregate-of-aggregate.  Scale: "
        "first agg keyed by custkey (pre-shuffled by the join), second "
        "agg is O(distinct counts).",
    tags=("tpch", "join", "aggregate"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cst = table(spark, sf_dir, "customer")
    ords = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (cst.join(ords, cst.c_custkey == ords.o_custkey, "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = l_partkey)
""",
    doc="TPC-H Q17 (small-quantity-order revenue): correlated SCALAR "
        "subquery (per-part average) — Catalyst decorrelates to an "
        "aggregate + join (RewriteCorrelatedScalarSubquery; SURVEY "
        "§2.8).  Scale: the per-part avg is a partial agg keyed by "
        "partkey, reusing the join's partitioning; part dim broadcasts.",
    tags=("tpch", "subquery", "join", "aggregate"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l_partkey)""")


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
SELECT c_nationkey, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    doc="TPC-H Q22 (global sales opportunity), fixture-adapted grouping "
        "(nationkey for the missing phone prefix; anti-join on URGENT orders so every SF yields rows): uncorrelated scalar "
        "subquery (broadcast single-row threshold) + NOT EXISTS → LEFT "
        "ANTI join.  Scale: anti-join shuffles on custkey; the scalar "
        "threshold is computed once and broadcast into the filter.",
    tags=("tpch", "subquery", "join", "aggregate"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")


@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15 (top supplier): the revenue view becomes a reused "
        "aggregate; `= (SELECT MAX(...))` becomes a broadcast single-row "
        "join.  Revenue is rounded BEFORE the max-equality compare so the "
        "predicate is stable across engines/partition orders (float sums "
        "differ in the last ulp).  Scale: one lineitem shuffle on suppkey "
        "(partial+final agg); the max is a 1-row broadcast, supplier join "
        "broadcasts the small revenue side — no second fact scan.  "
        "Reference runs this via ctx.sql (lib.rs:678).",
    tags=("tpch", "subquery", "aggregate"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp")))
    revenue = (
        li.groupBy("l_suppkey")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
             .alias("total_revenue")))
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    sup = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    doc="TPC-H Q21 (suppliers who kept orders waiting), fixture-adapted "
        "late test (no l_commitdate/l_receiptdate columns: a lineitem is "
        "late when it ships >90 days after the order date).  The oracle "
        "keeps the textbook EXISTS / NOT-EXISTS form; the Spark plan is an "
        "aggregation REWRITE of both correlated subqueries — per-order "
        "supplier sets via collect_set windows over the orderkey "
        "partition, so the two lineitem self-joins collapse into ONE "
        "shuffle of the fact table.  A row qualifies iff it is late, its "
        "order has >1 distinct supplier (EXISTS l2), and exactly one "
        "distinct LATE supplier (NOT EXISTS l3).  Scale: set sizes are "
        "bounded by suppliers-per-order (~4-7 at any TPC-H SF), supplier "
        "dim broadcasts, top-k is TakeOrderedAndProject.  "
        "Reference runs this via ctx.sql (lib.rs:678).",
    tags=("tpch", "join", "subquery", "window", "topk"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    ords = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    sup = table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    w = Window.partitionBy("l_orderkey")
    joined = (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("__late", late)
        .withColumn("__n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("__n_late_supp", F.size(F.collect_set(
            F.when(F.col("__late"), F.col("l_suppkey"))).over(w)))
    )
    return (
        joined.where(F.col("__late") & (F.col("__n_supp") > 1)
                     & (F.col("__n_late_supp") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


# The fixture has no partsupp table, so Q2/Q11/Q16/Q20 derive the
# part↔supplier relation from lineitem (cost = min observed unit price,
# quantity = shipped quantity) and Q9 proxies supply cost from
# p_retailprice.  Every adapted query preserves the ORIGINAL's operator
# shape — that is what parity requires: correlated min-subquery (Q2),
# multi-dim star profit rollup (Q9), HAVING against an uncorrelated
# scalar aggregate (Q11), NOT-IN + COUNT(DISTINCT) (Q16), nested
# semi-join with an aggregate threshold (Q20).

@register(
    "tpch_q2_minimum_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_type
FROM part, cost, supplier, nation, region
WHERE p_partkey = pk AND s_suppkey = sk
  AND p_size = 15
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND supplycost = (SELECT MIN(c2.supplycost)
                    FROM cost c2, supplier s2, nation n2, region r2
                    WHERE c2.pk = p_partkey AND s2.s_suppkey = c2.sk
                      AND s2.s_nationkey = n2.n_nationkey
                      AND n2.n_regionkey = r2.r_regionkey
                      AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 (minimum-cost supplier), fixture-adapted: supply cost "
        "= min observed unit price from lineitem (no partsupp table). "
        "Shape preserved: correlated scalar MIN subquery over the same "
        "region-restricted join — Catalyst decorrelates it to an "
        "aggregate keyed by partkey joined back (one extra shuffle, no "
        "per-row re-execution).  Scale: supplier/nation/region "
        "broadcast; the cost relation shuffles once on (part, supp).",
    tags=("tpch", "subquery", "join"),
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "supplier", "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        WITH cost AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 MIN(l_extendedprice / l_quantity) AS supplycost
          FROM lineitem GROUP BY 1, 2
        )
        SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
               p_partkey, p_type
        FROM part
        JOIN cost ON p_partkey = pk
        JOIN supplier ON s_suppkey = sk
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND r_name = 'ASIA'
          AND supplycost = (SELECT MIN(c2.supplycost)
                            FROM cost c2
                            JOIN supplier s2 ON s2.s_suppkey = c2.sk
                            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                            WHERE c2.pk = p_partkey AND r2.r_name = 'ASIA')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")


@register(
    "tpch_q9_product_type_profit",
    oracle="""
SELECT nation, o_year,
       CAST(SUM(amount_cents) AS DOUBLE) / 100 AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         -- per-row cents, summed as exact integers: the float sum of
         -- ~1e4 cancellation-prone amounts differs in the last cent
         -- between engines purely by summation order
         CAST(ROUND(100 * (l_extendedprice * (1 - l_discount)
                           - 0.01 * p_retailprice * l_quantity)) AS BIGINT)
           AS amount_cents
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9 (product-type profit), fixture-adapted: supply cost "
        "proxied as 0.01·p_retailprice (no partsupp).  Shape preserved: "
        "5-way star join filtered by a part-name LIKE, profit rolled up "
        "by (nation, year).  Scale: part/supplier/nation broadcast; "
        "lineitem↔orders is the one big shuffle; the LIKE filter prunes "
        "at the part scan before the join fan-out.",
    tags=("tpch", "join", "aggregate"),
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    prt = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = table(spark, sf_dir, "supplier")
    ords = table(spark, sf_dir, "orders")
    nat = table(spark, sf_dir, "nation")
    amount_cents = F.round(100 * (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.01 * F.col("p_retailprice") * F.col("l_quantity"))).cast("bigint")
    return (
        li.join(F.broadcast(prt), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(ords, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").alias("o_year"),
                amount_cents.alias("amount_cents"))
        .groupBy("nation", "o_year")
        .agg((F.sum("amount_cents").cast("double") / 100).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l_partkey AS ps_partkey, SUM(l_extendedprice) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT ps_partkey, ROUND(val, 2) AS value
FROM v
WHERE val > (SELECT SUM(val) * 0.002 FROM v)
ORDER BY value DESC, ps_partkey
""",
    doc="TPC-H Q11 (important stock), fixture-adapted: part value = "
        "lineitem revenue through one nation's suppliers (no partsupp). "
        "Shape preserved: grouped value vs an UNCORRELATED scalar "
        "aggregate over the same relation — the CTE is computed once, "
        "the scalar side reduces to a single broadcast row.  Scale: the "
        "value relation shuffles once on partkey; threshold is one row.",
    tags=("tpch", "subquery", "aggregate"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        WITH v AS (
          SELECT l_partkey AS ps_partkey, SUM(l_extendedprice) AS val
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY l_partkey
        )
        SELECT ps_partkey, ROUND(val, 2) AS value
        FROM v
        WHERE val > (SELECT SUM(val) * 0.002 FROM v)
        ORDER BY value DESC, ps_partkey""")


@register(
    "tpch_q16_parts_supplier_relationship",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#12'
  AND p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16 (parts/supplier relationship), fixture-adapted: the "
        "part↔supplier relation comes from lineitem, and the excluded-"
        "supplier predicate is negative acctbal (no comment column). "
        "Shape preserved: NOT IN subquery (null-aware anti join) + "
        "COUNT(DISTINCT) over a grouped star.  Scale: the exclusion "
        "list is tiny → broadcast null-aware anti; distinct-count "
        "partial-aggregates per (brand,type,size) group.",
    tags=("tpch", "subquery", "aggregate"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "supplier"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#12'
          AND p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")


@register(
    "tpch_q20_potential_part_promotion",
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY 1, 2
), tot AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY 1
)
SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2')
  AND s_suppkey IN (SELECT l_suppkey
                    FROM shipped JOIN tot USING (l_partkey)
                    WHERE qty > 0.5 * total_qty)
ORDER BY s_name
""",
    doc="TPC-H Q20 (potential part promotion), fixture-adapted: "
        "'availqty > half of shipped' becomes 'supplier dominates half "
        "of a promo part's shipped quantity in the window' (no "
        "partsupp).  Shape preserved: IN semi-join whose inner side is "
        "an aggregate-thresholded join — planned as aggregates + a "
        "LEFT SEMI join, no correlated re-execution.  Scale: "
        "shipped/tot reuse the same partkey partitioning; the semi-join "
        "key list is distinct supplier ids (small) → broadcast.",
    tags=("tpch", "subquery", "join"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part", "supplier", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        WITH shipped AS (
          SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
        ), tot AS (
          SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
        )
        SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2')
          AND s_suppkey IN (SELECT l_suppkey
                            FROM shipped JOIN tot USING (l_partkey)
                            WHERE qty > 0.5 * total_qty)
        ORDER BY s_name""")
