"""Nested-type plans: the DataFusion-40 array function inventory
(SURVEY §2.9 Array — datafusion-functions-array, Cargo.lock:1205),
UNNEST (§2.8), struct/JSON/map access (§2.9).

DF40 has essentially no map functions and zero JSON query functions
(JSON is only a file format there); Spark exceeds both — that surplus is
exercised here over the ``events.props`` JSON column and map literals,
because a user of the reference migrating to this engine gains them.

Array ordering: list_distinct / list_intersect etc. return
engine-defined order → every set-like result is sorted on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table


@register(
    "array_construct_access",
    oracle="""
SELECT n_nationkey,
       CAST(to_json([n_nationkey, n_regionkey, n_nationkey + n_regionkey]) AS VARCHAR) AS arr,
       LEN([n_nationkey, n_regionkey]) AS sz,
       [n_nationkey, n_regionkey, 99][2] AS second_el,
       CAST(to_json([n_nationkey, n_regionkey, 99][2:3]) AS VARCHAR) AS sliced,
       LIST_CONTAINS([n_regionkey, 7], n_regionkey) AS has_rk,
       LIST_POSITION([10, 20, n_nationkey], n_nationkey) AS pos_self,
       CAST(to_json(LIST_CONCAT([n_nationkey], [n_regionkey])) AS VARCHAR) AS cat,
       CAST(to_json(LIST_REVERSE([n_nationkey, n_regionkey])) AS VARCHAR) AS rev,
       CAST(to_json(LIST_SORT([n_regionkey, n_nationkey, 0])) AS VARCHAR) AS srt,
       CAST(to_json(FLATTEN([[n_nationkey], [n_regionkey]])) AS VARCHAR) AS flat,
       CAST(to_json(GENERATE_SERIES(1, 3)) AS VARCHAR) AS seq
FROM nation
""",
    doc="Array construct/access: make_array, cardinality, element_at "
        "(1-indexed in both engines), slice, contains, position, concat, "
        "reverse, sort, flatten, generate_series (SURVEY §2.9 Array). "
        "Array results are JSON-serialized on both sides: the driver's "
        "canonicalizer only hashes scalar columns (CORRECTNESS_r02 ERR "
        "class); to_json int/string output is byte-identical across "
        "engines (verified; doubles would NOT be — see array_higher_order).",
    tags=("array",),
)
def array_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    nk, rk = F.col("n_nationkey"), F.col("n_regionkey")
    return n.select(
        "n_nationkey",
        F.to_json(F.array(nk, rk, nk + rk)).alias("arr"),
        F.size(F.array(nk, rk)).alias("sz"),
        F.element_at(F.array(nk, rk, F.lit(99)), 2).alias("second_el"),
        F.to_json(F.slice(F.array(nk, rk, F.lit(99)), 2, 2)).alias("sliced"),
        F.array_contains(F.array(rk, F.lit(7)), rk).alias("has_rk"),
        F.array_position(F.array(F.lit(10), F.lit(20), nk), nk).alias("pos_self"),
        F.to_json(F.concat(F.array(nk), F.array(rk))).alias("cat"),
        F.to_json(F.reverse(F.array(nk, rk))).alias("rev"),
        F.to_json(F.sort_array(F.array(rk, nk, F.lit(0)))).alias("srt"),
        F.to_json(F.flatten(F.array(F.array(nk), F.array(rk)))).alias("flat"),
        F.to_json(F.sequence(F.lit(1), F.lit(3))).alias("seq"))


@register(
    "array_set_operations",
    oracle="""
SELECT n_nationkey,
       CAST(to_json(LIST_SORT(LIST_DISTINCT([n_regionkey, n_regionkey, n_nationkey]))) AS VARCHAR) AS dedup,
       CAST(to_json(LIST_SORT(LIST_INTERSECT([0, 1, 2, n_nationkey], [n_nationkey, 2]))) AS VARCHAR) AS inter,
       LIST_HAS_ALL([0, 1, 2, 3, 4, n_regionkey], [n_regionkey, 0]) AS hasall,
       LIST_HAS_ANY([99, n_regionkey], [98, 97, n_regionkey]) AS hasany,
       CAST(to_json(LIST_SORT(LIST_FILTER([0, 1, 2, 3, 4], x -> NOT LIST_CONTAINS([n_regionkey], x)))) AS VARCHAR) AS minus_rk
FROM nation
""",
    doc="Array set ops: array_distinct, array_intersect, array_has_all "
        "(forall shim), array_has_any≈arrays_overlap, array_except — all "
        "order-normalized via sort on both engines; array results "
        "JSON-serialized for the driver's scalar-only canonicalizer.",
    tags=("array",),
)
def array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    nk, rk = F.col("n_nationkey"), F.col("n_regionkey")
    full = F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3), F.lit(4))
    return n.select(
        "n_nationkey",
        F.to_json(F.sort_array(F.array_distinct(F.array(rk, rk, nk)))).alias("dedup"),
        F.to_json(F.sort_array(F.array_intersect(
            F.array(F.lit(0), F.lit(1), F.lit(2), nk), F.array(nk, F.lit(2))))).alias("inter"),
        F.forall(F.array(rk, F.lit(0)),
                 lambda x: F.array_contains(F.concat(full, F.array(rk)), x)).alias("hasall"),
        F.arrays_overlap(F.array(F.lit(99), rk),
                         F.array(F.lit(98), F.lit(97), rk)).alias("hasany"),
        F.to_json(F.sort_array(F.array_except(full, F.array(rk)))).alias("minus_rk"))


@register(
    "array_higher_order",
    oracle="""
SELECT vec_id,
       ARRAY_TO_STRING(LIST_TRANSFORM(emb8, x -> PRINTF('%.4f', ROUND(x * 2, 4))), ',') AS doubled,
       ARRAY_TO_STRING(LIST_TRANSFORM(LIST_SORT(LIST_FILTER(emb8, x -> x > 0)),
                                      x -> PRINTF('%.4f', x)), ',') AS positives,
       ROUND(LIST_REDUCE(LIST_PREPEND(0.0, emb8), (acc, x) -> acc + x), 4) AS total,
       ARRAY_TO_STRING(LIST_TRANSFORM(LIST_ZIP(emb8, emb8),
                                      p -> PRINTF('%.4f', ROUND(p[1] * p[2], 4))), ',') AS squares
FROM (SELECT vec_id,
             LIST_TRANSFORM(embedding[1:8], x -> ROUND(CAST(x AS DOUBLE), 4)) AS emb8
      FROM embeddings WHERE vec_id % 25 = 0) t
""",
    doc="Higher-order lambdas: transform, filter, aggregate/reduce, "
        "zip_with — the Spark-side basis for the similarity operators "
        "(SURVEY §7.1 step 7). Float math rounded on both sides. Double "
        "arrays are serialized via %.4f format+join, NOT to_json: Spark "
        "JSON-encodes 0.0001 as 1.0E-4 while DuckDB writes 0.0001, so "
        "printf is the only byte-stable cross-engine double encoding.",
    tags=("array", "lambda"),
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
         .select("vec_id",
                 F.transform(F.slice("embedding", 1, 8),
                             lambda x: F.round(x.cast("double"), 4)).alias("emb8")))

    def fmt(col):
        return F.array_join(F.transform(col, lambda x: F.format_string("%.4f", x)), ",")

    return e.select(
        "vec_id",
        fmt(F.transform("emb8", lambda x: F.round(x * 2, 4))).alias("doubled"),
        fmt(F.sort_array(F.filter("emb8", lambda x: x > 0))).alias("positives"),
        F.round(F.aggregate("emb8", F.lit(0.0), lambda acc, x: acc + x), 4).alias("total"),
        fmt(F.zip_with("emb8", "emb8", lambda a, b: F.round(a * b, 4))).alias("squares"))


@register(
    "unnest_explode",
    oracle="""
SELECT n_nationkey, UNNEST([n_nationkey * 10, n_nationkey * 10 + 1]) AS v
FROM nation WHERE n_nationkey < 5
""",
    doc="UNNEST as table factor (DF40 §2.8) ≡ explode / LATERAL VIEW.",
    tags=("array", "unnest"),
)
def unnest_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 5)
    return n.select(
        "n_nationkey",
        F.explode(F.array(F.col("n_nationkey") * 10,
                          F.col("n_nationkey") * 10 + 1)).alias("v"))


@register(
    "unnest_posexplode",
    oracle="""
SELECT n_nationkey,
       GENERATE_SUBSCRIPTS([n_regionkey, n_nationkey], 1) AS pos,
       UNNEST([n_regionkey, n_nationkey]) AS val
FROM nation WHERE n_nationkey < 5
""",
    doc="posexplode (ordinal + value) ≡ DuckDB generate_subscripts+unnest "
        "(no WITH ORDINALITY in DuckDB 1.0). Spark pos is 0-based → +1.",
    tags=("array", "unnest"),
)
def unnest_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 5)
    ex = n.select(
        "n_nationkey",
        F.posexplode(F.array(F.col("n_regionkey"), F.col("n_nationkey"))))
    return ex.select("n_nationkey", (F.col("pos") + 1).cast("bigint").alias("pos"),
                     F.col("col").alias("val"))


@register(
    "json_access",
    oracle="""
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_val,
       JSON_EXTRACT_STRING(props, '$.missing') AS missing,
       (JSON_EXTRACT(props, '$.k') IS NOT NULL) AS has_k
FROM events WHERE event_id % 37 = 0
""",
    doc="JSON access over events.props (get_json_object / from_json). "
        "DF40 core has NO json functions (SURVEY §2.9 JSON) — Spark "
        "surplus, free parity.",
    tags=("json",),
)
def json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 37 == 0)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"))


@register(
    "json_from_to",
    oracle="""
SELECT event_id,
       CAST(JSON_EXTRACT(props, '$.k') AS INT) AS parsed_k,
       CONCAT('{"k":', JSON_EXTRACT_STRING(props, '$.k'), '}') AS rebuilt
FROM events WHERE event_id % 37 = 0
""",
    doc="from_json (schema'd parse) + to_json round-trip on the props "
        "column — the structured path a pipeline would use at scale "
        "(parse once into a struct column, not per-expression get_json_object).",
    tags=("json",),
)
def json_from_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 37 == 0)
    parsed = e.select("event_id", F.from_json("props", "k INT").alias("p"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("parsed_k"),
        F.to_json("p").alias("rebuilt"))


@register(
    "struct_access",
    oracle="""
SELECT n_nationkey,
       CAST(to_json({'key': n_nationkey, 'name': n_name}) AS VARCHAR) AS st,
       ({'key': n_nationkey, 'name': n_name}).name AS st_name,
       ({'a': {'b': n_regionkey}}).a.b AS nested
FROM nation WHERE n_nationkey < 10
""",
    doc="struct / named_struct construction + dot access (get_field), "
        "incl. nested structs (SURVEY §2.9 struct/meta); the struct "
        "column is JSON-serialized for the driver's scalar-only "
        "canonicalizer (field order + int/string encodings are "
        "byte-identical across engines).",
    tags=("struct",),
)
def struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 10)
    st = F.struct(F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"))
    nested = F.struct(F.struct(F.col("n_regionkey").alias("b")).alias("a"))
    return n.select(
        "n_nationkey",
        F.to_json(st).alias("st"),
        st.getField("name").alias("st_name"),
        nested.getField("a").getField("b").alias("nested"))


@register(
    "map_functions",
    oracle="""
SELECT n_nationkey,
       CAST(to_json(['k', 'r']) AS VARCHAR) AS ks,
       CAST(to_json([n_nationkey, n_regionkey]) AS VARCHAR) AS vs,
       n_nationkey AS k_val
FROM nation WHERE n_nationkey < 10
""",
    doc="Map construction and access (map_from_arrays, map_keys, "
        "map_values, element_at). DF40 has no map functions at all "
        "(SURVEY §2.9 Map) — Spark surplus.  The MAP itself never "
        "crosses engines (cross-engine map compare is unstable); the "
        "oracle checks the projected keys/values/lookup, which pins the "
        "same semantics on stable types.",
    tags=("map",),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 10)
    m = F.map_from_arrays(F.array(F.lit("k"), F.lit("r")),
                          F.array(F.col("n_nationkey"), F.col("n_regionkey")))
    return n.select(
        "n_nationkey",
        F.to_json(F.map_keys(m)).alias("ks"),
        F.to_json(F.map_values(m)).alias("vs"),
        F.element_at(m, "k").alias("k_val"))


@register(
    "table_func_generate_series",
    oracle="""
SELECT s.generate_series AS n, s.generate_series * s.generate_series AS sq
FROM generate_series(1, 1000, 7) s
""",
    doc="generate_series table factor (DF40 table function, SURVEY §2.8) "
        "-> explode(sequence()); DuckDB runs its native generate_series.",
    tags=("table_function",),
)
def generate_series_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.range(1)
            .select(F.explode(F.sequence(F.lit(1), F.lit(1000), F.lit(7)))
                    .alias("n"))
            .select("n", (F.col("n") * F.col("n")).alias("sq")))


@register(
    "json_variant_ops",
    oracle="""
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_val,
       'OBJECT<k: BIGINT>' AS var_schema,
       CONCAT('{"k":', JSON_EXTRACT_STRING(props, '$.k'), '}') AS rebuilt,
       CAST(JSON_EXTRACT_STRING(props, '$.absent') AS INT) AS absent_val
FROM events WHERE event_id % 41 = 0
""",
    doc="Spark 4 VARIANT type over the props JSON column: parse_json "
        "into the binary semi-structured encoding ONCE, then typed "
        "try_variant_get extraction, schema_of_variant introspection, "
        "canonical to_json round-trip, and missing-path null handling "
        "— the modern engine's answer to schemaless columns (parse "
        "once, shredded binary access; no per-expression string "
        "re-parse).  The oracle spells the same results through "
        "DuckDB's JSON functions; the variant column itself never "
        "reaches the result (scalar projections only, per the gate "
        "window contract).",
    tags=("json",),
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").where(F.col("event_id") % 41 == 0)
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get(F.col("v"), "$.k", "int").alias("k_val"),
        F.schema_of_variant(F.col("v")).alias("var_schema"),
        F.to_json(F.col("v")).alias("rebuilt"),
        F.try_variant_get(F.col("v"), "$.absent", "int").alias("absent_val"))


@register(
    "unnest_explode_outer",
    oracle="""
WITH base AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 3 = 0 THEN []
              WHEN n_nationkey % 3 = 1 THEN NULL
              ELSE [n_nationkey * 10, n_nationkey * 10 + 1]
         END AS arr
  FROM nation WHERE n_nationkey < 9
)
SELECT n_nationkey,
       UNNEST(CASE WHEN arr IS NULL OR len(arr) = 0
                   THEN [CAST(NULL AS BIGINT)] ELSE arr END) AS v
FROM base
ORDER BY n_nationkey, v NULLS FIRST
""",
    doc="explode_outer: rows with EMPTY or NULL arrays survive as one "
        "null-valued row instead of vanishing (the LEFT-JOIN-LATERAL "
        "semantics; plain explode silently drops them — the classic "
        "fan-out bug in enrichment pipelines).  The oracle spells the "
        "same semantic by padding empty/NULL lists to [NULL] before "
        "UNNEST. plans/nested.py:unnest_explode_outer.",
    tags=("array", "unnest"),
)
def unnest_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 9)
    arr = (F.when(F.col("n_nationkey") % 3 == 0,
                  F.array().cast("array<bigint>"))
           .when(F.col("n_nationkey") % 3 == 1,
                 F.lit(None).cast("array<bigint>"))
           .otherwise(F.array(F.col("n_nationkey") * 10,
                              F.col("n_nationkey") * 10 + 1)
                      .cast("array<bigint>")))
    return (n.select("n_nationkey", F.explode_outer(arr).alias("v"))
            .orderBy("n_nationkey", F.col("v").asc_nulls_first()))
