"""Dialect-translation queries: DataFusion/Postgres-dialect SQL executed
through :func:`..dialect.rewrite_sql` (+ the SQL-UDF shims in
``..functions.aliases``), oracle-checked against DuckDB running the
*original, untranslated* text wherever DuckDB shares the dialect.

This is the direct evidence for SURVEY §7.1 step 3: a user of the
reference can submit the same SQL string the reference accepts through
``ctx.sql`` (iceberg-datafusion-arrow-flight/src/lib.rs:678) and get the same
answer from the Spark engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..dialect import rewrite_sql, split_params
from ..functions import register_dialect_functions
from .base import register, table


def _run_dialect(spark: SparkSession, sf_dir: str, sql: str,
                 tables: tuple[str, ...], params: list | None = None,
                 ) -> DataFrame:
    for t in tables:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    register_dialect_functions(spark)
    translated = rewrite_sql(sql)
    if params is not None:
        return spark.sql(translated, args=split_params(params))
    return spark.sql(translated)


# The exact text a reference client would send (DuckDB runs it verbatim).
_PG_CAST_SIMILAR = """
SELECT o_orderkey, o_totalprice::bigint AS price_int
FROM orders
WHERE o_orderpriority SIMILAR TO '1-URGENT|2-HIGH' AND o_totalprice > 280000
"""


@register(
    "dialect_pg_cast_similar_to",
    # DuckDB's double::bigint ROUNDS; DataFusion-40 and Spark both
    # TRUNCATE — the oracle spells the truncation explicitly, the Spark
    # side runs the original text with DF semantics.
    oracle=_PG_CAST_SIMILAR.replace("o_totalprice::bigint",
                                    "CAST(trunc(o_totalprice) AS BIGINT)"),
    doc="Postgres `::` cast + SIMILAR TO, translated by rewrite_sql "
        "(sqlparser 0.47 surface reachable via lib.rs:678).",
    tags=("dialect",),
)
def pg_cast_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _PG_CAST_SIMILAR, ("orders",))


_DISTINCT_ON = """
SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
FROM customer
ORDER BY c_nationkey, c_acctbal DESC, c_custkey
"""


@register(
    "dialect_distinct_on",
    oracle=_DISTINCT_ON,
    doc="Postgres DISTINCT ON (DF40 supports it; SURVEY §2.6) via the "
        "row_number() rewrite; oracle runs the original text.",
    tags=("dialect",),
)
def distinct_on_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _DISTINCT_ON, ("customer",))


_FUNC_ALIASES = """
SELECT c_custkey,
       strpos(c_name, '9') AS pos_nine,
       to_json(string_to_array(c_name, '#')) AS name_parts,
       md5(c_name) AS name_md5
FROM customer
WHERE c_custkey <= 200
"""


@register(
    "dialect_function_aliases",
    oracle=_FUNC_ALIASES.replace(
        "to_json(string_to_array(c_name, '#'))",
        "CAST(to_json(string_to_array(c_name, '#')) AS VARCHAR)"),
    doc="DF function names with different Spark spellings/arg order "
        "(strpos, string_to_array) via SQL-UDF shims — codegen'd Catalyst "
        "expressions, no Python (SURVEY §2.9 ≈-class).",
    tags=("dialect",),
)
def func_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _FUNC_ALIASES, ("customer",))


_PARAMS = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_orderdate >= $1 AND o_orderdate < $2 AND o_totalprice > $3
GROUP BY o_orderpriority
"""


@register(
    "dialect_prepared_params",
    oracle=_PARAMS.replace("$1", "DATE '1995-01-01'")
                  .replace("$2", "DATE '1996-01-01'")
                  .replace("$3", "50000"),
    doc="$n positional parameters (reference bind path: "
        "with_param_values at lib.rs:630-633) → Spark named-param binding.",
    tags=("dialect",),
)
def prepared_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    return _run_dialect(spark, sf_dir, _PARAMS, ("orders",),
                        params=[datetime.date(1995, 1, 1),
                                datetime.date(1996, 1, 1), 50000])


_DATE_BIN = """
SELECT date_bin(INTERVAL '15' MINUTE, event_ts, TIMESTAMP '2024-01-01 00:00:00')
           AS bin_start,
       COUNT(*) AS n
FROM (SELECT o_orderkey,
             TIMESTAMP '2024-01-01 00:00:00'
                 + make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 86400)
                 AS event_ts
      FROM orders WHERE o_orderkey <= 20000)
GROUP BY 1
"""


@register(
    "dialect_date_bin_to_char",
    oracle="""
SELECT time_bucket(INTERVAL '15 minutes', event_ts) AS bin_start, COUNT(*) AS n
FROM (SELECT o_orderkey,
             TIMESTAMP '2024-01-01 00:00:00'
                 + (o_orderkey % 86400) * INTERVAL '1 second' AS event_ts
      FROM orders WHERE o_orderkey <= 20000) t
GROUP BY 1
""",
    doc="DF date_bin(stride, ts, origin) as a pure-SQL-UDF (µs interval "
        "arithmetic, inlined into codegen); DuckDB oracle uses its "
        "equivalent time_bucket.",
    tags=("dialect",),
)
def date_bin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _DATE_BIN, ("orders",))


_REGEX_TOCHAR = """
SELECT o_orderkey,
       regexp_replace(o_orderpriority, '[aeiou]', '_', 'g') AS devoweled,
       to_char(o_orderdate, '%Y/%m/%d') AS formatted
FROM orders
WHERE o_orderkey <= 500
"""


@register(
    "dialect_regexp_flag_to_char",
    oracle="""
SELECT o_orderkey,
       regexp_replace(o_orderpriority, '[aeiou]', '_', 'g') AS devoweled,
       strftime(o_orderdate, '%Y/%m/%d') AS formatted
FROM orders
WHERE o_orderkey <= 500
""",
    doc="DF regexp_replace 'g' flag (stripped — Spark replaces all by "
        "default) + to_char Chrono pattern → date_format JDK pattern.",
    tags=("dialect",),
)
def regexp_flag_to_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _REGEX_TOCHAR, ("orders",))


_AT_TZ = """
SELECT o_orderkey,
       o_orderdate AT TIME ZONE 'America/New_York' AS local_ts
FROM orders
WHERE o_orderkey <= 300
"""


@register(
    "dialect_at_time_zone",
    oracle="""
SELECT o_orderkey,
       timezone('America/New_York',
                CAST(o_orderdate AS TIMESTAMPTZ)) AS local_ts
FROM orders
WHERE o_orderkey <= 300
""",
    doc="AT TIME ZONE (DF40/Postgres) -> from_utc_timestamp rewrite "
        "(UTC-stored instant rendered as zone wall-clock); DuckDB oracle "
        "casts to TIMESTAMPTZ (UTC session) then converts with "
        "timezone().",
    tags=("dialect",),
)
def at_time_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _AT_TZ, ("orders",))


# DF numeric trunc (1- and 2-arg), gcd/lcm (expression-only bounded
# Euclid fold), ns-timestamp construction — the former GAPS.md rows.
_TRUNC_GCD = """
SELECT o_orderkey,
       trunc(o_totalprice / 7, 2) AS p_trunc2,
       trunc(o_totalprice / 7) AS p_trunc0,
       gcd(o_orderkey, o_custkey) AS g,
       lcm(o_orderkey % 120, o_custkey % 84) AS l,
       to_timestamp_nanos(1704067200000000000 + o_orderkey * 1000000123) AS ts
FROM orders
WHERE o_orderkey <= 5000
"""


@register(
    "dialect_trunc_gcd_lcm_nanos",
    oracle="""
SELECT o_orderkey,
       sign(o_totalprice / 7) * floor(abs(o_totalprice / 7) * 100) / 100
           AS p_trunc2,
       trunc(o_totalprice / 7) AS p_trunc0,
       CAST(gcd(o_orderkey, o_custkey) AS BIGINT) AS g,
       CAST(lcm(o_orderkey % 120, o_custkey % 84) AS BIGINT) AS l,
       make_timestamp((1704067200000000000 + o_orderkey * 1000000123) // 1000)
           AS ts
FROM orders
WHERE o_orderkey <= 5000
""",
    doc="Numeric trunc(x[,s]) (truncate toward zero at scale), gcd/lcm "
        "(bounded-Euclid `aggregate` fold, 96 iterations ≥ the 64-bit "
        "worst case — no Python, whole-stage codegen), and "
        "to_timestamp_nanos (ns→µs truncation).  DuckDB oracle uses its "
        "NATIVE trunc/gcd/lcm, so the fold is independently verified.",
    tags=("dialect",),
)
def trunc_gcd_lcm_nanos(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _TRUNC_GCD, ("orders",))


_ENCODE_DECODE = """
SELECT p_partkey,
       encode(p_name, 'hex') AS name_hex,
       encode(p_name, 'base64') AS name_b64,
       decode(encode(p_name, 'hex'), 'hex')::string AS roundtrip_hex,
       decode(encode(p_name, 'base64'), 'base64')::string AS roundtrip_b64
FROM part
WHERE p_partkey <= 400
"""


@register(
    "dialect_encode_decode",
    oracle="""
SELECT p_partkey,
       lower(hex(p_name)) AS name_hex,
       to_base64(encode(p_name)) AS name_b64,
       decode(from_hex(lower(hex(p_name)))) AS roundtrip_hex,
       decode(from_base64(to_base64(encode(p_name)))) AS roundtrip_b64
FROM part
WHERE p_partkey <= 400
""",
    doc="DF encode/decode(x, 'hex'|'base64') codec dispatch around the "
        "Spark charset-encode name collision (dialect rename → "
        "df_encode/df_decode SQL UDFs); hex + base64 round-trips, "
        "DuckDB-native codec oracle.",
    tags=("dialect",),
)
def encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _ENCODE_DECODE, ("part",))


_REGEXP_MATCH = """
SELECT o_orderkey,
       to_json(regexp_match(o_orderpriority, '([0-9])-([A-Z]+)')) AS prio_parts,
       to_json(regexp_match(o_orderpriority, 'URGENT')) AS urgent_match
FROM orders
WHERE o_orderkey <= 1000
"""


@register(
    "dialect_regexp_match",
    oracle="""
SELECT o_orderkey,
       CAST(to_json(CASE WHEN regexp_matches(o_orderpriority, '([0-9])-([A-Z]+)')
            THEN [regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 1),
                  regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2)]
       END) AS VARCHAR) AS prio_parts,
       CAST(to_json(CASE WHEN regexp_matches(o_orderpriority, 'URGENT')
            THEN [regexp_extract(o_orderpriority, 'URGENT')]
       END) AS VARCHAR) AS urgent_match
FROM orders
WHERE o_orderkey <= 1000
""",
    doc="DF/Postgres regexp_match → array of first-match capture groups "
        "(whole match when the pattern has no groups, NULL on no "
        "match).  The shim derives the group count FROM the pattern "
        "(unescaped '(' not followed by '?'), so one expression covers "
        "any arity — no Python.  DuckDB oracle spells the same "
        "semantics with its native regexp functions.",
    tags=("dialect",),
)
def regexp_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _REGEXP_MATCH, ("orders",))


_ARRAY_FAMILY = """
SELECT c_custkey,
       to_json(array_positions(make_array(c_mktsegment, 'x', c_mktsegment),
                       c_mktsegment)) AS pos,
       to_json(array_replace(make_array(c_mktsegment, 'x', c_mktsegment),
                     c_mktsegment, 'Y')) AS rep_first,
       to_json(array_replace_all(make_array(c_mktsegment, 'x', c_mktsegment),
                         c_mktsegment, 'Y')) AS rep_all,
       to_json(array_resize(make_array(c_mktsegment, 'x'), 4, 'z')) AS resized,
       to_json(array_remove(make_array(c_mktsegment, 'x', c_mktsegment),
                    c_mktsegment)) AS rm_first,
       to_json(array_remove_all(make_array(c_mktsegment, 'x', c_mktsegment),
                        c_mktsegment)) AS rm_all,
       to_json(array_dims(make_array(c_mktsegment, 'x'))) AS dims
FROM customer
WHERE c_custkey <= 500
"""


@register(
    "dialect_array_family",
    oracle="""
SELECT c_custkey,
       CAST(to_json(list_filter(list_transform([c_mktsegment, 'x', c_mktsegment],
                     (x, i) -> CASE WHEN x = c_mktsegment
                               THEN CAST(i AS INT) END),
                   x -> x IS NOT NULL)) AS VARCHAR) AS pos,
       CAST(to_json(list_transform([c_mktsegment, 'x', c_mktsegment],
                      (x, i) -> CASE WHEN i = list_position(
                                    [c_mktsegment, 'x', c_mktsegment],
                                    c_mktsegment)
                                THEN 'Y' ELSE x END)) AS VARCHAR) AS rep_first,
       CAST(to_json(list_transform([c_mktsegment, 'x', c_mktsegment],
                      x -> CASE WHEN x = c_mktsegment
                           THEN 'Y' ELSE x END)) AS VARCHAR) AS rep_all,
       CAST(to_json([c_mktsegment, 'x', 'z', 'z']) AS VARCHAR) AS resized,
       CAST(to_json(['x', c_mktsegment]) AS VARCHAR) AS rm_first,
       CAST(to_json(['x']) AS VARCHAR) AS rm_all,
       CAST(to_json([CAST(2 AS INT)]) AS VARCHAR) AS dims
FROM customer
WHERE c_custkey <= 500
""",
    doc="DF array-family shims (SURVEY §2.9 Array): array_positions, "
        "first-occurrence array_replace/array_remove vs _all variants "
        "(DF's array_remove removes FIRST; Spark's same-named builtin "
        "removes all and backs DF's array_remove_all), array_resize, "
        "array_dims — all higher-order-lambda expressions, no Python; "
        "DuckDB oracle via its native list lambdas.",
    tags=("dialect",),
)
def array_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _ARRAY_FAMILY, ("customer",))


_REGEXP_MATCH_ALL = """
SELECT o_orderkey,
       to_json(df_regexp_match_all(o_orderpriority, '[A-Z]')) AS letters,
       to_json(df_regexp_match_all(o_orderpriority, '([A-Z])([A-Z])')) AS pairs,
       to_json(df_regexp_match_all(o_orderpriority, 'urgent', 'i')) AS ci
FROM orders
WHERE o_orderkey <= 1000
"""


@register(
    "dialect_regexp_match_all",
    oracle="""
SELECT o_orderkey,
       CAST(to_json(list_transform(regexp_extract_all(o_orderpriority, '[A-Z]'),
                      m -> [m])) AS VARCHAR) AS letters,
       CAST(to_json(list_transform(regexp_extract_all(o_orderpriority,
                                         '([A-Z])([A-Z])', 0),
                      m -> [regexp_extract(m, '([A-Z])([A-Z])', 1),
                            regexp_extract(m, '([A-Z])([A-Z])', 2)]))
         AS VARCHAR) AS pairs,
       CAST(to_json(list_transform(regexp_extract_all(o_orderpriority, '(?i)urgent'),
                      m -> [m])) AS VARCHAR) AS ci
FROM orders
WHERE o_orderkey <= 1000
""",
    doc="Multi-match regexp ('g'-flag family): every match as its "
        "capture-group array — the set-returning sibling of "
        "df_regexp_match, flattened to ARRAY<ARRAY<STRING>> (group "
        "count derived from the pattern, 'i' flag folds in). "
        "functions/aliases.py:df_regexp_match_all.",
    tags=("dialect",),
)
def regexp_match_all_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _REGEXP_MATCH_ALL, ("orders",))


# arrow_cast: DataFusion's Arrow-native cast spelling (a DF client's
# text, translated by rewrite_arrow_cast; DuckDB oracle uses plain CASTs)
_ARROW_CAST = """
SELECT o_orderkey,
       arrow_cast(o_orderkey, 'Int32') AS k32,
       arrow_cast(o_totalprice, 'Float32') AS price_f32,
       arrow_cast(o_orderstatus, 'LargeUtf8') AS status_str,
       CAST(arrow_cast(round(o_totalprice, 2), 'Decimal128(12, 2)')
            AS DOUBLE) AS price_dec,
       arrow_cast(o_orderdate, 'Timestamp(Microsecond, None)') AS ts_us
FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
"""


@register(
    "dialect_arrow_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS INT) AS k32,
       CAST(o_totalprice AS FLOAT) AS price_f32,
       CAST(o_orderstatus AS VARCHAR) AS status_str,
       CAST(CAST(round(o_totalprice, 2) AS DECIMAL(12,2)) AS DOUBLE)
         AS price_dec,
       CAST(o_orderdate AS TIMESTAMP) AS ts_us
FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
""",
    doc="arrow_cast with Arrow type names (Int32 / Float32 / LargeUtf8 "
        "/ Decimal128(p,s) / Timestamp(Microsecond, None)) rewritten to "
        "Spark CASTs — including a commas-in-first-arg expression.  "
        "Unknown type names pass through untouched and fail loudly. "
        "The Decimal128 result is cast through to DOUBLE on both sides "
        "(tpch_q12 recipe): raw DECIMAL result columns are driver-hostile "
        "— DuckDB's pandas path widens DECIMAL to float64 while Spark "
        "collects decimal.Decimal, so equal values hash differently "
        "(CORRECTNESS_r05's one red row).  The Decimal128(p,s) *rewrite* "
        "stays exercised; only the result representation changes. "
        "dialect/rewrite.py:rewrite_arrow_cast.",
    tags=("dialect",),
)
def arrow_cast_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _ARROW_CAST, ("orders",))


# DF40's list_* synonym family (datafusion-functions-nested registers a
# list_ alias for every array_ function) — a DF client's text, verbatim.
_LIST_ALIASES = """
WITH t AS (SELECT o_orderkey, make_array(o_orderstatus, 'b', 'c', 'b') AS arr
           FROM orders WHERE o_orderkey <= 200)
SELECT o_orderkey,
       list_length(arr) AS n,
       list_element(arr, 2) AS second,
       to_json(list_slice(arr, 2, 3)) AS mid,
       to_json(list_slice(arr, 2, -1)) AS tail,
       to_json(list_pop_back(arr)) AS popped,
       to_json(list_pop_front(arr)) AS shifted,
       list_position(arr, 'b') AS pos_b,
       to_json(list_positions(arr, 'b')) AS pos_all,
       to_json(list_remove(arr, 'b')) AS removed_first,
       to_json(list_replace(arr, 'b', 'x')) AS replaced_first,
       list_has_all(arr, make_array('b', 'c')) AS has_bc,
       to_json(list_sort(list_distinct(arr))) AS uniq_sorted,
       list_join(arr, '-') AS joined
FROM t ORDER BY o_orderkey
"""


@register(
    "dialect_list_aliases",
    oracle="""
WITH t AS (SELECT o_orderkey, [o_orderstatus, 'b', 'c', 'b'] AS arr
           FROM orders WHERE o_orderkey <= 200)
SELECT o_orderkey,
       CAST(len(arr) AS INT) AS n,
       arr[2] AS second,
       CAST(to_json(arr[2:3]) AS VARCHAR) AS mid,
       CAST(to_json(arr[2:4]) AS VARCHAR) AS tail,
       CAST(to_json(arr[1:3]) AS VARCHAR) AS popped,
       CAST(to_json(arr[2:4]) AS VARCHAR) AS shifted,
       CAST(list_position(arr, 'b') AS INT) AS pos_b,
       CAST(to_json(CAST(list_filter(list_transform(range(1, len(arr) + 1),
                 i -> CASE WHEN arr[i] = 'b' THEN i END),
            x -> x IS NOT NULL) AS INT[])) AS VARCHAR) AS pos_all,
       CAST(to_json(list_filter(list_transform(range(1, len(arr) + 1),
                 i -> CASE WHEN i <> list_position(arr, 'b')
                      THEN arr[i] END),
            x -> x IS NOT NULL)) AS VARCHAR) AS removed_first,
       CAST(to_json(list_transform(range(1, len(arr) + 1),
                 i -> CASE WHEN i = list_position(arr, 'b') THEN 'x'
                      ELSE arr[i] END)) AS VARCHAR) AS replaced_first,
       list_has_all(arr, ['b', 'c']) AS has_bc,
       CAST(to_json(list_sort(list_distinct(arr))) AS VARCHAR) AS uniq_sorted,
       array_to_string(arr, '-') AS joined
FROM t ORDER BY o_orderkey
""",
    doc="DF40 list_* synonyms (length/element/slice incl. negative to/"
        "pop_back/pop_front/position(s)/remove-first/replace-first/"
        "has_all/distinct/join) routed through the same targets as "
        "their array_* twins; the oracle spells DuckDB-native list "
        "semantics explicitly where DuckDB lacks the DF function. "
        "dialect/rewrite.py NAME_ALIASES, functions/aliases.py "
        "df_array_slice/array_pop_*.",
    tags=("dialect", "array"),
)
def list_aliases_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _LIST_ALIASES, ("orders",))


_REGEX_OPS = """
SELECT p_partkey, p_name,
       p_name ~ 'red.*t' AS re_match,
       p_name ~* 'RED' AS re_imatch,
       p_name !~ 'bolt$' AS re_not,
       p_name !~* 'WIDGET' AS re_inot,
       p_name ~~ '%red%' AS like_match,
       p_name ~~* '%RED%' AS ilike_match,
       p_name !~~ '%bolt' AS like_not,
       p_name !~~* '%WIDGET%' AS ilike_not
FROM part
WHERE p_partkey <= 500 AND p_name ~ '[a-z]+ [a-z]+'
"""


@register(
    "dialect_regex_operators",
    oracle="""
SELECT p_partkey, p_name,
       regexp_matches(p_name, 'red.*t') AS re_match,
       regexp_matches(p_name, 'RED', 'i') AS re_imatch,
       NOT regexp_matches(p_name, 'bolt$') AS re_not,
       NOT regexp_matches(p_name, 'WIDGET', 'i') AS re_inot,
       p_name LIKE '%red%' AS like_match,
       p_name ILIKE '%RED%' AS ilike_match,
       p_name NOT LIKE '%bolt' AS like_not,
       p_name NOT ILIKE '%WIDGET%' AS ilike_not
FROM part
WHERE p_partkey <= 500 AND regexp_matches(p_name, '[a-z]+ [a-z]+')
""",
    doc="Postgres regex operators ~ / ~* / !~ / !~* plus the LIKE "
        "spellings ~~ / ~~* / !~~ / !~~* (DF40 accepts all through "
        "sqlparser) → regexp_like with (?i) folding for the "
        "case-insensitive forms; prefix ~ (bitwise NOT) is untouched "
        "because the rewrite requires an operand before the operator. "
        "dialect/rewrite.py:rewrite_regex_operators.",
    tags=("dialect",),
)
def regex_operators_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _REGEX_OPS, ("part",))


@register(
    "dialect_group_order_by_all",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
""",
    doc="GROUP BY ALL / ORDER BY ALL — the modern-dialect shorthand "
        "(DuckDB, DataFusion, and Spark 3.4+ all accept it natively, "
        "so the IDENTICAL statement runs on both engines with no "
        "rewrite): non-aggregate select items become the grouping "
        "keys; every select item becomes the sort.  ORDER BY ALL "
        "totally orders the two key columns, so the rounded float "
        "column rides a deterministic row order.",
    tags=("dialect", "aggregate"),
)
def dialect_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY ALL
        ORDER BY ALL""")


_QUALIFY = """
SELECT o_custkey, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 2
ORDER BY o_custkey, rn
LIMIT 500
"""


@register(
    "dialect_qualify",
    oracle=_QUALIFY,
    doc="QUALIFY clause (DuckDB/BigQuery/Snowflake dialect): filter on "
        "window results without writing the subquery yourself — each "
        "customer's two most expensive orders.  Spark has no QUALIFY, "
        "so the rewrite wraps the statement and filters OUTSIDE, "
        "resolving the predicate against the SELECT-list aliases (the "
        "idiomatic QUALIFY form); trailing ORDER BY / LIMIT stay on "
        "the outer block.  DuckDB runs the original text natively as "
        "the oracle.  dialect/rewrite.py:rewrite_qualify.",
    tags=("dialect", "window"),
)
def dialect_qualify_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _QUALIFY, ("orders",))


@register(
    "dialect_create_external_csv",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderkey <= 2000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="CREATE EXTERNAL TABLE ... STORED AS CSV WITH HEADER ROW "
        "DELIMITER ';' LOCATION — the DF40 DDL text a reference client "
        "sends verbatim (sqlparser grammar, registered as a listing "
        "table via ctx.sql, lib.rs:678), rewritten to Spark's CREATE "
        "TABLE ... USING csv OPTIONS(path, header, sep) spelling, then "
        "queried through the catalog.  The fixture subset is first "
        "COPY'd out as a real semicolon-delimited header CSV, so the "
        "entry proves the whole loop: DDL translation, header/ "
        "delimiter options honored, declared column types applied, "
        "values surviving the text round-trip. "
        "dialect/rewrite.py:rewrite_external_table.",
    tags=("dialect", "ddl"),
)
def dialect_external_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    path = os.path.join("/tmp/spark_graft_scratch",
                        f"extcsv_{uuid.uuid4().hex[:8]}")
    (table(spark, sf_dir, "orders")
     .where(F.col("o_orderkey") <= 2000)
     .select("o_orderkey", "o_orderstatus", "o_totalprice")
     .write.mode("overwrite")
     .option("header", True).option("sep", ";").csv(path))
    ddl = (f"CREATE EXTERNAL TABLE ext_orders_csv "
           f"(o_orderkey BIGINT, o_orderstatus VARCHAR, "
           f"o_totalprice DOUBLE) "
           f"STORED AS CSV WITH HEADER ROW DELIMITER ';' "
           f"LOCATION '{path}'")
    spark.sql("DROP TABLE IF EXISTS ext_orders_csv")
    spark.sql(rewrite_sql(ddl))
    out = spark.sql(rewrite_sql(
        "SELECT o_orderstatus, "
        "       CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "       ROUND(SUM(o_totalprice), 2) AS total_price "
        "FROM ext_orders_csv GROUP BY o_orderstatus ORDER BY o_orderstatus"))
    rows = out.collect()
    spark.sql("DROP TABLE IF EXISTS ext_orders_csv")
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


# The exact text a DF/Postgres client sends — one literal mixing
# year-month and day-time units (DuckDB runs it verbatim).
_MIXED_INTERVAL = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL '1 month 10 days' AS TIMESTAMP) AS due,
       CAST(o_orderdate - INTERVAL '1 year 2 months 3 days' AS TIMESTAMP)
           AS lookback
FROM orders
WHERE o_orderkey <= 1000
"""


@register(
    "dialect_mixed_interval",
    oracle=_MIXED_INTERVAL,
    doc="Mixed-unit interval literals (INTERVAL '1 month 10 days' — "
        "DF40/Postgres accept one literal spanning year-month AND "
        "day-time units; Spark's split interval types cannot parse it). "
        "rewrite_mixed_interval splits the literal in additive position "
        "— months applied first, then days, Postgres' own evaluation "
        "order — distributing the sign for subtraction.  Oracle runs "
        "the original text verbatim. "
        "dialect/rewrite.py:rewrite_mixed_interval.",
    tags=("dialect",),
)
def mixed_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _MIXED_INTERVAL, ("orders",))


# The exact pinned-divergence shape (GAPS.md; DuckDB runs it verbatim):
# a grouping-set list containing the grand-total () set over an input
# the filter provably empties.  Standard (Postgres/DuckDB/DF40 via
# lib.rs:678): one row per () set, COUNT=0, everything else NULL.
_GROUPING_SETS_EMPTY = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS s,
       AVG(o_totalprice) AS avg_price
FROM orders
WHERE o_orderkey < 0
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
"""


@register(
    "agg_grouping_sets_empty",
    oracle=_GROUPING_SETS_EMPTY,
    doc="GROUPING SETS with the grand-total () set over an EMPTY input "
        "— the engine divergence GAPS.md used to pin (Spark's Expand "
        "emits 0 rows where the standard and the reference emit the "
        "() row), now CLOSED by rewrite_grouping_sets_empty: the "
        "dialect layer unions the statement with a global-aggregate "
        "twin of itself guarded by HAVING COUNT(*) = 0, which "
        "contributes exactly the standard's grand-total row on empty "
        "input and nothing otherwise.  Conservative by construction — "
        "shapes the pass cannot prove (set ops, windows, GROUPING_ID, "
        "nested non-column grouping exprs) fall back to Spark "
        "semantics loudly documented in GAPS.md.  Scale: the twin is "
        "one extra global partial-agg over the same (empty-after-"
        "pushdown) scan — the filter prunes at the source, so the "
        "sentinel costs a metadata-only pass at any corpus size. "
        "dialect/rewrite.py:rewrite_grouping_sets_empty.",
    tags=("aggregate", "dialect"),
)
def grouping_sets_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _GROUPING_SETS_EMPTY, ("orders",))


_CUBE_EMPTY = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM orders
WHERE o_totalprice < 0
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
"""


@register(
    "agg_cube_empty",
    oracle=_CUBE_EMPTY,
    doc="CUBE over an EMPTY input — the IMPLICIT grand-total half of "
        "the grouping-sets empty-input contract (CUBE and ROLLUP "
        "always contain the () set, so the standard emits exactly one "
        "all-NULL row with COUNT=0 where raw Spark emits none): the "
        "driver-visible witness that rewrite_grouping_sets_empty "
        "detects the implicit () in CUBE/ROLLUP spellings, not just "
        "the literal GROUPING SETS (()) form its sibling entry "
        "agg_grouping_sets_empty covers.  A filter no row satisfies "
        "(negative total price) empties the input at ANY corpus "
        "scale.  dialect/rewrite.py:rewrite_grouping_sets_empty.",
    tags=("aggregate", "dialect"),
)
def agg_cube_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_dialect(spark, sf_dir, _CUBE_EMPTY, ("orders",))
