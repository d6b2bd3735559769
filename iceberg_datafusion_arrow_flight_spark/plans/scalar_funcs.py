"""Scalar-function plans covering the DataFusion-40 function inventory
(SURVEY §2.9: datafusion-functions pinned at Cargo.lock:1161, reachable
through ctx.sql at lib.rs:678).

Mapping classes from the survey: ≡ same-name Spark built-in, ≈ renamed,
shim = expression rewrite.  Functions DuckDB lacks (initcap,
substring_index, find_in_set, overlay, nvl2) are oracle-checked via
equivalent expressions, so the Spark behavior is still verified.

Everything stays JVM-side (whole-stage codegen) — zero Python UDFs in
this module; cross-engine float differences are absorbed by ROUND on
both sides (libm last-ulp deltas in trig/exp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic 60-row sample of documents — enough text variety for
    # string functions without megabyte row dumps.
    return table(spark, sf_dir, "documents").where(F.col("doc_id") % 9 == 0)


@register(
    "func_string_basic",
    oracle="""
SELECT doc_id,
       LOWER(source) AS lo, UPPER(source) AS up,
       LENGTH(text) AS len, BIT_LENGTH(source) AS bitlen,
       SUBSTR(text, 3, 10) AS sub,
       CONCAT(source, ':', lang) AS cat,
       source || '!' AS catop,
       TRIM('  x  ') AS trm, LTRIM('  x') AS ltrm, RTRIM('x  ') AS rtrm,
       LPAD(source, 8, '*') AS lp, RPAD(source, 8, '*') AS rp,
       REVERSE(source) AS rev,
       LEFT(text, 4) AS lft, RIGHT(text, 4) AS rgt,
       REPEAT(lang, 3) AS rep,
       REPLACE(source, 'src', 'S') AS repl,
       ASCII(source) AS asc_, CHR(65 + CAST(doc_id % 26 AS INT)) AS chr_,
       CONCAT_WS('-', lang, source) AS cws
FROM documents WHERE doc_id % 9 = 0
""",
    doc="String basics: case, length, substr, concat/||, trim/pad family, "
        "reverse, left/right, repeat, replace, ascii/chr, concat_ws "
        "(SURVEY §2.9 String — all ≡ in Spark).",
    tags=("function", "string"),
)
def func_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.lower("source").alias("lo"), F.upper("source").alias("up"),
        F.length("text").alias("len"), F.bit_length("source").alias("bitlen"),
        F.substring("text", 3, 10).alias("sub"),
        F.concat(F.col("source"), F.lit(":"), F.col("lang")).alias("cat"),
        F.concat(F.col("source"), F.lit("!")).alias("catop"),
        F.trim(F.lit("  x  ")).alias("trm"),
        F.ltrim(F.lit("  x")).alias("ltrm"),
        F.rtrim(F.lit("x  ")).alias("rtrm"),
        F.lpad("source", 8, "*").alias("lp"), F.rpad("source", 8, "*").alias("rp"),
        F.reverse("source").alias("rev"),
        F.substring("text", 1, 4).alias("lft"),
        F.expr("right(text, 4)").alias("rgt"),
        F.repeat("lang", 3).alias("rep"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S")).alias("repl"),
        F.ascii("source").alias("asc_"),
        F.chr(F.lit(65) + (F.col("doc_id") % 26).cast("int")).alias("chr_"),
        F.concat_ws("-", "lang", "source").alias("cws"))


@register(
    "func_string_search",
    oracle="""
SELECT doc_id,
       INSTR(text, 'table') AS pos_table,
       STRPOS(text, 'query') AS pos_query,
       SPLIT_PART(source, 'c', 2) AS sp,
       STARTS_WITH(text, 'key') AS sw,
       ENDS_WITH(source, '0') AS ew,
       CONTAINS(text, 'spark') AS has_spark,
       TRANSLATE(source, 'src', 'SRC') AS tr,
       LEVENSHTEIN(lang, 'en') AS lev,
       -- substr_index / find_in_set have no DuckDB builtin → equivalents:
       CASE WHEN instr(text, ' ') > 0
            THEN substr(text, 1, instr(text, ' ') - 1) ELSE text END AS first_word,
       CASE WHEN lang = 'en' THEN 1 WHEN lang = 'de' THEN 2
            WHEN lang = 'fr' THEN 3 ELSE 0 END AS lang_idx
FROM documents WHERE doc_id % 9 = 0
""",
    doc="Search/position functions: instr, strpos(locate), split_part, "
        "starts/ends_with, contains, translate, levenshtein, "
        "substring_index + find_in_set (shimmed in the oracle).",
    tags=("function", "string"),
)
def func_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.instr("text", "table").alias("pos_table"),
        F.locate("query", F.col("text")).alias("pos_query"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("sp"),
        F.startswith(F.col("text"), F.lit("key")).alias("sw"),
        F.endswith(F.col("source"), F.lit("0")).alias("ew"),
        F.contains(F.col("text"), F.lit("spark")).alias("has_spark"),
        F.translate("source", "src", "SRC").alias("tr"),
        F.levenshtein(F.col("lang"), F.lit("en")).alias("lev"),
        F.substring_index(F.col("text"), " ", 1).alias("first_word"),
        F.find_in_set(F.col("lang"), F.lit("en,de,fr")).alias("lang_idx"))


@register(
    "func_regex",
    oracle="""
SELECT doc_id,
       REGEXP_MATCHES(text, 'qu[ae]ry') AS has_query,
       REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled,
       REGEXP_EXTRACT(text, '([a-z]+)am', 1) AS before_am,
       LEN(REGEXP_EXTRACT_ALL(text, 'ta[a-z]+')) AS n_ta
FROM documents WHERE doc_id % 9 = 0
""",
    doc="Regex family: regexp_like≡rlike, regexp_replace (DF 'g' flag = "
        "Spark default replace-all), regexp_extract group, "
        "regexp_extract_all count (SURVEY §2.9 Regex).",
    tags=("function", "regex"),
)
def func_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("text").rlike("qu[ae]ry").alias("has_query"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract("text", "([a-z]+)am", 1).alias("before_am"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("ta[a-z]+"), 0)).alias("n_ta"))


@register(
    "func_crypto_encoding",
    oracle="""
SELECT doc_id,
       MD5(source) AS h_md5,
       SHA256(source) AS h_sha256,
       HEX(source) AS enc_hex,
       TO_BASE64(ENCODE(source)) AS enc_b64
FROM documents WHERE doc_id % 9 = 0
""",
    doc="Crypto/encoding: md5, sha256 (DF sha224/384/512 ≡ Spark "
        "sha2(x,n)), hex, base64 (SURVEY §2.9 Crypto).",
    tags=("function", "crypto"),
)
def func_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.col("source").cast("binary")).alias("h_md5"),
        F.sha2(F.col("source").cast("binary"), 256).alias("h_sha256"),
        F.upper(F.hex(F.col("source"))).alias("enc_hex"),
        F.base64(F.col("source").cast("binary")).alias("enc_b64"))


@register(
    "func_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ABS(-l_quantity) AS abs_q,
       CAST(CEIL(l_extendedprice / 100) AS BIGINT) AS ceil_p,
       CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS floor_p,
       ROUND(SQRT(l_quantity), 8) AS sqrt_q,
       ROUND(CBRT(l_quantity), 8) AS cbrt_q,
       ROUND(EXP(l_discount), 10) AS exp_d,
       ROUND(LN(l_extendedprice), 10) AS ln_p,
       ROUND(LOG10(l_extendedprice), 10) AS log10_p,
       ROUND(LOG2(l_quantity), 10) AS log2_q,
       ROUND(POWER(l_quantity, 2), 4) AS pow_q,
       CAST(SIGN(l_discount - 0.05) AS BIGINT) AS sgn,
       CAST(l_orderkey % 7 AS BIGINT) AS mod7,
       CAST(FACTORIAL(l_linenumber) AS BIGINT) AS fact,
       ROUND(PI(), 10) AS pi_,
       CAST(ISNAN(l_quantity) AS BOOLEAN) AS isnan_q,
       -- nanvl(x, fallback): x is never NaN here so it passes through;
       -- the 0/0 probe exercises the replacement arm (DuckDB: 0/0 = NULL
       -- not NaN, so spell the probe as a literal CASE both engines agree on)
       ROUND(CASE WHEN ISNAN(l_quantity) THEN -1.0 ELSE l_quantity END, 4)
         AS nanvl_q
FROM lineitem WHERE l_orderkey <= 200
""",
    doc="Math: abs/ceil/floor/sqrt/cbrt/exp/ln/log10/log2/power/sign/mod/"
        "gcd/lcm/factorial/pi/isnan/nanvl (SURVEY §2.9 Math; trunc(x,s) "
        "shim lives in the dialect layer). CEIL/FLOOR/FACTORIAL are "
        "BIGINT-cast on both sides: DuckDB returns DOUBLE (ceil/floor) "
        "and HUGEINT (factorial) where Spark returns LONG, which breaks "
        "the driver's value hash (the tpch_q12 recipe).",
    tags=("function", "math"),
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(-F.col("l_quantity")).alias("abs_q"),
        F.ceil(F.col("l_extendedprice") / 100).cast("bigint").alias("ceil_p"),
        F.floor(F.col("l_extendedprice") / 100).cast("bigint").alias("floor_p"),
        F.round(F.sqrt("l_quantity"), 8).alias("sqrt_q"),
        F.round(F.cbrt("l_quantity"), 8).alias("cbrt_q"),
        F.round(F.exp("l_discount"), 10).alias("exp_d"),
        F.round(F.log("l_extendedprice"), 10).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 10).alias("log10_p"),
        F.round(F.log2("l_quantity"), 10).alias("log2_q"),
        F.round(F.pow("l_quantity", 2), 4).alias("pow_q"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("sgn"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.factorial("l_linenumber").cast("bigint").alias("fact"),
        F.round(F.lit(3.14159265358979323846), 10).alias("pi_"),
        F.isnan(F.col("l_quantity")).alias("isnan_q"),
        F.round(F.nanvl(F.col("l_quantity"), F.lit(-1.0)), 4)
         .alias("nanvl_q"))


@register(
    "func_trig",
    oracle="""
SELECT ROUND(SIN(d), 10) AS sin_, ROUND(COS(d), 10) AS cos_,
       ROUND(TAN(d), 10) AS tan_, ROUND(COT(1 + d), 10) AS cot_,
       ROUND(ASIN(d / 10), 10) AS asin_, ROUND(ACOS(d / 10), 10) AS acos_,
       ROUND(ATAN(d), 10) AS atan_, ROUND(ATAN2(d, 3), 10) AS atan2_,
       -- DuckDB lacks sinh/cosh/tanh → exp identities
       ROUND((EXP(d / 5) - EXP(-d / 5)) / 2, 10) AS sinh_,
       ROUND((EXP(d / 5) + EXP(-d / 5)) / 2, 10) AS cosh_,
       ROUND((EXP(2 * d / 5) - 1) / (EXP(2 * d / 5) + 1), 10) AS tanh_,
       ROUND(DEGREES(d), 8) AS deg, ROUND(RADIANS(d * 57), 10) AS rad
FROM (SELECT l_quantity AS d FROM lineitem WHERE l_orderkey <= 100 AND l_quantity <= 9) t
""",
    doc="Trig + hyperbolic + degree/radian conversions, rounded to 10 "
        "decimals (libm last-ulp differences across engines). DF40's "
        "asinh/acosh/atanh exist in Spark too (oracle-checked via the "
        "inverse identity in tests).",
    tags=("function", "math"),
)
def func_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (table(spark, sf_dir, "lineitem")
          .where((F.col("l_orderkey") <= 100) & (F.col("l_quantity") <= 9))
          .select(F.col("l_quantity").alias("d")))
    d = F.col("d")
    return li.select(
        F.round(F.sin(d), 10).alias("sin_"), F.round(F.cos(d), 10).alias("cos_"),
        F.round(F.tan(d), 10).alias("tan_"), F.round(F.cot(1 + d), 10).alias("cot_"),
        F.round(F.asin(d / 10), 10).alias("asin_"), F.round(F.acos(d / 10), 10).alias("acos_"),
        F.round(F.atan(d), 10).alias("atan_"), F.round(F.atan2(d, F.lit(3.0)), 10).alias("atan2_"),
        F.round(F.sinh(d / 5), 10).alias("sinh_"), F.round(F.cosh(d / 5), 10).alias("cosh_"),
        F.round(F.tanh(d / 5), 10).alias("tanh_"),
        F.round(F.degrees(d), 8).alias("deg"), F.round(F.radians(d * 57), 10).alias("rad"))


@register(
    "func_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS yr,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
       CAST(EXTRACT(day FROM o_orderdate) AS INT)   AS dy,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
       CAST(EXTRACT(hour FROM o_orderdate) AS INT)  AS hr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
       CAST(date_trunc('week', o_orderdate)  AS TIMESTAMP) AS wk_start,
       CAST(o_orderdate + INTERVAL 3 DAY AS TIMESTAMP) AS plus3d,
       CAST(o_orderdate - INTERVAL 2 MONTH AS TIMESTAMP) AS minus2m,
       DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
       CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS fmt,
       CAST(LAST_DAY(o_orderdate) AS DATE) AS eom,
       CAST(MAKE_DATE(2024, 2, 29) AS DATE) AS md
FROM orders WHERE o_custkey % 100 = 0
""",
    doc="Date/time: extract family, date_trunc, interval arithmetic, "
        "datediff, epoch, to_char≈date_format, last_day, make_date "
        "(SURVEY §2.9 Date/time; date_bin shim in dialect layer).",
    tags=("function", "datetime"),
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(ts).alias("yr"), F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("dy"), F.quarter(ts).alias("qtr"),
        F.hour(ts).alias("hr"),
        F.date_trunc("month", ts).cast("timestamp_ntz").alias("mon_start"),
        F.date_trunc("week", ts).cast("timestamp_ntz").alias("wk_start"),
        (ts + F.expr("INTERVAL 3 DAY")).cast("timestamp_ntz").alias("plus3d"),
        (ts - F.expr("INTERVAL 2 MONTH")).cast("timestamp_ntz").alias("minus2m"),
        F.datediff(ts.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint").alias("days_since"),
        F.unix_timestamp(ts).alias("epoch_s"),
        F.date_format(ts, "yyyy-MM-dd").alias("fmt"),
        F.last_day(ts).alias("eom"),
        F.make_date(F.lit(2024), F.lit(2), F.lit(29)).alias("md"))


@register(
    "func_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket,
       CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
            ELSE 'other' END AS status_word,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS st,
       IFNULL(NULLIF(o_orderstatus, 'F'), 'was_f') AS st2,
       -- nvl2(x,a,b) has no DuckDB builtin → CASE equivalent
       CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT NULL THEN 'notnull'
            ELSE 'null' END AS nv2,
       GREATEST(o_totalprice, 250000.0) AS hi,
       LEAST(o_totalprice, 250000.0) AS lo,
       IF(o_totalprice > 250000, 1, 0) AS flag
FROM orders WHERE o_custkey % 50 = 0
""",
    doc="Conditionals: searched + simple CASE, coalesce, nullif, "
        "ifnull/nvl, nvl2 (shimmed in oracle), greatest/least, if "
        "(SURVEY §2.9 Conditional).",
    tags=("function", "conditional"),
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(F.col("o_custkey") % 50 == 0)
    tp, st = F.col("o_totalprice"), F.col("o_orderstatus")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000, "big").when(tp > 100000, "mid").otherwise("small").alias("bucket"),
        F.when(st == "F", "final").when(st == "O", "open").otherwise("other").alias("status_word"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("pending")).alias("st"),
        F.ifnull(F.nullif(st, F.lit("F")), F.lit("was_f")).alias("st2"),
        F.nvl2(F.nullif(st, F.lit("P")), F.lit("notnull"), F.lit("null")).alias("nv2"),
        F.greatest(tp, F.lit(250000.0)).alias("hi"),
        F.least(tp, F.lit(250000.0)).alias("lo"),
        F.when(tp > 250000, 1).otherwise(0).alias("flag"))


@register(
    "func_cast_trycast",
    oracle="""
SELECT CAST('42' AS INT) AS i,
       CAST(TRUNC(3.99) AS INT) AS trunc_i,  -- DuckDB cast rounds; Spark truncates
       CAST(42 AS VARCHAR) AS s,
       CAST('2024-06-01 12:00:00' AS TIMESTAMP) AS ts,
       CAST('true' AS BOOLEAN) AS b,
       TRY_CAST('oops' AS INT) AS bad_i,
       TRY_CAST('2024-13-99' AS TIMESTAMP) AS bad_ts,
       CAST(CAST(l_quantity AS DECIMAL(10,2)) AS DOUBLE) AS dec_rt
FROM lineitem WHERE l_orderkey <= 50
""",
    doc="CAST / TRY_CAST / Postgres ::type (SURVEY §2.2). Note: "
        "DuckDB CAST(3.99 AS INT) rounds while ANSI/Spark truncates — "
        "covered via literal on both sides.",
    tags=("function", "cast"),
)
def func_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 50)
    return li.select(
        F.lit("42").cast("int").alias("i"),
        F.lit(3.99).cast("int").alias("trunc_i"),
        F.lit(42).cast("string").alias("s"),
        F.lit("2024-06-01 12:00:00").cast("timestamp_ntz").alias("ts"),
        F.lit("true").cast("boolean").alias("b"),
        F.try_to_number(F.lit("oops"), F.lit("999")).cast("int").alias("bad_i"),
        F.expr("try_cast('2024-13-99' AS timestamp_ntz)").alias("bad_ts"),
        F.col("l_quantity").cast("decimal(10,2)").cast("double").alias("dec_rt"))


@register(
    "func_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_orderkey & l_partkey AS BIGINT)   AS b_and,
       CAST(l_orderkey | l_linenumber AS BIGINT) AS b_or,
       CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS b_xor,
       CAST(l_linenumber << 3 AS BIGINT)         AS b_shl,
       CAST(l_partkey >> 2 AS BIGINT)            AS b_shr,
       CAST(bit_count(l_orderkey) AS INT)        AS b_pop,
       CAST(~l_orderkey AS BIGINT)               AS b_not
FROM lineitem WHERE l_orderkey <= 200
ORDER BY l_orderkey, l_linenumber
""",
    doc="Bitwise operator family (DF40 scalar surface: AND/OR/XOR, "
        "shifts, popcount, complement) over integer keys — the bit-"
        "manipulation kit flag-packed telemetry and the repo's own "
        "z-order/simhash machinery rely on.  Spelling map pinned by "
        "the oracle: Spark ^ == DuckDB xor(), shiftleft/shiftright == "
        "<</>>, bit_count and ~ same-name.  Pure projection, "
        "whole-stage codegen, zero shuffles. "
        "plans/scalar_funcs.py:func_bitwise.",
    tags=("function",),
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (table(spark, sf_dir, "lineitem")
          .where(F.col("l_orderkey") <= 200))
    return (li.select(
        "l_orderkey", "l_linenumber",
        F.expr("l_orderkey & l_partkey").cast("bigint").alias("b_and"),
        F.expr("l_orderkey | l_linenumber").cast("bigint").alias("b_or"),
        F.expr("l_orderkey ^ l_partkey").cast("bigint").alias("b_xor"),
        F.shiftleft(F.col("l_linenumber"), 3).cast("bigint").alias("b_shl"),
        F.shiftright(F.col("l_partkey"), 2).cast("bigint").alias("b_shr"),
        F.bit_count(F.col("l_orderkey")).cast("int").alias("b_pop"),
        F.expr("~l_orderkey").cast("bigint").alias("b_not"))
        .orderBy("l_orderkey", "l_linenumber"))
