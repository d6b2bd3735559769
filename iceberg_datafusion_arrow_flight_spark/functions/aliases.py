"""DataFusion-40 function names as Spark SQL scalar UDFs.

Spark 4's ``CREATE TEMPORARY FUNCTION ... RETURN <expr>`` defines a pure
Catalyst expression inlined at analysis time (whole-stage codegen applies
— verified: a SQL-UDF-only projection folds to LocalTableScan).  This is
the right vehicle for DF names whose Spark twin differs in arg order or
needs a small expression: no Python, no serialization, no perf cliff.

Names that are pure renames are handled cheaper, in
``dialect.rewrite.NAME_ALIASES``.  Names Spark already has (``random``,
``current_database``, ``levenshtein``, ``split_part``, …) need nothing —
registration of an existing builtin name raises
``CANNOT_REPLACE_NON_SQL_UDF_WITH_SQL_UDF`` and is skipped, so this
module stays correct across Spark versions that absorb more names.

Former "documented gaps" now closed here, still expression-only:
numeric ``trunc(x,s)`` (→ ``df_trunc`` + dialect rename; builtins can't
be shadowed directly), ``gcd``/``lcm`` (bounded-Euclid ``aggregate``
fold — 96 iterations covers every 64-bit pair, worst case is the
Fibonacci pair fib(92),fib(91)), ``encode``/``decode`` hex|base64
dispatch (→ ``df_encode``/``df_decode`` + dialect rename around the
Spark charset-``encode`` collision), ``to_timestamp_nanos``
(ns → µs truncation, the Iceberg-Spark precision limit).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.utils import AnalysisException

# DDL per function.  DF semantics cited per entry (SURVEY §2.9).
SQL_UDFS: dict[str, str] = {
    # DF strpos(string, substring) — arg order is the reverse of Spark's
    # locate(substr, str).
    "df_strpos": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_strpos(s STRING, sub STRING) "
        "RETURNS INT RETURN locate(sub, s)"),
    # DF iszero(x) → boolean.
    "df_iszero": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_iszero(x DOUBLE) "
        "RETURNS BOOLEAN RETURN x = 0.0d"),
    # DF string_to_array splits on a LITERAL delimiter; Spark split() takes
    # a Java regex — quote it (\Q...\E) so '.', '|', etc. split literally.
    "df_string_to_array": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_string_to_array"
        "(s STRING, d STRING) RETURNS ARRAY<STRING> "
        r"RETURN split(s, concat('\\Q', d, '\\E'))"),
    # DF digest(expr, algorithm) — dispatch over the algorithm name.
    "digest": (
        "CREATE OR REPLACE TEMPORARY FUNCTION digest(s STRING, algo STRING) "
        "RETURNS STRING RETURN CASE lower(algo) "
        "WHEN 'md5' THEN md5(s) "
        "WHEN 'sha1' THEN sha1(s) "
        "WHEN 'sha224' THEN sha2(s, 224) "
        "WHEN 'sha256' THEN sha2(s, 256) "
        "WHEN 'sha384' THEN sha2(s, 384) "
        "WHEN 'sha512' THEN sha2(s, 512) END"),
    # DF sha224/256/384/512(x) single-arg forms.
    "sha224": ("CREATE OR REPLACE TEMPORARY FUNCTION sha224(s STRING) "
               "RETURNS STRING RETURN sha2(s, 224)"),
    "sha256": ("CREATE OR REPLACE TEMPORARY FUNCTION sha256(s STRING) "
               "RETURNS STRING RETURN sha2(s, 256)"),
    "sha384": ("CREATE OR REPLACE TEMPORARY FUNCTION sha384(s STRING) "
               "RETURNS STRING RETURN sha2(s, 384)"),
    "sha512": ("CREATE OR REPLACE TEMPORARY FUNCTION sha512(s STRING) "
               "RETURNS STRING RETURN sha2(s, 512)"),
    # DF date_bin(stride, source, origin): floor source into stride-wide
    # bins anchored at origin.  Pure µs arithmetic on day-time intervals.
    "date_bin": (
        "CREATE OR REPLACE TEMPORARY FUNCTION date_bin"
        "(stride INTERVAL DAY TO SECOND, ts TIMESTAMP, origin TIMESTAMP) "
        "RETURNS TIMESTAMP RETURN timestamp_micros(unix_micros(origin) + "
        "CAST(floor((unix_micros(ts) - unix_micros(origin)) / "
        "(extract(DAY FROM stride) * 86400000000.0 + "
        "extract(HOUR FROM stride) * 3600000000.0 + "
        "extract(MINUTE FROM stride) * 60000000.0 + "
        "extract(SECOND FROM stride) * 1000000.0)) * "
        "(extract(DAY FROM stride) * 86400000000.0 + "
        "extract(HOUR FROM stride) * 3600000000.0 + "
        "extract(MINUTE FROM stride) * 60000000.0 + "
        "extract(SECOND FROM stride) * 1000000.0) AS BIGINT))"),
    # DF nvl2(x, y, z) — Spark has it; kept for older Sparks, skipped when
    # builtin (same for the rest below).
    "ends_with": ("CREATE OR REPLACE TEMPORARY FUNCTION ends_with"
                  "(s STRING, suffix STRING) RETURNS BOOLEAN "
                  "RETURN endswith(s, suffix)"),
    "starts_with": ("CREATE OR REPLACE TEMPORARY FUNCTION starts_with"
                    "(s STRING, prefix STRING) RETURNS BOOLEAN "
                    "RETURN startswith(s, prefix)"),
    # DF list/array helpers without a one-word Spark spelling.
    "array_has_all": ("CREATE OR REPLACE TEMPORARY FUNCTION array_has_all"
                      "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS BOOLEAN "
                      "RETURN size(array_except(b, a)) = 0"),
    # DF array family without Spark builtins (SURVEY §2.9 Array shims).
    # SQL UDFs are typed; ARRAY<STRING> is the fixture-exercised arm —
    # other element types coerce or can get sibling registrations.
    # All 1-indexed like DF and Spark.
    "array_positions": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_positions"
        "(a ARRAY<STRING>, e STRING) RETURNS ARRAY<INT> RETURN "
        "filter(transform(a, (x, i) -> "
        "IF(x <=> e, CAST(i + 1 AS INT), CAST(NULL AS INT))), "
        "x -> x IS NOT NULL)"),
    # DF array_replace replaces the FIRST occurrence only.
    "array_replace": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_replace"
        "(a ARRAY<STRING>, f STRING, t STRING) RETURNS ARRAY<STRING> "
        "RETURN transform(a, (x, i) -> "
        "IF(i + 1 = array_position(a, f), t, x))"),
    "array_replace_all": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_replace_all"
        "(a ARRAY<STRING>, f STRING, t STRING) RETURNS ARRAY<STRING> "
        "RETURN transform(a, x -> IF(x <=> f, t, x))"),
    "array_resize": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_resize"
        "(a ARRAY<STRING>, n INT, v STRING) RETURNS ARRAY<STRING> RETURN "
        "IF(n <= size(a), slice(a, 1, n), "
        "concat(a, array_repeat(v, n - size(a))))"),
    # DF array_remove removes the FIRST occurrence; Spark's builtin of
    # the same name removes ALL (it backs DF's array_remove_all via the
    # dialect rename) — hence the df_ prefix here.
    "df_array_remove": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_array_remove"
        "(a ARRAY<STRING>, e STRING) RETURNS ARRAY<STRING> RETURN "
        "filter(transform(a, (x, i) -> "
        "IF(i + 1 = array_position(a, e), CAST(NULL AS STRING), x)), "
        "x -> x IS NOT NULL)"),
    # 1-D arrays only (Arrow/DF fixed nesting reads as nested ARRAY in
    # Spark; multidim dims would recurse — out of fixture scope).
    "array_dims": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_dims"
        "(a ARRAY<STRING>) RETURNS ARRAY<INT> "
        "RETURN array(CAST(size(a) AS INT))"),
    # DF array_ndims / array_empty (dialect renames point here; same 1-D
    # scope as array_dims above).  NULL array → NULL, like DF.
    "df_array_ndims": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_array_ndims"
        "(a ARRAY<STRING>) RETURNS INT "
        "RETURN IF(a IS NULL, CAST(NULL AS INT), 1)"),
    "df_array_empty": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_array_empty"
        "(a ARRAY<STRING>) RETURNS BOOLEAN RETURN size(a) = 0"),
    # DF current_time() returns a TIME value; Spark has no TIME type
    # (GAPS.md) so the shim returns the Iceberg-Spark convention instead:
    # µs-of-day as BIGINT — the same representation TIME columns read as.
    "df_current_time": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_current_time() "
        "RETURNS BIGINT RETURN "
        "(unix_micros(now()) - unix_micros(CAST(current_date() AS TIMESTAMP)))"),
    # DF array_slice(a, from, to): 1-based, INCLUSIVE to (Spark's slice
    # takes a length) — negative `to` counts from the end like DF.
    "df_array_slice": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_array_slice"
        "(a ARRAY<STRING>, f INT, t INT) RETURNS ARRAY<STRING> RETURN "
        "slice(a, f, greatest(IF(t < 0, size(a) + t + 1, t) - f + 1, 0))"),
    # DF array_pop_back / array_pop_front; empty/1-element → empty.
    "array_pop_back": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_pop_back"
        "(a ARRAY<STRING>) RETURNS ARRAY<STRING> "
        "RETURN slice(a, 1, greatest(size(a) - 1, 0))"),
    "array_pop_front": (
        "CREATE OR REPLACE TEMPORARY FUNCTION array_pop_front"
        "(a ARRAY<STRING>) RETURNS ARRAY<STRING> "
        "RETURN IF(size(a) <= 1, slice(a, 1, 0), slice(a, 2, size(a) - 1))"),
    # DF/Postgres regexp_match(s, p): capture groups of the FIRST match
    # (whole match when the pattern has no groups), NULL when no match.
    # The capture-group count is computed FROM THE PATTERN ITSELF
    # (unescaped '(' not followed by '?'), so group patterns need no
    # per-call arity — full semantics in one codegen'd expression.
    # Optional 3rd arg = DF's flags ('i' case-insensitive, folded into
    # the pattern as '(?i)'; 'g' changes multi-match shape in DF —
    # unsupported here, documented).
    "df_regexp_match": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_regexp_match"
        "(s STRING, p STRING, flags STRING DEFAULT '') "
        "RETURNS ARRAY<STRING> RETURN "
        "CASE WHEN s IS NULL OR p IS NULL THEN NULL "
        "WHEN NOT s RLIKE concat(IF(contains(flags, 'i'), '(?i)', ''), p) "
        "THEN NULL "
        r"WHEN regexp_count(p, '(?<!\\\\)\\((?!\\?)') = 0 "
        "THEN array(regexp_extract(s, "
        "concat(IF(contains(flags, 'i'), '(?i)', ''), p), 0)) "
        r"ELSE transform(sequence(1, regexp_count(p, '(?<!\\\\)\\((?!\\?)')), "
        "i -> regexp_extract(s, "
        "concat(IF(contains(flags, 'i'), '(?i)', ''), p), i)) END"),
    # Postgres regexp_matches(s, p, 'g') / DF multi-match form: ALL
    # matches, each as its capture-group array (whole match when the
    # pattern has no groups).  Same pattern-derived group count as
    # df_regexp_match; per-match groups re-extracted from the matched
    # substring — one codegen'd expression, no Python.
    "df_regexp_match_all": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_regexp_match_all"
        "(s STRING, p STRING, flags STRING DEFAULT '') "
        "RETURNS ARRAY<ARRAY<STRING>> RETURN "
        "CASE WHEN s IS NULL OR p IS NULL THEN NULL ELSE "
        "transform(regexp_extract_all(s, "
        "concat(IF(contains(flags, 'i'), '(?i)', ''), p), 0), m -> "
        r"CASE WHEN regexp_count(p, '(?<!\\\\)\\((?!\\?)') = 0 "
        "THEN array(m) "
        r"ELSE transform(sequence(1, regexp_count(p, '(?<!\\\\)\\((?!\\?)')), "
        "i -> regexp_extract(m, "
        "concat(IF(contains(flags, 'i'), '(?i)', ''), p), i)) END) END"),
    # DF numeric trunc(x[, s]): truncate toward zero at scale s (Spark's
    # `trunc` builtin is date-only; dialect renames trunc → df_trunc).
    "df_trunc": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_trunc"
        "(x DOUBLE, s INT DEFAULT 0) RETURNS DOUBLE "
        "RETURN sign(x) * floor(abs(x) * power(10, s)) / power(10, s)"),
    # DF gcd(a, b): SQL has no loop, but `aggregate` over a constant
    # sequence IS a bounded fold — Euclid needs ≤ 92 steps for any two
    # 64-bit ints (worst case: consecutive Fibonacci numbers), so 96
    # iterations make the fold exact, whole-stage-codegen'd, no Python.
    "gcd": (
        "CREATE OR REPLACE TEMPORARY FUNCTION gcd(a BIGINT, b BIGINT) "
        "RETURNS BIGINT RETURN aggregate(sequence(1, 96), "
        "struct(abs(a) AS x, abs(b) AS y), "
        "(acc, i) -> CASE WHEN acc.y = 0 THEN acc "
        "ELSE struct(acc.y AS x, acc.x % acc.y AS y) END, "
        "acc -> acc.x)"),
    # DF lcm(a, b) = |a / gcd(a,b) * b| (divide first to avoid overflow).
    "lcm": (
        "CREATE OR REPLACE TEMPORARY FUNCTION lcm(a BIGINT, b BIGINT) "
        "RETURNS BIGINT RETURN CASE WHEN a = 0 OR b = 0 THEN 0 "
        "ELSE abs((a DIV gcd(a, b)) * b) END"),
    # DF encode/decode(x, 'hex'|'base64') codec dispatch.  Spark's
    # builtin encode/decode are charset converters — the dialect layer
    # renames DF's spelling to these (DF40 hex output is lowercase).
    "df_encode": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_encode"
        "(s STRING, fmt STRING) RETURNS STRING RETURN CASE lower(fmt) "
        "WHEN 'hex' THEN lower(hex(s)) "
        "WHEN 'base64' THEN base64(s) END"),
    "df_decode": (
        "CREATE OR REPLACE TEMPORARY FUNCTION df_decode"
        "(s STRING, fmt STRING) RETURNS BINARY RETURN CASE lower(fmt) "
        "WHEN 'hex' THEN unhex(s) "
        "WHEN 'base64' THEN unbase64(s) END"),
    # DF to_timestamp_nanos(ns): engine precision is µs (Iceberg-Spark
    # limit, GAPS.md) — sub-µs digits truncate, by design.
    "to_timestamp_nanos": (
        "CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_nanos"
        "(n BIGINT) RETURNS TIMESTAMP RETURN timestamp_micros(n DIV 1000)"),
}


def register_dialect_functions(spark: SparkSession) -> list[str]:
    """Register every shim on the session; returns the names actually
    created (names already covered by a Spark builtin are skipped)."""
    created: list[str] = []
    for name, ddl in SQL_UDFS.items():
        try:
            spark.sql(ddl)
            created.append(name)
        except AnalysisException as exc:
            if "CANNOT_REPLACE_NON_SQL_UDF" in str(exc):
                continue  # Spark builtin already provides the name
            raise
    return created
