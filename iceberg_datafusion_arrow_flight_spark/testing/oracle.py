"""Local replica of the driver's DuckDB-oracle correctness gate.

The driver (see ``__spark_entry__.py`` docstring) runs each registered
Spark plan and its oracle SQL side-by-side at sf0.01 and compares
row-count + schema + order-insensitive value hash.  This module implements
the same comparison so every plan is verified locally *before* the driver
sees it — SURVEY §5's t2 strategy.

Normalization: columns sorted by name, rows sorted by all columns,
values canonicalized (floats rounded to 9 significant-ish decimals,
timestamps to ISO micros, arrays recursively).  Both engines' outputs pass
through the identical normalizer, so any surviving difference is a real
semantic mismatch.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..plans import REGISTRY
from ..sources.registry import TABLES


# --- type-class fidelity -----------------------------------------------------
#
# The driver's value hash is pandas-dtype-sensitive: DuckDB HUGEINT
# (COUNT_IF, FACTORIAL, SUM(int)) and DOUBLE-returning CEIL/FLOOR hash
# differently from Spark's LONG even when every value compares equal
# (CORRECTNESS_r02: agg_bool_bit, func_math — rows and schema matched,
# hash didn't).  Stringly value comparison alone cannot see this, so the
# local gate also maps both engines' result types into coarse classes and
# requires them to agree column-by-column.  HUGEINT deliberately maps to
# its own class that matches nothing: the fix is always an explicit
# BIGINT cast on both sides (the tpch_q12 recipe).
#
# DECIMAL is driver-hostile the same way (learned the hard way:
# CORRECTNESS_r05's only red row, dialect_arrow_cast): DuckDB's pandas
# conversion widens DECIMAL(p,s) to float64 while Spark's DecimalType
# collects as decimal.Decimal — equal values, different driver hashes.
# The local fetchall() path sees Decimal on both sides and is blind to
# it, so BOTH engines' decimal classes map to side-tagged names that can
# never match: cast the result column to DOUBLE (or VARCHAR) on both
# sides instead.

_SPARK_TYPE_CLASS: list[tuple[type, str]] = [
    (T.ByteType, "int"), (T.ShortType, "int"), (T.IntegerType, "int"),
    (T.LongType, "int"),
    (T.FloatType, "float"), (T.DoubleType, "float"),
    (T.DecimalType, "decimal(spark: cast to DOUBLE/VARCHAR on both sides)"),
    (T.StringType, "string"), (T.BooleanType, "bool"),
    (T.DateType, "date"),
    (T.TimestampType, "timestamp"), (T.TimestampNTZType, "timestamp"),
    (T.BinaryType, "binary"),
    (T.ArrayType, "nested"), (T.MapType, "nested"), (T.StructType, "nested"),
    (T.NullType, "null"),
]


def _spark_type_class(dt: T.DataType) -> str:
    for klass, name in _SPARK_TYPE_CLASS:
        if isinstance(dt, klass):
            return name
    return f"other:{dt.simpleString()}"


def _duck_type_class(type_str: str) -> str:
    s = type_str.upper()
    if "[" in s or s.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "nested"
    if s in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal(duckdb: cast to DOUBLE/VARCHAR on both sides)"
    if s in ("VARCHAR", "JSON"):
        return "string"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s == "BLOB":
        return "binary"
    if s == '"NULL"' or s == "NULL":
        return "null"
    return f"other:{s}"


def _type_class_mismatches(df, rel) -> list[str]:
    """Column-level type-class disagreements between a Spark DataFrame
    and a DuckDB relation (both not yet executed)."""
    s_class = {f.name: _spark_type_class(f.dataType) for f in df.schema.fields}
    d_class = dict(zip(rel.columns, (_duck_type_class(str(t)) for t in rel.types)))
    out = []
    for col in sorted(set(s_class) & set(d_class)):
        sc, dc = s_class[col], d_class[col]
        # NULL literals are typeless on either side — any class may carry them.
        if sc == dc or "null" in (sc, dc):
            continue
        out.append(f"{col}: spark={sc} oracle={dc}")
    return out


def _canon_scalar(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # 12 significant digits: tight enough to catch real bugs, loose
        # enough to absorb last-ulp float formatting differences.
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (struct value) → dict like DuckDB
        return _canon_scalar(v.asDict(recursive=True))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_scalar(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_scalar(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = [tuple(_canon_scalar(row[i]) for i in order) for row in rows]
    out.sort()
    return cols_sorted, out


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = 0
    oracle_rows: int = 0


def _duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def check_query(spark: SparkSession, name: str, sf_dir: str,
                con: duckdb.DuckDBPyConnection | None = None) -> CheckResult:
    spec = REGISTRY[name]
    df = spec.build(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    if spec.oracle is None:
        return CheckResult(name, True, "rows-only (no oracle)", len(s_rows), -1)
    own = con is None
    if own:
        con = _duck_conn(sf_dir)
    try:
        rel = con.sql(spec.oracle)
        o_cols = list(rel.columns)
        type_mismatches = _type_class_mismatches(df, rel)
        o_rows = rel.fetchall()
    finally:
        if own:
            con.close()
    if type_mismatches:
        return CheckResult(name, False,
                           "type-class mismatch (driver hash would differ): "
                           + "; ".join(type_mismatches),
                           len(s_rows), len(o_rows))
    if sorted(s_cols) != sorted(o_cols):
        return CheckResult(name, False,
                           f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
                           len(s_rows), len(o_rows))
    if len(s_rows) != len(o_rows):
        return CheckResult(name, False,
                           f"rowcount mismatch: spark={len(s_rows)} oracle={len(o_rows)}",
                           len(s_rows), len(o_rows))
    _, s_norm = _normalize(list(s_cols), s_rows)
    _, o_norm = _normalize(list(o_cols), o_rows)
    if s_norm != o_norm:
        diff = next((i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b), None)
        detail = "value mismatch"
        if diff is not None:
            detail += f" at sorted row {diff}: spark={s_norm[diff]} oracle={o_norm[diff]}"
        return CheckResult(name, False, detail, len(s_rows), len(o_rows))
    return CheckResult(name, True, "", len(s_rows), len(o_rows))


def _cache_manager_empty(spark: SparkSession) -> bool:
    """True iff no Dataset.cache()/persist() entry is pinned in the SQL
    CacheManager.  Operators that return lazy plans must NOT cache
    intermediates (they could never unpersist them) — they use
    localCheckpoint, whose blocks the ContextCleaner reclaims on GC and
    which never registers here."""
    try:
        return bool(
            spark._jsparkSession.sharedState().cacheManager().isEmpty())
    except Exception:  # noqa: BLE001 — py4j surface drift: don't fail the gate
        return True


def run_all(spark: SparkSession, sf_dir: str,
            names: list[str] | None = None) -> list[CheckResult]:
    con = _duck_conn(sf_dir)
    results = []
    try:
        for name in (names or list(REGISTRY)):
            try:
                res = check_query(spark, name, sf_dir, con)
            except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
                res = CheckResult(name, False, f"EXCEPTION: {exc}")
            # Leak invariant runs on EVERY path (ok, failed, raised) so a
            # leaking entry is charged for its own leak — clearing here
            # also stops the leak from falsely reddening the NEXT entry.
            if not _cache_manager_empty(spark):
                spark.catalog.clearCache()
                res = CheckResult(
                    name, False,
                    "leaked Dataset.cache(): entry left a pinned "
                    "CacheManager relation behind (unpersist "
                    "discipline — use localCheckpoint for lazily-"
                    "returned intermediates)"
                    + ("" if res.ok else f"; also: {res.detail}"),
                    res.spark_rows, res.oracle_rows)
            results.append(res)
    finally:
        con.close()
    return results
