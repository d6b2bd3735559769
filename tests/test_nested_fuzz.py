"""Grammar fuzz for the nested-type family (SURVEY §2.9: struct /
get_field / map / JSON — the ``datafusion-functions`` nested surface
plus the Spark-surplus JSON functions) through the dialect rewriter:
queries in the reference's DF40 spelling (``named_struct``,
``get_field``, dotted field access) run on Spark THROUGH
``rewrite_sql`` while DuckDB executes a re-spelled oracle
(``struct_pack(f := x)``, ``map([...],[...])`` + ``map_extract(...)[1]``,
``json_extract_string``).

Grammar constraints that keep the comparison exact:
- JSON-carried values stay integer/string typed: float/decimal JSON
  rendering is engine-specific, ints and the fixtures' safe-charset
  strings (c_name, c_mktsegment) serialize identically.
- Map results are never shipped whole (GAPS.md: MAP columns don't
  hash cross-engine) — only extracted values and sorted key lists.
- DuckDB ``map_extract`` returns a LIST; the oracle indexes ``[1]``
  to match Spark's scalar ``element_at``.
"""

from __future__ import annotations

import random

import pytest

from iceberg_datafusion_arrow_flight_spark.dialect import rewrite_sql
from iceberg_datafusion_arrow_flight_spark.functions import (
    register_dialect_functions,
)
from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _normalize

N_EXAMPLES = 45
SEED = 0x57AC7


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    register_dialect_functions(spark)
    return spark, duck


_INT_COLS = ["c_custkey", "c_nationkey", "c_custkey % 97",
             "c_nationkey + 3", "c_custkey % 11"]
_STR_COLS = ["c_name", "c_mktsegment"]


def _base_struct(rng: random.Random) -> tuple[str, str, list[str]]:
    """(source named_struct, oracle struct_pack, field names) with 2-3
    int/string fields drawn from the safe-serialization columns."""
    nf = rng.randrange(2, 4)
    fields, src_parts, ora_parts = [], [], []
    for i in range(nf):
        val = rng.choice(_INT_COLS if rng.randrange(2) else _STR_COLS)
        name = f"f{i}"
        fields.append(name)
        src_parts.append(f"'{name}', {val}")
        ora_parts.append(f"{name} := {val}")
    return (f"named_struct({', '.join(src_parts)})",
            f"struct_pack({', '.join(ora_parts)})", fields)


def _expr(rng: random.Random) -> tuple[str, str]:
    kind = rng.randrange(8)
    if kind == 0:                       # dotted field access
        s, o, fs = _base_struct(rng)
        f = rng.choice(fs)
        return f"{s}.{f}", f"{o}.{f}"
    if kind == 1:                       # DF40 get_field spelling
        s, o, fs = _base_struct(rng)
        f = rng.choice(fs)
        return f"get_field({s}, '{f}')", f"{o}.{f}"
    if kind == 2:                       # struct → JSON text, exact match
        s, o, _ = _base_struct(rng)
        return f"to_json({s})", f"to_json({o})"
    if kind == 3:                       # JSON path extraction
        s, o, fs = _base_struct(rng)
        f = rng.choice(fs)
        return (f"get_json_object(to_json({s}), '$.{f}')",
                f"json_extract_string(to_json({o}), '$.{f}')")
    if kind == 4:                       # map build + scalar extract
        n = rng.randrange(2, 4)
        vals = [rng.choice(_INT_COLS) for _ in range(n)]
        keys = [f"k{i}" for i in range(n)]
        probe = rng.choice(keys)
        src_kv = ", ".join(f"'{k}', {v}" for k, v in zip(keys, vals))
        ora_k = ", ".join(f"'{k}'" for k in keys)
        return (f"element_at(map({src_kv}), '{probe}')",
                f"map_extract(map([{ora_k}], [{', '.join(vals)}]),"
                f" '{probe}')[1]")
    if kind == 5:                       # sorted key list round-trip
        n = rng.randrange(2, 4)
        vals = [rng.choice(_INT_COLS) for _ in range(n)]
        keys = [f"k{i}" for i in range(n)]
        src_kv = ", ".join(f"'{k}', {v}" for k, v in zip(keys, vals))
        ora_k = ", ".join(f"'{k}'" for k in keys)
        return (f"array_sort(map_keys(map({src_kv})))",
                f"list_sort(map_keys(map([{ora_k}],"
                f" [{', '.join(vals)}])))")
    if kind == 6:                       # JSON array index + length
        n = rng.randrange(2, 5)
        vals = [rng.choice(_INT_COLS) for _ in range(n)]
        i = rng.randrange(n)
        if rng.randrange(2):
            return (f"get_json_object(to_json(array({', '.join(vals)})),"
                    f" '$[{i}]')",
                    f"json_extract_string(to_json([{', '.join(vals)}]),"
                    f" '$[{i}]')")
        return (f"json_array_length(to_json(array({', '.join(vals)})))",
                f"json_array_length(to_json([{', '.join(vals)}]))")
    # kind == 7: nested struct, two-level dotted access
    s, o, fs = _base_struct(rng)
    f = rng.choice(fs)
    return (f"named_struct('x', {s}).x.{f}",
            f"struct_pack(x := {o}).x.{f}")


def _gen_query(rng: random.Random) -> tuple[str, str]:
    pairs = [_expr(rng) for _ in range(rng.randrange(2, 5))]
    src_cols = ", ".join(f"{s} AS e{i}" for i, (s, _) in enumerate(pairs))
    ora_cols = ", ".join(f"{o} AS e{i}" for i, (_, o) in enumerate(pairs))
    lo = rng.randrange(1, 1200)
    where = f"WHERE c_custkey BETWEEN {lo} AND {lo + 150}"
    return (f"SELECT c_custkey, {src_cols} FROM customer {where}",
            f"SELECT c_custkey, {ora_cols} FROM customer {where}")


def _corpus() -> list[tuple[str, str]]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_nested_queries_match_duckdb(ctx):
    """DuckDB(oracle text) == Spark(rewrite_sql(source text))."""
    spark, con = ctx
    failures = []
    for i, (sql, oracle) in enumerate(_corpus()):
        translated = rewrite_sql(sql)
        s_df = spark.sql(translated)
        s_cols, s_rows = list(s_df.columns), [tuple(r) for r in s_df.collect()]
        rel = con.sql(oracle)
        o_cols, o_rows = list(rel.columns), rel.fetchall()
        _, s_norm = _normalize(s_cols, s_rows)
        _, o_norm = _normalize(o_cols, o_rows)
        if sorted(s_cols) != sorted(o_cols) or s_norm != o_norm:
            diff = next(
                (j for j, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
                None,
            )
            failures.append(
                f"example {i}: {sql!r}\n  translated: {translated!r}\n"
                f"  spark rows={len(s_norm)} oracle rows={len(o_norm)}"
                f" first diff at {diff}:"
                f" spark={s_norm[diff] if diff is not None and diff < len(s_norm) else None}"
                f" oracle={o_norm[diff] if diff is not None and diff < len(o_norm) else None}"
            )
    assert not failures, "\n".join(failures)


def test_nested_rewrite_is_idempotent_on_corpus():
    for sql, _oracle in _corpus():
        once = rewrite_sql(sql)
        assert rewrite_sql(once) == once, sql
