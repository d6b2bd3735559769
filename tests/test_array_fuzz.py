"""Grammar fuzz for the array/list function family (SURVEY §2.9, the
``datafusion-functions-array`` surface) through the dialect rewriter:
queries in the reference's DF40 spelling (``make_array``,
``string_to_array``, ``list_*``/``array_*`` synonyms,
``generate_series``) run on Spark THROUGH ``rewrite_sql`` while DuckDB
executes a minimally re-spelled oracle (DuckDB lacks ``make_array``;
everything else is shared text).

Grammar constraints that keep the comparison exact:
- Set-producing ops (``list_distinct``, ``list_intersect``) are wrapped
  in ``list_sort`` in BOTH texts: DuckDB's result order is unspecified
  while Spark preserves first-appearance order.
- ``list_position`` / ``list_contains`` only probe elements that are
  guaranteed present (absent-element results diverge: DuckDB NULL vs
  Spark 0 for position).
- Slices stay within bounds established by the construction.
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
SEED = 0xA44A7


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    register_dialect_functions(spark)
    return spark, duck


def _base_array(rng: random.Random,
                force_kind: int | None = None) -> tuple[str, str, int, int]:
    """(source-dialect array expr, oracle array expr, min length, kind).

    ``kind`` doubles as an element-type tag (0 = string, 1/2 = integer)
    so two-array ops can pick type-compatible operands.
    """
    kind = rng.randrange(3) if force_kind is None else force_kind
    if kind == 0:
        # c_name is 'Customer#000000001'-shaped: split on '0' yields a
        # list whose exact shape both engines derive from identical text.
        sep = rng.choice(["#", "0"])
        e = f"string_to_array(c_name, '{sep}')"
        return e, e, 2, kind
    if kind == 1:
        n = rng.randrange(3, 6)
        cols = ["c_custkey", "c_nationkey", "c_custkey % 97",
                "c_nationkey + 1", "c_custkey % 7"][:n]
        return (f"make_array({', '.join(cols)})",
                f"list_value({', '.join(cols)})", n, kind)
    lo = rng.randrange(1, 4)
    hi = lo + rng.randrange(2, 6)
    e = f"generate_series({lo}, {hi})"
    return e, e, hi - lo + 1, kind


def _expr(rng: random.Random) -> tuple[str, str]:
    src, ora, n, btype = _base_array(rng)
    kind = rng.randrange(9)
    if kind == 0:
        fn = rng.choice(["array_length", "list_length"])
        return f"{fn}({src})", f"array_length({ora})"
    if kind == 1:
        i = rng.randrange(1, n + 1)
        fn = rng.choice(["list_element", "array_element", "list_extract"])
        return f"{fn}({src}, {i})", f"list_element({ora}, {i})"
    if kind == 2:
        sep = rng.choice(["-", "|", ""])
        return (f"array_to_string({src}, '{sep}')",
                f"array_to_string({ora}, '{sep}')")
    if kind == 3:
        fn = rng.choice(["array_reverse", "list_sort"])
        return f"{fn}({src})", f"{fn}({ora})"
    if kind == 4:
        return (f"list_sort(list_distinct({src}))",
                f"list_sort(list_distinct({ora}))")
    if kind == 5:
        # second operand must be element-type-compatible (string vs int)
        same = 0 if btype == 0 else rng.choice([1, 2])
        s2, o2, _, _ = _base_array(rng, force_kind=same)
        fn = rng.choice(["array_cat", "list_cat", "list_concat"])
        return f"{fn}({src}, {s2})", f"array_cat({ora}, {o2})"
    if kind == 6:
        # probe an element guaranteed present: the first one
        return (f"list_contains({src}, list_element({src}, 1))",
                f"list_contains({ora}, list_element({ora}, 1))")
    if kind == 7:
        return (f"list_position({src}, list_element({src}, 1))",
                f"list_position({ora}, list_element({ora}, 1))")
    i = rng.randrange(1, n)
    j = rng.randrange(i, n + 1)
    fn = rng.choice(["list_slice", "array_slice"])
    return f"{fn}({src}, {i}, {j})", f"list_slice({ora}, {i}, {j})"


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


def test_fuzzed_array_queries_match_duckdb(ctx):
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


def test_array_rewrite_is_idempotent_on_corpus():
    for sql, _oracle in _corpus():
        once = rewrite_sql(sql)
        assert rewrite_sql(once) == once, sql
