"""Grammar fuzz for three-valued boolean logic (SURVEY §2.2: filter
algebra, IS [NOT] TRUE/FALSE, IS DISTINCT FROM, CASE/COALESCE/NULLIF) —
the NULL-propagation corner where engines classically diverge.

Both engines parse the SAME text (the Spark side still goes through
``rewrite_sql``, which must leave shared-dialect text untouched —
pinned by the idempotence test).  NULLs are injected via
``NULLIF(col, k)`` so every combinator sees genuine UNKNOWNs, and the
generated predicates appear BOTH as projected boolean columns (where
UNKNOWN must surface as NULL) and in WHERE (where UNKNOWN must drop
the row) — the two places a wrong three-valued table shows up
differently.
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

N_EXAMPLES = 60
SEED = 0xB001


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    register_dialect_functions(spark)
    return spark, duck


def _atom(rng: random.Random) -> str:
    k = rng.randrange(6)
    if k == 0:     # genuinely nullable comparison
        return (f"NULLIF(c_nationkey, {rng.randrange(25)})"
                f" > {rng.randrange(20)}")
    if k == 1:
        return f"c_custkey % {rng.randrange(2, 9)} > {rng.randrange(5)}"
    if k == 2:
        return f"c_name LIKE '%{rng.randrange(10)}%'"
    if k == 3:     # CASE that emits NULL as a boolean value
        return (f"CASE WHEN c_custkey % {rng.randrange(3, 7)} = 0 THEN"
                f" NULL ELSE c_nationkey > {rng.randrange(12)} END")
    if k == 4:
        return f"NULLIF(c_custkey % 5, {rng.randrange(5)}) = 2"
    return "c_acctbal < 0"


def _bool(rng: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rng.randrange(3) == 0:
        return _atom(rng)
    k = rng.randrange(6)
    if k == 0:
        return f"({_bool(rng, depth + 1)} AND {_bool(rng, depth + 1)})"
    if k == 1:
        return f"({_bool(rng, depth + 1)} OR {_bool(rng, depth + 1)})"
    if k == 2:
        return f"(NOT {_bool(rng, depth + 1)})"
    if k == 3:
        post = rng.choice(["IS TRUE", "IS NOT TRUE", "IS FALSE",
                           "IS NOT FALSE", "IS NULL", "IS NOT NULL"])
        return f"(({_bool(rng, depth + 1)}) {post})"
    if k == 4:
        return (f"(({_bool(rng, depth + 1)}) IS DISTINCT FROM"
                f" ({_bool(rng, depth + 1)}))")
    return (f"(CASE WHEN {_bool(rng, depth + 1)} THEN"
            f" {_bool(rng, depth + 1)} ELSE {_bool(rng, depth + 1)} END)")


def _gen_query(rng: random.Random) -> str:
    cols = ", ".join(f"{_bool(rng)} AS b{i}"
                     for i in range(rng.randrange(2, 5)))
    # a COALESCE'd CASE over a nullable predicate, mapped to ints
    p = _bool(rng)
    cols += (f", CASE WHEN {p} THEN 1 WHEN ({p}) IS NULL THEN 2"
             f" ELSE 3 END AS verdict")
    lo = rng.randrange(1, 1200)
    where = f"c_custkey BETWEEN {lo} AND {lo + 200}"
    if rng.randrange(2):           # UNKNOWN in WHERE must drop the row
        where += f" AND ({_bool(rng)})"
    return f"SELECT c_custkey, {cols} FROM customer WHERE {where}"


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_boolean_queries_match_duckdb(ctx):
    """DuckDB(text) == Spark(rewrite_sql(text)) — shared dialect."""
    spark, con = ctx
    failures = []
    for i, sql in enumerate(_corpus()):
        translated = rewrite_sql(sql)
        s_df = spark.sql(translated)
        s_cols, s_rows = list(s_df.columns), [tuple(r) for r in s_df.collect()]
        rel = con.sql(sql)
        o_cols, o_rows = list(rel.columns), rel.fetchall()
        _, s_norm = _normalize(s_cols, s_rows)
        _, o_norm = _normalize(o_cols, o_rows)
        if sorted(s_cols) != sorted(o_cols) or s_norm != o_norm:
            diff = next(
                (j for j, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b),
                None,
            )
            failures.append(
                f"example {i}: {sql!r}\n"
                f"  spark rows={len(s_norm)} oracle rows={len(o_norm)}"
                f" first diff at {diff}:"
                f" spark={s_norm[diff] if diff is not None and diff < len(s_norm) else None}"
                f" oracle={o_norm[diff] if diff is not None and diff < len(o_norm) else None}"
            )
    assert not failures, "\n".join(failures)


def test_boolean_rewrite_leaves_shared_text_unchanged():
    """The corpus is shared-dialect: the rewriter must not touch it
    (and must stay idempotent on it)."""
    for sql in _corpus():
        once = rewrite_sql(sql)
        assert rewrite_sql(once) == once, sql
