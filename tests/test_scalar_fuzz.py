"""Grammar fuzz for scalar string / date-time / math expressions
(SURVEY §2.9) in the shared dialect: both engines run the IDENTICAL
text over orders, results compared as order-insensitive multisets.

Grammar constraints that keep the comparison exact:
- ceil/floor are CAST to BIGINT in the text itself (Spark returns LONG,
  DuckDB DOUBLE — same values, different canon without the cast).
- round(double, s) stays within the 12-significant-digit canon.
- No engine-specific function names (datediff vs date_diff) — only the
  intersection spelled identically in both.
"""

from __future__ import annotations

import random

import pytest

from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _normalize

N_EXAMPLES = 45
SEED = 0x5CA1A4


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark, duck


def _expr(rng: random.Random) -> str:
    kind = rng.randrange(10)
    if kind == 0:
        part = rng.choice(["year", "month", "day", "hour"])
        return f"CAST(extract({part} FROM o_orderdate) AS BIGINT)"
    if kind == 1:
        # DuckDB's date_trunc returns DATE for day-or-coarser units,
        # Spark always TIMESTAMP — the explicit cast unifies the canon.
        unit = rng.choice(["month", "quarter", "year", "week", "day"])
        return f"CAST(date_trunc('{unit}', o_orderdate) AS TIMESTAMP)"
    if kind == 2:
        n = rng.randrange(1, 30)
        unit = rng.choice(["DAY", "MONTH", "HOUR"])
        return f"o_orderdate + INTERVAL {n} {unit}"
    if kind == 3:
        a, b = rng.randrange(1, 4), rng.randrange(2, 6)
        return f"substr(o_orderpriority, {a}, {b})"
    if kind == 4:
        return rng.choice(["upper(o_orderpriority)",
                           "lower(o_orderpriority)",
                           "length(o_orderpriority)",
                           "trim(o_orderpriority)",
                           "reverse(o_orderstatus)"])
    if kind == 5:
        return f"replace(o_orderpriority, '-', '{rng.choice(['_', ':', ''])}')"
    if kind == 6:
        return "o_orderstatus || '-' || o_orderpriority"
    if kind == 7:
        s = rng.randrange(0, 3)
        return f"round(o_totalprice, {s})"
    if kind == 8:
        return rng.choice(["CAST(ceil(o_totalprice) AS BIGINT)",
                           "CAST(floor(o_totalprice) AS BIGINT)",
                           "abs(o_custkey - 500)"])
    lim = rng.randrange(50000, 300000)
    return (f"CASE WHEN o_totalprice > {lim} THEN 'big' "
            "WHEN o_orderstatus = 'F' THEN 'done' ELSE 'other' END")


def _gen_query(rng: random.Random) -> str:
    exprs = [f"{_expr(rng)} AS e{i}" for i in range(rng.randrange(2, 5))]
    lo = rng.randrange(1, 5000)
    return ("SELECT o_orderkey, " + ", ".join(exprs) +
            f" FROM orders WHERE o_orderkey BETWEEN {lo} AND {lo + 2500}")


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_scalar_queries_match_duckdb(ctx):
    spark, con = ctx
    failures = []
    for i, sql in enumerate(_corpus()):
        s_df = spark.sql(sql)
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
                f"example {i}: {sql!r}\n  spark rows={len(s_norm)}"
                f" oracle rows={len(o_norm)} first diff at {diff}:"
                f" spark={s_norm[diff] if diff is not None and diff < len(s_norm) else None}"
                f" oracle={o_norm[diff] if diff is not None and diff < len(o_norm) else None}"
            )
    assert not failures, "\n".join(failures)
