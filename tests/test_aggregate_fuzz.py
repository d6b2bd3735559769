"""Grammar fuzz for aggregation shapes (SURVEY §2.4) in the shared
dialect: GROUP BY / HAVING / FILTER clause / DISTINCT aggs / ROLLUP /
CUBE / GROUPING SETS, both engines running the IDENTICAL text over
lineitem, results compared as order-insensitive multisets.

Grammar constraints that keep the comparison exact:
- Double measures are converted to integer cents BEFORE summing
  (``SUM(CAST(round(x * 100) AS BIGINT))``): the per-value rounding is
  identical double math on both engines, and the outer sum is exact
  integer arithmetic — no summation-order ULP drift (the reason the
  dialect fuzz skips SUM(double)).
- Integer-returning aggregates are cast to BIGINT in the text itself
  (DuckDB widens SUM/COUNT_IF to HUGEINT, which the driver's
  pandas-dtype-sensitive hash rejects — the tpch_q12 recipe).
- AVG runs over BIGINT inputs only (both engines return DOUBLE, and the
  integer partial sums are exact below 2^53).
- GROUPING SETS lists never contain the empty set ``()`` alone over a
  possibly-empty input (Spark's Expand emits zero rows where the
  standard emits one grand-total row on empty input — GAPS.md); the
  generated predicates always select a non-empty slice at sf0.001.
"""

from __future__ import annotations

import random

import pytest

from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _normalize

N_EXAMPLES = 50
SEED = 0xA66F422


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark, duck


_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def _measure(rng: random.Random) -> str:
    kind = rng.randrange(8)
    if kind == 0:
        return "COUNT(*) AS n"
    if kind == 1:
        col = rng.choice(_KEYS + ["l_suppkey", "l_partkey"])
        return f"COUNT(DISTINCT {col}) AS nd"
    if kind == 2:
        col = rng.choice(["l_extendedprice", "l_discount", "l_tax"])
        return (f"CAST(SUM(CAST(round({col} * 100) AS BIGINT)) AS BIGINT)"
                " AS cents")
    if kind == 3:
        return "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty"
    if kind == 4:
        col = rng.choice(["l_extendedprice", "l_shipdate", "l_returnflag"])
        fn = rng.choice(["MIN", "MAX"])
        return f"{fn}({col}) AS m"
    if kind == 5:
        return "CAST(AVG(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS avg_qty"
    if kind == 6:
        lim = rng.randrange(10, 45)
        agg = rng.choice(["COUNT(*)", "SUM(CAST(l_quantity AS BIGINT))"])
        return (f"CAST({agg} FILTER (WHERE l_quantity > {lim}) AS BIGINT)"
                " AS filt")
    lim = rng.randrange(1000, 50000)
    return (f"CAST(COUNT_IF(l_extendedprice > {lim}) AS BIGINT) AS big_n")


def _grouping(rng: random.Random, keys: list[str]) -> tuple[str, list[str]]:
    """(GROUP BY clause, extra SELECT columns)."""
    shape = rng.randrange(5)
    if shape == 0:
        return "GROUP BY " + ", ".join(keys), keys
    if shape == 1:
        return f"GROUP BY ROLLUP({', '.join(keys)})", keys
    if shape == 2:
        return f"GROUP BY CUBE({', '.join(keys)})", keys
    if shape == 3 and len(keys) >= 2:
        sets = f"(({keys[0]}), ({', '.join(keys)}), ())"
        extra = [f"CAST(GROUPING({keys[0]}) AS INTEGER) AS g0"]
        return f"GROUP BY GROUPING SETS {sets}", keys + extra
    return "GROUP BY " + ", ".join(keys), keys


def _gen_query(rng: random.Random) -> str:
    keys = rng.sample(_KEYS, rng.randrange(1, 3))
    measures = {m.rsplit(" AS ", 1)[1]: m
                for m in (_measure(rng) for _ in range(rng.randrange(1, 4)))}
    group_by, select_keys = _grouping(rng, keys)
    # Non-empty slice: sf0.001 lineitem orderkeys are dense in [0, 1499]
    # (1473 of 1500 present) — lo ≤ 700 with width ≥ 300 always hits rows,
    # keeping Spark's empty-input ROLLUP/CUBE divergence (GAPS.md) out of
    # scope by construction.
    lo = rng.randrange(0, 700)
    where = f"WHERE l_orderkey BETWEEN {lo} AND {lo + rng.randrange(300, 700)}"
    having = ""
    if rng.randrange(3) == 0:
        having = f" HAVING COUNT(*) > {rng.randrange(1, 6)}"
    cols = ", ".join(select_keys + list(measures.values()))
    return f"SELECT {cols} FROM lineitem {where} {group_by}{having}"


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_aggregate_queries_match_duckdb(ctx):
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
