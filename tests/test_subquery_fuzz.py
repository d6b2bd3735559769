"""Grammar fuzz for subquery and CTE shapes (SURVEY §2.8) in the shared
dialect: uncorrelated scalar subqueries, IN / NOT IN subqueries,
correlated scalar COUNT in the SELECT list, and 2-step CTE chains —
both engines run the IDENTICAL text, results compared as
order-insensitive multisets.

Grammar constraints that keep the comparison exact:
- Scalar subqueries return MIN/MAX/COUNT (exact) — never SUM/AVG of
  doubles, whose summation-order ULP drift could flip a comparison at
  the boundary.
- NOT IN subqueries only probe non-null key columns (c_custkey,
  o_custkey are NOT NULL in TPC-H), so three-valued NOT IN semantics
  never engage.
- Correlated scalar subqueries use a single equality predicate (the
  shape Spark's decorrelation supports) and COUNT(*) (both engines
  return 0, not NULL, for empty groups after decorrelation).
"""

from __future__ import annotations

import random

import pytest

from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _normalize

N_EXAMPLES = 40
SEED = 0x5B9C7E


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark, duck


_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
_STATUSES = ["O", "F", "P"]


def _o_pred(rng: random.Random) -> str:
    if rng.randrange(2):
        # sf0.001 orders keys are dense in [0, 1499]
        lo = rng.randrange(0, 900)
        return f"o_orderkey BETWEEN {lo} AND {lo + rng.randrange(200, 600)}"
    return f"o_orderstatus = '{rng.choice(_STATUSES)}'"


def _c_pred(rng: random.Random) -> str:
    if rng.randrange(2):
        # sf0.001 customer keys are dense in [0, 149]
        lo = rng.randrange(0, 100)
        return f"c_custkey BETWEEN {lo} AND {lo + rng.randrange(20, 80)}"
    return f"c_mktsegment = '{rng.choice(_SEGMENTS)}'"


def _gen_query(rng: random.Random) -> str:
    shape = rng.randrange(4)
    if shape == 0:  # uncorrelated scalar subquery in WHERE
        agg = rng.choice(["MIN(o_orderkey)", "MAX(o_custkey)",
                          "COUNT(*)"])
        op = rng.choice(["<", ">", "<=", ">="])
        return (
            "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders "
            f"WHERE {_o_pred(rng)} AND o_custkey {op} "
            f"(SELECT {agg} / 7 FROM orders WHERE {_o_pred(rng)})"
        )
    if shape == 1:  # IN / NOT IN subquery over non-null keys
        neg = rng.choice(["", "NOT "])
        return (
            "SELECT o_orderkey, o_totalprice FROM orders "
            f"WHERE {_o_pred(rng)} AND o_custkey {neg}IN "
            f"(SELECT c_custkey FROM customer WHERE {_c_pred(rng)})"
        )
    if shape == 2:  # correlated scalar COUNT in the SELECT list
        return (
            "SELECT c_custkey, c_mktsegment, "
            "CAST((SELECT COUNT(*) FROM orders "
            f"WHERE o_custkey = c_custkey AND {_o_pred(rng)}) AS BIGINT)"
            " AS n_orders "
            f"FROM customer WHERE {_c_pred(rng)}"
        )
    # 2-step CTE chain: filter → aggregate → probe back
    return (
        f"WITH picked AS (SELECT * FROM orders WHERE {_o_pred(rng)}), "
        "per_cust AS (SELECT o_custkey, COUNT(*) AS n, "
        "MAX(o_orderkey) AS max_key FROM picked GROUP BY o_custkey) "
        "SELECT p.o_custkey, p.n, p.max_key FROM per_cust p "
        f"WHERE p.n >= {rng.randrange(1, 4)}"
    )


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_subquery_queries_match_duckdb(ctx):
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
