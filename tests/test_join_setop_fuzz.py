"""Grammar fuzz for joins and set operations (SURVEY §2.3 / §2.7).

Randomized inner/left/right/full equi-joins between orders and customer
(with per-side filters, so outer null-padding paths are exercised),
EXISTS/NOT EXISTS semi/anti forms, and UNION/INTERSECT/EXCEPT [ALL]
between two filtered projections.  Both engines run the IDENTICAL text
(shared dialect); results compared as order-insensitive multisets.

Semi/anti joins are spelled EXISTS/NOT EXISTS because Spark requires
``LEFT SEMI JOIN`` while DuckDB spells it ``SEMI JOIN`` — the subquery
form is the portable spelling and plans to the same SemiJoin physical
operator on both engines.
"""

from __future__ import annotations

import random

import pytest

from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _normalize

N_EXAMPLES = 40
SEED = 0x301250


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark, duck


_STATUSES = ["O", "F", "P"]
_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]


def _o_pred(rng: random.Random) -> str:
    if rng.randrange(2):
        lo = rng.randrange(1, 5000)
        return f"o_orderkey BETWEEN {lo} AND {lo + rng.randrange(500, 3000)}"
    return f"o_orderstatus = '{rng.choice(_STATUSES)}'"


def _c_pred(rng: random.Random) -> str:
    if rng.randrange(2):
        lo = rng.randrange(1, 1000)
        return f"c_custkey BETWEEN {lo} AND {lo + rng.randrange(100, 500)}"
    return f"c_mktsegment = '{rng.choice(_SEGMENTS)}'"


def _gen_query(rng: random.Random) -> str:
    shape = rng.randrange(4)
    if shape == 0:  # outer-join family with per-side filters
        jt = rng.choice(["INNER", "LEFT", "RIGHT", "FULL"])
        return (
            "SELECT o.o_orderkey, o.o_orderstatus, c.c_custkey, c.c_mktsegment "
            f"FROM (SELECT * FROM orders WHERE {_o_pred(rng)}) o "
            f"{jt} JOIN (SELECT * FROM customer WHERE {_c_pred(rng)}) c "
            "ON o.o_custkey = c.c_custkey"
        )
    if shape == 1:  # EXISTS / NOT EXISTS (semi / anti)
        neg = rng.choice(["", "NOT "])
        return (
            "SELECT c_custkey, c_mktsegment FROM customer "
            f"WHERE {_c_pred(rng)} AND {neg}EXISTS ("
            "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            f"AND {_o_pred(rng)})"
        )
    if shape == 2:  # set operations over two filtered projections
        op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
                         "EXCEPT", "EXCEPT ALL"])
        return (
            f"SELECT o_custkey, o_orderstatus FROM orders WHERE {_o_pred(rng)} "
            f"{op} "
            f"SELECT o_custkey, o_orderstatus FROM orders WHERE {_o_pred(rng)}"
        )
    # join + aggregate (shuffle-then-agg path)
    jt = rng.choice(["INNER", "LEFT"])
    return (
        "SELECT c.c_mktsegment, count(*) AS n, "
        "CAST(sum(o.o_orderkey) AS BIGINT) AS key_sum "
        f"FROM (SELECT * FROM customer WHERE {_c_pred(rng)}) c "
        f"{jt} JOIN (SELECT * FROM orders WHERE {_o_pred(rng)}) o "
        "ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    )


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_join_setop_queries_match_duckdb(ctx):
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
                f" oracle rows={len(o_norm)} first diff at {diff}"
            )
    assert not failures, "\n".join(failures)
