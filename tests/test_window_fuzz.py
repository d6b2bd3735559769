"""Grammar fuzz for the window-function family (SURVEY §2.5).

Windows are the §2 family with the most frame/peer-group corner cases
(ROWS vs RANGE, unbounded vs offset frames, ranking vs value functions),
so beyond the per-operator registry oracles this fuzz sweeps randomized
frame combinations.  Both engines execute the IDENTICAL text (shared
dialect — no rewrite involved), so any divergence is an engine-semantics
bug in how a plan was expressed.

Determinism rules baked into the grammar:
- ORDER BY always ends in the unique ``o_orderkey``, so ranking and
  value functions (row_number, lag, nth_value) are well-defined.
- Aggregates stay integer-valued (SUM/MIN/MAX/COUNT over o_orderkey /
  o_custkey) — no float summation-order drift inside frames.
- RANGE frames order by a single integer key, the only form both
  engines accept with value offsets.
"""

from __future__ import annotations

import random

import pytest

from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _normalize

N_EXAMPLES = 50
SEED = 0x57A6E5


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark, duck


def _frame(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        return ""  # default frame
    if kind == 1:
        return "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    if kind == 2:
        lo = rng.randrange(1, 6)
        hi = rng.randrange(0, 4)
        return f"ROWS BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
    if kind == 3:
        return "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    lo = rng.randrange(1, 2000)
    return f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW"


def _window_fn(rng: random.Random, over: str, framed_over: str) -> str:
    kind = rng.randrange(8)
    if kind == 0:
        return f"row_number() OVER ({over})"
    if kind == 1:
        return f"rank() OVER ({over})"
    if kind == 2:
        return f"dense_rank() OVER ({over})"
    if kind == 3:
        off = rng.randrange(1, 4)
        return f"lag(o_orderkey, {off}, -1) OVER ({over})"
    if kind == 4:
        off = rng.randrange(1, 4)
        return f"lead(o_custkey, {off}) OVER ({over})"
    if kind == 5:
        agg = rng.choice(["sum", "min", "max", "count"])
        return f"{agg}(o_custkey) OVER ({framed_over})"
    if kind == 6:
        return f"first_value(o_orderkey) OVER ({framed_over})"
    return f"last_value(o_orderkey) OVER ({framed_over})"


def _gen_query(rng: random.Random) -> str:
    part = rng.choice(["", "PARTITION BY o_orderstatus",
                       "PARTITION BY o_orderpriority",
                       "PARTITION BY o_orderstatus, o_orderpriority"])
    # RANGE frames need a lone integer sort key; everything else gets a
    # unique total order ending in o_orderkey.
    frame = _frame(rng)
    if frame.startswith("RANGE"):
        order = "ORDER BY o_orderkey"
    else:
        order = rng.choice(["ORDER BY o_orderkey",
                            "ORDER BY o_custkey, o_orderkey",
                            "ORDER BY o_totalprice, o_orderkey"])
    over = f"{part} {order}".strip()
    framed_over = f"{over} {frame}".strip()
    fns = [
        f"{_window_fn(rng, over, framed_over)} AS w{i}"
        for i in range(rng.randrange(1, 4))
    ]
    lo = rng.randrange(1, 4000)
    return (
        "SELECT o_orderkey, " + ", ".join(fns) +
        f" FROM orders WHERE o_orderkey BETWEEN {lo} AND {lo + 4000}"
    )


def _corpus() -> list[str]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


def test_fuzzed_window_queries_match_duckdb(ctx):
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
