"""Grammar fuzz for the dialect rewriter (SURVEY §5 item 4 extended).

`test_property.py` fuzzes the *shared* SQL dialect (both engines run the
same text).  This file fuzzes the *translated* surface: queries written
in the reference's Postgres/DuckDB-flavored dialect
(iceberg-datafusion-arrow-flight/src/lib.rs:678 hands exactly these strings to
DataFusion's sqlparser) are run on Spark THROUGH ``rewrite_sql`` while
DuckDB executes the original, untranslated text as the oracle.  Any
divergence is a rewriter bug or a documented semantic gap — the grammar
below only generates shapes the rewriter claims to translate:

  ``::`` casts, SIMILAR TO, ``~``/``~*``/``!~``/``!~*`` regex operators,
  QUALIFY (top-level and nested), DISTINCT ON, GROUP BY ALL /
  ORDER BY ALL, and the function-alias renames (strpos, md5).

Deliberately NOT generated (documented divergences, see GAPS.md and
plans/dialect_queries.py): ``double::bigint`` (DuckDB rounds, DF40 and
Spark truncate), SUM(double) compared at full precision (summation-order
ULP drift), LIMIT without a total order.
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
SEED = 0xD1A1EC7  # fixed: every run fuzzes the same corpus


@pytest.fixture(scope="module")
def ctx(spark, sf_dir, duck):
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    register_dialect_functions(spark)
    return spark, duck


# --- grammar ----------------------------------------------------------------

_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]


def _pred(rng: random.Random) -> tuple[str, str]:
    """(source-dialect predicate, DuckDB-oracle predicate).

    The two differ only where DuckDB lacks the Postgres spelling the
    reference accepts (``~*``/``!~*``): the oracle then uses DuckDB's
    ``regexp_matches(..., 'i')`` equivalent.
    """
    kind = rng.randrange(6)
    if kind == 0:
        lo = rng.randrange(1, 1200)
        p = f"c_custkey BETWEEN {lo} AND {lo + rng.randrange(50, 400)}"
        return p, p
    if kind == 1:
        segs = rng.sample(_SEGMENTS, rng.randrange(1, 4))
        quoted = ", ".join(f"'{s}'" for s in segs)
        p = f"c_mktsegment IN ({quoted})"
        return p, p
    if kind == 2:
        # SIMILAR TO: SQL wildcards + alternation (rewritten to RLIKE).
        alt = "|".join(rng.sample(_SEGMENTS, 2))
        p = f"c_mktsegment SIMILAR TO '{alt}'"
        return p, p
    if kind == 3:
        # Postgres regex operators on the name's numeric suffix.  DuckDB's
        # ``~`` is regexp_full_match (whole string), NOT Postgres/DataFusion
        # partial match — the oracle must use regexp_matches.
        neg, duck_neg = rng.choice([("", ""), ("!", "NOT ")])
        d = rng.randrange(10)
        return (f"c_name {neg}~ '{d}$'",
                f"{duck_neg}regexp_matches(c_name, '{d}$')")
    if kind == 4:
        # case-insensitive regex match: Postgres-only spelling, DuckDB
        # oracle via regexp_matches with the 'i' flag
        d = rng.randrange(10)
        pat = f"customer#[0-9]*{d}"
        return (f"c_name ~* '{pat}'",
                f"regexp_matches(c_name, '{pat}', 'i')")
    # :: cast on an integer column (int casts agree across engines).
    # DuckDB's SIMILAR TO takes a REGEX (no SQL % wildcard), so the
    # oracle spells the standard pattern '%d' as the regex '.*d'.
    d = rng.randrange(10)
    return (f"c_custkey::varchar SIMILAR TO '%{d}'",
            f"c_custkey::varchar SIMILAR TO '.*{d}'")


def _where(rng: random.Random) -> tuple[str, str]:
    n = rng.randrange(1, 3)
    parts = [_pred(rng) for _ in range(n)]
    if n == 1:
        return parts[0]
    op = rng.choice(["AND", "OR"])
    return (f"({parts[0][0]}) {op} ({parts[1][0]})",
            f"({parts[0][1]}) {op} ({parts[1][1]})")


def _gen_query(rng: random.Random) -> tuple[str, str]:
    """(source-dialect query, DuckDB-oracle query)."""
    shape = rng.randrange(5)
    w_src, w_ora = _where(rng)
    if shape == 0:  # filter-project with casts + aliased functions
        body = (
            "SELECT c_custkey, c_custkey::varchar AS key_s, "
            "strpos(c_name, '9') AS pos9, upper(c_mktsegment) AS seg "
            "FROM customer WHERE {w}"
        )
    elif shape == 1:  # GROUP BY ALL + ORDER BY ALL aggregate
        body = (
            "SELECT c_mktsegment, c_nationkey::bigint AS nat, "
            "count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum "
            "FROM customer WHERE {w} "
            "GROUP BY ALL ORDER BY ALL"
        )
    elif shape == 2:  # QUALIFY over a ranked window
        k = rng.randrange(1, 5)
        body = (
            "SELECT c_mktsegment, c_custkey, "
            "row_number() OVER (PARTITION BY c_mktsegment "
            "ORDER BY c_acctbal DESC, c_custkey) AS rn "
            "FROM customer WHERE {w} QUALIFY rn <= " + str(k)
        )
    elif shape == 3:  # DISTINCT ON with a deterministic total order
        direction = rng.choice(["ASC", "DESC"])
        body = (
            "SELECT DISTINCT ON (c_mktsegment) c_mktsegment, c_custkey "
            "FROM customer WHERE {w} "
            f"ORDER BY c_mktsegment, c_acctbal {direction}, c_custkey"
        )
    else:  # QUALIFY inside a derived table (paren-recursing pass)
        k = rng.randrange(1, 4)
        body = (
            "SELECT t.c_mktsegment, count(*) AS n FROM ("
            "SELECT c_mktsegment, c_custkey, "
            "row_number() OVER (PARTITION BY c_mktsegment "
            "ORDER BY c_custkey) AS rn "
            "FROM customer WHERE {w} QUALIFY rn <= " + str(k) +
            ") t GROUP BY ALL"
        )
    return body.format(w=w_src), body.format(w=w_ora)


def _corpus() -> list[tuple[str, str]]:
    rng = random.Random(SEED)
    return [_gen_query(rng) for _ in range(N_EXAMPLES)]


# --- properties -------------------------------------------------------------


def test_fuzzed_dialect_queries_match_duckdb(ctx):
    """DuckDB(original text) == Spark(rewrite_sql(text)), order-insensitive."""
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
                f" first diff at {diff}"
            )
    assert not failures, "\n".join(failures)


def test_rewrite_is_idempotent_on_corpus():
    """Rewriting already-translated SQL must be a no-op: a double rewrite
    (e.g. the service layer and a caller both translating) cannot corrupt
    the query."""
    for sql, _oracle in _corpus():
        once = rewrite_sql(sql)
        assert rewrite_sql(once) == once, sql
