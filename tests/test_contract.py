"""Driver-contract tests for ``__spark_entry__``.

The external driver (see SURVEY §5) calls exactly three functions; these
tests pin their shapes so a refactor of the plan registry can't silently
break the harness.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()  # stable, non-empty schema


def test_queries_cover_registry():
    qs = entrymod.queries()
    assert set(qs) == set(REGISTRY)
    assert len(qs) >= 90


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # Only genuinely non-SQL-expressible ops may omit an oracle.
    missing = set(qs) - set(oracles)
    assert all(REGISTRY[n].oracle is None for n in missing)


def test_queries_return_dataframes(spark, sf_dir):
    qs = entrymod.queries()
    df = qs["tpch_q6_forecast_revenue"](spark, sf_dir)
    assert hasattr(df, "schema")


def test_oracles_are_strings():
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
