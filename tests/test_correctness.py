"""DuckDB-oracle correctness gate over the whole plan registry (SURVEY §5 t2).

One parametrized test per registered query at sf0.001; the identical
comparison the driver applies at sf0.01 (row count + schema + order-
insensitive canonicalized value equality).
"""

from __future__ import annotations

import pytest

from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY
from iceberg_datafusion_arrow_flight_spark.testing.oracle import check_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    res = check_query(spark, name, sf_dir, duck)
    assert res.ok, f"{name}: {res.detail}"

def test_gate_rejects_bare_decimal_result_columns(spark, duck):
    """The local gate must be hostile to raw DECIMAL result columns.

    CORRECTNESS_r05's only red row (dialect_arrow_cast) was a DECIMAL(12,2)
    result column: equal values on both sides, but the driver's
    pandas-based hash widens DuckDB DECIMAL to float64 while Spark
    collects decimal.Decimal.  The local fetchall() path was blind to it.
    Both engines' decimal classes now map to side-tagged names that never
    match, exactly like HUGEINT — the cure is casting to DOUBLE/VARCHAR on
    both sides.
    """
    from iceberg_datafusion_arrow_flight_spark.testing.oracle import (
        _type_class_mismatches)
    df = spark.sql("SELECT CAST(1.25 AS DECIMAL(12,2)) AS price_dec")
    rel = duck.sql("SELECT CAST(1.25 AS DECIMAL(12,2)) AS price_dec")
    mismatches = _type_class_mismatches(df, rel)
    assert mismatches and "price_dec" in mismatches[0], mismatches
