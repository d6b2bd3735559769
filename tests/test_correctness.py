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
