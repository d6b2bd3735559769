"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``iceberg_datafusion_arrow_flight_spark.plans``
— a registry with one entry per implemented operator from SURVEY.md §2;
this module just adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY

# Python workers (mapInPandas / applyInPandas entries) must run an
# interpreter with numpy/pandas; if the driver's environment leaves
# PYSPARK_PYTHON unset, Spark falls back to a bare `python3` from PATH
# which may lack them.  This import runs before the driver builds its
# SparkSession, so the setdefault takes effect for its workers too.
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

_FLAGSHIP = "tpch_q5_local_supplier_volume"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return REGISTRY[_FLAGSHIP].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    def _wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return spec.build(spark, sf_dir)
        run.__doc__ = spec.doc
        return run
    return {name: _wrap(spec) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators → driver records rows-only check)."""
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
