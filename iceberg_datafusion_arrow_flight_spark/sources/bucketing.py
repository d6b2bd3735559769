"""Bucketed (co-located) tables: the zero-shuffle join pattern.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides
by the key.  Writing both tables bucketed (and sorted) on that key makes
the join a per-bucket merge with NO exchange on either side — the Spark
analogue of the reference stack's Iceberg storage-partitioned joins
(iceberg-rust hidden partitioning, SURVEY §4.2; on an Iceberg cluster
use `bucket(n, col)` partition transforms + storage-partitioned join —
same effect, this module is the warehouse-table form the dev container
can execute and test).

tests/test_plan_shape.py pins the property: bucketed⋈bucketed plans
contain zero ``Exchange`` operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   buckets: int = 8) -> None:
    """Persist ``df`` as a bucketed+sorted warehouse table on ``key``.

    Bucket count is a layout contract: both sides of a co-located join
    must use the SAME count.  Pick it once per key domain, sized so a
    bucket of the biggest table fits an executor core's working set."""
    (df.write.mode("overwrite")
       .bucketBy(buckets, key)
       .sortBy(key)
       .format("parquet")
       .saveAsTable(table_name))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — planner elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
