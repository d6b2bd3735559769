#!/usr/bin/env python
"""Iceberg table lifecycle walkthrough — the reference's identity
(catalog-managed tables, atomic snapshot commits: lib.rs:94-103,
sql/main.rs:73) run end-to-end on this engine.

    python examples/iceberg_lifecycle.py

CREATE → INSERT (snapshot) → INSERT (snapshot) → time travel →
schema evolution → compaction, against a SQLite catalog in the Iceberg
JDBC-catalog layout.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.sources.iceberg_lite import (
    SqliteCatalog)


def main():
    spark = get_spark(master="local[4]")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    root = tempfile.mkdtemp(prefix="iceberg_demo_")
    cat = SqliteCatalog(os.path.join(root, "catalog.db"),
                        warehouse=os.path.join(root, "warehouse"))
    print(f"catalog: {cat.db_path}")

    t = cat.create_table("sales", "orders", orders)
    s1 = t.append(orders.where("o_orderkey % 2 = 0"))
    s2 = t.append(orders.where("o_orderkey % 2 = 1"))
    snaps = [(s["snapshot-id"], s["summary"]["operation"])
             for s in t.snapshots()]
    print(f"snapshots: {snaps}")
    print(f"current rows: {t.read(spark).count()}")
    print(f"time travel to {s1}: {t.read(spark, snapshot_id=s1).count()} rows")

    t.add_column("channel", "string")
    t.append(orders.limit(3).withColumn("channel", F.lit("web")))
    print("after evolution:",
          t.read(spark).groupBy("channel").count().collect())

    files_before = len(t.plan_files())
    t.compact(spark, target_files=1)
    print(f"compaction: {files_before} files -> {len(t.plan_files())}; "
          f"snapshot {s2} still readable: "
          f"{t.read(spark, snapshot_id=s2).count()} rows")

    pruned = t.plan_files(prune=("o_orderkey", 0, 100))
    print(f"stats pruning for o_orderkey<=100: {len(pruned)} of "
          f"{len(t.plan_files())} files planned")
    spark.stop()


if __name__ == "__main__":
    main()
