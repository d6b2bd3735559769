#!/usr/bin/env python
"""Row-level DML + partitioning + CDC ingest walkthrough.

    python examples/iceberg_dml_cdc.py

Builds a day-partitioned table, runs copy-on-write MERGE and DELETE
(only touched files rewrite; manifest stats + partition values prune),
clusters it with a sorted compaction, then drives a CDC change stream
through `stream_upsert_to_iceberg` (one MERGE snapshot per micro-batch)
and time-travels back through the whole history.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.sources.iceberg_lite import (
    SqliteCatalog)
from iceberg_datafusion_arrow_flight_spark.streaming.jobs import (
    stream_cdc_apply, stream_upsert_to_iceberg)


def main():
    spark = get_spark(master="local[4]")
    root = tempfile.mkdtemp(prefix="iceberg_dml_demo_")
    cat = SqliteCatalog(os.path.join(root, "catalog.db"),
                        warehouse=os.path.join(root, "warehouse"))

    df = (spark.range(0, 1000).withColumnRenamed("id", "k")
          .withColumn("day", F.date_add(F.lit("2024-01-01"),
                                        (F.col("k") % 3).cast("int")))
          .withColumn("v", F.col("k") * 10))
    t = cat.create_table("demo", "kv", df, partition_by=["day"])
    t.append(df)
    print(f"created day-partitioned table: {len(t.plan_files())} files, "
          f"{t.read(spark).count()} rows")
    one_day = t.plan_files(partition_filter={"day": "2024-01-01"})
    print(f"partition pruning: day=2024-01-01 plans {len(one_day)} files")

    pre_merge = t.current_snapshot_id()
    src = spark.createDataFrame(
        [(5, "2024-01-03", -5), (2000, "2024-01-09", 1)],
        "k long, day string, v long").withColumn(
        "day", F.to_date("day"))
    stats = t.merge_upsert(spark, src, ["k"])
    print(f"MERGE: rewrote {stats['rewritten_files']} files, carried "
          f"{stats['kept_files']} untouched; rows now "
          f"{t.read(spark).count()}")

    stats = t.delete_where(spark, F.col("k").between(100, 199))
    print(f"DELETE k in [100,199]: rewrote {stats['rewritten_files']} "
          f"files; rows now {t.read(spark).count()}")

    t.compact(spark, target_files=4, sort_by=["k"])
    pruned = t.plan_files(prune=("k", 0, 99))
    print(f"sorted compaction: selective read of k<=99 now plans "
          f"{len(pruned)}/{len(t.plan_files())} files")

    # CDC: two change files -> two micro-batches -> two MERGE snapshots
    src_dir = os.path.join(root, "cdc")
    for batch in ([(7, "2024-01-02", 777, 1)],
                  [(8, "2024-01-02", 888, 1), (3000, "2024-01-05", 1, 1)]):
        (spark.createDataFrame(batch, "k long, day string, v long, seq long")
         .withColumn("day", F.to_date("day"))
         .coalesce(1).write.mode("append").parquet(src_dir))
    stream = (spark.readStream
              .schema("k long, day date, v long, seq long")
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    q = stream_upsert_to_iceberg(stream, t, ["k"], "seq",
                                 ckpt_dir=os.path.join(root, "ckpt"))
    q.awaitTermination(120)
    print(f"CDC ingest: {t.read(spark).count()} rows after 2 upsert "
          f"batches; snapshots so far: {len(t.snapshots())}")

    # merge-on-read delete: tombstone positions, zero file rewrites
    n_files = len(t.plan_files())
    stats = t.delete_where_mor(spark, F.col("v") % 7 == 0)
    print(f"MOR DELETE: {stats['deleted_rows']} rows tombstoned in "
          f"{stats['delete_files']} position files; data files still "
          f"{len(t.plan_files())}/{n_files}; rows now "
          f"{t.read(spark).count()}")

    # CDC with tombstones: upsert + delete markers in one change batch
    cdc2 = os.path.join(root, "cdc2")
    (spark.createDataFrame(
        [(8, "2024-01-02", 999, 2, "upsert"),
         (3000, None, None, 3, "delete")],
        "k long, day string, v long, seq long, op string")
     .withColumn("day", F.to_date("day"))
     .coalesce(1).write.parquet(cdc2))
    stream = (spark.readStream
              .schema("k long, day date, v long, seq long, op string")
              .parquet(cdc2))
    q = stream_cdc_apply(stream, t, ["k"], "seq", "op",
                         ckpt_dir=os.path.join(root, "ckpt2"))
    q.awaitTermination(120)
    print(f"CDC apply with tombstones: k=3000 deleted, k=8 updated; "
          f"rows now {t.read(spark).count()}")

    t.compact(spark, target_files=4)
    md = t._load_metadata()[1]
    cur = [s for s in md["snapshots"]
           if s["snapshot-id"] == md["current-snapshot-id"]][0]
    print(f"compaction folded tombstones: delete files now "
          f"{len(cur['delete-files'])}")

    # write-audit-publish: stage on a branch, audit, fast-forward main
    n_main = t.read(spark).count()
    t.append_to_branch(spark.createDataFrame(
        [(9000, "2024-01-04", 1)], "k long, day string, v long")
        .withColumn("day", F.to_date("day")), "audit")
    staged = t.read(spark, snapshot_id=t.resolve_ref("audit")).count()
    print(f"WAP: staged branch has {staged} rows; main still "
          f"{t.read(spark).count()} (== {n_main})")
    t.publish_branch("audit")
    print(f"WAP publish fast-forwarded main to {t.read(spark).count()}")

    old = t.read(spark, snapshot_id=pre_merge).count()
    print(f"time travel to pre-MERGE snapshot: {old} rows (unchanged)")
    spark.stop()


if __name__ == "__main__":
    main()
