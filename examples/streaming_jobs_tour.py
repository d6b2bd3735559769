#!/usr/bin/env python
"""Tour of the streaming surface: four of the eight driver-oracled jobs
run end-to-end on a small fixture, each checked against its batch twin.

    python examples/streaming_jobs_tour.py

Every job follows the same recipe the registry entries use: write a
deterministic micro-batched fixture, stream it with availableNow (one
file per trigger), drain, then compare the job's final state to a
one-shot batch recompute — the batch-equivalence invariant that makes
streaming results checkable at all.
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.streaming.jobs import (
    merged_countmin, stream_countmin_partials, stream_dedup_ingest,
    stream_reservoir_sample, user_running_totals_stateful)
from iceberg_datafusion_arrow_flight_spark.operators.countmin import (
    countmin_sketch)


def _drain(query, timeout: int = 300) -> None:
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()
        raise TimeoutError("streaming query did not drain in time")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="streaming_tour",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="stream_tour_")
    try:
        # 1. Mergeable max-hash reservoir: stream == batch top-k-by-hash.
        src = os.path.join(work, "ev")
        events.repartition(4).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        state = os.path.join(work, "reservoir")
        _drain(stream_reservoir_sample(stream, "event_id", state, k=50))
        streamed = {r.id for r in spark.read.parquet(
            os.path.join(state, "reservoir")).collect()}
        batch = {r.id for r in (
            events.select(F.col("event_id").cast("bigint").alias("id"),
                          F.md5(F.concat(F.lit("reservoir-v1"),
                                         F.col("event_id").cast("string")))
                          .alias("priority"))
            .distinct().orderBy("priority", "id").limit(50).collect())}
        assert streamed == batch
        print(f"reservoir:     streamed sample == batch top-50-by-hash "
              f"({len(streamed)} ids)")

        # 2. Count-min partials: per-batch sketches fold to the batch sketch.
        toks = docs.select(F.explode(F.split("text", r"\s+")).alias("v"))
        tsrc = os.path.join(work, "tok")
        toks.repartition(4).write.mode("overwrite").parquet(tsrc)
        tstream = (spark.readStream.schema(toks.schema)
                   .option("maxFilesPerTrigger", 1).parquet(tsrc))
        out = os.path.join(work, "cm")
        _drain(stream_countmin_partials(tstream, "v", out))
        folded = {(r.d, r.bucket): r.c
                  for r in merged_countmin(spark, out).collect()}
        exact = {(r.d, r.bucket): r.c
                 for r in countmin_sketch(toks, "v").collect()}
        assert folded == exact
        print(f"count-min:     {len(folded)} folded cells == batch "
              f"sketch, bit-for-bit")

        # 3. Dedup at ingest: kept set is pair-free at Jaccard >= 0.9.
        # Batches pinned by doc_id residue + mtime (like the registry
        # entry) so the kept set is deterministic run to run.
        dsrc = os.path.join(work, "docs")
        os.makedirs(dsrc)
        for b in range(4):
            before = set(os.listdir(dsrc))
            (docs.where(F.col("doc_id") % 4 == b).coalesce(1)
             .write.mode("append").parquet(dsrc))
            for fn in set(os.listdir(dsrc)) - before:
                if fn.endswith(".parquet"):
                    os.utime(os.path.join(dsrc, fn),
                             (1_700_000_000 + b, 1_700_000_000 + b))
        dstream = (spark.readStream.schema(docs.schema)
                   .option("maxFilesPerTrigger", 1).parquet(dsrc))
        dstate = os.path.join(work, "dedup")
        _drain(stream_dedup_ingest(dstream, dstate))
        kept = spark.read.parquet(os.path.join(dstate, "kept"))
        print(f"ingest dedup:  kept {kept.count()} of {docs.count()} docs "
              f"(LSH index probed per batch, work ∝ batch)")

        # 4. Stateful running totals (centi-folded => order-immune).
        ev2 = events.select("event_id", "ts", "user_id",
                            F.floor(F.col("value") * 100 + 0.5)
                             .cast("double").alias("value"))
        s2 = os.path.join(work, "ev2")
        ev2.repartition(3).write.mode("overwrite").parquet(s2)
        st2 = (spark.readStream.schema(ev2.schema)
               .option("maxFilesPerTrigger", 1).parquet(s2)
               .withColumn("ts", F.col("ts").cast("timestamp")))
        q = (user_running_totals_stateful(st2)
             .writeStream.format("memory").queryName("tour_totals")
             .outputMode("update").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(work, "ck"))
             .start())
        _drain(q)
        got = {r.user_id: (r.n_events, int(r.total_value)) for r in
               spark.table("tour_totals")
               .groupBy("user_id")
               .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
               .select("user_id", "m.n_events", "m.total_value").collect()}
        want = {r.user_id: (r.n, int(r.s)) for r in
                ev2.groupBy("user_id")
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .collect()}
        assert got == want
        print(f"stateful:      {len(got)} users' running totals == batch "
              f"aggregate exactly")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
