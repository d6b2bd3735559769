#!/usr/bin/env python
"""Timed harness for the streaming surface (VERDICT r6 ask #7).

The 6 streaming jobs are invariant-tested but none had a timed seed, so
a streaming regression was invisible.  This harness drives the heaviest
job — LSH near-dup dedup AT INGEST (streaming/jobs.py:
stream_dedup_ingest) — over the documents table at $SPARK_GRAFT_SF_DIR
split into a PINNED number of micro-batches, and prints ONE JSON line:

  {"job": "stream_dedup_ingest", "batches": N, "sec": S,
   "batches_per_sec": B, "docs_in": D, "kept": K, ...}

``kept`` is the pinned output cardinality (deterministic: minhash seeds
and the drop rule are fixed), so drift-vs-noise adjudication works the
same way as for the batch bench.  Run SOLO, like bench.py — results are
seeded in PERFORMANCE.md.

Usage: python scripts/bench_streaming.py [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.sources.registry import load_table
from iceberg_datafusion_arrow_flight_spark.streaming.jobs import (
    stream_dedup_ingest)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    load_start = os.getloadavg()
    spark = get_spark(app_name="bench_streaming")
    spark.range(1000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="bench_streaming_")
    src = os.path.join(work, "src")
    state = os.path.join(work, "state")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        docs_in = docs.count()
        # one parquet file per micro-batch — maxFilesPerTrigger=1 makes
        # the batch count exactly n_batches.  Batch ASSIGNMENT must be
        # deterministic or `kept` drifts run-to-run (round-robin
        # repartition() assigns rows to batches nondeterministically and
        # the cross-batch drop rule depends on batch composition —
        # measured: kept 2620 vs 2629 on identical input).  Sequential
        # per-slice writes also give strictly increasing file mtimes, so
        # the file source processes slices in a fixed order.
        for i in range(n_batches):
            (docs.where(F.col("doc_id") % n_batches == i).coalesce(1)
             .write.mode("append").parquet(src))
            time.sleep(1.1)  # distinct whole-second mtimes for ordering
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        t0 = time.perf_counter()
        q = stream_dedup_ingest(stream, state)
        q.awaitTermination()
        sec = round(time.perf_counter() - t0, 4)
        kept = spark.read.parquet(os.path.join(state, "kept")).count()
        print(json.dumps({
            "job": "stream_dedup_ingest",
            "batches": n_batches,
            "sec": sec,
            "batches_per_sec": round(n_batches / sec, 4),
            "docs_in": docs_in,
            "kept": kept,
            "sf_dir": sf_dir,
            "load_avg_start": [round(x, 2) for x in load_start],
            "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
