#!/usr/bin/env python
"""One-off baseline measurement for heavy operators outside the bench
headline set, plus cardinality-pinned re-measurement of watch items.

VERDICT r3 asks #4/#5: every expensive family gets a recorded
min-of-2-cold baseline + output cardinality BEFORE the driver ever
samples it, and the two noise-flagged dedup benches are tracked with
their cardinality pinned.  Results go into PERFORMANCE.md.

Usage: python scripts/bench_extra.py [name ...]   (default: the r4 list)
Bench solo — never with another Spark JVM active (see verify skill).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY

R4_LIST = [
    # never-benched heavies (ask #4)
    "graph_personalized_pagerank",
    "dedup_cross_corpus",
    "pipeline_split_leakage",
    "events_rollup_incremental_refresh",
    "sim_ann_lsh_topk",
    # watch items with cardinality pinned (ask #5)
    "dedup_substring_overlap",
    "dedup_minhash_lsh",
    # new this round
    "sim_ann_recall_report",
    "service_flight_roundtrip",
    # late-r4: the LSH and PQ recall witnesses completing the ANN triple
    "sim_ann_lsh_recall_report",
    "sim_ann_pq_recall_report",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or R4_LIST
    spark = get_spark(app_name="bench_extra")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run_cold(name: str) -> tuple[float, int]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        tbl = REGISTRY[name].build(spark, sf_dir).toArrow()
        return round(time.perf_counter() - t0, 4), tbl.num_rows

    out = {}
    for name in names:
        (t1, n1), (t2, n2) = run_cold(name), run_cold(name)
        best = min(t1, t2)
        if max(t1, t2) > 1.5 * best:
            t3, _ = run_cold(name)
            best = min(best, t3)
        assert n1 == n2, f"{name}: nondeterministic cardinality {n1} vs {n2}"
        out[name] = {"sec": best, "rows": n1}
        print(f"{name}: {best}s rows={n1}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
