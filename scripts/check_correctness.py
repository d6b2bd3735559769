#!/usr/bin/env python
"""Run the local DuckDB-oracle gate over all registered plans.

Usage: python scripts/check_correctness.py [sf_dir] [name-substring ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY
from iceberg_datafusion_arrow_flight_spark.testing import run_all


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    pats = [a for a in args if not a.startswith("/")]
    names = [n for n in REGISTRY
             if not pats or any(p in n for p in pats)]
    spark = get_spark()
    t0 = time.time()
    results = run_all(spark, sf_dir, names)
    n_fail = 0
    for r in results:
        status = "PASS" if r.ok else "FAIL"
        extra = f" ({r.detail})" if r.detail else ""
        print(f"{status} {r.name} rows={r.spark_rows}{extra}")
        n_fail += (not r.ok)
    print(f"\n{len(results) - n_fail}/{len(results)} pass in {time.time()-t0:.1f}s at {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
