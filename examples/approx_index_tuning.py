#!/usr/bin/env python
"""Approximate-structure tuning walkthrough: the accuracy/work tables a
100 TB deployment sets its knobs by, over the embeddings/documents
fixtures.

Order of operations mirrors a real index rollout:

1. encoder health (norm diagnostics) — is cosine even trustworthy?
2. pairwise-cosine histogram — where does the corpus's mass sit?
3. compression audits — int8 scalar quantization error, JL 64->16
   projection distortion (what a cheaper index costs in fidelity).
4. index tuning tables — IVF recall vs nprobe, LSH recall vs table
   count (what each unit of extra work buys back).
5. dedup estimator calibration + threshold sensitivity (the same
   discipline for the MinHash side of the house).

Every one of these is a registry entry with a DuckDB oracle — the
numbers printed here are the hash-checked ones, not demonstrations.

Usage: python examples/approx_index_tuning.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY

STEPS = [
    ("1. encoder health", "sim_embedding_norm_diagnostics"),
    ("2. cosine-mass histogram", "sim_pairwise_distance_histogram"),
    ("3a. int8 SQ reconstruction error", "sim_scalar_quantization_error"),
    ("3b. JL 64->16 cosine distortion", "sim_random_projection_jl"),
    ("4a. IVF recall vs nprobe", "sim_ann_ivf_nprobe_profile"),
    ("4b. LSH recall vs table count", "sim_ann_lsh_tables_profile"),
    ("5a. MinHash estimator calibration",
     "dedup_minhash_estimator_calibration"),
    ("5b. dedup threshold sensitivity", "dedup_threshold_sensitivity"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="approx_index_tuning")
    for title, name in STEPS:
        print(f"\n=== {title} ({name}) ===")
        REGISTRY[name].build(spark, sf_dir).show(12, truncate=False)
    print("OK")


if __name__ == "__main__":
    main()
