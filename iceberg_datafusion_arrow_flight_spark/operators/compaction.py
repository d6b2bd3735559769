"""Small-file compaction — table maintenance for file-backed datasets.

Streaming ingestion and fine-grained partitioning leave lakehouse tables
as thousands of KB-sized files; every downstream scan then pays
per-file open/footer costs and the scheduler pays per-split overhead.
Compaction rewrites a dataset into ~``target_file_bytes`` files.

On an Iceberg deployment this is ``rewrite_data_files`` (snapshot-safe,
done by the table service); this operator is the plain-Parquet form for
the dev container and non-Iceberg paths.  Sizing comes from the actual
input bytes on disk (not row counts), so compression ratio carries over
to the output estimate.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (local FS walk; on a
    cluster swap for the Hadoop FileSystem listing — same contract)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if not f.startswith(("_", ".")))
    return total


def compact_parquet(spark: SparkSession, in_path: str, out_path: str,
                    target_file_bytes: int = 128 * 1024 * 1024,
                    sort_by: list[str] | None = None) -> int:
    """Rewrite ``in_path`` into ≈target-sized files at ``out_path``;
    returns the output file count.

    ``sort_by`` additionally sorts within output files — clustering for
    min/max row-group pruning on those columns (cheap Z-order stand-in
    for a single key)."""
    n_files = max(1, math.ceil(dataset_bytes(in_path) / target_file_bytes))
    df = spark.read.parquet(in_path)
    out: DataFrame = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").parquet(out_path)
    return sum(1 for f in os.listdir(out_path)
               if f.endswith(".parquet"))
