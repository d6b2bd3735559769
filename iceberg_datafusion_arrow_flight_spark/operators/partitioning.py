"""Input fan-out guard for compute-heavy stages.

Parquet parallelism is bounded by row-group boundaries: a table written
as a handful of large row groups (or one small file) yields fewer scan
splits than the cluster has cores, and every codegen-heavy projection
downstream — MinHash signatures, n-gram explosion, embedding folds —
runs on those few cores while the rest idle.  At the 100 TB target this
never happens (file splits vastly outnumber executors, so the guard is
a no-op); it bites exactly on small/medium inputs where one dense file
strands the session.

:func:`fan_out` is the one-line fix: round-robin repartition *only when*
the current split count is below the session's default parallelism.  The
repartition shuffles the not-yet-expanded input rows (cheap — it runs
before any explode/signature blow-up), and costs nothing on inputs that
are already split.  Apply it at the top of operators whose plans shuffle
anyway; pure scan→project pipelines keep their exchange-free plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism iff it
    currently has fewer partitions; otherwise return it unchanged.

    Measured: sf0.1 ``documents`` is a single row group, so
    ``minhash_lsh_pairs`` ran its signature + verify stages on 1 of 32
    cores — 61.5 s; with the fan-out, 17.9 s, byte-identical output.
    """
    spark = df.sparkSession
    target = int(min_partitions or spark.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def checkpoint_partitioned(df: DataFrame, *keys: str) -> DataFrame:
    """Eager ``localCheckpoint`` that KEEPS a hash partitioning on
    ``keys`` visible to the planner.

    ``Dataset.localCheckpoint`` captures the materialized plan's output
    partitioning into the resulting ``LogicalRDD`` — but only when the
    plan is not wrapped in ``AdaptiveSparkPlanExec`` (AQE reports
    ``UnknownPartitioning``, so the capture degrades and every
    downstream join/agg on ``keys`` re-shuffles).  This helper disables
    AQE for just the checkpoint materialization and restores it, so a
    driver-loop operator can pay ONE up-front shuffle of its static
    table and run every iteration's ``groupBy(keys)`` (or co-located
    join) exchange-free — verified by plan inspection: the per-round
    ENSURE_REQUIREMENTS exchange disappears.

    The conf flip is session-wide for its (short) duration: a query
    planned concurrently in the same session would plan without AQE —
    a performance nuance, never a correctness one.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.repartition(*[df[k] for k in keys]).localCheckpoint(
            eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
