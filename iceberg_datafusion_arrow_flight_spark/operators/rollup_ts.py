"""Hypertable-style continuous aggregates: hierarchical time-bucket
rollups where each coarser level aggregates the NEXT FINER level, not
the raw stream.

The TimescaleDB/Druid pattern re-expressed on Spark: at 100 TB the raw
events are touched ONCE (finest bucket); every coarser granularity is a
re-aggregation of the already-tiny finer aggregate — minutes → hours is
a 60× smaller input than raw, hours → days 24× smaller again.  All
chosen aggregates must be combinable (sum/count/min/max; avg = sum÷count
at read time).

Correctness identity pinned by the oracle query (plans/events.py):
rolling up the finer level must equal aggregating raw data directly at
the coarse granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_aggregate(df: DataFrame, ts_col: str, granularity: str,
                     keys: list[str] | None = None) -> DataFrame:
    """Finest rollup level, from raw rows: (bucket, keys) →
    (n, sum_value, min_value, max_value)."""
    keys = keys or []
    return (df.groupBy(F.window(ts_col, granularity).alias("w"), *keys)
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"))
            .select(F.col("w.start").alias("bucket"), *keys,
                    "n", "sum_value", "min_value", "max_value"))


def rollup_level(finer: DataFrame, granularity: str,
                 keys: list[str] | None = None) -> DataFrame:
    """Coarser level FROM a finer level: combinable re-aggregation
    (count→sum, sum→sum, min→min, max→max).  Input is the finer
    aggregate, never the raw stream."""
    keys = keys or []
    return (finer.groupBy(F.window("bucket", granularity).alias("w"), *keys)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value"))
            .select(F.col("w.start").alias("bucket"), *keys,
                    "n", "sum_value", "min_value", "max_value"))


def rollup_hierarchy(df: DataFrame, ts_col: str,
                     granularities: list[str],
                     keys: list[str] | None = None) -> dict[str, DataFrame]:
    """Build the whole hierarchy finest→coarsest; returns one DataFrame
    per granularity.  ``granularities`` ordered fine → coarse and each
    coarser interval must be a multiple of the previous (bucket
    alignment — same rule hypertables impose)."""
    levels: dict[str, DataFrame] = {}
    current = bucket_aggregate(df, ts_col, granularities[0], keys)
    levels[granularities[0]] = current
    for g in granularities[1:]:
        current = rollup_level(current, g, keys)
        levels[g] = current
    return levels


def refresh_rollup_incremental(spark, events_table, rollup_table,
                               since_snapshot: int | None,
                               ts_col: str = "ts",
                               granularity: str = "1 hour",
                               keys: list[str] | None = None,
                               summary_extra: dict | None = None) -> dict:
    """Continuous-aggregate maintenance (the TimescaleDB refresh /
    incremental-materialized-view pattern) on catalog tables: read ONLY
    the events appended since ``since_snapshot`` (incremental scan),
    aggregate the delta, combine it with the existing rollup rows for
    the touched (bucket, keys) — count/sum add, min/max fold — and
    MERGE the combined rows back copy-on-write.

    Refresh work scales with the DELTA and the touched buckets, never
    with table history: the delta read plans only the new files, the
    old-rollup side is a semi-join on the touched keys, and the merge
    rewrites only the rollup files holding those buckets.

    Contracts: the events head is captured FIRST and the delta pinned
    to it (a concurrent append can never be checkpointed past unseen);
    the covered head is recorded in the merge snapshot's summary
    (``events-snapshot``) so the checkpoint is recoverable from table
    metadata alone; grouping keys are NOT NULL — NULL bucket/key delta
    rows are dropped (they cannot fold incrementally: NULL never equals
    NULL in the semi-join or the merge keys).  Returns the events
    snapshot to checkpoint for the next refresh.
    """
    keys = keys or []
    join_keys = ["bucket", *keys]
    # Capture the head FIRST and pin the delta to it: reading the delta
    # and then asking for "current" separately would let a concurrent
    # append land between the two and be checkpointed past unseen.
    head_snapshot = events_table.current_snapshot_id()
    delta = events_table.read_incremental(spark, since_snapshot,
                                          to_snapshot=head_snapshot)
    # NULL bucket/key rows cannot be folded incrementally (NULL never
    # equals NULL in the semi-join or the MERGE keys) — the rollup's
    # contract is NOT NULL grouping keys, enforced here on the delta.
    delta_agg = (bucket_aggregate(delta, ts_col, granularity, keys)
                 .na.drop(subset=join_keys).cache())
    try:
        if not delta_agg.take(1):
            return {"refreshed": False, "events_snapshot": head_snapshot}
        touched_old = rollup_table.read(spark).join(
            delta_agg.select(*join_keys), join_keys, "left_semi")
        combined = (touched_old.unionByName(delta_agg)
                    .groupBy(*join_keys)
                    .agg(F.sum("n").alias("n"),
                         F.sum("sum_value").alias("sum_value"),
                         F.min("min_value").alias("min_value"),
                         F.max("max_value").alias("max_value")))
        stats = rollup_table.merge_upsert(
            spark, combined, join_keys,
            summary_extra={"events-snapshot": str(head_snapshot),
                           **(summary_extra or {})})
        return {"refreshed": True, "events_snapshot": head_snapshot,
                **stats}
    finally:
        delta_agg.unpersist()
