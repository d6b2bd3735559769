"""Streaming jobs over ``events``: watermarks, event-time windows,
in-stream dedup, custom state.

Design notes (100 TB posture):

- The file source here stands in for Kafka/Kinesis; every transformation
  below is source-agnostic (swap ``readStream.format``).
- Watermarks bound state: every stateful operator (windowed agg, dedup,
  custom state) declares how late data may arrive, so state is evicted
  continuously instead of accumulating unboundedly.
- ``availableNow`` trigger = incremental batch over the backlog with
  streaming semantics — the idiom for backfill jobs sharing code with
  the live pipeline.
- The custom stateful operator uses ``applyInPandasWithState`` (Arrow
  batches per key group, timeout-driven eviction) — the Spark-native
  shape for operators the built-ins can't express.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

# events fixture schema (FIXTURES.md).  The ts physical type depends on
# the fixture generation: TIMESTAMP(NANOS) arrives as int64 nanos under
# spark.sql.legacy.parquet.nanosAsLong, TIMESTAMP(MICROS) as a native
# timestamp.  The stream source mirrors sources.registry.load_table:
# probe the footer with a batch read, then declare the matching stream
# schema (streaming sources require an explicit schema).
def _events_schema(ts_is_long: bool) -> StructType:
    from pyspark.sql.types import TimestampType
    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", LongType() if ts_is_long else TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded DataFrame over the events Parquet (file streaming
    source).  On a cluster this is one line away from Kafka."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_is_long = (dict(spark.read.parquet(f"{sf_dir}/events.parquet")
                       .dtypes).get("ts") == "bigint")
    reader = (spark.readStream.schema(_events_schema(ts_is_long))
              .format("parquet")
              # the file source takes a DIRECTORY (new files appear over
              # time); the fixture dir holds every table, so filter
              .option("pathGlobFilter", "events.parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(sf_dir)
    if ts_is_long:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tumbling_counts(events: DataFrame,
                    watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling windows per event type; late rows beyond the
    watermark are dropped and window state is evicted as the watermark
    passes window end.  Streaming twin of plans.events_tumbling_window."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def sliding_counts(events: DataFrame,
                   watermark: str = "2 hours") -> DataFrame:
    """30-min windows sliding every 10 min (each event in 3 windows)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "n_events"))


def session_aggregates(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Session windows: per-user activity bursts separated by >gap.
    State per open session, closed (and emitted) once the watermark
    passes session end + gap."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "sum_value"))


def dedup_within_watermark(events: DataFrame,
                           watermark: str = "30 minutes") -> DataFrame:
    """Drop events whose (user_id, event_type) repeats within the
    watermark horizon — streaming twin of the batch
    events_dedup_within_time plan.  State = one entry per key seen,
    evicted as the watermark advances (bounded, unlike a global
    dropDuplicates)."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["user_id", "event_type"]))


_STATE_SCHEMA = StructType([
    StructField("total", DoubleType()),
    StructField("n", LongType()),
])
_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _running_totals(key, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Custom stateful op: cumulative per-user totals, one updated row
    per key per micro-batch (update mode).  Arrow-batched per key-group;
    state lives in the state store (checkpointable, rescalable).  No
    timers: a production variant would add an event-time timeout to
    evict idle users — timers force extra timer-service micro-batches,
    which an availableNow backfill must not wait on."""
    (user_id,) = key
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].fillna(0.0).sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [round(total, 4)]})


def user_running_totals_stateful(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: per-user running (count, sum(value)) —
    the custom-stateful-operator pattern (SURVEY §7.1 step 7)."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _running_totals,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def run_to_memory_sink(df: DataFrame, name: str,
                       output_mode: str = "append",
                       timeout: int = 120) -> None:
    """Execute a streaming DataFrame over the full backlog
    (availableNow) into an in-memory table ``name``; blocks until done."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .option("checkpointLocation",
                 f"/root/repo/.scratch/ckpt/{name}")
         .start())
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"streaming query {name} did not finish")
    if q.exception() is not None:
        raise q.exception()


def enriched_events(events: DataFrame, users_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a dimension
    table.  The static side re-resolves per micro-batch (picks up dim
    updates); broadcast applies exactly as in batch — no stream state."""
    return (events.join(F.broadcast(users_dim), "user_id", "left")
            .select("event_id", "ts", "user_id", "event_type", "value",
                    "user_bucket"))


def purchase_after_signup(events: DataFrame,
                          horizon: str = "1 hour") -> DataFrame:
    """Stream-stream self-join: purchases within ``horizon`` after a
    signup by the same user.  Both sides watermarked; the time-range
    predicate bounds join state (rows age out once the watermark passes
    signup_ts + horizon)."""
    signups = (events.where(F.col("event_type") == "signup")
               .select(F.col("user_id"),
                       F.col("ts").alias("signup_ts"))
               .withWatermark("signup_ts", "2 hours"))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
                 .withWatermark("purchase_ts", "2 hours"))
    return (signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(
            f"INTERVAL {horizon}")),
        "inner")
        .select("user_id", "signup_ts", "purchase_ts", "purchase_value"))


def purchase_after_signup_outer(events: DataFrame,
                                horizon: str = "1 hour") -> DataFrame:
    """LEFT OUTER stream-stream join: EVERY signup emits — joined to
    its within-``horizon`` purchases, or null-padded once the watermark
    proves no purchase can still arrive (signup_ts + horizon falls
    behind the purchase-side watermark, so the engine evicts the state
    and emits the unmatched row).  The conversion-funnel shape: inner
    results stream out as matches land; the "never converted" rows
    arrive exactly as late as the lateness bound requires and no later.

    State is bounded identically to the inner variant — the time-range
    predicate plus both watermarks age rows out; the outer-ness only
    changes what happens at eviction (emit-with-nulls instead of drop).
    """
    signups = (events.where(F.col("event_type") == "signup")
               .select(F.col("user_id"),
                       F.col("ts").alias("signup_ts"))
               .withWatermark("signup_ts", "2 hours"))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
                 .withWatermark("purchase_ts", "2 hours"))
    return (signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(
            f"INTERVAL {horizon}")),
        "leftOuter")
        .select("user_id", "signup_ts", "purchase_ts", "purchase_value"))


def stream_to_iceberg(df: DataFrame, iceberg_table,
                      query_name: str = "iceberg_ingest",
                      ckpt_dir: str | None = None):
    """Streaming ingestion into a catalog-managed Iceberg table: every
    micro-batch commits ONE append snapshot through the catalog's CAS —
    readers concurrently see whole batches or nothing (the lakehouse
    ingestion contract; the reference's writes commit the same way
    through its catalog, sql/main.rs:73).

    ``foreachBatch`` is the Spark-native bridge to transactional sinks
    that aren't built-in streaming sinks; exactly-once here derives from
    the snapshot commit being atomic per batch (re-run batches would
    need idempotent dedup upstream — standard lakehouse practice).

    The checkpoint lives under the table's own location by default, so
    a table created at a fresh path never inherits another run's
    processed-file ledger (a reused checkpoint silently skips every
    source file and commits nothing).  Returns the StreamingQuery;
    callers own awaiting/stopping."""
    if ckpt_dir is None:
        table_loc = iceberg_table._load_metadata()[1]["location"]
        ckpt_dir = os.path.join(table_loc, "_ckpt", query_name)

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        iceberg_table.append(batch_df)

    return (df.writeStream
            .foreachBatch(commit_batch)
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir)
            .start())


def stream_upsert_to_iceberg(df: DataFrame, iceberg_table,
                             key_cols: list[str], order_col: str,
                             ckpt_dir: str,
                             query_name: str = "iceberg_upsert"):
    """CDC-style streaming upsert: every micro-batch is collapsed to its
    latest row per key (``order_col`` descending — the change-stream
    sequence/timestamp) and MERGEd into the catalog-managed table with
    copy-on-write file granularity (iceberg_lite.merge_upsert).

    The lakehouse CDC ingestion shape: per batch, one atomic snapshot
    commit that updates matched keys and inserts new ones; readers see
    whole batches or nothing, and every pre-merge snapshot stays
    time-travelable.  Work per batch scales with the batch's key span
    (manifest stats prune the file set), never with table history.
    ``order_col`` must order rows of the same key uniquely within a
    batch — ties would make the collapse nondeterministic.  The
    checkpoint is caller-owned (``ckpt_dir``) so re-runs against a new
    table never inherit a stale file ledger."""
    from pyspark.sql import Window

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = (Window.partitionBy(*key_cols)
             .orderBy(F.col(order_col).desc()))
        latest = (batch_df.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") == 1).drop("__rn"))
        iceberg_table.merge_upsert(batch_df.sparkSession, latest, key_cols)

    return (df.writeStream
            .foreachBatch(commit_batch)
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir)
            .start())


def stream_cdc_apply(df: DataFrame, iceberg_table,
                     key_cols: list[str], order_col: str,
                     op_col: str, ckpt_dir: str,
                     query_name: str = "iceberg_cdc",
                     delete_strategy: str = "equality"):
    """Full CDC apply — upserts AND deletes — from a change stream whose
    rows carry an operation marker (``op_col``: 'delete' means tombstone,
    anything else means upsert).

    Per micro-batch: collapse to the latest change per key
    (``order_col`` descending), route keys whose final change is a
    tombstone through a MERGE-ON-READ delete, and upsert the rest.
    At most two snapshots per batch (one in equality mode), each
    atomic; a reader always sees a key's state as of some batch
    boundary.  Delete state accumulates until the table's periodic
    compact() folds it — the standard Iceberg CDC-mirror maintenance
    loop.

    ``delete_strategy='equality'`` (default) applies the WHOLE batch as
    ONE merge-on-read snapshot (iceberg_lite.merge_upsert_mor): the
    upsert rows plus one equality-delete file covering upsert AND
    tombstone keys, all at one sequence number — O(batch) per commit
    with NO table read; the strict-sequence rule keeps later re-inserts
    of a deleted key alive, exactly the delete-then-reinsert pattern
    change streams produce.  ``'positional'`` uses copy-on-write MERGE
    plus positional tombstones instead — reads stay cheaper (no key
    anti-join per read), writes pay scans and rewrites; prefer it when
    changes are rare and reads dominate.

    ``order_col`` must order same-key rows uniquely within a batch.
    The checkpoint is caller-owned, same contract as
    :func:`stream_upsert_to_iceberg`."""
    from pyspark.sql import Window

    if delete_strategy not in ("equality", "positional"):
        raise ValueError(f"unknown delete_strategy {delete_strategy!r}")
    data_cols = [c for c in df.columns if c != op_col]

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        w = (Window.partitionBy(*key_cols)
             .orderBy(F.col(order_col).desc()))
        latest = (batch_df.withColumn("__rn", F.row_number().over(w))
                  .where(F.col("__rn") == 1).drop("__rn")
                  .cache())
        try:
            tombstones = latest.where(F.col(op_col) == "delete")
            upserts = (latest.where(F.col(op_col) != "delete")
                       .select(*data_cols))
            if delete_strategy == "equality":
                # the whole batch — upserts AND tombstones — lands as
                # ONE merge-on-read snapshot with zero table reads
                iceberg_table.merge_upsert_mor(
                    spark, upserts, key_cols, delete_keys=tombstones)
            else:
                if not tombstones.isEmpty():
                    iceberg_table.delete_keys_mor(spark, tombstones,
                                                  key_cols)
                if not upserts.isEmpty():
                    iceberg_table.merge_upsert(spark, upserts, key_cols)
        finally:
            latest.unpersist()

    return (df.writeStream
            .foreachBatch(commit_batch)
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir)
            .start())


def stream_countmin_partials(stream_df: DataFrame, value_col: str,
                             out_dir: str, query_name: str = "cm_stream",
                             depth: int = 4, width: int = 256):
    """Streaming frequency sketching: each micro-batch builds its own
    count-min sketch (a d×w relation) and APPENDS it as a partial;
    readers merge partials by bin addition at query time.

    This is the mergeable-sketch pattern applied to streams: per-batch
    work is bounded (d·w counters, however many rows the batch has),
    appends are atomic per batch, and no unbounded key state lives in
    the streaming job at all — the sketch IS the state, and it's in the
    table.  At 100 TB/day: partials land per batch, a periodic compact
    job folds them (same groupBy-sum), and the estimate join broadcasts
    the folded d×w table.  Returns the StreamingQuery."""
    from ..operators.countmin import countmin_sketch

    def _append_partial(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (countmin_sketch(batch_df, value_col, depth=depth, width=width)
         .withColumn("batch_id", F.lit(batch_id))
         .coalesce(1)
         .write.mode("append").parquet(out_dir))

    # Checkpoint lives under out_dir: re-invoking with the same query
    # name but a different sink must NOT inherit the old checkpoint (a
    # shared fixed path would mark all source files already-processed
    # and silently write nothing to the new sink).
    return (stream_df.writeStream
            .foreachBatch(_append_partial)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{out_dir}/_ckpt")
            .queryName(query_name)
            .start())


def merged_countmin(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold every appended partial sketch into one (merge = bin-count
    addition; associative, so batch boundaries are invisible)."""
    return (spark.read.parquet(out_dir)
            .groupBy("d", "bucket")
            .agg(F.sum("c").alias("c")))


def stream_dedup_ingest(stream_docs: DataFrame, state_dir: str,
                        query_name: str = "dedup_ingest",
                        n_hashes: int = 64, bands: int = 16,
                        threshold_num: int = 9, threshold_den: int = 10):
    """Near-dup dedup AT INGEST with a persistent LSH band index — the
    production shape: each micro-batch minhashes ONLY its own docs,
    probes the accumulated band index for collisions, exact-verifies
    candidates, and appends just the novel docs (and their bands) to
    the index.  Work per batch scales with the batch and its
    collisions, never with corpus history size.

    Drop rule: a doc is dropped when it exact-verifies (token Jaccard
    >= t) against ANY already-indexed doc, or against a smaller-id doc
    in its own batch.  The kept set is therefore pair-free at threshold
    t (no two kept docs are near-dups — the invariant the test pins);
    relative to maximal-greedy it can only over-drop (a dropped doc's
    within-batch witness may itself have been dropped) — conservative
    in the safe direction for training data.

    State layout under ``state_dir``: ``index/`` parquet of
    (band, bh, __id, __tokens) for every KEPT doc; ``kept/`` parquet of
    kept (doc_id, text).  Appends are atomic per batch (foreachBatch).
    At 100 TB both live as Iceberg tables and the probe join reads only
    the colliding band partitions."""
    import os

    from ..operators.dedup import minhash_signature

    index_dir = os.path.join(state_dir, "index")
    kept_dir = os.path.join(state_dir, "kept")
    rows_per_band = max(1, n_hashes // bands)

    def _bands(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "__id", "__tokens",
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.hash(*[F.element_at("__sig",
                                               b * rows_per_band + r + 1)
                                  for r in range(rows_per_band)]).alias("bh"))
                for b in range(bands)])).alias("e")
        ).select("__id", "__tokens", "e.band", "e.bh")

    def _verified(cand: DataFrame) -> DataFrame:
        inter = F.size(F.array_intersect("tok_a", "tok_b"))
        union = F.size(F.array_union("tok_a", "tok_b"))
        sz_a, sz_b = F.size("tok_a"), F.size("tok_b")
        size_ok = ((threshold_den * sz_a >= threshold_num * sz_b)
                   & (threshold_den * sz_b >= threshold_num * sz_a))
        return cand.where(size_ok) \
                   .where(threshold_den * inter >= threshold_num * union)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sigs = minhash_signature(batch_df, "doc_id", "text",
                                 n_hashes).cache()
        be = _bands(sigs).cache()
        # within-batch: drop the larger id of any verified pair
        l, r = be.alias("l"), be.alias("r")
        # dedupe candidates by PAIR (token arrays are determined by the
        # ids, so one row per pair is lossless), verify, THEN collapse
        # to drop ids — collapsing per drop_id before the verify would
        # test one arbitrary partner and let real dups escape
        internal = _verified(
            l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.bh") == F.col("r.bh"))
                   & (F.col("l.__id") < F.col("r.__id")))
            .select(F.col("l.__id").alias("keep_id"),
                    F.col("l.__tokens").alias("tok_a"),
                    F.col("r.__tokens").alias("tok_b"),
                    F.col("r.__id").alias("drop_id"))
            .dropDuplicates(["keep_id", "drop_id"]))
        drops = internal.select("drop_id").distinct()
        # Against the accumulated index.  Existence is checked explicitly:
        # a broad except here would also swallow corrupt-parquet / schema
        # / IO errors and silently disable cross-batch dedup, violating
        # the pair-free invariant with no signal.  Any real read failure
        # must fail the batch.
        if os.path.isdir(index_dir):
            idx = spark.read.parquet(index_dir)
            cross = _verified(
                be.join(idx.withColumnRenamed("__id", "__idx_id")
                        .withColumnRenamed("__tokens", "__idx_tokens"),
                        ["band", "bh"])
                .select(F.col("__idx_id").alias("keep_id"),
                        F.col("__tokens").alias("tok_a"),
                        F.col("__idx_tokens").alias("tok_b"),
                        F.col("__id").alias("drop_id"))
                .dropDuplicates(["keep_id", "drop_id"]))
            drops = (drops.unionByName(cross.select("drop_id"))
                     .distinct())
        novel = sigs.join(drops, sigs["__id"] == drops["drop_id"],
                          "left_anti")
        (be.join(novel.select("__id"), ["__id"], "left_semi")
         .write.mode("append").parquet(index_dir))
        (batch_df.join(novel.select(F.col("__id").alias("doc_id")),
                       ["doc_id"], "left_semi")
         .write.mode("append").parquet(kept_dir))
        sigs.unpersist()
        be.unpersist()

    # Checkpoint is state-dir-scoped for the same reason as
    # stream_countmin_partials: a fixed shared path silently no-ops
    # re-runs against a fresh state_dir.
    return (stream_docs.writeStream
            .foreachBatch(_ingest)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(state_dir, "_ckpt"))
            .queryName(query_name)
            .start())


def stream_events_with_rollup(df: DataFrame, events_table, rollup_table,
                              ckpt_dir: str,
                              granularity: str = "1 hour",
                              keys: list[str] | None = None,
                              initial_events_snapshot: int | None = None,
                              query_name: str = "events_mv"):
    """Streaming materialized view: every micro-batch lands in the
    events table as one append snapshot AND the hourly rollup is
    incrementally refreshed from exactly that delta — the lakehouse
    continuous aggregate, kept transactionally adjacent to its source.

    Exactly-once against foreachBatch's at-least-once replays, with NO
    driver-memory state — everything recovers from table metadata:

    - the append stamps ``streaming-batch-id`` in its snapshot summary;
      a replayed batch whose append already committed is skipped, so
      rows are never ingested twice;
    - the refresh checkpoint is the ``events-snapshot`` recorded by the
      last refresh's merge commit (falling back to
      ``initial_events_snapshot`` — the snapshot the rollup's initial
      contents already cover, None for an empty rollup), so a crash
      between append and refresh replays the refresh over the SAME
      delta instead of skipping it;
    - a replay after both commits finds both stamps and no-ops.

    Per batch: one append commit, one merge commit; refresh work is the
    batch's buckets, never table history."""
    from ..operators.rollup_ts import refresh_rollup_incremental

    def _stamped(table, stamp: str) -> bool:
        return any(s["summary"].get("streaming-batch-id") == stamp
                   for s in table.snapshots())

    def _refresh_checkpoint(table) -> int | None:
        for s in reversed(table.snapshots()):
            v = s["summary"].get("events-snapshot")
            if v is not None:
                return int(v)
        return initial_events_snapshot

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        stamp = f"{query_name}:{batch_id}"
        if not _stamped(events_table, stamp):
            events_table.append(
                batch_df, summary_extra={"streaming-batch-id": stamp})
        if not _stamped(rollup_table, stamp):
            refresh_rollup_incremental(
                spark, events_table, rollup_table,
                since_snapshot=_refresh_checkpoint(rollup_table),
                granularity=granularity, keys=keys or [],
                summary_extra={"streaming-batch-id": stamp})

    return (df.writeStream
            .foreachBatch(commit_batch)
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt_dir)
            .start())


def stream_reservoir_sample(stream_df: DataFrame, id_col: str,
                            state_dir: str, k: int = 100,
                            seed: str = "reservoir-v1",
                            query_name: str = "reservoir_stream"):
    """Streaming uniform reservoir sample of size ``k`` — the mergeable
    max-hash formulation: an item's priority is ``md5(seed || id)``, and
    the reservoir is simply the k SMALLEST priorities seen so far.
    Top-k-by-hash is associative and deterministic, so per batch the job
    unions the incoming rows' priorities with the persisted reservoir
    and keeps the global k smallest — no randomness state, no
    per-item probability bookkeeping, and replaying or re-ordering
    batches cannot change the result (the invariant the pytest pins:
    streamed reservoir == batch top-k over the full input).

    Scale: per-batch work is batch + k rows; the reservoir on disk is
    k rows; a fleet of independent samplers merges by the same top-k —
    the distributed-sampling property A-Res needs weights for, free
    here because uniform sampling only needs a uniform priority.
    Returns the StreamingQuery."""
    import glob
    import os
    import shutil

    res_path = os.path.join(state_dir, "reservoir")

    def _read_reservoir(spark):
        # Recovery order: the live directory, else the newest retired
        # copy (a `.old*` dir is always a COMPLETE former reservoir —
        # it was live before being renamed aside; a `.tmp*` dir may be
        # half-written, so it is never read).
        candidates = [res_path] + sorted(
            glob.glob(res_path + ".old*"), reverse=True)
        for path in candidates:
            try:
                return spark.read.parquet(path)
            except Exception:  # noqa: BLE001 - absent/incomplete copy
                continue
        return None

    def _fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        incoming = batch_df.select(
            F.col(id_col).cast("long").alias("id"),
            F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
             .alias("priority"))
        current = _read_reservoir(spark)
        pool = incoming if current is None else current.unionByName(incoming)
        # Dedup the UNION, not just the incoming rows: an id that recurs
        # across micro-batches (or a replayed at-least-once batch) would
        # otherwise occupy two of the k slots and shrink the distinct
        # reservoir — the replay-invariance the pytest pins.
        kept = (pool.dropDuplicates(["id"])
                .orderBy("priority", "id").limit(k)
                .coalesce(1))
        # Recoverable swap: write the new copy, retire the old one by
        # RENAME (never delete-then-rename — a crash between those two
        # loses the reservoir and committed batches will not replay),
        # promote the new copy, and only then delete retired/tmp dirs.
        tmp = res_path + f".tmp{batch_id}"
        kept.write.mode("overwrite").parquet(tmp)
        old = res_path + f".old{batch_id:012d}"
        if os.path.exists(res_path):
            os.rename(res_path, old)
        os.rename(tmp, res_path)
        for stale in glob.glob(res_path + ".old*") + glob.glob(
                res_path + ".tmp*"):
            shutil.rmtree(stale, ignore_errors=True)

    return (stream_df.writeStream
            .foreachBatch(_fold_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{state_dir}/_ckpt")
            .queryName(query_name)
            .start())
