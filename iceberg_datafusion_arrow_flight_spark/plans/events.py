"""Event-time window plans over the ``events`` table.

The reference has **zero** streaming operators (SURVEY §2.10 — verified
against 100% of its source); these are north-star extensions expressed
with Spark's event-time primitives.  Each plan here is the *batch* form
(``F.window`` / ``session_window`` work identically in batch and
streaming); the true streaming pipeline (readStream + watermark +
append/update sinks) lives in :mod:`..streaming` and is pytest-verified,
since a streaming query cannot be returned through the driver contract.

Scale: tumbling/sliding windows are hash aggregates keyed by (window,
key) — partial aggregation applies, so shuffle is O(windows × keys).
Session windows require a per-key sort (gaps-and-islands); Spark's
session_window does it in one pass after a shuffle on user_id.

The reference has no event-time operators (SURVEY §2.10 — its streams
are transport-level only, lib.rs:288-295); these are north-star
extensions on Spark event-time primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table
from ..operators.materialize import materialize


@register(
    "events_tumbling_window",
    oracle="""
SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
""",
    doc="Tumbling 1-hour event-time window per event type (streaming "
        "window() in batch mode ≡ DuckDB time_bucket). Bench headline.",
    tags=("events", "window", "bench"),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


@register(
    "events_sliding_window",
    oracle="""
SELECT CAST(time_bucket(INTERVAL 10 MINUTE, ts - (k * INTERVAL 10 MINUTE)) AS TIMESTAMP)
         AS window_start,
       COUNT(*) AS n_events
FROM events, UNNEST([0, 1, 2]) t(k)
GROUP BY 1
""",
    doc="Sliding window: 30-min length, 10-min slide — every event lands "
        "in 3 windows (Spark window() with slideDuration; oracle expands "
        "the 3 memberships explicitly).",
    tags=("events", "window"),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"),
                    "n_events"))


@register(
    "events_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
    doc="Session window (30-min gap) per user: Spark session_window() in "
        "one pass ≡ the classic gaps-and-islands rewrite the oracle uses. "
        "Session END differs by design (Spark pads gap onto the close), so "
        "the comparable columns are start + count.",
    tags=("events", "window", "session"),
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("w.start").cast("timestamp_ntz").alias("session_start"),
                    "n_events"))


@register(
    "events_dedup_within_time",
    oracle="""
SELECT user_id, event_type,
       CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute_bucket,
       COUNT(*) AS n_collapsed
FROM events GROUP BY 1, 2, 3
""",
    doc="Batch analogue of dropDuplicatesWithinWatermark: collapse events "
        "to one row per (user, type, minute), reporting how many collapsed. "
        "The true watermark form is in streaming/ (pytest).",
    tags=("events", "dedup"),
)
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (e.groupBy("user_id", "event_type",
                      F.date_trunc("minute", "ts").cast("timestamp_ntz")
                      .alias("minute_bucket"))
            .agg(F.count("*").alias("n_collapsed")))


@register(
    "events_funnel_rates",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(AVG(value), 6) AS avg_value,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share
FROM events GROUP BY event_type
""",
    doc="Event funnel: per-type counts, distinct users, share-of-total "
        "(aggregate + window over aggregate).",
    tags=("events", "aggregate"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    agg = (e.groupBy("event_type")
           .agg(F.count("*").alias("n"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.avg("value"), 6).alias("avg_value")))
    return agg.select("event_type", "n", "n_users", "avg_value",
                      F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6)
                      .alias("share"))


@register(
    "join_asof_events",
    oracle="""
SELECT p.event_id,
       p.user_id,
       p.ts AS purchase_ts,
       s.ts AS asof_ts,
       s.event_id AS asof_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    doc="AS-OF join (absent from Spark AND DataFusion 40 — SURVEY §2.3; "
        "first-class here for point-in-time feature lookup): each "
        "purchase joined to the user's latest prior-or-equal signup. "
        "Implemented as union + keyed window carry-forward (one shuffle, "
        "no join fan-out) in operators/asof.py; DuckDB's native ASOF "
        "JOIN is the oracle.",
    tags=("events", "join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join
    e = table(spark, sf_dir, "events")
    purchases = (e.where(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", F.col("ts")))
    signups = (e.where(F.col("event_type") == "signup")
               .select(F.col("user_id"), F.col("ts"),
                       F.col("event_id").alias("sid")))
    out = asof_join(purchases, signups, key="user_id",
                    left_ts="ts", right_ts="ts", right_cols=["sid"])
    return out.select("event_id", "user_id",
                      F.col("ts").alias("purchase_ts"),
                      "asof_ts",
                      F.col("asof_sid").alias("asof_event_id"))


@register(
    "events_hypertable_rollup",
    oracle="""
SELECT CAST(time_bucket(INTERVAL 1 DAY, ts) AS TIMESTAMP) AS bucket,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value
FROM events
GROUP BY 1, 2
""",
    doc="Hypertable continuous-aggregate rollup: day level computed by "
        "re-aggregating the hour level (raw rows touched once), which "
        "must equal aggregating raw directly at day granularity — the "
        "oracle checks exactly that identity. "
        "operators/rollup_ts.py:rollup_hierarchy.",
    tags=("events", "rollup"),
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup_ts import rollup_hierarchy
    e = table(spark, sf_dir, "events")
    levels = rollup_hierarchy(e, "ts", ["1 hour", "1 day"], ["event_type"])
    day = levels["1 day"]
    return day.select(
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        "event_type", "n",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"))


@register(
    "events_hll_sketch_merge",
    oracle=None,  # estimates are sketch-impl-specific; identity tested in pytest
    doc="Mergeable HLL sketches (Datasketches, Spark 3.5+ builtins): "
        "per-event-type user sketches unioned into a global estimate — "
        "the re-aggregatable distinct-count pattern (store sketches per "
        "partition/day, merge at query time; never re-scan raw data). "
        "Estimates are implementation-specific -> rows-only check; the "
        "merge identity (union of group sketches == whole-table sketch) "
        "is pinned in tests.",
    tags=("events", "sketch", "approx"),
)
def events_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_type = (e.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk"),
                     F.count("*").alias("n_events")))
    return (per_type.select(
        "event_type", "n_events",
        F.hll_sketch_estimate("sk").alias("approx_users"))
        .unionAll(per_type.groupBy()
                  .agg(F.hll_union_agg("sk").alias("g"),
                       F.sum("n_events").alias("n_events"))
                  .select(F.lit("__ALL__").alias("event_type"),
                          "n_events",
                          F.hll_sketch_estimate("g").alias("approx_users"))))


@register(
    "events_cohort_retention",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
), cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM activity GROUP BY user_id
)
SELECT CAST(cohort_wk AS TIMESTAMP) AS cohort_week,
       CAST((epoch(wk) - epoch(cohort_wk)) / 604800 AS INT) AS weeks_since,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM activity JOIN cohort USING (user_id)
GROUP BY cohort_wk, weeks_since
ORDER BY cohort_week, weeks_since
""",
    doc="Cohort retention matrix: users grouped by first-active week, "
        "counted in each subsequent week they return — the canonical "
        "product-analytics rollup.  Two keyed aggregates (distinct "
        "user-week activity, per-user cohort min) and one user-keyed "
        "join; shuffle is O(users × active weeks), never O(events), "
        "because the distinct collapses first.",
    tags=("events", "aggregate"),
)
def events_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    activity = (e.select("user_id", F.date_trunc("week", "ts").alias("wk"))
                .distinct())
    cohort = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    weeks_since = ((F.unix_timestamp("wk")
                    - F.unix_timestamp("cohort_wk")) / 604800).cast("int")
    return (activity.join(cohort, "user_id")
            .select(F.col("cohort_wk").cast("timestamp_ntz")
                    .alias("cohort_week"),
                    weeks_since.alias("weeks_since"))
            .groupBy("cohort_week", "weeks_since")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
            .orderBy("cohort_week", "weeks_since"))


@register(
    "events_user_anomalies",
    oracle="""
WITH s AS (
  SELECT user_id, AVG(value) AS m, STDDEV_SAMP(value) AS sd
  FROM events GROUP BY user_id
)
SELECT event_id, user_id,
       ROUND(value, 4) AS value,
       ROUND((value - m) / sd, 2) AS zscore
FROM events JOIN s USING (user_id)
WHERE ABS(value - m) > 2.5 * sd
ORDER BY event_id
""",
    doc="Per-user anomaly flagging: events whose value sits more than "
        "2.5 sample-stddevs from that user's mean.  One partial-agg "
        "shuffle builds the per-user model (users-sized, broadcast "
        "back); the detection pass is a map-side join + filter, so the "
        "event stream is scanned once and never re-shuffled.  The "
        "z-score is rounded to 2 decimals for cross-engine float "
        "stability at the compare boundary.",
    tags=("events", "aggregate"),
)
def events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    stats = (e.groupBy("user_id")
             .agg(F.avg("value").alias("__m"),
                  F.stddev_samp("value").alias("__sd")))
    return (e.join(F.broadcast(stats), "user_id")
            .where(F.abs(F.col("value") - F.col("__m"))
                   > 2.5 * F.col("__sd"))
            .select("event_id", "user_id",
                    F.round("value", 4).alias("value"),
                    F.round((F.col("value") - F.col("__m")) / F.col("__sd"),
                            2).alias("zscore"))
            .orderBy("event_id"))


@register(
    "events_trending_topk",
    oracle="""
WITH w AS (
  SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
         event_type, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n_events, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                                    ORDER BY n_events DESC, event_type)
                 AS INT) AS rnk
  FROM w
) WHERE rnk <= 3
""",
    doc="Windowed trending top-k: the 3 most frequent event types per "
        "1-hour tumbling window — the rank-within-event-time-bucket "
        "shape every monitoring dashboard runs.  Aggregate keyed by "
        "(window, type) then a per-window row_number; deterministic "
        "tie-break on type.",
    tags=("events", "window", "topk"),
)
def events_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    e = table(spark, sf_dir, "events")
    counts = (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
              .select(F.col("w.start").cast("timestamp_ntz")
                      .alias("window_start"), "event_type", "n_events"))
    win = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type"))
    return (counts.withColumn("rnk", F.row_number().over(win).cast("int"))
            .where(F.col("rnk") <= 3))


@register(
    "events_gap_fill",
    oracle="""
WITH hourly AS (
  -- mean = round(sum, 2) / n, UNrounded after the division: the
  -- coarse sum-round absorbs the engines' summation-order ulps, and
  -- the division of bit-identical operands is bit-identical — no
  -- final round, because a quotient landing exactly on .XXXX5 rounds
  -- differently across engines (binary-value vs shortest-decimal
  -- rounding; both a raw ROUND(AVG, 4) and a rounded quotient flipped
  -- the last digit at sf0.1)
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(value), 2) / COUNT(*) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (SELECT MIN(bucket) AS b0, MAX(bucket) AS b1 FROM hourly),
buckets AS (
  SELECT CAST(unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS bucket
  FROM bounds
), spine AS (
  SELECT b.bucket, t.event_type
  FROM buckets b, (SELECT DISTINCT event_type FROM events) t
)
SELECT s.bucket, s.event_type,
       CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
       LAST_VALUE(h.avg_value IGNORE NULLS) OVER (
          PARTITION BY s.event_type ORDER BY s.bucket
          ROWS UNBOUNDED PRECEDING) AS value_locf,
       (h.n_events IS NULL) AS is_gap
FROM spine s LEFT JOIN hourly h USING (bucket, event_type)
""",
    doc="Time-series gap filling over the hourly hypertable rollup: a "
        "complete (hour × event_type) spine from the data's own time "
        "bounds, zero-count rows for silent hours, and LOCF (last "
        "observation carried forward) of the hourly mean — the "
        "TimescaleDB time_bucket_gapfill/locf composite, absent from "
        "DataFusion 40 and Spark alike.  Scale shape: the spine is "
        "generated from a 1-row bounds aggregate (sequence + explode — "
        "O(hours × types), independent of raw event count), the fill "
        "join runs against the ROLLUP not the events, and LOCF is one "
        "per-type ordered window over the bounded spine.",
    tags=("events", "window"),
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    e = table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                   (F.round(F.sum("value"), 2)
                    / F.count(F.lit(1))).alias("avg_value"))
              .select(F.col("w.start").cast("timestamp_ntz").alias("bucket"),
                      "event_type", "n_events", "avg_value"))
    bounds = hourly.agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
    buckets = bounds.select(
        F.explode(F.sequence("b0", "b1", F.expr("INTERVAL 1 HOUR")))
        .alias("bucket"))
    spine = buckets.crossJoin(e.select("event_type").distinct())
    locf_w = (W.partitionBy("event_type").orderBy("bucket")
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (spine.join(hourly, ["bucket", "event_type"], "left")
            .select("bucket", "event_type",
                    F.coalesce("n_events", F.lit(0)).cast("bigint")
                    .alias("n_events"),
                    F.last("avg_value", ignorenulls=True).over(locf_w)
                    .alias("value_locf"),
                    F.col("n_events").isNull().alias("is_gap")))


@register(
    "events_rollup_incremental_refresh",
    oracle="""
SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket,
       event_type,
       n,
       ROUND(sum_value, 4) AS sum_value,
       ROUND(min_value, 4) AS min_value,
       ROUND(max_value, 4) AS max_value
FROM (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ts, event_type,
         COUNT(*) AS n, SUM(value) AS sum_value,
         MIN(value) AS min_value, MAX(value) AS max_value
  FROM events GROUP BY 1, 2
)
ORDER BY bucket, event_type
""",
    doc="Continuous-aggregate incremental refresh over catalog tables: "
        "an hourly rollup table is initialized from half the events, a "
        "second batch is appended to the events table, and the refresh "
        "reads ONLY that delta (incremental scan), combines it with the "
        "touched rollup rows (count/sum add, min/max fold), and MERGEs "
        "copy-on-write.  The refreshed rollup must equal the full "
        "recompute over all events — the oracle checks exactly that "
        "identity, which only holds if delta detection, the combinable "
        "re-aggregation, and the merge all compose correctly. "
        "operators/rollup_ts.py:refresh_rollup_incremental.",
    tags=("events", "rollup", "iceberg"),
)
def events_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..operators.rollup_ts import (bucket_aggregate,
                                       refresh_rollup_incremental)
    from ..sources.iceberg_lite import SqliteCatalog

    root = tempfile.mkdtemp(prefix="spark_graft_car_")
    cat = SqliteCatalog(os.path.join(root, "catalog.db"),
                        warehouse=os.path.join(root, "warehouse"))
    events = table(spark, sf_dir, "events")
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    ev = cat.create_table("stream", "events_car", first)
    ckpt = ev.append(first)
    init = bucket_aggregate(first, "ts", "1 hour", ["event_type"])
    agg = cat.create_table("agg", "hourly", init)
    agg.append(init)
    ev.append(second)                               # new data arrives
    refresh_rollup_incremental(spark, ev, agg, since_snapshot=ckpt,
                               granularity="1 hour",
                               keys=["event_type"])
    return (agg.read(spark)
            .select(F.col("bucket").cast("timestamp_ntz").alias("bucket"),
                    "event_type", "n",
                    F.round("sum_value", 4).alias("sum_value"),
                    F.round("min_value", 4).alias("min_value"),
                    F.round("max_value", 4).alias("max_value"))
            .orderBy("bucket", "event_type"))


@register(
    "events_gap_fill_interpolate",
    oracle="""
WITH hourly AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(value), 2) / COUNT(*) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (SELECT MIN(bucket) AS b0, MAX(bucket) AS b1 FROM hourly),
buckets AS (
  SELECT CAST(unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS bucket
  FROM bounds
), spine AS (
  SELECT b.bucket, t.event_type
  FROM buckets b, (SELECT DISTINCT event_type FROM events) t
), joined AS (
  SELECT s.bucket, s.event_type, h.avg_value,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
         (h.n_events IS NULL) AS is_gap,
         LAST_VALUE(h.avg_value IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.bucket
            ROWS UNBOUNDED PRECEDING) AS pv,
         LAST_VALUE(CASE WHEN h.avg_value IS NOT NULL THEN s.bucket END
                    IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.bucket
            ROWS UNBOUNDED PRECEDING) AS pb,
         FIRST_VALUE(h.avg_value IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN h.avg_value IS NOT NULL THEN s.bucket END
                     IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.bucket
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM spine s LEFT JOIN hourly h USING (bucket, event_type)
)
SELECT bucket, event_type, n_events, is_gap,
       CASE WHEN NOT is_gap THEN avg_value
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv)
                 * (date_diff('hour', pb, bucket) * 1.0
                    / date_diff('hour', pb, nb))
       END AS value_interp
FROM joined
""",
    doc="Gap filling by LINEAR INTERPOLATION — the `interpolate()` "
        "companion of the LOCF entry (TimescaleDB's gapfill pair): "
        "each silent hour gets the distance-weighted blend of the "
        "nearest observed means on either side (edges degrade to "
        "nearest-neighbor).  Two opposing IGNORE NULLS value/bucket "
        "windows per type recover the bracketing observations in one "
        "pass over the bounded spine; the hour-count ratio is an exact "
        "small-integer quotient and every operand is bit-identical "
        "across engines, so the blend needs no final rounding.",
    tags=("events", "window"),
)
def events_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    e = table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                   (F.round(F.sum("value"), 2)
                    / F.count(F.lit(1))).alias("avg_value"))
              .select(F.col("w.start").cast("timestamp_ntz").alias("bucket"),
                      "event_type", "n_events", "avg_value"))
    bounds = hourly.agg(F.min("bucket").alias("b0"),
                        F.max("bucket").alias("b1"))
    buckets = bounds.select(
        F.explode(F.sequence("b0", "b1", F.expr("INTERVAL 1 HOUR")))
        .alias("bucket"))
    spine = buckets.crossJoin(e.select("event_type").distinct())
    back = (W.partitionBy("event_type").orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    fwd = (W.partitionBy("event_type").orderBy("bucket")
           .rowsBetween(W.currentRow, W.unboundedFollowing))
    obs_bucket = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    j = (spine.join(hourly, ["bucket", "event_type"], "left")
         .select("bucket", "event_type", "avg_value",
                 F.coalesce("n_events", F.lit(0)).cast("bigint")
                 .alias("n_events"),
                 F.col("n_events").isNull().alias("is_gap"))
         .withColumn("pv", F.last("avg_value", ignorenulls=True).over(back))
         .withColumn("pb", F.last(obs_bucket, ignorenulls=True).over(back))
         .withColumn("nv", F.first("avg_value", ignorenulls=True).over(fwd))
         .withColumn("nb", F.first(obs_bucket, ignorenulls=True).over(fwd)))
    frac = (F.expr("timestampdiff(HOUR, pb, bucket)") * F.lit(1.0)
            / F.expr("timestampdiff(HOUR, pb, nb)"))
    return j.select(
        "bucket", "event_type", "n_events", "is_gap",
        F.when(~F.col("is_gap"), F.col("avg_value"))
         .when(F.col("pv").isNull(), F.col("nv"))
         .when(F.col("nv").isNull(), F.col("pv"))
         .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
         .alias("value_interp"))


@register(
    "events_series_correlation",
    oracle="""
WITH hourly AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
         ROUND(SUM(CASE WHEN event_type = 'click'
                        THEN value ELSE 0 END), 4) AS clicks,
         ROUND(SUM(CASE WHEN event_type = 'purchase'
                        THEN value ELSE 0 END), 4) AS purchases,
         ROUND(SUM(CASE WHEN event_type = 'error'
                        THEN value ELSE 0 END), 4) AS errors
  FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(CORR(clicks, purchases), 6) AS corr_click_purchase,
       ROUND(CORR(clicks, errors), 6) AS corr_click_error,
       ROUND(CORR(purchases, errors), 6) AS corr_purchase_error
FROM hourly
""",
    doc="Cross-series correlation over the hourly rollup: Pearson "
        "correlation between the click / purchase / error value series "
        "bucketed per hour — the 'do these metrics move together' "
        "dashboard primitive.  One conditional-sum aggregation pivots "
        "the three series in a single pass (no per-type rescan, no "
        "join); the per-bucket sums round to 4 digits so cross-engine "
        "summation-order ulps cannot leak into the correlation inputs.",
    tags=("events",),
)
def events_series_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")

    def series(t):
        return F.round(F.sum(F.when(F.col("event_type") == t,
                                    F.col("value")).otherwise(0.0)), 4)

    hourly = (e.groupBy(F.window("ts", "1 hour").alias("w"))
              .agg(series("click").alias("clicks"),
                   series("purchase").alias("purchases"),
                   series("error").alias("errors")))
    return hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.round(F.corr("clicks", "purchases"), 6)
         .alias("corr_click_purchase"),
        F.round(F.corr("clicks", "errors"), 6).alias("corr_click_error"),
        F.round(F.corr("purchases", "errors"), 6)
         .alias("corr_purchase_error"))


@register(
    "events_burn_rate_alerts",
    oracle="""
WITH buckets AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_err
  FROM events GROUP BY 1
), rates AS (
  SELECT bucket, n, n_err,
         SUM(n_err) OVER w * 1.0 / SUM(n) OVER w AS rate_1h
  FROM buckets
  WINDOW w AS (ORDER BY bucket
               RANGE BETWEEN INTERVAL '55 minutes' PRECEDING
                         AND CURRENT ROW)
)
SELECT bucket,
       n, n_err,
       ROUND(n_err * 1.0 / n, 6)          AS rate_5m,
       ROUND(rate_1h, 6)                  AS rate_1h,
       (n_err * 1.0 / n > 0.24 AND rate_1h > 0.21) AS page
FROM rates
ORDER BY bucket
""",
    doc="Multi-window SLO burn-rate alerting (the Google-SRE pattern): "
        "per-5-minute error rate AND the trailing 1-hour rate at every "
        "bucket — a page fires only when BOTH exceed their thresholds, "
        "so a single noisy bucket cannot page and a slow burn still "
        "does.  The 1-hour window is a time-RANGE frame over bucket "
        "timestamps (the window_time_range_frame epoch-micros "
        "translation: 55 minutes preceding a 5-minute bucket start "
        "covers exactly the 12-bucket hour).  One bucket aggregate + "
        "one ordered window over bucket-cardinality rows — at 100 TB "
        "the windowed series is buckets, not events. plans/events.py.",
    tags=("events", "window", "monitoring"),
)
def events_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    buckets = (e.groupBy(F.window("ts", "5 minutes").alias("w"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum((F.col("event_type") == "error").cast("int"))
                     .cast("bigint").alias("n_err"))
               .select(F.col("w.start").alias("bucket"), "n", "n_err"))
    wr = (Window.orderBy(F.unix_micros(F.col("bucket").cast("timestamp")))
          .rangeBetween(-55 * 60 * 1_000_000, 0))
    rate_1h = (F.sum("n_err").over(wr) * 1.0 / F.sum("n").over(wr))
    rate_5m = F.col("n_err") * 1.0 / F.col("n")
    return (buckets
            .select("bucket", "n", "n_err",
                    F.round(rate_5m, 6).alias("rate_5m"),
                    F.round(rate_1h, 6).alias("rate_1h"),
                    ((rate_5m > 0.24) & (rate_1h > 0.21)).alias("page"))
            .orderBy("bucket"))


@register(
    "events_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), grouped AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM grouped GROUP BY user_id, grp
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)  AS n_streaks,
       CAST(MAX(len) AS BIGINT)  AS longest_streak,
       CAST(SUM(len) AS BIGINT)  AS active_days
FROM streaks
GROUP BY user_id
ORDER BY user_id
""",
    doc="Consecutive-day activity streaks per user — the classic "
        "gaps-and-islands rewrite (date minus per-user row_number is "
        "constant within a run of consecutive days), the engagement / "
        "retention primitive.  One distinct, one per-user window, two "
        "keyed aggs — all partitioned by user, no global state. "
        "plans/events.py.",
    tags=("events", "window"),
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = (grouped.groupBy("user_id", "grp")
               .agg(F.count(F.lit(1)).cast("bigint").alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
                 F.max("len").cast("bigint").alias("longest_streak"),
                 F.sum("len").cast("bigint").alias("active_days"))
            .orderBy("user_id"))


@register(
    "events_anomaly_mad",
    oracle="""
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, MEDIAN(n) AS m FROM hourly GROUP BY event_type
), mad AS (
  SELECT h.event_type, ANY_VALUE(m.m) AS m,
         MEDIAN(ABS(h.n - m.m)) AS mad
  FROM hourly h JOIN med m USING (event_type)
  GROUP BY h.event_type
)
SELECT h.event_type, h.h AS hour, h.n,
       ROUND(m.m, 4) AS median_n,
       ROUND(0.6745 * (h.n - m.m) / GREATEST(m.mad, 0.5), 4)
           AS modified_z
FROM hourly h JOIN mad m ON m.event_type = h.event_type
WHERE ABS(0.6745 * (h.n - m.m) / GREATEST(m.mad, 0.5)) > 3.5
ORDER BY h.event_type, hour
""",
    doc="Robust anomaly detection on hourly event volumes: modified "
        "z-score 0.6745·(n−median)/MAD — the median/MAD twin of the "
        "stddev entry (events_user_anomalies), immune to the exact "
        "outliers it hunts (one wild hour inflates a stddev and hides "
        "itself; it cannot move a median).  MAD floor 0.5 guards "
        "constant series.  Hourly rollup is one keyed agg; the "
        "median/MAD model is type-cardinality-sized and broadcast "
        "back — the event stream never re-shuffles.  Medians are "
        "exact (odd/even handled identically by both engines on "
        "integer counts; ROUND(...,4) at the compare boundary).",
    tags=("events", "aggregate", "monitoring"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hourly = (e.groupBy("event_type",
                        F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    med = (hourly.groupBy("event_type")
           .agg(F.median("n").alias("m")))
    mad = (hourly.join(F.broadcast(med), "event_type")
           .groupBy("event_type")
           .agg(F.any_value("m").alias("m"),
                F.median(F.abs(F.col("n") - F.col("m"))).alias("mad")))
    z = (F.lit(0.6745) * (F.col("n") - F.col("m"))
         / F.greatest(F.col("mad"), F.lit(0.5)))
    return (hourly.join(F.broadcast(mad), "event_type")
            .where(F.abs(z) > 3.5)
            .select("event_type", "hour", "n",
                    F.round("m", 4).alias("median_n"),
                    F.round(z, 4).alias("modified_z"))
            .orderBy("event_type", "hour"))


@register(
    "events_ohlc_candles",
    oracle="""
SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS bucket,
       event_type,
       ROUND(arg_min(value, ts), 4) AS open,
       ROUND(MAX(value), 4)         AS high,
       ROUND(MIN(value), 4)         AS low,
       ROUND(arg_max(value, ts), 4) AS close,
       ROUND(SUM(value), 4)         AS volume,
       CAST(COUNT(*) AS BIGINT)     AS n
FROM events
GROUP BY 1, 2
ORDER BY bucket, event_type
""",
    doc="OHLC candlestick rollup — open/close are the time-ordered "
        "FIRST/LAST values per (hour, type), the financial/telemetry "
        "summary the plain min/max rollup cannot express.  One keyed "
        "agg (min_by/max_by on the event time — partial-aggregable, so "
        "map-side combine still applies).  First/last keys on ts alone; "
        "the entry ASSERTS (ts, type) uniqueness mid-plan, so a future "
        "fixture with timestamp ties turns into a loud gate ERR rather "
        "than a cross-engine tie-break hash flake (the fixture has no "
        "ties at any SF; production code would key on (ts, event_id)). "
        "plans/events.py:events_ohlc.",
    tags=("events", "rollup"),
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    dup = (e.groupBy("event_type", "ts").count()
           .where(F.col("count") > 1).limit(1).count())
    if dup:
        raise AssertionError(
            "events fixture gained (event_type, ts) ties — switch the "
            "OHLC first/last key to (ts, event_id) on BOTH sides")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("bucket"),
                      "event_type")
            .agg(F.round(F.min_by("value", "ts"), 4).alias("open"),
                 F.round(F.max("value"), 4).alias("high"),
                 F.round(F.min("value"), 4).alias("low"),
                 F.round(F.max_by("value", "ts"), 4).alias("close"),
                 F.round(F.sum("value"), 4).alias("volume"),
                 F.count(F.lit(1)).cast("bigint").alias("n"))
            .orderBy("bucket", "event_type"))


@register(
    "events_cumulative_unique_users",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(time_bucket(INTERVAL '1 day', ts)) AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY first_day
)
SELECT CAST(day AS TIMESTAMP) AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cumulative_users
FROM daily
ORDER BY day
""",
    doc="Cumulative unique users over time — the growth curve (daily "
        "new users + running total).  The scalable rewrite: a running "
        "COUNT(DISTINCT) over an expanding frame would keep per-row "
        "distinct state; instead each user contributes once at their "
        "FIRST day (one keyed min), the per-day news are a second "
        "keyed count, and the running total is a window over "
        "day-cardinality rows — distinct state never leaves the keyed "
        "aggregations.  plans/events.py:events_cumulative_users.",
    tags=("events", "window"),
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    firsts = (e.groupBy("user_id")
              .agg(F.min(F.date_trunc("day", "ts")).alias("first_day")))
    daily = (firsts.groupBy(F.col("first_day").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("new_users")))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (daily.select(
                "day", "new_users",
                F.sum("new_users").over(w).cast("bigint")
                 .alias("cumulative_users"))
            .orderBy("day"))


@register(
    "events_attribution_last_touch",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                         THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch_ts
  FROM events
)
SELECT CASE WHEN last_touch_ts >= ts - INTERVAL 7 DAY THEN last_touch
            ELSE 'direct' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM tagged
WHERE event_type = 'purchase'
GROUP BY channel
ORDER BY channel
""",
    doc="Last-touch marketing attribution: each purchase is credited "
        "to the user's most recent prior click/view within a 7-day "
        "lookback, else 'direct' — the classic attribution query a "
        "product-analytics engine runs.  One window pass per user "
        "(LAST_VALUE IGNORE NULLS over the preceding frame carries the "
        "latest touch forward — no self-join against the touch "
        "history), then a channel-keyed aggregate.  Revenue sums in "
        "integer CENTS (values are 2-decimal), so the aggregate is "
        "order-independent — no float-summation ulps to round away. "
        "plans/events.py:events_attribution.",
    tags=("events", "window"),
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    touch = F.when(F.col("event_type").isin("click", "view"),
                   F.col("event_type"))
    touch_ts = F.when(F.col("event_type").isin("click", "view"),
                      F.col("ts"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    tagged = e.select(
        "event_type", "ts", "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("last_touch_ts"))
    channel = F.when(
        F.col("last_touch_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY"),
        F.col("last_touch")).otherwise(F.lit("direct"))
    return (tagged.where(F.col("event_type") == "purchase")
            .select(channel.alias("channel"),
                    F.round(F.col("value") * 100).cast("bigint")
                     .alias("cents"))
            .groupBy("channel")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
                 F.sum("cents").cast("bigint").alias("revenue_cents"))
            .orderBy("channel"))


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
), pairs AS (
  SELECT src, dst FROM seq WHERE dst IS NOT NULL
), counts AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM pairs
  GROUP BY src, dst
), totals AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS row_total FROM counts GROUP BY src
)
SELECT c.src, c.dst, c.n,
       ROUND(c.n * 1.0 / t.row_total, 6) AS p
FROM counts c JOIN totals t USING (src)
ORDER BY src, dst
""",
    doc="User-journey Markov transition matrix: P(next event_type | "
        "current) from each user's time-ordered event sequence — the "
        "behavioral-model primitive behind funnel simulation and "
        "next-action prediction.  One LEAD window pass per user, then "
        "a (src,dst)-keyed count (25 cells here, state-space-sized "
        "anywhere); probabilities are exact integer ratios rounded at "
        "the boundary.  plans/events.py:events_markov.",
    tags=("events", "window"),
)
def events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(F.col("event_type").alias("src"),
                   F.lead("event_type").over(w).alias("dst"))
    counts = (seq.where(F.col("dst").isNotNull())
              .groupBy("src", "dst")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    totals = (counts.groupBy("src")
              .agg(F.sum("n").cast("bigint").alias("row_total")))
    return (counts.join(totals, "src")
            .select("src", "dst", "n",
                    F.round(F.col("n") / F.col("row_total"), 6).alias("p"))
            .orderBy("src", "dst"))


@register(
    "events_power_users_pareto",
    oracle="""
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
), deciled AS (
  SELECT user_id, n_events,
         NTILE(10) OVER (ORDER BY n_events DESC, user_id) AS decile
  FROM per_user
), per_decile AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(n_events) AS BIGINT) AS n_events
  FROM deciled GROUP BY decile
), tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM per_user
)
SELECT CAST(decile AS INT) AS decile, n_users, n_events,
       ROUND(n_events * 1.0 / total, 6) AS share,
       ROUND(SUM(n_events) OVER (ORDER BY decile
                                 ROWS UNBOUNDED PRECEDING)
             * 1.0 / total, 6) AS cumulative_share
FROM per_decile, tot
ORDER BY decile
""",
    doc="Power-user concentration (Pareto/80-20 profile): users ranked "
        "by activity into deciles, each decile's event share and the "
        "running cumulative share — the one-look answer to 'how "
        "concentrated is my traffic', which also predicts key skew for "
        "every user-keyed shuffle (see diag_key_skew_profile).  One "
        "user-keyed count, a user-cardinality NTILE, a 10-row window; "
        "shares are exact integer ratios rounded at the boundary. "
        "plans/events.py:events_pareto.",
    tags=("events", "window"),
)
def events_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..operators.ranking import distributed_ntile
    e = table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    # distributed exact NTILE over the user table (operators/ranking.py)
    # — the global-window form would single-partition it
    deciled = distributed_ntile(
        per_user, [F.col("n_events").desc(), F.col("user_id")], 10,
        "decile")
    per_decile = (deciled.groupBy(F.col("decile").cast("int")
                                  .alias("decile"))
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                       F.sum("n_events").cast("bigint").alias("n_events")))
    total = per_user.agg(F.sum("n_events").cast("bigint").alias("total"))
    wc = (Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (per_decile.crossJoin(F.broadcast(total))
            .select("decile", "n_users", "n_events",
                    F.round(F.col("n_events") / F.col("total"), 6)
                     .alias("share"),
                    F.round(F.sum("n_events").over(wc) / F.col("total"), 6)
                     .alias("cumulative_share"))
            .orderBy("decile"))


@register(
    "sketch_kmv_distinct_users",
    oracle="""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5('kmv|' || CAST(user_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
  FROM events
), topk AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), kk AS (
  SELECT event_type, MAX(h) AS hk, CAST(COUNT(*) AS BIGINT) AS n_le_k
  FROM topk WHERE rn <= 64 GROUP BY event_type
), ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT k.event_type,
       CAST(CASE WHEN n_le_k < 64 THEN n_le_k
            ELSE ROUND(63.0 * (1152921504606846976.0 / hk))
            END AS BIGINT) AS kmv_estimate,
       exact_distinct,
       ROUND(ABS(CAST(CASE WHEN n_le_k < 64 THEN n_le_k
                      ELSE ROUND(63.0 * (1152921504606846976.0 / hk))
                      END AS BIGINT) - exact_distinct) * 1.0
             / exact_distinct, 4) AS rel_err
FROM kk k JOIN ex USING (event_type)
ORDER BY event_type
""",
    doc="K-Minimum-Values distinct-user sketch per event type, with "
        "its exact twin and relative error in one result — the fourth "
        "mergeable sketch family (count-min, Bloom, HDR, now KMV).  "
        "Estimate (k-1)*2^60/h_k from the k=64 smallest md5-derived "
        "hash priorities; below k distinct values the sketch is EXACT "
        "by construction.  Everything is deterministic integer/double "
        "arithmetic both engines spell identically, so unlike any "
        "native HLL the ESTIMATE itself is oracle-checkable "
        "bit-for-bit, not just its error bound.  One distinct + one "
        "keyed top-k window; per-group state is k longs (mergeable: "
        "k-smallest of a union ⊆ union of k-smallests — pytest). "
        "operators/countmin.py:kmv_distinct.",
    tags=("sketch", "events", "aggregate"),
)
def sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.countmin import kmv_distinct
    e = table(spark, sf_dir, "events")
    est = kmv_distinct(e, "user_id", ["event_type"], k=64)
    exact = (e.groupBy("event_type")
             .agg(F.countDistinct("user_id").cast("bigint")
                  .alias("exact_distinct")))
    return (est.join(exact, "event_type")
            .select("event_type", "kmv_estimate", "exact_distinct",
                    F.round(F.abs(F.col("kmv_estimate")
                                  - F.col("exact_distinct"))
                            / F.col("exact_distinct"), 4)
                     .alias("rel_err"))
            .orderBy("event_type"))


@register(
    "events_pattern_funnel_ordered",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
             AS path
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN regexp_matches(path, 'v.*c.*p')
                THEN 1 ELSE 0 END) AS BIGINT) AS vcp_ordered,
       CAST(SUM(CASE WHEN regexp_matches(path, 'v.*c')
                THEN 1 ELSE 0 END) AS BIGINT) AS vc_ordered,
       CAST(SUM(CASE WHEN regexp_matches(path, 's[^p]*e')
                THEN 1 ELSE 0 END) AS BIGINT) AS error_after_signup_before_purchase,
       CAST(SUM(CASE WHEN NOT regexp_matches(path, 'v|c|p')
                THEN 1 ELSE 0 END) AS BIGINT) AS never_engaged
FROM seq
""",
    doc="Ordered sequence-pattern funnel (MATCH_RECOGNIZE-style "
        "semantics Spark lacks): each user's journey collapses to an "
        "ordered event-initial string (one string_agg per user — "
        "events are 'signup/view/click/purchase/error', initials are "
        "unambiguous), and funnel stages become REGEXES over the path "
        "— view-then-click-then-purchase IN ORDER, view-then-click, "
        "error after signup with no purchase yet, never-engaged.  "
        "Ordered-ness is what plain per-stage EXISTS funnels "
        "(events_funnel_rates) cannot express.  One user-keyed "
        "aggregate + pure regex projections; path length is a user's "
        "event count (bounded per key, no cross-user state). "
        "plans/events.py:events_pattern_funnel.",
    tags=("events", "pipeline"),
)
def events_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.struct("ts", "event_id",
                         F.substring("event_type", 1, 1).alias("c")))),
            lambda s: s["c"]), "")
    seq = e.groupBy("user_id").agg(path.alias("path"))
    hit = lambda p: F.sum(  # noqa: E731 - local predicate counter
        F.col("path").rlike(p).cast("int")).cast("bigint")
    return seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        hit("v.*c.*p").alias("vcp_ordered"),
        hit("v.*c").alias("vc_ordered"),
        hit("s[^p]*e").alias("error_after_signup_before_purchase"),
        F.sum((~F.col("path").rlike("v|c|p")).cast("int")).cast("bigint")
         .alias("never_engaged"))


@register(
    "events_conversion_latency",
    oracle="""
WITH signup AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT s.user_id,
         CAST(date_diff('second', s.s_ts, MIN(e.ts)) AS BIGINT) AS lat_s
  FROM signup s
  JOIN events e ON e.user_id = s.user_id
               AND e.event_type = 'purchase' AND e.ts > s.s_ts
  GROUP BY s.user_id, s.s_ts
), ranked AS (
  SELECT lat_s,
         ROW_NUMBER() OVER (ORDER BY lat_s, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM conv
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) AS BIGINT)
           AS median_latency_s,
       CAST(MIN(CASE WHEN rn = (n * 9 + 9) // 10 THEN lat_s END)
            AS BIGINT) AS p90_latency_s,
       CAST(SUM(lat_s) AS BIGINT) AS total_latency_s
FROM ranked
""",
    doc="Signup-to-first-purchase conversion latency: per converted "
        "user the seconds from first signup to the first purchase "
        "after it, summarized as DISCRETE median and p90 (the exact "
        "rank element selected by row_number — engines interpolate "
        "continuous percentiles differently, discrete ranks cannot "
        "disagree) plus the exact integer total.  One keyed min per "
        "side, one keyed join, one rank window over "
        "converted-user-cardinality rows. "
        "plans/events.py:events_conversion_latency.",
    tags=("events", "window"),
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    signup = (e.where(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    pur = e.where(F.col("event_type") == "purchase") \
           .select("user_id", F.col("ts").alias("p_ts"))
    conv = (signup.join(pur, "user_id")
            .where(F.col("p_ts") > F.col("s_ts"))
            .groupBy("user_id", "s_ts")
            .agg(F.min("p_ts").alias("p_ts"))
            .select("user_id",
                    (F.unix_timestamp("p_ts") - F.unix_timestamp("s_ts"))
                    .cast("bigint").alias("lat_s")))
    # distributed exact global rank (operators/ranking.py) — the
    # window form would single-partition the converted-user table
    from ..operators.ranking import with_global_rank
    conv = conv.transform(materialize)   # rank + count, one compute
    n_conv = conv.count()
    ranked = (with_global_rank(conv, [F.col("lat_s"), F.col("user_id")],
                               "rn")
              .withColumn("n", F.lit(n_conv).cast("bigint")))
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        F.min(F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2),
                     F.col("lat_s"))).cast("bigint")
         .alias("median_latency_s"),
        F.min(F.when(F.col("rn") == F.floor((F.col("n") * 9 + 9) / 10),
                     F.col("lat_s"))).cast("bigint")
         .alias("p90_latency_s"),
        F.sum("lat_s").cast("bigint").alias("total_latency_s"))


@register(
    "events_ab_test_ztest",
    oracle="""
WITH assigned AS (
  SELECT user_id,
         CASE WHEN CAST(concat('0x', substr(md5('ab|' || CAST(user_id
                   AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases
  FROM events GROUP BY user_id
), arms AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN n_purchases >= 14 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_converted
  FROM assigned GROUP BY arm
), wide AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n_users END) AS n_a,
         MAX(CASE WHEN arm = 'B' THEN n_users END) AS n_b,
         MAX(CASE WHEN arm = 'A' THEN n_converted END) AS conv_a,
         MAX(CASE WHEN arm = 'B' THEN n_converted END) AS conv_b
  FROM arms
)
SELECT n_a, n_b, conv_a, conv_b,
       conv_a / (n_a * 1.0) AS rate_a,
       conv_b / (n_b * 1.0) AS rate_b,
       (conv_a / (n_a * 1.0) - conv_b / (n_b * 1.0))
         / sqrt(((conv_a + conv_b) / ((n_a + n_b) * 1.0))
                * (1.0 - (conv_a + conv_b) / ((n_a + n_b) * 1.0))
                * (1.0 / n_a + 1.0 / n_b)) AS z_score,
       CASE WHEN ABS((conv_a / (n_a * 1.0) - conv_b / (n_b * 1.0))
              / sqrt(((conv_a + conv_b) / ((n_a + n_b) * 1.0))
                     * (1.0 - (conv_a + conv_b) / ((n_a + n_b) * 1.0))
                     * (1.0 / n_a + 1.0 / n_b))) > 1.96
            THEN TRUE ELSE FALSE END AS significant
FROM wide
""",
    doc="Two-proportion z-test A/B experiment readout: users are "
        "deterministically hash-split into arms (md5 parity — the "
        "assignment IS the experiment infrastructure, reproducible "
        "across engines and runs, no stored assignment table), "
        "conversion = 14+ purchase events, and the pooled two-"
        "proportion z-score + 1.96 significance flag come out of ONE "
        "keyed per-user aggregate and a 2-row arm rollup.  Every "
        "float derives from the same four integers through an "
        "identical expression tree, so rates and z are bit-exact "
        "across engines with no rounding.  Scale: per-user partial "
        "aggregate then 2-row state — nothing grows with event "
        "volume. plans/events.py:events_ab_test.",
    tags=("events", "aggregate", "stats"),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"),
                                          F.col("user_id").cast("string"))),
                           1, 15), 16, 10).cast("bigint") % 2 == 0,
        F.lit("A")).otherwise(F.lit("B"))
    assigned = (e.groupBy("user_id")
                .agg(F.sum((F.col("event_type") == "purchase").cast("int"))
                      .cast("bigint").alias("n_purchases"))
                .select(arm.alias("arm"), "n_purchases"))
    arms = (assigned.groupBy("arm")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum((F.col("n_purchases") >= 14).cast("int"))
                  .cast("bigint").alias("n_converted")))
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted")))
         .alias("conv_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted")))
         .alias("conv_b"))
    rate_a = F.col("conv_a") / (F.col("n_a") * F.lit(1.0))
    rate_b = F.col("conv_b") / (F.col("n_b") * F.lit(1.0))
    pooled = ((F.col("conv_a") + F.col("conv_b"))
              / ((F.col("n_a") + F.col("n_b")) * F.lit(1.0)))
    z = ((rate_a - rate_b)
         / F.sqrt(pooled * (F.lit(1.0) - pooled)
                  * (F.lit(1.0) / F.col("n_a")
                     + F.lit(1.0) / F.col("n_b"))))
    return wide.select(
        "n_a", "n_b", "conv_a", "conv_b",
        rate_a.alias("rate_a"), rate_b.alias("rate_b"),
        z.alias("z_score"),
        F.when(F.abs(z) > 1.96, F.lit(True)).otherwise(F.lit(False))
         .alias("significant"))


@register(
    "sketch_kmv_intersection",
    oracle="""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5('kmv|' || CAST(user_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
  FROM events
), topk AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), sk AS (
  SELECT event_type, h FROM topk WHERE rn <= 64
), theta AS (
  SELECT event_type,
         CASE WHEN CAST(COUNT(*) AS BIGINT) < 64
              THEN 1152921504606846976 ELSE MAX(h) END AS th
  FROM sk GROUP BY event_type
), pairs(type_a, type_b) AS (
  VALUES ('click', 'purchase'), ('error', 'purchase'), ('view', 'signup')
), est AS (
  SELECT p.type_a, p.type_b, LEAST(ta.th, tb.th) AS th,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sk a JOIN sk b ON a.h = b.h
           WHERE a.event_type = p.type_a AND b.event_type = p.type_b
             AND a.h < LEAST(ta.th, tb.th)) AS n_common
  FROM pairs p
  JOIN theta ta ON ta.event_type = p.type_a
  JOIN theta tb ON tb.event_type = p.type_b
), ex AS (
  SELECT p.type_a, p.type_b,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM
            (SELECT DISTINCT user_id FROM events
              WHERE event_type = p.type_a
             INTERSECT
             SELECT DISTINCT user_id FROM events
              WHERE event_type = p.type_b)) AS exact_intersection
  FROM pairs p
)
SELECT e.type_a, e.type_b,
       CAST(ROUND(n_common * (1152921504606846976.0 / th)) AS BIGINT)
           AS kmv_inter_estimate,
       exact_intersection,
       ROUND(ABS(CAST(ROUND(n_common * (1152921504606846976.0 / th))
                      AS BIGINT) - exact_intersection) * 1.0
             / exact_intersection, 4) AS rel_err
FROM est e JOIN ex ON e.type_a = ex.type_a AND e.type_b = ex.type_b
ORDER BY e.type_a, e.type_b
""",
    doc="Theta-style KMV sketch INTERSECTION: |users(a) AND users(b)| "
        "estimated from the two per-type k=64 KMV sketches alone — "
        "theta = min of the sides' thresholds (2^60 when a side is "
        "exact), count common hashes below theta, scale by 2^60/theta "
        "(the one formula covers the exact regime too: theta=2^60 "
        "makes it the plain common count).  THE reason sketches beat "
        "exact distinct at 100 TB: set operations compose on k-long "
        "states without ever re-touching the corpus, and the exact "
        "twin beside it shows the error honestly.  Deterministic md5 "
        "integer arithmetic end-to-end, so the estimate itself "
        "hash-matches across engines. "
        "operators/countmin.py:kmv_intersect_pairs.",
    tags=("sketch", "events", "aggregate"),
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.countmin import kmv_intersect_pairs
    e = table(spark, sf_dir, "events")
    pairs = [("click", "purchase"), ("error", "purchase"),
             ("view", "signup")]
    est = kmv_intersect_pairs(e, "user_id", "event_type", pairs, k=64)
    ua = e.select(F.col("event_type").alias("type_a"),
                  F.col("user_id")).distinct()
    ub = e.select(F.col("event_type").alias("type_b"),
                  F.col("user_id")).distinct()
    pdf = spark.createDataFrame(pairs, "type_a string, type_b string")
    exact = (pdf.join(ua, "type_a").join(ub, ["type_b", "user_id"])
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).cast("bigint")
                  .alias("exact_intersection")))
    return (est.join(exact, ["type_a", "type_b"])
            .select("type_a", "type_b", "kmv_inter_estimate",
                    "exact_intersection",
                    F.round(F.abs(F.col("kmv_inter_estimate")
                                  - F.col("exact_intersection"))
                            / F.col("exact_intersection"), 4)
                     .alias("rel_err"))
            .orderBy("type_a", "type_b"))


@register(
    "events_ewma_daily",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list(CAST(n_events AS DOUBLE) ORDER BY day) AS cnts,
         list(n_events ORDER BY day) AS raw
  FROM daily GROUP BY event_type
), smoothed AS (
  SELECT event_type, days, raw,
         list_transform(generate_series(1, len(cnts)), i ->
           list_reduce(list_prepend(0.0, list_slice(cnts, 1, i)),
                       (acc, x) -> acc * 0.7 + x * 0.3)) AS ewmas
  FROM series
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events, ewma
FROM (
  SELECT event_type,
         unnest(days) AS day,
         unnest(raw) AS n_events,
         unnest(ewmas) AS ewma
  FROM smoothed
)
ORDER BY event_type, day
""",
    doc="Daily-volume EWMA smoothing per event type (alpha = 0.3, "
        "zero-initialized: s_i = 0.3*x_i + 0.7*s_{i-1}) — the "
        "telemetry baseline every alerting rule compares against, as "
        "a per-bucket smoothed SERIES, not just the final value.  "
        "EWMA is inherently sequential, so each bucket's value is a "
        "deterministic left FOLD over its ordered prefix — the ONE "
        "float-summation shape both engines spell identically "
        "(the shared zero-prepended-reduce recipe), making the whole "
        "smoothed series bit-exact with no rounding.  Scale: state is "
        "bucket-cardinality per key (30 days here), never event-"
        "cardinality — the corpus collapses to (key, day, count) in "
        "one partial-aggregable pass and the O(n²) prefix folds run "
        "on that tiny series JVM-side. plans/events.py:events_ewma.",
    tags=("events", "window"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    series = (daily.groupBy("event_type")
              .agg(F.array_sort(F.collect_list(
                  F.struct("day", "n_events"))).alias("dc"))
              .select("event_type",
                      F.transform("dc", lambda s: s.day).alias("days"),
                      F.transform("dc", lambda s: s.n_events
                                  .cast("double")).alias("cnts"),
                      F.transform("dc", lambda s: s.n_events)
                       .alias("raw")))
    ewmas = F.transform(
        F.sequence(F.lit(1), F.size("cnts")),
        lambda i: F.aggregate(F.slice(F.col("cnts"), F.lit(1), i),
                              F.lit(0.0),
                              lambda acc, x: acc * 0.7 + x * 0.3))
    rows = (series.withColumn("ewmas", ewmas)
            .select("event_type",
                    F.posexplode(F.arrays_zip("days", "raw", "ewmas"))
                    .alias("_i", "z")))
    return (rows.select("event_type",
                        F.col("z.days").alias("day"),
                        F.col("z.raw").cast("bigint").alias("n_events"),
                        F.col("z.ewmas").alias("ewma"))
            .orderBy("event_type", "day"))


@register(
    "events_ab_test_welch",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN CAST(concat('0x', substr(md5('ab|' || CAST(user_id
                   AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY user_id
), arms AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS DOUBLE) AS s2
  FROM per_user GROUP BY arm
), wide AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
         MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
         MAX(CASE WHEN arm = 'A' THEN s1 END) AS s1_a,
         MAX(CASE WHEN arm = 'B' THEN s1 END) AS s1_b,
         MAX(CASE WHEN arm = 'A' THEN s2 END) AS s2_a,
         MAX(CASE WHEN arm = 'B' THEN s2 END) AS s2_b
  FROM arms
), stats AS (
  SELECT n_a, n_b,
         s1_a / (n_a * 1.0) AS mean_a,
         s1_b / (n_b * 1.0) AS mean_b,
         (s2_a - (s1_a / (n_a * 1.0)) * s1_a) / ((n_a - 1) * 1.0) AS var_a,
         (s2_b - (s1_b / (n_b * 1.0)) * s1_b) / ((n_b - 1) * 1.0) AS var_b
  FROM wide
)
SELECT n_a, n_b, mean_a AS mean_a_centi, mean_b AS mean_b_centi,
       (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t_stat,
       (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
         / ((var_a / n_a) * (var_a / n_a) / (n_a - 1.0)
            + (var_b / n_b) * (var_b / n_b) / (n_b - 1.0)) AS welch_df,
       CASE WHEN ABS((mean_a - mean_b)
                     / sqrt(var_a / n_a + var_b / n_b)) > 1.96
            THEN TRUE ELSE FALSE END AS significant
FROM stats
""",
    doc="Welch unequal-variance t-test on a CONTINUOUS A/B metric "
        "(per-user total purchase value), the companion of the "
        "two-proportion z entry: same md5-parity arm assignment, "
        "per-user values folded to exact integer centi-units so the "
        "arm sums are order-independent, then mean/variance/t and the "
        "Welch-Satterthwaite df all derive from the same five exact "
        "numbers through identical expression trees — bit-exact with "
        "zero rounding.  The BINDING exactness accumulator is s2 = "
        "SUM(x²), which grows quadratically with the metric: measured "
        "s2 totals are 6.8e11 at sf0.01 and 7.57e12 at sf0.1 (~1189x "
        "below 2^53), and each addend x² <= (1.85e5)² = 3.4e10 is "
        "itself exactly representable — so every partial sum is an "
        "exact integer in DOUBLE and the summation is order-"
        "independent (the linear s1, at 9.95e7, is nowhere near "
        "binding).  tests/test_operators.py::"
        "test_welch_s2_exactness_margin re-measures both margins in "
        "exact HUGEINT and fails if scale growth eats them; shrink the "
        "centi-unit if the metric ever grows two orders.  Scale: one "
        "per-user partial agg, then 2-row state. "
        "plans/events.py:events_welch.",
    tags=("events", "aggregate", "stats"),
)
def events_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"),
                                          F.col("user_id").cast("string"))),
                           1, 15), 16, 10).cast("bigint") % 2 == 0,
        F.lit("A")).otherwise(F.lit("B"))
    xi = F.when(F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")) \
          .otherwise(F.lit(0).cast("bigint"))
    per_user = (e.groupBy("user_id")
                .agg(F.sum(xi).cast("bigint").alias("x"))
                .select(arm.alias("arm"), "x"))
    arms = (per_user.groupBy("arm")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("x").cast("bigint").alias("s1"),
                 F.sum(F.col("x").cast("double")
                       * F.col("x").cast("double")).alias("s2")))
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "A", F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("arm") == "B", F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("arm") == "A", F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("arm") == "B", F.col("s2"))).alias("s2_b"))
    mean_a = F.col("s1_a") / (F.col("n_a") * F.lit(1.0))
    mean_b = F.col("s1_b") / (F.col("n_b") * F.lit(1.0))
    var_a = ((F.col("s2_a") - mean_a * F.col("s1_a"))
             / ((F.col("n_a") - 1) * F.lit(1.0)))
    var_b = ((F.col("s2_b") - mean_b * F.col("s1_b"))
             / ((F.col("n_b") - 1) * F.lit(1.0)))
    se2 = var_a / F.col("n_a") + var_b / F.col("n_b")
    t = (mean_a - mean_b) / F.sqrt(se2)
    df = (se2 * se2
          / ((var_a / F.col("n_a")) * (var_a / F.col("n_a"))
             / (F.col("n_a") - F.lit(1.0))
             + (var_b / F.col("n_b")) * (var_b / F.col("n_b"))
             / (F.col("n_b") - F.lit(1.0))))
    return wide.select(
        "n_a", "n_b",
        mean_a.alias("mean_a_centi"), mean_b.alias("mean_b_centi"),
        t.alias("t_stat"), df.alias("welch_df"),
        F.when(F.abs(t) > 1.96, F.lit(True)).otherwise(F.lit(False))
         .alias("significant"))


@register(
    "events_seasonal_naive_mase",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS t0,
         date_trunc('hour', MAX(ts)) AS t1
  FROM events
), spine AS (
  SELECT t.event_type, s.h
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS h
        FROM bounds) s
), cnt AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), series AS (
  SELECT sp.event_type, sp.h, COALESCE(c.c, 0) AS x,
         ROW_NUMBER() OVER (PARTITION BY sp.event_type
                            ORDER BY sp.h) AS rn,
         LAG(COALESCE(c.c, 0), 24) OVER (PARTITION BY sp.event_type
                                         ORDER BY sp.h) AS x24,
         LAG(COALESCE(c.c, 0), 1) OVER (PARTITION BY sp.event_type
                                        ORDER BY sp.h) AS x1
  FROM spine sp LEFT JOIN cnt c
    ON c.event_type = sp.event_type AND c.h = sp.h
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval_buckets,
       CAST(SUM(ABS(x - x24)) AS BIGINT) AS sum_abs_err_seasonal,
       CAST(SUM(ABS(x - x1)) AS BIGINT) AS sum_abs_err_naive1,
       SUM(ABS(x - x24)) / (SUM(ABS(x - x1)) * 1.0) AS mase
FROM series
WHERE rn > 24
GROUP BY event_type
ORDER BY event_type
""",
    doc="Seasonal-naive forecast error (MASE, Hyndman-Koehler): "
        "predict each hour's volume by the SAME HOUR YESTERDAY, scale "
        "its MAE by the one-step naive baseline's — the standard "
        "'is there even daily seasonality worth modeling' gate run "
        "before any real forecaster, and the denominator convention "
        "that makes error comparable across series of different "
        "volume.  Counts land on a COMPLETE hourly spine (missing "
        "hours are real zeros — lagging over existing rows only "
        "would silently misalign the season); both lags are one "
        "window pass; absolute errors are exact integers, so MASE is "
        "a ratio of identical sums.  Scale: state is spine-"
        "cardinality per key, one shuffle. "
        "plans/events.py:events_mase.",
    tags=("events", "window", "stats"),
)
def events_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"))
    hours = bounds.select(F.explode(F.sequence(
        "t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(hours))
    cnt = (e.groupBy("event_type",
                     F.date_trunc("hour", F.col("ts")).alias("h"))
           .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    series = (spine.join(cnt, ["event_type", "h"], "left")
              .select("event_type", "h",
                      F.coalesce(F.col("c"), F.lit(0)).alias("x")))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = (series
              .withColumn("rn", F.row_number().over(w))
              .withColumn("x24", F.lag("x", 24).over(w))
              .withColumn("x1", F.lag("x", 1).over(w))
              .where(F.col("rn") > 24))
    return (lagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_buckets"),
                 F.sum(F.abs(F.col("x") - F.col("x24"))).cast("bigint")
                  .alias("sum_abs_err_seasonal"),
                 F.sum(F.abs(F.col("x") - F.col("x1"))).cast("bigint")
                  .alias("sum_abs_err_naive1"),
                 (F.sum(F.abs(F.col("x") - F.col("x24")))
                  / (F.sum(F.abs(F.col("x") - F.col("x1")))
                     * F.lit(1.0))).alias("mase"))
            .orderBy("event_type"))


@register(
    "events_funnel_within_window",
    oracle="""
WITH v AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'view'),
c AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'),
vc2 AS (
  -- greedy reduction (provably equivalent to the EXISTS-triple form):
  -- the EARLIEST click after a view maximizes the remaining purchase
  -- window, so a chain exists iff one exists through cstar.  Ranges
  -- live in WHERE, not ON: the user-equality hash join + filter shape
  -- runs in 0.3 s where the inequality-join classification took 247 s.
  SELECT v.user_id, v.t AS tv, MIN(c.t) AS cstar
  FROM v JOIN c ON c.user_id = v.user_id
  WHERE c.t > v.t AND c.t <= v.t + 3600000000
  GROUP BY v.user_id, v.t
), vcp AS (
  SELECT DISTINCT vc2.user_id
  FROM vc2 JOIN p ON p.user_id = vc2.user_id
  WHERE p.t > vc2.cstar AND p.t <= vc2.tv + 3600000000
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT DISTINCT user_id FROM v)) AS n_users_view,
       (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT DISTINCT user_id FROM vc2)) AS n_users_vc_1h,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM vcp) AS n_users_vcp_1h,
       (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM vc2)) * 1.0
         / (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM v))
           AS rate_vc,
       (SELECT COUNT(*) FROM vcp) * 1.0
         / (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM v))
           AS rate_vcp
""",
    doc="TIME-CONSTRAINED ordered funnel: view → click → purchase "
        "where the whole chain completes within ONE HOUR of the view "
        "— the conversion question product teams actually ask (the "
        "unconstrained pattern-funnel entry counts a purchase weeks "
        "later as converted; this one does not).  Expressed as "
        "user-keyed interval joins — EXISTS a (v,c,p) triple with "
        "tv < tc <= tv+1h and tc < tp <= tv+1h — which no regex over "
        "event-initial strings can encode (MATCH_RECOGNIZE-with-"
        "MEASURES territory).  Per-user stage volumes are bounded "
        "(events per user per type), so the triple join is user-"
        "keyed and partial; counts and rates are exact integers and "
        "their ratios. plans/events.py:events_funnel_window.",
    tags=("events", "window"),
)
def events_funnel_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    v = (e.where(F.col("event_type") == "view")
         .select("user_id", F.col("ts").alias("tv")))
    c = (e.where(F.col("event_type") == "click")
         .select(F.col("user_id").alias("cu"), F.col("ts").alias("tc")))
    p = (e.where(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("pu"), F.col("ts").alias("tp")))
    vu = v.select("user_id").distinct() \
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_view"))
    vc_join = v.join(c, (F.col("cu") == F.col("user_id"))
                     & (F.col("tc") > F.col("tv"))
                     & (F.col("tc") <= F.col("tv") + hour))
    vc = (vc_join.select("user_id").distinct()
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_vc_1h")))
    vcp = (vc_join
           .join(p, (F.col("pu") == F.col("user_id"))
                 & (F.col("tp") > F.col("tc"))
                 & (F.col("tp") <= F.col("tv") + hour))
           .select("user_id").distinct()
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_users_vcp_1h")))
    return (vu.crossJoin(vc).crossJoin(vcp)
            .select("n_users_view", "n_users_vc_1h", "n_users_vcp_1h",
                    (F.col("n_users_vc_1h") * F.lit(1.0)
                     / F.col("n_users_view")).alias("rate_vc"),
                    (F.col("n_users_vcp_1h") * F.lit(1.0)
                     / F.col("n_users_view")).alias("rate_vcp")))


@register(
    "events_intervisit_gap_histogram",
    oracle="""
WITH gaps AS (
  SELECT CAST(date_diff('second',
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
              ts) AS BIGINT) AS gap_s
  FROM events
), binned AS (
  SELECT CASE WHEN gap_s < 60 THEN '00_under_1m'
              WHEN gap_s < 300 THEN '01_1m_5m'
              WHEN gap_s < 1800 THEN '02_5m_30m'
              WHEN gap_s < 3600 THEN '03_30m_1h'
              WHEN gap_s < 14400 THEN '04_1h_4h'
              WHEN gap_s < 86400 THEN '05_4h_1d'
              ELSE '06_over_1d' END AS bin
  FROM gaps WHERE gap_s IS NOT NULL
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       COUNT(*) / (SELECT COUNT(*) * 1.0 FROM binned) AS share
FROM binned
GROUP BY bin
ORDER BY bin
""",
    doc="Inter-event gap distribution per user (fixed integer-second "
        "bands from under-a-minute to over-a-day) — the DATA-DRIVEN "
        "basis for the session-window gap parameter: the 30-minute "
        "gap every sessionization entry hard-codes should sit in a "
        "valley of THIS histogram, and the histogram is how you check "
        "(bands are explicit CASE ranges, not log2 — transcendental "
        "binning is not bit-specified across engines).  One LAG pass "
        "over (user, time)-sorted events, exact integer gaps and "
        "counts; shares are ratios of identical integers. "
        "plans/events.py:events_gap_histogram.",
    tags=("events", "window", "diagnostics"),
)
def events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (e.select((F.unix_timestamp("ts")
                      - F.unix_timestamp(F.lag("ts").over(w)))
                     .cast("bigint").alias("gap_s"))
            .where(F.col("gap_s").isNotNull()))
    bin_col = (F.when(F.col("gap_s") < 60, "00_under_1m")
               .when(F.col("gap_s") < 300, "01_1m_5m")
               .when(F.col("gap_s") < 1800, "02_5m_30m")
               .when(F.col("gap_s") < 3600, "03_30m_1h")
               .when(F.col("gap_s") < 14400, "04_1h_4h")
               .when(F.col("gap_s") < 86400, "05_4h_1d")
               .otherwise("06_over_1d"))
    binned = gaps.select(bin_col.alias("bin")).transform(materialize)
    total = binned.agg(F.count(F.lit(1)).alias("__n"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
            .crossJoin(F.broadcast(total))
            .select("bin", "n_gaps",
                    (F.col("n_gaps") / (F.col("__n") * F.lit(1.0)))
                    .alias("share"))
            .orderBy("bin"))


@register(
    "events_new_vs_returning",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
), daily AS (
  SELECT CAST(e.ts AS DATE) AS day, e.user_id,
         MIN(CASE WHEN CAST(e.ts AS DATE) = f.first_day
             THEN 1 ELSE 0 END) AS is_new
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  GROUP BY CAST(e.ts AS DATE), e.user_id
)
SELECT CAST(day AS VARCHAR) AS day,
       CAST(SUM(is_new) AS BIGINT) AS new_users,
       CAST(SUM(1 - is_new) AS BIGINT) AS returning_users,
       SUM(1 - is_new) / (COUNT(*) * 1.0) AS returning_share
FROM daily
GROUP BY day
ORDER BY day
""",
    doc="Daily NEW vs RETURNING active-user split (a user is new on "
        "exactly their first-seen day) — the growth-accounting "
        "decomposition under every DAU chart: the same DAU can be a "
        "healthy retained base or a leaky bucket of one-day users, "
        "and only this split tells them apart.  First-seen is one "
        "keyed MIN (never an expanding-window DISTINCT state — the "
        "same first-touch shape as the cumulative-uniques entry); "
        "the day classification is a broadcast-sized join back.  "
        "Exact integer counts; shares are ratios of identical "
        "integers. plans/events.py:events_new_returning.",
    tags=("events", "aggregate"),
)
def events_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    first_seen = (e.groupBy("user_id")
                  .agg(F.min(F.col("ts").cast("date")).alias("first_day")))
    daily = (e.select(F.col("ts").cast("date").alias("day"), "user_id")
             .join(first_seen, "user_id")
             .groupBy("day", "user_id")
             .agg(F.min(F.when(F.col("day") == F.col("first_day"), 1)
                        .otherwise(0)).alias("is_new")))
    return (daily.groupBy("day")
            .agg(F.sum("is_new").cast("bigint").alias("new_users"),
                 F.sum(1 - F.col("is_new")).cast("bigint")
                  .alias("returning_users"),
                 (F.sum(1 - F.col("is_new"))
                  / (F.count(F.lit(1)) * F.lit(1.0)))
                 .alias("returning_share"))
            .select(F.col("day").cast("string").alias("day"),
                    "new_users", "returning_users", "returning_share")
            .orderBy("day"))


@register(
    "events_rfm_segmentation",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MAX(ts) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS monetary_centi
  FROM events GROUP BY user_id
), scored AS (
  SELECT user_id, monetary_centi,
         CAST(NTILE(4) OVER (ORDER BY last_ts DESC, user_id) AS INT)
             AS r_score,
         CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS INT)
             AS f_score,
         CAST(NTILE(4) OVER (ORDER BY monetary_centi DESC, user_id) AS INT)
             AS m_score
  FROM per_user
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(monetary_centi) AS BIGINT) AS monetary_centi_total
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
""",
    doc="RFM segmentation (the classic CRM quartile grid): per user, "
        "recency = latest event time, frequency = event count, "
        "monetary = exact centi-unit purchase total; each dimension "
        "scored 1-4 by NTILE(4) with a user_id tie-break (NTILE's "
        "floor-division distribution is SQL-standard and identical in "
        "Spark and DuckDB, and the unique ordering makes every "
        "assignment deterministic), then the 64-cell segment grid with "
        "user counts and exact monetary totals.  Scale: one per-user "
        "partial agg, then three DISTRIBUTED exact NTILEs "
        "(operators/ranking.py: range-partition + parallel local ranks "
        "+ broadcast offsets — bit-identical to the window form, which "
        "would single-partition the user table). "
        "plans/events.py:events_rfm.",
    tags=("events", "aggregate"),
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import distributed_ntile
    e = table(spark, sf_dir, "events")
    xi = F.when(F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")) \
          .otherwise(F.lit(0).cast("bigint"))
    per_user = (e.groupBy("user_id")
                .agg(F.max("ts").alias("last_ts"),
                     F.count(F.lit(1)).cast("bigint").alias("freq"),
                     F.sum(xi).cast("bigint").alias("monetary_centi"))
                .transform(materialize))  # feeds three rankings
    # Three DISTRIBUTED exact NTILEs (operators/ranking.py): a global
    # window would single-partition the user table; the range-partition
    # + offset form keeps every sort parallel and is bit-identical.
    scored = distributed_ntile(
        per_user, [F.col("last_ts").desc(), F.col("user_id")], 4,
        "r_score")
    scored = distributed_ntile(
        scored, [F.col("freq").desc(), F.col("user_id")], 4, "f_score")
    scored = distributed_ntile(
        scored, [F.col("monetary_centi").desc(), F.col("user_id")], 4,
        "m_score")
    scored = scored.select("monetary_centi", "r_score", "f_score",
                           "m_score")
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("monetary_centi").cast("bigint")
                  .alias("monetary_centi_total"))
            .orderBy("r_score", "f_score", "m_score"))


@register(
    "events_holt_linear",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list(CAST(n_events AS DOUBLE) ORDER BY day) AS cnts,
         list(n_events ORDER BY day) AS raw
  FROM daily GROUP BY event_type
), smoothed AS (
  SELECT event_type, days, raw,
         list_transform(generate_series(1, len(cnts)), i ->
           list_reduce(
             list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
               list_transform(list_slice(cnts, 1, i),
                              x -> [x, CAST(0.0 AS DOUBLE)])),
             (acc, e) -> [
               e[1] * 0.3 + (acc[1] + acc[2]) * 0.7,
               ((e[1] * 0.3 + (acc[1] + acc[2]) * 0.7) - acc[1]) * 0.2
               + acc[2] * 0.8])) AS st
  FROM series
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       lvl AS level, trend
FROM (
  SELECT event_type,
         unnest(days) AS day,
         unnest(raw) AS n_events,
         unnest(list_transform(st, s -> s[1])) AS lvl,
         unnest(list_transform(st, s -> s[2])) AS trend
  FROM smoothed
)
ORDER BY event_type, day
""",
    doc="Holt linear-trend double exponential smoothing per event type "
        "(alpha = 0.3 level, beta = 0.2 trend, zero-initialized): "
        "l_t = 0.3 x_t + 0.7 (l + b), b_t = 0.2 (l_t - l) + 0.8 b — "
        "the trend-aware upgrade of the EWMA baseline that alerting "
        "uses when volume has a slope (EWMA lags a ramp by design).  "
        "Sequential by nature, so each day's (level, trend) is a left "
        "fold over the ordered prefix with a STRUCT accumulator; the "
        "update expression — including l_t inlined twice in the trend "
        "term — is spelled identically in both engines, so the whole "
        "series is bit-exact with zero rounding (the same shared-fold "
        "recipe as events_ewma_daily, extended to 2-component state).  "
        "The oracle's accumulator is a 2-element LIST, not a struct: "
        "DuckDB 1.0.0's list_reduce mutates a STRUCT accumulator "
        "field-by-field (a later field's acc.l sees the new value — "
        "pinned by tests/test_operators.py::"
        "test_duckdb_struct_fold_hazard), while list accumulators fold "
        "honestly.  "
        "Scale: state is bucket-cardinality per key (30 days), never "
        "event-cardinality; the O(n²) prefix folds run JVM-side on the "
        "collapsed (key, day, count) series. "
        "plans/events.py:events_holt.",
    tags=("events", "window"),
)
def events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    series = (daily.groupBy("event_type")
              .agg(F.array_sort(F.collect_list(
                  F.struct("day", "n_events"))).alias("dc"))
              .select("event_type",
                      F.transform("dc", lambda s: s.day).alias("days"),
                      F.transform("dc", lambda s: s.n_events
                                  .cast("double")).alias("cnts"),
                      F.transform("dc", lambda s: s.n_events)
                       .alias("raw")))

    def step(acc, x):
        lvl = x * F.lit(0.3) + (acc.getField("l") + acc.getField("b")) \
            * F.lit(0.7)
        lvl2 = x * F.lit(0.3) + (acc.getField("l") + acc.getField("b")) \
            * F.lit(0.7)          # l_t inlined twice, same tree as oracle
        trend = (lvl2 - acc.getField("l")) * F.lit(0.2) \
            + acc.getField("b") * F.lit(0.8)
        return F.struct(lvl.alias("l"), trend.alias("b"))

    st = F.transform(
        F.sequence(F.lit(1), F.size("cnts")),
        lambda i: F.aggregate(
            F.slice(F.col("cnts"), F.lit(1), i),
            F.struct(F.lit(0.0).alias("l"), F.lit(0.0).alias("b")),
            step))
    rows = (series.withColumn("lvls",
                              F.transform(st, lambda s: s.getField("l")))
            .withColumn("trends",
                        F.transform(st, lambda s: s.getField("b")))
            .select("event_type",
                    F.posexplode(F.arrays_zip("days", "raw",
                                              "lvls", "trends"))
                    .alias("_i", "z")))
    return (rows.select("event_type",
                        F.col("z.days").alias("day"),
                        F.col("z.raw").cast("bigint").alias("n_events"),
                        F.col("z.lvls").alias("level"),
                        F.col("z.trends").alias("trend"))
            .orderBy("event_type", "day"))


@register(
    "events_changepoint_cusum",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list(n_events ORDER BY day) AS raw
  FROM daily GROUP BY event_type
), base AS (
  SELECT event_type, days, raw,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                                  list_slice(raw, 1, 7)),
                     (acc, x) -> acc + x) AS sum7
  FROM series
), folded AS (
  SELECT event_type, days, raw, sum7,
         list_transform(generate_series(1, len(raw)), i ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    list_slice(raw, 1, i)),
             (acc, x) -> greatest(CAST(0 AS BIGINT),
                                  acc + 7 * x - sum7 - sum7 // 2)))
           AS cusums
  FROM base
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
       cusum_scaled > 3 * sum7 AS alarm
FROM (
  SELECT event_type, sum7,
         unnest(days) AS day,
         unnest(raw) AS n_events,
         unnest(cusums) AS cusum_scaled
  FROM folded
)
ORDER BY event_type, day
""",
    doc="One-sided CUSUM changepoint detection on daily volumes per "
        "event type, in EXACT integer arithmetic: baseline = first-"
        "7-day total (sum7), everything scaled by 7 so the target "
        "mean never becomes a fraction — s_t = max(0, s_{t-1} + 7·x_t "
        "− sum7 − sum7//2) with allowance half a baseline mean, alarm "
        "when s exceeds 3 baseline-days of drift.  The page-one "
        "upward-shift detector behind burn-rate alerting, as a per-day "
        "SERIES with the running statistic exposed (the analyst needs "
        "the trajectory, not just the flag).  Same shared prefix-fold "
        "recipe as EWMA/Holt but entirely on BIGINTs — max(0,·) folds "
        "are order-sensitive and integer state makes bit-exactness "
        "unconditional.  Scale: state is bucket-cardinality per key; "
        "folds run JVM-side on the collapsed series. "
        "plans/events.py:events_cusum.",
    tags=("events", "window"),
)
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    series = (daily.groupBy("event_type")
              .agg(F.array_sort(F.collect_list(
                  F.struct("day", "n_events"))).alias("dc"))
              .select("event_type",
                      F.transform("dc", lambda s: s.day).alias("days"),
                      F.transform("dc", lambda s: s.n_events)
                       .alias("raw")))
    zero = F.lit(0).cast("bigint")
    sum7 = F.aggregate(F.slice(F.col("raw"), 1, 7), zero,
                       lambda acc, x: acc + x)
    base = series.withColumn("sum7", sum7)
    cusums = F.transform(
        F.sequence(F.lit(1), F.size("raw")),
        lambda i: F.aggregate(
            F.slice(F.col("raw"), F.lit(1), i), zero,
            lambda acc, x: F.greatest(
                zero,
                acc + F.lit(7) * x - F.col("sum7")
                - F.expr("sum7 div 2"))))
    rows = (base.withColumn("cusums", cusums)
            .select("event_type", "sum7",
                    F.posexplode(F.arrays_zip("days", "raw", "cusums"))
                    .alias("_i", "z")))
    return (rows.select("event_type",
                        F.col("z.days").alias("day"),
                        F.col("z.raw").cast("bigint").alias("n_events"),
                        F.col("z.cusums").cast("bigint")
                         .alias("cusum_scaled"),
                        (F.col("z.cusums") > F.lit(3) * F.col("sum7"))
                        .alias("alarm"))
            .orderBy("event_type", "day"))


@register(
    "events_diff_in_diff",
    oracle="""
WITH per_cell AS (
  SELECT CASE WHEN CAST(concat('0x', substr(md5('ab|' || CAST(user_id
                    AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
              THEN 'before' ELSE 'after' END AS period,
         user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x
  FROM events GROUP BY 1, 2, user_id
), cells AS (
  SELECT arm, period,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM per_cell GROUP BY arm, period
), wide AS (
  SELECT MAX(CASE WHEN arm = 'A' AND period = 'before' THEN s END)
             * 1.0 / MAX(CASE WHEN arm = 'A' AND period = 'before'
                              THEN n END) AS a_before,
         MAX(CASE WHEN arm = 'A' AND period = 'after' THEN s END)
             * 1.0 / MAX(CASE WHEN arm = 'A' AND period = 'after'
                              THEN n END) AS a_after,
         MAX(CASE WHEN arm = 'B' AND period = 'before' THEN s END)
             * 1.0 / MAX(CASE WHEN arm = 'B' AND period = 'before'
                              THEN n END) AS b_before,
         MAX(CASE WHEN arm = 'B' AND period = 'after' THEN s END)
             * 1.0 / MAX(CASE WHEN arm = 'B' AND period = 'after'
                              THEN n END) AS b_after
  FROM cells
)
SELECT a_before, a_after, b_before, b_after,
       (b_after - b_before) - (a_after - a_before) AS did_estimate
FROM wide
""",
    doc="Difference-in-differences readout on the A/B fixture: md5-"
        "parity arms x before/after Jan 16 periods, cell means of "
        "per-user-period purchase totals in exact integer centi-units, "
        "DiD = (B_after - B_before) - (A_after - A_before) — the "
        "quasi-experimental companion of the z/Welch entries for when "
        "assignment isn't randomized per-exposure and a parallel-"
        "trends baseline must be differenced out.  Every mean is one "
        "division of two exact integers and the estimate one "
        "expression over the four — bit-exact, zero rounding.  Scale: "
        "one per-(user, period) partial agg then 4-row state. "
        "plans/events.py:events_did.",
    tags=("events", "aggregate", "stats"),
)
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"),
                                          F.col("user_id").cast("string"))),
                           1, 15), 16, 10).cast("bigint") % 2 == 0,
        F.lit("A")).otherwise(F.lit("B"))
    period = F.when(F.col("ts").cast("date") < F.lit("2024-01-16")
                    .cast("date"), F.lit("before")).otherwise(F.lit("after"))
    xi = F.when(F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")) \
          .otherwise(F.lit(0).cast("bigint"))
    per_cell = (e.groupBy(arm.alias("arm"), period.alias("period"),
                          "user_id")
                .agg(F.sum(xi).cast("bigint").alias("x")))
    cells = (per_cell.groupBy("arm", "period")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                  F.sum("x").cast("bigint").alias("s")))

    def cell(a, p):
        cond = (F.col("arm") == a) & (F.col("period") == p)
        return (F.max(F.when(cond, F.col("s"))) * F.lit(1.0)
                / F.max(F.when(cond, F.col("n"))))

    wide = cells.agg(cell("A", "before").alias("a_before"),
                     cell("A", "after").alias("a_after"),
                     cell("B", "before").alias("b_before"),
                     cell("B", "after").alias("b_after"))
    return wide.select(
        "a_before", "a_after", "b_before", "b_after",
        ((F.col("b_after") - F.col("b_before"))
         - (F.col("a_after") - F.col("a_before"))).alias("did_estimate"))


@register(
    "events_survival_km",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(ts) AS first_ts,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_p
  FROM events GROUP BY user_id
), horizon AS (SELECT MAX(ts) AS h FROM events),
obs AS (
  SELECT user_id,
         CASE WHEN first_p IS NOT NULL
              THEN CAST(floor((floor(epoch(first_p))
                               - floor(epoch(first_ts))) / 3600)
                        AS BIGINT)
              ELSE CAST(floor((floor(epoch((SELECT h FROM horizon)))
                               - floor(epoch(first_ts))) / 3600)
                        AS BIGINT) END AS t,
         CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS converted
  FROM per_user
), by_t AS (
  SELECT t,
         CAST(SUM(converted) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM obs GROUP BY t
), risk AS (
  SELECT t, d,
         CAST(SUM(leaving) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
  FROM by_t
), ordered AS (
  SELECT t, d, n_risk,
         list(1.0 - CAST(d AS DOUBLE) / n_risk)
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS factors
  FROM risk
)
SELECT CAST(t AS BIGINT) AS t_hours, d AS n_converted, n_risk,
       list_reduce(list_prepend(1.0, factors), (acc, x) -> acc * x)
           AS survival
FROM ordered
WHERE d > 0
ORDER BY t_hours
""",
    doc="Kaplan-Meier time-to-first-purchase curve in hours since a "
        "user's first event, with users who never purchase CENSORED at "
        "the corpus horizon — the estimator that makes censored "
        "conversion data honest where a naive mean time-to-convert is "
        "biased low.  S(t) = Π_{i<=t} (1 − d_i/n_i): d_i exact "
        "conversion counts, n_i the exact at-risk set (reverse "
        "cumulative sum including censored exits), the product a left "
        "fold over ordered factors (the shared EWMA/Holt fold recipe "
        "applied to multiplication) — the whole curve bit-exact across "
        "engines.  Emitted at event times only (d > 0), KM convention. "
        "Scale: the corpus collapses to one row per distinct hour in "
        "one partial agg; folds run on that small series. "
        "plans/events.py:events_km.",
    tags=("events", "stats"),
)
def events_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.min("ts").alias("first_ts"),
                     F.min(F.when(F.col("event_type") == "purchase",
                                  F.col("ts"))).alias("first_p")))
    horizon = e.agg(F.max("ts").alias("h"))
    secs = lambda a, b: (F.unix_timestamp(a) - F.unix_timestamp(b))  # noqa: E731
    obs = (per_user.crossJoin(F.broadcast(horizon))
           .select(
               F.when(F.col("first_p").isNotNull(),
                      F.floor(secs(F.col("first_p"), F.col("first_ts"))
                              / 3600))
                .otherwise(F.floor(secs(F.col("h"), F.col("first_ts"))
                                   / 3600))
                .cast("bigint").alias("t"),
               F.when(F.col("first_p").isNotNull(), 1).otherwise(0)
                .alias("converted")))
    by_t = (obs.groupBy("t")
            .agg(F.sum("converted").cast("bigint").alias("d"),
                 F.count(F.lit(1)).cast("bigint").alias("leaving")))
    w_desc = (Window.orderBy(F.col("t").desc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    risk = by_t.withColumn("n_risk",
                           F.sum("leaving").over(w_desc).cast("bigint"))
    w_asc = (Window.orderBy("t")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ordered = risk.withColumn(
        "factors",
        F.collect_list(F.lit(1.0) - F.col("d").cast("double")
                       / F.col("n_risk")).over(w_asc))
    return (ordered.where(F.col("d") > 0)
            .select(F.col("t").cast("bigint").alias("t_hours"),
                    F.col("d").alias("n_converted"), "n_risk",
                    F.aggregate("factors", F.lit(1.0),
                                lambda acc, x: acc * x).alias("survival"))
            .orderBy("t_hours"))


@register(
    "events_lift_matrix",
    oracle="""
WITH per_user AS (
  SELECT DISTINCT user_id, event_type FROM events
), totals AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events
), singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM per_user GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM per_user a JOIN per_user b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT type_a, type_b, sa.c AS n_a, sb.c AS n_b, n_both,
       CAST(n_both AS DOUBLE) / t.n AS support,
       CAST(n_both AS DOUBLE) / sa.c AS confidence_a_to_b,
       CAST(n_both AS DOUBLE) * t.n / (sa.c * sb.c) AS lift
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b, totals t
ORDER BY type_a, type_b
""",
    doc="Market-basket lift matrix over event types (basket = user): "
        "for every unordered type pair, exact co-occurrence counts and "
        "the support / confidence / lift ratios — the association-rule "
        "screen behind 'users who X also Y'.  Lift > 1 flags genuine "
        "affinity; the md5-free all-integer inputs make every ratio "
        "one expression over exact counts, bit-identical across "
        "engines.  Scale: one distinct (user, type) projection "
        "(state-space sized), one self-join on user_id whose fan-out "
        "is bounded by types-per-user (<= 5 here), then a types²-sized "
        "rollup — never events². plans/events.py:events_lift.",
    tags=("events", "aggregate"),
)
def events_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_user = e.select("user_id", "event_type").distinct()
    totals = e.agg(F.countDistinct("user_id").cast("bigint").alias("n"))
    singles = (per_user.groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    b = per_user.select(F.col("user_id").alias("uid2"),
                        F.col("event_type").alias("type_b"))
    pairs = (per_user.join(b, (F.col("user_id") == F.col("uid2"))
                           & (F.col("event_type") < F.col("type_b")))
             .groupBy(F.col("event_type").alias("type_a"), "type_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_both")))
    sa = singles.select(F.col("event_type").alias("type_a"),
                        F.col("c").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"),
                        F.col("c").alias("n_b"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .crossJoin(F.broadcast(totals))
            .select("type_a", "type_b", "n_a", "n_b", "n_both",
                    (F.col("n_both").cast("double") / F.col("n"))
                    .alias("support"),
                    (F.col("n_both").cast("double") / F.col("n_a"))
                    .alias("confidence_a_to_b"),
                    (F.col("n_both").cast("double") * F.col("n")
                     / (F.col("n_a") * F.col("n_b"))).alias("lift"))
            .orderBy("type_a", "type_b"))


@register(
    "events_behavior_gini",
    oracle="""
WITH per_type AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY user_id, event_type
), per_user AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS ssq
  FROM per_type GROUP BY user_id
), banded AS (
  SELECT user_id, n,
         -- Gini impurity in exact micro-units: 1e6*(n² − Σc²)/n²
         CAST((1000000 * (n * n - ssq)) // (n * n) AS BIGINT) AS gini_micro
  FROM per_user
)
SELECT CAST(gini_micro // 5000 AS INT) AS gini_band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(MIN(gini_micro) AS BIGINT) AS min_gini_micro,
       CAST(MAX(gini_micro) AS BIGINT) AS max_gini_micro
FROM banded
GROUP BY gini_band
ORDER BY gini_band
""",
    doc="Behavioral-diversity profile: per-user Gini impurity of the "
        "event-type distribution — 1 − Σp² as the EXACT integer ratio "
        "(n² − Σc²)/n² floored to micro-units, so the whole report is "
        "integer arithmetic end-to-end (the entropy twin needs log(), "
        "which is not bit-specified across engines; Gini measures the "
        "same single-behavior-vs-diverse axis with zero "
        "transcendentals).  Users roll up into ten impurity bands "
        "with exact extremes — the segmentation input for bot "
        "screening (gini≈0 = one-action accounts) and engagement "
        "tiers; 5000-micro-unit bands resolve the fixture's "
        "764k-799k impurity range into a real histogram.  Scale: two "
        "partial-aggregable keyed counts, then a band rollup. "
        "plans/events.py:events_gini.",
    tags=("events", "aggregate"),
)
def events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    per_type = (e.groupBy("user_id", "event_type")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    per_user = (per_type.groupBy("user_id")
                .agg(F.sum("c").cast("bigint").alias("n"),
                     F.sum(F.col("c") * F.col("c")).cast("bigint")
                      .alias("ssq")))
    gini = F.expr("(1000000 * (n * n - ssq)) div (n * n)")
    banded = per_user.select(
        "n", gini.cast("bigint").alias("gini_micro"))
    return (banded.groupBy(F.expr("gini_micro div 5000").cast("int")
                           .alias("gini_band"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("n").cast("bigint").alias("n_events"),
                 F.min("gini_micro").cast("bigint")
                  .alias("min_gini_micro"),
                 F.max("gini_micro").cast("bigint")
                  .alias("max_gini_micro"))
            .orderBy("gini_band"))


# Benford first-digit shares in exact micro-units, precomputed in
# Python (round(log10(1 + 1/d) * 1e6); they sum to exactly 1,000,000)
# and embedded as literals in BOTH engines — log10 is never evaluated
# inside either engine (the literal-table discipline of the LSH planes
# and DCT bases).
_BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947,
                  57992, 51153, 45757)


@register(
    "events_benford_deviation",
    oracle=f"""
WITH exp AS (
  SELECT * FROM (VALUES
    {", ".join(f"({d}, {s})" for d, s in enumerate(_BENFORD_MICRO, 1))}
  ) e(digit, share_micro)
), digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
), counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
), total AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
SELECT e.digit,
       COALESCE(c.n, 0) AS n_observed,
       CAST((t.t * e.share_micro) // 1000000 AS BIGINT) AS n_expected,
       CAST(ABS(COALESCE(c.n, 0) * 1000000 - t.t * e.share_micro)
            AS BIGINT) AS abs_dev_micro
FROM exp e LEFT JOIN counts c ON c.digit = e.digit, total t
ORDER BY e.digit
""",
    doc="Benford first-digit deviation screen on order totals — the "
        "forensic-accounting test for fabricated or systematically "
        "capped numeric data: observed first-significant-digit counts "
        "vs Benford expectation, with the log10 shares PRECOMPUTED in "
        "Python to exact micro-units summing to 1,000,000 and embedded "
        "as literals in both engines (transcendentals never evaluated "
        "in-engine — the LSH-plane/DCT-basis discipline), so the "
        "per-digit absolute deviation n·1e6 − t·share is EXACT integer "
        "arithmetic end-to-end.  Scale: one 9-group partial agg over "
        "the scan. plans/events.py:events_benford.",
    tags=("events", "stats"),
)
def events_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    digits = (o.where(F.col("o_totalprice") >= 1)
              .select(F.substring(F.floor("o_totalprice").cast("bigint")
                                  .cast("string"), 1, 1).cast("int")
                      .alias("digit")))
    counts = (digits.groupBy("digit")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    total = counts.agg(F.sum("n").cast("bigint").alias("t"))
    exp = spark.createDataFrame(
        [(d, s) for d, s in enumerate(_BENFORD_MICRO, 1)],
        "digit int, share_micro bigint")
    return (exp.join(counts, "digit", "left")
            .crossJoin(F.broadcast(total))
            .select("digit",
                    F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
                     .alias("n_observed"),
                    F.expr("(t * share_micro) div 1000000").cast("bigint")
                     .alias("n_expected"),
                    F.abs(F.coalesce(F.col("n"), F.lit(0))
                          * F.lit(1000000)
                          - F.col("t") * F.col("share_micro"))
                     .cast("bigint").alias("abs_dev_micro"))
            .orderBy("digit"))


@register(
    "events_ab_srm_check",
    oracle="""
WITH arms AS (
  SELECT CASE WHEN CAST(concat('0x', substr(md5('ab|' || CAST(user_id
                    AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         user_id
  FROM events GROUP BY 1, user_id
), counts AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_a,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b
  FROM arms
)
SELECT n_a, n_b,
       (n_a - (n_a + n_b) / 2.0) / sqrt((n_a + n_b) / 4.0) AS srm_z,
       CASE WHEN ABS((n_a - (n_a + n_b) / 2.0)
                     / sqrt((n_a + n_b) / 4.0)) > 3.0
            THEN TRUE ELSE FALSE END AS srm_flag
FROM counts
""",
    doc="Sample-ratio-mismatch check for the A/B assignment — the "
        "experiment-infrastructure health gate run BEFORE any readout "
        "(an SRM means the assignment or logging pipeline is broken "
        "and every downstream p-value is garbage): z-test of the "
        "observed arm split against the designed 50/50 under the "
        "md5-parity assignment the z/Welch/DiD entries share.  z and "
        "the |z| > 3 flag derive from two exact integers through one "
        "expression tree — bit-exact.  Scale: one distinct-user "
        "partial agg, then 1-row state. plans/events.py:events_srm.",
    tags=("events", "stats"),
)
def events_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"),
                                          F.col("user_id").cast("string"))),
                           1, 15), 16, 10).cast("bigint") % 2 == 0,
        F.lit("A")).otherwise(F.lit("B"))
    arms = e.select(arm.alias("arm"), "user_id").distinct()
    counts = arms.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("bigint")
         .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("bigint")
         .alias("n_b"))
    z = ((F.col("n_a") - (F.col("n_a") + F.col("n_b")) / F.lit(2.0))
         / F.sqrt((F.col("n_a") + F.col("n_b")) / F.lit(4.0)))
    return counts.select(
        "n_a", "n_b", z.alias("srm_z"),
        F.when(F.abs(z) > 3.0, F.lit(True)).otherwise(F.lit(False))
         .alias("srm_flag"))


@register(
    "events_attribution_linear",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), counted AS (
  SELECT user_id, event_type, cents,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
           AS n_click,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
           AS n_view
  FROM e
), credited AS (
  SELECT COALESCE(n_click, 0) AS nc, COALESCE(n_view, 0) AS nv, cents
  FROM counted WHERE event_type = 'purchase'
)
SELECT
  CAST(SUM(CASE WHEN nc + nv = 0 THEN cents ELSE 0 END) AS BIGINT)
      AS direct_cents,
  CAST(SUM(CASE WHEN nc + nv > 0
           THEN (cents * 10000 * nc) // (nc + nv) ELSE 0 END) AS BIGINT)
      AS click_credit_microcents,
  CAST(SUM(CASE WHEN nc + nv > 0
           THEN (cents * 10000 * nv) // (nc + nv) ELSE 0 END) AS BIGINT)
      AS view_credit_microcents,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(CASE WHEN nc + nv = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_direct
FROM credited
""",
    doc="Linear (equal-weight) multi-touch attribution — the "
        "companion of the last-touch entry for the other end of the "
        "attribution-model spectrum: each purchase's revenue splits "
        "across ALL prior click/view touches inside a 7-day lookback, "
        "proportionally to each channel's touch count; no touch = "
        "'direct'.  The lookback counts come from ONE time-RANGE "
        "window frame per channel (range [-604800 s, -1 s] on epoch "
        "seconds — the frame spelling both engines share); credits "
        "fold to exact integer micro-cents with floor division per "
        "purchase, so the report is bit-exact despite the division.  "
        "Scale: one user-keyed window pass over events, then a 1-row "
        "rollup. plans/events.py:events_attr_linear.",
    tags=("events", "window"),
)
def events_attr_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"))
    w = (Window.partitionBy("user_id").orderBy("sec")
         .rangeBetween(-604800, -1))
    counted = e.select(
        "event_type", "cents",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
         .over(w).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
         .over(w).alias("n_view"))
    credited = (counted.where(F.col("event_type") == "purchase")
                .select(F.coalesce("n_click", F.lit(0)).alias("nc"),
                        F.coalesce("n_view", F.lit(0)).alias("nv"),
                        "cents"))
    touched = F.col("nc") + F.col("nv") > 0
    return credited.agg(
        F.sum(F.when(~touched, F.col("cents")).otherwise(0))
         .cast("bigint").alias("direct_cents"),
        F.sum(F.when(touched,
                     F.expr("(cents * 10000 * nc) div (nc + nv)"))
              .otherwise(0)).cast("bigint")
         .alias("click_credit_microcents"),
        F.sum(F.when(touched,
                     F.expr("(cents * 10000 * nv) div (nc + nv)"))
              .otherwise(0)).cast("bigint")
         .alias("view_credit_microcents"),
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum(F.when(~touched, 1).otherwise(0)).cast("bigint")
         .alias("n_direct"))


@register(
    "events_bounce_rate_daily",
    oracle="""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sessions AS (
  SELECT user_id, session_id,
         CAST(MIN(ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM numbered GROUP BY user_id, session_id
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS bounce_rate,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM sessions
GROUP BY day
ORDER BY day
""",
    doc="Daily bounce rate over 30-minute sessions (a bounce = a "
        "single-event session, keyed to the session's START day) — the "
        "canonical engagement-quality metric on top of sessionization, "
        "computed from the same session machinery the session-window "
        "entry pins (Spark session_window() ≡ the oracle's gaps-and-"
        "islands).  Counts exact; the rate one ratio of two integers "
        "per day.  Scale: the sessionization pass is the one "
        "user-keyed sort sessionizing fundamentally needs; the rollup "
        "is days-sized. plans/events.py:events_bounce.",
    tags=("events", "window", "session"),
)
def events_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    sessions = (e.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                          "user_id")
                .agg(F.count("*").cast("bigint").alias("n_events"))
                .select(F.col("w.start").cast("date").alias("day"),
                        "n_events"))
    return (sessions.groupBy("day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
                 F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                  .cast("bigint").alias("n_bounces"),
                 (F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                  .cast("double") / F.count(F.lit(1)))
                  .alias("bounce_rate"),
                 F.sum("n_events").cast("bigint").alias("n_events"))
            .orderBy("day"))


@register(
    "events_dau_wau_mau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), spine AS (
  SELECT DISTINCT day FROM ud
)
SELECT s.day,
       CAST(COUNT(DISTINCT CASE WHEN u.day = s.day
                                THEN u.user_id END) AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT CASE WHEN u.day > s.day - 7
                                THEN u.user_id END) AS BIGINT) AS wau,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau,
       CAST(COUNT(DISTINCT CASE WHEN u.day = s.day
                                THEN u.user_id END) AS DOUBLE)
         / COUNT(DISTINCT CASE WHEN u.day > s.day - 7
                               THEN u.user_id END) AS dau_wau_ratio
FROM spine s
JOIN ud u ON u.day <= s.day AND u.day > s.day - 30
GROUP BY s.day
ORDER BY s.day
""",
    doc="DAU / trailing-7-day WAU / trailing-30-day MAU per day, with "
        "the DAU/WAU stickiness ratio — the canonical product-health "
        "dashboard row.  EXACT distinct counts (no HLL): the corpus "
        "first collapses to DISTINCT (user, day) pairs — the "
        "state-space-sized table every rolling-active metric should be "
        "computed from — then each pair EXPLODES onto exactly the 30 "
        "spine days it contributes to (explode(sequence(day, day+29))) "
        "and an EQUI-join against the day spine keeps the observed "
        "days; one distinct-agg per day does the rest.  Work is "
        "pairs x 30, independent of history length — the r8 plan's "
        "no-equi-key range join planned a BroadcastNestedLoopJoin "
        "(pairs x TOTAL-days, a 30-100x multiplier at years of "
        "history); the bin-grid discipline of operators/range_join.py "
        "applied here makes it a shuffled hash/sort-merge equi-join "
        "(no-BNLJ pinned by tests/test_plan_shape.py).  Counts exact; "
        "the ratio one integer quotient.  (The sketch path for when "
        "even the pair table is too hot is events_hll_sketch_merge / "
        "sketch_kmv_distinct_users.)  plans/events.py:events_dau_wau_mau.",
    tags=("events", "aggregate"),
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    ud = (e.select("user_id", F.col("ts").cast("date").alias("day"))
          .distinct().transform(materialize))
    spine = ud.select("day").distinct()
    # Fan each (user, active-day) pair onto the 30 consecutive spine
    # days whose trailing-30 window contains it: spine_day in
    # [u.day, u.day+29]  <=>  u.day in (spine_day-30, spine_day].
    fanned = ud.select(
        "user_id", F.col("day").alias("u_day"),
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 29)))
         .alias("day"))
    # Equi-join on the spine day (spine is days-sized -> broadcast);
    # drops fabricated days after the last observed day.
    j = fanned.join(F.broadcast(spine), "day")
    dau = F.countDistinct(F.when(F.col("u_day") == F.col("day"),
                                 F.col("user_id")))
    wau = F.countDistinct(F.when(F.col("u_day")
                                 > F.date_sub(F.col("day"), 7),
                                 F.col("user_id")))
    mau = F.countDistinct(F.col("user_id"))
    return (j.groupBy("day")
            .agg(dau.cast("bigint").alias("dau"),
                 wau.cast("bigint").alias("wau"),
                 mau.cast("bigint").alias("mau"),
                 (dau.cast("double") / wau).alias("dau_wau_ratio"))
            .orderBy("day"))


@register(
    "events_dau_wau_mau_kmv",
    oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day,
         CAST(concat('0x', substr(md5('kmv|' || CAST(user_id AS VARCHAR)),
                                  1, 15)) AS BIGINT) AS h
  FROM events
), sk AS (
  SELECT day, h FROM (
    SELECT day, h, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
    FROM ud) t WHERE rn <= 256
), spine AS (
  SELECT DISTINCT day FROM ud
), fan7 AS (
  SELECT DISTINCT s.day AS day, k.h
  FROM sk k JOIN spine s ON s.day >= k.day AND s.day <= k.day + 6
), fan30 AS (
  SELECT DISTINCT s.day AS day, k.h
  FROM sk k JOIN spine s ON s.day >= k.day AND s.day <= k.day + 29
), est1 AS (
  SELECT day, CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)
       ELSE ROUND(255.0 * (1152921504606846976.0 / MAX(h)))
       END AS BIGINT) AS dau_kmv
  FROM (SELECT day, h, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h)
               AS rn FROM sk) t
  WHERE rn <= 256 GROUP BY day
), est7 AS (
  SELECT day, CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)
       ELSE ROUND(255.0 * (1152921504606846976.0 / MAX(h)))
       END AS BIGINT) AS wau_kmv
  FROM (SELECT day, h, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h)
               AS rn FROM fan7) t
  WHERE rn <= 256 GROUP BY day
), est30 AS (
  SELECT day, CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)
       ELSE ROUND(255.0 * (1152921504606846976.0 / MAX(h)))
       END AS BIGINT) AS mau_kmv
  FROM (SELECT day, h, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h)
               AS rn FROM fan30) t
  WHERE rn <= 256 GROUP BY day
)
SELECT day, dau_kmv, wau_kmv, mau_kmv
FROM est1 JOIN est7 USING (day) JOIN est30 USING (day)
ORDER BY day
""",
    doc="The SKETCH twin of events_dau_wau_mau (VERDICT r9 ask #6) — "
        "the shape the 100 TB dashboard actually runs: per-day KMV "
        "sketches (k=256 smallest md5-derived hash priorities of the "
        "day's distinct users — the mergeable state a nightly job "
        "stores, k longs per day) are MERGED over the trailing 7- and "
        "30-day windows by fanning each day's sketch rows onto the "
        "spine days they contribute to (explode(sequence) → broadcast "
        "equi-join, the no-BNLJ discipline of the exact twin) and "
        "re-taking the k smallest per target day — correct because the "
        "k smallest of a union are a subset of the union of per-day k "
        "smallests.  Work per day is k·window rows (vs the exact "
        "twin's pairs·30), independent of user count: at corpus scale "
        "the pair table is the bottleneck and this replaces it with "
        "30·k longs per dashboard row.  Below k distinct actives the "
        "estimate is EXACT; above, (k-1)·2^60/h_k — deterministic "
        "integer/double arithmetic both engines spell identically, so "
        "the ESTIMATE hash-checks bit-for-bit (the "
        "sketch_kmv_distinct_users convention).  k=256 (std ≈ 1/√255 ≈ "
        "6%): the fixture's user population is one FIXED ~1.5k-id set, "
        "so every window shares the same order statistics and the "
        "estimator error is correlated across days, not averaged away "
        "— k=64 drew a 3σ population (40% high on every row), measured "
        "and rejected; k=256 lands at 8.8% on MAU at sf0.1.  "
        "operators/countmin.py:kmv_hash; plans/events.py:"
        "events_dau_wau_mau_kmv.",
    tags=("events", "sketch", "aggregate"),
)
def events_dau_wau_mau_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from ..operators.countmin import kmv_hash
    k = 256
    e = table(spark, sf_dir, "events")
    ud = (e.select(F.col("ts").cast("date").alias("day"),
                   kmv_hash(F.col("user_id")).alias("h"))
          .distinct().transform(materialize))
    w = Window.partitionBy("day").orderBy("h")
    sk = (ud.withColumn("__rn", F.row_number().over(w))
          .where(F.col("__rn") <= k).drop("__rn")
          .transform(materialize))          # the stored per-day sketches
    spine = ud.select("day").distinct()

    def window_estimate(days: int, out: str) -> DataFrame:
        fan = (sk.select(
                   F.explode(F.sequence(F.col("day"),
                                        F.date_add(F.col("day"),
                                                   days - 1))).alias("day"),
                   "h")
               .join(F.broadcast(spine), "day")
               .dropDuplicates(["day", "h"]))
        topk = (fan.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= k))
        kk = (topk.groupBy("day")
              .agg(F.max("h").alias("hk"),
                   F.count(F.lit(1)).cast("bigint").alias("n")))
        est = F.when(F.col("n") < k, F.col("n")).otherwise(
            F.round(F.lit(float(k - 1))
                    * (F.lit(1152921504606846976.0) / F.col("hk"))))
        return kk.select("day", est.cast("bigint").alias(out))

    return (window_estimate(1, "dau_kmv")
            .join(window_estimate(7, "wau_kmv"), "day")
            .join(window_estimate(30, "mau_kmv"), "day")
            .orderBy("day"))


@register(
    "events_seasonality_dow_profile",
    oracle="""
WITH base AS (
  SELECT event_type, CAST(isodow(ts) AS INT) AS dow FROM events
), cells AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n
  FROM base GROUP BY event_type, dow
), totals AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total FROM cells
  GROUP BY event_type
)
SELECT c.event_type, c.dow, c.n,
       ROUND(7.0 * c.n / t.total, 6) AS seasonal_index
FROM cells c JOIN totals t USING (event_type)
ORDER BY c.event_type, c.dow
""",
    doc="Day-of-week seasonality profile per event type: ISO weekday "
        "cell counts and the seasonal index 7*n/total (1.0 = flat) — "
        "the first chart every ops dashboard draws, and the "
        "normalization a weekly-seasonal forecaster (Holt-Winters "
        "sibling entries) starts from.  Portable weekday arithmetic: "
        "Spark weekday()+1 == DuckDB isodow (1=Mon..7=Sun); counts "
        "exact, index one integer ratio.  Scale: one (type, dow) "
        "partial-agg shuffle — 7*|types| cells out, input-size "
        "invariant. plans/events.py:events_seasonality_dow.",
    tags=("events", "aggregate"),
)
def events_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    cells = (e.select("event_type",
                      (F.weekday("ts") + 1).cast("int").alias("dow"))
             .groupBy("event_type", "dow")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    totals = (cells.groupBy("event_type")
              .agg(F.sum("n").cast("bigint").alias("total")))
    return (cells.join(totals, "event_type")
            .select("event_type", "dow", "n",
                    F.round(F.lit(7.0) * F.col("n") / F.col("total"), 6)
                     .alias("seasonal_index"))
            .orderBy("event_type", "dow"))


@register(
    "events_cohort_ltv_curve",
    oracle="""
WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS wk,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS centi
  FROM events
), cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id
), cohort_size AS (
  SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM cohort GROUP BY cohort_wk
), weekly AS (
  SELECT c.cohort_wk,
         CAST((epoch(e.wk) - epoch(c.cohort_wk)) / 604800 AS INT)
             AS weeks_since,
         CAST(SUM(e.centi) AS BIGINT) AS wk_centi
  FROM ev e JOIN cohort c USING (user_id)
  GROUP BY c.cohort_wk, weeks_since
), curve AS (
  SELECT cohort_wk, weeks_since, wk_centi,
         CAST(SUM(wk_centi) OVER (PARTITION BY cohort_wk
                                  ORDER BY weeks_since) AS BIGINT)
             AS cum_centi
  FROM weekly
)
SELECT CAST(c.cohort_wk AS TIMESTAMP) AS cohort_week,
       c.weeks_since, s.n_users, c.wk_centi, c.cum_centi,
       ROUND(c.cum_centi * 1.0 / (100 * s.n_users), 6) AS ltv_per_user
FROM curve c JOIN cohort_size s USING (cohort_wk)
ORDER BY cohort_week, weeks_since
""",
    doc="Cohort LTV curve: cumulative value per first-active-week "
        "cohort by week offset, normalized per cohort user — the "
        "revenue companion of events_cohort_retention (same cohort "
        "keying), the curve a growth team reads payback periods off. "
        "Values fold to exact integer centi-units BEFORE any "
        "aggregation, so weekly sums, the running cumulative, and the "
        "final per-user ratio are order-independent and bit-exact.  "
        "Scale: events collapse to (user, week) sums first, the "
        "cumulative window runs over the aggregated cohort x offset "
        "grid (weeks-sized partitions), and cohort sizes broadcast. "
        "plans/events.py:events_cohort_ltv.",
    tags=("events", "aggregate", "window"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    ev = e.select("user_id", F.date_trunc("week", "ts").alias("wk"),
                  F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                   .alias("centi"))
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    size = (cohort.groupBy("cohort_wk")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users")))
    weeks_since = ((F.unix_timestamp("wk")
                    - F.unix_timestamp("cohort_wk")) / 604800).cast("int")
    weekly = (ev.join(cohort, "user_id")
              .select("cohort_wk", weeks_since.alias("weeks_since"),
                      "centi")
              .groupBy("cohort_wk", "weeks_since")
              .agg(F.sum("centi").cast("bigint").alias("wk_centi")))
    w = Window.partitionBy("cohort_wk").orderBy("weeks_since")
    curve = weekly.withColumn(
        "cum_centi", F.sum("wk_centi").over(w).cast("bigint"))
    return (curve.join(F.broadcast(size), "cohort_wk")
            .select(F.col("cohort_wk").cast("timestamp_ntz")
                     .alias("cohort_week"),
                    "weeks_since", "n_users", "wk_centi", "cum_centi",
                    F.round(F.col("cum_centi").cast("double")
                            / (F.lit(100) * F.col("n_users")), 6)
                     .alias("ltv_per_user"))
            .orderBy("cohort_week", "weeks_since"))



# --- shared Holt-Winters fold (alpha/beta/gamma = 0.3/0.2/0.1,
# period 7) — ONE spelling used by both the HW entry and the
# residual-anomaly entry so the two can never drift (the same
# single-source discipline as the LPA/modularity oracle CTE
# builder).  State layout: [l, b, s_{t-7}..s_{t-1}].
_HW_FOLD_SQL = """\
         list_transform(generate_series(1, len(cnts)), i ->
           list_reduce(
             list_prepend(
               [CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                CAST(0.0 AS DOUBLE)],
               list_transform(list_slice(cnts, 1, i), x ->
                 [x, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])),
             (acc, e) -> [
               (e[1] - acc[3]) * 0.3 + (acc[1] + acc[2]) * 0.7,
               ((e[1] - acc[3]) * 0.3 + (acc[1] + acc[2]) * 0.7
                - acc[1]) * 0.2 + acc[2] * 0.8,
               acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
               (e[1] - ((e[1] - acc[3]) * 0.3
                        + (acc[1] + acc[2]) * 0.7)) * 0.1
               + acc[3] * 0.9])) AS st"""

def _hw_step(acc, x):
    l, b = acc.getField("l"), acc.getField("b")
    s1 = acc.getField("s1")
    lvl = (x - s1) * F.lit(0.3) + (l + b) * F.lit(0.7)
    # l_t inlined again for trend/seasonal — same tree as oracle
    lvl2 = (x - s1) * F.lit(0.3) + (l + b) * F.lit(0.7)
    trend = (lvl2 - l) * F.lit(0.2) + b * F.lit(0.8)
    lvl3 = (x - s1) * F.lit(0.3) + (l + b) * F.lit(0.7)
    snew = (x - lvl3) * F.lit(0.1) + s1 * F.lit(0.9)
    return F.struct(
        lvl.alias("l"), trend.alias("b"),
        acc.getField("s2").alias("s1"),
        acc.getField("s3").alias("s2"),
        acc.getField("s4").alias("s3"),
        acc.getField("s5").alias("s4"),
        acc.getField("s6").alias("s5"),
        acc.getField("s7").alias("s6"),
        snew.alias("s7"))

def _hw_init():
    zero = F.lit(0.0)
    return F.struct(zero.alias("l"), zero.alias("b"),
                    zero.alias("s1"), zero.alias("s2"),
                    zero.alias("s3"), zero.alias("s4"),
                    zero.alias("s5"), zero.alias("s6"),
                    zero.alias("s7"))

def _hw_series(e):
    daily = (e.groupBy("event_type",
                       F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    return (daily.groupBy("event_type")
            .agg(F.array_sort(F.collect_list(
                F.struct("day", "n_events"))).alias("dc"))
            .select("event_type",
                    F.transform("dc", lambda s: s.day).alias("days"),
                    F.transform("dc", lambda s: s.n_events
                                .cast("double")).alias("cnts"),
                    F.transform("dc", lambda s: s.n_events)
                     .alias("raw")))


@register(
    "events_holt_winters_seasonal",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list(CAST(n_events AS DOUBLE) ORDER BY day) AS cnts,
         list(n_events ORDER BY day) AS raw
  FROM daily GROUP BY event_type
), smoothed AS (
  SELECT event_type, days, raw,
{_HW_FOLD_SQL}
  FROM series
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       lvl AS level, trend, seasonal
FROM (
  SELECT event_type,
         unnest(days) AS day,
         unnest(raw) AS n_events,
         unnest(list_transform(st, s -> s[1])) AS lvl,
         unnest(list_transform(st, s -> s[2])) AS trend,
         unnest(list_transform(st, s -> s[9])) AS seasonal
  FROM smoothed
)
ORDER BY event_type, day
""",
    doc="Additive Holt-Winters triple exponential smoothing per event "
        "type (alpha=0.3 level, beta=0.2 trend, gamma=0.1 seasonal, "
        "period 7, zero-initialized): l_t = 0.3(x_t - s_{t-7}) + "
        "0.7(l + b); b_t = 0.2(l_t - l) + 0.8 b; s_t = 0.1(x_t - l_t) "
        "+ 0.9 s_{t-7} — the weekly-seasonal upgrade of events_holt_"
        "linear for series the seasonality-dow entry shows are not "
        "flat.  State is a 9-component (l, b, s_{t-7}..s_{t-1}) vector "
        "that ROTATES each step; every update — including l_t inlined "
        "three times — is spelled identically in both engines, so the "
        "whole series is bit-exact with zero rounding (the shared-fold "
        "recipe of events_holt_linear extended from 2-state to "
        "9-state).  The oracle accumulator is a 9-element LIST (the "
        "DuckDB 1.0.0 struct-fold hazard, pinned by pytest); the Spark "
        "accumulator a 9-field struct folded by F.aggregate (honest).  "
        "Scale: state is bucket-cardinality per key, never events; the "
        "O(n^2) prefix folds run JVM-side on the collapsed series. "
        "plans/events.py:events_holt_winters.",
    tags=("events", "window"),
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    series = _hw_series(e)

    step, init = _hw_step, _hw_init()
    st = F.transform(
        F.sequence(F.lit(1), F.size("cnts")),
        lambda i: F.aggregate(F.slice(F.col("cnts"), F.lit(1), i),
                              init, step))
    rows = (series
            .withColumn("lvls", F.transform(st, lambda s: s.getField("l")))
            .withColumn("trends",
                        F.transform(st, lambda s: s.getField("b")))
            .withColumn("seas",
                        F.transform(st, lambda s: s.getField("s7")))
            .select("event_type",
                    F.posexplode(F.arrays_zip("days", "raw", "lvls",
                                              "trends", "seas"))
                    .alias("_i", "z")))
    return (rows.select("event_type",
                        F.col("z.days").alias("day"),
                        F.col("z.raw").cast("bigint").alias("n_events"),
                        F.col("z.lvls").alias("level"),
                        F.col("z.trends").alias("trend"),
                        F.col("z.seas").alias("seasonal"))
            .orderBy("event_type", "day"))


@register(
    "join_asof_forward_tolerance",
    oracle="""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS snap_ts,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, date_trunc('hour', ts)
), lft AS (
  SELECT event_id, user_id, ts FROM events WHERE user_id % 97 = 0
), matched AS (
  SELECT l.event_id, h.snap_ts, h.n,
         ROW_NUMBER() OVER (PARTITION BY l.event_id
                            ORDER BY h.snap_ts) AS rn
  FROM lft l JOIN hourly h
    ON h.user_id = l.user_id
   AND h.snap_ts >= l.ts
   AND h.snap_ts <= l.ts + INTERVAL 2 HOUR
)
SELECT l.event_id, l.user_id, l.ts,
       m.snap_ts AS asof_snap_ts, m.n AS asof_n
FROM lft l LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
  USING (event_id)
ORDER BY event_id
""",
    doc="FORWARD as-of join with a tolerance bound (pandas merge_asof "
        "direction='forward' + tolerance, the look-ahead twin of the "
        "backward entry): each sampled event attaches the EARLIEST "
        "per-user hourly snapshot at-or-after its timestamp, nulled "
        "when the next snapshot is more than 2 hours out — the "
        "label-joining shape of every 'outcome within horizon' "
        "training-set build.  Union + reversed window (ts DESC, right-"
        "before-left at equal ts so >= includes exact hits): one "
        "shuffle on the high-cardinality user key, per-partition sort, "
        "zero join fan-out — hot-key-immune where the naive range join "
        "explodes.  Snapshot rows are unique per (user, hour) so "
        "payloads are deterministic. "
        "operators/asof.py:asof_join_forward.",
    tags=("join", "events"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join_forward
    e = table(spark, sf_dir, "events")
    hourly = (e.groupBy("user_id",
                        F.date_trunc("hour", "ts").alias("snap_ts"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    lft = (e.where(F.col("user_id") % 97 == 0)
           .select("event_id", "user_id", "ts"))
    out = asof_join_forward(lft, hourly, "user_id", "ts", "snap_ts",
                            right_cols=["n"],
                            tolerance_seconds=7200)
    return (out.select("event_id", "user_id", "ts",
                       F.col("asof_snap_ts"),
                       F.col("asof_n").alias("asof_n"))
            .orderBy("event_id"))


@register(
    "events_time_to_convert",
    oracle="""
WITH su AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), pu AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN su ON su.user_id = e.user_id AND e.ts >= su.s_ts
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
), lat AS (
  SELECT CAST(date_diff('second', su.s_ts, pu.p_ts) AS BIGINT) AS lat_s
  FROM su JOIN pu USING (user_id)
), binned AS (
  SELECT CASE WHEN lat_s < 60 THEN '00_under_1m'
              WHEN lat_s < 1800 THEN '01_1m_30m'
              WHEN lat_s < 14400 THEN '02_30m_4h'
              WHEN lat_s < 86400 THEN '03_4h_1d'
              ELSE '04_over_1d' END AS bin,
         lat_s
  FROM lat
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM binned), 6) AS share,
       CAST(MIN(lat_s) AS BIGINT) AS min_s,
       CAST(MAX(lat_s) AS BIGINT) AS max_s,
       CAST(SUM(lat_s) AS BIGINT) AS sum_s
FROM binned GROUP BY bin ORDER BY bin
""",
    doc="Conversion-latency distribution: first signup to first "
        "at-or-after purchase per user, bucketed into fixed integer-"
        "second bands with exact per-band min/max/sum — the "
        "time-to-convert histogram a funnel dashboard draws next to "
        "the conversion rate (and the data-driven basis for the "
        "attribution windows the funnel entries hard-code).  Whole-"
        "second boundary-crossing diffs match date_diff('second') "
        "exactly (the gap-histogram discipline); all counts and sums "
        "exact integers, shares one ratio.  Scale: two user-keyed "
        "aggregates and one user-keyed join; nothing is event-"
        "cardinality after the first groupBy. "
        "plans/events.py:events_time_to_convert.",
    tags=("events", "aggregate"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    su = (e.where(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("s_ts")))
    pu = (e.where(F.col("event_type") == "purchase")
          .join(su, "user_id")
          .where(F.col("ts") >= F.col("s_ts"))
          .groupBy("user_id").agg(F.min("ts").alias("p_ts")))
    lat = (su.join(pu, "user_id")
           .select((F.unix_timestamp("p_ts") - F.unix_timestamp("s_ts"))
                   .cast("bigint").alias("lat_s")))
    bin_col = (F.when(F.col("lat_s") < 60, "00_under_1m")
               .when(F.col("lat_s") < 1800, "01_1m_30m")
               .when(F.col("lat_s") < 14400, "02_30m_4h")
               .when(F.col("lat_s") < 86400, "03_4h_1d")
               .otherwise("04_over_1d"))
    binned = (lat.select(bin_col.alias("bin"), "lat_s")
              .transform(materialize))
    total = binned.agg(F.count(F.lit(1)).alias("__n"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.min("lat_s").cast("bigint").alias("min_s"),
                 F.max("lat_s").cast("bigint").alias("max_s"),
                 F.sum("lat_s").cast("bigint").alias("sum_s"))
            .crossJoin(F.broadcast(total))
            .select("bin", "n_users",
                    F.round(F.col("n_users") * F.lit(1.0)
                            / F.col("__n"), 6).alias("share"),
                    "min_s", "max_s", "sum_s")
            .orderBy("bin"))


@register(
    "events_retention_day_n",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), cohort AS (
  SELECT user_id, MIN(day) AS d0 FROM activity GROUP BY user_id
), marks AS (
  SELECT c.user_id, c.d0,
         MAX(CASE WHEN a.day = c.d0 + 1  THEN 1 ELSE 0 END) AS r1,
         MAX(CASE WHEN a.day = c.d0 + 7  THEN 1 ELSE 0 END) AS r7,
         MAX(CASE WHEN a.day = c.d0 + 14 THEN 1 ELSE 0 END) AS r14
  FROM cohort c JOIN activity a USING (user_id)
  GROUP BY c.user_id, c.d0
)
SELECT d0 AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(r1) AS BIGINT) AS d1_retained,
       ROUND(SUM(r1) * 1.0 / COUNT(*), 6) AS d1_rate,
       CAST(SUM(r7) AS BIGINT) AS d7_retained,
       ROUND(SUM(r7) * 1.0 / COUNT(*), 6) AS d7_rate,
       CAST(SUM(r14) AS BIGINT) AS d14_retained,
       ROUND(SUM(r14) * 1.0 / COUNT(*), 6) AS d14_rate
FROM marks GROUP BY d0 ORDER BY d0
""",
    doc="Classic Day-N retention (D1/D7/D14): per first-active-day "
        "cohort, the share of users active EXACTLY N days later — the "
        "daily companion of the weekly cohort matrix (events_cohort_"
        "retention) and the headline number growth reports lead with. "
        "Counts exact; rates integer ratios.  Scale: the distinct "
        "(user, day) collapse bounds everything at state-space size; "
        "one user-keyed join + two keyed aggregates. "
        "plans/events.py:events_retention_day_n.",
    tags=("events", "aggregate"),
)
def events_retention_day_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    activity = (e.select("user_id", F.col("ts").cast("date").alias("day"))
                .distinct())
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("d0"))
    j = cohort.join(activity, "user_id")
    marks = (j.groupBy("user_id", "d0")
             .agg(*[F.max(F.when(F.col("day")
                                 == F.date_add("d0", n), 1).otherwise(0))
                    .alias(f"r{n}") for n in (1, 7, 14)]))
    return (marks.groupBy(F.col("d0").alias("cohort_day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("r1").cast("bigint").alias("d1_retained"),
                 F.round(F.sum("r1") * F.lit(1.0) / F.count(F.lit(1)), 6)
                  .alias("d1_rate"),
                 F.sum("r7").cast("bigint").alias("d7_retained"),
                 F.round(F.sum("r7") * F.lit(1.0) / F.count(F.lit(1)), 6)
                  .alias("d7_rate"),
                 F.sum("r14").cast("bigint").alias("d14_retained"),
                 F.round(F.sum("r14") * F.lit(1.0) / F.count(F.lit(1)), 6)
                  .alias("d14_rate"))
            .orderBy("cohort_day"))


@register(
    "events_anomaly_hw_residual",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), series AS (
  SELECT event_type,
         list(day ORDER BY day) AS days,
         list(CAST(n_events AS DOUBLE) ORDER BY day) AS cnts,
         list(n_events ORDER BY day) AS raw
  FROM daily GROUP BY event_type
), smoothed AS (
  SELECT event_type, days, cnts, raw,
{_HW_FOLD_SQL}
  FROM series
), scored AS (
  SELECT event_type, days, raw,
         list_transform(generate_series(1, len(cnts)), i ->
           CASE WHEN i = 1 THEN CAST(0.0 AS DOUBLE)
                ELSE st[i-1][1] + st[i-1][2] + st[i-1][3] END) AS fc,
         cnts
  FROM smoothed
), resid AS (
  SELECT event_type, days, raw, fc,
         list_transform(generate_series(1, len(cnts)), i ->
           cnts[i] - fc[i]) AS res,
         len(cnts) AS n
  FROM scored
), thresh AS (
  SELECT event_type, days, raw, fc, res, n,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_slice(res, 8, n)),
           (a, b) -> a + abs(b)) / GREATEST(n - 7, 1) AS mar
  FROM resid
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
       ROUND(fc_i, 6) AS forecast, ROUND(res_i, 6) AS residual,
       (i > 7 AND abs(res_i) > 3 * mar) AS is_anomaly
FROM (
  SELECT event_type, mar,
         unnest(days) AS day,
         unnest(raw) AS n_events,
         unnest(fc) AS fc_i,
         unnest(res) AS res_i,
         unnest(generate_series(1, n)) AS i
  FROM thresh
)
ORDER BY event_type, day
""",
    doc="Forecast-residual anomaly detection on top of the Holt-"
        "Winters entry: one-step-ahead forecast for day t is the "
        "PRE-update state (l + b + s_{t-7} from the t-1 fold), the "
        "residual x_t - forecast flags when it exceeds 3x the mean "
        "absolute residual of the post-warm-up days (t > 7) — the "
        "standard seasonal-baseline alert, and the practical payoff of "
        "the bit-exact HW chain (residuals inherit bit-exactness, so "
        "even the BOOLEAN flags hash-compare).  The mean-abs fold runs "
        "over the ORDERED residual list with the zero-prepended-reduce "
        "recipe spelled identically in both engines — no order-"
        "dependent float sum anywhere.  Scale: identical to the HW "
        "entry (per-key collapsed series). "
        "plans/events.py:events_anomaly_hw.",
    tags=("events", "window"),
)
def events_anomaly_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    series = _hw_series(e)

    step, init = _hw_step, _hw_init()
    n = F.size("cnts")
    st = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.aggregate(F.slice(F.col("cnts"), F.lit(1), i),
                              init, step))
    base = series.withColumn("st", st).withColumn("n", n)
    fc = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: F.when(i == 1, F.lit(0.0)).otherwise(
            F.element_at("st", (i - 1).cast("int")).getField("l")
            + F.element_at("st", (i - 1).cast("int")).getField("b")
            + F.element_at("st", (i - 1).cast("int")).getField("s1")))
    base = base.withColumn("fc", fc)
    res = F.transform(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: F.element_at("cnts", i.cast("int"))
        - F.element_at("fc", i.cast("int")))
    base = base.withColumn("res", res)
    mar = (F.aggregate(
        F.slice(F.col("res"), F.lit(8),
                F.greatest(F.col("n") - 7, F.lit(0))),
        F.lit(0.0), lambda a, b: a + F.abs(b))
        / F.greatest(F.col("n") - 7, F.lit(1)))
    base = base.withColumn("mar", mar)
    rows = base.select(
        "event_type", "mar",
        F.posexplode(F.arrays_zip("days", "raw", "fc", "res"))
         .alias("_i", "z"))
    return (rows.select(
        "event_type",
        F.col("z.days").alias("day"),
        F.col("z.raw").cast("bigint").alias("n_events"),
        F.round(F.col("z.fc"), 6).alias("forecast"),
        F.round(F.col("z.res"), 6).alias("residual"),
        ((F.col("_i") + 1 > 7)
         & (F.abs(F.col("z.res")) > 3 * F.col("mar")))
        .alias("is_anomaly"))
        .orderBy("event_type", "day"))


@register(
    "events_error_rate_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT day, n_total, n_errors,
       ROUND(n_errors * 1.0 / n_total, 6) AS error_rate,
       CAST(SUM(n_errors) OVER w AS BIGINT) AS errors_7d,
       CAST(SUM(n_total) OVER w AS BIGINT) AS total_7d,
       ROUND(SUM(n_errors) OVER w * 1.0 / SUM(n_total) OVER w, 6)
           AS error_rate_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
""",
    doc="Daily error rate with a 7-day trailing window — the SLO "
        "dashboard row beside the burn-rate entry: exact integer "
        "counts, rates as integer ratios, the trailing aggregates from "
        "a ROWS window over the DAYS-sized aggregate (global ordering "
        "over a reduced input — exempted by the plan sweep's "
        "Aggregate-below rule, and genuinely tiny at any corpus "
        "scale). plans/events.py:events_error_rate_daily.",
    tags=("events", "aggregate", "window"),
)
def events_error_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    e = table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"),
                  F.sum(F.when(F.col("event_type") == "error", 1)
                        .otherwise(0)).cast("bigint").alias("n_errors")))
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return (daily.select(
        "day", "n_total", "n_errors",
        F.round(F.col("n_errors") * F.lit(1.0) / F.col("n_total"), 6)
         .alias("error_rate"),
        F.sum("n_errors").over(w).cast("bigint").alias("errors_7d"),
        F.sum("n_total").over(w).cast("bigint").alias("total_7d"),
        F.round(F.sum("n_errors").over(w) * F.lit(1.0)
                / F.sum("n_total").over(w), 6).alias("error_rate_7d"))
        .orderBy("day"))


@register(
    "events_growth_accounting_weekly",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
), firsts AS (
  SELECT user_id, MIN(wk) AS first_wk FROM activity GROUP BY user_id
), weeks AS (
  SELECT DISTINCT wk FROM activity
), states AS (
  SELECT w.wk, a.user_id,
         CASE WHEN f.first_wk = w.wk THEN 'new'
              WHEN EXISTS (SELECT 1 FROM activity p
                           WHERE p.user_id = a.user_id
                             AND p.wk = w.wk - INTERVAL 7 DAY)
                   THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM weeks w
  JOIN activity a ON a.wk = w.wk
  JOIN firsts f ON f.user_id = a.user_id
), churned AS (
  SELECT w.wk, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM weeks w
  JOIN activity p ON p.wk = w.wk - INTERVAL 7 DAY
  WHERE NOT EXISTS (SELECT 1 FROM activity c
                    WHERE c.user_id = p.user_id AND c.wk = w.wk)
  GROUP BY w.wk
)
SELECT CAST(s.wk AS TIMESTAMP) AS week,
       CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_resurrected,
       CAST(COALESCE(MAX(c.n_churned), 0) AS BIGINT) AS n_churned
FROM states s LEFT JOIN churned c ON c.wk = s.wk
GROUP BY s.wk ORDER BY week
""",
    doc="Weekly growth accounting (the Amplitude/Social-Capital "
        "framework): every active user classified new / retained / "
        "resurrected per week, plus the churned count (active last "
        "week, absent this week) — the decomposition that tells a "
        "growth team WHERE a WAU change came from, one level deeper "
        "than the DAU/WAU/MAU row.  All exact integer counts from the "
        "state-space-sized distinct (user, week) table: one distinct "
        "collapse, one per-user min, self-joins keyed on "
        "(user, adjacent-week).  plans/events.py:events_growth_acct.",
    tags=("events", "aggregate"),
)
def events_growth_acct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    activity = (e.select("user_id",
                         F.date_trunc("week", "ts").alias("wk"))
                .distinct().transform(materialize))
    firsts = activity.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    prev = activity.select(F.col("user_id").alias("p_user"),
                           (F.col("wk")
                            + F.expr("INTERVAL 7 DAYS")).alias("p_next"))
    cur = activity.join(firsts, "user_id")
    state = (cur.join(prev, (prev["p_user"] == cur["user_id"])
                      & (prev["p_next"] == cur["wk"]), "left")
             .select("wk", "user_id",
                     F.when(F.col("first_wk") == F.col("wk"), "new")
                      .when(F.col("p_user").isNotNull(), "retained")
                      .otherwise("resurrected").alias("state")))
    per_wk = (state.groupBy("wk")
              .agg(F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
                    .cast("bigint").alias("n_new"),
                   F.sum(F.when(F.col("state") == "retained", 1)
                         .otherwise(0)).cast("bigint").alias("n_retained"),
                   F.sum(F.when(F.col("state") == "resurrected", 1)
                         .otherwise(0)).cast("bigint")
                    .alias("n_resurrected")))
    # churned at week w: active at w-1, absent at w (only weeks that
    # exist in the spine, matching the oracle's weeks CTE)
    weeks = activity.select("wk").distinct()
    prev_act = activity.select(F.col("user_id").alias("c_user"),
                               (F.col("wk") + F.expr("INTERVAL 7 DAYS"))
                               .alias("wk"))
    still = activity.select(F.col("user_id").alias("c_user"), "wk")
    churn = (weeks.join(prev_act, "wk")
             .join(still, ["wk", "c_user"], "left_anti")
             .groupBy("wk")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned")))
    return (per_wk.join(churn, "wk", "left")
            .select(F.col("wk").cast("timestamp_ntz").alias("week"),
                    "n_new", "n_retained", "n_resurrected",
                    F.coalesce(F.col("n_churned"), F.lit(0))
                     .cast("bigint").alias("n_churned"))
            .orderBy("week"))


@register(
    "events_hourly_profile",
    oracle="""
WITH cells AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
), totals AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
         CAST(MAX(n) AS BIGINT) AS peak_n
  FROM cells GROUP BY event_type
)
SELECT c.event_type, c.hr, c.n,
       ROUND(24.0 * c.n / t.total, 6) AS hourly_index,
       (c.n = t.peak_n) AS is_peak
FROM cells c JOIN totals t USING (event_type)
ORDER BY c.event_type, c.hr
""",
    doc="Hour-of-day activity profile per event type: 24 cells with "
        "the hourly index 24n/total (1.0 = flat) and a peak-hour flag "
        "— the diurnal half of the seasonality pair (the dow entry is "
        "the weekly half); capacity planning and anomaly baselines "
        "both start here.  Counts exact, index one integer ratio, the "
        "peak flag an integer comparison (ties flag every maximal "
        "hour — deterministic).  One (type, hour) partial-agg "
        "shuffle, 24x|types| cells out. "
        "plans/events.py:events_hourly_profile.",
    tags=("events", "aggregate"),
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    cells = (e.select("event_type", F.hour("ts").cast("int").alias("hr"))
             .groupBy("event_type", "hr")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    totals = (cells.groupBy("event_type")
              .agg(F.sum("n").cast("bigint").alias("total"),
                   F.max("n").cast("bigint").alias("peak_n")))
    return (cells.join(totals, "event_type")
            .select("event_type", "hr", "n",
                    F.round(F.lit(24.0) * F.col("n") / F.col("total"), 6)
                     .alias("hourly_index"),
                    (F.col("n") == F.col("peak_n")).alias("is_peak"))
            .orderBy("event_type", "hr"))
