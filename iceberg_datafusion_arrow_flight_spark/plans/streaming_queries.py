"""Driver-visible streaming correctness rows (VERDICT r7 ask #6).

The streaming surface (streaming/jobs.py) is invariant-pytested, but
pytests are not driver-checkable.  Each entry here runs a REAL
Structured Streaming job inside ``build()`` — deterministic
micro-batched fixture in a temp dir, availableNow trigger, drained to
completion — and returns the job's FINAL STATE as a DataFrame whose
DuckDB oracle is the batch recompute over the same parquet input.  The
batch-equivalence invariant each job is designed around (mergeable
max-hash reservoir, incremental-MV refresh identity, CDC
last-writer-wins collapse) is what makes a one-plan SQL oracle possible.

Same in-build-orchestration precedent as ``service_flight_roundtrip``
(a real gRPC server inside build()); results are materialized BEFORE
the temp fixture is deleted and returned via createDataFrame so the
driver's collect never touches removed paths.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register, table


def _drain(query, timeout: int = 300) -> None:
    query.awaitTermination(timeout)
    if query.isActive:  # pragma: no cover - hang guard
        query.stop()
        raise TimeoutError("streaming query did not drain")


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    rows = df.collect()
    return spark.createDataFrame(rows, df.schema)


def _write_batch(src: str, df: DataFrame, t: int) -> None:
    """Append ``df`` as one parquet file under ``src`` stamped with an
    explicit mtime: the file source replays new files in modification-
    time order, so strictly-increasing stamps pin the micro-batch
    replay order deterministically (uuid part names carry no order).
    Shared by every mtime-pinned fixture below — fix ordering logic
    HERE, not per entry."""
    before = set(os.listdir(src))
    df.coalesce(1).write.mode("append").parquet(src)
    for f in set(os.listdir(src)) - before:
        if f.endswith(".parquet"):
            os.utime(os.path.join(src, f), (t, t))



@register(
    "stream_reservoir_vs_batch_topk",
    oracle="""
SELECT id, priority FROM (
  SELECT DISTINCT CAST(event_id AS BIGINT) AS id,
         md5('reservoir-v1' || CAST(event_id AS VARCHAR)) AS priority
  FROM events)
ORDER BY priority, id
LIMIT 100
""",
    doc="Streamed uniform reservoir sample == batch top-k-by-hash over "
        "the same input, as a driver-oracled row: the events table is "
        "re-written as a 4-file fixture, streamed one file per "
        "micro-batch through streaming.stream_reservoir_sample (the "
        "mergeable max-hash formulation: priority = md5(seed||id), "
        "reservoir = k smallest, folded per batch against the persisted "
        "reservoir with a crash-recoverable rename-aside swap), and the "
        "final on-disk reservoir is returned.  Because top-k-by-hash is "
        "associative, commutative, and duplicate-idempotent, the result "
        "is bit-identical to the one-shot batch top-k DuckDB computes — "
        "independent of batch boundaries, ordering, or at-least-once "
        "replays.  Scale: per-batch work is batch+k rows, state is k "
        "rows; a sampler fleet merges by the same top-k. "
        "streaming/jobs.py:stream_reservoir_sample.",
    tags=("streaming", "dedup"),
)
def stream_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_reservoir_sample

    events = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")
    work = tempfile.mkdtemp(prefix="stream_reservoir_")
    try:
        src = os.path.join(work, "src")
        events.repartition(4).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        state = os.path.join(work, "state")
        _drain(stream_reservoir_sample(stream, "event_id", state, k=100))
        final = (spark.read.parquet(os.path.join(state, "reservoir"))
                 .orderBy("priority", "id")
                 .select("id", "priority"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_mv_hourly_rollup",
    oracle="""
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_centi,
       CAST(MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS min_centi,
       CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_centi
FROM events
GROUP BY bucket, event_type
ORDER BY bucket, event_type
""",
    doc="Streaming materialized view == full recompute, as a "
        "driver-oracled row: events stream micro-batched (3 files, one "
        "per trigger) through streaming.stream_events_with_rollup — per "
        "batch one exactly-once append snapshot into an iceberg_lite "
        "events table plus one incremental hourly-rollup MERGE that "
        "reads ONLY the batch's delta (the TimescaleDB continuous-"
        "aggregate refresh shape) — then the final rollup table is "
        "returned and must equal DuckDB's one-shot hourly aggregate "
        "over the raw input.  value is folded to exact integer "
        "centi-units BEFORE streaming so the incremental merge's "
        "re-additions are order-independent and the comparison is "
        "bit-exact (sums stay far below 2^53).  Scale: raw rows are "
        "touched once per batch; refresh work is the batch's touched "
        "buckets, never table history. "
        "streaming/jobs.py:stream_events_with_rollup, "
        "operators/rollup_ts.py:refresh_rollup_incremental.",
    tags=("streaming", "events", "iceberg"),
)
def stream_mv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg_lite import SqliteCatalog
    from ..streaming.jobs import stream_events_with_rollup

    events = (table(spark, sf_dir, "events")
              .select("event_id", "ts", "event_type",
                      F.floor(F.col("value") * 100 + 0.5).cast("double")
                       .alias("value")))
    work = tempfile.mkdtemp(prefix="stream_mv_")
    try:
        src = os.path.join(work, "src")
        events.repartition(3).write.mode("overwrite").parquet(src)
        cat = SqliteCatalog(os.path.join(work, "cat.db"),
                            warehouse=os.path.join(work, "wh"))
        ev = cat.create_table("mv", "events", events)
        from ..operators.rollup_ts import bucket_aggregate
        agg = cat.create_table(
            "mv", "hourly",
            bucket_aggregate(events, "ts", "1 hour", ["event_type"]))
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        _drain(stream_events_with_rollup(
            stream, ev, agg, ckpt_dir=os.path.join(work, "ckpt"),
            keys=["event_type"]))
        final = (agg.read(spark)
                 .select("bucket", "event_type",
                         F.col("n").cast("bigint").alias("n"),
                         F.col("sum_value").cast("bigint")
                          .alias("sum_centi"),
                         F.col("min_value").cast("bigint")
                          .alias("min_centi"),
                         F.col("max_value").cast("bigint")
                          .alias("max_centi"))
                 .orderBy("bucket", "event_type"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_cdc_last_writer_wins",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS okey,
       CAST(CASE WHEN o_orderkey % 2 = 0 THEN 2 ELSE 1 END AS INT)
           AS version,
       CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
            ELSE o_totalprice END AS val
FROM orders
WHERE o_orderkey <= 4000 AND o_orderkey % 5 <> 0
ORDER BY okey
""",
    doc="CDC apply == last-writer-wins, as a driver-oracled row: a "
        "deterministic two-batch change feed derived from orders "
        "(batch 1 inserts version-1 rows for every key <= 4000; batch "
        "2 upserts version-2 doubled values for even keys and "
        "tombstones every key % 5 == 0) streams through "
        "streaming.stream_cdc_apply in equality-delete mode — per "
        "batch ONE merge-on-read snapshot carrying the upsert rows "
        "plus one equality-delete file, strict-sequence so "
        "delete-then-reinsert stays correct — and the final table "
        "state must equal the SQL last-writer-wins collapse DuckDB "
        "computes directly.  Batch order is pinned by explicit file "
        "mtimes (the file source orders by modification time).  val*2 "
        "is an exponent bump on the double — bit-exact in both "
        "engines.  Scale: per batch O(batch) with zero table reads; "
        "delete state folds at the periodic compact. "
        "streaming/jobs.py:stream_cdc_apply.",
    tags=("streaming", "iceberg"),
)
def stream_cdc_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg_lite import SqliteCatalog
    from ..streaming.jobs import stream_cdc_apply

    base = (table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") <= 4000)
            .select(F.col("o_orderkey").cast("bigint").alias("okey"),
                    F.col("o_totalprice").alias("price")))
    b1 = base.select(
        "okey", F.lit(1).cast("int").alias("version"),
        F.col("price").alias("val"),
        F.lit(1).cast("long").alias("seq"), F.lit("upsert").alias("op"))
    b2_up = (base.where((F.col("okey") % 2 == 0) & (F.col("okey") % 5 != 0))
             .select("okey", F.lit(2).cast("int").alias("version"),
                     (F.col("price") * 2).alias("val"),
                     F.lit(2).cast("long").alias("seq"),
                     F.lit("upsert").alias("op")))
    b2_del = (base.where(F.col("okey") % 5 == 0)
              .select("okey", F.lit(0).cast("int").alias("version"),
                      F.lit(None).cast("double").alias("val"),
                      F.lit(2).cast("long").alias("seq"),
                      F.lit("delete").alias("op")))
    work = tempfile.mkdtemp(prefix="stream_cdc_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)

        # strictly-increasing mtimes: the change batches replay in feed
        # order (see module-level _write_batch)
        _write_batch(src, b1, 1_700_000_000)
        _write_batch(src, b2_up.unionByName(b2_del), 1_700_000_100)
        cat = SqliteCatalog(os.path.join(work, "cat.db"),
                            warehouse=os.path.join(work, "wh"))
        mirror = cat.create_table(
            "cdc", "orders_mirror",
            b1.select("okey", "version", "val", "seq"))
        stream = (spark.readStream.schema(b1.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        _drain(stream_cdc_apply(stream, mirror, key_cols=["okey"],
                                order_col="seq", op_col="op",
                                ckpt_dir=os.path.join(work, "ckpt")))
        final = (mirror.read(spark)
                 .select("okey", "version", "val").orderBy("okey"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_tumbling_finalized_vs_batch",
    oracle="""
WITH cutoff AS (
  SELECT MAX(ts) - INTERVAL 2 HOUR AS c FROM events
)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_centi
FROM events, cutoff
GROUP BY window_start, event_type, c
HAVING window_start + INTERVAL 1 HOUR <= c
ORDER BY window_start, event_type
""",
    doc="Append-mode watermark finalization == batch recompute, as a "
        "driver-oracled row: the events stream (3 micro-batched files) "
        "runs through a 1-hour tumbling aggregation under a 2-hour "
        "watermark into a memory sink in APPEND mode — so the emitted "
        "set is exactly the windows whose end the final watermark "
        "(max event time − 2 h) passed, the late-data eviction "
        "contract itself — and must equal DuckDB's batch aggregation "
        "restricted to the same finalized windows.  Values fold to "
        "integer centi-units pre-stream so both sums are exact.  "
        "Windows still open at end-of-backlog stay in state on BOTH "
        "sides by construction.  Scale: standard watermarked streaming "
        "agg — state is open-window cardinality, eviction is the "
        "watermark's job. streaming/jobs.py shapes + "
        "plans/streaming_queries.py.",
    tags=("streaming", "events"),
)
def stream_tumbling_finalized(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    events = (table(spark, sf_dir, "events")
              .select("event_id", "ts", "event_type",
                      F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                       .alias("centi")))
    work = tempfile.mkdtemp(prefix="stream_tumbling_")
    name = "tumbling_fin_" + os.path.basename(work)[-8:]
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)

        # micro-batches split by TIME and replayed chronologically:
        # with arbitrary splits the watermark lags the final batch and
        # the end-of-backlog flush is split-dependent (measured: 3
        # random splits emitted 3,018 of 3,370 finalized windows);
        # chronological batches make the final no-data flush see the
        # global watermark — and it is how event time actually arrives
        for i, (lo, hi) in enumerate((("2024-01-01", "2024-01-11"),
                                      ("2024-01-11", "2024-01-21"),
                                      ("2024-01-21", "2024-02-01"))):
            _write_batch(src, events.where((F.col("ts") >= lo)
                                           & (F.col("ts") < hi)),
                         1_700_000_000 + i)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  # a watermark needs TIMESTAMP (with tz); the parquet
                  # roundtrip can surface TIMESTAMP_NTZ under a plain
                  # driver session
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        agg = (stream.withWatermark("ts", "2 hours")
               .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                    F.sum("centi").cast("bigint").alias("sum_centi"))
               .select(F.col("w.start").alias("window_start"),
                       "event_type", "n_events", "sum_centi"))
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .start())
        _drain(q)
        final = (spark.table(name)
                 .orderBy("window_start", "event_type"))
        return _materialize(spark, final)
    finally:
        spark.catalog.dropTempView(name) if name in [
            t.name for t in spark.catalog.listTables()] else None
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_countmin_partials_merge",
    oracle=r"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\s+')) AS v FROM documents
), rows_ AS (
  SELECT d, v FROM tok CROSS JOIN (SELECT unnest([0,1,2,3]) AS d)
)
SELECT d,
       CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || '|' || v),
                            1, 8))::UBIGINT % 256 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS c
FROM rows_
GROUP BY 1, 2 ORDER BY 1, 2
""",
    doc="Folded streaming count-min partials == the one-shot batch "
        "sketch, BIT-FOR-BIT, as a driver-oracled row: document tokens "
        "stream in 4 micro-batches through "
        "streaming.stream_countmin_partials (each batch appends its own "
        "4x256 partial sketch; no per-key state in the job at all), the "
        "partials fold by bin addition (merged_countmin), and because "
        "sketch merge is cell-wise addition — associative, commutative "
        "— the fold equals the sketch of the union regardless of batch "
        "boundaries.  The md5-derived bucket hash computes identically "
        "in DuckDB, so the oracle checks the full d*w table, not just "
        "error bounds.  Scale: per-batch shuffle volume is d*w; a "
        "100 TB/day fleet appends partials and a periodic compact folds "
        "them with this exact groupBy-sum. "
        "streaming/jobs.py:stream_countmin_partials,merged_countmin.",
    tags=("streaming", "sketch", "approx"),
)
def stream_countmin_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T
    from ..streaming.jobs import merged_countmin, stream_countmin_partials

    toks = (table(spark, sf_dir, "documents")
            .select(F.explode(T.ws_tokens(F.col("text"))).alias("v")))
    work = tempfile.mkdtemp(prefix="stream_cm_")
    try:
        src = os.path.join(work, "src")
        toks.repartition(4).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(toks.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = os.path.join(work, "partials")
        _drain(stream_countmin_partials(stream, "v", out,
                                        depth=4, width=256))
        final = (merged_countmin(spark, out)
                 .select("d", "bucket", F.col("c").cast("bigint").alias("c"))
                 .orderBy("d", "bucket"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_dedup_ingest_kept_set",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_sort(list_distinct(string_split_regex(text, '\s+'))) AS ts
  FROM documents
), pairs AS MATERIALIZED (
  -- lossless PPJoin size filter first: J >= 9/10 forces
  -- 10*|A| >= 9*|B| both ways, a cheap length compare that prunes
  -- most of the quadratic space before the list_intersect runs
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  WHERE 10 * len(a.ts) >= 9 * len(b.ts)
    AND 10 * len(b.ts) >= 9 * len(a.ts)
    AND 10 * len(list_intersect(a.ts, b.ts))
        >= 9 * len(list_distinct(list_concat(a.ts, b.ts)))
), edges AS MATERIALIZED (
  -- symmetrized pair graph: every witness check below is then a pure
  -- EQUI semi/anti join (an OR-of-directions join condition forces a
  -- nested-loop plan that never finishes at sf0.1)
  SELECT ia AS x, ib AS y FROM pairs
  UNION ALL
  SELECT ib AS x, ia AS y FROM pairs
), b0 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 0),
   b1 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1),
   b2 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 2),
   b3 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3),
k0 AS (
  SELECT doc_id FROM b0 d WHERE NOT EXISTS (
    SELECT 1 FROM pairs p JOIN b0 w ON p.ia = w.doc_id
    WHERE p.ib = d.doc_id)
), k1 AS (
  SELECT doc_id FROM b1 d
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e JOIN k0 w ON e.x = w.doc_id
    WHERE e.y = d.doc_id)
  AND NOT EXISTS (
    SELECT 1 FROM pairs p JOIN b1 w ON p.ia = w.doc_id
    WHERE p.ib = d.doc_id)
), k01 AS (SELECT doc_id FROM k0 UNION ALL SELECT doc_id FROM k1),
k2 AS (
  SELECT doc_id FROM b2 d
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e JOIN k01 w ON e.x = w.doc_id
    WHERE e.y = d.doc_id)
  AND NOT EXISTS (
    SELECT 1 FROM pairs p JOIN b2 w ON p.ia = w.doc_id
    WHERE p.ib = d.doc_id)
), k012 AS (SELECT doc_id FROM k01 UNION ALL SELECT doc_id FROM k2),
k3 AS (
  SELECT doc_id FROM b3 d
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e JOIN k012 w ON e.x = w.doc_id
    WHERE e.y = d.doc_id)
  AND NOT EXISTS (
    SELECT 1 FROM pairs p JOIN b3 w ON p.ia = w.doc_id
    WHERE p.ib = d.doc_id)
), kept AS (SELECT doc_id FROM k012 UNION ALL SELECT doc_id FROM k3)
SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN kept USING (doc_id)
ORDER BY d.doc_id
""",
    doc="Dedup-at-ingest kept set == the sequential pair-free collapse, "
        "as a driver-oracled row: documents stream in 4 deterministic "
        "micro-batches (doc_id %% 4, replayed in order via explicit "
        "file mtimes) through streaming.stream_dedup_ingest — each "
        "batch minhashes ONLY its own docs, probes the accumulated LSH "
        "band index, exact-verifies (token Jaccard >= 0.9), drops "
        "within-batch larger-ids and any doc matching an indexed doc, "
        "appends the novel remainder — and the final kept/ table must "
        "equal DuckDB's unrolled 4-step simulation over the EXHAUSTIVE "
        "verified-pair graph (LSH(16x4) finds every qualifying pair "
        "with P[miss] ~ 4e-8, the same identity dedup_minhash_lsh "
        "pins; spurious band-hash collisions only ADD candidates that "
        "exact-verify, so they cannot diverge).  Scale: per-batch work "
        "is batch + collisions, never corpus history; the index is the "
        "only state and lives in a table. "
        "streaming/jobs.py:stream_dedup_ingest.",
    tags=("streaming", "dedup"),
)
def stream_dedup_ingest_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import stream_dedup_ingest

    docs = (table(spark, sf_dir, "documents")
            .select("doc_id", "text",
                    F.col("n_chars").cast("bigint").alias("n_chars")))
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)

        # one file per doc_id-residue bucket, replayed in bucket order
        for b in range(4):
            _write_batch(src, docs.where(F.col("doc_id") % 4 == b),
                         1_700_000_000 + b)
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        state = os.path.join(work, "state")
        _drain(stream_dedup_ingest(stream, state))
        final = (spark.read.parquet(os.path.join(state, "kept"))
                 .select("doc_id", "n_chars").orderBy("doc_id"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_join_purchase_after_signup",
    oracle="""
SELECT s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events s
JOIN events p
  ON p.user_id = s.user_id
 AND s.event_type = 'signup' AND p.event_type = 'purchase'
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
ORDER BY s.user_id, signup_ts, purchase_ts
""",
    doc="Stream-stream INNER self-join == the batch join, as a driver-"
        "oracled row: the events table streams in 3 chronological "
        "micro-batches through streaming.purchase_after_signup (both "
        "sides watermarked 2 h; the time-range predicate bounds join "
        "state) and the matched set must equal DuckDB's one-shot "
        "interval self-join.  For an INNER stream-stream join the "
        "matched set is batch-boundary-INVARIANT — each match emits in "
        "whichever micro-batch delivers the later side, so by backlog "
        "drain the output equals the batch join regardless of splits; "
        "watermarks only bound state, never the result (the OUTER "
        "variant's null-padding is watermark-dependent and stays "
        "invariant-pytested).  Scale: state is the in-horizon window "
        "per side, evicted as the watermark passes signup_ts + "
        "horizon. streaming/jobs.py:purchase_after_signup.",
    tags=("streaming", "join", "events"),
)
def stream_join_pas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import purchase_after_signup

    events = (table(spark, sf_dir, "events")
              .select("event_id", "ts", "user_id", "event_type", "value"))
    work = tempfile.mkdtemp(prefix="stream_join_")
    name = "pas_" + os.path.basename(work)[-8:]
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)

        for i, (lo, hi) in enumerate((("2024-01-01", "2024-01-11"),
                                      ("2024-01-11", "2024-01-21"),
                                      ("2024-01-21", "2024-02-01"))):
            _write_batch(src, events.where((F.col("ts") >= lo)
                                           & (F.col("ts") < hi)),
                         1_700_000_000 + i)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        joined = purchase_after_signup(stream, horizon="1 hour")
        q = (joined.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .start())
        _drain(q)
        final = (spark.table(name)
                 .select("user_id",
                         F.col("signup_ts").cast("timestamp_ntz"),
                         F.col("purchase_ts").cast("timestamp_ntz"),
                         "purchase_value")
                 .orderBy("user_id", "signup_ts", "purchase_ts"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_stateful_running_totals",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(COALESCE(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 0))
            AS BIGINT) AS total_centi
FROM events GROUP BY user_id ORDER BY user_id
""",
    doc="Custom stateful operator == batch aggregate, as a driver-"
        "oracled row (the 8th and final streaming job to gain one): "
        "events stream in 3 micro-batches through "
        "streaming.user_running_totals_stateful "
        "(applyInPandasWithState, update mode — per-user (count, sum) "
        "state in the state store, one updated row per key per batch) "
        "and the LAST emitted row per user — selected by max n_events, "
        "monotone by construction — must equal DuckDB's one-shot "
        "per-user aggregate.  value is folded to exact integer "
        "centi-units BEFORE streaming so the state's float accumulator "
        "only ever holds integers (< 2^53): accumulation order across "
        "batches cannot perturb it, which is what makes the stateful "
        "path hash-oracle-able at all.  Scale: state is one row per "
        "live user, Arrow-batched per key group; a production variant "
        "adds an event-time timeout for eviction (documented in the "
        "job). streaming/jobs.py:user_running_totals_stateful.",
    tags=("streaming", "events", "aggregate"),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.jobs import user_running_totals_stateful

    events = (table(spark, sf_dir, "events")
              .select("event_id", "ts", "user_id",
                      F.floor(F.col("value") * 100 + 0.5).cast("double")
                       .alias("value")))
    work = tempfile.mkdtemp(prefix="stream_state_")
    name = "totals_" + os.path.basename(work)[-8:]
    try:
        src = os.path.join(work, "src")
        events.repartition(3).write.mode("overwrite").parquet(src)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        q = (user_running_totals_stateful(stream)
             .writeStream.format("memory").queryName(name)
             .outputMode("update").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .start())
        _drain(q)
        # update mode: one row per (user, batch-it-appeared-in); the
        # final totals are the row with the largest n_events (monotone).
        final = (spark.table(name)
                 .groupBy("user_id")
                 .agg(F.max(F.struct("n_events", "total_value"))
                      .alias("m"))
                 .select(F.col("user_id").cast("bigint").alias("user_id"),
                         F.col("m.n_events").cast("bigint")
                          .alias("n_events"),
                         F.col("m.total_value").cast("bigint")
                          .alias("total_centi"))
                 .orderBy("user_id"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_session_finalized_vs_batch",
    oracle="""
WITH cut AS (
  SELECT MAX(ts) - INTERVAL 2 HOUR AS c FROM events
), e AS (
  SELECT user_id, ts,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS centi
  FROM events
), flag AS (
  SELECT user_id, ts, centi,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS brk
  FROM e
), grp AS (
  SELECT user_id, ts, centi,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(centi) AS BIGINT) AS sum_centi
FROM grp, cut
GROUP BY user_id, sid, c
HAVING MAX(ts) + INTERVAL 30 MINUTE <= c
ORDER BY user_id, session_start
""",
    doc="Session-window streaming == batch gap-sessionization, as a "
        "driver-oracled row (the 9th streaming job to gain one, and "
        "the registry row for streaming/jobs.py:session_aggregates "
        "which previously had only a pytest): the events stream (3 "
        "chronological micro-batches) runs through "
        "F.session_window(ts, '30 minutes') under a 2-hour watermark "
        "in APPEND mode, so the emitted set is exactly the sessions "
        "the final watermark finalized — and must equal DuckDB's "
        "lag/cumsum island sessionization restricted to the same "
        "finalized set (session end = last event + gap, the "
        "session_window contract; merge condition is STRICT "
        "next < prev_end on both sides).  Values fold to centi-units "
        "pre-stream so sums hash exactly.  Scale: state is one row "
        "per OPEN session, merged/evicted by the watermark — the "
        "unbounded-user sessionization a batch lag/cumsum cannot do "
        "incrementally. plans/streaming_queries.py:"
        "stream_session_finalized.",
    tags=("streaming", "events"),
)
def stream_session_finalized(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    events = (table(spark, sf_dir, "events")
              .select("event_id", "ts", "user_id",
                      F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                       .alias("centi")))
    work = tempfile.mkdtemp(prefix="stream_session_")
    name = "session_fin_" + os.path.basename(work)[-8:]
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        for i, (lo, hi) in enumerate((("2024-01-01", "2024-01-11"),
                                      ("2024-01-11", "2024-01-21"),
                                      ("2024-01-21", "2024-02-01"))):
            _write_batch(src, events.where((F.col("ts") >= lo)
                                           & (F.col("ts") < hi)),
                         1_700_000_000 + i)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        agg = (stream.withWatermark("ts", "2 hours")
               .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                        "user_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                    F.sum("centi").cast("bigint").alias("sum_centi"))
               .select("user_id",
                       F.col("w.start").alias("session_start"),
                       F.col("w.end").alias("session_end"),
                       "n_events", "sum_centi"))
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .start())
        _drain(q)
        final = (spark.table(name)
                 .orderBy("user_id", "session_start"))
        return _materialize(spark, final)
    finally:
        if name in [t.name for t in spark.catalog.listTables()]:
            spark.catalog.dropTempView(name)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_outer_join_finalized",
    oracle="""
WITH s AS (
  SELECT user_id, ts AS signup_ts FROM events
  WHERE event_type = 'signup'
), p AS (
  SELECT user_id AS p_user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), w AS (
  SELECT least((SELECT max(signup_ts) FROM s),
               (SELECT max(purchase_ts) FROM p))
         - INTERVAL 2 HOUR AS wm
)
SELECT s.user_id, s.signup_ts, p.purchase_ts, p.purchase_value
FROM s
LEFT JOIN p
  ON p.p_user_id = s.user_id
 AND p.purchase_ts > s.signup_ts
 AND p.purchase_ts <= s.signup_ts + INTERVAL 1 HOUR, w
WHERE s.signup_ts <= w.wm - INTERVAL 1 HOUR - INTERVAL 1 MINUTE
ORDER BY s.user_id, s.signup_ts, p.purchase_ts
""",
    doc="LEFT OUTER stream-stream join, FINALIZED subset == the batch "
        "left join, as a driver-oracled row — the conversion funnel's "
        "missing half (VERDICT r10 ask #5; the inner matched set "
        "gained its row in r10).  The outer join's null-padded rows "
        "are watermark-DEPENDENT in general, but become deterministic "
        "on the finalized prefix: with chronological micro-batches "
        "drained to completion, the final global watermark is "
        "W = min(max signup_ts, max purchase_ts) - 2 h (Spark's "
        "default min multipleWatermarkPolicy over the two 2 h side "
        "watermarks), and every signup with signup_ts + horizon "
        "provably behind W has either emitted its matches (batch-"
        "boundary-invariant, the r10 inner argument) or been evicted "
        "WITH its null-padded row by the post-data no-data batch "
        "(SPARK-24156).  Both engines restrict to signups a 1-minute "
        "guard strictly inside that frontier — the boundary row's "
        "eviction strictness is the one engine-private bit, so it is "
        "excluded symmetrically rather than assumed.  State at scale "
        "is the in-horizon window per side, identical to the inner "
        "entry. streaming/jobs.py:purchase_after_signup_outer.",
    tags=("streaming", "join", "events"),
)
def stream_outer_join_finalized(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from ..streaming.jobs import purchase_after_signup_outer

    events = (table(spark, sf_dir, "events")
              .select("event_id", "ts", "user_id", "event_type", "value"))
    cut = (events.agg(
        (F.least(
            F.max(F.when(F.col("event_type") == "signup", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))))
         - F.expr("INTERVAL 3 HOURS 1 MINUTE")).alias("c")).first()["c"])
    work = tempfile.mkdtemp(prefix="stream_ojoin_")
    name = "oj_" + os.path.basename(work)[-8:]
    try:
        src = os.path.join(work, "src")
        os.makedirs(src)
        for i, (lo, hi) in enumerate((("2024-01-01", "2024-01-11"),
                                      ("2024-01-11", "2024-01-21"),
                                      ("2024-01-21", "2024-02-01"))):
            _write_batch(src, events.where((F.col("ts") >= lo)
                                           & (F.col("ts") < hi)),
                         1_700_000_000 + i)
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src)
                  .withColumn("ts", F.col("ts").cast("timestamp")))
        joined = purchase_after_signup_outer(stream, horizon="1 hour")
        q = (joined.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .start())
        _drain(q)
        final = (spark.table(name)
                 .where(F.col("signup_ts") <= F.lit(cut))
                 .select("user_id",
                         F.col("signup_ts").cast("timestamp_ntz"),
                         F.col("purchase_ts").cast("timestamp_ntz"),
                         "purchase_value")
                 .orderBy("user_id", "signup_ts", "purchase_ts"))
        return _materialize(spark, final)
    finally:
        shutil.rmtree(work, ignore_errors=True)
