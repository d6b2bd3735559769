"""Iceberg table lifecycle, exercised end-to-end (SURVEY §2.1 rows 1/5/6).

The reference's core identity — the thing every one of its queries sits on —
is a catalog-managed Iceberg table: DataFusion reads through the catalog
(iceberg-datafusion-arrow-flight/src/lib.rs:94-103), and INSERTs commit
snapshots atomically (iceberg-datafusion-arrow-flight-sql/src/main.rs:73,
-rest/src/main.rs:62-90).  Round 1 only *configured* that path; these
queries run the actual lifecycle through
:mod:`..sources.iceberg_lite`:

    CREATE TABLE → INSERT (snapshot 1) → INSERT (snapshot 2)
    → read current / time-travel to snapshot 1 → aggregate

The writes land in a per-run temp warehouse; the *output* of each query is
an aggregate over fixture data, so the oracle is plain SQL over the same
Parquet and the driver's hash check applies unchanged.

Scale: writes are executor-side ``df.write.parquet``; the commit is a
KB-sized metadata CAS; reads scan exactly the manifest's file list — the
lifecycle cost is independent of table size.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.iceberg_lite import SqliteCatalog
from .base import register, table
from ..operators.materialize import materialize


def _fresh_catalog() -> SqliteCatalog:
    root = tempfile.mkdtemp(prefix="spark_graft_iceberg_")
    return SqliteCatalog(os.path.join(root, "catalog.db"),
                         warehouse=os.path.join(root, "warehouse"))


def _split_orders(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = table(spark, sf_dir, "orders")
    return (orders.where(F.col("o_orderkey") % 2 == 0),
            orders.where(F.col("o_orderkey") % 2 == 1))


def _agg_cols():
    # built lazily: Column construction needs an active SparkContext
    return [F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price")]


@register(
    "iceberg_table_lifecycle",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="CREATE TABLE in a SQLite (JDBC-layout) catalog, two INSERT "
        "commits (append snapshots with CAS pointer swap), read back the "
        "current snapshot and aggregate.  Equals the same aggregate over "
        "the source table iff both appends committed exactly once.",
    tags=("iceberg", "catalog", "write"),
)
def iceberg_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_iceberg", even)
    t.append(even)   # snapshot 1
    t.append(odd)    # snapshot 2
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_time_travel",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Time travel: after two append snapshots, read AS OF the first "
        "snapshot id — only the first insert's rows are visible (the "
        "second snapshot's files are not in the pinned manifest).",
    tags=("iceberg", "catalog", "time-travel"),
)
def iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_tt", even)
    first = t.append(even)
    t.append(odd)
    return (t.read(spark, snapshot_id=first)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_schema_evolution",
    oracle="""
SELECT CASE WHEN o_orderkey % 2 = 1 THEN 'web' END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY 1
ORDER BY 1 NULLS FIRST
""",
    doc="Schema evolution through the catalog: append → add_column "
        "(metadata-only commit, no data rewrite) → append WITH the new "
        "column → read.  Old files surface NULL for the new column; the "
        "aggregate by that column proves both file generations read "
        "under the evolved schema.",
    tags=("iceberg", "catalog", "schema-evolution"),
)
def iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_evo", even)
    t.append(even)                                   # pre-evolution files
    t.add_column("channel", "string")                # metadata-only commit
    t.append(odd.withColumn("channel", F.lit("web")))
    return (t.read(spark)
            .groupBy("channel").agg(*_agg_cols())
            .orderBy(F.col("channel").asc_nulls_first()))


@register(
    "iceberg_rest_catalog_lifecycle",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="The reference's SECOND catalog mode (the rest binary, "
        "-rest/src/main.rs:46-90): the same lifecycle as "
        "iceberg_table_lifecycle but every catalog interaction travels "
        "over the Iceberg REST catalog API — an in-process spec server "
        "fronts the SQLite catalog, the client authenticates with a "
        "bearer token, registers the table, and both INSERT commits are "
        "HTTP CAS pointer swaps.  Data/metadata files go straight to "
        "the object store (shared fs here); only KB-sized pointers "
        "cross the catalog wire, so the lifecycle cost stays "
        "independent of table size at 100 TB. "
        "sources/rest_catalog.py:RestCatalog/RestCatalogServer.",
    tags=("iceberg", "catalog", "rest", "write"),
)
def iceberg_rest_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.rest_catalog import RestCatalog, RestCatalogServer

    backing = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    with RestCatalogServer(backing, bearer_token="round2") as srv:
        cat = RestCatalog(srv.url, warehouse=backing.warehouse,
                          bearer_token="round2")
        t = cat.create_table("sales", "orders_rest", even)
        t.append(even)   # snapshot 1, committed over HTTP
        t.append(odd)    # snapshot 2, committed over HTTP
        out = (t.read(spark)
               .groupBy("o_orderstatus").agg(*_agg_cols())
               .orderBy("o_orderstatus"))
        # materialize the plan's file list while the server is up; the
        # read itself scans parquet directly (catalog no longer needed)
        out = out.transform(materialize)
    return out


@register(
    "iceberg_merge_upsert",
    oracle="""
WITH merged AS (
  SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 1
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Row-level MERGE INTO with copy-on-write file granularity: the "
        "table holds the even orderkeys, the source doubles the price of "
        "every %4 key (matched -> update) and brings the odd keys "
        "(not matched -> insert).  Manifest min/max stats prune the "
        "candidate files before any data is read; matched files are "
        "found by one semi-join collecting FILE PATHS only; untouched "
        "files carry into the new snapshot by manifest entry.  Equals "
        "the relational merge of the same inputs iff update, insert, and "
        "carry-over all composed correctly. "
        "sources/iceberg_lite.py:merge_upsert.",
    tags=("iceberg", "catalog", "write", "dml"),
)
def iceberg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    t = cat.create_table("sales", "orders_merge", even)
    t.append(even)
    src = (orders.where(F.col("o_orderkey") % 4 == 0)
           .withColumn("o_totalprice", F.col("o_totalprice") * 2)
           .unionByName(orders.where(F.col("o_orderkey") % 2 == 1)))
    t.merge_upsert(spark, src, ["o_orderkey"])
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_delete_rows",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Row-level DELETE with copy-on-write: files containing a matching "
        "row are rewritten without those rows, the rest carry over by "
        "manifest entry; the pre-delete snapshot stays time-travelable.  "
        "Equals the anti-filtered aggregate iff exactly the predicated "
        "rows disappeared. sources/iceberg_lite.py:delete_where.",
    tags=("iceberg", "catalog", "write", "dml"),
)
def iceberg_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    t = cat.create_table("sales", "orders_del", orders)
    t.append(orders)
    t.delete_where(spark, F.col("o_orderstatus") == "F")
    return (t.read(spark)
            .groupBy("o_orderpriority").agg(*_agg_cols())
            .orderBy("o_orderpriority"))


@register(
    "iceberg_partitioned_scan",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events
WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) FROM events)
GROUP BY event_type
ORDER BY event_type
""",
    doc="Partitioned table + partition pruning: events land under a "
        "day(ts) partition spec (hive-layout write dirs, partition "
        "values in the manifest entries), and the read plans ONLY the "
        "first day's files via the manifest partition filter — Iceberg's "
        "exact partition pruning, not stats-based.  Equals the "
        "date-filtered aggregate iff the partition transform, the "
        "manifest values, and the pruned file set all agree. "
        "sources/iceberg_lite.py:_parse_partition_spec,plan_files.",
    tags=("iceberg", "catalog", "partition"),
)
def iceberg_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    events = table(spark, sf_dir, "events")
    t = cat.create_table("stream", "events_part", events,
                         partition_by=["day(ts)"])
    t.append(events)
    first_day = events.agg(
        F.min(F.date_format("ts", "yyyy-MM-dd"))).first()[0]
    return (t.read(spark, partition_filter={"ts_day": first_day})
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .orderBy("event_type"))


@register(
    "iceberg_sorted_compaction",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderkey <= (SELECT MIN(o_orderkey) + 999 FROM orders)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Clustering rewrite: orders land in key-shuffled files (every "
        "file spans the whole o_orderkey range, so a selective read "
        "must open all of them), then compact(sort_by=o_orderkey) "
        "range-partitions the rewrite so each file covers a narrow "
        "disjoint range — and the SAME stat-pruned read now plans a "
        "strict subset of files.  The returned aggregate runs over the "
        "pruned plan; it equals the key-filtered aggregate iff the "
        "rewrite preserved content and the skip-scan kept every "
        "qualifying row. sources/iceberg_lite.py:compact.",
    tags=("iceberg", "catalog", "maintenance"),
)
def iceberg_sorted_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    t = cat.create_table("sales", "orders_sorted", orders)
    # shuffled-by-hash files: each spans ~the full key range
    t.append(orders.repartition(4, "o_custkey"))
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    hi = lo + 999
    files_before = len(t.plan_files(prune=("o_orderkey", lo, hi)))
    t.compact(spark, target_files=4, sort_by=["o_orderkey"])
    pruned = t.plan_files(prune=("o_orderkey", lo, hi))
    if not len(pruned) < files_before:   # clustering must actually bite
        raise AssertionError(
            f"sorted compaction did not tighten pruning "
            f"({files_before} -> {len(pruned)})")
    return (t.read(spark, prune=("o_orderkey", lo, hi))
            .where(F.col("o_orderkey") <= hi)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_rename_drop_evolution",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Rename + drop schema evolution, metadata-only: after appending "
        "under the original schema, o_orderstatus is RENAMED to status "
        "(data must follow the field id out of already-written files), "
        "o_orderpriority is DROPPED (column vanishes without rewriting "
        "anything), and a second append lands under the evolved schema. "
        "The aggregate reads both file generations under the current "
        "schema; it equals the source aggregate iff the id mapping is "
        "right in every generation. "
        "sources/iceberg_lite.py:rename_column,drop_column.",
    tags=("iceberg", "catalog", "schema-evolution"),
)
def iceberg_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_rd", even)
    t.append(even)                                # generation 1: old names
    t.rename_column("o_orderstatus", "status")    # metadata-only
    t.drop_column("o_orderpriority")              # metadata-only
    t.append(odd.withColumnRenamed("o_orderstatus", "status")
             .drop("o_orderpriority"))            # generation 2: new schema
    return (t.read(spark)
            .groupBy("status").agg(*_agg_cols())
            .orderBy("status"))


@register(
    "iceberg_incremental_scan",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderkey % 2 = 1
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Incremental append scan: after two append snapshots, read the "
        "delta SINCE the first — the checkpoint-and-consume primitive "
        "for downstream pipelines.  The scan plans only the second "
        "commit's files (never the base files), so the aggregate equals "
        "the second batch's aggregate exactly — which is what the "
        "oracle checks. sources/iceberg_lite.py:read_incremental.",
    tags=("iceberg", "catalog", "incremental"),
)
def iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_inc", even)
    first = t.append(even)
    t.append(odd)
    return (t.read_incremental(spark, from_snapshot=first)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_mor_delete",
    oracle="""
WITH live AS (
  SELECT * FROM orders WHERE o_orderstatus <> 'F'
  UNION ALL
  SELECT * FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM live
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Row-level DELETE with MERGE-ON-READ position delete files — "
        "Iceberg v2's second delete strategy, the twin of the "
        "copy-on-write iceberg_delete_rows entry: the delete commits "
        "KBs of (file, row-position) pairs, rewrites NOTHING, and "
        "readers apply the deletes with a scan-time anti-join.  The "
        "query then APPENDS the full table again, so the result proves "
        "both the delete AND the carry rule (new files are untouched "
        "by old positions): live rows = non-F originals + the full "
        "re-append.  sources/iceberg_lite.py:delete_where_mor.",
    tags=("iceberg", "catalog", "write", "dml"),
)
def iceberg_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    t = cat.create_table("sales", "orders_mor", orders)
    t.append(orders)
    t.delete_where_mor(spark, F.col("o_orderstatus") == "F")
    t.append(orders)
    return (t.read(spark)
            .groupBy("o_orderpriority").agg(*_agg_cols())
            .orderBy("o_orderpriority"))


@register(
    "iceberg_equality_delete",
    oracle="""
WITH live AS (
  SELECT * FROM orders WHERE o_custkey % 50 != 0
  UNION ALL
  SELECT * FROM orders WHERE o_custkey % 50 = 0 AND o_orderkey % 2 = 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM live
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="EQUALITY delete files — Iceberg v2's second merge-on-read "
        "delete kind and the CDC fast path: the commit writes only the "
        "key VALUES (every 50th customer's key) and never scans the "
        "table; readers apply a sequence-guarded key anti-join.  The "
        "query then RE-APPENDS half of the deleted customers' orders — "
        "the strict-sequence rule means the re-appended rows survive "
        "the older delete, which is exactly what the oracle's UNION "
        "spells.  sources/iceberg_lite.py:delete_keys_mor_equality.",
    tags=("iceberg", "catalog", "write", "dml"),
)
def iceberg_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    t = cat.create_table("sales", "orders_eq", orders)
    t.append(orders)
    keys = (orders.where(F.col("o_custkey") % 50 == 0)
            .select("o_custkey").distinct())
    t.delete_keys_mor_equality(spark, keys, ["o_custkey"])
    t.append(orders.where((F.col("o_custkey") % 50 == 0)
                          & (F.col("o_orderkey") % 2 == 0)))
    return (t.read(spark)
            .groupBy("o_orderpriority").agg(*_agg_cols())
            .orderBy("o_orderpriority"))


@register(
    "iceberg_upsert_mor",
    oracle="""
WITH merged AS (
  SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 1
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="MERGE-ON-READ upsert, the Flink-writer pattern and the exact "
        "twin of iceberg_merge_upsert (same inputs, same oracle, "
        "different physics): ONE snapshot adds the source rows plus an "
        "equality delete over their keys at the same sequence number — "
        "older rows of updated keys vanish by the strict-sequence "
        "anti-join, the new rows survive it, and NO data file is read "
        "or rewritten (O(source) commit vs copy-on-write's O(affected "
        "files)).  sources/iceberg_lite.py:merge_upsert_mor.",
    tags=("iceberg", "catalog", "write", "dml"),
)
def iceberg_upsert_mor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    t = cat.create_table("sales", "orders_upmor", even)
    t.append(even)
    src = (orders.where(F.col("o_orderkey") % 4 == 0)
           .withColumn("o_totalprice", F.col("o_totalprice") * 2)
           .unionByName(orders.where(F.col("o_orderkey") % 2 == 1)))
    t.merge_upsert_mor(spark, src, ["o_orderkey"])
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_wap_publish",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Write-audit-publish: the even orders land on main, the odd "
        "orders STAGE on an audit branch (snapshots chain off the "
        "branch head; main readers see only the evens until the "
        "audited state fast-forwards in).  After publish the table "
        "equals the full orders relation — which only holds if branch "
        "isolation, the branch-parent chain, and the fast-forward all "
        "composed correctly.  The reference's catalog has refs; the "
        "WAP workflow is the lakehouse pattern built on them "
        "(Iceberg's spark.wap.branch). "
        "sources/iceberg_lite.py:append_to_branch,publish_branch.",
    tags=("iceberg", "catalog", "write"),
)
def iceberg_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    odd = orders.where(F.col("o_orderkey") % 2 == 1)
    t = cat.create_table("sales", "orders_wap", orders)
    t.append(even)
    t.append_to_branch(odd, "audit")
    t.publish_branch("audit")
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_metadata_tables",
    oracle="""
SELECT * FROM (
  SELECT 1 AS ordinal, 'append' AS operation,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_orderkey % 2 = 0) AS rows_changed,
         CAST(1 AS BIGINT) AS sequence_number
  UNION ALL
  SELECT 2, 'append',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_orderkey % 2 = 1),
         CAST(2 AS BIGINT)
  UNION ALL
  SELECT 3, 'delete',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_orderkey % 2 = 1 AND o_orderstatus = 'F'),
         CAST(3 AS BIGINT)
)
ORDER BY ordinal
""",
    doc="METADATA TABLES — the `SELECT * FROM t.snapshots` inspection "
        "surface every Iceberg engine exposes (Spark's metadata tables; "
        "DataFusion's iceberg integration reads the same snapshot "
        "summaries).  After a deterministic commit ledger (append even, "
        "append odd, MOR-delete odd 'F' rows), emits one row per "
        "snapshot: ordinal, operation, rows_changed (added-records for "
        "appends, added-position-deletes for MOR deletes), sequence "
        "number.  The oracle recomputes each commit's row delta from "
        "the source relation — equality proves the summaries record "
        "what actually committed.  Metadata is driver-side by design "
        "(rows ∝ commits, KBs at any table size — the same shape "
        "Iceberg's own metadata tables serve from the driver). "
        "sources/iceberg_lite.py:snapshots.",
    tags=("iceberg", "catalog", "metadata"),
)
def iceberg_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_meta", even)
    t.append(even)
    t.append(odd)
    t.delete_where_mor(spark, (F.col("o_orderkey") % 2 == 1)
                       & (F.col("o_orderstatus") == "F"))
    rows = []
    for i, s in enumerate(t.snapshots(), start=1):
        sm = s["summary"]
        changed = int(sm.get("added-records") or 0) \
            or int(sm.get("added-position-deletes") or 0)
        rows.append((i, sm["operation"], changed,
                     int(s["sequence-number"])))
    return spark.createDataFrame(
        rows, "ordinal INT, operation STRING, rows_changed BIGINT, "
              "sequence_number BIGINT")


@register(
    "iceberg_zorder_compaction",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderkey <= (SELECT MIN(o_orderkey)
       + CAST(FLOOR((MAX(o_orderkey) - MIN(o_orderkey)) / 8.0) AS BIGINT)
       FROM orders)
  AND o_custkey  <= (SELECT MIN(o_custkey)
       + CAST(FLOOR((MAX(o_custkey) - MIN(o_custkey)) / 8.0) AS BIGINT)
       FROM orders)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Z-order clustering rewrite (Iceberg's rewrite_data_files "
        "zorder strategy): orders land in key-shuffled files (every "
        "file spans the full range of BOTH o_orderkey and o_custkey, "
        "so a selective 2-D box read must open all of them), then "
        "compact(zorder_by=[o_orderkey, o_custkey]) rewrites on the "
        "bit-interleaved z-value — each file now covers a small "
        "hyper-rectangle of the key plane, and the SAME two-range "
        "manifest prune plans a strict subset of files.  A linear sort "
        "serves only its leading column; the z-layout is what makes "
        "min/max skipping bite on every filter dimension at once — the "
        "multi-dimensional-workload layout that matters at 100 TB.  "
        "The returned aggregate runs over the 2-D-pruned plan; it "
        "equals the box-filtered source aggregate iff the rewrite "
        "preserved content and the skip-scan kept every qualifying "
        "row. sources/iceberg_lite.py:compact,_with_zorder_key.",
    tags=("iceberg", "catalog", "maintenance"),
)
def iceberg_zorder_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    t = cat.create_table("sales", "orders_zorder", orders)
    # hash-shuffled files: each spans ~the full range of both keys
    t.append(orders.repartition(4, "o_custkey"))
    # scale-relative 2-D corner box (1/8 of each key's span — selective
    # at every fixture SF, same bounds the oracle derives in SQL)
    b = orders.agg(F.min("o_orderkey"), F.max("o_orderkey"),
                   F.min("o_custkey"), F.max("o_custkey")).first()
    box = [("o_orderkey", b[0], b[0] + (b[1] - b[0]) // 8),
           ("o_custkey", b[2], b[2] + (b[3] - b[2]) // 8)]
    files_before = len(t.plan_files(prune=box))
    t.compact(spark, target_files=16,
              zorder_by=["o_orderkey", "o_custkey"])
    pruned = t.plan_files(prune=box)
    if not len(pruned) < files_before:   # 2-D clustering must bite
        raise AssertionError(
            f"z-order compaction did not tighten 2-D pruning "
            f"({files_before} -> {len(pruned)})")
    return (t.read(spark, prune=box)
            .where((F.col("o_orderkey") <= box[0][2])
                   & (F.col("o_custkey") <= box[1][2]))
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .orderBy("o_orderstatus"))


@register(
    "iceberg_rest_mor_upsert",
    oracle="""
WITH merged AS (
  SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
  FROM orders WHERE o_orderkey % 4 = 0
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 1
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 4 <> 0
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="The MOR upsert driven THROUGH the REST catalog (VERDICT r4 "
        "ask #8): same inputs and oracle as iceberg_upsert_mor, but "
        "the table is registered over the Iceberg REST API and the "
        "single-commit MOR snapshot (source rows + same-sequence "
        "equality delete) lands as an HTTP CAS pointer swap instead "
        "of a SQLite CAS — proving the DML surface composes with the "
        "reference's second catalog mode (-rest/src/main.rs:46-90). "
        "Only KB-sized pointers cross the wire; data and delete files "
        "go straight to the store, so commit cost stays independent "
        "of table size at 100 TB. "
        "sources/rest_catalog.py + sources/iceberg_lite.py:"
        "merge_upsert_mor.",
    tags=("iceberg", "catalog", "rest", "write", "dml"),
)
def iceberg_rest_mor_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.rest_catalog import RestCatalog, RestCatalogServer

    backing = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    with RestCatalogServer(backing, bearer_token="round5") as srv:
        cat = RestCatalog(srv.url, warehouse=backing.warehouse,
                          bearer_token="round5")
        t = cat.create_table("sales", "orders_rest_mor", even)
        t.append(even)
        src = (orders.where(F.col("o_orderkey") % 4 == 0)
               .withColumn("o_totalprice", F.col("o_totalprice") * 2)
               .unionByName(orders.where(F.col("o_orderkey") % 2 == 1)))
        t.merge_upsert_mor(spark, src, ["o_orderkey"])
        out = (t.read(spark)
               .groupBy("o_orderstatus").agg(*_agg_cols())
               .orderBy("o_orderstatus"))
        # materialize while the server is up (the read plans file lists
        # through the catalog; the scan itself is plain parquet)
        out = out.transform(materialize)
    return out


@register(
    "iceberg_rest_wap_branch",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Write-audit-publish over the REST catalog wire (VERDICT r5 "
        "ask #4): evens land on main, odds STAGE on an audit branch — "
        "every branch-head swap is an HTTP CAS against the REST "
        "pointer endpoint (-rest/src/main.rs:46-90), not a local "
        "SQLite CAS.  Mid-flight the entry ASSERTS main-reader "
        "isolation (a staged row leaking to main turns into a gate "
        "ERR); the audited branch then fast-forwards in through the "
        "same wire path, and the final read equals the full orders "
        "relation — which only holds if branch isolation, the "
        "branch-parent chain, and the publish CAS all composed "
        "correctly over HTTP.  Only KB pointers cross the wire; data "
        "files go straight to the store (100 TB-safe commit cost). "
        "sources/rest_catalog.py + "
        "sources/iceberg_lite.py:append_to_branch,publish_branch.",
    tags=("iceberg", "catalog", "rest", "write"),
)
def iceberg_rest_wap_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.rest_catalog import RestCatalog, RestCatalogServer

    backing = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    even = orders.where(F.col("o_orderkey") % 2 == 0)
    odd = orders.where(F.col("o_orderkey") % 2 == 1)
    n_even = even.count()
    with RestCatalogServer(backing, bearer_token="round6") as srv:
        cat = RestCatalog(srv.url, warehouse=backing.warehouse,
                          bearer_token="round6")
        t = cat.create_table("sales", "orders_rest_wap", orders)
        t.append(even)
        t.append_to_branch(odd, "audit")
        staged_main = t.read(spark).count()
        if staged_main != n_even:
            raise AssertionError(
                f"WAP isolation broken over REST: main shows "
                f"{staged_main} rows while audit is staged, want {n_even}")
        t.publish_branch("audit")
        out = (t.read(spark)
               .groupBy("o_orderstatus").agg(*_agg_cols())
               .orderBy("o_orderstatus"))
        out = out.transform(materialize)
    return out


@register(
    "iceberg_snapshot_expire",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       CAST(1 AS BIGINT) AS snapshots_left,
       TRUE AS expired_travel_fails,
       CAST(0 AS BIGINT) AS orphans_after_expire
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Snapshot expiration + orphan sweep — the table-maintenance "
        "pair every production Iceberg deployment schedules.  Ledger: "
        "append evens (s1), append odds (s2), expire keep_last=1.  "
        "The entry asserts the REAL maintenance contract mid-plan "
        "(each failure becomes a gate ERR): time travel to the "
        "expired s1 raises; exactly one snapshot remains; an "
        "immediate remove_orphan_files(older_than=0) finds ZERO "
        "orphans (expire's reachability sweep deleted precisely the "
        "unreachable files, no more, no less); and the surviving "
        "snapshot still reads the FULL relation (expiry drops history, "
        "never current data — manifests chain, so s2 kept s1's files "
        "alive).  Metadata-only CAS first, file deletion after the "
        "pointer swap (crash-safe ordering; a crash leaves harmless "
        "orphans, never a broken table). "
        "sources/iceberg_lite.py:expire_snapshots,remove_orphan_files.",
    tags=("iceberg", "catalog", "maintenance"),
)
def iceberg_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg_lite import NoSuchTableError

    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_expire", even)
    t.append(even)
    t.append(odd)
    snaps = t.snapshots()
    s1_id = snaps[0]["snapshot-id"]
    t.expire_snapshots(keep_last=1)
    left = len(t.snapshots())
    if left != 1:
        raise AssertionError(f"expire kept {left} snapshots, want 1")
    try:
        t.read(spark, snapshot_id=s1_id)
        travel_fails = False
    except NoSuchTableError:
        travel_fails = True
    if not travel_fails:
        raise AssertionError("time travel to an expired snapshot must fail")
    sweep = t.remove_orphan_files(older_than_ms=0)
    orphans = int(sweep.get("removed_files", 0))
    if orphans != 0:
        raise AssertionError(
            f"expire left {orphans} unreachable files for the orphan "
            "sweep — its reachability deletion is leaking")
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .withColumn("snapshots_left", F.lit(1).cast("bigint"))
            .withColumn("expired_travel_fails", F.lit(True))
            .withColumn("orphans_after_expire", F.lit(0).cast("bigint"))
            .orderBy("o_orderstatus"))


@register(
    "iceberg_expire_respects_refs",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       TRUE  AS tagged_travel_ok,
       FALSE AS untagged_survived
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Retention honors refs — the contract that makes tags safe "
        "release pointers: append evens (s1, tagged 'baseline'), "
        "append more (s2), append odds (s3), expire keep_last=1.  The "
        "entry asserts mid-plan that the UNTAGGED middle snapshot is "
        "gone (travel raises) while the TAGGED s1 still time-travels, "
        "then returns s1's aggregate READ THROUGH THE TAG — equality "
        "with the evens relation proves the tag pinned real data "
        "through an expiry that removed its younger sibling.  The "
        "s1-reachable files survive because reachability walks the "
        "KEPT snapshots' manifest chains, refs included. "
        "sources/iceberg_lite.py:set_ref,expire_snapshots.",
    tags=("iceberg", "catalog", "maintenance"),
)
def iceberg_expire_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg_lite import NoSuchTableError

    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_expire_refs", even)
    t.append(even)
    s1 = t.snapshots()[-1]["snapshot-id"]
    t.set_ref("baseline", snapshot_id=s1, kind="tag")
    t.append(odd.where(F.col("o_orderkey") % 4 == 1))
    s2 = t.snapshots()[-1]["snapshot-id"]
    t.append(odd.where(F.col("o_orderkey") % 4 == 3))
    t.expire_snapshots(keep_last=1)
    try:
        t.read(spark, snapshot_id=s2)
        untagged_survived = True
    except NoSuchTableError:
        untagged_survived = False
    if untagged_survived:
        raise AssertionError("untagged middle snapshot must expire")
    try:
        tagged = t.read(spark, snapshot_id=s1)
        tagged_travel_ok = True
    except NoSuchTableError:
        tagged_travel_ok = False
    if not tagged_travel_ok:
        raise AssertionError("tagged snapshot must survive expiry")
    return (tagged
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .withColumn("tagged_travel_ok", F.lit(True))
            .withColumn("untagged_survived", F.lit(False))
            .orderBy("o_orderstatus"))


@register(
    "iceberg_rest_snapshot_expire",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       CAST(1 AS BIGINT) AS snapshots_left,
       TRUE AS expired_travel_fails
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Snapshot expiration driven THROUGH the REST catalog: the "
        "same append-evens / append-odds / expire keep_last=1 ledger "
        "as iceberg_snapshot_expire, but every metadata swap — "
        "including the expire commit itself — is an HTTP CAS against "
        "the REST pointer endpoint (-rest/src/main.rs:46-90).  "
        "Maintenance over the wire is the piece a multi-writer "
        "deployment actually runs (a scheduler process expiring a "
        "table it does not own locally); the entry asserts mid-plan "
        "that exactly one snapshot survives, that time travel to the "
        "expired snapshot raises, and that the surviving snapshot "
        "still reads the full relation.  KB-sized pointers on the "
        "wire; the reachability sweep deletes files directly in the "
        "store.  sources/rest_catalog.py + "
        "sources/iceberg_lite.py:expire_snapshots.",
    tags=("iceberg", "catalog", "rest", "maintenance"),
)
def iceberg_rest_snapshot_expire(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from ..sources.iceberg_lite import NoSuchTableError
    from ..sources.rest_catalog import RestCatalog, RestCatalogServer

    backing = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    with RestCatalogServer(backing, bearer_token="round7") as srv:
        cat = RestCatalog(srv.url, warehouse=backing.warehouse,
                          bearer_token="round7")
        t = cat.create_table("sales", "orders_rest_expire", even)
        t.append(even)
        t.append(odd)
        s1_id = t.snapshots()[0]["snapshot-id"]
        t.expire_snapshots(keep_last=1)
        left = len(t.snapshots())
        if left != 1:
            raise AssertionError(
                f"REST expire kept {left} snapshots, want 1")
        try:
            t.read(spark, snapshot_id=s1_id)
            travel_fails = False
        except NoSuchTableError:
            travel_fails = True
        if not travel_fails:
            raise AssertionError(
                "time travel to a REST-expired snapshot must fail")
        out = (t.read(spark)
               .groupBy("o_orderstatus").agg(*_agg_cols())
               .withColumn("snapshots_left", F.lit(1).cast("bigint"))
               .withColumn("expired_travel_fails", F.lit(True))
               .orderBy("o_orderstatus"))
        out = out.transform(materialize)
    return out


@register(
    "iceberg_rewrite_manifests",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       CAST(4 AS BIGINT) AS manifests_before,
       CAST(1 AS BIGINT) AS manifests_after,
       TRUE AS file_set_unchanged,
       TRUE AS pre_rewrite_travel_ok
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Manifest rewrite (Iceberg rewriteManifests) — the third "
        "standard maintenance verb beside compaction and expiration: "
        "4 small appends chain 4 manifests that every scan planning "
        "pass must walk; the rewrite folds them into ONE consolidated "
        "manifest in a METADATA-ONLY replace commit.  Mid-plan "
        "contract assertions: the planned data-file set is IDENTICAL "
        "pre/post (zero data bytes moved), manifest count drops 4 -> "
        "1, time travel to the pre-rewrite snapshot still reads its "
        "own chain, and the final scan is the full relation.  At "
        "100 TB with thousands of commits the manifest chain IS the "
        "planning bottleneck; folding it restores O(1) planning reads "
        "without paying a data rewrite. "
        "sources/iceberg_lite.py:rewrite_manifests.",
    tags=("iceberg", "catalog", "maintenance"),
)
def iceberg_rewrite_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    orders = table(spark, sf_dir, "orders")
    chunks = [orders.where(F.col("o_orderkey") % 4 == i) for i in range(4)]
    t = cat.create_table("sales", "orders_manifests", chunks[0])
    t.append(chunks[0])
    for c in chunks[1:]:
        t.append(c)
    pre_snap = t.snapshots()[-1]["snapshot-id"]
    pre_files = sorted(e.file_path for e in t.plan_files())
    stats = t.rewrite_manifests()
    if (stats["manifests_before"], stats["manifests_after"]) != (4, 1):
        raise AssertionError(f"manifest fold mismatch: {stats}")
    post_files = sorted(e.file_path for e in t.plan_files())
    if pre_files != post_files:
        raise AssertionError(
            "rewrite_manifests changed the planned file set — it must "
            "be metadata-only")
    n_travel = t.read(spark, snapshot_id=pre_snap).count()
    n_now = t.read(spark).count()
    if n_travel != n_now:
        raise AssertionError(
            f"pre-rewrite travel rows {n_travel} != current {n_now}")
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .withColumn("manifests_before", F.lit(4).cast("bigint"))
            .withColumn("manifests_after", F.lit(1).cast("bigint"))
            .withColumn("file_set_unchanged", F.lit(True))
            .withColumn("pre_rewrite_travel_ok", F.lit(True))
            .orderBy("o_orderstatus"))


@register(
    "iceberg_partition_stats",
    oracle="""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS ts_day,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY ts_day
""",
    doc="Partition statistics from METADATA ONLY: per-partition row "
        "counts assembled purely from manifest entries (partition "
        "values + parquet footer record counts) — zero data bytes "
        "read, planning-cost-sized work however large the table; the "
        "report every maintenance scheduler and skew diagnosis starts "
        "from ('which partitions are hot / tiny / missing').  The "
        "oracle recomputes the same counts FROM THE DATA, so the hash "
        "certifies that partition transform values and footer stats in "
        "the manifests agree exactly with reality.  Mid-plan asserts "
        "pin the file-level invariants (every partition has >= 1 "
        "file; metadata total equals the commit's added-records). "
        "sources/iceberg_lite.py:plan_files.",
    tags=("iceberg", "catalog", "partition"),
)
def iceberg_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    events = table(spark, sf_dir, "events")
    t = cat.create_table("stream", "events_pstats", events,
                         partition_by=["day(ts)"])
    t.append(events)
    entries = t.plan_files()
    if not entries:
        raise AssertionError("partitioned append produced no entries")
    per_part: dict[str, list[int]] = {}
    total = 0
    for e in entries:
        day = e.partition["ts_day"]
        per_part.setdefault(day, []).append(e.record_count)
        total += e.record_count
    added = int(t.snapshots()[-1]["summary"]["added-records"])
    if total != added:
        raise AssertionError(
            f"manifest record_count sum {total} != committed "
            f"added-records {added}")
    if any(len(v) < 1 for v in per_part.values()):
        raise AssertionError("a partition with zero files is impossible")
    rows = [(day, sum(v)) for day, v in sorted(per_part.items())]
    return (spark.createDataFrame(rows, "ts_day string, n_rows bigint")
            .orderBy("ts_day"))


@register(
    "iceberg_time_travel_timestamp",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       TRUE AS pre_table_travel_fails
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Time travel BY TIMESTAMP (the `FOR SYSTEM_TIME AS OF` / "
        "as-of-timestamp half of the travel contract; the snapshot-id "
        "half is iceberg_time_travel): after two appends, reading AS "
        "OF the first snapshot's own commit timestamp must resolve to "
        "s1's content exactly — the 'what did the table look like "
        "when that report ran' question, resolved through the "
        "snapshot-log without naming ids.  Mid-plan asserts: a "
        "timestamp BEFORE table creation raises (no snapshot "
        "existed), and the timestamp read returns s1's row count. "
        "sources/iceberg_lite.py:plan_files(as_of_timestamp_ms).",
    tags=("iceberg", "catalog"),
)
def iceberg_time_travel_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.iceberg_lite import NoSuchTableError

    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_ts_travel", even)
    t.append(even)
    s1 = t.snapshots()[-1]
    t.append(odd)
    try:
        t.read(spark, as_of_timestamp_ms=s1["timestamp-ms"] - 3600_000)
        pre_fails = False
    except NoSuchTableError:
        pre_fails = True
    if not pre_fails:
        raise AssertionError(
            "as-of-timestamp before table creation must raise")
    asof = t.read(spark, as_of_timestamp_ms=s1["timestamp-ms"])
    n_even = even.count()
    n_asof = asof.count()
    if n_asof != n_even:
        raise AssertionError(
            f"timestamp travel returned {n_asof} rows, want s1's "
            f"{n_even}")
    return (asof.groupBy("o_orderstatus").agg(*_agg_cols())
            .withColumn("pre_table_travel_fails", F.lit(True))
            .orderBy("o_orderstatus"))


@register(
    "iceberg_rollback_to_snapshot",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       CAST(2 AS BIGINT) AS snapshots_kept,
       TRUE AS forward_travel_works,
       TRUE AS timestamp_travel_restored
FROM orders WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Rollback to an earlier snapshot (Iceberg SetSnapshotOperation "
        "— the 'undo the bad write NOW' verb beside expire/compact/"
        "rewrite in the maintenance set): append evens (s1), append "
        "odds (s2), roll current back to s1 in a metadata-only CAS "
        "commit.  Mid-plan contract asserts (each failure a gate ERR): "
        "the current read equals the s1 state (the oracle recomputes "
        "it from raw orders); BOTH snapshots survive — rollback moves "
        "the pointer, never deletes history, so forward time travel to "
        "the rolled-past s2 still reads the full relation; and "
        "timestamp-travel at now resolves to the RESTORED state "
        "because rollback appends a snapshot-log entry (exactly how "
        "real Iceberg's history table records it). "
        "sources/iceberg_lite.py:rollback_to.",
    tags=("iceberg", "catalog", "maintenance"),
)
def iceberg_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    t = cat.create_table("sales", "orders_rollback", even)
    t.append(even)
    t.append(odd)
    snaps = t.snapshots()
    s1_id, s2_id = snaps[0]["snapshot-id"], snaps[1]["snapshot-id"]
    n_even, n_all = even.count(), even.count() + odd.count()
    t.rollback_to(s1_id)
    if len(t.snapshots()) != 2:
        raise AssertionError("rollback must keep all snapshots")
    if t.read(spark).count() != n_even:
        raise AssertionError("rollback did not restore the s1 state")
    fwd = t.read(spark, snapshot_id=s2_id).count()
    if fwd != n_all:
        raise AssertionError(
            f"forward travel to rolled-past s2 reads {fwd}, want {n_all}")
    import time as _time
    ts_now = t.read(spark,
                    as_of_timestamp_ms=int(_time.time() * 1000)).count()
    restored = ts_now == n_even
    if not restored:
        raise AssertionError(
            f"timestamp travel after rollback reads {ts_now}, "
            f"want {n_even}")
    return (t.read(spark)
            .groupBy("o_orderstatus").agg(*_agg_cols())
            .withColumn("snapshots_kept",
                        F.lit(len(t.snapshots())).cast("bigint"))
            .withColumn("forward_travel_works", F.lit(fwd == n_all))
            .withColumn("timestamp_travel_restored", F.lit(restored))
            .orderBy("o_orderstatus"))


@register(
    "iceberg_rest_rollback",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       CAST(2 AS BIGINT) AS snapshots_kept,
       TRUE AS forward_travel_works
FROM orders WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Snapshot rollback driven THROUGH the REST catalog: the same "
        "append-evens / append-odds / rollback-to-s1 ledger as "
        "iceberg_rollback_to_snapshot, but the rollback's metadata-only "
        "pointer move is an HTTP CAS against the REST endpoint — the "
        "incident-response path a deployment actually uses ('ops "
        "rolls back the poisoned table NOW', from a process that owns "
        "no local catalog).  Works with zero REST-specific code "
        "because rollback_to commits through the same two pointer "
        "primitives every other table op uses — the seam the REST "
        "mode was designed around.  Mid-plan asserts: restored state, "
        "both snapshots alive, forward travel to the rolled-past "
        "snapshot intact.  sources/rest_catalog.py + "
        "sources/iceberg_lite.py:rollback_to.",
    tags=("iceberg", "catalog", "rest", "maintenance"),
)
def iceberg_rest_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.rest_catalog import RestCatalog, RestCatalogServer

    backing = _fresh_catalog()
    even, odd = _split_orders(spark, sf_dir)
    with RestCatalogServer(backing, bearer_token="round8") as srv:
        cat = RestCatalog(srv.url, warehouse=backing.warehouse,
                          bearer_token="round8")
        t = cat.create_table("sales", "orders_rest_rollback", even)
        t.append(even)
        t.append(odd)
        snaps = t.snapshots()
        s1_id, s2_id = snaps[0]["snapshot-id"], snaps[1]["snapshot-id"]
        n_even, n_all = even.count(), even.count() + odd.count()
        t.rollback_to(s1_id)
        if t.read(spark).count() != n_even:
            raise AssertionError("REST rollback did not restore s1")
        if len(t.snapshots()) != 2:
            raise AssertionError("REST rollback must keep all snapshots")
        fwd = t.read(spark, snapshot_id=s2_id).count()
        if fwd != n_all:
            raise AssertionError(
                f"forward travel after REST rollback reads {fwd}, "
                f"want {n_all}")
        out = (t.read(spark)
               .groupBy("o_orderstatus").agg(*_agg_cols())
               .withColumn("snapshots_kept", F.lit(2).cast("bigint"))
               .withColumn("forward_travel_works", F.lit(True))
               .orderBy("o_orderstatus"))
        out = out.transform(materialize)
    return out
