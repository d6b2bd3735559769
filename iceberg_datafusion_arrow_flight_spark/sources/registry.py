"""Table sources.

The reference reads Iceberg tables through a catalog injected into the
session (``IcebergCatalogList`` wiring at
iceberg-datafusion-arrow-flight/src/lib.rs:94-103), with object-store IO
(S3/GCS/in-memory) configured in the binaries
(iceberg-datafusion-arrow-flight-sql/src/main.rs:55-71).

Spark-side equivalents:

- **Iceberg catalog** (production path): ``configure_iceberg_catalog``
  emits the exact ``spark.sql.catalog.*`` configuration for a JDBC
  (≈ iceberg-sql-catalog) or REST (≈ iceberg-rest-catalog) catalog.  The
  Iceberg Spark runtime jar is not present in this dev container, so the
  function is config-only and tests use the Parquet path; on a cluster with
  the jar on the classpath the same configuration lights up manifest-level
  partition/stats pruning natively (SURVEY §4.2).
- **Parquet views** (dev/test path): ``register_tables`` registers each
  fixture Parquet file as a temp view, preserving predicate pushdown and
  column pruning at the scan.

At 100 TB the fact tables are *directories* of Parquet (or Iceberg tables),
not single files — everything here takes a path and lets Spark list/split;
nothing assumes one file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The fixture/star-schema tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table.  Accepts either ``{sf_dir}/{name}.parquet`` (fixture
    layout: a single file) or a directory of part files (cluster layout).

    Parquet TIMESTAMP(NANOS) columns arrive as int64 nanos (see
    ``spark.sql.legacy.parquet.nanosAsLong`` in :mod:`..session`) and are
    converted to µs-precision timestamps here — a pure-JVM expression, so
    the conversion is pushed into the scan projection and costs nothing at
    scale.  The fixtures have no sub-µs components, so this is lossless.
    """
    if name == "events":
        # Runtime conf (works on any caller-supplied session, e.g. the
        # driver's): read TIMESTAMP(NANOS) as int64 instead of erroring.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a session temp view so ``spark.sql``
    queries see the same relational namespace the reference exposes through
    its catalog (default catalog/schema + information_schema, lib.rs:89-92).
    """
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def configure_iceberg_catalog(name: str = "lake",
                              catalog_type: str = "jdbc",
                              uri: str = "jdbc:sqlite:/tmp/iceberg_catalog.db",
                              warehouse: str = "/tmp/iceberg_warehouse",
                              credential: str | None = None,
                              token: str | None = None) -> dict[str, str]:
    """Spark conf for an Iceberg catalog, mirroring the reference binaries.

    - ``catalog_type='jdbc'`` ≈ iceberg-sql-catalog over SQLite/Postgres/
      MySQL (iceberg-datafusion-arrow-flight-sql/src/main.rs:73, Cargo.toml:18-20).
    - ``catalog_type='rest'`` ≈ iceberg-rest-catalog with basic/bearer/OAuth
      auth (iceberg-datafusion-arrow-flight-rest/src/main.rs:48-90).

    Apply with ``get_spark(extra_conf=configure_iceberg_catalog(...))`` on a
    cluster whose classpath carries ``iceberg-spark-runtime``.  S3/GCS IO is
    delegated to Iceberg's FileIO (``s3.endpoint``/``s3.path-style-access``
    mirror the reference's custom-endpoint support, sql/main.rs:55-63).
    """
    conf = {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
    }
    if catalog_type == "jdbc":
        conf[f"spark.sql.catalog.{name}.catalog-impl"] = \
            "org.apache.iceberg.jdbc.JdbcCatalog"
        conf[f"spark.sql.catalog.{name}.uri"] = uri
    elif catalog_type == "rest":
        conf[f"spark.sql.catalog.{name}.type"] = "rest"
        conf[f"spark.sql.catalog.{name}.uri"] = uri
        if credential:
            conf[f"spark.sql.catalog.{name}.credential"] = credential
        if token:
            conf[f"spark.sql.catalog.{name}.token"] = token
    elif catalog_type == "hadoop":
        conf[f"spark.sql.catalog.{name}.type"] = "hadoop"
    else:
        raise ValueError(f"unknown catalog_type: {catalog_type}")
    return conf
