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


def configure_object_store(env: dict[str, str] | None = None,
                           catalog_name: str = "lake") -> dict[str, str]:
    """Spark conf for the reference's object-store env contract
    (iceberg-datafusion-arrow-flight-sql/src/main.rs:46-71): the store is
    configured from ``BUCKET`` + ``AWS_ACCESS_KEY_ID`` +
    ``AWS_SECRET_ACCESS_KEY`` (ALL three, matching the reference's
    3-tuple match arm), optional ``AWS_ENDPOINT`` (custom/MinIO
    endpoint → path-style addressing) and ``AWS_ALLOW_HTTP == 'TRUE'``.
    When the triple is absent the reference falls back to an in-memory
    store; here that maps to {} — Spark keeps reading the local
    filesystem.

    The same credentials are emitted twice on purpose: Hadoop-S3A keys
    cover plain ``spark.read.parquet('s3a://…')`` paths, Iceberg FileIO
    keys cover catalog tables (the reference hands ONE object store to
    both its SQL paths and its Iceberg catalog,
    ``SqlCatalogList::new(&catalog_url, object_store)``).

    Apply with ``get_spark(extra_conf={**configure_iceberg_catalog(...),
    **configure_object_store(...)})``.  Untestable live in this sandbox
    (no network — GAPS.md); the key mapping itself is pytest-pinned."""
    import os as _os
    e = dict(_os.environ) if env is None else dict(env)
    bucket = e.get("BUCKET")
    key = e.get("AWS_ACCESS_KEY_ID")
    secret = e.get("AWS_SECRET_ACCESS_KEY")
    if not (bucket and key and secret):
        return {}
    conf = {
        "spark.hadoop.fs.s3a.access.key": key,
        "spark.hadoop.fs.s3a.secret.key": secret,
        f"spark.sql.catalog.{catalog_name}.io-impl":
            "org.apache.iceberg.aws.s3.S3FileIO",
        f"spark.sql.catalog.{catalog_name}.s3.access-key-id": key,
        f"spark.sql.catalog.{catalog_name}.s3.secret-access-key": secret,
        f"spark.sql.catalog.{catalog_name}.warehouse":
            f"s3a://{bucket}/warehouse",
    }
    endpoint = e.get("AWS_ENDPOINT")
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
        conf["spark.hadoop.fs.s3a.path.style.access"] = "true"
        conf[f"spark.sql.catalog.{catalog_name}.s3.endpoint"] = endpoint
        conf[f"spark.sql.catalog.{catalog_name}.s3.path-style-access"] = "true"
    if e.get("AWS_ALLOW_HTTP") == "TRUE":
        conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] = "false"
    return conf
