"""Config-seam tests for the native Iceberg catalog and object-store IO.

Neither seam can run live here (no network, no iceberg-spark-runtime
jar — GAPS.md), so these pin the exact Spark conf each one emits: on a
real cluster the swap is `get_spark(extra_conf=...)` and nothing else.
The env contract mirrors the reference binary's
(iceberg-datafusion-arrow-flight-sql/src/main.rs:46-71).
"""

from __future__ import annotations

import pytest

from iceberg_datafusion_arrow_flight_spark.sources.registry import (
    configure_iceberg_catalog, configure_object_store)


def test_jdbc_catalog_conf():
    conf = configure_iceberg_catalog(
        name="lake", catalog_type="jdbc",
        uri="jdbc:sqlite:/tmp/cat.db", warehouse="/tmp/wh")
    assert conf["spark.sql.catalog.lake"] == \
        "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.catalog-impl"] == \
        "org.apache.iceberg.jdbc.JdbcCatalog"
    assert conf["spark.sql.catalog.lake.uri"] == "jdbc:sqlite:/tmp/cat.db"
    assert conf["spark.sql.catalog.lake.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_rest_catalog_conf_with_auth():
    conf = configure_iceberg_catalog(
        name="r", catalog_type="rest", uri="http://cat:8181",
        credential="id:secret", token="tok")
    assert conf["spark.sql.catalog.r.type"] == "rest"
    assert conf["spark.sql.catalog.r.credential"] == "id:secret"
    assert conf["spark.sql.catalog.r.token"] == "tok"


def test_unknown_catalog_type_fails_loudly():
    with pytest.raises(ValueError, match="unknown catalog_type"):
        configure_iceberg_catalog(catalog_type="glue")


def test_object_store_requires_full_triple():
    """The reference configures S3 only when BUCKET + key + secret are
    ALL present (the 3-tuple match arm) — partial credentials fall back
    to the in-memory store, here an empty conf (local FS)."""
    assert configure_object_store(env={}) == {}
    assert configure_object_store(env={"BUCKET": "b"}) == {}
    assert configure_object_store(
        env={"BUCKET": "b", "AWS_ACCESS_KEY_ID": "k"}) == {}


def test_object_store_emits_s3a_and_fileio_keys():
    conf = configure_object_store(env={
        "BUCKET": "data", "AWS_ACCESS_KEY_ID": "AK",
        "AWS_SECRET_ACCESS_KEY": "SK"})
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"
    assert conf["spark.sql.catalog.lake.io-impl"] == \
        "org.apache.iceberg.aws.s3.S3FileIO"
    assert conf["spark.sql.catalog.lake.warehouse"] == "s3a://data/warehouse"
    # no endpoint -> default AWS addressing, no path-style override
    assert "spark.hadoop.fs.s3a.endpoint" not in conf
    assert "spark.hadoop.fs.s3a.path.style.access" not in conf


def test_object_store_custom_endpoint_and_http():
    """AWS_ENDPOINT (MinIO/custom) forces path-style on both layers;
    AWS_ALLOW_HTTP == 'TRUE' (exact string, as in the reference's
    `Some("TRUE")` match) disables TLS."""
    conf = configure_object_store(env={
        "BUCKET": "b", "AWS_ACCESS_KEY_ID": "k",
        "AWS_SECRET_ACCESS_KEY": "s",
        "AWS_ENDPOINT": "http://minio:9000", "AWS_ALLOW_HTTP": "TRUE"})
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.sql.catalog.lake.s3.endpoint"] == "http://minio:9000"
    assert conf["spark.sql.catalog.lake.s3.path-style-access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    # the flag must be the exact reference spelling
    conf2 = configure_object_store(env={
        "BUCKET": "b", "AWS_ACCESS_KEY_ID": "k",
        "AWS_SECRET_ACCESS_KEY": "s", "AWS_ALLOW_HTTP": "true"})
    assert "spark.hadoop.fs.s3a.connection.ssl.enabled" not in conf2


def test_catalog_and_object_store_compose():
    """The documented application shape: one merged extra_conf dict."""
    merged = {**configure_iceberg_catalog(name="lake", catalog_type="jdbc"),
              **configure_object_store(env={
                  "BUCKET": "b", "AWS_ACCESS_KEY_ID": "k",
                  "AWS_SECRET_ACCESS_KEY": "s"}, catalog_name="lake")}
    # object-store warehouse wins (S3 path replaces the local default)
    assert merged["spark.sql.catalog.lake.warehouse"] == "s3a://b/warehouse"
    assert merged["spark.sql.catalog.lake.catalog-impl"] == \
        "org.apache.iceberg.jdbc.JdbcCatalog"
