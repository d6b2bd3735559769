#!/usr/bin/env python
"""The reference binary, as a launcher: Arrow Flight SQL server on
0.0.0.0:31337 configured entirely from the environment.

    FLIGHT_USER=admin FLIGHT_PASSWORD=secret python scripts/serve_flight.py

Environment contract (mirrors iceberg-datafusion-arrow-flight-sql/src/main.rs and
-rest/src/main.rs, README.md):

- ``FLIGHT_USER`` / ``FLIGHT_PASSWORD``  basic-auth handshake creds (required)
- ``CATALOG_URL``                        sqlite:// Iceberg SQL catalog (sql mode)
- ``ICEBERG_CATALOG_URL``                Iceberg REST catalog endpoint (rest
  mode; wins over CATALOG_URL), with ``ICEBERG_CATALOG_BEARER_TOKEN`` /
  ``_OAUTH_TOKEN`` / ``_USERNAME`` / ``_PASSWORD``
- ``BUCKET`` / ``ICEBERG_WAREHOUSE``     data root for catalog tables
- ``TLS_DOMAIN``                         serve TLS with a startup self-signed cert
- ``CURRENT_DATABASE`` / ``CURRENT_SCHEMA``  identity-function values
- ``SPARK_GRAFT_TABLES_DIR``             optional: also register the fixture
  parquet tables into every session (demo/testing convenience)
- ``FLIGHT_PORT``                        port override (default 31337)

Catalog tables resolve by their qualified ``ns.table`` names per session;
clients speak the Flight SQL protocol (see examples/flight_client.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.service import EngineService
from iceberg_datafusion_arrow_flight_spark.service.flight_server import (
    SparkFlightServer)
from iceberg_datafusion_arrow_flight_spark.sources.registry import (
    register_tables)
from iceberg_datafusion_arrow_flight_spark.sources.rest_catalog import (
    engine_catalog_from_env)


def main() -> None:
    if not (os.environ.get("FLIGHT_USER")
            and os.environ.get("FLIGHT_PASSWORD")):
        sys.exit("set FLIGHT_USER and FLIGHT_PASSWORD (reference "
                 "README.md:9-10)")
    spark = get_spark(app_name="flight-sql-server")
    catalog = engine_catalog_from_env()
    tables_dir = os.environ.get("SPARK_GRAFT_TABLES_DIR")
    session_init = ((lambda s: register_tables(s, tables_dir))
                    if tables_dir else None)
    service = EngineService(spark, session_init=session_init,
                            catalog=catalog)
    port = int(os.environ.get("FLIGHT_PORT", "31337"))
    server = SparkFlightServer(service, f"grpc://0.0.0.0:{port}")
    mode = ("rest-catalog" if os.environ.get("ICEBERG_CATALOG_URL")
            else "sql-catalog" if os.environ.get("CATALOG_URL")
            else "no-catalog")
    tls = "tls" if os.environ.get("TLS_DOMAIN") else "plaintext"
    print(f"Flight SQL server listening on {port} ({mode}, {tls})",
          flush=True)
    server.serve()


if __name__ == "__main__":
    main()
