"""Iceberg REST catalog — client and server over the public REST spec.

The reference ships TWO binaries around one Flight service: the sql
binary backs it with a JDBC/SQL catalog
(iceberg-datafusion-arrow-flight-sql/src/main.rs:73) and the rest binary
swaps in an Iceberg REST **catalog client** configured entirely from the
environment — ICEBERG_CATALOG_URL, bearer/OAuth/basic credentials, and
an S3-or-memory object store
(iceberg-datafusion-arrow-flight-rest/src/main.rs:46-90).  This module
is that second mode: :class:`RestCatalog` speaks the public Iceberg REST
catalog API (paths from apache/iceberg's rest-catalog-open-api.yaml) and
exposes the SAME duck-typed surface the SQLite catalog does
(``_metadata_location`` / ``_swap_pointer`` / ``warehouse``), so the
existing :class:`~.iceberg_lite.IcebergTable` — appends, time travel,
schema evolution, compaction — works unchanged over HTTP.

:class:`RestCatalogServer` is the other half: a stdlib-HTTP server that
serves the same spec from a :class:`~.iceberg_lite.SqliteCatalog`, used
by tests and as the in-container stand-in for an external REST catalog
(no network egress here; on a real deployment point
``ICEBERG_CATALOG_URL`` at Polaris/Nessie/Unity and this client works
the same).

Spec slice implemented (enough for the reference's catalog usage):

- ``GET  /v1/config``                          → catalog config
- ``GET  /v1/namespaces``                      → list namespaces
- ``GET  /v1/namespaces/{ns}/tables``          → list tables
- ``GET  /v1/namespaces/{ns}/tables/{tbl}``    → LoadTableResult
- ``POST /v1/namespaces/{ns}/register``        → register a table by
  metadata location (how CREATE TABLE lands in a pointer catalog)
- ``POST /v1/namespaces/{ns}/tables/{tbl}``    → commit: CAS the
  metadata pointer; ``409 Conflict`` when the expected location is
  stale (CommitFailedError on the client — the same optimistic
  concurrency contract as the SQL catalog's UPDATE..WHERE)
- ``DELETE /v1/namespaces/{ns}/tables/{tbl}``  → drop

Commit bodies carry (expected, new) metadata locations rather than the
spec's full UpdateTableRequest requirement/update lists — the pointer
CAS is the part the engine's correctness depends on; documented
simplification like the JSON manifests in iceberg_lite.

Auth mirrors the reference's precedence: explicit bearer token, else
OAuth token, else basic auth (main.rs:48-53,66-69); the server rejects
wrong/missing credentials with 401.
"""

from __future__ import annotations

import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib import error as urlerror
from urllib import parse as urlparse
from urllib import request as urlrequest

from pyspark.sql import DataFrame

from .iceberg_lite import (CommitFailedError, IcebergTable, NoSuchTableError,
                           SqliteCatalog, TableAlreadyExistsError,
                           _write_new_table)


# ---------------------------------------------------------------------------
# Client — the reference's rest-binary catalog mode.
# ---------------------------------------------------------------------------


class RestCatalog:
    """Iceberg REST catalog client with the SQLite catalog's surface.

    ``warehouse`` is the client-visible object store root (the rest
    binary's S3-or-memory ObjectStoreBuilder, main.rs:72-89; here a
    shared filesystem path): data/metadata files are WRITTEN by the
    client into the store and only the POINTER travels through the
    catalog — exactly the Iceberg split of state."""

    def __init__(self, base_url: str, warehouse: str, name: str = "lake",
                 bearer_token: str | None = None,
                 oauth_token: str | None = None,
                 username: str | None = None,
                 password: str | None = None,
                 timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        # canonicalized for the same reason as SqliteCatalog.__init__:
        # Python-cwd vs JVM-cwd resolution of relative paths diverges
        self.warehouse = os.path.abspath(warehouse)
        self.name = name
        self.timeout = timeout
        # reference precedence: bearer, else oauth, else basic
        if bearer_token:
            self._auth = f"Bearer {bearer_token}"
        elif oauth_token:
            self._auth = f"Bearer {oauth_token}"
        elif username is not None:
            cred = base64.b64encode(
                f"{username}:{password or ''}".encode()).decode()
            self._auth = f"Basic {cred}"
        else:
            self._auth = None

    # -- wire ---------------------------------------------------------------

    def _request(self, method: str, path: str,
                 body: dict | None = None) -> tuple[int, dict]:
        url = self.base_url + path
        data = json.dumps(body).encode() if body is not None else None
        req = urlrequest.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self._auth:
            req.add_header("Authorization", self._auth)
        try:
            with urlrequest.urlopen(req, timeout=self.timeout) as resp:
                payload = resp.read()
                return resp.status, (json.loads(payload) if payload else {})
        except urlerror.HTTPError as e:  # spec errors carry JSON bodies
            payload = e.read()
            return e.code, (json.loads(payload) if payload else {})

    @staticmethod
    def _tpath(namespace: str, name: str | None = None) -> str:
        p = f"/v1/namespaces/{urlparse.quote(namespace, safe='')}/tables"
        if name is not None:
            p += "/" + urlparse.quote(name, safe="")
        return p

    # -- catalog surface (duck-typed like SqliteCatalog) --------------------

    def config(self) -> dict:
        status, body = self._request("GET", "/v1/config")
        if status != 200:
            raise ConnectionError(f"catalog config failed: {status} {body}")
        return body

    def list_tables(self, namespace: str | None = None) -> list[tuple[str, str]]:
        if namespace is not None:
            status, body = self._request("GET", self._tpath(namespace))
            if status != 200:
                raise NoSuchTableError(namespace)
            return sorted((tuple(i["namespace"])[0], i["name"])
                          for i in body["identifiers"])
        status, body = self._request("GET", "/v1/namespaces")
        if status != 200:
            # silent [] here would make EngineService register zero
            # catalog views on a bad credential — surface the failure
            raise ConnectionError(f"list namespaces failed: {status} {body}")
        out: list[tuple[str, str]] = []
        for ns in body.get("namespaces", []):
            out.extend(self.list_tables(ns[0]))
        return sorted(out)

    def create_table(self, namespace: str, name: str, df: DataFrame,
                     partition_by: list[str] | None = None,
                     ) -> IcebergTable:
        location = os.path.join(self.warehouse, namespace, name)
        metadata_location = _write_new_table(location, df, partition_by)
        status, body = self._request(
            "POST", f"/v1/namespaces/{urlparse.quote(namespace, safe='')}"
                    "/register",
            {"name": name, "metadata-location": metadata_location})
        if status == 409:
            raise TableAlreadyExistsError(f"{namespace}.{name}")
        if status != 200:
            raise ConnectionError(f"register failed: {status} {body}")
        return IcebergTable(self, namespace, name)

    def load_table(self, namespace: str, name: str) -> IcebergTable:
        if self._metadata_location(namespace, name) is None:
            raise NoSuchTableError(f"{namespace}.{name}")
        return IcebergTable(self, namespace, name)

    def drop_table(self, namespace: str, name: str) -> None:
        self._request("DELETE", self._tpath(namespace, name))

    # -- the two primitives IcebergTable needs ------------------------------

    def _metadata_location(self, namespace: str, name: str) -> str | None:
        status, body = self._request("GET", self._tpath(namespace, name))
        if status != 200:
            return None
        return body["metadata-location"]

    def _swap_pointer(self, namespace: str, name: str,
                      expected: str, new: str) -> None:
        status, body = self._request(
            "POST", self._tpath(namespace, name),
            {"expected-metadata-location": expected,
             "metadata-location": new})
        if status == 409:
            raise CommitFailedError(
                f"{namespace}.{name}: metadata_location moved from "
                f"{expected!r}; retry on the new base")
        if status != 200:
            raise ConnectionError(f"commit failed: {status} {body}")


def catalog_from_env(warehouse: str | None = None) -> RestCatalog:
    """The rest binary's environment contract (main.rs:46-69):
    ``ICEBERG_CATALOG_URL`` selects the catalog endpoint (required);
    credentials follow the same precedence.  ``BUCKET``/``AWS_*`` pick
    the object store there — this container has no object store or
    network egress, so the store is a filesystem path (``warehouse`` or
    ``$ICEBERG_WAREHOUSE``), the in-memory fallback's moral equivalent
    (main.rs:88)."""
    url = os.environ["ICEBERG_CATALOG_URL"]
    return RestCatalog(
        url,
        warehouse=warehouse or os.environ.get("ICEBERG_WAREHOUSE", "/tmp/warehouse"),
        bearer_token=os.environ.get("ICEBERG_CATALOG_BEARER_TOKEN"),
        oauth_token=os.environ.get("ICEBERG_CATALOG_OAUTH_TOKEN"),
        username=os.environ.get("ICEBERG_CATALOG_USERNAME"),
        password=os.environ.get("ICEBERG_CATALOG_PASSWORD"),
    )


# ---------------------------------------------------------------------------
# Server — the spec served from a SqliteCatalog.
# ---------------------------------------------------------------------------


class _Handler(BaseHTTPRequestHandler):
    # self.server is the ThreadingHTTPServer; RestCatalogServer.start()
    # hangs catalog / expected_auth / ENDPOINTS on it.

    # -- plumbing -----------------------------------------------------------

    def log_message(self, *args) -> None:  # silence per-request stderr noise
        pass

    def _send(self, status: int, body: dict) -> None:
        payload = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _error(self, status: int, msg: str, kind: str) -> None:
        # spec ErrorModel shape
        self._send(status, {"error": {"message": msg, "type": kind,
                                      "code": status}})

    def _authorized(self) -> bool:
        expected = self.server.expected_auth
        if expected is None:
            return True
        return self.headers.get("Authorization") == expected

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n)) if n else {}

    def _route(self) -> tuple[str, list[str]]:
        parts = [urlparse.unquote(p)
                 for p in self.path.split("?")[0].strip("/").split("/")]
        return self.command, parts

    # -- dispatch -----------------------------------------------------------

    def _handle(self) -> None:
        if not self._authorized():
            self._error(401, "missing or wrong credentials",
                        "NotAuthorizedException")
            return
        cat = self.server.catalog
        method, p = self._route()
        # GET /v1/config
        if method == "GET" and p == ["v1", "config"]:
            self._send(200, {"defaults": {}, "overrides": {},
                             "endpoints": self.server.ENDPOINTS})
            return
        # GET /v1/namespaces
        if method == "GET" and p == ["v1", "namespaces"]:
            namespaces = sorted({ns for ns, _t in cat.list_tables()})
            self._send(200, {"namespaces": [[ns] for ns in namespaces]})
            return
        # /v1/namespaces/{ns}/...
        if len(p) >= 4 and p[0] == "v1" and p[1] == "namespaces":
            ns = p[2]
            if method == "GET" and p[3:] == ["tables"]:
                idents = [{"namespace": [n], "name": t}
                          for n, t in cat.list_tables(ns)]
                self._send(200, {"identifiers": idents})
                return
            if method == "POST" and p[3:] == ["register"]:
                import sqlite3

                body = self._body()
                name, loc = body["name"], body["metadata-location"]
                # single transaction: the PRIMARY KEY is the real
                # existence check — concurrent registers race to the
                # INSERT and the loser gets the spec's 409, not a 500
                with cat._conn() as conn:
                    conn.execute("BEGIN IMMEDIATE")
                    try:
                        conn.execute(
                            "INSERT INTO iceberg_tables VALUES (?,?,?,?,NULL)",
                            (cat.name, ns, name, loc))
                        conn.execute("COMMIT")
                    except sqlite3.IntegrityError:
                        conn.execute("ROLLBACK")
                        self._error(409, f"{ns}.{name} exists",
                                    "AlreadyExistsException")
                        return
                self._send(200, {"metadata-location": loc})
                return
            if len(p) == 5 and p[3] == "tables":
                name = p[4]
                loc = cat._metadata_location(ns, name)
                if method == "GET":
                    if loc is None:
                        self._error(404, f"{ns}.{name} not found",
                                    "NoSuchTableException")
                        return
                    with open(loc) as f:
                        metadata = json.load(f)
                    self._send(200, {"metadata-location": loc,
                                     "metadata": metadata})
                    return
                if method == "POST":  # commit = pointer CAS
                    if loc is None:
                        self._error(404, f"{ns}.{name} not found",
                                    "NoSuchTableException")
                        return
                    body = self._body()
                    try:
                        cat._swap_pointer(
                            ns, name, body["expected-metadata-location"],
                            body["metadata-location"])
                    except CommitFailedError as e:
                        self._error(409, str(e), "CommitFailedException")
                        return
                    self._send(200,
                               {"metadata-location": body["metadata-location"]})
                    return
                if method == "DELETE":
                    cat.drop_table(ns, name)
                    self._send(200, {})
                    return
        self._error(404, f"no route for {method} {self.path}",
                    "NoSuchRouteException")

    do_GET = do_POST = do_DELETE = _handle


class RestCatalogServer:
    """Serve a :class:`SqliteCatalog` over the Iceberg REST spec slice.

    ``expected_auth`` pins the exact Authorization header value required
    (None = open).  ``start()`` binds an ephemeral port on localhost and
    serves from a daemon thread; use as a context manager in tests."""

    ENDPOINTS = [
        "GET /v1/config",
        "GET /v1/namespaces",
        "GET /v1/namespaces/{namespace}/tables",
        "POST /v1/namespaces/{namespace}/register",
        "GET /v1/namespaces/{namespace}/tables/{table}",
        "POST /v1/namespaces/{namespace}/tables/{table}",
        "DELETE /v1/namespaces/{namespace}/tables/{table}",
    ]

    def __init__(self, catalog: SqliteCatalog,
                 bearer_token: str | None = None,
                 username: str | None = None,
                 password: str | None = None) -> None:
        self.catalog = catalog
        if bearer_token:
            self.expected_auth: str | None = f"Bearer {bearer_token}"
        elif username is not None:
            cred = base64.b64encode(
                f"{username}:{password or ''}".encode()).decode()
            self.expected_auth = f"Basic {cred}"
        else:
            self.expected_auth = None
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        assert self._httpd is not None, "server not started"
        return f"http://127.0.0.1:{self._httpd.server_address[1]}"

    def start(self) -> "RestCatalogServer":
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        httpd.catalog = self.catalog            # type: ignore[attr-defined]
        httpd.expected_auth = self.expected_auth  # type: ignore[attr-defined]
        httpd.ENDPOINTS = self.ENDPOINTS        # type: ignore[attr-defined]
        self._httpd = httpd
        self._thread = threading.Thread(target=httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self) -> "RestCatalogServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def engine_catalog_from_env():
    """The full two-binary catalog selection: ``ICEBERG_CATALOG_URL``
    (the rest binary's REST catalog, -rest/src/main.rs:46) wins, else
    ``CATALOG_URL`` (the sql binary's SQL catalog, -sql/src/main.rs:45),
    else None — pass the result to ``EngineService(catalog=...)``."""
    if os.environ.get("ICEBERG_CATALOG_URL"):
        return catalog_from_env()
    if os.environ.get("CATALOG_URL"):
        from .iceberg_lite import sql_catalog_from_env
        return sql_catalog_from_env()
    return None
