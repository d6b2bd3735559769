"""Service-layer tests: the reference's session / prepared-statement /
result-cache state machine (lib.rs:80-82, 198-259, 601-730) over Spark,
plus the Arrow Flight front door end-to-end on localhost.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from iceberg_datafusion_arrow_flight_spark.service import AuthError, EngineService
from iceberg_datafusion_arrow_flight_spark.sources.registry import register_tables


@pytest.fixture()
def creds(monkeypatch):
    monkeypatch.setenv("FLIGHT_USER", "admin")
    monkeypatch.setenv("FLIGHT_PASSWORD", "secret")


@pytest.fixture()
def service(spark, sf_dir, creds):
    register_tables(spark, sf_dir)
    return EngineService(spark, max_cached_results=4)


def test_handshake_good_and_bad(service):
    token = service.handshake("admin", "secret")
    assert token in service.sessions
    with pytest.raises(AuthError):
        service.handshake("admin", "wrong")


def test_handshake_requires_env(spark, monkeypatch):
    monkeypatch.delenv("FLIGHT_USER", raising=False)
    monkeypatch.delenv("FLIGHT_PASSWORD", raising=False)
    with pytest.raises(AuthError):
        EngineService(spark).handshake("x", "y")


def test_prepare_execute_fetch_close(service, spark):
    token = service.handshake("admin", "secret")
    # temp views live on the root session; child sessions don't see them —
    # use a standalone query (the reference's sessions share only catalog
    # tables, identically).
    handle = service.create_prepared_statement(
        token, "SELECT 1 AS a UNION ALL SELECT 2")
    assert service.statement_schema(handle) is not None
    ticket = service.execute(token, handle)
    table = service.fetch(token, ticket)
    assert isinstance(table, pa.Table)
    assert sorted(table.column("a").to_pylist()) == [1, 2]
    service.close_prepared_statement(token, handle)
    with pytest.raises(KeyError):
        service.fetch(token, ticket)


def test_rollback_special_case(service):
    """lib.rs:677,683-696: literal 'rollback' → constant single-row
    result, never touches the planner."""
    token = service.handshake("admin", "secret")
    handle = service.create_prepared_statement(token, "rollback")
    service.execute(token, handle)
    table = service.fetch(token, handle)
    assert table.column_names == ["rollback"]
    assert table.column("rollback").to_pylist() == ["ROLLBACK"]


def test_datafusion_dialect_accepted(service):
    token = service.handshake("admin", "secret")
    handle = service.create_prepared_statement(
        token, "SELECT 42::bigint AS x, strpos('hello', 'll') AS p")
    service.execute(token, handle)
    t = service.fetch(token, handle)
    assert t.column("x").to_pylist() == [42]
    assert t.column("p").to_pylist() == [3]


def test_bind_parameters(service):
    token = service.handshake("admin", "secret")
    handle = service.create_prepared_statement(
        token, "SELECT $1 + $2 AS s, $1 AS again")
    service.bind_parameters(token, handle, [40, 2])
    service.execute(token, handle)
    t = service.fetch(token, handle)
    assert t.column("s").to_pylist() == [42]
    assert t.column("again").to_pylist() == [40]


def test_execute_update_returns_minus_one(service):
    token = service.handshake("admin", "secret")
    handle = service.create_prepared_statement(
        token, "CREATE OR REPLACE TEMPORARY VIEW svc_v AS SELECT 7 AS x")
    assert service.execute_update(token, handle) == -1
    h2 = service.create_prepared_statement(token, "SELECT x FROM svc_v")
    service.execute(token, h2)
    assert service.fetch(token, h2).column("x").to_pylist() == [7]


def test_session_isolation_between_tokens(service):
    t1 = service.handshake("admin", "secret")
    t2 = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        t1, "CREATE OR REPLACE TEMPORARY VIEW iso_v AS SELECT 1 AS x")
    service.execute_update(t1, h)
    h_bad = service.create_prepared_statement
    with pytest.raises(Exception):
        h_bad(t2, "SELECT * FROM iso_v")  # analysis fails: not visible


def test_result_cache_lru_bound(service):
    token = service.handshake("admin", "secret")
    handles = []
    for i in range(6):
        h = service.create_prepared_statement(token, f"SELECT {i} AS x")
        service.execute(token, h)
        handles.append(h)
    assert len(service.results) == 4  # max_cached_results
    with pytest.raises(KeyError):
        service.fetch(token, handles[0])  # evicted
    assert service.fetch(token, handles[-1]).column("x").to_pylist() == [5]


def test_current_database_env_override(service, monkeypatch):
    """lib.rs:106-128: env-driven current_database/current_schema with
    defaults 'datafusion'/'public'."""
    monkeypatch.delenv("CURRENT_DATABASE", raising=False)
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        token, "SELECT current_database() AS d, current_schema() AS s")
    service.execute(token, h)
    t = service.fetch(token, h)
    assert t.column("d").to_pylist() == ["datafusion"]
    assert t.column("s").to_pylist() == ["public"]
    monkeypatch.setenv("CURRENT_DATABASE", "mydb")
    h2 = service.create_prepared_statement(
        token, "SELECT current_database() AS d")
    service.execute(token, h2)
    assert service.fetch(token, h2).column("d").to_pylist() == ["mydb"]


# ----------------------------------------------------------------- flight
def test_flight_server_end_to_end(spark, creds):
    fl = pytest.importorskip("pyarrow.flight")
    from iceberg_datafusion_arrow_flight_spark.service.flight_server import (
        SparkFlightServer)

    service = EngineService(spark)
    server = SparkFlightServer(service, "grpc://127.0.0.1:0")
    try:
        client = fl.connect(f"grpc://127.0.0.1:{server.port}")
        client.authenticate(_BasicClientAuth("admin", "secret"))
        import json
        res = list(client.do_action(
            fl.Action("create_prepared_statement",
                      b"SELECT 1::bigint AS one")))
        payload = json.loads(res[0].body.to_pybytes())
        handle = payload["handle"]
        assert payload["schema"] is not None
        # schema round-trips through Arrow IPC like the reference
        import base64 as _b64
        import pyarrow.ipc  # noqa: F401
        ipc_schema = pa.ipc.read_schema(
            pa.BufferReader(_b64.b64decode(payload["dataset_schema_ipc"])))
        assert ipc_schema.names == ["one"]
        info = client.get_flight_info(
            fl.FlightDescriptor.for_command(handle.encode()))
        table = client.do_get(info.endpoints[0].ticket).read_all()
        assert table.column("one").to_pylist() == [1]
        list(client.do_action(fl.Action("close_prepared_statement",
                                        handle.encode())))
    finally:
        server.shutdown()


try:
    import pyarrow.flight as _fl

    class _BasicClientAuth(_fl.ClientAuthHandler):
        def __init__(self, username, password):
            super().__init__()
            self.basic = _fl.BasicAuth(username, password)
            self.token = b""

        def authenticate(self, outgoing, incoming):
            outgoing.write(self.basic.serialize())
            self.token = incoming.read()

        def get_token(self):
            return self.token
except ImportError:  # pragma: no cover
    pass


def test_set_statement_maps_datafusion_conf(service):
    """SURVEY §3.3: SET datafusion.* maps onto the session conf; unknown
    DataFusion keys are accepted and ignored (compat)."""
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        token, "SET datafusion.execution.target_partitions = 7")
    assert service.execute_update(token, h) == -1
    sess = service.sessions[token]
    assert sess.conf.get("spark.sql.shuffle.partitions") == "7"
    h2 = service.create_prepared_statement(
        token, "SET datafusion.some.unknown.knob = true")
    assert service.execute_update(token, h2) == -1  # ignored, no error


def test_empty_result_keeps_schema(service):
    """lib.rs:282-286/339-342: an empty result still carries its schema
    through the cache and fetch path."""
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        token, "SELECT 1 AS a, 'x' AS b WHERE 1 = 0")
    service.execute(token, h)
    t = service.fetch(token, h)
    assert t.num_rows == 0
    assert t.column_names == ["a", "b"]


def test_show_all_and_df_settings(service):
    token = service.handshake("admin", "secret")
    # SET a mapped knob and an unmapped (accepted-and-ignored) knob
    for stmt in ("SET datafusion.execution.target_partitions = 8",
                 "SET datafusion.explain.logical_plan_only = true"):
        h = service.create_prepared_statement(token, stmt)
        assert service.execute_update(token, h) == -1
    ticket = service.execute(
        token, service.create_prepared_statement(token, "SHOW ALL"))
    settings = {r["name"]: r["value"]
                for r in service.fetch(token, ticket).to_pylist()}
    assert settings["datafusion.execution.target_partitions"] == "8"
    assert settings["datafusion.explain.logical_plan_only"] == "true"
    # information_schema spelling, filtered
    ticket2 = service.execute(token, service.create_prepared_statement(
        token, "SELECT value FROM information_schema.df_settings "
               "WHERE name = 'datafusion.execution.batch_size'"))
    assert service.fetch(token, ticket2).num_rows == 1


def test_cross_session_handle_denied(service):
    """ADVICE r1: a handle leaked across sessions must not execute in —
    or expose cached results to — another session (the reference keys
    all statement state per session, lib.rs:87-132)."""
    t1 = service.handshake("admin", "secret")
    t2 = service.handshake("admin", "secret")
    h = service.create_prepared_statement(t1, "SELECT 1 AS x")
    service.execute(t1, h)
    with pytest.raises(AuthError):
        service.execute(t2, h)
    with pytest.raises(AuthError):
        service.execute_update(t2, h)
    with pytest.raises(AuthError):
        service.fetch(t2, h)
    with pytest.raises(AuthError):
        service.bind_parameters(t2, h, [1])
    with pytest.raises(AuthError):
        service.close_prepared_statement(t2, h)
    # the owner is unaffected by the denied attempts
    assert service.fetch(t1, h).column("x").to_pylist() == [1]


def test_literal_dollar_does_not_defer_schema(service):
    """ADVICE r1: 'costs $5' is not a parameter — schema must be
    available eagerly at prepare time."""
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        token, "SELECT 'costs $5' AS price")
    assert service.statement_schema(h) is not None
    service.execute(token, h)
    assert service.fetch(token, h).column("price").to_pylist() == ["costs $5"]


def test_show_tables_and_columns(service):
    """DataFusion answers SHOW TABLES / SHOW COLUMNS from
    information_schema (enabled in the reference, lib.rs:92) — same
    spellings and output shapes here."""
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        token, "CREATE OR REPLACE TEMPORARY VIEW shown_v AS "
               "SELECT 1 AS a, 'x' AS b")
    service.execute_update(token, h)
    t1 = service.execute(token,
                         service.create_prepared_statement(token,
                                                           "SHOW TABLES"))
    tables = service.fetch(token, t1).to_pylist()
    assert any(r["table_name"] == "shown_v" and r["table_type"] == "VIEW"
               for r in tables)
    assert all(set(r) == {"table_catalog", "table_schema", "table_name",
                          "table_type"} for r in tables)
    t2 = service.execute(token, service.create_prepared_statement(
        token, "SHOW COLUMNS FROM shown_v"))
    cols = service.fetch(token, t2).to_pylist()
    assert [(c["column_name"], c["data_type"]) for c in cols] == \
        [("a", "int"), ("b", "string")]
    assert all(c["is_nullable"] in ("YES", "NO") for c in cols)


@pytest.fixture()
def table_service(spark, sf_dir, creds):
    """Service whose sessions see the fixture tables (newSession() does
    not inherit root temp views — the per-session init is the same hook
    a deployment uses)."""
    return EngineService(
        spark, session_init=lambda s: register_tables(s, sf_dir))


def test_explain_statement_shapes(table_service):
    """EXPLAIN returns DataFusion's (plan_type, plan) rows; ANALYZE
    executes and returns the metrics plan (lib.rs:678 passes both
    through ctx.sql)."""
    service = table_service
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(
        token, "EXPLAIN SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY 1")
    rows = service.results[service.execute(token, h)].to_pylist()
    assert [r["plan_type"] for r in rows] == ["logical_plan",
                                              "physical_plan"]
    assert "Aggregate" in rows[0]["plan"]
    h2 = service.create_prepared_statement(
        token, "EXPLAIN ANALYZE SELECT COUNT(*) FROM orders")
    rows2 = service.results[service.execute(token, h2)].to_pylist()
    assert [r["plan_type"] for r in rows2] == ["Plan with Metrics"]


def test_describe_statement_shape(table_service):
    service = table_service
    token = service.handshake("admin", "secret")
    h = service.create_prepared_statement(token, "DESCRIBE orders")
    rows = service.results[service.execute(token, h)].to_pylist()
    cols = {r["column_name"]: (r["data_type"], r["is_nullable"])
            for r in rows}
    assert "o_orderkey" in cols and "o_totalprice" in cols
    assert set(rows[0].keys()) == {"column_name", "data_type",
                                   "is_nullable"}


def test_concurrent_clients_stress_cache_and_sessions(service):
    """The Flight front door dispatches from a gRPC THREAD POOL: eight
    client threads hammer handshake → prepare → execute → fetch →
    close concurrently against a 4-entry result cache, so evictions,
    insertions, and move_to_end interleave constantly.  Every thread
    must read back ITS OWN correct result every iteration (no
    cross-contamination, no corrupted cache structure, no exceptions).
    The results OrderedDict is exactly the structure concurrent
    move_to_end/popitem would corrupt without the engine lock."""
    import threading

    errors: list[str] = []

    def client(i: int) -> None:
        try:
            token = service.handshake("admin", "secret")
            for j in range(6):
                n = 10 + (i * 6 + j) % 17
                h = service.create_prepared_statement(
                    token, f"SELECT CAST(SUM(id) AS BIGINT) AS n"
                           f" FROM range({n})")
                service.execute(token, h)
                got = service.fetch(token, h).column("n")[0].as_py()
                want = n * (n - 1) // 2
                if got != want:
                    errors.append(f"client {i} iter {j}: {got} != {want}")
                service.close_prepared_statement(token, h)
            service.close_session(token)
        except Exception as exc:           # noqa: BLE001 — surface it
            errors.append(f"client {i}: {exc!r}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert not errors, errors[:5]
    assert not service.sessions            # every session closed
    assert not service.statements
