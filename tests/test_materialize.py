"""The materialization seam (VERDICT r9 'What's wrong' #3).

Every operator that used to call ``localCheckpoint`` directly now routes
through ``operators.materialize.materialize`` so a cluster deployment can
switch strategy process-wide instead of editing ~80 call sites.
"""

import os

import pytest

from iceberg_datafusion_arrow_flight_spark.operators.materialize import (
    STRATEGY_ENV,
    materialize,
    materialize_lazy,
    strategy,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture
def strat_env(monkeypatch):
    def set_strategy(name):
        monkeypatch.setenv(STRATEGY_ENV, name)
    return set_strategy


def test_default_strategy_is_local_checkpoint(monkeypatch):
    monkeypatch.delenv(STRATEGY_ENV, raising=False)
    assert strategy() == "local_checkpoint"


def test_invalid_strategy_raises(strat_env):
    strat_env("memoize_harder")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
        strategy()


def _component_labels(spark, strat, monkeypatch):
    """Run an iterative operator (lineage-truncation dependent) under
    the given strategy and return its result as a sorted list."""
    monkeypatch.setenv(STRATEGY_ENV, strat)
    from iceberg_datafusion_arrow_flight_spark.operators.dedup import (
        connected_components,
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20), (11, 12), (3, 1)],
        ["src", "dst"])
    out = connected_components(edges, "src", "dst")
    rows = sorted(map(tuple, out.collect()))
    return rows


def test_all_strategies_agree_on_iterative_operator(spark, monkeypatch,
                                                    tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    base = _component_labels(spark, "local_checkpoint", monkeypatch)
    assert base  # non-trivial fixture
    for strat in ("persist", "checkpoint"):
        got = _component_labels(spark, strat, monkeypatch)
        assert got == base, f"strategy {strat} diverged"
    # persist registers in the CacheManager by design (the job owns the
    # lifecycle on a cluster); clean up so the oracle gate's leak
    # invariant stays meaningful for whatever runs next.
    spark.catalog.clearCache()


def test_materialize_truncates_lineage_under_default(spark, monkeypatch):
    monkeypatch.setenv(STRATEGY_ENV, "local_checkpoint")
    out = materialize(spark.range(100))
    # localCheckpoint rewrites the plan to a LogicalRDD scan
    assert "Scan ExistingRDD" in out._jdf.queryExecution().toString() \
        or "LogicalRDD" in out._jdf.queryExecution().toString()
    lazy = materialize_lazy(spark.range(50))
    assert lazy.count() == 50


def test_materialize_scope_releases_persist_pins(spark, monkeypatch):
    """The persist-strategy lifecycle hook (VERDICT r10 ask #7): a
    long-running service wraps each query in materialize_scope() and
    the SQL CacheManager returns to empty once the scope closes — even
    though the operators inside pinned intermediates they never
    unpersist themselves."""
    from iceberg_datafusion_arrow_flight_spark.operators.materialize import (
        materialize_scope)

    jcm = spark._jsparkSession.sharedState().cacheManager()
    monkeypatch.setenv(STRATEGY_ENV, "persist")
    df = spark.range(100).withColumnRenamed("id", "v")
    assert jcm.isEmpty()
    with materialize_scope() as pins:
        a = materialize(df.selectExpr("v * 2 AS w"))
        b = materialize_lazy(a.selectExpr("w + 1 AS x"))
        assert b.count() == 100
        assert len(pins) == 2
        assert not jcm.isEmpty()
        # nested scope: inner pins release with the inner scope only
        with materialize_scope() as inner:
            c = materialize(df.selectExpr("v + 5 AS y"))
            assert c.count() == 100
            assert len(inner) == 1
        assert len(pins) == 2          # outer untouched by inner exit
        assert not jcm.isEmpty()       # outer pins still live
    assert jcm.isEmpty()

    # no-op under the default strategy: nothing registered, still empty
    monkeypatch.setenv(STRATEGY_ENV, "local_checkpoint")
    with materialize_scope() as pins:
        materialize(df.selectExpr("v * 3 AS z")).count()
        assert pins == []
    assert jcm.isEmpty()
