"""REST API round-trip tests — the reference's publicapi server/client test
analog (`pkg/publicapi/server_test.go:46-95`, `client_test.go:12`): health
probes, submit → poll states → fetch events/results, and error mapping."""

from __future__ import annotations

import pytest

from bacalhau_spark import __version__
from bacalhau_spark.api import ApiClient, ApiError, ApiServer
from bacalhau_spark.engine import Engine
from bacalhau_spark.registry import queries

from tests.conftest import SF_DIR


@pytest.fixture()
def api(spark):
    server = ApiServer(Engine(spark, queries()), port=0).start_background()
    try:
        yield ApiClient(server.url)
    finally:
        server.shutdown()


def test_health_and_version(api):
    assert api.healthz()
    assert api.version() == __version__


def test_submit_states_events_roundtrip(api):
    run_id = api.submit({"query": "q01_scan_projection",
                         "inputs": {"sf_dir": SF_DIR}})
    assert api.states(run_id) == "Completed"
    evts = api.events(run_id)
    assert [e["name"] for e in evts][:2] == ["Created", "Running"]
    assert evts[-1]["name"] == "Completed"
    assert api.list_runs()[run_id] == "Completed"


def test_describe_and_get_results(api, tmp_path):
    out = str(tmp_path / "api_out")
    run_id = api.submit({"query": "q01_scan_projection",
                         "inputs": {"sf_dir": SF_DIR},
                         "outputs": {"path": out, "format": "parquet"},
                         "replicas": 2, "verified": True})
    desc = api.describe(run_id)
    assert desc["state"] == "ResultsAccepted"
    assert desc["query"] == "q01_scan_projection"
    assert desc["manifest"]  # replica-compared content manifest published
    rows = api.results(run_id, limit=100)
    assert len(rows) == 25
    assert {"n_nationkey", "n_name", "n_regionkey"} <= set(rows[0])


def test_error_mapping(api):
    with pytest.raises(ApiError) as exc:
        api.states("no-such-run")
    assert exc.value.status == 404
    with pytest.raises(ApiError) as exc:
        api.submit({"query": "no_such_query"})
    assert exc.value.status == 404
    with pytest.raises(ApiError) as exc:
        api.submit({"inputs": {}})  # spec without a query field
    assert exc.value.status == 400
    with pytest.raises(ApiError) as exc:
        api.results("no-such-run")
    assert exc.value.status == 404


def test_results_without_sink_is_400(api):
    run_id = api.submit({"query": "q01_scan_projection",
                         "inputs": {"sf_dir": SF_DIR}})
    with pytest.raises(ApiError) as exc:
        api.results(run_id)
    assert exc.value.status == 400
