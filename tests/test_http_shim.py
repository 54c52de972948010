"""End-to-end HTTP shim tests: the reference's curl calls, served by the
stdlib shim over the Spark service/engine layer (recommend/http.py)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from graph_database_spark.recommend.engine import SparkRecommendationEngine
from graph_database_spark.recommend.http import serve
from graph_database_spark.recommend.service import RecommendationService


@pytest.fixture(scope="module")
def server(spark, toy):
    service = RecommendationService(spark, toy)
    engine = SparkRecommendationEngine(spark, toy, num_partitions=4)
    srv = serve(service, engine)
    yield f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def test_health_and_root(server):
    status, body = _get(f"{server}/health")
    assert status == 200 and body["ok"] is True
    status, body = _get(f"{server}/")
    assert status == 200 and "endpoints" in body


def test_recs_strategies_and_400(server):
    status, body = _get(f"{server}/recs?strategy=co_occurrence&limit=10")
    assert status == 200
    got = {(r["product_id"], r["co_count"])
           for r in body["recommendations"]}
    assert got == {("P2", 2), ("P1", 1), ("P4", 1)}
    status, body = _get(f"{server}/recs?strategy=bogus")
    assert status == 400 and "bogus" in body["detail"]


def test_customer_recommendations_and_404(server):
    # C1 touched every product -> excluded to [] (the tp1 golden); C2 has
    # real recommendations
    status, body = _get(f"{server}/customers/C1/recommendations?top_n=3")
    assert status == 200 and body["customer_id"] == "C1"
    assert body["recommendations"] == []
    status, body = _get(f"{server}/customers/C2/recommendations?top_n=3")
    assert status == 200
    assert body["recommendations"]
    assert all("product_id" in r and "score" in r
               for r in body["recommendations"])
    status, body = _get(f"{server}/customers/NOPE/recommendations")
    assert status == 404


def test_customer_strategies(server):
    status, body = _get(f"{server}/customers/C2/strategies?top_n=3")
    assert status == 200
    assert set(body["strategies"]) >= {"co_occurrence", "similarity"}
    for entries in body["strategies"].values():
        assert all("product_id" in e for e in entries)


def test_unknown_route_404(server):
    status, _ = _get(f"{server}/definitely/not/a/route")
    assert status == 404


def test_strategies_top_n_clamped(server):
    """tp1 bounds top_n with Query(3, ge=1, le=10) on BOTH customer
    routes (api.py:66,82); out-of-range values clamp instead of leaking
    through to the engine."""
    status, body = _get(f"{server}/customers/C2/strategies?top_n=100")
    assert status == 200
    for entries in body["strategies"].values():
        assert len(entries) <= 10
    status, body = _get(f"{server}/customers/C2/strategies?top_n=-1")
    assert status == 200  # clamps to 1, not an engine error


def test_internal_errors_are_well_formed_500(server, monkeypatch):
    """Non-ValueError failures from the Spark-backed handlers must come
    back as a well-formed HTTP 500 JSON body, not a dropped response."""
    import graph_database_spark.recommend.http as http_mod

    def boom(df):
        raise RuntimeError("spark exploded")

    monkeypatch.setattr(http_mod, "_rows", boom)
    status, body = _get(f"{server}/recs?strategy=co_occurrence")
    assert status == 500
    # generic body only: exception text (Py4J stacks, paths) must never
    # reach the client (ADVICE r5)
    assert body["detail"] == "internal error"
    assert "spark exploded" not in str(body)
