"""Golden-output tests for the recommendation engine against values captured
from executing the reference tp1 engine on its seed dataset (FIXTURES.md §3)."""

from __future__ import annotations

import pytest

from graph_database_spark.recommend.engine import SparkRecommendationEngine


@pytest.fixture(scope="module")
def engine(spark, toy):
    return SparkRecommendationEngine(spark, toy, num_partitions=4)


def _collect_recs(df):
    out = []
    for r in df.collect():
        contribs = {k: round(r[k], 6) for k in
                    ("co_occurrence", "similarity", "personalized_pagerank")
                    if k in df.columns and r[k] is not None}
        out.append((r["product_id"], round(r["score"], 6), contribs))
    return out


def test_recommend_c1_empty(engine):
    # C1 touched every product → everything excluded (FIXTURES §3)
    assert _collect_recs(engine.recommend_for_customer("C1", 3)) == []


def test_recommend_c2(engine):
    got = _collect_recs(engine.recommend_for_customer("C2", 3))
    assert len(got) == 1
    pid, score, contribs = got[0]
    assert pid == "P1"
    assert score == pytest.approx(0.836231, abs=1e-4)
    assert contribs["co_occurrence"] == pytest.approx(0.4, abs=1e-6)
    assert contribs["similarity"] == pytest.approx(0.3, abs=1e-6)
    assert contribs["personalized_pagerank"] == pytest.approx(0.136231, abs=1e-4)


def test_recommend_c3(engine):
    got = _collect_recs(engine.recommend_for_customer("C3", 3))
    assert [g[0] for g in got] == ["P2", "P4", "P3"]
    assert got[0][1] == pytest.approx(1.0, abs=1e-4)
    assert got[1][1] == pytest.approx(0.427511, abs=1e-4)
    assert got[2][1] == pytest.approx(0.3, abs=1e-4)
    # P3's contributions: similarity 0.3 and a ~0 (but >0) PPR leftover
    assert got[2][2]["similarity"] == pytest.approx(0.3, abs=1e-6)
    assert got[2][2]["personalized_pagerank"] == pytest.approx(0.0, abs=1e-4)


def test_breakdown_c2(engine):
    bd = engine.strategy_breakdown("C2", 3)
    co = [(r["product_id"], round(r["score"], 6)) for r in bd["co_occurrence"].collect()]
    sim = [(r["product_id"], round(r["score"], 6)) for r in bd["similarity"].collect()]
    ppr = [(r["product_id"], r["score"]) for r in bd["personalized_pagerank"].collect()]
    assert co == [("P1", 1.0)]
    assert sim == [("P1", 1.0)]
    assert len(ppr) == 1 and ppr[0][0] == "P1"
    assert ppr[0][1] == pytest.approx(0.210965, abs=1e-4)


def test_breakdown_c3(engine):
    bd = engine.strategy_breakdown("C3", 3)
    co = [(r["product_id"], round(r["score"], 6)) for r in bd["co_occurrence"].collect()]
    sim = [(r["product_id"], round(r["score"], 6)) for r in bd["similarity"].collect()]
    ppr = [(r["product_id"], r["score"]) for r in bd["personalized_pagerank"].collect()]
    assert co == [("P2", 1.0)]
    assert sim == [("P2", 0.333333), ("P3", 0.333333), ("P4", 0.333333)]
    assert [p for p, _ in ppr] == ["P2", "P4", "P3"]
    assert ppr[0][1] == pytest.approx(0.459442, abs=1e-4)
    assert ppr[1][1] == pytest.approx(0.195279, abs=1e-4)
    assert ppr[2][1] == pytest.approx(0.0, abs=1e-4)


def test_unknown_customer_raises(engine):
    with pytest.raises(ValueError, match="Unknown customer"):
        engine.recommend_for_customer("NOPE", 3)
