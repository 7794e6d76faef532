"""Golden port of the reference ranking-score suite
(crates/meilisearch/tests/search/mod.rs test_score / test_score_threshold
/ test_score_details): exact global scores to the last digit, detailed
score breakdowns, and threshold-filtered totals."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

SCORE_DOCS = [
    {"title": "Batman the dark knight returns: Part 1", "id": "A"},
    {"title": "Batman the dark knight returns: Part 2", "id": "B"},
    {"title": "Batman Returns", "id": "C"},
    {"title": "Batman", "id": "D"},
    {"title": "Badman", "id": "E"},
]

SHARED_DOCS = [
    {"title": "Shazam!", "id": "287947", "color": ["green", "blue"]},
    {"title": "Captain Marvel", "id": "299537", "color": ["yellow", "blue"]},
    {"title": "Escape Room", "id": "522681", "color": ["yellow", "red"]},
    {
        "title": "How to Train Your Dragon: The Hidden World",
        "id": "166428",
        "color": ["green", "red"],
    },
    {"title": "Gläss", "id": "450465", "color": ["blue", "red"]},
]


@pytest.fixture(scope="module")
def score_client():
    app = App()
    c = TestClient(app)
    c.add_documents("scores", SCORE_DOCS)
    yield c
    app.scheduler.stop()


def test_score(score_client):
    res = score_client.search(
        "scores",
        {"q": "Badman the dark knight returns 1", "showRankingScore": True},
    ).json
    got = [(h["id"], h["_rankingScore"]) for h in res["hits"]]
    expected = [
        ("A", 0.9746605609456898),
        ("B", 0.8055252965383685),
        ("E", 0.16666666666666666),
        ("C", 0.07702020202020202),
        ("D", 0.07702020202020202),
    ]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (gid, gs), (_eid, es) in zip(got, expected):
        assert abs(gs - es) < 1e-12, (gid, gs, es)


@pytest.mark.parametrize(
    "threshold,expected",
    [
        (0.0, [("A", 0.93430081300813), ("B", 0.6685627880184332),
               ("E", 0.25), ("C", 0.11553030303030302),
               ("D", 0.11553030303030302)]),
        (0.2, [("A", 0.93430081300813), ("B", 0.6685627880184332),
               ("E", 0.25)]),
        (0.5, [("A", 0.93430081300813), ("B", 0.6685627880184332)]),
        (0.8, [("A", 0.93430081300813)]),
        (1.0, []),
    ],
)
def test_score_threshold(score_client, threshold, expected):
    res = score_client.search(
        "scores",
        {
            "q": "Badman dark returns 1",
            "showRankingScore": True,
            "rankingScoreThreshold": threshold,
        },
    ).json
    assert res["estimatedTotalHits"] == len(expected)
    got = [(h["id"], h["_rankingScore"]) for h in res["hits"]]
    assert [g[0] for g in got] == [e[0] for e in expected]
    for (gid, gs), (_eid, es) in zip(got, expected):
        assert abs(gs - es) < 1e-12, (gid, gs, es)


def test_score_details():
    app = App()
    c = TestClient(app)
    c.add_documents("movies", SHARED_DOCS)
    res = c.search(
        "movies", {"q": "train dragon", "showRankingScoreDetails": True}
    ).json
    assert len(res["hits"]) == 1
    d = res["hits"][0]["_rankingScoreDetails"]
    assert d["words"] == {
        "order": 0, "matchingWords": 2, "maxMatchingWords": 2, "score": 1.0
    }
    assert d["typo"] == {
        "order": 1, "typoCount": 0, "maxTypoCount": 2, "score": 1.0
    }
    assert d["proximity"]["order"] == 2
    assert abs(d["proximity"]["score"] - 0.75) < 1e-12
    assert d["exactness"]["matchingWords"] == 2
    assert d["exactness"]["maxMatchingWords"] == 2
    assert abs(d["exactness"]["score"] - 0.3333333333333333) < 1e-12
    app.scheduler.stop()
