"""Dynamic search rules: CRUD routes + pin injection at search time."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def seed(client):
    client.add_documents(
        "movies",
        [
            {"id": 1, "title": "alpha match"},
            {"id": 2, "title": "beta match"},
            {"id": 3, "title": "gamma match"},
            {"id": 4, "title": "promoted thing"},
        ],
    )


def test_rule_crud(client):
    res = client.patch(
        "/dynamic-search-rules/r1",
        body={
            "description": "promote doc 4",
            "actions": [
                {"selector": {"id": "4"}, "action": {"type": "pin", "position": 0}}
            ],
        },
    )
    assert res.status == 202
    task = client.wait_for_task(res.json["taskUid"])
    assert task["status"] == "succeeded"

    rule = client.get("/dynamic-search-rules/r1").json
    assert rule["description"] == "promote doc 4"
    assert rule["active"] is True

    res = client.post("/dynamic-search-rules", body={})
    assert res.json["total"] == 1

    res = client.post(
        "/dynamic-search-rules", body={"filter": {"active": False}}
    )
    assert res.json["total"] == 0

    res = client.delete("/dynamic-search-rules/r1")
    client.wait_for_task(res.json["taskUid"])
    assert client.get("/dynamic-search-rules/r1").status == 404


def test_pin_injection(client):
    seed(client)
    res = client.patch(
        "/dynamic-search-rules/promo",
        body={
            "conditions": {"query": {"words": "match"}},
            "actions": [
                {"selector": {"id": "4"}, "action": {"type": "pin", "position": 1}}
            ],
        },
    )
    client.wait_for_task(res.json["taskUid"])

    res = client.search("movies", {"q": "match"})
    ids = [h["id"] for h in res.json["hits"]]
    # doc 4 does not contain "match" organically but is pinned at position 1
    assert ids[1] == 4
    assert set(ids) == {1, 2, 3, 4}

    # rule does not trigger without the word
    res = client.search("movies", {"q": "alpha"})
    ids = [h["id"] for h in res.json["hits"]]
    assert 4 not in ids


def test_pin_empty_query_condition(client):
    seed(client)
    res = client.patch(
        "/dynamic-search-rules/empty",
        body={
            "conditions": {"query": {"isEmpty": True}},
            "actions": [
                {"selector": {"id": "3"}, "action": {"type": "pin", "position": 0}}
            ],
        },
    )
    client.wait_for_task(res.json["taskUid"])
    res = client.search("movies", {"q": ""})
    assert [h["id"] for h in res.json["hits"]][0] == 3
    res = client.search("movies", {"q": "alpha"})
    assert [h["id"] for h in res.json["hits"]][0] == 1


def test_invalid_rule_rejected(client):
    res = client.patch(
        "/dynamic-search-rules/bad",
        body={"actions": [{"selector": {"id": "1"}, "action": {"type": "boost"}}]},
    )
    assert res.status == 400
    res = client.patch(
        "/dynamic-search-rules/bad2",
        body={"conditions": {"query": {"isEmpty": True, "words": "x"}}},
    )
    assert res.status == 400


def test_pin_words_condition_and_score_details(client):
    seed(client)
    res = client.patch(
        "/dynamic-search-rules/cond1",
        body={
            "conditions": {"query": {"words": ["Match"]}},
            "actions": [
                {"selector": {"id": "3"}, "action": {"type": "pin", "position": 0}}
            ],
        },
    )
    client.wait_for_task(res.json["taskUid"])
    res = client.search(
        "movies",
        {"q": "match", "showRankingScore": True, "showRankingScoreDetails": True},
    )
    hits = res.json["hits"]
    assert hits[0]["id"] == 3
    # reference score_details.rs Pin serialization
    assert hits[0]["_rankingScoreDetails"] == {"pin": {"order": 0, "position": 0}}
    assert hits[0]["_rankingScore"] == 1.0
    # organic hits keep their per-rule details
    assert "words" in hits[1]["_rankingScoreDetails"]
    # a query not containing the condition word is not pinned
    res = client.search("movies", {"q": "promoted"})
    assert all(h["id"] != 3 for h in res.json["hits"])
