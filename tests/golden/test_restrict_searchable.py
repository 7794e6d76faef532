"""Golden port of the reference restrict-searchable suite
(crates/meilisearch/tests/search/restrict_searchable.rs): same documents,
queries, and snapshot hit lists for attributesToSearchOn semantics."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

SIMPLE = [
    {"title": "Shazam!", "desc": "a Captain Marvel ersatz", "id": "1"},
    {
        "title": "Captain Planet",
        "desc": "He's not part of the Marvel Cinematic Universe",
        "id": "2",
    },
    {"title": "Captain Marvel", "desc": "a Shazam ersatz", "id": "3"},
]


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def search_ids(client, index, query):
    res = client.search(index, query)
    assert res.status == 200, res.json
    return [h["id"] for h in res.json["hits"]]


def test_simple_search_on_title(client):
    client.add_documents("m", SIMPLE)
    assert (
        len(search_ids(client, "m", {"q": "Captain Marvel", "attributesToSearchOn": ["title"]}))
        == 2
    )


def test_search_on_unknown_field(client):
    client.add_documents("m", SIMPLE)
    assert (
        search_ids(client, "m", {"q": "Captain Marvel", "attributesToSearchOn": ["unknown"]})
        == []
    )


def test_search_on_all_attributes(client):
    client.add_documents("m", SIMPLE)
    assert (
        len(search_ids(client, "m", {"q": "Captain Marvel", "attributesToSearchOn": ["*"]}))
        == 3
    )


def test_search_on_all_attributes_restricted_set(client):
    client.update_settings("m", {"searchableAttributes": ["title"]})
    client.add_documents("m", SIMPLE)
    assert (
        len(search_ids(client, "m", {"q": "Captain Marvel", "attributesToSearchOn": ["*"]}))
        == 2
    )


def test_simple_prefix_search_on_title(client):
    client.add_documents("m", SIMPLE)
    assert (
        len(search_ids(client, "m", {"q": "Captain Mar", "attributesToSearchOn": ["title"]}))
        == 2
    )


def test_matching_strategy_all(client):
    client.add_documents("m", SIMPLE)
    assert (
        len(
            search_ids(
                client,
                "m",
                {
                    "q": "Captain Marvel",
                    "attributesToSearchOn": ["title"],
                    "matchingStrategy": "all",
                },
            )
        )
        == 1
    )


def test_search_on_no_field(client):
    client.add_documents("m", SIMPLE)
    assert (
        search_ids(client, "m", {"q": "Captain Marvel", "attributesToSearchOn": []})
        == []
    )


def test_word_ranking_rule_order(client):
    client.add_documents("m", SIMPLE)
    assert search_ids(
        client,
        "m",
        {"q": "Captain Marvel", "attributesToSearchOn": ["title"], "attributesToRetrieve": ["id"]},
    ) == ["3", "2"]


def test_word_ranking_rule_order_exact_words(client):
    client.update_settings(
        "m", {"typoTolerance": {"disableOnWords": ["Captain", "Marvel"]}}
    )
    client.add_documents("m", SIMPLE)
    assert search_ids(
        client,
        "m",
        {"q": "Captain Marvel", "attributesToSearchOn": ["title"], "attributesToRetrieve": ["id"]},
    ) == ["3", "2"]


def test_attributes_ranking_rule_order(client):
    client.add_documents(
        "m",
        [
            {
                "title": "Captain Marvel",
                "desc": "a Shazam ersatz",
                "footer": "The story of Captain Marvel",
                "id": "1",
            },
            {
                "title": "The Avengers",
                "desc": "Captain Marvel is far from the earth",
                "footer": "A super hero team",
                "id": "2",
            },
        ],
    )
    assert search_ids(
        client,
        "m",
        {
            "q": "Captain Marvel",
            "attributesToSearchOn": ["desc", "footer"],
            "attributesToRetrieve": ["id"],
        },
    ) == ["1", "2"]


def test_exactness_ranking_rule_order(client):
    client.add_documents(
        "m",
        [
            {"title": "Captain Marvel", "desc": "Captain Marivel", "id": "1"},
            {"title": "Captain Marvel", "desc": "Captain the Marvel", "id": "2"},
        ],
    )
    assert search_ids(
        client,
        "m",
        {
            "q": "Captain Marvel",
            "attributesToRetrieve": ["id"],
            "attributesToSearchOn": ["desc"],
        },
    ) == ["2", "1"]


def test_search_on_exact_field(client):
    client.update_settings(
        "m", {"typoTolerance": {"disableOnAttributes": ["exact"]}}
    )
    client.add_documents(
        "m",
        [
            {"title": "Captain Marvel", "exact": "Captain Marivel", "id": "1"},
            {"title": "Captain Marivel", "exact": "Captain the Marvel", "id": "2"},
        ],
    )
    assert (
        len(search_ids(client, "m", {"q": "Marvel", "attributesToSearchOn": ["exact"]}))
        == 1
    )
