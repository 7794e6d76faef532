"""Port of reference HTTP formatted tests
(crates/meilisearch/tests/search/formatted.rs)."""

import pytest

from meilisearch_tpu.api.app import App, TestClient

NESTED_DOCUMENTS = [
    {
        "id": 852,
        "father": "jean",
        "mother": "michelle",
        "doggos": [
            {"name": "bobby", "age": 2},
            {"name": "buddy", "age": 4},
        ],
        "cattos": "pésti",
    },
    {
        "id": 654,
        "father": "pierre",
        "mother": "sabine",
        "doggos": [{"name": "gros bill", "age": 8}],
        "cattos": ["simba", "pestiféré"],
    },
]


@pytest.fixture
def client():
    app = App()
    yield TestClient(app)
    app.scheduler.stop()


def test_formatted_crop_highlight(client):
    client.update_settings(
        "movies",
        {"filterableAttributes": ["genre"], "searchableAttributes": ["title"]},
    )
    client.add_documents(
        "movies",
        [
            {"id": 0, "title": "Le Petit Prince", "genre": "adventure"},
            {"id": 1, "title": "Pride and Prejudice", "genre": "romance"},
        ],
    )
    res = client.search(
        "movies",
        {
            "q": "prince",
            "attributesToCrop": ["title"],
            "cropLength": 2,
            "filter": "genre = adventure",
            "attributesToHighlight": ["title"],
            "attributesToRetrieve": ["title"],
        },
    )
    assert res.status == 200
    hit = res.json["hits"][0]
    assert hit["title"] == "Le Petit Prince"
    assert hit["_formatted"]["title"] == "…Petit <em>Prince</em>"


def test_formatted_nested_and_matches(client):
    client.update_settings("nested", {"displayedAttributes": ["id", "cattos"]})
    client.add_documents("nested", NESTED_DOCUMENTS)
    res = client.search(
        "nested",
        {
            "q": "pésti",
            "attributesToRetrieve": ["father", "mother"],
            "attributesToHighlight": ["father", "mother", "*"],
            "attributesToCrop": ["doggos"],
            "showMatchesPosition": True,
        },
    )
    hit = res.json["hits"][0]
    assert hit["_formatted"]["id"] == "852"
    assert hit["_formatted"]["cattos"] == "<em>pésti</em>"
    assert hit["_matchesPosition"]["cattos"] == [{"start": 0, "length": 6}]
    assert "father" not in hit  # not displayed


def test_nested_retrieve(client):
    client.add_documents("nested", NESTED_DOCUMENTS)
    res = client.search(
        "nested", {"q": "pésti", "attributesToRetrieve": ["doggos.name"]}
    )
    hit = res.json["hits"][0]
    assert hit == {"doggos": [{"name": "bobby"}, {"name": "buddy"}]}


def test_accented_prefix_highlight(client):
    client.add_documents("nested", NESTED_DOCUMENTS)
    res = client.search(
        "nested",
        {"q": "pesti", "attributesToHighlight": ["cattos"]},
    )
    hits = res.json["hits"]
    assert hits[0]["_formatted"]["cattos"] == "<em>pésti</em>"
    # prefix highlight covers only the typed prefix in "pestiféré"
    assert hits[1]["_formatted"]["cattos"][1] == "<em>pesti</em>féré"
