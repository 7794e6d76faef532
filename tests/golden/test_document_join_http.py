"""Golden port of the reference document-join HTTP suite
(crates/meilisearch/tests/search/document_join.rs): hydration of
foreign-key fields into full foreign documents (search, multi-search,
federated), `_foreign(..)` filter evaluation against the foreign index,
the foreignKeys experimental-feature gate, and the pinned error shapes
(field not a foreign key, nested foreign, inner-filter error
propagation, rewritten-IN filterability)."""

import pytest

from meilisearch_tpu.api.app import App, TestClient


AUTHORS = [
    {"id": "a1", "name": "Alice"},
    {"id": "a2", "name": "Bob"},
    {"id": "a3", "name": "Charlie"},
    {"id": "a4", "name": "Diana"},
    {"id": "a5", "name": "Ethan"},
    {"id": "a6", "name": "Fiona"},
    {"id": "a7", "name": "George"},
    {"id": "a8", "name": "Hannah"},
    {"id": "a9", "name": "Isaac"},
    {"id": "a10", "name": "Julia"},
    {"id": "a11", "name": "Kevin"},
    {"id": "a12", "name": "Liam"},
    {"id": "a13", "name": "Mia"},
]

BOOKS = [
    {"id": "b1", "title": "Rust in action", "author": "a1", "related_authors": ["a2", "a3"]},
    {"id": "b2", "title": "Captain Marvel story", "author": "a2", "related_authors": ["a3", "a4"]},
    {"id": "b3", "title": "The Great Gatsby", "author": "a3", "related_authors": ["a4", "a5"]},
    {"id": "b4", "title": "To Kill a Mockingbird", "author": "a4", "related_authors": ["a5", "a6"]},
    {"id": "b5", "title": "1984", "author": "a5", "related_authors": ["a6", "a7"]},
    {"id": "b6", "title": "The Catcher in the Rye", "author": "a6", "related_authors": ["a7", "a8"]},
    {"id": "b7", "title": "The Lord of the Rings", "author": "a7", "related_authors": ["a8", "a9"]},
    {"id": "b8", "title": "The Hobbit", "author": "a8", "related_authors": ["a9", "a10"]},
    {"id": "b9", "title": "The Little Prince", "author": "a9", "related_authors": ["a10", "a11"]},
    {"id": "b10", "title": "The Alchemist", "author": "a10", "related_authors": ["a11", "a12"]},
]

AUTHOR_PROFILES = [
    {"id": "a1", "name": "Alice", "birthday": "1990-01-01", "popularity": 2.0},
    {"id": "a2", "name": "Bob", "birthday": "1958-06-15", "popularity": 4.5},
    {"id": "a3", "name": "Charlie", "birthday": "1940-05-05", "popularity": 4.8},
    {"id": "a4", "name": "Diana", "birthday": "1985-03-20", "popularity": 3.2},
    {"id": "a5", "name": "Ethan", "birthday": "1972-11-30", "popularity": 3.9},
    {"id": "a6", "name": "Fiona", "birthday": "1988-07-14", "popularity": 2.8},
    {"id": "a7", "name": "George", "birthday": "1961-04-02", "popularity": 3.0},
    {"id": "a8", "name": "Hannah", "birthday": "1995-09-09", "popularity": 4.1},
    {"id": "a9", "name": "Isaac", "birthday": "1977-12-25", "popularity": 3.6},
    {"id": "a10", "name": "Julia", "birthday": "1982-06-01", "popularity": 4.0},
    {"id": "a11", "name": "Kevin", "birthday": "1999-02-18", "popularity": 2.5},
    {"id": "a12", "name": "Liam", "birthday": "2001-10-10", "popularity": 3.1},
    {"id": "a13", "name": "Mia", "birthday": "2003-08-08", "popularity": 2.2},
]

BOOKS_WITH_GENRES = [
    {**BOOKS[0], "genres": ["tech", "programming"]},
    {**BOOKS[1], "genres": ["action", "fiction"]},
    {**BOOKS[2], "genres": ["action", "classic"]},
    {**BOOKS[3], "genres": ["classic", "drama"]},
    {**BOOKS[4], "genres": ["dystopia", "fiction"]},
    {**BOOKS[5], "genres": ["action", "fiction"]},
    {**BOOKS[6], "genres": ["fantasy", "adventure"]},
    {**BOOKS[7], "genres": ["fantasy"]},
    {**BOOKS[8], "genres": ["fiction"]},
    {**BOOKS[9], "genres": ["fiction"]},
]

FK_SETTINGS = {
    "foreignKeys": [
        {"foreignIndexUid": "authors", "fieldName": "author"},
        {"foreignIndexUid": "authors", "fieldName": "related_authors"},
    ]
}


@pytest.fixture
def client():
    app = App()
    c = TestClient(app)
    yield c
    app.scheduler.stop()


def set_features(client, on: bool):
    res = client.patch("/experimental-features", body={"foreignKeys": on})
    assert res.status == 200, res.json


def seed(client, profiles=False, fk=True, author_filterable=None,
         books_filterable=None):
    client.add_documents(
        "authors", AUTHOR_PROFILES if profiles else AUTHORS, primary_key="id"
    )
    if author_filterable is not None:
        client.update_settings(
            "authors", {"filterableAttributes": author_filterable}
        )
    settings = {}
    if fk:
        settings.update(FK_SETTINGS)
    if books_filterable is not None:
        settings["filterableAttributes"] = books_filterable
    if settings:
        client.update_settings("books", settings)
    client.add_documents(
        "books", BOOKS_WITH_GENRES if profiles else BOOKS, primary_key="id"
    )


def test_search_hydration_with_attributes_to_highlight(client):
    set_features(client, True)
    seed(client)
    params = {
        "q": "Rust",
        "attributesToRetrieve": ["title", "author", "related_authors"],
        "attributesToHighlight": ["title"],
    }
    res = client.search("books", params)
    assert res.status == 200, res.json
    assert res.json["hits"] == [
        {
            "title": "Rust in action",
            "author": {"id": "a1", "name": "Alice"},
            "related_authors": [
                {"id": "a2", "name": "Bob"},
                {"id": "a3", "name": "Charlie"},
            ],
            "_formatted": {
                "title": "<em>Rust</em> in action",
                "author": {"id": "a1", "name": "Alice"},
                "related_authors": [
                    {"id": "a2", "name": "Bob"},
                    {"id": "a3", "name": "Charlie"},
                ],
            },
        }
    ]

    # feature off: raw ids stay
    set_features(client, False)
    res = client.search("books", params)
    assert res.status == 200
    assert res.json["hits"] == [
        {
            "title": "Rust in action",
            "author": "a1",
            "related_authors": ["a2", "a3"],
            "_formatted": {
                "title": "<em>Rust</em> in action",
                "author": "a1",
                "related_authors": ["a2", "a3"],
            },
        }
    ]


def test_multi_search_hydration(client):
    set_features(client, True)
    seed(client)
    params = {
        "queries": [
            {
                "indexUid": "books",
                "q": "Rust",
                "attributesToRetrieve": ["title", "author", "related_authors"],
                "attributesToHighlight": ["title"],
            }
        ]
    }
    res = client.post("/multi-search", body=params)
    assert res.status == 200, res.json
    hit = res.json["results"][0]["hits"][0]
    assert hit["author"] == {"id": "a1", "name": "Alice"}
    assert hit["related_authors"] == [
        {"id": "a2", "name": "Bob"},
        {"id": "a3", "name": "Charlie"},
    ]
    assert hit["_formatted"]["author"] == {"id": "a1", "name": "Alice"}

    set_features(client, False)
    res = client.post("/multi-search", body=params)
    assert res.status == 200
    hit = res.json["results"][0]["hits"][0]
    assert hit["author"] == "a1"
    assert hit["related_authors"] == ["a2", "a3"]


def test_federated_search_hydration(client):
    set_features(client, True)
    seed(client)
    params = {
        "federation": {},
        "queries": [
            {
                "indexUid": "books",
                "q": "Captain",
                "attributesToRetrieve": ["title", "author", "related_authors"],
                "attributesToHighlight": ["title"],
            }
        ],
    }
    res = client.post("/multi-search", body=params)
    assert res.status == 200, res.json
    hit = res.json["hits"][0]
    assert hit["title"] == "Captain Marvel story"
    assert hit["author"] == {"id": "a2", "name": "Bob"}
    assert hit["related_authors"] == [
        {"id": "a3", "name": "Charlie"},
        {"id": "a4", "name": "Diana"},
    ]
    assert hit["_formatted"]["author"] == {"id": "a2", "name": "Bob"}

    set_features(client, False)
    res = client.post("/multi-search", body=params)
    assert res.status == 200
    hit = res.json["hits"][0]
    assert hit["author"] == "a2"
    assert hit["related_authors"] == ["a3", "a4"]


FOREIGN_FILTER = (
    'genres = action AND _foreign(author, birthday STARTS WITH "1958-"'
    " AND popularity >= 3.5)"
)


def seed_profiles(client):
    seed(
        client,
        profiles=True,
        author_filterable=["id", "birthday", "popularity"],
        books_filterable=["id", "genres", "author", "related_authors"],
    )


def test_search_with_foreign_filter_on_author_profile(client):
    set_features(client, True)
    seed_profiles(client)
    params = {
        "q": "",
        "filter": FOREIGN_FILTER,
        "attributesToRetrieve": ["title", "author", "related_authors", "genres"],
    }
    res = client.search("books", params)
    assert res.status == 200, res.json
    assert res.json["hits"] == [
        {
            "title": "Captain Marvel story",
            "author": {
                "id": "a2",
                "name": "Bob",
                "birthday": "1958-06-15",
                "popularity": 4.5,
            },
            "related_authors": [
                {
                    "id": "a3",
                    "name": "Charlie",
                    "birthday": "1940-05-05",
                    "popularity": 4.8,
                },
                {
                    "id": "a4",
                    "name": "Diana",
                    "birthday": "1985-03-20",
                    "popularity": 3.2,
                },
            ],
            "genres": ["action", "fiction"],
        }
    ]

    set_features(client, False)
    res = client.search("books", params)
    assert res.status == 400
    assert res.json == {
        "message": (
            "using a foreign filter requires enabling the `foreign_keys`"
            " experimental feature. See"
            " https://github.com/orgs/meilisearch/discussions/873\n"
            '30:36 _foreign(author, birthday STARTS WITH "1958-" AND'
            " popularity >= 3.5)"
        ),
        "code": "feature_not_enabled",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#feature_not_enabled",
    }


def test_federated_search_with_foreign_filter(client):
    set_features(client, True)
    seed_profiles(client)
    params = {
        "federation": {},
        "queries": [
            {
                "indexUid": "books",
                "q": "",
                "filter": FOREIGN_FILTER,
                "attributesToRetrieve": ["title", "author", "related_authors", "genres"],
            },
            {
                "indexUid": "books",
                "q": "",
                "filter": (
                    'genres = classic AND (_foreign(author, birthday STARTS'
                    ' WITH "198") OR _foreign(related_authors, birthday'
                    ' STARTS WITH "198"))'
                ),
                "attributesToRetrieve": ["title", "author", "related_authors", "genres"],
            },
        ],
    }
    res = client.post("/multi-search", body=params)
    assert res.status == 200, res.json
    titles = [h["title"] for h in res.json["hits"]]
    assert sorted(titles) == [
        "Captain Marvel story",
        "The Great Gatsby",
        "To Kill a Mockingbird",
    ]
    for hit in res.json["hits"]:
        assert isinstance(hit["author"], dict), hit
        assert all(isinstance(a, dict) for a in hit["related_authors"])

    set_features(client, False)
    res = client.post("/multi-search", body=params)
    assert res.status == 400
    assert res.json["code"] == "feature_not_enabled"
    assert res.json["message"].startswith(
        "Inside `.queries[0]`: using a foreign filter requires enabling"
        " the `foreign_keys` experimental feature."
    )


def test_multi_search_with_foreign_filter(client):
    set_features(client, True)
    seed_profiles(client)
    params = {
        "queries": [
            {
                "indexUid": "books",
                "q": "",
                "filter": FOREIGN_FILTER,
                "attributesToRetrieve": ["title", "author", "related_authors", "genres"],
            }
        ]
    }
    res = client.post("/multi-search", body=params)
    assert res.status == 200, res.json
    result = res.json["results"][0]
    assert result["estimatedTotalHits"] == 1
    hit = result["hits"][0]
    assert hit["title"] == "Captain Marvel story"
    assert hit["author"]["id"] == "a2"

    set_features(client, False)
    res = client.post("/multi-search", body=params)
    assert res.status == 400
    assert res.json["code"] == "feature_not_enabled"
    assert res.json["message"].startswith("Inside `.queries[0]`: using a foreign filter")


def test_foreign_filter_rejects_field_not_in_foreign_keys(client):
    set_features(client, True)
    seed(client)
    params = {"q": "", "filter": "_foreign(title, id = a1)"}
    res = client.search("books", params)
    assert res.status == 400
    assert res.json == {
        "message": "Index `books`: Field `title` is not a foreign key",
        "code": "invalid_search_filter",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_filter",
    }

    res = client.post(
        "/multi-search",
        body={"queries": [{"indexUid": "books", **params}], "federation": {}},
    )
    assert res.status == 400
    assert res.json["message"] == "Index `books`: Field `title` is not a foreign key"


def test_foreign_filter_rejects_when_no_foreign_keys_configured(client):
    set_features(client, True)
    seed(client, fk=False)
    params = {"q": "", "filter": "_foreign(author, id = a1)"}
    res = client.search("books", params)
    assert res.status == 400
    assert res.json["message"] == (
        "Index `books`: Field `author` is not a foreign key"
    )
    assert res.json["code"] == "invalid_search_filter"


def test_foreign_filter_rejects_nested_foreign(client):
    set_features(client, True)
    seed(client)
    params = {
        "q": "",
        "filter": "_foreign(author, id = a1 AND _foreign(related_authors, id = a2))",
    }
    res = client.search("books", params)
    assert res.status == 400
    assert res.json == {
        "message": "Index `books`: Nested foreign filters are not supported",
        "code": "invalid_search_filter",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_filter",
    }


def test_foreign_filter_propagates_inner_filter_error(client):
    set_features(client, True)
    seed(
        client,
        profiles=True,
        author_filterable=["id"],
        books_filterable=["id", "genres", "author", "related_authors", "title"],
    )
    params = {"q": "", "filter": '_foreign(author, birthday = "1958-06-15")'}
    res = client.search("books", params)
    assert res.status == 400
    assert res.json == {
        "message": (
            "Index `authors`: Attribute `birthday` is not filterable."
            " Available filterable attribute patterns are: `id`.\n"
            '18:26 _foreign(author, birthday = "1958-06-15")'
        ),
        "code": "invalid_document_filter",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_document_filter",
    }


def test_foreign_filter_on_non_filterable_attribute(client):
    set_features(client, True)
    seed(client, fk=False, author_filterable=["id"])
    client.update_settings(
        "books",
        {"foreignKeys": [{"foreignIndexUid": "authors", "fieldName": "author"}]},
    )
    params = {"q": "", "filter": "_foreign(author, id = a1)"}
    res = client.search("books", params)
    assert res.status == 400
    assert res.json == {
        "message": (
            "Index `books`: Attribute `author` is not filterable. This"
            " index does not have configured filterable attributes.\n"
            '2:8 "author" IN ["a1"]'
        ),
        "code": "invalid_search_filter",
        "type": "invalid_request",
        "link": "https://docs.meilisearch.com/errors#invalid_search_filter",
    }


def test_foreign_settings_gate(client):
    """foreignKeys settings are feature-gated: setting errors when off,
    the main GET omits the key when off and shows it when on
    (reference settings.rs:739,838)."""
    set_features(client, False)
    client.add_documents("books", BOOKS, primary_key="id")
    res = client.patch("/indexes/books/settings", body=FK_SETTINGS)
    assert res.status == 400
    assert res.json["code"] == "feature_not_enabled"
    assert res.json["message"].startswith(
        "setting `foreignKeys` in the index settings requires enabling"
    )
    res = client.get("/indexes/books/settings")
    assert "foreignKeys" not in res.json

    set_features(client, True)
    client.update_settings("books", FK_SETTINGS)
    res = client.get("/indexes/books/settings")
    assert res.json["foreignKeys"] == FK_SETTINGS["foreignKeys"]


def test_foreign_filter_unsupported_endpoint(client):
    """Endpoints that never resolve joins reject `_foreign` explicitly
    (reference filter.rs unsupported_foreign_filter_error)."""
    set_features(client, True)
    seed(client, books_filterable=["id", "author"])
    res = client.post(
        "/indexes/books/documents/fetch",
        body={"filter": "_foreign(author, id = a1)"},
    )
    assert res.status == 400
    assert (
        "Filter condition `_foreign` is not supported for this endpoint."
        in res.json["message"]
    )


def test_hydration_unknown_and_invalid_ids(client):
    """Unknown foreign ids hydrate to `{}`; invalid id values stay raw
    (reference hydration.rs make_document + hydrate_document_value)."""
    set_features(client, True)
    client.add_documents("authors", AUTHORS, primary_key="id")
    client.update_settings("books", FK_SETTINGS)
    client.add_documents(
        "books",
        [
            {"id": "bx", "title": "Ghost book", "author": "a999",
             "related_authors": ["a1", {"bad": 1}]},
        ],
        primary_key="id",
    )
    res = client.search("books", {"q": "Ghost"})
    assert res.status == 200
    hit = res.json["hits"][0]
    assert hit["author"] == {}
    assert hit["related_authors"][0] == {"id": "a1", "name": "Alice"}
    assert hit["related_authors"][1] == {"bad": 1}  # invalid id: raw
