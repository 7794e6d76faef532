"""Golden port of more of the reference formatted HTTP suite
(crates/meilisearch/tests/search/formatted.rs): wildcard interactions
between displayedAttributes / attributesToRetrieve / highlight / crop,
the displayed-attributes clamp, and CJK highlighting."""

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


def make_client(settings=None):
    app = App()
    c = TestClient(app)
    if settings:
        c.update_settings("nested", settings)
    c.add_documents("nested", NESTED_DOCUMENTS)
    return app, c


def test_retrieve_star_no_formatted():
    app, c = make_client({"displayedAttributes": ["id", "cattos"]})
    hit = c.search("nested", {"q": "pésti", "attributesToRetrieve": ["*"]}).json[
        "hits"
    ][0]
    assert hit == {"id": 852, "cattos": "pésti"}
    app.scheduler.stop()


def test_retrieve_star_highlight_id():
    app, c = make_client({"displayedAttributes": ["id", "cattos"]})
    hit = c.search(
        "nested",
        {
            "q": "pésti",
            "attributesToRetrieve": ["*"],
            "attributesToHighlight": ["id"],
            "showMatchesPosition": True,
        },
    ).json["hits"][0]
    assert hit == {
        "id": 852,
        "cattos": "pésti",
        "_formatted": {"id": "852", "cattos": "pésti"},
        "_matchesPosition": {"cattos": [{"start": 0, "length": 6}]},
    }
    app.scheduler.stop()


def test_retrieve_star_crop_star():
    app, c = make_client({"displayedAttributes": ["id", "cattos"]})
    hit = c.search(
        "nested",
        {"q": "pésti", "attributesToRetrieve": ["*"], "attributesToCrop": ["*"]},
    ).json["hits"][0]
    assert hit == {
        "id": 852,
        "cattos": "pésti",
        "_formatted": {"id": "852", "cattos": "pésti"},
    }
    app.scheduler.stop()


def test_displayedattr_2_smol():
    app, c = make_client({"displayedAttributes": ["id"]})
    # not enough displayed for the other settings: everything clamps to id
    hit = c.search(
        "nested",
        {
            "attributesToRetrieve": ["father", "id"],
            "attributesToHighlight": ["mother"],
            "attributesToCrop": ["cattos"],
        },
    ).json["hits"][0]
    assert hit == {"id": 852}
    hit = c.search("nested", {"attributesToRetrieve": ["id"]}).json["hits"][0]
    assert hit == {"id": 852}
    hit = c.search("nested", {"attributesToHighlight": ["id"]}).json["hits"][0]
    assert hit == {"id": 852, "_formatted": {"id": "852"}}
    app.scheduler.stop()


def test_cjk_highlight():
    app = App()
    c = TestClient(app)
    c.add_documents(
        "cjk",
        [
            {"id": 0, "title": "この度、クーポンで無料で頂きました。"},
            {"id": 1, "title": "大卫到了扫罗那里"},
        ],
    )
    hit = c.search("cjk", {"q": "で", "attributesToHighlight": ["title"]}).json[
        "hits"
    ][0]
    assert (
        hit["_formatted"]["title"]
        == "この度、クーポン<em>で</em>無料<em>で</em>頂きました。"
    )
    hit = c.search(
        "cjk", {"q": "大卫", "attributesToHighlight": ["title"]}
    ).json["hits"][0]
    assert hit["_formatted"]["title"] == "<em>大卫</em>到了扫罗那里"
    app.scheduler.stop()
