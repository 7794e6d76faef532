"""Golden port of the reference locales HTTP suite
(crates/meilisearch/tests/search/locales.rs): same documents, queries,
localizedAttributes rules, and snapshot hit sets.

What the suite pins: search-time `locales` steering Han tokenization
(detection: kana => Japanese, Han-only => Chinese trad->simp fold +
dictionary segmentation; jpn => bigrams, no fold), localizedAttributes
forcing per-field pipelines at index time, auto-inference of locales
from the rules of the searched attributes, locale-aware facet search,
Swedish (keep å/ä/ö) and German (compound splitting) pipelines, and the
pinned error messages for invalid locales.
"""

import pytest

from meilisearch_tpu.api.app import App, TestClient

DOCUMENTS = [
    {
        "id": 852,
        "name_en": "Attack on Titan",
        "description_en": "Attack on Titan is a Japanese manga series written and illustrated by Hajime Isayama",
        "author_en": "Hajime Isayama",
        "name_ja": "進撃の巨人",
        "description_ja": "進撃の巨人は、日本の漫画シリーズであり、諫山 創によって作画されている。",
        "author_ja": "諫山 創",
    },
    {
        "id": 853,
        "name_zh": "进击的巨人",
        "description_zh": "进击的巨人是日本的漫画系列，由諫山 創作画。",
        "author_zh": "諫山創",
    },
    {
        "id": 654,
        "name_en": "One Piece",
        "description_en": "One Piece is a Japanese manga series written and illustrated by Eiichiro Oda",
        "author_en": "Eiichiro Oda",
        "name_ja": "ワンピース",
        "description_ja": "ワンピースは、日本の漫画シリーズであり、尾田 栄一郎によって作画されている。",
        "author_ja": "尾田 栄一郎",
    },
    {
        "id": 655,
        "name_zh": "ONE PIECE",
        "description_zh": "海贼王》是尾田荣一郎创作的日本漫画系列。",
        "author_zh": "尾田 栄一郎",
    },
]

SEARCHABLE = [
    "name_en", "name_ja", "name_zh",
    "author_en", "author_ja", "author_zh",
    "description_en", "description_ja", "description_zh",
]


def make_client(settings):
    app = App()
    c = TestClient(app)
    res = c.patch("/indexes/test/settings", body=settings)
    assert res.status in (200, 202), res.json
    c.add_documents("test", DOCUMENTS)
    return app, c


def ids(c, query):
    query = dict(query)
    query["attributesToRetrieve"] = ["id"]
    res = c.search("test", query)
    assert res.status == 200, res.json
    return [h["id"] for h in res.json["hits"]]


class TestSimpleSearch:
    # locales.rs:91 simple_search — detection only, no rules
    @pytest.fixture(scope="class")
    def client(self):
        app, c = make_client({"searchableAttributes": SEARCHABLE})
        yield c
        app.scheduler.stop()

    def test_english(self, client):
        assert ids(client, {"q": "Atta"}) == [852]

    def test_kanji_detected_as_chinese(self, client):
        # 進撃 has no kana: detection says Chinese, trad->simp folds it
        # to 进击, which only the zh document contains
        assert ids(client, {"q": "進撃"}) == [853]

    def test_kanji_forced_japanese(self, client):
        # the jpn pipeline keeps 進撃 unfolded: only the ja document
        assert ids(client, {"q": "進撃", "locales": ["jpn"]}) == [852]

    def test_simplified_chinese(self, client):
        assert ids(client, {"q": "进击"}) == [853]


class TestForceLocales:
    # locales.rs:196 force_locales — every CJK field forced jpn
    @pytest.fixture(scope="class")
    def client(self):
        app, c = make_client(
            {
                "searchableAttributes": SEARCHABLE,
                "localizedAttributes": [
                    {
                        "attributePatterns": [
                            "name_ja", "name_zh", "author_ja", "author_zh",
                            "description_ja", "description_zh",
                        ],
                        "locales": ["jpn"],
                    }
                ],
            }
        )
        yield c
        app.scheduler.stop()

    def test_detection_infers_jpn_from_rules(self, client):
        # no explicit locales: the rules' union {jpn} steers the query
        assert ids(client, {"q": '"进击的巨人"'}) == [853]

    def test_forced_japanese(self, client):
        assert ids(client, {"q": '"进击的巨人"', "locales": ["jpn"]}) == [853]


class TestForceLocalesWithPattern:
    # locales.rs:276 force_locales_with_pattern — same via *_ja/*_zh
    @pytest.fixture(scope="class")
    def client(self):
        app, c = make_client(
            {
                "searchableAttributes": SEARCHABLE,
                "localizedAttributes": [
                    {"attributePatterns": ["*_ja", "*_zh"], "locales": ["jpn"]}
                ],
            }
        )
        yield c
        app.scheduler.stop()

    def test_detection(self, client):
        assert ids(client, {"q": '"进击的巨人"'}) == [853]

    def test_forced_japanese(self, client):
        assert ids(client, {"q": '"进击的巨人"', "locales": ["jpn"]}) == [853]


class TestForceDifferentLocalesWithPattern:
    # locales.rs:429 — *_zh indexed as jpn, *_ja indexed as cmn
    @pytest.fixture(scope="class")
    def client(self):
        app, c = make_client(
            {
                "searchableAttributes": SEARCHABLE,
                "localizedAttributes": [
                    {"attributePatterns": ["*_zh"], "locales": ["jpn"]},
                    {"attributePatterns": ["*_ja"], "locales": ["cmn"]},
                ],
            }
        )
        yield c
        app.scheduler.stop()

    def test_chinese_query_misses_jpn_indexed_doc(self, client):
        # the cmn phrase segments [进击][的][巨人]; the document was
        # indexed with the jpn pipeline (different segmentation)
        assert ids(client, {"q": '"进击的巨人"', "locales": ["cmn"]}) == []

    def test_japanese_query_matches(self, client):
        assert ids(client, {"q": '"进击的巨人"', "locales": ["jpn"]}) == [853]


class TestAutoInferWithAttributesToSearchOn:
    # locales.rs:507
    @pytest.fixture(scope="class")
    def client(self):
        app, c = make_client(
            {
                "searchableAttributes": SEARCHABLE,
                "localizedAttributes": [
                    {"attributePatterns": ["*_zh"], "locales": ["jpn"]},
                    {"attributePatterns": ["*_ja"], "locales": ["cmn"]},
                    {"attributePatterns": ["*_en"], "locales": []},
                ],
            }
        )
        yield c
        app.scheduler.stop()

    def test_no_attributes_no_match(self, client):
        # union {jpn, cmn}: detection picks cmn for Han-only text; the
        # zh doc was indexed as jpn
        assert ids(client, {"q": '"进击的巨人"'}) == []

    def test_restricted_to_zh_attrs_infers_their_rule(self, client):
        assert (
            ids(
                client,
                {
                    "q": '"进击的巨人"',
                    "attributesToSearchOn": ["name_zh", "description_zh"],
                },
            )
            == [853]
        )


class TestAutoInfer:
    # locales.rs:587 auto_infer_locales_at_search — wildcard rule
    @pytest.fixture(scope="class")
    def client(self):
        app, c = make_client(
            {
                "searchableAttributes": SEARCHABLE,
                "localizedAttributes": [
                    {"attributePatterns": ["*"], "locales": ["jpn"]}
                ],
            }
        )
        yield c
        app.scheduler.stop()

    def test_wildcard_rule_steers_query(self, client):
        assert ids(client, {"q": '"进击的巨人"'}) == [853]


class TestSettingsChange:
    # locales.rs:790 settings_change — changing localizedAttributes
    # re-indexes with the new pipelines (flat variant of the nested test)
    def test_settings_change(self):
        app, c = make_client(
            {
                "searchableAttributes": SEARCHABLE,
                "localizedAttributes": [
                    {"attributePatterns": ["*_ja", "*_zh"], "locales": ["jpn"]}
                ],
            }
        )
        try:
            assert ids(c, {"q": '"进击的巨人"', "locales": ["cmn"]}) == []
            assert ids(c, {"q": '"进击的巨人"', "locales": ["jpn"]}) == [853]
            c.update_settings(
                "test",
                {
                    "localizedAttributes": [
                        {"attributePatterns": ["*_zh"], "locales": ["cmn"]},
                        {"attributePatterns": ["*_ja"], "locales": ["jpn"]},
                    ]
                },
            )
            # now the zh doc is cmn-indexed: cmn matches, jpn does not
            assert ids(c, {"q": '"进击的巨人"', "locales": ["cmn"]}) == [853]
            assert ids(c, {"q": '"进击的巨人"', "locales": ["jpn"]}) == []
        finally:
            app.scheduler.stop()


class TestInvalidLocales:
    def test_invalid_search_locale(self):
        app, c = make_client({"searchableAttributes": ["name_en"]})
        try:
            res = c.search("test", {"q": "Atta", "locales": ["invalid"]})
            assert res.status == 400
            assert res.json["code"] == "invalid_search_locales"
            assert res.json["message"].startswith(
                "Unknown value `invalid` at `.locales[0]`: expected one of"
            )
        finally:
            app.scheduler.stop()

    def test_invalid_localized_attributes_rule(self):
        app = App()
        c = TestClient(app)
        try:
            res = c.patch(
                "/indexes/test/settings",
                body={
                    "localizedAttributes": [
                        {"attributePatterns": ["name_en"], "locales": ["japan"]}
                    ]
                },
            )
            assert res.status == 400
            assert res.json["code"] == "invalid_settings_localized_attributes"
            assert res.json["message"].startswith(
                "Unknown value `japan` at"
                " `.localizedAttributes[0].locales[0]`: expected one of"
            )
        finally:
            app.scheduler.stop()


class TestFacetSearch:
    # locales.rs:1050 simple_facet_search
    def test_simple_facet_search(self):
        app, c = make_client(
            {"filterableAttributes": ["name_en", "name_ja", "name_zh"]}
        )
        try:
            for locs in (["cmn"], ["jpn"]):
                res = c.post(
                    "/indexes/test/facet-search",
                    body={
                        "facetName": "name_zh",
                        "facetQuery": "進撃",
                        "locales": locs,
                    },
                )
                assert res.status == 200, res.json
                assert res.json["facetHits"] == [
                    {"value": "进击的巨人", "count": 1}
                ], locs
        finally:
            app.scheduler.stop()

    # locales.rs:1108 facet_search_with_localized_attributes
    def test_facet_search_with_localized_attributes(self):
        app, c = make_client(
            {
                "filterableAttributes": ["name_ja", "name_zh"],
                "localizedAttributes": [
                    {"attributePatterns": ["*_ja", "*_zh"], "locales": ["jpn"]}
                ],
            }
        )
        try:
            def hits(body):
                res = c.post("/indexes/test/facet-search", body=body)
                assert res.status == 200, res.json
                return res.json["facetHits"]

            assert (
                hits(
                    {
                        "facetName": "name_zh",
                        "facetQuery": "进击",
                        "locales": ["cmn"],
                    }
                )
                == []
            )
            assert hits(
                {
                    "facetName": "name_zh",
                    "facetQuery": "进击",
                    "locales": ["jpn"],
                }
            ) == [{"value": "进击的巨人", "count": 1}]
            assert hits(
                {"facetName": "name_zh", "facetQuery": "进击"}
            ) == [{"value": "进击的巨人", "count": 1}]
        finally:
            app.scheduler.stop()


class TestSwedish:
    # locales.rs:1181 swedish_search — å/ä/ö stay distinct under swe
    @pytest.fixture(scope="class")
    def client(self):
        app = App()
        c = TestClient(app)
        c.add_documents(
            "test",
            [
                {"id": "tra1-1", "product": "trä"},
                {"id": "tra2-1", "product": "traktor"},
                {"id": "tra1-2", "product": "träbjälke"},
                {"id": "tra2-2", "product": "trafiksignal"},
            ],
        )
        c.update_settings(
            "test",
            {
                "searchableAttributes": ["product"],
                "localizedAttributes": [
                    {"attributePatterns": ["product"], "locales": ["swe"]}
                ],
            },
        )
        yield c
        app.scheduler.stop()

    def products(self, c, query):
        query = dict(query)
        query["attributesToRetrieve"] = ["product"]
        res = c.search("test", query)
        assert res.status == 200, res.json
        return sorted(h["product"] for h in res.json["hits"])

    @pytest.mark.parametrize("locales", [None, ["swe"]])
    def test_tra_vs_trae(self, client, locales):
        extra = {"locales": locales} if locales else {}
        assert self.products(client, {"q": "trä", **extra}) == [
            "trä",
            "träbjälke",
        ]
        assert self.products(client, {"q": "tra", **extra}) == [
            "trafiksignal",
            "traktor",
        ]


class TestGerman:
    # locales.rs:1308 german_search — compound splitting under deu
    @pytest.fixture(scope="class")
    def client(self):
        app = App()
        c = TestClient(app)
        c.add_documents(
            "test",
            [
                {"id": 1, "product": "Interkulturalität"},
                {"id": 2, "product": "Wissensorganisation"},
            ],
        )
        c.update_settings(
            "test",
            {
                "searchableAttributes": ["product"],
                "localizedAttributes": [
                    {"attributePatterns": ["product"], "locales": ["deu"]}
                ],
            },
        )
        yield c
        app.scheduler.stop()

    def test_compound_parts_searchable(self, client):
        res = c_res = client.search(
            "test", {"q": "kulturalität", "attributesToRetrieve": ["product"]}
        )
        assert res.status == 200
        assert [h["product"] for h in res.json["hits"]] == [
            "Interkulturalität"
        ]
        res = client.search(
            "test", {"q": "organisation", "attributesToRetrieve": ["product"]}
        )
        assert [h["product"] for h in res.json["hits"]] == [
            "Wissensorganisation"
        ]
