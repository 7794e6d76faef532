"""Port of reference tests/language.rs: kanji language detection — a
Japanese query must find the Japanese document among Latin/Hebrew ones
(same documents, same query, same expected ids)."""

from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search


def test_kanji_language_detection():
    s = IndexStore("lang", primary_key="id")
    s.add_documents(
        [
            {
                "id": 0,
                "title": "The quick (\"brown\") fox can't jump 32.3 feet,"
                " right? Brr, it's 29.3°F!",
            },
            {"id": 1, "title": "東京のお寿司。"},
            {
                "id": 2,
                "title": "הַשּׁוּעָל הַמָּהִיר (״הַחוּם״) לֹא יָכוֹל לִקְפֹּץ"
                " 9.94 מֶטְרִים, נָכוֹן? ברר, 1.5°C- בַּחוּץ!",
            },
        ]
    )
    res = perform_search(s, {"q": "東京"})
    assert [h["id"] for h in res["hits"]] == [1]


def test_hebrew_final_forms_fold():
    """charabia's hebrew normalizer folds the five final letter forms;
    a query using the base form must match a document whose word ends
    in the final form (and niqqud must not block matching)."""
    s = IndexStore("heb", primary_key="id")
    s.add_documents(
        [
            {"id": 0, "title": "שֻׁלְחָן גדול"},  # shulchan with niqqud, final nun
            {"id": 1, "title": "ספר ירוק"},
        ]
    )
    # base-form nun (נ) in the query, final-form (ן) in the document
    res = perform_search(s, {"q": "שולחנ"})
    assert [h["id"] for h in res["hits"]] == [0]
    # and the doc's own spelling still matches
    res = perform_search(s, {"q": "שולחן"})
    assert [h["id"] for h in res["hits"]] == [0]
