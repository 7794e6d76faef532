from meilisearch_tpu.index.store import IndexStore, bucketed_position, index_proximity


def make_store(docs, **settings):
    store = IndexStore("test")
    if settings:
        store.settings.apply_json(settings)
    store.add_documents(docs)
    return store


def test_bucketed_position():
    assert bucketed_position(0) == 0
    assert bucketed_position(15) == 15
    assert bucketed_position(16) == 24
    assert bucketed_position(23) == 24
    assert bucketed_position(24) == 32
    assert bucketed_position(25) == 32
    assert bucketed_position(32) == 32
    assert bucketed_position(33) == 64


def test_index_proximity():
    assert index_proximity(0, 1) == 1
    assert index_proximity(0, 3) == 3
    assert index_proximity(0, 9) == 4
    assert index_proximity(3, 1) == 3  # backward: dist+1
    assert index_proximity(2, 2) == 0


def test_word_docids():
    store = make_store(
        [
            {"id": 0, "text": "the quick brown fox"},
            {"id": 1, "text": "the lazy dog"},
        ]
    )
    assert store.get_word_docids("the") == {0, 1}
    assert store.get_word_docids("quick") == {0}
    assert store.get_word_docids("missing") == set()


def test_pair_proximity():
    store = make_store([{"id": 0, "text": "a b c"}])
    assert store.word_pair_proximity_docids[(1, "a", "b")] == {0}
    assert store.word_pair_proximity_docids[(2, "a", "c")] == {0}
    assert store.word_pair_proximity_docids[(1, "b", "c")] == {0}


def test_delete_document():
    store = make_store(
        [
            {"id": 0, "text": "hello world"},
            {"id": 1, "text": "hello there"},
        ]
    )
    store.delete_documents(["0"])
    assert store.get_word_docids("hello") == {1}
    assert store.get_word_docids("world") == set()
    assert len(store.documents) == 1


def test_update_merges_fields():
    store = make_store([{"id": 0, "title": "alpha", "body": "beta"}])
    store.add_documents([{"id": 0, "title": "gamma"}], method="update")
    doc = store.documents[store.external_to_internal["0"]]
    assert doc["title"] == "gamma"
    assert doc["body"] == "beta"
    assert store.get_word_docids("alpha") == set()
    assert store.get_word_docids("gamma") == {0}
    assert store.get_word_docids("beta") == {0}


def test_facets():
    store = make_store(
        [
            {"id": 0, "genre": "Action", "rating": 4.5},
            {"id": 1, "genre": ["Action", "Drama"], "rating": 3},
            {"id": 2, "genre": None},
        ],
        filterableAttributes=["genre", "rating"],
    )
    fid = store.fields_ids_map.id("genre")
    assert store.facet_string_docids[fid]["action"] == {0, 1}
    assert store.facet_string_docids[fid]["drama"] == {1}
    assert store.facet_is_null_docids[fid] == {2}
    rfid = store.fields_ids_map.id("rating")
    assert store.facet_number_docids[rfid][4.5] == {0}
    assert store.facet_number_docids[rfid][3.0] == {1}


def test_nested_facets():
    store = make_store(
        [{"id": 0, "meta": {"tags": ["x", "y"], "count": 2}}],
        filterableAttributes=["meta.tags", "meta.count"],
    )
    fid = store.fields_ids_map.id("meta.tags")
    assert store.facet_string_docids[fid]["x"] == {0}
    cfid = store.fields_ids_map.id("meta.count")
    assert store.facet_number_docids[cfid][2.0] == {0}


def test_word_count():
    store = make_store([{"id": 0, "text": "one two three"}])
    fid = store.fields_ids_map.id("text")
    assert store.field_id_word_count_docids[(fid, 3)] == {0}


def test_primary_key_guess():
    store = IndexStore("t")
    store.add_documents([{"movie_id": 7, "title": "x"}])
    assert store.primary_key == "movie_id"
