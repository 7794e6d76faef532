"""Differential: the batched facet extractor (store._index_facets_batch)
must produce byte-identical facet structures to the per-document path
(store._index_facets). The per-document path is forced by configuring a
custom separator (which disables the batch pipeline)."""

from meilisearch_tpu.index.store import IndexStore

DOCS = [
    {"id": 0, "t": "hello world", "n": 5, "s": "Apple Pie", "b": True,
     "x": None, "e": "", "f": 1.5},
    {"id": 1, "t": "other", "n": 5, "s": "apple  pie", "b": False,
     "x": "val", "e": "y", "f": float("nan")},
    {"id": 2, "t": "nested", "obj": {"a": 1, "b": "zz"},
     "lst": [1, 2, "three"], "n": -3},
    {"id": 3, "t": "empty", "obj": {}, "lst": [], "n": 2**31},
    {"id": 4, "t": "dup", "s": "Apple Pie", "n": 5},
    {"id": 5, "t": "unicode", "s": "Crème BRÛLÉE  ", "n": 0.5},
]

FILTERABLE = ["n", "s", "b", "x", "e", "f", "obj", "obj.a", "obj.b", "lst"]


def build(force_per_doc: bool) -> IndexStore:
    st = IndexStore("t")
    st.settings.filterable_attributes = list(FILTERABLE)
    if force_per_doc:
        st.settings.separator_tokens = ["|"]
    st.add_documents(DOCS)
    return st


def canon(table):
    out = {}
    for k, v in table.items():
        if isinstance(v, dict):
            out[k] = {kk: sorted(vv) for kk, vv in v.items()}
        else:
            out[k] = sorted(v)
    return out


def test_batched_facets_match_per_document_path():
    a, b = build(False), build(True)
    for name in (
        "facet_exists_docids",
        "facet_is_null_docids",
        "facet_is_empty_docids",
        "facet_number_docids",
        "facet_string_docids",
    ):
        assert canon(getattr(a, name)) == canon(getattr(b, name)), name
    assert dict(a.docid_facet_numbers) == dict(b.docid_facet_numbers)
    assert dict(a.docid_facet_strings) == dict(b.docid_facet_strings)
    assert a.facet_string_original == b.facet_string_original
    assert a.fields_ids_map.names() == b.fields_ids_map.names()
