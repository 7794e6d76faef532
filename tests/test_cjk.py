"""CJK/locale tokenization goldens (charabia parity direction: zh = jieba
dictionary segmentation, ja kana = bigrams, ko = whitespace-delimited runs,
th = grapheme clusters; reference milli/Cargo.toml:135-165 language features).

End-to-end: the same pipeline runs at index and query time, so multi-char
CJK words must be findable by exact and partial queries."""

from meilisearch_tpu.analysis.tokenizer import Tokenizer, normalize_word
from meilisearch_tpu.index.store import IndexStore
from meilisearch_tpu.search.perform import perform_search


def words(text):
    return [t.lemma for t in Tokenizer().tokenize(text) if t.is_word()]


def test_chinese_dictionary_segmentation():
    # jieba groups real words instead of per-char unigrams
    assert words("我们喜欢北京烤鸭") == ["我们", "喜欢", "北京烤鸭"]
    assert words("今天天气很好") == ["今天天气", "很", "好"]


def test_japanese_kana_bigrams():
    assert words("すしをたべます") == ["すし", "しを", "をた", "たべ", "べま", "ます"]
    # a single kana stays a unigram
    assert words("ね") == ["ね"]


def test_japanese_mixed_script():
    out = words("日本語を勉強します")
    assert "勉強" in out  # kanji run dictionary-segmented
    assert "しま" in out and "ます" in out  # kana bigrams


def test_korean_whole_runs():
    assert words("안녕하세요 세계") == ["안녕하세요", "세계"]


def test_thai_grapheme_clusters():
    out = words("สวัสดี")
    # combining vowels/tone marks stay attached to their base consonant
    assert out == ["ส", "วั", "ส", "ดี"]
    assert all(len(w) >= 1 for w in out)


def test_kana_normalization_keeps_voicing():
    # NFKD mark-stripping would conflate が with か
    assert normalize_word("が") != normalize_word("か")
    assert normalize_word("ガギグ") == "ガギグ"


def test_latin_normalization_unchanged():
    assert normalize_word("Élève") == "eleve"
    assert normalize_word("Crème Brûlée".split()[1]) == "brulee"


def _store(docs):
    store = IndexStore("t", primary_key="id")
    store.settings.apply_json({"searchableAttributes": ["text"]})
    store.add_documents(docs)
    return store


def test_chinese_search_end_to_end():
    store = _store(
        [
            {"id": 1, "text": "我们喜欢北京烤鸭"},
            {"id": 2, "text": "他们在上海工作"},
            {"id": 3, "text": "the quick brown fox"},
        ]
    )
    res = perform_search(store, {"q": "北京烤鸭"})
    assert [h["id"] for h in res["hits"]] == [1]
    res = perform_search(store, {"q": "上海"})
    assert [h["id"] for h in res["hits"]] == [2]
    # latin corpus unaffected
    res = perform_search(store, {"q": "quick fox"})
    assert [h["id"] for h in res["hits"]] == [3]


def test_japanese_search_end_to_end():
    store = _store(
        [
            {"id": 1, "text": "すしをたべます"},
            {"id": 2, "text": "みずをのみます"},
        ]
    )
    res = perform_search(store, {"q": "すし"})
    assert [h["id"] for h in res["hits"]] == [1]
    res = perform_search(store, {"q": "のみます"})
    assert res["hits"][0]["id"] == 2


def test_korean_search_end_to_end():
    store = _store(
        [
            {"id": 1, "text": "안녕하세요 세계"},
            {"id": 2, "text": "좋은 아침입니다"},
        ]
    )
    res = perform_search(store, {"q": "세계"})
    assert [h["id"] for h in res["hits"]] == [1]


def test_greek_final_sigma_folds_without_locale():
    # charabia's greek normalizer runs on script detection: ς == σ even
    # with no declared locale (the ell branch only covered explicit
    # localizedAttributes)
    assert normalize_word("ελπίς") == normalize_word("ελπίσ")
    assert normalize_word("ΟΔΥΣΣΕΥΣ") == "οδυσσευσ"  # final Σ via lower()


def test_greek_search_end_to_end():
    store = _store([{"id": 0, "text": "ο λόγος της ελπίδας"}])
    # query spelled with a final sigma matches the indexed final-σ word
    res = perform_search(store, {"q": "λόγοσ"})
    assert [h["id"] for h in res["hits"]] == [0]
    res = perform_search(store, {"q": "λογος"})
    assert [h["id"] for h in res["hits"]] == [0]


def test_khmer_syllable_segmentation():
    # ORTHOGRAPHIC syllables: base consonant + coeng stacks + dependent
    # vowels/signs stay one unit; no inter-word spaces needed
    out = words("ខ្មែរ")  # kh + coeng m + vowel = one syllable
    assert out == ["ខ្មែរ"] or out == ["ខ្មែ", "រ"]
    out2 = words("សួស្តី")  # "hello": segments consistently, no empty units
    assert out2 and all(out2)
    # the same text segments identically every time (index == query)
    assert out2 == words("សួស្តី")


def test_khmer_search_end_to_end():
    store = _store([{"id": 0, "text": "ភាសាខ្មែរ"}, {"id": 1, "text": "hello"}])
    res = perform_search(store, {"q": "ខ្មែរ"})
    assert [h["id"] for h in res["hits"]] == [0]
