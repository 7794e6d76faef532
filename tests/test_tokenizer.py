from meilisearch_tpu.analysis.tokenizer import Tokenizer, normalize_word


def test_basic_words():
    t = Tokenizer()
    words = t.indexed_words("the quick brown fox")
    assert words == [("the", 0), ("quick", 1), ("brown", 2), ("fox", 3)]


def test_hard_separator_gap():
    t = Tokenizer()
    words = t.indexed_words("the quick. brown fox")
    # '.' is hard: the next word advances by MAX_DISTANCE=4 instead of 1
    # (reference tokenize_document.rs process_tokens + proximity.rs:7)
    assert words == [("the", 0), ("quick", 1), ("brown", 5), ("fox", 6)]


def test_comma_is_hard():
    t = Tokenizer()
    words = t.indexed_words("the, quick")
    assert words == [("the", 0), ("quick", 4)]


def test_normalization():
    assert normalize_word("Ŵôřlḑôle") == "worldole"
    assert normalize_word("Westfália") == "westfalia"
    assert normalize_word("CAFÉ") == "cafe"


def test_stop_words_not_indexed_but_occupy_position():
    t = Tokenizer(stop_words={"the"})
    words = t.indexed_words("the quick")
    assert words == [("quick", 1)]


def test_cjk_han_segmentation():
    t = Tokenizer()
    words = t.indexed_words("東京kyoto")
    # the Han run is dictionary-segmented (東京 is one word in the jieba
    # dict) and folded traditional->simplified (charabia's zh normalizer;
    # queries fold identically so 東京 finds 东京); the Latin run stays
    # separate
    assert ("东京", 0) in words
    assert ("kyoto", 1) in words
    # the traditional-script query normalizes to the same lemma
    assert [w for w, _ in t.indexed_words("東京")] == ["东京"]


def test_custom_separators():
    t = Tokenizer(separators=[" ", "#"])
    words = t.indexed_words("a#b.c d")
    assert [w for w, _ in words] == ["a", "b.c", "d"]
