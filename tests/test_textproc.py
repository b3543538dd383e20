"""Unit vectors for the byte-exact scalar operators (FIXTURES.md §4).

Each vector transcribes the reference's observable semantics
(citations in mobile_ocr_api_ray/functions/textproc.py).
"""

import math

from mobile_ocr_api_ray.functions import (
    STOP_WORDS,
    compression_ratio,
    join_pages,
    score_sentences,
    split_into_sentences,
    summarize,
    tokenize,
)
from mobile_ocr_api_ray.functions.navigation import clamp_index, navigate, suggested_actions
from mobile_ocr_api_ray.functions.routing import route_quality


class TestSentenceSplit:  # F1, app.py:441-445
    def test_basic(self):
        assert split_into_sentences("A. B! C? D") == ["A.", "B!", "C?", "D"]

    def test_no_abbreviation_handling(self):
        # the reference regex has no abbreviation logic — "Dr. who" splits
        assert split_into_sentences("Dr. who") == ["Dr.", "who"]

    def test_strip_and_drop_empty(self):
        assert split_into_sentences("  One.   Two!  ") == ["One.", "Two!"]
        assert split_into_sentences("") == []
        assert split_into_sentences("   ") == []

    def test_no_split_without_space(self):
        # lookbehind requires whitespace AFTER the terminator
        assert split_into_sentences("a.b.c") == ["a.b.c"]

    def test_newline_separator(self):
        assert split_into_sentences("One.\nTwo.") == ["One.", "Two."]


class TestTokenizer:  # F2, app.py:453
    def test_case_folding(self):
        assert tokenize("Hello WORLD") == ["hello", "world"]

    def test_punctuation_and_digits(self):
        assert tokenize("it's a 2-part word_x!") == ["it", "s", "a", "2", "part", "word_x"]


class TestScorer:  # F3, app.py:447-480
    def test_stopwords_excluded_from_freq(self):
        # "the" is a stopword: contributes nothing to freq, but its token
        # still counts in the per-sentence length divisor
        scores = score_sentences(["the data", "data data"])
        # freq: data=3 -> norm 1.0. s0: ("the" not in freq) + 1.0, len 2 -> 0.5
        # s1: 2.0 / 2 -> 1.0. n=2: i=0 < 0.4 -> x1.25; i=1 not > 1.6 -> no bonus
        assert math.isclose(scores[0], 0.5 * 1.25)
        assert math.isclose(scores[1], 1.0)

    def test_position_bonus_boundaries(self):
        # n=10: bonus iff i < 2.0 (i=0,1) or i > 8.0 (i=9) — strict
        sents = ["data data."] * 10
        scores = score_sentences(sents)
        base = scores[2]
        for i in (0, 1, 9):
            assert math.isclose(scores[i], base * 1.25)
        for i in range(2, 9):
            assert math.isclose(scores[i], base)

    def test_empty(self):
        assert score_sentences([]) == []
        assert score_sentences(["..."]) == [0 * 1.25]

    def test_stopword_set_verbatim(self):
        # spot-check the verbatim app2.py:627-645 set incl. Indonesian tail
        for w in ("yourselves", "yang", "adalah", "let's", "he'd"):
            assert w in STOP_WORDS
        assert len(STOP_WORDS) == 170  # 170 unique literals in app2.py:627-645


class TestSummarize:  # F4/T1, app2.py:647-676
    def test_short_text_gate(self):
        t = "Short text."
        assert summarize(t) == t  # < 100 chars -> unchanged

    def test_few_sentences_gate(self):
        t = ("word " * 30).strip() + "."  # >100 chars, 1 sentence
        assert summarize(t) == t

    def test_ratio_and_k(self):
        sents = [f"unique{i} data system model value number{i}." for i in range(10)]
        t = " ".join(sents)
        out = summarize(t, ratio=0.3)
        # k = max(1, int(10*0.3)) = 3 sentences, re-sorted by position
        assert len(split_into_sentences(out)) == 3
        picked = split_into_sentences(out)
        positions = [sents.index(s) for s in picked]
        assert positions == sorted(positions)

    def test_max_sentences(self):
        sents = [f"unique{i} data system model value number{i}." for i in range(10)]
        out = summarize(" ".join(sents), ratio=0.9, max_sentences=2)
        assert len(split_into_sentences(out)) == 2

    def test_stable_tie_break(self):
        # identical sentences → identical scores → Python sorted stability
        # keeps the earliest ones (position bonus makes 0,1,9 win; re-sort
        # by position yields 0,1,9 order)
        sents = ["data system model value alpha beta."] * 10
        out = summarize(" ".join(sents), ratio=0.3)
        assert out == " ".join([sents[0], sents[1], sents[9]])

    def test_join_is_single_space(self):
        sents = [f"unique{i} data system model value number{i}." for i in range(8)]
        out = summarize(" ".join(sents), ratio=0.5)
        assert "\n" not in out


class TestMisc:
    def test_compression_ratio(self):  # F5, app.py:2033
        assert compression_ratio("ab", "abcd") == 0.5
        assert compression_ratio("", "") == 0.0

    def test_join_pages(self):  # F6, app.py:791
        assert join_pages(["a", "b"]) == "a\n\nb"

    def test_clamp(self):  # F7, app.py:1500-1505
        assert clamp_index(-1, 5) == 0
        assert clamp_index(7, 5) == 4
        assert clamp_index(2, 5) == 2
        assert clamp_index(3, 0) == 0

    def test_navigate(self):
        assert navigate(5, 4, "next") == 4
        assert navigate(5, 0, "previous") == 0
        assert navigate(5, 0, "goto", 99) == 4

    def test_suggested_actions(self):  # F8, app.py:980-1007
        a = suggested_actions(2, 2, 6)
        assert [x["type"] for x in a] == ["read_by_paragraph", "read_by_column",
                                         "summarize", "read_full"]
        assert [x["type"] for x in suggested_actions(1, 1, 2)] == ["read_full"]

    def test_route_quality(self):  # M9, app2.py:551-558,215-223
        assert route_quality("low") == ("fast", "fast", 800, 75)
        assert route_quality("medium") == ("balanced", "standard", 1200, 85)
        assert route_quality("high") == ("quality", "accurate", 2000, 90)
        assert route_quality("bogus") == route_quality("medium")  # app2.py:844-845


class TestHealthAndLanguages:
    def test_health_snapshot(self):
        import mobile_ocr_api_ray as m
        h = m.health()
        assert h["status"] == "ok"
        assert h["pyarrow"] and h["numpy"] and h["ray"]
        assert "html/default" in h["kernels"]
        assert "image/default" in h["kernels"]
        assert "pdf/default" in h["kernels"]

    def test_supported_languages(self):
        from mobile_ocr_api_ray.functions.routing import supported_languages
        langs = supported_languages()
        assert "eng" in langs and "ind" in langs and "eng+ind" in langs
        assert langs == sorted(langs)
