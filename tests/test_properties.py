"""Property-based tests (hypothesis) for the scalar kernels whose invariants
the unit vectors can't sweep: dedup similarity measures, winnowing
fingerprints, navigation clamping, sentence splitting.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from mobile_ocr_api_ray.functions.navigation import clamp_index, navigate
from mobile_ocr_api_ray.functions.textproc import split_into_sentences
from mobile_ocr_api_ray.stages import dedup, text_analysis

words = st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                 min_size=0, max_size=40)
texts = words.map(" ".join)


class TestJaccardProperties:
    @given(texts, texts)
    @settings(max_examples=60, deadline=None)
    def test_symmetric_and_bounded(self, a, b):
        j = dedup.ngram_jaccard_exact(a, b)
        assert 0.0 <= j <= 1.0
        assert j == dedup.ngram_jaccard_exact(b, a)

    @given(texts)
    @settings(max_examples=60, deadline=None)
    def test_self_similarity(self, a):
        assert dedup.ngram_jaccard_exact(a, a) == 1.0
        sig = dedup.minhash_signature(dedup.shingle_hashes(a))
        assert dedup.estimated_jaccard(sig, sig) == 1.0

    @given(texts)
    @settings(max_examples=30, deadline=None)
    def test_hashed_matches_exact_modulo_collisions(self, a):
        # hashed and string gram sets have the same cardinality unless crc32
        # collides — astronomically unlikely at these sizes
        hashed = set(dedup.shingle_hashes(a).tolist())
        strings = dedup.ngram_set(a)
        assert len(hashed) == len(strings)


class TestSimhashProperties:
    @given(texts)
    @settings(max_examples=40, deadline=None)
    def test_permutation_invariant(self, a):
        # simhash is a bag-of-words statistic: word order must not matter
        toks = a.split()
        assert dedup.simhash64(" ".join(toks)) == dedup.simhash64(
            " ".join(reversed(toks)))


class TestWinnowingProperties:
    @given(texts, st.text(alphabet="xyz ", min_size=0, max_size=12))
    @settings(max_examples=40, deadline=None)
    def test_deterministic_and_bounded(self, a, prefix):
        fps = text_analysis.winnow_fingerprints(a)
        assert fps == text_analysis.winnow_fingerprints(a)
        # winnowing emits at most one fingerprint per k-gram position
        assert len(fps) <= max(1, len(a))


class TestNavigationProperties:
    @given(st.integers(-100, 100), st.integers(0, 50))
    def test_clamp_in_range(self, idx, total):
        c = clamp_index(idx, total)
        assert 0 <= c <= max(0, total - 1)

    @given(st.integers(0, 20), st.integers(0, 19),
           st.sampled_from(["next", "previous"]))
    def test_navigate_stays_in_range(self, total, cur, action):
        cur = min(cur, max(0, total - 1))
        out = navigate(total, cur, action)
        assert 0 <= out <= max(0, total - 1)


class TestSentenceSplitProperties:
    @given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=10)
                    .map(lambda s: s.strip() or "a"),
                    min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_reference_regex_equivalence(self, parts):
        # the splitter must agree with the raw reference expression
        # re.split(r'(?<=[.!?])\s+', text) + strip + drop-empties (app.py:441-445)
        text = ". ".join(parts) + "."
        expect = [s.strip() for s in re.split(r"(?<=[.!?])\s+", text) if s.strip()]
        assert split_into_sentences(text) == expect
