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


class TestAnalyticsProperties:
    """Pure-function invariants of the new analytics kernels: the discrete
    quantile index rule vs DuckDB, and the as-of forward-fill vs a per-row
    brute force."""

    @given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False), min_size=1, max_size=200),
           st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]))
    @settings(max_examples=60, deadline=None)
    def test_discrete_quantile_rule_matches_duckdb(self, vals, q):
        import duckdb
        import numpy as np
        want = duckdb.connect().execute(
            "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?::DOUBLE[]) x)",
            [q, vals]).fetchone()[0]
        n = len(vals)
        idx = max(int(np.ceil(q * n)) - 1, 0)
        assert float(np.sort(np.asarray(vals))[idx]) == float(want)

    @given(st.lists(st.tuples(st.integers(0, 3),          # user
                              st.integers(0, 50),         # ts (coarse, ties!)
                              st.booleans()),              # is_view
                    min_size=0, max_size=60))
    @settings(max_examples=60, deadline=None)
    def test_asof_ffill_matches_bruteforce(self, rows):
        import numpy as np
        import pandas as pd
        df = pd.DataFrame({
            "event_id": np.arange(len(rows), dtype=np.int64),
            "user_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "event_type": ["view" if r[2] else "click" for r in rows]})
        # vectorized path (mirrors analytics.clicks_last_view group fn)
        d = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        is_view = d["event_type"].to_numpy() == "view"
        d["vid"] = d["event_id"].astype("float64").where(is_view)
        got = d.assign(lv=d.groupby("user_id")["vid"].ffill())
        got = got[got["event_type"] == "click"].set_index("event_id")["lv"]
        # brute force: latest view per click in the (ts, event_id) order
        for _, click in df[df["event_type"] == "click"].iterrows():
            cand = df[(df["event_type"] == "view")
                      & (df["user_id"] == click["user_id"])
                      & ((df["ts"] < click["ts"])
                         | ((df["ts"] == click["ts"])
                            & (df["event_id"] < click["event_id"])))]
            want = (cand.sort_values(["ts", "event_id"])["event_id"].iloc[-1]
                    if len(cand) else None)
            g = got.loc[click["event_id"]]
            assert (want is None and pd.isna(g)) or g == want


# ---- distributed-operator properties (small Ray pipelines per example) ----

import numpy as np
import pyarrow as pa


def _doc_ds(pairs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in pairs], pa.int64()),
        "text": pa.array([t for _, t in pairs], pa.string())}))


# lines straddle the 30-char eligibility threshold; a small pool forces
# cross-document collisions
_line_pool = st.lists(
    st.text(alphabet="ab", min_size=26, max_size=34),
    min_size=1, max_size=6, unique=True)


class TestLineDedupProperties:
    @given(st.data())
    @settings(max_examples=10, deadline=None)
    def test_matches_sequential_reference(self, ray_session, data):
        pool = data.draw(_line_pool)
        n_docs = data.draw(st.integers(1, 5))
        docs = []
        for i in range(n_docs):
            lines = data.draw(st.lists(st.sampled_from(pool),
                                       min_size=0, max_size=5))
            docs.append((i, "\n".join(lines)))
        seen, expect = set(), {}
        for i, t in docs:
            kept, removed = [], 0
            for ln in t.split("\n"):
                if len(ln) >= 30:
                    if ln in seen:
                        removed += 1
                        continue
                    seen.add(ln)
                kept.append(ln)
            expect[i] = ("\n".join(kept), removed)
        out = dedup.line_dedup(_doc_ds(docs), n_coarse=3,
                               n_coarse_docs=2)
        df = (out.to_pandas() if hasattr(out, "to_pandas") else
              out.to_pandas()).sort_values("doc_id")
        assert len(df) == len(docs)
        for _, r in df.iterrows():
            ct, nr = expect[int(r.doc_id)]
            assert r.clean_text == ct and int(r.n_removed) == nr


class TestPackSequencesProperties:
    @given(st.lists(st.integers(0, 9), min_size=1, max_size=30),
           st.integers(1, 16))
    @settings(max_examples=10, deadline=None)
    def test_matches_cumsum_reference(self, ray_session, counts, budget):
        docs = [(i, " ".join(["w"] * c)) for i, c in enumerate(counts)]
        out = text_analysis.pack_sequences(_doc_ds(docs), budget=budget,
                                           range_width=4)
        df = (out.to_pandas() if hasattr(out, "to_pandas") else
              out.to_pandas()).sort_values("doc_id")
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        assert df.n_tokens.tolist() == counts
        assert df.start_offset.tolist() == starts.tolist()
        assert df.seq_id.tolist() == (starts // budget).tolist()
        assert df.offset_in_seq.tolist() == (starts % budget).tolist()


class TestCanonicalUrlProperties:
    url_chars = st.text(
        alphabet="abcXYZ019-._~:/?#[]@!$&'()*+,;=% ", max_size=60)

    @given(url_chars)
    @settings(max_examples=200, deadline=None)
    def test_idempotent_and_total(self, s):
        from mobile_ocr_api_ray.stages.crawl import canonical_url_one as c
        once = c(s)
        assert c(once) == once          # canonicalization is idempotent
        assert isinstance(once, str)    # total: never raises

    @given(st.text(alphabet="abcxyz019-.", min_size=1, max_size=20),
           st.text(alphabet="abcxyz019/-._", max_size=30))
    @settings(max_examples=100, deadline=None)
    def test_no_utm_survives(self, host, path):
        from mobile_ocr_api_ray.stages.crawl import canonical_url_one as c
        u = f"https://{host}/{path}?utm_source=x&keep=1&utm_medium=y"
        out = c(u)
        assert "utm_" not in out and "keep=1" in out


class TestWindowHashProperties:
    @given(st.lists(st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        min_size=0, max_size=30), min_size=1, max_size=8),
        st.integers(min_value=2, max_value=5))
    @settings(max_examples=60, deadline=None)
    def test_hash_equality_iff_window_equality(self, docs_tokens, k):
        """The 128-bit rolling hash must agree exactly with literal
        window-string equality on small corpora (collision-free here)."""
        from mobile_ocr_api_ray.stages.dedup import _window_hashes
        wdoc, woff, h1, h2 = _window_hashes(docs_tokens, k)
        seen: dict[tuple, str] = {}
        for d, o, a, b in zip(wdoc, woff, h1, h2):
            win = " ".join(docs_tokens[d][o:o + k])
            key = (int(a), int(b))
            if key in seen:
                assert seen[key] == win
            seen[key] = win
        # and distinct windows get distinct hashes
        wins = {}
        for d, o, a, b in zip(wdoc, woff, h1, h2):
            win = " ".join(docs_tokens[d][o:o + k])
            wins.setdefault(win, set()).add((int(a), int(b)))
        for hs in wins.values():
            assert len(hs) == 1


class TestHtmlKernelTotality:
    raw = st.binary(max_size=400)

    @given(raw)
    @settings(max_examples=150, deadline=None)
    def test_page_metadata_total(self, payload):
        from mobile_ocr_api_ray.stages.html_extract import page_metadata
        t, d = page_metadata(payload)
        assert isinstance(t, str) and isinstance(d, str)

    @given(raw)
    @settings(max_examples=150, deadline=None)
    def test_page_out_links_total(self, payload):
        from mobile_ocr_api_ray.stages.linkgraph import page_out_links
        out = page_out_links("https://h.example/p", payload)
        for u, txt in out:
            assert u.startswith(("http://", "https://"))
            assert "#" not in u

    def test_malformed_ipv6_href_skipped(self):
        from mobile_ocr_api_ray.stages.linkgraph import page_out_links
        html = b'<a href="http://[x">bad</a><a href="/ok">ok</a>'
        out = page_out_links("https://h.example/p", html)
        assert out == [("https://h.example/ok", "ok")]

    def test_uppercase_scheme_normalized(self):
        from mobile_ocr_api_ray.stages.linkgraph import page_out_links
        out = page_out_links("https://h.example/p",
                             b'<a href="HTTP://EX.COM/x">a</a>')
        assert out == [("http://EX.COM/x", "a")]


def _cdc_reference(ws, window, divisor):
    """Per-doc python reference of the CDC cut rule (mirrors the fixed
    vector in test_operators; shared ground truth for the property
    sweep)."""
    import hashlib
    chunks, cur = [], []
    for i, w in enumerate(ws):
        cur.append(w)
        cut = i == len(ws) - 1
        if not cut and i >= window - 1:
            win = " ".join(ws[i - window + 1:i + 1])
            h = int(hashlib.md5(win.encode()).hexdigest()[:8], 16)
            cut = h % divisor == 0
        if cut:
            chunks.append(" ".join(cur))
            cur = []
    return chunks


class TestCdcProperties:
    @given(st.lists(st.lists(st.text(alphabet="ab", min_size=1,
                                     max_size=2),
                             min_size=0, max_size=30),
                    min_size=1, max_size=6))
    @settings(max_examples=40, deadline=None)
    def test_chunks_match_reference_and_cover(self, docs):
        """Chunk rows equal the per-doc reference; chunks partition the
        word sequence (concatenation restores it) for every doc in the
        batch — including empties. Tiny alphabet forces window-hash
        collisions and cross-doc dup chunks."""
        import hashlib

        import pyarrow as pa
        t = pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(d) for d in docs], pa.string())})
        out = dedup.cdc_chunk_rows(t).to_pydict()
        for di, ws in enumerate(docs):
            ref = _cdc_reference(ws, dedup.CDC_WINDOW, dedup.CDC_DIVISOR)
            got = [(c, h, n) for d, c, h, n in zip(
                out["doc_id"], out["chunk_idx"], out["chunk_hash"],
                out["n_chunk_words"]) if d == di]
            assert [c for c, _, _ in got] == list(range(len(ref)))
            assert [h for _, h, _ in got] == [
                hashlib.md5(c.encode()).hexdigest() for c in ref]
            assert sum(n for _, _, n in got) == len(ws)


class TestParagraphDedupProperties:
    @given(st.lists(st.lists(st.text(alphabet="abc", min_size=1,
                                     max_size=2),
                             min_size=0, max_size=40),
                    min_size=1, max_size=6),
           st.integers(min_value=0, max_value=10**6))
    @settings(max_examples=40, deadline=None)
    def test_matches_python_reference(self, docs, base_id):
        """dedup_text / counts equal a per-doc python restatement of the
        6-word construction + doc_id%3 graft + keep-first rule."""
        import pyarrow as pa
        ids = [base_id + i for i in range(len(docs))]
        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([" ".join(d) for d in docs], pa.string())})
        out = text_analysis.paragraph_dedup(t).to_pydict()
        for row, (i, ws) in enumerate(zip(ids, docs)):
            paras = [" ".join(ws[j:j + 6]) for j in range(0, len(ws), 6)]
            if paras and i % 3 == 0:
                paras.append(paras[0])
            elif paras and i % 3 == 1:
                paras.append(paras[-1])
            seen, kept = set(), []
            for p in paras:
                if p not in seen:
                    seen.add(p)
                    kept.append(p)
            assert out["n_paragraphs"][row] == len(paras)
            assert out["n_dup_paragraphs"][row] == len(paras) - len(kept)
            assert out["dedup_text"][row] == "\n\n".join(kept)
            # dup chars = all occurrences minus the first of each
            tot = sum(len(p) for p in paras)
            exp_dup = tot - sum(len(p) for p in kept)
            assert out["dup_para_char_frac"][row] == \
                (exp_dup / max(tot, 1))


class TestUrlFeatureTotality:
    @given(st.lists(st.text(max_size=40), min_size=0, max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_total_and_bounded(self, urls):
        """Any unicode url column (incl. empty/None-free arbitrary text)
        produces a full feature row: no raise, counts ≥ 0, digit ratio
        in [0, 1e6], host lowercase."""
        import pyarrow as pa

        from mobile_ocr_api_ray.stages.crawl import url_feature_batch
        t = url_feature_batch(pa.table({"url": pa.array(urls, pa.string())}))
        assert t.num_rows == len(urls)
        df = t.to_pandas()
        for col in ("url_len", "n_slashes", "n_digits", "n_params"):
            assert (df[col] >= 0).all()
        assert df.digit_ratio_micro.between(0, 1_000_000).all()
        assert (df.host == df.host.str.lower()).all()


class TestCmsEstimateProperty:
    @given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=3),
                    min_size=0, max_size=120))
    @settings(max_examples=40, deadline=None)
    def test_one_sided_overestimate(self, ws):
        """The CMS arithmetic (md5-prefix bucket, min over depths) never
        underestimates a word's count, for any word multiset."""
        from collections import Counter

        from mobile_ocr_api_ray.hashing import hash32
        from mobile_ocr_api_ray.stages.text_analysis import (CMS_DEPTH,
                                                             CMS_WIDTH)
        true = Counter(ws)
        cells: dict[tuple[int, int], int] = {}
        for w, c in true.items():
            for d in range(CMS_DEPTH):
                key = (d, hash32(f"{d}:{w}") % CMS_WIDTH)
                cells[key] = cells.get(key, 0) + c
        for w, c in true.items():
            est = min(cells.get((d, hash32(f"{d}:{w}") % CMS_WIDTH), 0)
                      for d in range(CMS_DEPTH))
            assert est >= c


class TestLengthFitOptimality:
    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 500)),
                    min_size=2, max_size=30))
    @settings(max_examples=40, deadline=None)
    def test_cramer_minimizes_sse(self, pts):
        """The exact Cramer solution is the SSE minimizer: perturbing
        slope or intercept by ±1/7 never reduces the (Fraction-exact)
        sum of squared residuals."""
        from fractions import Fraction

        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = n * sxx - sx * sx
        if den == 0:
            return
        m = Fraction(n * sxy - sx * sy, den)
        b = Fraction(sy * sxx - sx * sxy, den)

        def sse(mm, bb):
            return sum((Fraction(y) - mm * x - bb) ** 2
                       for x, y in zip(xs, ys))
        best = sse(m, b)
        eps = Fraction(1, 7)
        for dm in (-eps, 0, eps):
            for db in (-eps, 0, eps):
                assert sse(m + dm, b + db) >= best
