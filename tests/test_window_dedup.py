"""dup_window_stats — exact duplicated k-token-window statistics
(fixed-window form of Lee et al. ACL'22 suffix-array dup spans)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mobile_ocr_api_ray.stages import dedup


def brute_window_stats(docs: list[tuple[int, str]], k: int = 13,
                       min_docs: int = 2) -> pd.DataFrame:
    """Reference implementation: literal window strings, Python dicts."""
    wins: dict[str, set[int]] = {}
    per_doc: dict[int, list[str]] = {}
    for did, text in docs:
        toks = (text or "").split()
        ws = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        per_doc[did] = ws
        for w in ws:
            wins.setdefault(w, set()).add(did)
    rows = []
    for did, ws in sorted(per_doc.items()):
        if not ws:
            continue
        nd = sum(1 for w in ws if len(wins[w]) >= min_docs)
        rows.append({"doc_id": did, "n_windows": len(ws),
                     "n_dup_windows": nd, "dup_ratio": nd / len(ws)})
    return pd.DataFrame(rows)


def run(ray_session, docs, **kw) -> pd.DataFrame:
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    out = dedup.dup_window_stats(ds, **kw)
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out.sort("doc_id").to_pandas()


class TestDupWindowStats:
    SHARED = " ".join(f"w{i}" for i in range(13))   # exactly one window

    def test_hand_counts(self, ray_session):
        docs = [
            (0, self.SHARED + " tail0 alpha beta"),
            (1, "head1 " + self.SHARED),
            (2, "entirely distinct tokens " + " ".join(
                f"x{i}" for i in range(15))),
            (3, "too short"),            # < 13 tokens → no output row
            (4, None),                   # null text → no output row
        ]
        out = run(ray_session, docs)
        assert list(out.doc_id) == [0, 1, 2]
        # doc0: 16 tokens → 4 windows, the first (offset 0) is shared
        assert list(out.n_windows) == [4, 2, 6]
        assert list(out.n_dup_windows) == [1, 1, 0]
        assert out.dup_ratio[0] == 0.25

    def test_within_doc_repeat_not_dup(self, ray_session):
        # the same window twice in ONE doc is not a cross-doc duplicate
        docs = [(0, self.SHARED + " " + self.SHARED)]
        out = run(ray_session, docs)
        assert list(out.n_dup_windows) == [0]
        # but copies in ≥2 docs count EVERY occurrence, incl. repeats
        docs.append((1, self.SHARED))
        out = run(ray_session, docs)
        m = dict(zip(out.doc_id, out.n_dup_windows))
        assert m[0] >= 2 and m[1] == 1

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(7)
        vocab = [f"t{i}" for i in range(30)]
        docs = [(i, " ".join(rng.choice(vocab, rng.randint(5, 40))))
                for i in range(40)]
        a = run(ray_session, docs, n_coarse=1, n_coarse_docs=1)
        b = run(ray_session, docs, n_coarse=13, n_coarse_docs=5)
        pd.testing.assert_frame_equal(a, b)

    def test_differential_random(self, ray_session):
        rng = np.random.RandomState(11)
        vocab = [f"v{i}" for i in range(12)]   # tiny vocab → many dup windows
        docs = [(i, " ".join(rng.choice(vocab, rng.randint(0, 60))))
                for i in range(60)]
        got = run(ray_session, docs, k=5)
        want = brute_window_stats(docs, k=5)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True))

    def test_min_docs_threshold(self, ray_session):
        docs = [(i, self.SHARED) for i in range(3)]
        out3 = run(ray_session, docs, min_docs=3)
        out4 = run(ray_session, docs, min_docs=4)
        assert list(out3.n_dup_windows) == [1, 1, 1]
        assert list(out4.n_dup_windows) == [0, 0, 0]

    def test_empty_corpus(self, ray_session):
        out = run(ray_session, [])
        assert list(out.columns) == ["doc_id", "n_windows",
                                     "n_dup_windows", "dup_ratio"]
        assert len(out) == 0


def brute_window_dedup(docs, k=13):
    wins: dict[str, list[tuple[int, int]]] = {}
    toks_by: dict[int, list[str]] = {}
    for did, text in docs:
        toks = (text or "").split()
        toks_by[did] = toks
        for i in range(len(toks) - k + 1):
            wins.setdefault(" ".join(toks[i:i + k]), []).append((did, i))
    cover: dict[int, set] = {d: set() for d, _ in docs}
    for occs in wins.values():
        if len(occs) < 2:
            continue
        owner = min(occs)
        for d, i in occs:
            if (d, i) != owner:
                cover[d].update(range(i, i + k))
    rows = []
    for did, _ in sorted(docs):
        toks = toks_by[did]
        kept = [t for p, t in enumerate(toks) if p not in cover[did]]
        rows.append({"doc_id": did, "clean_text": " ".join(kept),
                     "n_removed_tokens": len(toks) - len(kept),
                     "n_tokens": len(toks)})
    return pd.DataFrame(rows)


def run_dedup(ray_session, docs, **kw) -> pd.DataFrame:
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))
    out = dedup.window_dedup(ds, **kw)
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out.sort("doc_id").to_pandas()


class TestWindowDedup:
    W = " ".join(f"w{i}" for i in range(13))

    def test_owner_keeps_copy_loses(self, ray_session):
        docs = [(0, self.W + " tail"), (1, "head " + self.W)]
        out = run_dedup(ray_session, docs)
        # doc0 owns (0,0): untouched; doc1's copy at offset 1 removed
        assert out.clean_text[0] == self.W + " tail"
        assert out.clean_text[1] == "head"
        assert list(out.n_removed_tokens) == [0, 13]

    def test_within_doc_repeat_removed(self, ray_session):
        docs = [(5, self.W + " " + self.W)]
        out = run_dedup(ray_session, docs)
        assert out.clean_text[0] == self.W
        assert out.n_removed_tokens[0] == 13

    def test_overlap_coverage_union(self, ray_session):
        # doc1 contains W shifted by one token twice via a 14-token span
        span = self.W + " w0b"
        docs = [(0, self.W), (1, span), (2, "x " + self.W)]
        out = run_dedup(ray_session, docs)
        want = brute_window_dedup(docs)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), want, check_dtype=False)

    def test_differential_random(self, ray_session):
        rng = np.random.RandomState(13)
        vocab = [f"v{i}" for i in range(9)]
        docs = [(i, " ".join(rng.choice(vocab, rng.randint(0, 40))))
                for i in range(50)]
        got = run_dedup(ray_session, docs, k=5)
        want = brute_window_dedup(docs, k=5)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(21)
        vocab = [f"u{i}" for i in range(12)]
        docs = [(i, " ".join(rng.choice(vocab, rng.randint(4, 30))))
                for i in range(30)]
        a = run_dedup(ray_session, docs, k=4, n_coarse=1, n_coarse_docs=1)
        b = run_dedup(ray_session, docs, k=4, n_coarse=11, n_coarse_docs=3)
        pd.testing.assert_frame_equal(a, b)

    def test_empty_and_null(self, ray_session):
        out = run_dedup(ray_session, [(0, None), (1, "")])
        assert list(out.clean_text) == ["", ""]
        assert list(out.n_tokens) == [0, 0]
        out2 = run_dedup(ray_session, [])
        assert len(out2) == 0

    def test_owner_key_overflow_rejected(self, ray_session):
        # packed owner key doc_id·1e8 + off only orders (doc_id, off)
        # within range; out-of-range doc_ids must fail loudly, not
        # silently misresolve owners (the SQL oracle mirrors the packing
        # so a value-exact check could never catch the corruption)
        big = (2**63 - 1) // dedup._OWNER_OFF_BASE  # first out-of-range id
        docs = [(big, self.W), (1, self.W)]
        with pytest.raises(Exception, match="owner-key overflow"):
            run_dedup(ray_session, docs)
        # in-range ids untouched by the guard
        ok = run_dedup(ray_session, [(big - 1, self.W), (1, self.W)])
        assert list(ok.n_removed_tokens) == [0, 13]


class TestCrossWindowOverlap:
    def _run(self, ray_session, docs, refs, **kw):
        import ray.data
        dds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string())}))
        rds = ray.data.from_arrow(pa.table({
            "text": pa.array(refs, pa.string())}))
        out = dedup.cross_window_overlap(dds, rds, **kw)
        if isinstance(out, pa.Table):
            return out.to_pandas()
        return out.sort("doc_id").to_pandas()

    W = " ".join(f"w{i}" for i in range(13))

    def test_hand_overlap(self, ray_session):
        docs = [(0, self.W + " tail x y"),          # first window overlaps
                (1, "totally different tokens " + " ".join(
                    f"z{i}" for i in range(12)))]
        refs = ["prefix " + self.W + " suffix"]
        out = self._run(ray_session, docs, refs)
        assert list(out.n_overlap_windows) == [1, 0]
        assert out.overlap_ratio[0] == 1.0 / out.n_windows[0]

    def test_within_ref_repeats_count_once(self, ray_session):
        docs = [(0, self.W)]
        refs = [self.W, self.W, self.W]   # membership, not multiplicity
        out = self._run(ray_session, docs, refs)
        assert list(out.n_overlap_windows) == [1]

    def test_differential_random(self, ray_session):
        rng = np.random.RandomState(17)
        vocab = [f"v{i}" for i in range(8)]
        docs = [(i, " ".join(rng.choice(vocab, rng.randint(0, 30))))
                for i in range(30)]
        refs = [" ".join(rng.choice(vocab, rng.randint(0, 30)))
                for _ in range(10)]
        k = 4
        out = self._run(ray_session, docs, refs, k=k)
        ref_wins = set()
        for t in refs:
            tk = t.split()
            ref_wins.update(" ".join(tk[i:i + k])
                            for i in range(len(tk) - k + 1))
        for _, row in out.iterrows():
            tk = dict(docs)[row.doc_id].split()
            wins = [" ".join(tk[i:i + k])
                    for i in range(len(tk) - k + 1)]
            want = sum(1 for w in wins if w in ref_wins)
            assert row.n_overlap_windows == want
            assert row.n_windows == len(wins)
