"""stages/crawl.py — capture dedup (latest row per key) and url → host
extraction: hand-built argmax vectors, string-key routing, partition
invariance, and pandas recomputes of the two crawl queries."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


class TestHostOf:
    def test_vectors(self, ray_session):
        from mobile_ocr_api_ray.stages.crawl import host_of
        urls = pa.array([
            "https://Site01.Example/p/x",
            "http://a.b.c:8080/q?x=1",
            "ftp://host/f",
            "not a url",
            None])
        got = host_of(urls).to_pylist()
        assert got == ["site01.example", "a.b.c:8080", "host", None, None]


class TestLatestRowsPerKey:
    def _run(self, tbl, key, order_by, nc=4):
        import ray.data as rd
        from mobile_ocr_api_ray.stages.crawl import latest_rows_per_key
        return (latest_rows_per_key(rd.from_arrow(tbl), key, order_by,
                                    n_coarse=nc)
                .to_pandas().sort_values(key).reset_index(drop=True))

    def test_int_key_argmax_with_tiebreak(self, ray_session):
        tbl = pa.table({
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([10, 30, 30, 5, 5], pa.int64()),
            "uid": pa.array([100, 101, 102, 200, 201], pa.int64())})
        got = self._run(tbl, "k", ["ts", "uid"])
        # k=1: ts tie at 30 → uid 102 wins; k=2: ts tie → uid 201
        assert list(got["uid"]) == [102, 201]

    def test_string_key(self, ray_session):
        tbl = pa.table({
            "url": pa.array(["a", "b", "a", "c", "b"]),
            "ts": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array([0, 1, 2, 3, 4], pa.int64())})
        got = self._run(tbl, "url", ["ts"])
        assert list(got["url"]) == ["a", "b", "c"]
        assert list(got["v"]) == [2, 4, 3]

    def test_partition_invariance(self, ray_session):
        import ray.data as rd
        from mobile_ocr_api_ray.stages.crawl import latest_rows_per_key
        rng = np.random.RandomState(7)
        n = 2000
        tbl = pa.table({
            "k": pa.array(rng.randint(0, 200, n), pa.int64()),
            "ts": pa.array(rng.randint(0, 10**6, n), pa.int64()),
            "rid": pa.array(np.arange(n), pa.int64())})
        want = (tbl.to_pandas()
                .sort_values(["k", "ts", "rid"], ascending=[True, False, False])
                .drop_duplicates("k").sort_values("k").reset_index(drop=True))
        for nblocks in (1, 7, 64):
            ds = rd.from_arrow(tbl).repartition(nblocks)
            got = (latest_rows_per_key(ds, "k", ["ts", "rid"], n_coarse=8)
                   .to_pandas().sort_values("k").reset_index(drop=True))
            pd.testing.assert_frame_equal(got[["k", "ts", "rid"]],
                                          want[["k", "ts", "rid"]])


class TestCrawlQueries:
    def test_latest_capture_all_gen2(self, ray_session):
        from mobile_ocr_api_ray.pipelines.analysis import (
            _pages_dir_for, latest_capture_per_url)
        res = latest_capture_per_url(SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        import pyarrow.parquet as pq
        d = _pages_dir_for(SF)
        n_urls = sum(pq.read_metadata(os.path.join(d, "pages.parquet", f))
                     .num_rows
                     for f in os.listdir(os.path.join(d, "pages.parquet"))
                     if f.endswith(".parquet"))
        assert len(df) == n_urls and df["url"].is_unique
        assert set(df["crawl_gen"]) == {2}

    def test_domain_stats_vs_pandas(self, ray_session):
        from mobile_ocr_api_ray.pipelines.analysis import (
            _pages_dir_for, domain_page_stats)
        d = _pages_dir_for(SF)
        raw = pd.read_parquet(os.path.join(d, "pages.parquet"),
                              columns=["url", "html", "warc_ts"])
        raw["domain"] = raw["url"].str.extract(
            r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)")[0].str.lower()
        raw["b"] = raw["html"].map(len)
        want = raw.groupby("domain").agg(
            n_pages=("b", "size"), total_html_bytes=("b", "sum"),
            last_capture=("warc_ts", "max")).reset_index()
        got = domain_page_stats(SF).to_pandas()
        pd.testing.assert_frame_equal(
            got.sort_values("domain").reset_index(drop=True),
            want.sort_values("domain").reset_index(drop=True)
                [["domain", "n_pages", "total_html_bytes", "last_capture"]],
            check_dtype=False)

    def test_empty_input_keeps_schema(self, ray_session):
        import ray.data as rd
        from mobile_ocr_api_ray.stages.crawl import latest_rows_per_key
        tbl = pa.table({"k": pa.array([], pa.int64()),
                        "ts": pa.array([], pa.int64())})
        out = latest_rows_per_key(rd.from_arrow(tbl), "k", ["ts"], n_coarse=4)
        sch = out.schema()
        assert sch is not None and set(sch.names) == {"k", "ts"}


class TestCanonicalUrl:
    def test_rules(self):
        from mobile_ocr_api_ray.stages.crawl import canonical_url_one as c
        assert c("HTTPS://Site.Example:443/p/1#frag") == \
            "https://site.example/p/1"
        assert c("http://a.ex:80/x?b=2&utm_source=tw&a=1") == \
            "http://a.ex/x?b=2&a=1"
        assert c("http://a.ex:8080/x") == "http://a.ex:8080/x"
        assert c("https://a.ex") == "https://a.ex/"
        assert c("https://a.ex/?utm_campaign=z") == "https://a.ex/"
        assert c("  https://a.ex/p  ") == "https://a.ex/p"
        assert c("not-a-url") == "not-a-url"
        assert c("") == ""

    def test_batch_kernel_nulls(self):
        import pyarrow as pa
        from mobile_ocr_api_ray.stages import crawl
        out = crawl.canonical_urls(pa.array(
            ["HTTP://X.ex/", None], pa.string()))
        assert out.to_pylist() == ["http://x.ex/", None]

    def test_canonical_capture_dedup(self, ray_session):
        from mobile_ocr_api_ray.pipelines import analysis
        df = analysis.canonical_capture_dedup(SF).to_pandas()
        # every surviving row is the recrawl (gen 2) under the CANONICAL url
        assert (df.crawl_gen == 2).all()
        assert df.url.str.startswith("https://site").all()
        assert not df.url.str.contains("utm_").any()
        assert df.url.is_unique


class TestCrawlDiff:
    def _ds(self, rows):
        import ray.data
        return ray.data.from_arrow(pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary())}))

    def test_all_statuses(self, ray_session):
        from mobile_ocr_api_ray.stages import crawl as c
        old = self._ds([("u1", b"a"), ("u2", b"b"), ("u3", b"c")])
        new = self._ds([("u2", b"b"), ("u3", b"CHANGED"), ("u4", b"d")])
        out = c.diff_by_key(old, new)
        df = (out.to_pandas() if not isinstance(out, pa.Table)
              else out.to_pandas()).sort_values("url").reset_index(drop=True)
        assert list(zip(df.url, df.status)) == [
            ("u1", "removed"), ("u2", "unchanged"),
            ("u3", "changed"), ("u4", "added")]
        assert pd.isna(df.new_digest[0]) and pd.isna(df.old_digest[3])

    def test_partition_invariance(self, ray_session):
        from mobile_ocr_api_ray.stages import crawl as c
        old = self._ds([(f"u{i}", str(i).encode()) for i in range(40)])
        new = self._ds([(f"u{i}", str(i * (i % 3)).encode())
                        for i in range(5, 45)])
        a = c.diff_by_key(old, new, n_coarse=1).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        b = c.diff_by_key(old, new, n_coarse=13).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_corpus_query_statuses(self, ray_session):
        from mobile_ocr_api_ray.pipelines import analysis
        df = analysis.crawl_diff(SF).to_pandas()
        counts = df.status.value_counts()
        assert set(counts.index) == {"added", "removed", "changed",
                                     "unchanged"}
        # differential: statuses follow the documented hash32%4 rule
        from mobile_ocr_api_ray.pipelines.analysis import _hash32
        for u, s in zip(df.url, df.status):
            if u.endswith("?page=2"):
                assert s == "added"
            else:
                g = _hash32(u) % 4
                assert s == {0: "removed", 1: "changed",
                             2: "unchanged", 3: "unchanged"}[g]


class TestHostCap:
    def test_cap_and_differential(self, ray_session):
        from mobile_ocr_api_ray.pipelines import analysis
        from mobile_ocr_api_ray.pipelines.analysis import _hash32
        from mobile_ocr_api_ray.stages import crawl as c
        import pyarrow.parquet as pq_, os, pyarrow as pa_

        df = analysis.host_capped_pages(SF, k=3)
        df = df.to_pandas() if not isinstance(df, pa.Table) else df.to_pandas()
        assert (df.groupby("host").size() <= 3).all()
        assert (df.groupby("host")["rank"].max()
                == df.groupby("host").size()).all()

        # differential: pandas recompute of the full rule
        d = analysis._pages_dir_for(SF)
        pages = pq_.read_table(os.path.join(d, "pages.parquet"),
                               columns=["url"]).to_pandas()
        pages["host"] = c.host_of(pa_.array(pages.url)).to_pylist()
        pages["h"] = [_hash32(u) for u in pages.url]
        want = pages.sort_values(["host", "h", "url"])
        want = want[want.groupby("host").cumcount() < 3]
        got = set(df.url)
        assert got == set(want.url)


class TestUrlFilter:
    def test_split_and_rules(self, ray_session):
        import ray.data
        from mobile_ocr_api_ray.stages import crawl as c
        urls = ["https://a.ex/page", "https://a.ex/img.jpeg",
                "https://a.ex/x?phpsessid=9", "https://a.ex/doc.pdf",
                "https://a.ex/calendar/2024/02/01", "https://a.ex/p?page=5",
                "https://a.ex/p?page=500", None]
        ds = ray.data.from_arrow(pa.table({"url": pa.array(urls,
                                                           pa.string())}))
        kept, quar = c.url_filter(ds)
        kd = kept.to_pandas()
        qd = quar.to_pandas().sort_values("url").reset_index(drop=True)
        assert set(kd.url.fillna("∅")) == {"https://a.ex/page",
                                           "https://a.ex/doc.pdf",
                                           "https://a.ex/p?page=5", "∅"}
        assert list(qd.url) == ["https://a.ex/calendar/2024/02/01",
                                "https://a.ex/img.jpeg",
                                "https://a.ex/p?page=500",
                                "https://a.ex/x?phpsessid=9"]
        assert (qd.status == "rejected").all()
        # rule_idx = first matching pattern, re/RE2 agree
        import re
        from mobile_ocr_api_ray.stages.crawl import \
            DEFAULT_URL_BLOCK_PATTERNS as P
        for u, i in zip(qd.url, qd.rule_idx):
            assert next(j for j, p in enumerate(P)
                        if re.search(p, u)) == i

    def test_engine_disagreement_degrades(self, ray_session):
        # [[:digit:]] is a POSIX class in RE2 (the masking engine) but a
        # plain char class {[,:,d,i,g,t} in Python re (the attribution
        # engine) — a masked row no Python pattern matches must surface
        # with the -1 "rule unknown" sentinel, not kill the task with a
        # column length mismatch
        import ray.data
        from mobile_ocr_api_ray.stages import crawl as c
        ds = ray.data.from_arrow(pa.table({"url": pa.array(
            ["https://a.ex/q5q", "https://a.ex/clean"], pa.string())}))
        kept, quar = c.url_filter(ds, patterns=("q[[:digit:]]q",))
        qd = quar.to_pandas()
        assert list(qd.url) == ["https://a.ex/q5q"]
        assert list(qd.rule_idx) == [-1]
        assert list(kept.to_pandas().url) == ["https://a.ex/clean"]

    def test_corpus_query(self, ray_session):
        from mobile_ocr_api_ray.pipelines import analysis
        df = analysis.url_filtered_pages(SF).to_pandas()
        # exactly one quarantined variant per corpus page
        import pyarrow.parquet as pq_, os
        d = analysis._pages_dir_for(SF)
        n = pq_.read_metadata(
            os.path.join(d, "pages.parquet",
                         sorted(os.listdir(
                             os.path.join(d, "pages.parquet")))[0]))
        total = sum(pq_.read_metadata(
            os.path.join(d, "pages.parquet", f)).num_rows
            for f in os.listdir(os.path.join(d, "pages.parquet")))
        assert len(df) == total
        assert set(df.rule_idx) <= {0, 1, 2, 3}


class TestHostCapNullHost:
    def test_schemeless_urls_capped_not_dropped(self, ray_session):
        """Malformed/schemeless urls (host None) must survive under the
        '' host group, capped like any other host."""
        import ray.data
        import pandas as _pd
        import numpy as _np
        from mobile_ocr_api_ray.pipelines import analysis as a
        # build a tiny pages dir is overkill — exercise the partial/resolve
        # kernels through host_capped_pages' building blocks instead
        from mobile_ocr_api_ray.stages import crawl as c
        hosts = c.host_of(pa.array(["not-a-url", "https://x.ex/1"]))
        assert hosts.to_pylist() == [None, "x.ex"]
        # the fixed mapping: None → "" groups and caps
        mapped = ["" if h is None else h for h in hosts.to_pylist()]
        assert mapped == ["", "x.ex"]


class TestHostLineBoilerplate:
    CHROME = "<p>(c) 2024 Shared Footer Chrome Line</p>"

    def _page(self, body_lines):
        return ("<!DOCTYPE html>\n" + "\n".join(body_lines) + "\n").encode()

    def _run(self, rows, **kw):
        import ray.data
        from mobile_ocr_api_ray.stages import crawl as c
        ds = ray.data.from_arrow(pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.binary())}))
        out = c.host_line_boilerplate(ds, n_coarse=4, n_coarse_docs=4, **kw)
        df = out.to_pandas() if not isinstance(out, pa.Table) \
            else out.to_pandas()
        return df.sort_values("url").reset_index(drop=True)

    def test_host_scoped_removal(self, ray_session):
        """A 4+-char line in 2 distinct pages of ONE host is removed from
        both; the SAME line on a single-page host survives; unique
        content lines always survive; reassembly preserves order."""
        rows = [
            ("https://a.ex/1", self._page([self.CHROME, "<p>alpha one</p>"])),
            ("https://a.ex/2", self._page(["<p>beta two</p>", self.CHROME])),
            ("https://b.ex/1", self._page([self.CHROME, "<p>gamma</p>"])),
        ]
        df = self._run(rows)
        assert list(df.url) == ["https://a.ex/1", "https://a.ex/2",
                                "https://b.ex/1"]
        assert list(df.host) == ["a.ex", "a.ex", "b.ex"]
        # both a.ex pages lose the chrome line AND the shared DOCTYPE
        # line (any 4+-char host-repeated line is chrome by the rule)
        assert list(df.n_removed) == [2, 2, 0]
        assert df.clean_text[0] == "<p>alpha one</p>\n"
        assert df.clean_text[1] == "<p>beta two</p>\n"
        # b.ex keeps its copy — no within-host evidence
        assert self.CHROME in df.clean_text[2]
        # n_lines counts every chr(10)-split piece incl. the trailing ''
        assert list(df.n_lines) == [4, 4, 4]

    def test_short_lines_exempt_and_within_page_repeats(self, ray_session):
        """<4-char lines are never removed however often they repeat;
        a line repeated WITHIN one page only (1 distinct url) is kept."""
        rows = [
            ("https://a.ex/1", self._page(["<p>", "same line here",
                                           "same line here", "<p>"])),
            ("https://a.ex/2", self._page(["<p>", "other text"])),
        ]
        df = self._run(rows)
        # only the shared DOCTYPE line goes; '<p>' (3 chars) and the
        # single-url repeated line stay
        assert list(df.n_removed) == [1, 1]
        assert "same line here\nsame line here" in df.clean_text[0]
        assert "<p>\n" in df.clean_text[0]

    def test_non_html_payloads_excluded(self, ray_session):
        """Rows whose payload is not DOCTYPE-gated HTML emit no output."""
        rows = [
            ("https://a.ex/1", self._page(["<p>page one</p>"])),
            ("https://a.ex/2", b"%PDF-1.4 not html"),
            ("https://a.ex/3", b""),
        ]
        df = self._run(rows)
        assert list(df.url) == ["https://a.ex/1"]

    def test_query_gate(self, ray_session):
        """Query surface over the sf0.001 corpus: chrome lines vanish
        exactly on multi-page hosts."""
        import __ray_entry__ as e
        df = e.queries()["host_boilerplate_pages"](
            "/root/testdata/sf0.001").to_pandas()
        assert len(df) > 0
        multi = df.groupby("host")["url"].transform("size") >= 2
        # every page of a multi-page host loses its chrome (header line
        # is identical across all generated pages); single-page hosts
        # keep everything
        assert (df.loc[multi, "n_removed"] > 0).all()
        assert (df.loc[~multi, "n_removed"] == 0).all()
        chrome = '<header><p><a href="/">Home</a> | <a href="/about">About</a></p></header>'
        assert df.loc[multi, "clean_text"].str.contains(
            chrome, regex=False).sum() == 0
        assert df.loc[~multi, "clean_text"].str.contains(
            chrome, regex=False).all()


class TestUrlFeatures:
    def test_feature_vectors(self, ray_session):
        import ray.data
        from mobile_ocr_api_ray.stages import crawl
        urls = [
            "http://ex.com/a/b?id=42&utm_source=x",
            "https://Host.NET/p",
            "",
            "no-scheme/path?x=1",
            "http://h.io/123456789",
        ]
        ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
        df = (crawl.url_features(ds).to_pandas()
              .set_index("url"))
        r = df.loc[urls[0]]
        assert r.host == "ex.com"
        assert r.n_params == 2 and r.has_tracking
        assert r.n_digits == 2
        assert r.n_slashes == 4
        assert r.digit_ratio_micro == 2 * 1_000_000 // len(urls[0])
        assert df.loc[urls[1]].host == "host.net"
        assert not df.loc[urls[1]].has_tracking
        e = df.loc[""]
        assert (e.host, e.url_len, e.digit_ratio_micro) == ("", 0, 0)
        assert df.loc[urls[3]].host == ""  # schemeless → empty host
        assert df.loc[urls[3]].n_params == 1
        assert df.loc[urls[4]].n_digits == 9


class TestResolvePointerChains:
    def _resolve(self, ids, ptrs, hops, nc=4):
        import ray.data as rd
        from mobile_ocr_api_ray.stages.crawl import resolve_pointer_chains
        tbl = pa.table({"id": pa.array(ids, pa.int64()),
                        "ptr": pa.array(ptrs, pa.int64()),
                        "hops": pa.array(hops, pa.int64())})
        return (resolve_pointer_chains(rd.from_arrow(tbl), n_coarse=nc)
                .to_pandas().sort_values("id").reset_index(drop=True))

    def test_single_long_chain(self, ray_session):
        # 9 → 8 → … → 0 (terminal): hop counts are the distance, and the
        # chain is longer than 2^3 so at least 4 doubling rounds happen
        n = 10
        ids = list(range(n))
        ptrs = [0] + [i - 1 for i in range(1, n)]
        hops = [0] + [1] * (n - 1)
        df = self._resolve(ids, ptrs, hops)
        assert df.final_id.tolist() == [0] * n
        assert df.n_hops.tolist() == ids

    def test_forest_with_branches(self, ray_session):
        # two trees: {0 ← 1 ← 3, 0 ← 2} and {4 ← 5}; 6 isolated terminal
        ids = [0, 1, 2, 3, 4, 5, 6]
        ptrs = [0, 0, 0, 1, 4, 4, 6]
        hops = [0, 1, 1, 1, 0, 1, 0]
        df = self._resolve(ids, ptrs, hops)
        assert df.final_id.tolist() == [0, 0, 0, 0, 4, 4, 6]
        assert df.n_hops.tolist() == [0, 1, 1, 2, 0, 1, 0]

    def test_unclosed_pointer_table_raises(self, ray_session):
        # ptr 99 has no matching id: the inner join would silently drop
        # the walker — the per-round closure assertion must raise instead
        with pytest.raises(Exception, match="not closed"):
            self._resolve([0, 1, 2], [0, 0, 99], [0, 1, 1])

    def test_partition_invariance(self, ray_session):
        ids = list(range(40))
        ptrs = [i if i % 5 == 0 else i - 1 for i in ids]
        hops = [0 if i % 5 == 0 else 1 for i in ids]
        a = self._resolve(ids, ptrs, hops, nc=1)
        b = self._resolve(ids, ptrs, hops, nc=7)
        pd.testing.assert_frame_equal(a, b)

    def test_redirect_chains_query(self, ray_session):
        """Query-level differential: the grafted rule walked in pure
        python must agree with the pointer-doubled result exactly."""
        from mobile_ocr_api_ray.hashing import hash32
        from mobile_ocr_api_ray.pipelines.analysis import redirect_chains
        df = redirect_chains(SF).to_pandas()

        def parent(i):
            h = hash32(i)
            if i == 0 or h % 4 == 0:
                return None
            return max(i - 1 - h % 3, 0)

        finals, hops = [], []
        for i in df.doc_id:
            cur, k = int(i), 0
            while parent(cur) is not None:
                cur, k = parent(cur), k + 1
            finals.append(cur)
            hops.append(k)
        assert df.final_id.tolist() == finals
        assert df.n_hops.tolist() == hops
        # the graft produces real multi-hop chains at every tier
        assert df.n_hops.max() >= 3
