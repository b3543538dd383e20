"""Kernel-level tests: HTML block extraction, bitmap OCR, structure rules."""

import random

import numpy as np
import pyarrow as pa
import pytest

from mobile_ocr_api_ray import corpus
from mobile_ocr_api_ray.stages import glyphs, image_extract as ie
from mobile_ocr_api_ray.stages.extractor import ExtractorActor, build_structure, sniff_kind
from mobile_ocr_api_ray.stages.html_extract import extract_html, segment_blocks


class TestHtmlExtract:
    def test_golden_roundtrip(self):
        rng = random.Random("html:0")
        payload, golden, n_blocks = corpus._make_html(rng, "eng")
        text, conf, kept = extract_html(payload)
        assert text == golden
        assert len(kept) == n_blocks
        assert 66.0 < conf <= 100.0

    def test_boilerplate_dropped(self):
        html = (b"<html><body><nav><ul><li><a href='/'>Home page link</a></li></ul></nav>"
                b"<p>This is the real main content paragraph of the page.</p>"
                b"<footer><p><a href='/t'>Terms of service link text</a></p></footer>"
                b"</body></html>")
        text, _, kept = extract_html(html)
        assert text == "This is the real main content paragraph of the page."
        assert len(kept) == 1

    def test_entity_unescape_and_collapse(self):
        html = b"<p>alpha &amp; beta\n\n   gamma with more than twentyfive chars</p>"
        text, _, _ = extract_html(html)
        assert text == "alpha & beta gamma with more than twentyfive chars"

    def test_script_style_dropped(self):
        html = (b"<style>p { color: red }</style><script>var a = '<p>not a block '"
                b"+ 'with enough characters</p>';</script>"
                b"<p>Actual visible content block with enough characters.</p>")
        text, _, kept = extract_html(html)
        assert len(kept) == 1
        assert "visible content" in text

    def test_link_density_threshold(self):
        dense = b"<p><a href='/x'>all of this paragraph text is one link here</a></p>"
        assert extract_html(dense)[0] == ""
        sparse = (b"<p>only <a href='/x'>one</a> word of this long paragraph is "
                  b"a link so it stays</p>")
        assert "only one word" in extract_html(sparse)[0]


class TestImageKernels:
    @pytest.mark.parametrize("kind", ["fast", "balanced", "quality", "default"])
    @pytest.mark.parametrize("scale", [2, 3, 4])
    def test_roundtrip_all_kernels(self, kind, scale):
        rng = random.Random("img:7")
        lines, breaks, ptexts = corpus._make_image_lines(rng, 3)
        golden = "\n\n".join(ptexts)
        img = glyphs.render_text(lines, scale=scale, margin=4 * scale, para_breaks=breaks)
        r = ie.extract_image(img, kind, max_dim=5000, do_deskew=False)
        assert r["text"] == golden
        assert 80.0 < r["confidence"] <= 100.0

    def test_noise_removed(self):
        rng = random.Random("img:8")
        lines, breaks, ptexts = corpus._make_image_lines(rng, 2)
        img = glyphs.add_noise(
            glyphs.render_text(lines, scale=3, margin=12, para_breaks=breaks), 100, 5)
        r = ie.extract_image(img, "balanced", max_dim=5000, do_deskew=False)
        assert r["text"] == "\n\n".join(ptexts)

    def test_resize_path_deterministic(self):
        rng = random.Random("img:9")
        lines, breaks, ptexts = corpus._make_image_lines(rng, 6)
        img = glyphs.render_text(lines, scale=8, margin=32, para_breaks=breaks)
        assert max(img.shape) > 1200  # crosses the medium-quality threshold
        r1 = ie.extract_image(img, "balanced", max_dim=1200)
        r2 = ie.extract_image(img, "balanced", max_dim=1200)
        assert r1["text"] == r2["text"]

    def test_optimize_formula(self):
        # exact reference resize arithmetic (app2.py:228-233)
        img = np.zeros((500, 2000), dtype=np.uint8)
        out = ie.optimize_image(img, 1200)
        assert out.shape == (int(500 * (1200 / 2000)), 1200)
        assert ie.optimize_image(np.zeros((100, 100), np.uint8), 1200).shape == (100, 100)

    def test_deskew_recovers_rotation(self):
        # rotated inputs are approximate by nature (NN rotation isn't exactly
        # invertible): assert the angle search finds the inverse angle and
        # recognition stays highly accurate after deskew
        rng = random.Random("img:10")
        lines, breaks, ptexts = corpus._make_image_lines(rng, 4)
        img = glyphs.render_text(lines, scale=6, margin=24, para_breaks=breaks)
        rot = glyphs.rotate_nn(img, 1.5)
        _, angle = ie.deskew(rot)
        assert angle == -1.5
        r = ie.extract_image(rot, "fast", max_dim=5000, do_deskew=True)
        golden = "\n\n".join(ptexts)
        import difflib
        sim = difflib.SequenceMatcher(None, r["text"], golden).ratio()
        assert sim > 0.7, f"similarity {sim:.2f}"
        # and without rotation the pipeline is byte-exact
        r0 = ie.extract_image(img, "fast", max_dim=5000, do_deskew=True)
        assert r0["text"] == golden

    def test_otsu_separates_modes(self):
        # perfect bimodal: any threshold between the modes is an argmax;
        # what matters is that `<= t` separates ink from background
        img = np.array([[0] * 50 + [200] * 30 + [255] * 20], dtype=np.uint8)
        t = ie._otsu_threshold(img)
        assert (img <= t).sum() == 50

    def test_region_filter(self):  # M8 thresholds, app.py:867-883
        assert ie.region_filter(0, 0, 100, 50, 1000, 1000)      # area .005, aspect 2
        assert not ie.region_filter(0, 0, 2, 2, 1000, 1000)     # too small
        assert not ie.region_filter(0, 0, 950, 900, 1000, 1000)  # too big
        assert not ie.region_filter(0, 0, 110, 10, 1000, 1000)  # aspect 11

    def test_column_detection(self):  # app.py:916-944
        # two clusters of x positions, gap > 10% of width=1000
        bounds = [(0, 0, 10, 10), (20, 50, 10, 10), (600, 0, 10, 10), (615, 50, 10, 10)]
        cols = ie.detect_columns(bounds, 1000)
        assert cols == [0, 0, 1, 1]
        # no gap -> one column
        assert ie.detect_columns([(0, 0, 1, 1), (50, 0, 1, 1)], 1000) == [0, 0]


class TestPayloads:
    def test_sniff(self):
        assert sniff_kind(b"") == "empty"
        assert sniff_kind(None) == "empty"
        assert sniff_kind(b"<!DOCTYPE html><html>") == "html"
        assert sniff_kind(b"  <html><body>") == "html"
        assert sniff_kind(glyphs.IMGX_MAGIC + b"\x00\x01\x00\x01\x00") == "image"
        assert sniff_kind(glyphs.PDFX_MAGIC + b"\x00\x00\x00\x00") == "pdf"
        assert sniff_kind(b"GIF89a......") == "unknown"

    def test_imgx_roundtrip(self):
        img = (np.arange(12, dtype=np.uint8)).reshape(3, 4)
        assert np.array_equal(glyphs.decode_imgx(glyphs.encode_imgx(img)), img)

    def test_pdfx_roundtrip(self):
        pages = [b"page-one", b"", b"page-three"]
        assert glyphs.decode_pdfx(glyphs.encode_pdfx(pages)) == pages


class TestStructure:
    def test_spans_reconstruct_text(self):
        rng = random.Random("s:1")
        payload, golden, _ = corpus._make_html(rng, "eng")
        ex = ExtractorActor()
        row = ex.extract_row("u", payload, None, "eng")
        text = row["extracted_text"]
        assert text == golden
        for span in row["spans"]:
            seg = text[span["start"]:span["end"]]
            if span["kind"] == "paragraph":
                assert seg == row["paragraphs"][span["para_id"]]["text"]
            else:
                p = row["paragraphs"][span["para_id"]]
                assert seg == p["sentences"][span["sent_id"]]["text"]

    def test_column_membership_consistent(self):
        rng = random.Random("s:2")
        lines, breaks, ptexts = corpus._make_image_lines(rng, 3)
        img = glyphs.render_text(lines, scale=3, margin=12, para_breaks=breaks)
        ex = ExtractorActor()
        row = ex.extract_row("u", glyphs.encode_imgx(img), None, "eng")
        for col in row["columns"]:
            for pid in col["paragraphs"]:
                assert row["paragraphs"][pid]["column"] == col["id"]

    def test_suggested_actions_from_structure(self):
        _, paragraphs, columns, spans, actions = build_structure(
            [{"text": "One. Two. Three. Four. Five. Six.", "column": 0}])
        types = [a["type"] for a in actions]
        assert "summarize" in types and "read_full" in types
        assert "read_by_paragraph" not in types


class TestOcrModeRouting:
    """M3 — ocr_mode must CHANGE the engine config (app2.py:345-353):
    fast/standard/accurate produce distinct outputs on the same payload."""

    def _rotated_noisy(self):
        from mobile_ocr_api_ray.stages import glyphs
        img = glyphs.render_text(["HELLO WORLD", "SECOND LINE OF TEXT"],
                                 scale=3, margin=12)
        img = glyphs.add_noise(img, 80, seed=5)
        return glyphs.rotate_nn(img, 1.5)

    def test_modes_distinct(self):
        from mobile_ocr_api_ray.stages.image_extract import extract_image
        img = self._rotated_noisy()
        out = {m: extract_image(img, "balanced", 1200, False, m)
               for m in ("fast", "standard", "accurate")}
        # accurate always deskews: it recovers the rotated text
        assert out["accurate"]["text"].startswith("HELLO WORLD")
        assert not out["standard"]["text"].startswith("HELLO WORLD")
        # fast scores on the layout mask itself, standard on the routed
        # band-local kernel — distinct confidence evidence
        assert out["fast"]["confidence"] != out["standard"]["confidence"]
        assert out["accurate"]["confidence"] != out["standard"]["confidence"]

    def test_quality_tiers_distinct_via_actor(self):
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        payload = glyphs.encode_imgx(self._rotated_noisy())
        batch = pa.table({"url": pa.array(["u"], pa.string()),
                          "html": pa.array([payload], pa.binary())})
        rows = {q: ExtractorActor(quality=q)(batch).to_pandas().iloc[0]
                for q in ("low", "medium", "high")}
        assert rows["high"]["extracted_text"].startswith("HELLO WORLD")
        confs = {q: r["confidence"] for q, r in rows.items()}
        assert len(set(confs.values())) == 3, confs

    def test_standard_matches_round1_behavior(self):
        """standard mode with do_deskew=False is byte-identical to the
        round-1 call shape (golden stability for the flagship default)."""
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.image_extract import extract_image
        img = glyphs.render_text(["HELLO WORLD"], scale=3, margin=12)
        a = extract_image(img, "balanced", 1200, False)
        b = extract_image(img, "balanced", 1200, False, "standard", "eng")
        assert a["text"] == b["text"] == "HELLO WORLD"
        assert a["confidence"] == b["confidence"]


class TestKernelConfig:
    """Raw config-string passthrough (reference app.py:567,580-581: the
    caller's ``config`` is appended verbatim to the engine invocation).
    Engine form: a per-row ``kernel_config`` column of ``key=value``
    tokens overriding the quality-routed params for that row."""

    def _payload(self):
        from mobile_ocr_api_ray.stages import glyphs
        img = glyphs.render_text(["HELLO WORLD", "SECOND LINE OF TEXT"],
                                 scale=3, margin=12)
        img = glyphs.add_noise(img, 80, seed=5)
        return glyphs.encode_imgx(glyphs.rotate_nn(img, 1.5))

    def test_config_reaches_engine(self):
        """The raw string must CHANGE engine behavior: ocr_mode=accurate
        on a medium-quality actor recovers the rotated text the default
        routing does not (same observable as TestOcrModeRouting)."""
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        p = self._payload()
        batch = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "html": pa.array([p, p], pa.binary()),
            "kernel_config": pa.array([None, "ocr_mode=accurate"],
                                      pa.string())})
        df = ExtractorActor(quality="medium")(batch).to_pandas() \
            .set_index("url")
        assert not df.loc["a"].extracted_text.startswith("HELLO WORLD")
        assert df.loc["b"].extracted_text.startswith("HELLO WORLD")
        assert (df.status == "ok").all()

    def test_config_distinct_lru_entries(self):
        """Same payload + different config must NOT share a cached result
        (the v2 cache-key rule extended to the config field)."""
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        p = self._payload()
        act = ExtractorActor(quality="medium")
        batch = pa.table({
            "url": pa.array(["a", "b", "c"], pa.string()),
            "html": pa.array([p, p, p], pa.binary()),
            "kernel_config": pa.array(
                [None, "ocr_mode=accurate", "ocr_mode=accurate"],
                pa.string())})
        df = act(batch).to_pandas()
        assert act.kernel_invocations == 2  # b,c share; a distinct
        assert df.extracted_text[1] == df.extracted_text[2]
        assert df.extracted_text[0] != df.extracted_text[1]

    def test_bad_config_is_error_row(self):
        """A malformed config degrades to an M11 error ROW (the reference
        engine rejects bad config at invocation), never a batch failure."""
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        p = self._payload()
        batch = pa.table({
            "url": pa.array(["bad", "good"], pa.string()),
            "html": pa.array([p, p], pa.binary()),
            "kernel_config": pa.array(
                ["tessedit_do_invert", None], pa.string())})
        df = ExtractorActor(quality="medium")(batch).to_pandas() \
            .set_index("url")
        assert df.loc["bad"].status == "error"
        assert "kernel_config" in df.loc["bad"].error
        assert df.loc["good"].status == "ok"

    def test_parse_kernel_config(self):
        from mobile_ocr_api_ray.functions.routing import parse_kernel_config
        assert parse_kernel_config(
            "ocr_mode=fast max_dim=800 deskew=1 preprocess=quality") == {
            "ocr_mode": "fast", "max_dim": 800, "do_deskew": True,
            "preprocess_kind": "quality"}
        assert parse_kernel_config(None) == {}
        assert parse_kernel_config("") == {}
        for bad in ("psm=3", "ocr_mode=turbo", "max_dim=big", "deskew=2",
                    "oem"):
            with pytest.raises(ValueError):
                parse_kernel_config(bad)


class TestLangRouting:
    """M9/-l — the lang column must route observable recognizer behavior
    (reference -l passthrough, app.py:567,580,1127)."""

    def _ambiguous_cell(self):
        from mobile_ocr_api_ray.stages.glyphs import FONT
        tb, tn = FONT["B"], FONT["N"]
        D = np.argwhere(tb != tn)
        cell = tb.copy()
        flip = D[:len(D) // 2]
        cell[flip[:, 0], flip[:, 1]] = tn[flip[:, 0], flip[:, 1]]
        return cell  # hamming 11 to BOTH 'B' and 'N', farther from the rest

    def test_lang_pack_tiebreak(self):
        from mobile_ocr_api_ray.stages.image_extract import _match_cells_batch
        cells = self._ambiguous_cell()[None].astype(bool)
        eng, _ = _match_cells_batch(cells, cells, "eng")
        ind, _ = _match_cells_batch(cells, cells, "ind")
        assert eng == ["B"]   # eng pack = FONT_CHARS order (identity)
        assert ind == ["N"]   # ind pack prefers N over B
        default, _ = _match_cells_batch(cells, cells, None)
        assert default == eng  # None/eng identical → round-1 goldens stable
        mixed, _ = _match_cells_batch(cells, cells, "eng+ind")
        assert mixed == eng   # primary language wins

    def test_rows_differing_only_in_lang(self):
        """Two identical payload rows with lang 'eng' vs 'ind' produce
        different extracted text through the full actor path."""
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        cell = self._ambiguous_cell()
        img = np.full((7 + 12, 5 + 12), glyphs.BG, dtype=np.uint8)
        img[6:13, 6:11][cell] = glyphs.INK
        payload = glyphs.encode_imgx(img)
        batch = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "html": pa.array([payload, payload], pa.binary()),
            "text": pa.array([None, None], pa.string()),
            "lang": pa.array(["eng", "ind"], pa.string())})
        out = ExtractorActor(quality="medium", lru_size=0)(batch).to_pandas()
        # banding re-pads the cell so the surviving tie is between a
        # different template pair than the crafted B/N one — the invariant
        # under test is that lang alone flips the recognized text
        assert (out.status == "ok").all()
        assert out.extracted_text[0] != out.extracted_text[1]
        assert out.confidence[0] == out.confidence[1]  # tie ⇒ equal score


class TestPerActorLru:
    """A2b — repeated payloads within one actor's stream invoke the kernel
    once (the reference's v2 result cache as warm actor state)."""

    def test_repeats_invoke_kernel_once(self):
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        p1 = glyphs.encode_imgx(glyphs.render_text(["HELLO"], scale=2, margin=8))
        p2 = glyphs.encode_imgx(glyphs.render_text(["WORLD"], scale=2, margin=8))
        batch = pa.table({
            "url": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            "html": pa.array([p1, p2, p1, p1, p2], pa.binary()),
            "text": pa.array([None] * 5, pa.string()),
            "lang": pa.array(["eng"] * 5, pa.string())})
        actor = ExtractorActor()
        out = actor(batch).to_pandas()
        assert actor.kernel_invocations == 2  # 2 distinct payloads, 5 rows
        assert out.extracted_text[0] == out.extracted_text[2] == "HELLO"
        # lang participates in the cache key: same payload, new lang → miss
        batch2 = pa.table({
            "url": pa.array(["f"], pa.string()),
            "html": pa.array([p1], pa.binary()),
            "text": pa.array([None], pa.string()),
            "lang": pa.array(["ind"], pa.string())})
        actor(batch2)
        assert actor.kernel_invocations == 3

    def test_byte_cap_evicts(self):
        """The BYTE cap evicts oldest-first even while the entry count is
        under lru_size — big extraction results cannot pin unbounded
        per-actor heap (VERDICT r4 item 7)."""
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.extractor import (ExtractorActor,
                                                         _result_nbytes)
        mk = lambda s: glyphs.encode_imgx(
            glyphs.render_text([s], scale=2, margin=8))
        p1, p2, p3 = mk("HELLO"), mk("WORLD"), mk("AGAIN")
        one = _result_nbytes(ExtractorActor()._extract_payload(
            p1, "image", "eng"))
        # cap fits ~2 results; entry cap stays loose
        actor = ExtractorActor(lru_size=512, lru_bytes=2 * one + 10)
        for p in (p1, p2, p3):
            actor(pa.table({"url": pa.array(["u"], pa.string()),
                            "html": pa.array([p], pa.binary())}))
        assert actor.kernel_invocations == 3
        assert len(actor._lru) == 2  # p1 evicted by bytes
        assert actor._lru_nbytes <= 2 * one + 10
        # p1 is a miss again; p3 still cached
        actor(pa.table({"url": pa.array(["u"], pa.string()),
                        "html": pa.array([p3], pa.binary())}))
        assert actor.kernel_invocations == 3
        actor(pa.table({"url": pa.array(["u"], pa.string()),
                        "html": pa.array([p1], pa.binary())}))
        assert actor.kernel_invocations == 4

    def test_lru_disabled(self):
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        p1 = glyphs.encode_imgx(glyphs.render_text(["HELLO"], scale=2, margin=8))
        batch = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "html": pa.array([p1, p1], pa.binary()),
            "text": pa.array([None, None], pa.string()),
            "lang": pa.array(["eng", "eng"], pa.string())})
        actor = ExtractorActor(lru_size=0)
        actor(batch)
        assert actor.kernel_invocations == 2


class TestV1Tier:
    """D3 parity: the v1 API's single default tier (1500 px cap, q85,
    Gaussian+Otsu preprocess — app.py:323,550-556) is an exposed quality."""

    def test_v1_routing(self):
        from mobile_ocr_api_ray.functions.routing import route_quality
        assert route_quality("v1") == ("default", "standard", 1500, 85)

    def test_v1_actor(self):
        from mobile_ocr_api_ray.stages import glyphs
        from mobile_ocr_api_ray.stages.extractor import ExtractorActor
        payload = glyphs.encode_imgx(
            glyphs.render_text(["HELLO WORLD"], scale=3, margin=12))
        batch = pa.table({"url": pa.array(["u"], pa.string()),
                          "html": pa.array([payload], pa.binary())})
        out = ExtractorActor(quality="v1")(batch).to_pandas()
        assert out.extracted_text[0] == "HELLO WORLD"
        assert out.quality[0] == "v1"


class TestCrc32SharedHelper:
    """str_hash.crc32_of_strings: the ONE routing hash every coarse
    shuffle shares — must be bit-identical to zlib.crc32(s.encode())."""

    def _want(self, vals, null_value):
        import zlib
        import numpy as np
        return np.array([zlib.crc32(s.encode()) if s is not None
                         else null_value for s in vals], np.int64)

    def test_exact_vs_zlib(self):
        import numpy as np
        from mobile_ocr_api_ray.str_hash import crc32_of_strings
        rng = np.random.RandomState(3)
        vals = ["", "a", "héllo ✓ wörld", "x" * 300, "y" * 5000, None]
        vals += ["".join(chr(rng.randint(32, 0x2FF))
                         for _ in range(rng.randint(0, 150)))
                 for _ in range(300)]
        arr = pa.array(vals, pa.string())
        want = self._want(vals, -1)
        assert (crc32_of_strings(arr, null_value=-1) == want).all()
        # sliced array (nonzero Arrow offset) and chunked array
        assert (crc32_of_strings(arr.slice(5, 200), null_value=-1)
                == want[5:205]).all()
        ch = pa.chunked_array([pa.array(vals[:50], pa.string()),
                               pa.array(vals[50:], pa.string())])
        assert (crc32_of_strings(ch, null_value=-1) == want).all()

    def test_pandas_list_and_empty_inputs(self):
        import pandas as pd
        from mobile_ocr_api_ray.str_hash import crc32_of_strings
        vals = ["alpha", None, "", "beta"]
        want = self._want(vals, 0)
        assert (crc32_of_strings(pd.Series(vals, dtype=object)) == want).all()
        assert (crc32_of_strings(vals) == want).all()
        assert len(crc32_of_strings(pa.array([], pa.string()))) == 0

    def test_str_coarse_null_convention(self):
        # null hashes as '' (crc 0) — the pervasive (s or '') convention
        import numpy as np
        from mobile_ocr_api_ray.str_hash import str_coarse
        out = str_coarse(pa.array([None, "", "k"], pa.string()), 7)
        assert out.dtype == np.int32
        assert out[0] == out[1] == 0
