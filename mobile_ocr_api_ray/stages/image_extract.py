"""Bitmap OCR kernels: optimize → binarize → deskew → segment → recognize.

Re-expresses the reference's image pipeline stage-for-stage with the same
tuned constants, over the deterministic IMGX glyph raster (no Tesseract in
the sandbox — SURVEY.md §7):

- M1 optimize_image_for_mobile: aspect-preserving downscale when a dimension
  exceeds the quality tier's max_dim — v1 cap 1500 (app.py:323), v2 tiers
  800/1200/2000 (app2.py:215-223). Formula replicated exactly
  (``new_h = int(h * (max_dim / w))``); nearest-neighbor for determinism.
- M2 preprocess_image kernels, selected by ``preprocess_kind``
  (app.py:487-558, app2.py:250-312):
    fast      — global threshold at 128 (app2.py:287)
    balanced  — 3x3 Gaussian blur + adaptive Gaussian threshold(11, 2)
                (app2.py:296-301)
    quality   — 3x3 Gaussian + Otsu + morph-close 1x1 (identity close —
                faithful to the reference's (1,1) kernel, app2.py:291-294)
    default   — 3x3 Gaussian + Otsu (v1, app.py:550-556)
- deskew: projection-profile search over ±3° (the reference delegates skew
  to Tesseract's --psm 3 page analysis; here it is explicit).
- M8 analyze_document_structure analog: line bands from row profiles,
  region filter area ∈ (0.001·WH, 0.8·WH) and aspect 0.1 < w/h < 10
  (app.py:867-883), paragraphs from inter-line gaps, columns from the
  x-gap > 10%·width rule (app.py:916-944).
- M3/M4 recognize: per-cell template match against the glyph table;
  confidence = mean per-glyph match score ×100, fallback 80.0 when no
  glyphs (app.py:586-593 mean-word-confidence + 80.0 fallback).

All pure numpy, module-level state (font stack) built once per worker.
"""

from __future__ import annotations

import numpy as np

from .glyphs import BG, FONT_CHARS, FONT_STACK, GLYPH_H, GLYPH_W, rotate_nn

# ---------------------------------------------------------------- M1 optimize

def optimize_image(img: np.ndarray, max_dim: int) -> np.ndarray:
    """Downscale when larger than max_dim, aspect preserved (app2.py:225-236)."""
    h, w = img.shape
    if w <= max_dim and h <= max_dim:
        return img
    if w > h:
        new_w = max_dim
        new_h = int(h * (max_dim / w))
    else:
        new_h = max_dim
        new_w = int(w * (max_dim / h))
    ys = (np.arange(new_h) * h // new_h).astype(np.int64)
    xs = (np.arange(new_w) * w // new_w).astype(np.int64)
    return img[np.ix_(ys, xs)]


# ------------------------------------------------------------- M2 binarizers

def _pad1_reflect_u16(img: np.ndarray) -> np.ndarray:
    """1-px reflect pad into a uint16 buffer — identical values to
    ``np.pad(img, 1, mode='reflect').astype(np.uint16)`` but without the
    generic arraypad wrapper, which costs more than the copy itself on the
    small per-band arrays this runs on (~15% of kernel CPU, profiled)."""
    h, w = img.shape
    if h < 2 or w < 2:
        return np.pad(img, 1, mode="reflect").astype(np.uint16)
    p = np.empty((h + 2, w + 2), dtype=np.uint16)
    p[1:-1, 1:-1] = img
    p[0, 1:-1] = img[1]
    p[-1, 1:-1] = img[-2]
    p[:, 0] = p[:, 2]
    p[:, -1] = p[:, -3]
    return p


def _gaussian_blur3(img: np.ndarray) -> np.ndarray:
    """Separable 3x3 Gaussian ([1,2,1]/4 each axis), reflect borders,
    rounded back to uint8 — integer arithmetic throughout (cv2's
    GaussianBlur likewise produces uint8; float64 passes here saturate
    memory bandwidth at high process counts and kill scaling)."""
    p = _pad1_reflect_u16(img)
    horiz = p[1:-1, :-2] + 2 * p[1:-1, 1:-1] + p[1:-1, 2:]          # <= 1020
    h = horiz.shape[0]
    if h < 2:
        p2 = np.pad(horiz, ((1, 1), (0, 0)), mode="reflect")
    else:
        p2 = np.empty((h + 2, horiz.shape[1]), dtype=np.uint16)
        p2[1:-1] = horiz
        p2[0] = horiz[1]
        p2[-1] = horiz[-2]
    total = p2[:-2] + 2 * p2[1:-1] + p2[2:]                          # <= 4080
    return ((total + 8) >> 4).astype(np.uint8)                       # /16 rounded


def _otsu_threshold(img: np.ndarray) -> float:
    hist = np.bincount(np.clip(img, 0, 255).astype(np.uint8).ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127.0
    omega = np.cumsum(hist) / total
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    denom[denom == 0] = np.nan
    sigma_b = (mu_t * omega - mu) ** 2 / denom
    return float(np.nanargmax(sigma_b))


def _box_sum(img: np.ndarray, k: int) -> np.ndarray:
    """k x k local SUM via int64 integral image, edge-replicated borders —
    integer-exact (mean comparisons are done cross-multiplied by k*k)."""
    pad = k // 2
    if pad == 0:  # k == 1 → the 1x1 box sum is the image itself
        return img.astype(np.int32)
    h0, w0 = img.shape
    p = np.empty((h0 + 2 * pad, w0 + 2 * pad), dtype=np.int64)
    p[pad:-pad, pad:-pad] = img
    p[:pad, pad:-pad] = img[0]
    p[-pad:, pad:-pad] = img[-1]
    p[:, :pad] = p[:, pad:pad + 1]
    p[:, -pad:] = p[:, -pad - 1:-pad]
    ii = np.cumsum(np.cumsum(p, axis=0), axis=1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    h, w = img.shape
    s = ii[k:k + h, k:k + w] - ii[:h, k:k + w] - ii[k:k + h, :w] + ii[:h, :w]
    return s.astype(np.int32)  # k*k*255 fits comfortably


def binarize(img: np.ndarray, kind: str = "balanced",
             blurred: np.ndarray | None = None) -> np.ndarray:
    """Return boolean ink mask (True = text pixel). Kinds per app2.py:284-302.

    ``blurred`` lets callers share the 3x3 Gaussian across kernels (the blur
    is identical in balanced/quality/default — computed once per image)."""
    if kind == "fast":
        return img < 128
    if blurred is None:
        blurred = _gaussian_blur3(img)
    if kind in ("quality", "default"):
        # quality's morph-close with a (1,1) kernel is the identity
        t = _otsu_threshold(blurred)
        return blurred <= t
    # balanced: Gaussian blur + adaptive threshold(blockSize=11, C=2):
    # ink iff blurred <= local_mean - 2, evaluated integer-exact as
    # (blurred + 2) * k^2 <= local box SUM (no float pass)
    local_sum = _box_sum(blurred, 11)
    return (blurred.astype(np.int32) + 2) * 121 <= local_sum


# ----------------------------------------------------- S6 visualization

def draw_structure(img: np.ndarray, paragraphs: list[dict]) -> np.ndarray:
    """Annotated structure visualization (S6, app.py:871-966): 2px paragraph
    bounding rectangles (ink, app.py:913-914) and — with multiple columns —
    1px vertical column separators at the paragraph-gap midlines
    (app.py:946-950), drawn on a copy of the page raster. The reference
    base64-encodes a JPEG into the response (app.py:954-966); here the
    annotated raster is IMGX bytes in an optional binary column."""
    out = img.copy()
    h, w = out.shape
    t = 2
    col_edges: dict[int, list[int]] = {}
    for p in paragraphs:
        x, y = int(p.get("x", 0)), int(p.get("y", 0))
        pw, ph = int(p.get("width", 0)), int(p.get("height", 0))
        x0, y0 = max(0, x), max(0, y)
        x1, y1 = min(w, x + pw), min(h, y + ph)
        if x1 <= x0 or y1 <= y0:
            continue
        out[y0:min(y0 + t, y1), x0:x1] = 0
        out[max(y1 - t, y0):y1, x0:x1] = 0
        out[y0:y1, x0:min(x0 + t, x1)] = 0
        out[y0:y1, max(x1 - t, x0):x1] = 0
        col_edges.setdefault(int(p.get("column", 0)), []).append(x1)
    if len(col_edges) > 1:
        for c in sorted(col_edges)[:-1]:
            sep = min(w - 1, max(col_edges[c]) + t)
            out[:, sep] = 128
    return out


# ----------------------------------------------------------------- deskew

DESKEW_ANGLES = np.arange(-3.0, 3.01, 0.5)


def deskew(img: np.ndarray) -> tuple[np.ndarray, float]:
    """Rotate by the angle maximizing row-profile variance of the ink mask."""
    best_angle, best_var, best_img = 0.0, -1.0, img
    for ang in DESKEW_ANGLES:
        cand = rotate_nn(img, float(ang)) if ang != 0.0 else img
        profile = (cand < 128).sum(axis=1).astype(np.float64)
        var = float(profile.var())
        if var > best_var + 1e-9:
            best_var, best_angle, best_img = var, float(ang), cand
    return best_img, best_angle


# ------------------------------------------------- segmentation + recognition

def despeckle(mask: np.ndarray) -> np.ndarray:
    """Remove isolated ink pixels (no ink in the 8-neighborhood).

    The engine's analog of the reference's morphological clean-up step
    (app2.py:291-294); glyph strokes at scale >= 2 are always >= 2x2 blocks,
    so only noise specks are affected — deterministic."""
    m = mask.astype(np.uint8)
    p = np.zeros((m.shape[0] + 2, m.shape[1] + 2), dtype=np.uint8)
    p[1:-1, 1:-1] = m
    neigh = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    return mask & (neigh > 0)


MIN_BAND_PX = 3  # ignore line bands thinner than any glyph row could be


def _bands(profile: np.ndarray) -> list[tuple[int, int]]:
    """Contiguous runs of non-zero profile entries → (start, stop) bands."""
    nz = profile > 0
    if not nz.any():
        return []
    diff = np.diff(nz.astype(np.int8))
    starts = list(np.where(diff == 1)[0] + 1)
    stops = list(np.where(diff == -1)[0] + 1)
    if nz[0]:
        starts.insert(0, 0)
    if nz[-1]:
        stops.append(len(profile))
    return list(zip(starts, stops))


_TEMPLATE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _templates_for(ch: int, cw: int) -> np.ndarray:
    """Glyph template stack floor-mapped to cell size (cached per size —
    a handful of sizes occur per image, so this amortizes to ~zero)."""
    key = (ch, cw)
    t = _TEMPLATE_CACHE.get(key)
    if t is None:
        ys = (np.arange(ch) * GLYPH_H // ch).astype(np.int64)
        xs = (np.arange(cw) * GLYPH_W // cw).astype(np.int64)
        t = np.ascontiguousarray(FONT_STACK[:, ys][:, :, xs])  # (n_glyphs, ch, cw)
        _TEMPLATE_CACHE[key] = t
    return t


_PACKED_CACHE: dict[tuple[int, int], tuple[np.ndarray, int]] = {}
_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _packed_templates_for(ch: int, cw: int) -> tuple[np.ndarray, int]:
    """Bit-packed glyph template stack for a cell size: (g, ceil(ch*cw/8))
    uint8 rows + the unpacked bit count. packbits pads the trailing byte
    with zeros on BOTH sides of a comparison, so padding never contributes
    to a hamming distance."""
    key = (ch, cw)
    hit = _PACKED_CACHE.get(key)
    if hit is None:
        t = _templates_for(ch, cw)
        flat = t.reshape(t.shape[0], -1)
        hit = (np.packbits(flat, axis=1), flat.shape[1])
        _PACKED_CACHE[key] = hit
    return hit


LANG_TIEBREAK: dict[str, str] = {
    # M9/-l routing (app.py:567,580,1127): the engine's "language pack" is a
    # per-language template PRIORITY order used to break exact template-score
    # ties. 'eng' is the identity order (FONT_CHARS itself, matching the
    # reference's default -l eng), so default behavior is byte-identical;
    # 'ind' prefers Indonesian letter-frequency order, so an ambiguous glyph
    # resolves differently — observable, tested lang routing.
    "eng": "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.!?,'-",
    "ind": "ANEITRSKDMUGPLBOHYCJFWVZXQ0123456789.!?,'-",
}

_LANG_PERM_CACHE: dict[str, np.ndarray] = {}


def _lang_perm(lang: str | None) -> np.ndarray | None:
    """Template priority permutation for a language ('eng+ind' → primary
    'eng'); None ⇔ identity (no reordering work in the hot loop)."""
    key = (lang or "eng").split("+")[0]
    order = LANG_TIEBREAK.get(key)
    if order is None or order == FONT_CHARS:
        return None
    perm = _LANG_PERM_CACHE.get(key)
    if perm is None:
        idx = {c: i for i, c in enumerate(FONT_CHARS)}
        head = [idx[c] for c in order if c in idx]
        rest = [i for i in range(len(FONT_CHARS)) if i not in set(head)]
        perm = np.array(head + rest, dtype=np.int64)
        _LANG_PERM_CACHE[key] = perm
    return perm


def _match_cells_batch(cells: np.ndarray, conf_cells: np.ndarray,
                       lang: str | None = None
                       ) -> tuple[list[str], list[float]]:
    """Vectorized recognition of equal-size cells via bit-packed XOR +
    popcount: hamming distance to every template in (m, g, bytes) uint8 ops
    — ~8x less memory traffic than the boolean (m, g, ch*cw) equality
    tensor. argmin(hamming) ≡ argmax(agreement) with a first-wins tie-break
    in the LANGUAGE PACK's priority order (identity for 'eng'/default);
    confidence = equal_bits/total_bits, bit-identical to the boolean mean.
    Returns (chars, per-glyph conf scores for non-space cells, in order)."""
    n, ch, cw = cells.shape
    packed_t, nbits = _packed_templates_for(ch, cw)   # (g, W), bits
    nonempty = cells.reshape(n, -1).any(axis=1)
    chars = [" "] * n
    scores: list[float] = []
    if nonempty.any():
        sub = cells[nonempty].reshape(-1, ch * cw)    # (m, bits)
        sub_p = np.packbits(sub, axis=1)              # (m, W)
        ham = _POPCNT[sub_p[:, None, :] ^ packed_t[None, :, :]].sum(
            axis=2, dtype=np.int64)                   # (m, g)
        perm = _lang_perm(lang)
        if perm is None:
            best = np.argmin(ham, axis=1)
        else:
            # argmin over pack-ordered columns → first max-agreement template
            # in the language's priority order
            best = perm[np.argmin(ham[:, perm], axis=1)]
        csub_p = np.packbits(conf_cells[nonempty].reshape(-1, ch * cw), axis=1)
        conf_ham = _POPCNT[csub_p ^ packed_t[best]].sum(axis=1, dtype=np.int64)
        conf = (nbits - conf_ham) / float(nbits)
        j = 0
        for i in range(n):
            if nonempty[i]:
                chars[i] = FONT_CHARS[int(best[j])]
                scores.append(float(conf[j]))
                j += 1
    return chars, scores


def recognize_lines(mask: np.ndarray, conf_img: np.ndarray | None = None,
                    conf_kind: str | None = None,
                    despeckle_conf: bool = False,
                    lang: str | None = None) -> tuple[list[dict], list[float]]:
    """Segment ink mask into lines and recognize each via the glyph grid.

    ``mask`` drives layout analysis and glyph decisions (the engine's own
    Otsu binarization — Tesseract likewise runs page layout analysis on its
    own global binarization regardless of user preprocessing). The routed
    preprocess kernel (M2) supplies the per-glyph confidence evidence (M4):
    it is applied BAND-LOCALLY — ``binarize(conf_img[band], conf_kind)`` per
    text band — so the expensive adaptive-threshold box sums run only over
    text rows, never the full page (margins/gaps are skipped; local-window
    statistics at band edges see the band only, a documented deviation worth
    ~2x less memory traffic). When conf_img is None the layout mask scores
    itself. Returns (lines, glyph_scores); each line dict:
    {text, x, y, width, height}.
    """
    h, w = mask.shape
    mask = despeckle(mask)
    row_profile = mask.sum(axis=1)
    lines: list[dict] = []
    scores: list[float] = []
    for y0, y1 in _bands(row_profile):
        if y1 - y0 < MIN_BAND_PX:
            continue
        band = mask[y0:y1]
        if conf_img is not None and conf_kind is not None:
            conf_band = binarize(conf_img[y0:y1], conf_kind)
            if despeckle_conf:
                # 'accurate' mode (app2.py:353 tessedit_do_invert=0 analog):
                # clean the confidence evidence mask before scoring
                conf_band = despeckle(conf_band)
        else:
            conf_band = band
        col_profile = band.sum(axis=0)
        cols = np.where(col_profile > 0)[0]
        if len(cols) == 0:
            continue
        left, right = int(cols[0]), int(cols[-1])
        line_h = y1 - y0
        s_f = line_h / GLYPH_H          # recovered scale (float)
        pitch = 6.0 * s_f               # char pitch: 5s glyph + 1s gap
        span = right - left + 1
        n_chars = max(1, int(round((span + s_f) / pitch)))
        bounds = []
        for i in range(n_chars):
            x0 = left + int(round(i * pitch))
            x1 = min(left + int(round(i * pitch + 5.0 * s_f)), w)
            bounds.append((x0, x1))
        # batch cells by width (rounding makes widths differ by ±1) and
        # recognize each width-group in one vectorized template reduce
        chars = [" "] * n_chars
        by_width: dict[int, list[int]] = {}
        for i, (x0, x1) in enumerate(bounds):
            by_width.setdefault(x1 - x0, []).append(i)
        line_scores: list[float] = []
        for cw, idxs in by_width.items():
            if cw <= 0:
                continue
            cells = np.stack([band[:, bounds[i][0]:bounds[i][1]] for i in idxs])
            conf_cells = np.stack([conf_band[:, bounds[i][0]:bounds[i][1]] for i in idxs])
            got, sc = _match_cells_batch(cells, conf_cells, lang)
            for i, c in zip(idxs, got):
                chars[i] = c
            line_scores.extend(sc)
        scores.extend(line_scores)
        text = "".join(chars).rstrip()
        lines.append({"text": text, "x": left, "y": int(y0),
                      "width": span, "height": int(line_h)})
    return lines, scores


def group_paragraphs(lines: list[dict]) -> list[list[dict]]:
    """Group lines into paragraphs: a vertical gap > 4.5x the recovered scale
    (normal inter-line gap is 3s, paragraph gap 6s) starts a new paragraph."""
    if not lines:
        return []
    paras: list[list[dict]] = [[lines[0]]]
    for prev, cur in zip(lines, lines[1:]):
        s_f = prev["height"] / GLYPH_H
        gap = cur["y"] - (prev["y"] + prev["height"])
        if gap > 4.5 * s_f:
            paras.append([cur])
        else:
            paras[-1].append(cur)
    return paras


def region_filter(x: int, y: int, w: int, h: int, img_w: int, img_h: int) -> bool:
    """M8 region filter: area ∈ (0.001·WH, 0.8·WH), aspect 0.1 < w/h < 10
    (app.py:867-883). Applied to paragraph bounding boxes."""
    area = w * h
    wh = img_w * img_h
    if not (wh * 0.001 < area < wh * 0.8):
        return False
    if h == 0:
        return False
    return 0.1 < w / h < 10


def detect_columns(paragraph_bounds: list[tuple[int, int, int, int]], img_w: int) -> list[int]:
    """M8 column detection (app.py:916-944): sort by x, boundary where the
    x-gap between consecutive sorted x's exceeds 10% of width, each paragraph
    assigned to the nearest boundary. Returns column index per paragraph."""
    if not paragraph_bounds:
        return []
    xs = [b[0] for b in paragraph_bounds]
    sorted_x = sorted(xs)
    boundaries = [sorted_x[0]]
    for prev, cur in zip(sorted_x, sorted_x[1:]):
        if cur - prev > img_w * 0.1:
            boundaries.append(cur)
    cols = []
    for x in xs:
        distances = [abs(x - cb) for cb in boundaries]
        cols.append(distances.index(min(distances)))
    return cols


def extract_image(img: np.ndarray, preprocess_kind: str = "balanced",
                  max_dim: int = 1200, do_deskew: bool = True,
                  ocr_mode: str = "standard", lang: str | None = None) -> dict:
    """Full image pipeline. Returns
    {text, confidence, paragraphs:[{text,x,y,width,height,column}], width, height}.
    Paragraph text = its lines joined with a single space; document text =
    paragraph texts joined with "\\n\\n" (app.py:791 separator).

    ``ocr_mode`` is the M3 engine-config routing (app2.py:345-353):
    - fast ('--oem 0 --psm 6'): no deskew search, and confidence evidence is
      the layout mask itself — the routed preprocess kernel is skipped;
    - standard ('--oem 1 --psm 3'): deskew iff ``do_deskew``, band-local
      confidence evidence from the routed kernel (round-1 behavior);
    - accurate (adds tessedit_do_invert=0): deskew always, and the
      confidence evidence mask is despeckled before scoring.
    ``lang`` routes the recognizer's language pack (tie-break priority;
    'eng' default is the identity order — see LANG_TIEBREAK)."""
    img = optimize_image(img, max_dim)
    if ocr_mode == "fast":
        eff_deskew = False
    elif ocr_mode == "accurate":
        eff_deskew = True
    else:
        eff_deskew = do_deskew
    if eff_deskew:
        img, _ = deskew(img)
    # Layout + decisions on the engine's own Otsu mask; the routed preprocess
    # kernel contributes band-local confidence evidence (see recognize_lines).
    layout_mask = binarize(img, "default")
    h, w = layout_mask.shape
    if ocr_mode == "fast" or preprocess_kind == "default":
        lines, scores = recognize_lines(layout_mask, lang=lang)
    else:
        lines, scores = recognize_lines(
            layout_mask, img, preprocess_kind,
            despeckle_conf=(ocr_mode == "accurate"), lang=lang)
    paras_lines = group_paragraphs(lines)
    paragraphs: list[dict] = []
    for group in paras_lines:
        x0 = min(l["x"] for l in group)
        y0 = min(l["y"] for l in group)
        x1 = max(l["x"] + l["width"] for l in group)
        y1 = max(l["y"] + l["height"] for l in group)
        if not region_filter(x0, y0, x1 - x0, y1 - y0, w, h):
            continue
        text = " ".join(l["text"] for l in group if l["text"]).strip()
        if not text:
            continue
        paragraphs.append({"text": text, "x": int(x0), "y": int(y0),
                           "width": int(x1 - x0), "height": int(y1 - y0)})
    cols = detect_columns([(p["x"], p["y"], p["width"], p["height"]) for p in paragraphs], w)
    for p, c in zip(paragraphs, cols):
        p["column"] = int(c)
    text = "\n\n".join(p["text"] for p in paragraphs)
    confidence = (100.0 * sum(scores) / len(scores)) if scores else 80.0
    return {"text": text, "confidence": confidence, "paragraphs": paragraphs,
            "width": int(w), "height": int(h)}
