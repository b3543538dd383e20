"""Deterministic 5x7 glyph font + bitmap text renderer (corpus side).

The sandbox has no Tesseract and no real font rasterizer, and the engine's
correctness invariant is byte-identical text (BASELINE.json), so image
payloads use a self-contained deterministic glyph raster: each character maps
to a fixed 5x7 bit pattern derived from a salted SHA-256 of the character
(patterns are abstract, not letterforms — recognition is template matching
against the same table, which is exactly the structure of a
segment-then-classify OCR engine). FIXTURES.md §1 "image payload" rule.

Invariants enforced at import:
- every non-space glyph has ink in row 0, row 6, col 0 and col 4, so line
  bands and char cells recovered from projection profiles equal the true
  glyph grid;
- pairwise Hamming distance between glyphs >= 8 of 35 bits, so template
  matching has margin under mild distortion (resize/rotation).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

GLYPH_H, GLYPH_W = 7, 5
CHARSET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.!?,'- "  # space must be last
INK, BG = 0, 255  # dark text on white background
NOISE_GRAY = 200  # light specks — removed by every binarization kernel


def _glyph_bits(char: str, salt: int) -> np.ndarray:
    digest = hashlib.sha256(f"glyph:{char}:{salt}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    # force ink on the cell border rows/cols so profiles recover the grid
    g[0, 0] = g[0, GLYPH_W - 1] = g[GLYPH_H - 1, 0] = g[GLYPH_H - 1, GLYPH_W - 1] = True
    return g


def _build_font() -> dict[str, np.ndarray]:
    salt = 0
    while True:
        font = {c: _glyph_bits(c, salt) for c in CHARSET if c != " "}
        flat = {c: g.flatten() for c, g in font.items()}
        chars = list(flat)
        ok = True
        for i in range(len(chars)):
            for j in range(i + 1, len(chars)):
                if int(np.sum(flat[chars[i]] != flat[chars[j]])) < 8:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            font[" "] = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
            return font
        salt += 1


FONT: dict[str, np.ndarray] = _build_font()
# index order for vectorized template matching (space excluded — detected by emptiness)
FONT_CHARS: str = "".join(c for c in CHARSET if c != " ")
FONT_STACK: np.ndarray = np.stack([FONT[c] for c in FONT_CHARS])  # (n_glyphs, 7, 5) bool


def render_text(lines: list[str], scale: int = 3, margin: int = 6,
                para_breaks: set[int] | None = None) -> np.ndarray:
    """Render text lines to a uint8 grayscale image (255 bg, 0 ink).

    Geometry: glyph box 5s x 7s, char pitch 6s, line pitch 10s; a paragraph
    break before line i (i in para_breaks) doubles the inter-line gap
    (13s pitch) so the recognizer's gap rule can recover paragraphs.
    """
    s = scale
    para_breaks = para_breaks or set()
    max_chars = max((len(ln) for ln in lines), default=0)
    width = 2 * margin + max(1, max_chars * 6 * s - s)
    y_tops = []
    y = margin
    for i in range(len(lines)):
        if i > 0:
            y += 10 * s if i not in para_breaks else 13 * s
        y_tops.append(y)
    height = (y_tops[-1] if y_tops else margin) + 7 * s + margin
    img = np.full((height, width), BG, dtype=np.uint8)
    for ln, y0 in zip(lines, y_tops):
        for k, ch in enumerate(ln):
            g = FONT.get(ch)
            if g is None or ch == " ":
                continue
            x0 = margin + k * 6 * s
            tile = np.repeat(np.repeat(g, s, axis=0), s, axis=1)
            region = img[y0:y0 + 7 * s, x0:x0 + 5 * s]
            region[tile] = INK
    return img


def add_noise(img: np.ndarray, n_specks: int, seed: int) -> np.ndarray:
    """Sprinkle light-gray specks on background pixels (deterministic)."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    out = img.copy()
    h, w = out.shape
    ys = rng.randint(0, h, size=n_specks)
    xs = rng.randint(0, w, size=n_specks)
    mask = out[ys, xs] == BG
    out[ys[mask], xs[mask]] = NOISE_GRAY
    return out


def rotate_nn(img: np.ndarray, degrees: float, fill: int = BG) -> np.ndarray:
    """Nearest-neighbor rotation about the image center (deterministic)."""
    if degrees == 0.0:
        return img
    h, w = img.shape
    theta = np.deg2rad(degrees)
    cos, sin = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ys = cos * (yy - cy) + sin * (xx - cx) + cy
    xs = -sin * (yy - cy) + cos * (xx - cx) + cx
    ysr = np.rint(ys).astype(np.int64)
    xsr = np.rint(xs).astype(np.int64)
    valid = (ysr >= 0) & (ysr < h) & (xsr >= 0) & (xsr < w)
    out = np.full_like(img, fill)
    out[yy[valid], xx[valid]] = img[ysr[valid], xsr[valid]]
    return out


# ---- IMGX payload container: b"IMGX" + u16be height + u16be width + pixels ----

IMGX_MAGIC = b"IMGX"


def encode_imgx(img: np.ndarray) -> bytes:
    h, w = img.shape
    return IMGX_MAGIC + struct.pack(">HH", h, w) + img.astype(np.uint8).tobytes()


def decode_imgx(payload: bytes) -> np.ndarray:
    if payload[:4] != IMGX_MAGIC:
        raise ValueError("not an IMGX payload")
    h, w = struct.unpack(">HH", payload[4:8])
    return np.frombuffer(payload[8:8 + h * w], dtype=np.uint8).reshape(h, w)


# ---- PDFX payload container: b"PDFX" + u32be n_pages + [u32be len + page]* ----

PDFX_MAGIC = b"PDFX"


def encode_pdfx(pages: list[bytes]) -> bytes:
    out = [PDFX_MAGIC, struct.pack(">I", len(pages))]
    for p in pages:
        out.append(struct.pack(">I", len(p)))
        out.append(p)
    return b"".join(out)


def decode_pdfx(payload: bytes) -> list[bytes]:
    if payload[:4] != PDFX_MAGIC:
        raise ValueError("not a PDFX payload")
    (n,) = struct.unpack(">I", payload[4:8])
    pages, off = [], 8
    for _ in range(n):
        (ln,) = struct.unpack(">I", payload[off:off + 4])
        off += 4
        pages.append(payload[off:off + ln])
        off += ln
    return pages
