"""M9 — quality/mode routing as vectorized Arrow columns (SURVEY.md §2.2 M9).

The reference maps the request-level ``quality`` parameter to a preprocess
kernel, an OCR mode, and image-downscale parameters via inline conditionals
(app2.py:551-558 preprocess/mode routing, app2.py:215-223 resize tiers,
app2.py:844-845 validation defaulting to 'medium'). Here that becomes one
table-driven projection applied per batch, emitting ``preprocess_kind`` /
``ocr_mode`` / ``max_dim`` / ``jpeg_quality`` columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# quality -> (preprocess_kind, ocr_mode, max_dim, jpeg_quality)
# preprocess/mode: app2.py:551-558; max_dim/jpeg_quality: app2.py:215-223.
# 'v1' is the v1 API's single default tier: Gaussian+Otsu preprocess
# (app.py:550-556), 1500 px cap / q85 (app.py:323) — D3 parity.
QUALITY_PARAMS: dict[str, tuple[str, str, int, int]] = {
    "low": ("fast", "fast", 800, 75),
    "medium": ("balanced", "standard", 1200, 85),
    "high": ("quality", "accurate", 2000, 90),
    "v1": ("default", "standard", 1500, 85),
}

_VALID = frozenset(QUALITY_PARAMS)


def route_quality(quality: str) -> tuple[str, str, int, int]:
    """Scalar routing with the reference's validation default (app2.py:844-845)."""
    if quality not in _VALID:
        quality = "medium"
    return QUALITY_PARAMS[quality]


def add_routing_columns(batch: pa.Table, quality_col: str = "quality") -> pa.Table:
    """Vectorized projection: append preprocess_kind / ocr_mode / max_dim /
    jpeg_quality columns derived from ``quality`` (or constant 'medium' when
    the column is absent)."""
    n = batch.num_rows
    if quality_col in batch.column_names:
        q = batch[quality_col].to_numpy(zero_copy_only=False)
        q = np.array([x if x in _VALID else "medium" for x in q], dtype=object)
    else:
        q = np.full(n, "medium", dtype=object)
    pk = np.array([QUALITY_PARAMS[x][0] for x in q], dtype=object)
    om = np.array([QUALITY_PARAMS[x][1] for x in q], dtype=object)
    md = np.array([QUALITY_PARAMS[x][2] for x in q], dtype=np.int32)
    jq = np.array([QUALITY_PARAMS[x][3] for x in q], dtype=np.int32)
    batch = batch.append_column("preprocess_kind", pa.array(pk, type=pa.string()))
    batch = batch.append_column("ocr_mode", pa.array(om, type=pa.string()))
    batch = batch.append_column("max_dim", pa.array(md, type=pa.int32()))
    batch = batch.append_column("jpeg_quality", pa.array(jq, type=pa.int32()))
    return batch


def supported_languages() -> list[str]:
    """S8 — the languages source. The reference shells out
    ``tesseract --list-langs`` and strips the header (app.py:2130-2153);
    the engine's supported set is static config: the language-ID profiles
    plus the reference's documented default ('eng') and mixed mode
    ('eng+ind', README.md:98)."""
    from ..stages.text_analysis import LANG_PROFILES

    return sorted(set(LANG_PROFILES) | {"eng+ind"})
