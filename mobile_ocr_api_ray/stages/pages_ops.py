"""Doc→pages explode + ordered doc reassembly (SURVEY.md §2.2 M6 / §2.5 G3).

The reference loops PDF pages inside one request and joins their texts with
"\\n\\n" in page order (app.py:755-795). At scale that becomes two
operators:

- ``explode_pdf_pages``: one input row per document → one output row per
  page ``(url, page, total_pages, page_payload)`` — a flat_map-shaped
  map_batches (rows out ≥ rows in) so page-level extraction parallelizes
  across the cluster even when one doc has thousands of pages.
- ``reassemble_docs``: groupby(url) with an EXPLICIT sort on ``page``
  inside each group before the "\\n\\n" join — document text never depends
  on block arrival order (SURVEY.md §7 ordering rule). Per-doc confidence
  uses the reference's zero-exclusion mean (G2, app.py:756-792).

Equivalence with the flagship's inline per-row page loop is asserted in
tests (same text, same confidence).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.textproc import join_pages
from . import glyphs


def explode_pdf_pages(batch: pa.Table) -> pa.Table:
    """PDFX rows → per-page rows; non-PDF rows pass through as page 0 with
    their original payload."""
    urls = batch["url"].to_pylist()
    payloads = batch["html"].to_pylist()
    langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [None] * len(urls)
    o_url, o_page, o_total, o_payload, o_lang = [], [], [], [], []
    for u, p, l in zip(urls, payloads, langs):
        if p is not None and p[:4] == glyphs.PDFX_MAGIC:
            pages = glyphs.decode_pdfx(p)
            for i, pg in enumerate(pages):
                o_url.append(u)
                o_page.append(i)
                o_total.append(len(pages))
                o_payload.append(pg)
                o_lang.append(l)
        else:
            o_url.append(u)
            o_page.append(0)
            o_total.append(1)
            o_payload.append(p)
            o_lang.append(l)
    return pa.table({
        "url": pa.array(o_url, pa.string()),
        "page": pa.array(o_page, pa.int32()),
        "total_pages": pa.array(o_total, pa.int32()),
        "html": pa.array(o_payload, pa.binary()),
        "lang": pa.array(o_lang, pa.string()),
    })


def reassemble_docs(page_results):
    """(url, page, page_text, page_confidence) rows → one row per url with
    page texts joined in explicit page order and zero-excluded mean
    confidence (G2)."""
    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("page")
        texts = g["page_text"].fillna("").tolist()
        confs = [c for c in g["page_confidence"].tolist() if c and c > 0]
        return pd.DataFrame([{
            "url": g["url"].iloc[0],
            "extracted_text": join_pages(texts),
            "total_pages": int(g["total_pages"].iloc[0]),
            "confidence": (sum(confs) / len(confs)) if confs else 0.0,
        }])

    return page_results.groupby("url").map_groups(join_group, batch_format="pandas")
