"""THE string routing hash every coarse shuffle shares: zlib.crc32 of the
UTF-8 bytes, vectorized across rows.

Every bucketed exchange in the engine (stages/joins, stages/crawl,
stages/linkgraph, stages/dedup, pipelines/analysis) routes string keys by
``crc32(key) % n_coarse``. The reference form — ``np.fromiter(
(zlib.crc32(s.encode()) for s in col.to_pylist()), ...)`` — pays one
Python-level call + encode per ROW; on a 1M-row batch that is ~1s of pure
interpreter overhead in the hot path. This module computes the identical
values with a table-driven CRC update vectorized across rows: one numpy
pass per BYTE POSITION over all still-active rows (rows sorted by length
descending so the active set is always a prefix — no per-step masks).
Rows longer than ``_VECTOR_MAX_LEN`` fall back to zlib per row; the
position loop only wins while lengths are url/key-like, and a single
pathological 1 MB key must not force a million numpy passes.

Numerical contract: bit-identical to ``zlib.crc32(s.encode())`` for every
string (pinned by tests/test_kernels.py::TestCrc32Vectorized against
random unicode, empty, long and null inputs, plus chunked and sliced
arrays). Micro-bench: tools/bench_crc32.py.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

_VECTOR_MAX_LEN = 256


def _make_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & np.uint32(1),
                     np.uint32(0xEDB88320) ^ (t >> np.uint32(1)),
                     t >> np.uint32(1))
    return t


_TABLE = _make_table()


def crc32_of_strings(values, null_value: int = 0) -> np.ndarray:
    """int64 array of zlib.crc32(s.encode()) per element; nulls →
    ``null_value``. Accepts pa.Array / pa.ChunkedArray / pandas Series /
    list / numpy object array."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        values = pa.array(values, type=pa.string(), from_pandas=True)
    arr = values.cast(pa.large_string())
    n = len(arr)
    out = np.full(n, null_value, np.int64)
    if n == 0:
        return out
    offs = np.frombuffer(arr.buffers()[1], np.int64,
                         count=n + 1, offset=arr.offset * 8)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    starts = offs[:-1].astype(np.int64)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    valid = (np.ones(n, bool) if arr.null_count == 0
             else ~np.asarray(arr.is_null()))
    vec = valid & (lens <= _VECTOR_MAX_LEN)
    for i in np.flatnonzero(valid & ~vec):
        s = int(starts[i])
        out[i] = zlib.crc32(data[s:s + int(lens[i])].tobytes())
    idx = np.flatnonzero(vec)
    if len(idx) == 0:
        return out
    # length-descending order → rows still active at byte position p are
    # exactly the first `na` entries: no per-position boolean masks
    order = np.argsort(-lens[idx], kind="stable")
    idx = idx[order]
    ln = lens[idx]
    st = starts[idx]
    crc = np.full(len(idx), 0xFFFFFFFF, np.uint32)
    neg_ln = -ln  # ascending; count(ln > p) = searchsorted(neg_ln, -p)
    for p in range(int(ln[0]) if len(ln) else 0):
        na = int(np.searchsorted(neg_ln, -p, side="left"))
        if na == 0:
            break
        b = data[st[:na] + p]
        crc[:na] = _TABLE[(crc[:na] ^ b) & np.uint32(0xFF)] \
            ^ (crc[:na] >> np.uint32(8))
    out[idx] = (crc ^ np.uint32(0xFFFFFFFF)).astype(np.int64)
    return out


def str_coarse(values, nc: int, null_value: int = 0) -> np.ndarray:
    """int32 coarse-shuffle bucket ``crc32(key) % nc`` per element (nulls
    hash as ``null_value`` — 0 == crc32(b'') reproduces the pervasive
    ``(s or '')`` convention)."""
    return (crc32_of_strings(values, null_value=null_value)
            % np.int64(nc)).astype(np.int32)
