"""Micro-bench: vectorized crc32 routing (str_hash.crc32_of_strings) vs
the per-row ``np.fromiter((zlib.crc32(s.encode()) ...))`` reference form
on a 1M-row url batch — the shape every coarse shuffle routes.

Usage: python tools/bench_crc32.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobile_ocr_api_ray.str_hash import crc32_of_strings  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.RandomState(7)
    urls = [f"https://host{i % 9973}.example.com/path/{rng.randint(1e9)}"
            f"?q={rng.randint(1e6)}" for i in range(n)]
    arr = pa.array(urls, pa.string())

    t0 = time.perf_counter()
    ref = np.fromiter((zlib.crc32(s.encode()) for s in arr.to_pylist()),
                      np.int64, len(arr))
    t_ref = time.perf_counter() - t0

    t0 = time.perf_counter()
    vec = crc32_of_strings(arr)
    t_vec = time.perf_counter() - t0

    assert (ref == vec).all()
    print(f"rows={n}  per-row zlib loop: {t_ref:.3f}s  "
          f"vectorized: {t_vec:.3f}s  speedup: {t_ref / t_vec:.2f}x")


if __name__ == "__main__":
    main()
