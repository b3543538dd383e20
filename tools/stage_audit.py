"""Per-stage wall-time audit for any queries() entry: runs the query,
prints the Ray Data `ds.stats()` operator breakdown (the measure-don't-
guess loop: a stage dominated by anything but useful compute is wrong).

Usage: python tools/stage_audit.py <query> [sf_dir] [num_cpus]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    query = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    res = entry.queries()[query](sf_dir)
    if hasattr(res, "stats"):
        res = res.materialize()
        print(res.stats())
    else:
        print(f"{query} returned {type(res).__name__} (no Dataset stats; "
              "bounded driver-side result)")
    ray.shutdown()


if __name__ == "__main__":
    main()
