"""Distributed top-k finisher — replaces ``.sort(cols).limit(k)`` finals.

A global ``Dataset.sort`` is an all-to-all range exchange: at 100 TB even a
post-aggregation table ("one row per orderkey") is billions of rows moved
to keep 10. Top-k needs none of that: each block can only contribute rows
that are in its OWN top k, so a per-batch partial top-k (the same combiner
idea as the Misra-Gries heavy-hitter and host-cap samplers in
pipelines/analysis.py) prunes every block to ≤ k rows, and the driver
merges the bounded leftovers — k × num_blocks rows, a few thousand at any
scale — with one in-memory Arrow sort.

Determinism: callers must pass a TOTAL order (tie-broken sort keys, the
repo-wide convention — e.g. (revenue DESC, c_custkey ASC)); under a total
order partial-top-k + merge is exactly the global sort's first k rows.

Returns a ``pa.Table`` (bounded by construction), which keeps the
``.to_pandas()`` call sites working unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def topk_table(ds, sort_keys, k: int) -> pa.Table:
    """First ``k`` rows of ``ds`` under ``sort_keys`` (a total order).

    sort_keys: [(column, 'ascending' | 'descending'), ...] — pyarrow
    sort_indices convention. The distributed pass prunes each batch to its
    local top-k; the driver merge sees only the ≤ k survivors per block."""
    keys = [(c, o) for c, o in sort_keys]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=keys)[:k]
        return batch.take(idx)

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    tabs = ray.get(pruned.to_arrow_refs())
    merged = pa.concat_tables(tabs, promote_options="default")
    idx = pc.sort_indices(merged, sort_keys=keys)[:k]
    return merged.take(idx).combine_chunks()
