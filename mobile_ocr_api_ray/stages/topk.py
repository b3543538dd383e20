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


def topk_table(ds, sort_keys, k: int, batch_size: int = 65536) -> pa.Table:
    """First ``k`` rows of ``ds`` under ``sort_keys`` (a total order).

    sort_keys: [(column, 'ascending' | 'descending'), ...] — pyarrow
    sort_indices convention. The distributed pass prunes each batch to its
    local top-k; the driver merge sees only the ≤ k survivors per batch.

    ``batch_size`` (default 64k) makes Ray COALESCE upstream blocks into
    few large pruning batches: a post-aggregation dataset is typically
    hundreds of tiny blocks, and one pruning task per tiny block would
    cost more in dispatch than the sort it replaces (measured on the Q3
    top-k: per-block pruning 5.2 s vs 2.6 s for the global sort it was
    meant to beat; coalesced pruning wins on both counts)."""
    keys = [(c, o) for c, o in sort_keys]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.sort_indices(batch, sort_keys=keys)[:k]
        return batch.take(idx)

    pruned = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=batch_size)
    # STREAMING consumption: iter_batches keeps the executor pipelined
    # (measured on the Q3 top-k: to_arrow_refs() materializes and costs
    # ~2x the whole query; iter_batches matches the global sort's wall
    # time while moving only ≤ k rows per pruned batch to the driver)
    tabs = list(pruned.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tabs:
        # empty corpus: return a typed empty table when the lineage still
        # carries a schema; a fully schema-eroded empty lineage (token-free
        # corpus through a groupby — the documented erosion trap) degrades
        # to a 0-column empty table, matching the old sort().limit() path
        # so callers' own emptiness guards still fire
        try:
            sch = pruned.schema(fetch_if_missing=False)
            base = getattr(sch, "base_schema", None)
            if base is not None and base.names:
                return base.empty_table()
        except Exception:
            pass
        return pa.table({})
    merged = pa.concat_tables(tabs, promote_options="default")
    idx = pc.sort_indices(merged, sort_keys=keys)[:k]
    return merged.take(idx).combine_chunks()
