"""Size-thresholded dimension broadcast — the knn_graph-cap convention
(stages/similarity.py:331) applied to dimension⨝fact joins.

In TPC-H the "dimension" tables customer / supplier / part grow linearly
with scale factor: at the 100-TB target they are tens of GB, and a driver-
side ``pq.read_table`` + ``ray.put`` broadcast (the round-3 shape in
pipelines/relational.py / pipelines/analytics.py) is a driver OOM plus a
single-node read bottleneck. This module gives every dimension join a
two-route front door:

- **small route** (row count ≤ cap): a Ray TASK reads (and optionally
  composes) the dimension table and returns it — the driver only ever
  holds the ``ObjectRef``, never the bytes. Row counts come from parquet
  FOOTERS (``pq.ParquetFile(...).metadata.num_rows``) — metadata-only,
  no data pages touched on the driver.
- **big route** (row count > cap): ``broadcast_dim`` returns ``None`` and
  the caller must fall through to the co-partitioned
  ``stages/joins.hash_join`` (both sides shuffle once, neither
  materializes anywhere).

The cap default (2M rows) matches the knn_graph index cap: a 2M-row
dimension of a few short columns is ~100 MB in the object store — cheap to
broadcast, far below worker heap. Callers expose ``broadcast_cap_rows``
so tests pin the routing threshold and differential-test both routes on
the same input (tests/test_operators.py::TestDimBroadcastRouting).

``region`` / ``nation`` are bounded at 5 / 25 rows at ANY scale factor
(TPC-H spec) — chains that compose them onto a scale-growing table
(supplier→nation→region) broadcast the bounded part unconditionally and
route only on the growing side.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray

# ~100 MB of short-column rows in the object store; same order as the
# knn_graph index cap (stages/similarity.py).
DIM_BROADCAST_CAP_ROWS = 2_000_000


def parquet_num_rows(path: str) -> int:
    """Row count from the parquet footer only (no data pages)."""
    return pq.ParquetFile(path).metadata.num_rows


@ray.remote(num_cpus=1)
def _load_dim_task(specs, joins, select):
    """Read + compose dimension tables INSIDE a Ray task.

    specs: [(path, [columns...]), ...]; the first is the left table and
    each subsequent one left-joins onto the running result via the
    matching (keys, right_keys) pair in ``joins`` (inner join — dimension
    chains are FK-complete). ``select`` projects the final columns.
    Returns a combined single-chunk Arrow table; the task's return value
    lands in the object store, so the caller-side ObjectRef IS the
    broadcast (no ray.put, no driver copy)."""
    import pyarrow.parquet as _pq

    tabs = [_pq.read_table(p, columns=list(c)) for p, c in specs]
    t = tabs[0]
    for right, (keys, right_keys) in zip(tabs[1:], joins or []):
        t = t.join(right, keys=list(keys), right_keys=list(right_keys),
                   join_type="inner")
    if select:
        t = t.select(list(select))
    return t.combine_chunks()


def should_broadcast(path: str, cap_rows: "int | None" = None) -> bool:
    """ONE home for the routing rule: footer row count ≤ cap → broadcast
    route; else hash_join route. Callers that build their own broadcast
    payload (filtered key sets, block-ref concatenations) share this
    instead of re-implementing the cap resolution inline."""
    cap = DIM_BROADCAST_CAP_ROWS if cap_rows is None else cap_rows
    return parquet_num_rows(path) <= cap


def shuffle_probe_join(probe_ds, dim_ds, left_key: str, right_key: str,
                       out_cols):
    """The shuffle-route join shape every size-routed dimension query
    falls back to past the cap: co-partitioned stages/joins.hash_join of
    the fact-side probe against the dimension Dataset, projected to the
    query's output columns — one home so the join convention can't drift
    between the sibling queries."""
    from .joins import hash_join

    return hash_join(probe_ds, dim_ds, left_key, right_key) \
        .select_columns(list(out_cols))


def broadcast_dim(specs, joins=None, select=None, *, cap_rows=None):
    """Route decision + Ray-task load for a (possibly composed) dimension.

    Returns an ``ObjectRef`` to the composed Arrow table when every input
    table's footer row count is ≤ cap, else ``None`` — the caller's signal
    to take the ``stages/joins.hash_join`` route. The driver never reads a
    data page either way."""
    if not all(should_broadcast(p, cap_rows) for p, _ in specs):
        return None
    return _load_dim_task.remote(specs, joins, select)
