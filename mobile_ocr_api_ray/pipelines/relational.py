"""Relational & windowed operators over the driver-provided TPC-H-ish tables
— groupby / join / sort / limit / windowed-aggregate coverage with DuckDB-
checkable semantics.

Bit-exact float aggregation: currency-like doubles carry <= N decimal
digits, so each side converts to integer units per row
(``int(round(x * 10^N))`` — exact), sums as int64 (associative, order-
independent, no float drift under any partitioning), and divides back once
at the end. The SQL oracles use the same construction, making sums
bit-identical regardless of shuffle order — the float-determinism analog of
the engine's byte-identical text invariant.

Scale patterns demonstrated:
- partial pre-aggregation inside map_batches before the (tiny) groupby
  (lineitem_pricing) — the combiner pattern from SURVEY.md §4;
- broadcast hash join: dimension side via ray.put, probe inside map_batches
  (top_customers, nation_order_stats) — no shuffle;
- event-time windowing as vectorized truncation + groupby (events_hourly)
  and order-dependent sessionization inside groupby(user).map_groups
  (sessionize_events), ordering key (ts, event_id) stated explicitly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from . import reads


def _cents(arr, scale: int = 100) -> pa.Array:
    """Exact integer units: int64(round(x * scale)) per row."""
    return pc.cast(pc.round(pc.multiply(pc.cast(arr, pa.float64()), float(scale)), 0), pa.int64())


def _pq(sf_dir: str, name: str, columns=None, filter=None):
    # size-aware block override for small files (shared heuristic —
    # see pipelines/reads.py); relational tables get coarser 4k-row blocks
    # since their per-row kernels are lighter than text extraction.
    # ``filter`` pushes a pyarrow dataset expression into the scan
    # (row-group pruning at scale); shared with pipelines/analytics.py.
    return reads.read_small_aware(os.path.join(sf_dir, f"{name}.parquet"),
                                  columns=columns, rows_per_block=4000,
                                  filter=filter)


def _rev_cents(batch: pa.Table, scale: int = 10000) -> pa.Array:
    """Discounted revenue l_extendedprice*(1-l_discount) as exact integer
    10^-4 units — ONE home for the float-parity-critical expression tree
    mirrored by every revenue oracle's
    sum(cast(round(l_extendedprice*(1.0-l_discount)*10000, 0) AS BIGINT))."""
    return _cents(pc.multiply(
        pc.cast(batch["l_extendedprice"], pa.float64()),
        pc.subtract(pa.scalar(1.0), pc.cast(batch["l_discount"], pa.float64()))),
        scale)


def lineitem_pricing(sf_dir: str):
    """TPC-H Q1-flavored pricing summary with partial pre-aggregation.

    Per batch: aggregate to one row per (returnflag, linestatus) — the
    combiner; then a groupby over ~tens of partial rows per block instead of
    600k raw rows. Output: sum_qty, sum_base_price, sum_disc_price, n_rows,
    avg_qty — integer-cent sums divided back at the end."""

    def partial(batch: pa.Table) -> pa.Table:
        qty_c = _cents(batch["l_quantity"])
        base_c = _cents(batch["l_extendedprice"])
        disc_price = pc.multiply(
            pc.cast(batch["l_extendedprice"], pa.float64()),
            pc.subtract(pa.scalar(1.0), pc.cast(batch["l_discount"], pa.float64())))
        disc_c = _cents(disc_price, 10000)
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": qty_c, "base_c": base_c, "disc_c": disc_c,
        })
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_c=("qty_c", "sum"), base_c=("base_c", "sum"),
            disc_c=("disc_c", "sum"), n_rows=("qty_c", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = _pq(sf_dir, "lineitem",
                   ["l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="qty_c"), Sum("base_c", alias_name="base_c"),
        Sum("disc_c", alias_name="disc_c"), Sum("n_rows", alias_name="n_rows"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pc.divide(pc.cast(batch["qty_c"], pa.float64()), 100.0),
            "sum_base_price": pc.divide(pc.cast(batch["base_c"], pa.float64()), 100.0),
            "sum_disc_price": pc.divide(pc.cast(batch["disc_c"], pa.float64()), 10000.0),
            "n_rows": batch["n_rows"],
            "avg_qty": pc.divide(pc.cast(batch["qty_c"], pa.float64()),
                                 pc.multiply(pc.cast(batch["n_rows"], pa.float64()), 100.0)),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"])


def top_customers(sf_dir: str, k: int = 10, broadcast_cap_rows: int | None = None):
    """orders ⨝ customer → per-customer revenue → top-k.

    Join routing (stages/dim_broadcast): customer grows linearly with
    scale factor, so below the row cap a Ray task loads it into the object
    store ONCE (driver holds only the ObjectRef) and each map task probes
    it with an acero hash join; above the cap both sides take the
    co-partitioned stages/joins.hash_join — identical output either way
    (pinned by tests/test_operators.py::TestDimBroadcastRouting).

    The top-k final is the distributed partial-top-k finisher
    (stages/topk) — no global sort to keep k rows."""
    from ..stages.dim_broadcast import broadcast_dim
    from ..stages.joins import hash_join
    from ..stages.topk import topk_table

    cust_ref = broadcast_dim(
        [(os.path.join(sf_dir, "customer.parquet"), ["c_custkey", "c_name"])],
        cap_rows=broadcast_cap_rows)

    if cust_ref is not None:
        def join_orders(batch: pa.Table) -> pa.Table:
            # Vectorized probe: Arrow acero hash join against the broadcast
            # dimension table (read from the object store, never re-shipped).
            probe = pa.table({"c_custkey": batch["o_custkey"],
                              "price_c": _cents(batch["o_totalprice"])})
            return probe.join(ray.get(cust_ref), keys=["c_custkey"],
                              join_type="inner")

        joined = (_pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
                  .map_batches(join_orders, batch_format="pyarrow"))
    else:
        probe = (_pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
                 .map_batches(
                     lambda b: pa.table({"c_custkey": b["o_custkey"],
                                         "price_c": _cents(b["o_totalprice"])}),
                     batch_format="pyarrow"))
        cust_ds = _pq(sf_dir, "customer", ["c_custkey", "c_name"])
        joined = hash_join(probe, cust_ds, "c_custkey", "c_custkey")

    per_cust = (joined.groupby(["c_custkey", "c_name"])
                .aggregate(Sum("price_c", alias_name="price_c"),
                           Count(alias_name="n_orders")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"], "c_name": batch["c_name"],
            "revenue": pc.divide(pc.cast(batch["price_c"], pa.float64()), 100.0),
            "n_orders": batch["n_orders"]})

    return topk_table(per_cust.map_batches(finalize, batch_format="pyarrow"),
                      [("revenue", "descending"), ("c_custkey", "ascending")],
                      k)


def nation_order_stats(sf_dir: str, broadcast_cap_rows: int | None = None):
    """customer ⨝ nation composed lookup, then orders groupby nation name:
    n_orders + revenue.

    Join routing (stages/dim_broadcast): nation is bounded (25 rows at any
    scale factor) but customer grows. Below the cap a Ray TASK composes
    (c_custkey → n_name) and the driver holds only the ObjectRef; above it,
    nation broadcasts onto the customer SCAN (map_batches probe) and the
    composed dimension meets orders through the co-partitioned
    stages/joins.hash_join — no driver materialization on either route."""
    from ..stages.dim_broadcast import broadcast_dim, shuffle_probe_join

    ref = broadcast_dim(
        [(os.path.join(sf_dir, "customer.parquet"), ["c_custkey", "c_nationkey"]),
         (os.path.join(sf_dir, "nation.parquet"), ["n_nationkey", "n_name"])],
        joins=[(["c_nationkey"], ["n_nationkey"])],
        select=["c_custkey", "n_name"],
        cap_rows=broadcast_cap_rows)

    if ref is not None:
        def tag(batch: pa.Table) -> pa.Table:
            probe = pa.table({"c_custkey": batch["o_custkey"],
                              "price_c": _cents(batch["o_totalprice"])})
            return (probe.join(ray.get(ref), keys=["c_custkey"], join_type="inner")
                    .select(["n_name", "price_c"]))

        tagged = (_pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
                  .map_batches(tag, batch_format="pyarrow"))
    else:
        # nation stays a broadcast at ANY scale (25 rows); only the
        # scale-growing customer⨝orders leg takes the shuffle join.
        nation_ref = broadcast_dim(
            [(os.path.join(sf_dir, "nation.parquet"),
              ["n_nationkey", "n_name"])])

        def compose(batch: pa.Table) -> pa.Table:
            return (batch.join(ray.get(nation_ref), keys=["c_nationkey"],
                               right_keys=["n_nationkey"], join_type="inner")
                    .select(["c_custkey", "n_name"]))

        dim_ds = (_pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
                  .map_batches(compose, batch_format="pyarrow"))
        probe = (_pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
                 .map_batches(
                     lambda b: pa.table({"o_custkey": b["o_custkey"],
                                         "price_c": _cents(b["o_totalprice"])}),
                     batch_format="pyarrow"))
        tagged = shuffle_probe_join(probe, dim_ds, "o_custkey",
                                    "c_custkey", ["n_name", "price_c"])

    agg = (tagged.groupby("n_name")
           .aggregate(Count(alias_name="n_orders"), Sum("price_c", alias_name="price_c")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({"n_name": batch["n_name"], "n_orders": batch["n_orders"],
                         "revenue": pc.divide(pc.cast(batch["price_c"], pa.float64()), 100.0)})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("n_name")


def part_type_stats(sf_dir: str):
    """groupby p_type: n_parts, avg_retail (exact int-cent mean)."""
    agg = (_pq(sf_dir, "part", ["p_type", "p_retailprice"])
           .map_batches(lambda b: pa.table({"p_type": b["p_type"],
                                            "price_c": _cents(b["p_retailprice"])}),
                        batch_format="pyarrow")
           .groupby("p_type")
           .aggregate(Count(alias_name="n_parts"), Sum("price_c", alias_name="price_c")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_type": batch["p_type"], "n_parts": batch["n_parts"],
            "avg_retail": pc.divide(
                pc.cast(batch["price_c"], pa.float64()),
                pc.multiply(pc.cast(batch["n_parts"], pa.float64()), 100.0))})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("p_type")


def per_lang_doc_stats(sf_dir: str):
    """G6 analog on the documents table: per-language counts + char totals."""
    agg = (_pq(sf_dir, "documents", ["lang", "n_chars"])
           .groupby("lang")
           .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch["lang"], "n_docs": batch["n_docs"],
            "total_chars": batch["total_chars"],
            "avg_chars": pc.divide(pc.cast(batch["total_chars"], pa.float64()),
                                   pc.cast(batch["n_docs"], pa.float64()))})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("lang")


def events_hourly(sf_dir: str):
    """Tumbling event-time window as vectorized truncation + groupby:
    (hour, event_type) → n_events, sum_value (exact cents)."""
    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"hour": hour, "event_type": batch["event_type"],
                         "value_c": _cents(batch["value"])})

    agg = (_pq(sf_dir, "events", ["ts", "event_type", "value"])
           .map_batches(bucket, batch_format="pyarrow")
           .groupby(["hour", "event_type"])
           .aggregate(Count(alias_name="n_events"), Sum("value_c", alias_name="value_c")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            # microsecond resolution — DuckDB date_trunc emits timestamp[us],
            # and the driver hash is dtype-sensitive
            "hour": pc.cast(batch["hour"], pa.timestamp("us")),
            "event_type": batch["event_type"],
            "n_events": batch["n_events"],
            "sum_value": pc.divide(pc.cast(batch["value_c"], pa.float64()), 100.0)})

    return agg.map_batches(finalize, batch_format="pyarrow").sort(["hour", "event_type"])


SESSION_GAP_MIN = 30


def sessionize_events(sf_dir: str, gap_minutes: int = SESSION_GAP_MIN):
    """Session windows per user: a gap > gap_minutes starts a new session.

    Order-dependent logic runs inside groupby(user_id).map_groups over the
    group sorted by the explicit key (ts, event_id) — output never depends
    on block arrival order (SURVEY.md §7 ordering rule). Session ids are
    1-based in (ts, event_id) order, matching the SQL oracle's
    lag/cumulative-sum construction."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new)
        g["session_id"] = sid
        # NULL values: rint(NaN).astype(int64) is garbage — sum non-null
        # cents and track the non-null count so an all-null session yields
        # NULL sum_value (SQL sum semantics), not 0
        vals = g["value"].to_numpy()
        m = ~np.isnan(vals)
        cents = np.zeros(len(vals), np.int64)
        cents[m] = np.rint(vals[m] * 100).astype(np.int64)
        g["value_c"] = cents
        g["has_v"] = m.astype(np.int64)
        out = g.groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"), n_events=("event_id", "size"),
            start_ts=("ts", "min"), end_ts=("ts", "max"),
            value_c=("value_c", "sum"), has_v=("has_v", "sum"))
        out["sum_value"] = np.where(out["has_v"] > 0,
                                    out["value_c"] / 100.0, np.nan)
        return out[["user_id", "session_id", "n_events", "start_ts", "end_ts", "sum_value"]]

    return (_pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
            .groupby("user_id")
            .map_groups(sessions, batch_format="pandas")
            .sort(["user_id", "session_id"]))


def user_moving_avg(sf_dir: str, window: int = 3):
    """Sliding-window aggregate: per user, ordered by (ts, event_id), the
    mean of the last ``window`` values (SQL frame ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW). Windowing runs inside groupby(user_id) over
    the explicitly sorted group (never block order); the rolling sum is an
    integer-cent cumsum so the division matches the SQL frame avg
    bit-for-bit (see lineitem_pricing float-parity note)."""

    def mov(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        vals = g["value"].to_numpy()
        m = ~np.isnan(vals)
        # SQL frame semantics with NULLs: count(*) counts every frame row,
        # sum skips NULL values, and an all-NULL frame yields NULL
        c = np.zeros(len(vals), np.int64)
        c[m] = np.rint(vals[m] * 100).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(c)])
        vs = np.concatenate([[0], np.cumsum(m.astype(np.int64))])
        idx = np.arange(len(c))
        starts = np.maximum(0, idx - (window - 1))
        sums = cs[idx + 1] - cs[starts]
        counts = idx + 1 - starts
        n_valid = vs[idx + 1] - vs[starts]
        g["avg_value"] = np.where(n_valid > 0,
                                  sums / (counts * 100.0), np.nan)
        return g[["user_id", "event_id", "ts", "avg_value"]]

    return (_pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
            .groupby("user_id")
            .map_groups(mov, batch_format="pandas")
            .sort(["user_id", "ts", "event_id"]))


def top_events_per_user(sf_dir: str, k: int = 3):
    """Windowed rank: the top-k events per user by (value desc, event_id) —
    SQL row_number() OVER (PARTITION BY user ORDER BY ...) <= k.

    Grouping is COARSE (user_id % nc, nc sized from table metadata) with a
    vectorized pandas rank inside each partition — one Ray group per
    partition instead of one per user (the tiny-groups dispatch trap), and
    the per-partition sort+cumcount is the standard top-k-per-key shape at
    scale. Values pass through untouched, so the float hash matches SQL.
    """
    import pyarrow.parquet as pqm

    n = pqm.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    nc = min(256, n // 4000 + 1)

    def add_coarse(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("coarse",
                                   pa.array((u % nc).astype(np.int32)))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "value", "event_id"],
                           ascending=[True, False, True])
        d = d.assign(rnk=d.groupby("user_id").cumcount() + 1)
        d = d[d["rnk"] <= k]
        return d[["user_id", "rnk", "event_id", "value"]]

    return (_pq(sf_dir, "events", ["event_id", "user_id", "value"])
            .map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse")
            .map_groups(topk, batch_format="pandas")
            .sort(["user_id", "rnk"]))
