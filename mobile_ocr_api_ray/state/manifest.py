"""Checkpointed partition outputs with lineage manifests (SURVEY.md §4).

Re-expresses the reference's session/result cache (SESSION_CACHE
app.py:235-314, results-by-task_id app2.py:933-965) as durable data: the
input is split into deterministic url-hash partitions; each partition's
extraction output is written atomically (temp dir → rename) together with a
manifest row::

    (partition_id, input_shard, row_range, content_digest, row_count,
     bytes, wall_ms, docs_per_s)

Resume = read the manifest directory, skip completed partitions, process
the rest — exact recovery after preemption, which the reference's in-memory
caches never survived (server restart loses everything, app.py:237).

Partitioning is by ``crc32(url) % n_partitions`` — deterministic across
runs and near-uniform (url-hash skew guidance, SURVEY.md §4) — so a resumed
run reproduces byte-identical partition contents.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data


def partition_of(urls: list[str], n_partitions: int) -> list[int]:
    return [zlib.crc32((u or "").encode()) % n_partitions for u in urls]


def add_partition_column(batch: pa.Table, n_partitions: int) -> pa.Table:
    # same crc32 % n as partition_of, via the shared buffer-slice helper
    from ..str_hash import str_coarse
    parts = str_coarse(batch["url"], n_partitions)
    return batch.append_column("partition_id", pa.array(parts))


def _manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{partition_id:05d}.json")


def completed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith("part-") and f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
                if m.get("status") == "complete":
                    done.add(int(m["partition_id"]))
            except (json.JSONDecodeError, KeyError, ValueError):
                continue  # torn write → partition treated as incomplete
    return done


def write_partition(table: pa.Table, out_dir: str, partition_id: int,
                    input_shard: str, t_start: float,
                    key_col: str = "url",
                    text_col: str = "extracted_text") -> dict:
    """Atomic partition write + manifest: parquet to a temp name, fsync-free
    rename, then the manifest row (the rename is the commit point; a crash
    leaves either nothing or a complete pair). ``t_start`` is when this
    partition's task began — wall_ms covers sort + digest + write for THIS
    partition only. ``key_col``/``text_col`` select the lineage-digest
    columns (url/extracted_text for the flagship; doc_id/text for
    training-shard exports)."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    final = os.path.join(out_dir, f"part-{partition_id:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)

    urls = ["" if u is None else str(u)
            for u in table[key_col].to_pylist()]
    texts = table[text_col].to_pylist() if text_col in table.column_names else []
    h = hashlib.sha256()
    for u, t in zip(urls, texts):
        h.update((u or "").encode())
        h.update(b"\x00")
        h.update((t or "").encode())
        h.update(b"\x01")
    # range over the ORIGINAL key values (stringified ints sort
    # lexicographically — "10" < "2" — which would invert the range)
    raw_keys = [k for k in table[key_col].to_pylist() if k is not None]
    row_range = [min(raw_keys), max(raw_keys)] if raw_keys else [None, None]
    nbytes = os.path.getsize(final)
    wall_ms = (time.time() - t_start) * 1e3  # sort + write + digest, as documented
    manifest = {
        "partition_id": partition_id,
        "input_shard": input_shard,
        "row_range": row_range,
        "content_digest": h.hexdigest(),
        "row_count": len(urls),
        "bytes": nbytes,
        "wall_ms": wall_ms,
        "docs_per_s": (len(urls) / (wall_ms / 1e3)) if wall_ms > 0 else None,
        "status": "complete",
    }
    mpath = _manifest_path(out_dir, partition_id)
    tmpm = mpath + ".tmp"
    with open(tmpm, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmpm, mpath)
    return manifest


def run_partitioned_extract(pages_path: str, out_dir: str, n_partitions: int = 64,
                            quality: str = "medium", concurrency: int | None = None,
                            batch_size: int = 32, max_partitions: int | None = None) -> dict:
    """Checkpointed flagship run: url-hash partition → skip completed →
    extract remaining partitions → atomic write + manifest each.

    ``max_partitions`` processes only that many incomplete partitions (used
    by the kill/resume test to simulate preemption). Returns a summary
    {completed_before, completed_now, skipped}.
    """
    from ..pipelines.extract import extract_pipeline, read_pages

    done = completed_partitions(out_dir)
    ds = read_pages(pages_path)
    ds = ds.map_batches(lambda b: add_partition_column(b, n_partitions),
                        batch_format="pyarrow")
    # preemption simulation (max_partitions) selects WHICH incomplete
    # partitions run by filtering ids before extraction — a limit() on the
    # write results would not stop already-scheduled write tasks' side
    # effects (observed: limit(6) still wrote all 16 partitions)
    todo = sorted(set(range(n_partitions)) - done)
    if max_partitions is not None:
        todo = todo[:max_partitions]
    if len(todo) < n_partitions:
        todo_arr = pa.array(todo, pa.int32())

        def keep_todo(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["partition_id"],
                                         value_set=todo_arr))

        ds = ds.map_batches(keep_todo, batch_format="pyarrow")

    extracted = extract_pipeline(ds, quality=quality, concurrency=concurrency,
                                 batch_size=batch_size)
    # the extractor emits the fixed EXTRACTED_SCHEMA; re-derive the partition
    # column from the url (crc32 is deterministic, so pre- and post-extraction
    # assignments agree)
    extracted = extracted.map_batches(lambda b: add_partition_column(b, n_partitions),
                                      batch_format="pyarrow")

    # group rows by partition and write each atomically. The groupby gives
    # one task per partition — partition count bounds write parallelism.
    def write_group(group: pa.Table) -> pa.Table:
        # per-partition wall time measured inside the group task (sort +
        # digest + parquet write) — a driver-global t0 would record
        # cumulative pipeline time and make partitions incomparable
        g0 = time.time()
        pid = int(group["partition_id"][0].as_py())
        table = group.drop_columns(["partition_id"]).sort_by("url")
        m = write_partition(table, out_dir, pid, pages_path, g0)
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "row_count": pa.array([m["row_count"]], pa.int64())})

    incomplete = extracted.groupby("partition_id")
    written = incomplete.map_groups(write_group, batch_format="pyarrow")
    n_new = len(written.to_pandas())
    return {"completed_before": len(done), "completed_now": n_new,
            "out_dir": out_dir, "n_partitions": n_partitions}


def read_output(out_dir: str):
    """Read back all completed partitions as one Dataset."""
    files = [os.path.join(out_dir, f) for f in sorted(os.listdir(out_dir))
             if f.endswith(".parquet")]
    return ray.data.read_parquet(files)


def export_training_shards(ds, out_dir: str, n_shards: int = 16,
                           key_col: str = "doc_id",
                           text_col: str = "text",
                           max_shards: int | None = None) -> dict:
    """Deterministic sharded training-data export — the final step of a
    curation pipeline: shard = md5-hash32(key) % n_shards (the samplers'
    pure-function rule, so shard membership is stable across runs,
    partitionings and cluster sizes), one atomic parquet + manifest row
    per shard (same commit-point discipline as the flagship writer), and
    exact resume: completed shards are filtered out BEFORE any work runs.
    Returns {completed_before, completed_now, out_dir, n_shards}."""
    from ..hashing import hash32 as h32

    done = completed_partitions(out_dir)
    todo = sorted(set(range(n_shards)) - done)
    if max_shards is not None:
        # preemption simulation / bounded-work mode, same contract as
        # run_partitioned_extract(max_partitions=...): stop after k
        # shards; a later call resumes the remainder exactly
        todo = todo[:max_shards]
    if not todo:
        # exact resume of a finished export must not re-scan the corpus
        return {"completed_before": len(done), "completed_now": 0,
                "out_dir": out_dir, "n_shards": n_shards}

    def add_shard(batch: pa.Table) -> pa.Table:
        sh = [h32(v) % n_shards for v in batch[key_col].to_pylist()]
        return batch.append_column("partition_id",
                                   pa.array(sh, pa.int32()))

    ds = ds.map_batches(add_shard, batch_format="pyarrow")
    if len(todo) < n_shards:
        todo_arr = pa.array(todo, pa.int32())
        ds = ds.map_batches(
            lambda b: b.filter(pc.is_in(b["partition_id"],
                                        value_set=todo_arr)),
            batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        g0 = time.time()
        pid = int(group["partition_id"][0].as_py())
        table = group.drop_columns(["partition_id"]).sort_by(key_col)
        m = write_partition(table, out_dir, pid, "training_export", g0,
                            key_col=key_col, text_col=text_col)
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "row_count": pa.array([m["row_count"]],
                                               pa.int64())})

    written = ds.groupby("partition_id").map_groups(
        write_group, batch_format="pyarrow")
    wdf = written.to_pandas()
    wrote = set(wdf["partition_id"].tolist()) if len(wdf) else set()
    # a shard no key hashed into produces NO group: commit it as an
    # explicitly-empty partition, else resume re-runs the whole export
    # forever and the manifest can't distinguish 'empty' from 'lost'
    for pid in todo:
        if pid in wrote:
            continue
        write_partition(pa.table({key_col: pa.array([], pa.int64()),
                                  text_col: pa.array([], pa.string())}),
                        out_dir, pid, "training_export", time.time(),
                        key_col=key_col, text_col=text_col)
    return {"completed_before": len(done), "completed_now": len(todo),
            "out_dir": out_dir, "n_shards": n_shards}


def shard_manifest_table(out_dir: str) -> pa.Table:
    """The export's lineage manifest as a table (shard_id, row_count,
    bytes, content_digest) sorted by shard — per-partition lineage +
    metrics per the north rule."""
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.startswith("part-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            if m.get("status") == "complete":
                rows.append(m)
    return pa.table({
        "shard_id": pa.array([r["partition_id"] for r in rows], pa.int32()),
        "row_count": pa.array([r["row_count"] for r in rows], pa.int64()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.int64()),
        "content_digest": pa.array([r["content_digest"] for r in rows],
                                   pa.string())})


def export_jsonl_shards(ds, out_dir: str, n_shards: int = 16,
                        key_col: str = "doc_id", text_col: str = "text",
                        max_shards: int | None = None) -> dict:
    """Compressed-NDJSON training export — the interchange-format twin of
    export_training_shards (same md5-hash32 shard rule, same atomic
    write + manifest + exact-resume discipline), emitting
    ``shard-NNNNN.jsonl.gz`` files that round-trip through
    pipelines/reads.read_table_auto (tested: export → re-ingest → rollup
    equality). Bytes are deterministic end to end: rows sort by key,
    JSON serializes with fixed separators/column order, and the gzip
    frame comes from pyarrow's codec (no mtime header) — so the manifest
    content digests byte-diff across runs exactly like the parquet path."""
    import pyarrow.compute as pc  # noqa: F401 (shared convention import)

    from ..hashing import hash32 as h32

    done = completed_partitions(out_dir)
    todo = sorted(set(range(n_shards)) - done)
    if max_shards is not None:
        todo = todo[:max_shards]
    if not todo:
        return {"completed_before": len(done), "completed_now": 0,
                "out_dir": out_dir, "n_shards": n_shards}

    def add_shard(batch: pa.Table) -> pa.Table:
        sh = [h32(v) % n_shards for v in batch[key_col].to_pylist()]
        return batch.append_column("partition_id",
                                   pa.array(sh, pa.int32()))

    import pyarrow.compute as _pc

    ds = ds.map_batches(add_shard, batch_format="pyarrow")
    if len(todo) < n_shards:
        todo_arr = pa.array(todo, pa.int32())
        ds = ds.map_batches(
            lambda b: b.filter(_pc.is_in(b["partition_id"],
                                         value_set=todo_arr)),
            batch_format="pyarrow")

    def _write_jsonl_partition(table: pa.Table, pid: int,
                               t_start: float) -> dict:
        os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
        final = os.path.join(out_dir, f"shard-{pid:05d}.jsonl.gz")
        tmp = final + ".tmp"
        cols = table.column_names
        pydata = [table[c].to_pylist() for c in cols]
        lines = []
        for row in zip(*pydata):
            lines.append(json.dumps(dict(zip(cols, row)),
                                    separators=(",", ":"),
                                    ensure_ascii=False))
        payload = ("\n".join(lines) + ("\n" if lines else "")).encode()
        blob = pa.Codec("gzip").compress(payload, asbytes=True)
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, final)

        keys = ["" if k is None else str(k)
                for k in table[key_col].to_pylist()]
        texts = (table[text_col].to_pylist()
                 if text_col in cols else [""] * len(keys))
        h = hashlib.sha256()
        for u, t in zip(keys, texts):
            h.update((u or "").encode()); h.update(b"\x00")
            h.update((t or "").encode()); h.update(b"\x01")
        raw_keys = [k for k in table[key_col].to_pylist() if k is not None]
        wall_ms = (time.time() - t_start) * 1e3
        manifest = {
            "partition_id": pid, "input_shard": "jsonl_export",
            "row_range": ([min(raw_keys), max(raw_keys)]
                          if raw_keys else [None, None]),
            "content_digest": h.hexdigest(),
            "row_count": len(keys), "bytes": os.path.getsize(final),
            "wall_ms": wall_ms,
            "docs_per_s": (len(keys) / (wall_ms / 1e3))
            if wall_ms > 0 else None,
            "status": "complete",
        }
        mpath = _manifest_path(out_dir, pid)
        tmpm = mpath + ".tmp"
        with open(tmpm, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmpm, mpath)
        return manifest

    def write_group(group: pa.Table) -> pa.Table:
        g0 = time.time()
        pid = int(group["partition_id"][0].as_py())
        table = group.drop_columns(["partition_id"]).sort_by(key_col)
        m = _write_jsonl_partition(table, pid, g0)
        return pa.table({"partition_id": pa.array([pid], pa.int32()),
                         "row_count": pa.array([m["row_count"]],
                                               pa.int64())})

    written = ds.groupby("partition_id").map_groups(
        write_group, batch_format="pyarrow")
    wdf = written.to_pandas()
    wrote = set(wdf["partition_id"].tolist()) if len(wdf) else set()
    for pid in todo:
        if pid in wrote:
            continue
        _write_jsonl_partition(
            pa.table({key_col: pa.array([], pa.int64()),
                      text_col: pa.array([], pa.string())}), pid,
            time.time())
    return {"completed_before": len(done), "completed_now": len(todo),
            "out_dir": out_dir, "n_shards": n_shards}


def _complete_manifests(out_dir: str) -> list:
    """All complete manifest rows under ``out_dir``, sorted by partition
    id — bounded metadata (one row per partition), never corpus-scale."""
    mdir = os.path.join(out_dir, "_manifest")
    rows = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.startswith("part-") and f.endswith(".json"):
            try:
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
            except json.JSONDecodeError:
                continue
            if m.get("status") == "complete":
                rows.append(m)
    rows.sort(key=lambda m: m["partition_id"])
    return rows


def compact_partitions(out_dir: str, compact_dir: str,
                       target_bytes: int = 256 << 20,
                       key_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """Small-file compaction — the housekeeping operator every long-lived
    100-TB output directory needs: a partitioned export accumulates many
    small parquet files (fine-grained partitions are what make resume
    cheap), and downstream readers want few large ones.

    Plan: bin-pack CONSECUTIVE partitions into groups whose manifest
    ``bytes`` sum ≤ ``target_bytes`` (a single oversized partition forms
    its own group) — deterministic given the manifests, driver-side over
    metadata only. Execute: one Ray task per group reads its inputs,
    concatenates in partition order and writes one compacted parquet +
    manifest row through the same atomic temp→rename commit point as the
    original writer, so a crash mid-compaction leaves either nothing or a
    complete pair. Exact resume: groups already complete in
    ``compact_dir`` are skipped before any work runs (and re-checked
    inside the task). Peak memory per task ≈ ``target_bytes``, by design.

    Returns the compaction manifest (group_id, n_inputs, first_shard,
    last_shard, row_count, bytes, content_digest) sorted by group_id —
    the digest pins byte-determinism of the rewritten content."""
    manifests = _complete_manifests(out_dir)
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_b = 0
    for m in manifests:
        if cur and cur_b + m["bytes"] > target_bytes:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(int(m["partition_id"]))
        cur_b += int(m["bytes"])
    if cur:
        groups.append(cur)

    def _span(g: list) -> str:
        return f"compact:{g[0]}-{g[-1]}"

    # Resume is only valid against the SAME plan: groups are consecutive
    # input ranges, so the input_shard span tag fully determines a
    # group's membership. A completed group whose tag disagrees with
    # this run's plan (different target_bytes, or the input dir gained
    # partitions) would silently leave duplicated/stale rows on disk —
    # refuse instead of corrupting.
    done: dict[int, str] = {
        int(m["partition_id"]): m.get("input_shard", "")
        for m in _complete_manifests(compact_dir)}
    for gid, tag in done.items():
        if gid >= len(groups) or tag != _span(groups[gid]):
            raise ValueError(
                f"compact_dir {compact_dir!r} holds group {gid} "
                f"({tag!r}) from a different compaction plan "
                f"(this run: "
                f"{_span(groups[gid]) if gid < len(groups) else 'absent'}"
                f") — use a fresh compact_dir")
    todo = [(gid, g) for gid, g in enumerate(groups) if gid not in done]
    if todo:
        spec = pa.table({
            "group_id": pa.array([g[0] for g in todo], pa.int32()),
            "pids": pa.array([json.dumps(g[1]) for g in todo],
                             pa.string())})

        def compact(batch: pa.Table) -> pa.Table:
            out = []
            for gid, pj in zip(batch["group_id"].to_pylist(),
                               batch["pids"].to_pylist()):
                # resume race: O(1) check of THIS group's manifest only
                mpath = _manifest_path(compact_dir, gid)
                if os.path.exists(mpath):
                    try:
                        with open(mpath) as fh:
                            if json.load(fh).get("status") == "complete":
                                continue
                    except json.JSONDecodeError:
                        pass   # torn write → redo the group
                t0 = time.time()
                pids = json.loads(pj)
                tables = [pq.read_table(
                    os.path.join(out_dir, f"part-{p:05d}.parquet"))
                    for p in pids]
                write_partition(pa.concat_tables(tables), compact_dir,
                                gid, _span(pids), t0,
                                key_col=key_col, text_col=text_col)
                out.append(gid)
            return pa.table({"group_id": pa.array(out, pa.int32())})

        # one block per group — map_batches parallelism is per BLOCK, so
        # without the repartition the whole plan would run in one task
        ray.data.from_arrow(spec).repartition(len(todo)).map_batches(
            compact, batch_size=1, batch_format="pyarrow").materialize()

    rows = []
    for gid, g in enumerate(groups):
        with open(_manifest_path(compact_dir, gid)) as fh:
            m = json.load(fh)
        rows.append((gid, len(g), g[0], g[-1],
                     int(m["row_count"]), int(m["bytes"]),
                     m["content_digest"]))
    return pa.table({
        "group_id": pa.array([r[0] for r in rows], pa.int32()),
        "n_inputs": pa.array([r[1] for r in rows], pa.int64()),
        "first_shard": pa.array([r[2] for r in rows], pa.int32()),
        "last_shard": pa.array([r[3] for r in rows], pa.int32()),
        "row_count": pa.array([r[4] for r in rows], pa.int64()),
        "bytes": pa.array([r[5] for r in rows], pa.int64()),
        "content_digest": pa.array([r[6] for r in rows], pa.string())})
