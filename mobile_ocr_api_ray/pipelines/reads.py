"""Shared parquet-read helpers for the pipeline modules.

One home for the size-aware small-file block override (used by the
documents/embeddings/relational reads) and cheap metadata probes, so the
32 MB threshold and block-count shape can't drift between sibling modules.
`pipelines/extract.py:read_pages` keeps its own shard-matched variant (it
reads DIRECTORIES of shards and row-targets against CPU count).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray.data

SMALL_FILE_BYTES = 32 * 1024 * 1024


def read_small_aware(path: str, columns=None, rows_per_block: int = 250,
                     filter=None):
    """read_parquet with a block override for SMALL files: Ray's default
    SplitBlocks turns a 0.2 MB table into 64 near-empty blocks, and every
    downstream shuffle then pays a per-block fixed cost (~10 ms/block/pass —
    the SplitBlocks trap from pipelines/extract.py, measured again on the
    dedup family: more time iterating empty blocks than hashing). Files
    ≥ 32 MB keep Ray's own sizing (the 100 TB path).

    ``filter`` is a pyarrow.dataset expression pushed into the parquet scan
    (row-group statistics pruning) — at 100 TB a predicate like
    ``pc.field("l_shipdate") > cutoff`` skips whole row groups at the read
    instead of shipping rows to a downstream filter."""
    kw = {"filter": filter} if filter is not None else {}
    if os.path.getsize(path) < SMALL_FILE_BYTES:
        n = pq.ParquetFile(path).metadata.num_rows
        return ray.data.read_parquet(
            path, columns=columns,
            override_num_blocks=min(64, max(1, n // rows_per_block)), **kw)
    return ray.data.read_parquet(path, columns=columns, **kw)


def embedding_dim(path: str) -> int:
    """Dimension of the list<float> `embedding` column — reads the FIRST
    NON-NULL row via the parquet batch iterator, never the whole column
    (len(None) on a leading null row would abort every ANN query)."""
    for batch in pq.ParquetFile(path).iter_batches(batch_size=256,
                                                   columns=["embedding"]):
        col = batch["embedding"]
        for i in range(len(col)):
            if col[i].is_valid:
                return len(col[i])
    raise ValueError(f"no non-null embedding rows in {path}")


_COMPRESSION_EXTS = (".gz", ".zst", ".zstd", ".bz2")
# '.zstd' is NOT in pyarrow's Codec.detect extension table (only '.zst'),
# so shards carrying it need the codec passed explicitly to the reader
_EXPLICIT_CODEC = {".zstd": "zstd"}


def _compression_ext(name: str) -> str:
    for ce in _COMPRESSION_EXTS:
        if name.endswith(ce):
            return ce
    return ""


def _format_ext(name: str) -> str:
    """Format extension with any compression suffix stripped:
    'part-0.jsonl.gz' → '.jsonl'."""
    ce = _compression_ext(name)
    base = name[: -len(ce)] if ce else name
    return os.path.splitext(base)[1].lower()


def _walk_files(root: str) -> "list[str]":
    """All data files under ``root``, RECURSIVELY (partitioned exports
    nest shards in dt=.../ subdirectories); hidden/_metadata entries are
    skipped at every level."""
    out: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        out.extend(os.path.join(dirpath, f) for f in filenames
                   if not f.startswith((".", "_")))
    return sorted(out)


def read_table_auto(path: str, columns=None, schema_like: str | None = None):
    """Format-dispatching reader: parquet / NDJSON (.jsonl/.ndjson) / CSV
    / TSV — the ingestion front door for corpora that arrive as exports
    rather than parquet. Accepts a single file, a DIRECTORY of shards, or
    a glob pattern (how 100-TB corpora actually arrive: ``part-*.jsonl.gz``
    export dirs), and transparent gzip/zstd/bz2 compression suffixes
    (``.jsonl.gz``, ``.csv.zst`` — pyarrow's codec auto-detect inside
    Ray's readers, decompression runs in the read tasks, never the
    driver). Streams through Ray's native readers (no driver
    materialization); column pruning happens at the read for parquet and
    immediately after for the text formats (their readers can't prune).

    ``schema_like`` names a parquet file whose schema the result is cast
    to — applied to EVERY format, parquet included (a narrower-typed
    parquet export must come out reference-typed too), so a pipeline
    written against the reference schema sees identical Arrow types from
    any source. A requested column missing from the reference schema OR
    from the actual source file raises a descriptive ValueError naming the
    columns and the file (never a silent drop or an opaque worker error);
    an uncastable column raises a ValueError naming the column and target
    type. Top-level-array ``.json`` is rejected explicitly (Ray/Arrow
    parse NDJSON only — re-export with lines=True as .jsonl)."""
    import pyarrow as pa

    # ---- resolve glob / shard-directory inputs to a uniform-format list
    src, ext, first_file = path, None, path
    if any(ch in path for ch in "*?["):
        import glob as globmod
        # recursive=True makes 'dir/**/part-*.gz' reach nested shards
        files = sorted(p for p in globmod.glob(path, recursive=True)
                       if os.path.isfile(p))
        if not files:
            raise ValueError(f"read_table_auto: no files match {path!r}")
        src, first_file = files, files[0]
    elif os.path.isdir(path):
        # recursive walk: partitioned exports nest shards (dt=.../part-N)
        files = _walk_files(path)
        if not files:
            raise ValueError(f"read_table_auto: no files in {path!r}")
        src, first_file = files, files[0]
    if isinstance(src, list):
        exts = {_format_ext(p) for p in src}
        if len(exts) != 1:
            raise ValueError(
                f"read_table_auto: mixed shard formats {sorted(exts)} "
                f"under {path!r}")
        ext = exts.pop()
        comps = {_compression_ext(p) for p in src}
    else:
        ext = _format_ext(path)
        comps = {_compression_ext(path)}

    # '.zstd' needs an explicit codec (pyarrow detects only '.zst').
    # '.zst' + '.zstd' mix fine (same codec, explicit decode handles
    # both); anything ELSE alongside an explicit-codec suffix — a
    # different codec or uncompressed shards — would be broken by the
    # forced codec, so reject with the file layout named
    explicit = {_EXPLICIT_CODEC[c] for c in comps if c in _EXPLICIT_CODEC}
    if explicit and (comps - {".zst", ".zstd"}):
        raise ValueError(
            f"read_table_auto: mixed compression suffixes {sorted(comps)} "
            f"under {path!r} — '.zstd' shards force an explicit zstd "
            "codec and cannot mix with other compressions or plain files")
    read_kw = ({"arrow_open_stream_args": {"compression": explicit.pop()}}
               if explicit else {})

    if ext == ".json":
        raise ValueError(
            "read_table_auto: '.json' (top-level array) is not streamable "
            "— export newline-delimited records as .jsonl/.ndjson")
    if ext in ("", ".parquet"):
        if columns is not None:
            # every shard's footer (cheap metadata reads): a later
            # schema-drifted shard would otherwise pass the first-file
            # check and fail opaquely inside a read worker
            for f in (src if isinstance(src, list) else [src]):
                have = pq.read_schema(f).names
                missing = [c for c in columns if c not in have]
                if missing:
                    raise ValueError(
                        f"read_table_auto: columns {missing} not in "
                        f"{f!r} (has {have})")
        if isinstance(src, list):
            ds = ray.data.read_parquet(src, columns=columns)
        else:
            ds = read_small_aware(src, columns=columns)
    elif ext in (".jsonl", ".ndjson"):
        # file_extensions=None: Ray's default filter would silently skip
        # compressed shards (part-0.jsonl.gz fails its ["json","jsonl"]
        # suffix test); format membership is already decided above
        ds = ray.data.read_json(src, file_extensions=None, **read_kw)
    elif ext in (".csv", ".tsv"):
        import pyarrow.csv as pacsv
        opts = (pacsv.ParseOptions(delimiter="\t") if ext == ".tsv"
                else None)
        ds = ray.data.read_csv(src, file_extensions=None,
                               **({"parse_options": opts} if opts else {}),
                               **read_kw)
    else:
        raise ValueError(f"read_table_auto: unsupported extension {ext!r}")

    if columns is not None and ext not in ("", ".parquet"):
        actual = ds.schema().names
        missing = [c for c in columns if c not in actual]
        if missing:
            raise ValueError(
                f"read_table_auto: columns {missing} not in {path!r} "
                f"(has {actual})")
        ds = ds.select_columns(list(columns))
    if schema_like is not None:
        want = pq.read_schema(schema_like)
        names = list(columns) if columns is not None else want.names
        missing = [c for c in names if c not in want.names]
        if missing:
            raise ValueError(
                f"read_table_auto: columns {missing} not in the reference "
                f"schema {schema_like!r}")
        if columns is None:
            # casting the full reference schema: the export must actually
            # carry every reference column — check on the DRIVER (parquet:
            # footer of the first shard; text: ds.schema()), not in a
            # worker where it surfaces as an opaque KeyError
            if ext in ("", ".parquet"):
                for f in (src if isinstance(src, list) else [src]):
                    actual = pq.read_schema(f).names
                    absent = [c for c in names if c not in actual]
                    if absent:
                        raise ValueError(
                            f"read_table_auto: reference columns {absent} "
                            f"missing from {f!r} (has {actual})")
            else:
                actual = ds.schema().names
                absent = [c for c in names if c not in actual]
                if absent:
                    raise ValueError(
                        f"read_table_auto: reference columns {absent} "
                        f"missing from {path!r} (has {actual})")
        target = pa.schema([want.field(c) for c in names])

        def cast(batch: "pa.Table") -> "pa.Table":
            cols = []
            for f in target:
                try:
                    cols.append(batch[f.name].cast(f.type))
                except Exception as e:
                    raise ValueError(
                        f"read_table_auto: column {f.name!r} of {path!r} "
                        f"does not cast to reference type {f.type}: {e}"
                    ) from e
            return pa.table(dict(zip(target.names, cols)))

        ds = ds.map_batches(cast, batch_format="pyarrow")
    return ds
