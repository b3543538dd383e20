"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup mechanism is the v2 OCR result cache — "identical
input computed once" (app2.py:46-48,329-336); at corpus scale that becomes
the family of operators a training-data pipeline needs. All are expressed
as Dataset transforms:

- exact:    content digest (md5, matching DuckDB's ``md5()`` for the SQL
            oracle) → groupby(digest) → representative per group.
- MinHash:  word-shingle → 64-perm minhash → 16 bands × 4 rows → explode to
            (band_id, band_hash) rows → groupby band → candidate pairs with
            signature-estimated Jaccard → global pair dedup. One-pass default
            rides signatures inside band rows (16× duplication ≈ 8 KB/doc,
            no second join); two_pass=True shuffles lean band rows (~24 B)
            and re-attaches signatures via partitioned joins — identical
            output, the 100 TB shuffle-volume path.
- SimHash:  64-bit token-frequency simhash; near-dups via 4×16-bit band
            blocking + Hamming distance ≤ 3.
- n-gram Jaccard: exact verification kernel (used standalone on candidate
            pairs or in tests against MinHash estimates).
- embedding: sign-LSH bucket groupby → within-bucket pairwise cosine ≥ t
            (scale path); brute-force pairwise for oracle-sized inputs.

All hashes are crc32/blake2-based — stable across processes (PYTHONHASHSEED-
independent); permutation constants derive from numpy RandomState(42).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import str_hash

# ------------------------------------------------------------- exact dedup

def add_md5_digest(batch: pa.Table, text_col: str = "text",
                   out_col: str = "digest") -> pa.Table:
    texts = batch[text_col].to_pylist()
    digests = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out_col, pa.array(digests, pa.string()))


def exact_dedup_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """→ (digest, rep_id = min id, dup_count) per distinct content."""
    from ray.data.aggregate import Count, Min

    with_digest = ds.map_batches(
        lambda b: add_md5_digest(b, text_col).select([id_col, "digest"]),
        batch_format="pyarrow")
    return with_digest.groupby("digest").aggregate(
        Min(id_col, alias_name="rep_id"), Count(alias_name="dup_count"))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep one representative row (min id) per distinct content —
    hash-partition + per-group first (SURVEY.md §2.7 D1). Shuffles on a
    coarse prefix of the digest; representatives resolved vectorized inside
    each coarse group (one Ray group per partition, not per digest)."""
    def add_keys(batch: pa.Table) -> pa.Table:
        t = add_md5_digest(batch, text_col)
        coarse = str_hash.crc32_of_strings(t["digest"]) % N_COARSE
        return t.append_column(
            "coarse", pa.array(coarse.astype(np.int32), pa.int32()))

    def first_per_digest(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([id_col]).drop_duplicates("digest", keep="first")
                .drop(columns=["digest", "coarse"]))

    with_keys = ds.map_batches(add_keys, batch_format="pyarrow")
    return with_keys.groupby("coarse").map_groups(
        first_per_digest, batch_format="pandas")


def exact_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                    n_coarse: int | None = None):
    """Star-shaped duplicate-pair edges from EXACT content equality:
    (id_a = min id of the digest group, id_b = each other member).

    Same coarse digest-prefix shuffle as exact_dedup; inside each partition
    the per-digest rep and members resolve vectorized (sort by digest+id,
    group boundaries from digest change, rep broadcast via np.repeat — no
    per-digest dispatch). Feeding these pairs to dup_clusters gives a
    connected-components run whose ground truth is SQL-expressible
    (min(doc_id) per text group), unlike the MinHash pair graph."""
    nc = n_coarse or N_COARSE

    def add_keys(batch: pa.Table) -> pa.Table:
        t = add_md5_digest(batch, text_col).select([id_col, "digest"])
        coarse = str_hash.crc32_of_strings(t["digest"]) % nc
        return t.append_column(
            "coarse", pa.array(coarse.astype(np.int32), pa.int32()))

    def star_pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["digest", id_col]).reset_index(drop=True)
        dig = d["digest"].to_numpy()
        ids = d[id_col].to_numpy()
        new = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            new[1:] = dig[1:] != dig[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, len(d)))
        reps = np.repeat(ids[starts], sizes)
        keep = reps != ids  # drop the self row → (rep, member) per dup
        return pd.DataFrame({"id_a": pd.array(reps[keep], "int64"),
                             "id_b": pd.array(ids[keep], "int64")})

    pairs = (ds.map_batches(add_keys, batch_format="pyarrow")
             .groupby("coarse").map_groups(star_pairs, batch_format="pandas"))
    return _typed_empty_union(pairs, {"id_a": pa.int64(), "id_b": pa.int64()})


def soft_dedup_weights(ds, id_col: str = "doc_id", text_col: str = "text",
                       n_coarse: int | None = None):
    """SoftDeDup-style duplication REWEIGHTING (He et al. 2024,
    arXiv:2407.06654): instead of dropping duplicates, every row keeps a
    training-sampling weight inversely proportional to its content's
    duplication count — ``weight_micro = 1_000_000 // cluster_size`` in
    exact integer micro-units (the engine-wide order-independent
    fixed-point convention). A 3-copy document trains at ~1/3 rate, unique
    text at full rate; corpus COVERAGE is preserved, which the hard-drop
    policies (exact_dedup / near_dedup_kept) lose. Extends the reference's
    digest-dedup policy (app2.py result cache, SURVEY §2.7 D1) from
    drop-duplicates to weight-duplicates.

    Same coarse digest-prefix exchange as exact_dedup — the shuffled rows
    are (id, 32-char digest) only, text never moves — and cluster sizes
    resolve vectorized per coarse partition (sort by digest, group sizes
    from boundary diff, np.repeat broadcast; no per-digest dispatch).
    Value-exact in SQL: count(*) over md5(text) groups + the same integer
    division. → (id, digest, cluster_size, weight_micro) per input row."""
    nc = n_coarse or N_COARSE

    def add_keys(batch: pa.Table) -> pa.Table:
        t = add_md5_digest(batch, text_col).select([id_col, "digest"])
        coarse = str_hash.crc32_of_strings(t["digest"]) % nc
        return t.append_column(
            "coarse", pa.array(coarse.astype(np.int32), pa.int32()))

    def weigh(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["digest", id_col]).reset_index(drop=True)
        dig = d["digest"].to_numpy()
        new = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            new[1:] = dig[1:] != dig[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, len(d)))
        per_row = np.repeat(sizes.astype(np.int64), sizes)
        return pd.DataFrame({
            id_col: pd.array(d[id_col].to_numpy(), "int64"),
            "digest": d["digest"],
            "cluster_size": pd.array(per_row, "int64"),
            "weight_micro": pd.array(1_000_000 // per_row, "int64")})

    out = (ds.map_batches(add_keys, batch_format="pyarrow")
           .groupby("coarse").map_groups(weigh, batch_format="pandas"))
    return _typed_empty_union(out, {
        id_col: pa.int64(), "digest": pa.string(),
        "cluster_size": pa.int64(), "weight_micro": pa.int64()})


def canonical_quality_keep(ds, id_col: str = "doc_id",
                           text_col: str = "text", n_coarse: int = 64):
    """Normalization-aware exact dedup keeping the highest-QUALITY member
    per cluster — the representative-choice policy modern web pipelines
    use instead of min-id (pick the cleanest copy of a page that exists
    in several formatting variants).

    canonical form = trim(collapse-ws(lower(delete ``[^\\w\\s]``))) — two
    RE2 replaces + a lower + trim, all vectorized; cluster key =
    md5(canonical) (DuckDB ``md5()`` parity, the add_md5_digest
    convention); representative = argmax (quality_score, -id), i.e.
    greatest stages/text_analysis.quality_scores score, ties to the
    smallest id. One keyed-argmax shuffle via crawl.latest_rows_per_key
    (per-batch partial argmax first, so the exchange carries at most one
    row per (batch, digest)). Returns (id, digest, quality_score)."""
    from .crawl import latest_rows_per_key
    from .text_analysis import quality_scores

    def keyed(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch[text_col], "")
        canon = pc.utf8_trim(pc.replace_substring_regex(
            pc.replace_substring_regex(t, r"[^\w\s]", ""),
            r"\s+", " "), " ")
        canon = pc.utf8_lower(canon)
        digests = [hashlib.md5(c.encode("utf-8")).hexdigest()
                   for c in canon.to_pylist()]
        # score the null-FILLED text (the (s or '') convention, matching
        # the SQL side's coalesce): a null-text member must tie with an
        # empty-text member, not carry NaN quality that can never win
        q = quality_scores(pa.table({id_col: batch[id_col], text_col: t}),
                           text_col)["quality_score"]
        return pa.table({
            id_col: batch[id_col],
            "digest": pa.array(digests, pa.string()),
            "quality_score": q,
            "_neg_id": pc.negate(batch[id_col])})

    kept = latest_rows_per_key(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "digest", ["quality_score", "_neg_id"], n_coarse=n_coarse,
        schema={id_col: pa.int64(), "digest": pa.string(),
                "quality_score": pa.float64(), "_neg_id": pa.int64()})
    return kept.map_batches(
        lambda b: b.select([id_col, "digest", "quality_score"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------- MinHash

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
_MERSENNE = (1 << 61) - 1
_rs = np.random.RandomState(42)
_PERM_A = _rs.randint(1, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rs.randint(0, _MERSENNE, size=NUM_PERM, dtype=np.int64).astype(np.uint64)

SHINGLE_N = 3  # word n-grams


def shingle_hashes(text: str, n: int = SHINGLE_N) -> np.ndarray:
    """crc32 hashes of lowercase word n-grams (distinct)."""
    words = (text or "").lower().split()
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    return np.unique(np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64))


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64 minhash components over one shingle set (uint64)."""
    if len(shingles) == 0:
        return np.full(NUM_PERM, np.uint64(_MERSENNE))
    # (h * a + b) mod p, min over shingles — vectorized (perm, shingle)
    prod = (shingles[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def minhash_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    sigs = [minhash_signature(shingle_hashes(t)) for t in texts]
    return pa.table({
        id_col: batch[id_col],
        "signature": pa.array([s.astype(np.int64) for s in sigs], pa.list_(pa.int64())),
    })


def lsh_band_rows(batch: pa.Table, id_col: str = "doc_id",
                  include_signature: bool = True) -> pa.Table:
    """Explode signatures to (id, band_id, band_hash[, signature]) rows.

    ``include_signature=False`` is the lean two-pass form: band rows carry
    only ~24 B each instead of duplicating the full 64×int64 signature 16×
    (~8 KB/doc shuffle amplification); the signature is re-attached later
    by a partitioned join."""
    ids = batch[id_col].to_pylist()
    sigs = batch["signature"].to_pylist()
    out_id, out_band, out_hash, out_sig = [], [], [], []
    for i, sig in zip(ids, sigs):
        for b in range(BANDS):
            chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            h = hashlib.blake2b(
                np.array(chunk, dtype=np.int64).tobytes(), digest_size=8
            ).hexdigest()
            out_id.append(i)
            out_band.append(b)
            out_hash.append(h)
            if include_signature:
                out_sig.append(sig)
    cols = {
        id_col: pa.array(out_id),
        "band_id": pa.array(out_band, pa.int32()),
        "band_hash": pa.array(out_hash, pa.string()),
    }
    if include_signature:
        cols["signature"] = pa.array(out_sig, pa.list_(pa.int64()))
    return pa.table(cols)


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(np.asarray(sig_a) == np.asarray(sig_b)))


MAX_BUCKET = 64  # salt guard: skip degenerate buckets larger than this


N_COARSE = 256  # coarse shuffle partitions for tiny-group workloads



def nonempty_or_typed_table(ds, cols: "dict[str, pa.DataType]"):
    """Ray 2.49 drops all-empty blocks, so a Dataset whose every block is
    empty cannot carry a schema through ``to_pandas()`` no matter what typed
    unions sit upstream.  Materialize once; if the result has rows keep the
    Dataset (blocks stay in the object store), else hand back a typed empty
    ``pa.Table`` so consumers still see the documented columns."""
    m = ds.materialize()
    if m.count() == 0:
        return pa.table({n: pa.array([], t) for n, t in cols.items()})
    return m


def _typed_empty_union(ds, cols: "dict[str, pa.DataType]"):
    """Union a typed empty table into ``ds`` so an all-empty result keeps
    its documented schema (groupby().map_groups over zero rows otherwise
    returns a schema-less dataset that breaks downstream sorts)."""
    import ray.data

    empty = ray.data.from_arrow(pa.table(
        {name: pa.array([], ty) for name, ty in cols.items()}))
    return empty.union(ds)


def _triu_chunks(m: int, pair_chunk: int):
    """Yield (a_i, b_i) index slabs covering triu(m, 1) with ≤ pair_chunk
    elements per slab — the bounded-memory form of np.triu_indices(m, 1),
    which would materialize all m(m-1)/2 indices at once."""
    i = 0
    while i < m - 1:
        take, total = 1, m - 1 - i
        while i + take < m - 1 and total + (m - 1 - (i + take)) <= pair_chunk:
            total += m - 1 - (i + take)
            take += 1
        rows = np.arange(i, i + take)
        yield (np.repeat(rows, m - 1 - rows),
               np.concatenate([np.arange(r + 1, m) for r in rows]))
        i += take


def _bucket_pairs(df: pd.DataFrame, key_cols: list[str], id_col: str,
                  pair_fn, pair_fn_vec,
                  max_bucket: "int | None" = MAX_BUCKET,
                  clique_band_col: "str | None" = None,
                  pair_chunk: int = 1 << 22) -> tuple[list, list, list]:
    """Shared bucket-walk for banded LSH pair generation, vectorized.

    Sorts rows by bucket, handles the dominant size-2 buckets in one numpy
    pass and larger buckets with a CHUNKED triu pair sweep per bucket
    (``pair_fn_vec`` over fancy-indexed payload arrays, ≤ ``pair_chunk``
    index elements in flight — a large bucket never materializes its full
    m² index arrays at once). ``max_bucket``: buckets larger than this emit
    NO pairs — the salt guard for candidate generators whose contract is
    already approximate (MinHash banding); pass ``None`` for generators
    whose output is a documented EXACT pair set (simhash hamming ≤ k —
    its SQL oracle is a full self-join, so a silent cap would silently
    under-emit on any corpus with a >max_bucket near-dup family; the
    quadratic pair COUNT is that operator's honest output size).

    ``clique_band_col``: opt-in for banded generators whose payload is a
    hashable SCALAR fingerprint (simhash). Rows with IDENTICAL payloads
    share every band value, so (a) their intra-clique pairs are emitted
    only in band 0 — once per corpus instead of once per band — with ONE
    pair_fn evaluation broadcast across the clique, and (b) the bucket
    sweep enumerates DISTINCT payloads instead of rows, so an
    identical-fingerprint family costs O(pairs emitted), not
    O(m² pair_fn evals) × bands. Output pair set and values are identical
    (pinned by tests/test_operators.py::TestBigBucketPairs).

    ``pair_fn`` is the scalar fallback, kept for API/debug parity.
    Returns (id_a[], id_b[], value[]) with id_a < id_b.
    """
    if len(df) == 0:
        return [], [], []
    code = df.groupby(key_cols, sort=False).ngroup().to_numpy()
    order = np.argsort(code, kind="stable")
    code = code[order]
    ids = df[id_col].to_numpy()[order]
    payload = df["_payload"].to_numpy()[order]
    band = (df[clique_band_col].to_numpy()[order]
            if clique_band_col is not None else None)
    sizes = np.bincount(code)[code]
    ida, idb, vals = [], [], []
    mask2 = sizes == 2
    if mask2.any():
        idx = np.where(mask2)[0].reshape(-1, 2)  # adjacent after stable sort
        a_i, b_i = idx[:, 0], idx[:, 1]
        if band is not None:
            # equal-payload pairs recur in EVERY band (identical
            # fingerprints share all band values) — emit only in band 0
            keep2 = (payload[a_i] != payload[b_i]) | (band[a_i] == 0)
            a_i, b_i = a_i[keep2], b_i[keep2]
        if len(a_i):
            e = pair_fn_vec(payload[a_i], payload[b_i])
            A, B = ids[a_i], ids[b_i]
            lo, hi = np.minimum(A, B), np.maximum(A, B)
            keep = e[0]
            ida.extend(lo[keep].tolist()); idb.extend(hi[keep].tolist())
            vals.extend(e[1][keep].tolist())
    lim = len(df) if max_bucket is None else max_bucket
    big = (sizes >= 3) & (sizes <= lim)
    if big.any():
        for c in np.unique(code[big]):
            rows = np.where(code == c)[0]
            o = np.argsort(ids[rows], kind="stable")
            bids = ids[rows][o]
            bpay = payload[rows][o]
            if band is None:
                for a_i, b_i in _triu_chunks(len(bids), pair_chunk):
                    e = pair_fn_vec(bpay[a_i], bpay[b_i])
                    keep = e[0]
                    ida.extend(bids[a_i][keep].tolist())
                    idb.extend(bids[b_i][keep].tolist())
                    vals.extend(e[1][keep].tolist())
            else:
                _sweep_cliqued(bids, bpay, int(band[rows[0]]), pair_fn_vec,
                               pair_chunk, ida, idb, vals)
    return ida, idb, vals


def _sweep_cliqued(bids, bpay, band_val: int, pair_fn_vec, pair_chunk: int,
                   ida: list, idb: list, vals: list) -> None:
    """Big-bucket sweep with identical-payload clique compression (see
    _bucket_pairs clique_band_col). bids are id-sorted, so members within
    each payload group and cross-group min/max keep id_a < id_b."""
    uniq, inv = np.unique(bpay, return_inverse=True)
    # member index lists per payload group (stable: preserves id order)
    grp_order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[grp_order], np.arange(len(uniq) + 1))
    members = [bids[grp_order[bounds[g]:bounds[g + 1]]]
               for g in range(len(uniq))]
    if band_val == 0:
        # intra-clique pairs: one pair_fn eval per clique, broadcast
        for g, mem in enumerate(members):
            if len(mem) < 2:
                continue
            ok, val = pair_fn_vec(uniq[g:g + 1], uniq[g:g + 1])
            if not ok[0]:
                continue
            for a_i, b_i in _triu_chunks(len(mem), pair_chunk):
                ida.extend(mem[a_i].tolist())
                idb.extend(mem[b_i].tolist())
                vals.extend([val[0]] * len(a_i))
    # inter-clique pairs: sweep DISTINCT payloads, expand qualifying pairs
    for a_i, b_i in _triu_chunks(len(uniq), pair_chunk):
        ok, val = pair_fn_vec(uniq[a_i], uniq[b_i])
        for ga, gb, v in zip(a_i[ok].tolist(), b_i[ok].tolist(),
                             val[ok].tolist()):
            ma, mb = members[ga], members[gb]
            A = np.repeat(ma, len(mb))
            B = np.tile(mb, len(ma))
            lo, hi = np.minimum(A, B), np.maximum(A, B)
            ida.extend(lo.tolist()); idb.extend(hi.tolist())
            vals.extend([v] * len(A))


def _dedup_pairs_coarse(pairs_ds, val_col: str, val_type: "pa.DataType"):
    """Global pair dedup: coarse shuffle on a hash of the pair key, then a
    vectorized drop_duplicates per partition. A pair found by several bands
    carries an identical value (it is a function of the two full
    signatures), so keep-first is exact. Cheaper than a native Aggregate
    here: the pair set is small but block counts are high, and Aggregate's
    per-block fixed costs dominate (measured 12s vs ~1s on 95k rows).

    A typed empty table is unioned in so a duplicate-free corpus still
    yields a dataset with the pair schema — map_groups over zero rows
    otherwise returns a schema-less empty dataset that breaks downstream
    sorts and column references."""
    def drop_dup(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates(["id_a", "id_b"])
                [["id_a", "id_b", val_col]])

    deduped = pairs_ds.groupby("pcoarse").map_groups(drop_dup, batch_format="pandas")
    return _typed_empty_union(deduped, {"id_a": pa.int64(), "id_b": pa.int64(),
                                        val_col: val_type})


def minhash_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.7, two_pass: bool = False,
                        n_coarse: int | None = None):
    """Candidate near-dup pairs with estimated Jaccard ≥ threshold.

    shingle→minhash per batch → band explode → COARSE groupby on a hash
    prefix of (band_id, band_hash) → vectorized bucket walk emits pairs →
    coarse pair-key shuffle dedups pairs found in several bands. Grouping
    by the coarse key instead of the exact bucket key cuts Ray's per-group
    dispatch from one call per bucket (~16k tiny groups) to one per coarse
    partition (256), with identical results — a full bucket always lands in
    one coarse group. Buckets larger than MAX_BUCKET are dropped
    (degenerate content — e.g. empty docs).

    ``two_pass=True`` selects the 100 TB-scale variant: band rows shuffle
    WITHOUT the signature (≈24 B vs ≈8 KB per row, a ~16× signature-traffic
    cut), candidate pairs are deduped first, then each pair's two signatures
    are re-attached by two partitioned hash joins against the (materialized)
    signature table and the estimate is computed once per pair. Identical
    output; trades one extra shuffle per side for the 16× amplification.
    """
    nc = n_coarse or N_COARSE
    if two_pass:
        return _minhash_pairs_two_pass(ds, id_col, text_col, threshold, nc)
    def pairs_in_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"signature": "_payload"})

        def vec(sa, sb):
            e = (np.vstack(sa) == np.vstack(sb)).mean(axis=1)
            return e >= threshold, e

        def one(sa, sb):
            e = float(np.mean(np.asarray(sa) == np.asarray(sb)))
            return e if e >= threshold else None

        ida, idb, est = _bucket_pairs(df, ["band_id", "band_hash"], id_col, one, vec)
        out = pd.DataFrame({"id_a": pd.array(ida, "int64"),
                            "id_b": pd.array(idb, "int64"),
                            "est_jaccard": pd.array(est, "float64")})
        out = out.drop_duplicates(["id_a", "id_b"])  # partial (within-coarse)
        out["pcoarse"] = ((out["id_a"] * 1000003 + out["id_b"]) % nc).astype("int32")
        return out

    def add_coarse(batch: pa.Table) -> pa.Table:
        return _band_coarse(batch, nc)

    sigs = ds.map_batches(lambda b: minhash_batch(b, id_col, text_col),
                          batch_format="pyarrow")
    bands = sigs.map_batches(lambda b: lsh_band_rows(b, id_col),
                             batch_format="pyarrow")
    pairs = (bands.map_batches(add_coarse, batch_format="pyarrow")
             .groupby("coarse").map_groups(pairs_in_coarse, batch_format="pandas"))
    return _dedup_pairs_coarse(pairs, "est_jaccard", pa.float64())


def _band_coarse(batch: pa.Table, nc: int = N_COARSE) -> pa.Table:
    from ..str_hash import crc32_of_strings
    bid = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    coarse = ((crc32_of_strings(batch["band_hash"]) ^ bid) % nc) \
        .astype(np.int32)
    return batch.append_column("coarse", pa.array(coarse))


def _minhash_pairs_two_pass(ds, id_col: str, text_col: str, threshold: float,
                            nc: int = N_COARSE):
    """Two-pass MinHash LSH (see minhash_dedup_pairs two_pass flag).

    Pass 1: lean band rows (no signature) → coarse bucket groupby → all
    within-bucket candidate pairs → pair-key dedup. Pass 2: two partitioned
    hash joins (tagged union + coarse groupby + pandas merge, the same join
    shape as dup_clusters) attach sig_a then sig_b; the Jaccard estimate is
    computed vectorized once per distinct pair and thresholded. Output is
    identical to the one-pass path: est is a pure function of the two full
    signatures, so WHERE a pair was found never changes its value."""
    import ray.data

    sigs = ds.map_batches(lambda b: minhash_batch(b, id_col, text_col),
                          batch_format="pyarrow").materialize()

    bands = sigs.map_batches(
        lambda b: lsh_band_rows(b, id_col, include_signature=False),
        batch_format="pyarrow")

    def cands_in_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_payload=np.int8(0))  # bucket walk without payloads
        ida, idb, _ = _bucket_pairs(
            df, ["band_id", "band_hash"], id_col,
            lambda a, b: 0.0,
            lambda sa, sb: (np.ones(len(sa), dtype=bool),
                            np.zeros(len(sa), dtype=np.float64)))
        out = pd.DataFrame({"id_a": pd.array(ida, "int64"),
                            "id_b": pd.array(idb, "int64")})
        return out.drop_duplicates(["id_a", "id_b"])  # partial (within-coarse)

    # NO separate pair-dedup shuffle: every copy of a pair (found in several
    # bands/coarse buckets) lands in the same join_a partition — it is keyed
    # by id_a — so the global dedup folds into join_a's drop_duplicates
    cands = (bands.map_batches(lambda b: _band_coarse(b, nc),
                               batch_format="pyarrow")
             .groupby("coarse").map_groups(cands_in_coarse, batch_format="pandas"))

    def tag_sigs(batch: pa.Table) -> pa.Table:
        node = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(node)
        return pa.table({
            "kind": pa.array(np.ones(n, np.int8)),
            "id_a": pa.array(np.full(n, -1, np.int64)),
            "id_b": pa.array(np.full(n, -1, np.int64)),
            "sig_a": pa.array([None] * n, pa.list_(pa.int64())),
            "key": pa.array(node),
            "sig": batch["signature"],
            "jcoarse": pa.array((node % nc).astype(np.int32))})

    def tag_pairs(batch: pa.Table, key_col: str) -> pa.Table:
        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(key)
        sig_a = (batch["sig_a"] if "sig_a" in batch.column_names
                 else pa.array([None] * n, pa.list_(pa.int64())))
        return pa.table({
            "kind": pa.array(np.zeros(n, np.int8)),
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "sig_a": sig_a,
            "key": pa.array(key),
            "sig": pa.array([None] * n, pa.list_(pa.int64())),
            "jcoarse": pa.array((key % nc).astype(np.int32))})

    def join_a(df: pd.DataFrame) -> pa.Table:
        # returns ARROW with an explicit list<int64> sig column — a pandas
        # return would make Ray re-encode the numpy-array column as a tensor
        # extension type, which cannot mix with the arrow list blocks of the
        # next union during its shuffle
        edg, lbl = df[df["kind"] == 0], df[df["kind"] == 1]
        if edg.empty:
            m = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "sig": pd.Series([], dtype="object")})
        else:
            # global pair dedup happens HERE (all copies of a pair share
            # id_a, the partition key of this join)
            m = (edg[["id_a", "id_b", "key"]]
                 .drop_duplicates(["id_a", "id_b"])
                 .merge(lbl[["key", "sig"]], on="key", how="inner"))
        return pa.table({
            "id_a": pa.array(m["id_a"].to_numpy(), pa.int64()),
            "id_b": pa.array(m["id_b"].to_numpy(), pa.int64()),
            "sig_a": pa.array([np.asarray(s, dtype=np.int64) for s in m["sig"]],
                              pa.list_(pa.int64()))})

    def join_b_estimate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "est_jaccard": pd.Series([], dtype="float64")})
        edg, lbl = df[df["kind"] == 0], df[df["kind"] == 1]
        if edg.empty:
            return empty
        m = edg[["id_a", "id_b", "sig_a", "key"]].merge(
            lbl[["key", "sig"]], on="key", how="inner")
        if m.empty:
            return empty
        est = (np.vstack(m["sig_a"].to_numpy()) ==
               np.vstack(m["sig"].to_numpy())).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({"id_a": m["id_a"].to_numpy()[keep],
                             "id_b": m["id_b"].to_numpy()[keep],
                             "est_jaccard": est[keep]})

    with_a = (cands.map_batches(lambda b: tag_pairs(b, "id_a"),
                                batch_format="pyarrow")
              .union(sigs.map_batches(tag_sigs, batch_format="pyarrow"))
              .groupby("jcoarse").map_groups(join_a, batch_format="pandas"))
    pairs = (with_a.map_batches(lambda b: tag_pairs(b, "id_b"),
                                batch_format="pyarrow")
             .union(sigs.map_batches(tag_sigs, batch_format="pyarrow"))
             .groupby("jcoarse").map_groups(join_b_estimate,
                                            batch_format="pandas"))
    return _typed_empty_union(pairs, {"id_a": pa.int64(), "id_b": pa.int64(),
                                      "est_jaccard": pa.float64()})


# ------------------------------- value-exact MinHash (md5-hash32 domain)

MD5MH_PERM = 16
MD5MH_BANDS = 8
MD5MH_ROWS = MD5MH_PERM // MD5MH_BANDS     # 2 rows per band
P31 = (1 << 31) - 1                        # Mersenne prime 2^31 - 1
_rs31 = np.random.RandomState(7)
MD5MH_A = _rs31.randint(1, P31, size=MD5MH_PERM).astype(np.int64)
MD5MH_B = _rs31.randint(0, P31, size=MD5MH_PERM).astype(np.int64)


def md5_shingle32(text: str, n: int = SHINGLE_N) -> np.ndarray:
    """md5-hash32 of lowercase word n-grams (same gram rule as
    shingle_hashes; the md5-hash32 bucket rule shared with
    target_affinity / source KL: first 8 hex chars as a 32-bit int,
    exactly ``('0x' || substring(md5(g), 1, 8))::UBIGINT`` in DuckDB).
    Duplicates are NOT removed — min() is multiset-invariant."""
    words = (text or "").lower().split()
    if not words:
        return np.empty(0, np.int64)
    if len(words) < n:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    return np.array([int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                     for g in grams], np.int64)


def md5_minhash_batch(batch: pa.Table, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """16 affine minhash components over the md5-hash32 shingle domain:
    s_i = min over shingles of (A_i * (x % p) + B_i) % p, p = 2^31 - 1.
    Every product is < 2^62 — plain int64 on BOTH sides, no modular wrap
    (the uint64 wrap in minhash_signature is what makes the crc32 family
    un-oracle-able). Docs with ZERO shingles (empty text) are EXCLUDED —
    the SQL side has no gram rows for them, and the banding would
    otherwise pair all empties at the sentinel signature (the simhash-0
    convention)."""
    ids, sigs = [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        x = md5_shingle32(t)
        if len(x) == 0:
            continue
        xm = x % P31
        prod = (MD5MH_A[:, None] * xm[None, :] + MD5MH_B[:, None]) % P31
        ids.append(i)
        sigs.append(prod.min(axis=1))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "signature": pa.array([s.tolist() for s in sigs],
                              pa.list_(pa.int64()))})


def minhash_pairs_md5(ds, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.5, n_coarse: int | None = None):
    """VALUE-EXACT MinHash LSH — the oracle-able sibling of
    minhash_dedup_pairs. Same pipeline shape (signature → band explode →
    coarse bucket groupby → bucket walk → pair-key dedup), but every step
    has an exact DuckDB form: md5-hash32 shingles, int64 affine min-hash
    mod 2^31-1, 8×2 banding on the LITERAL component pair (h1, h2) —
    never a digest of the band, so no hash-collision caveat — and
    est_jaccard = eq_count/16.0 (an exact dyadic rational on both sides).
    ``max_bucket=None``: the emitted pair set is documented-EXACT (the
    SQL oracle is a full band self-join), so no salt cap may drop pairs;
    the chunked triu sweep bounds memory instead.

    Scale note: this is the CORRECTNESS-ANCHOR variant (16 perms, md5 in
    a Python loop per gram); the crc32/64-perm family remains the
    throughput path — this one pins the banding/threshold logic to SQL.
    """
    nc = n_coarse or N_COARSE

    def band_rows(batch: pa.Table) -> pa.Table:
        t = md5_minhash_batch(batch, id_col, text_col)
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "band_id": pa.array([], pa.int32()),
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "signature": pa.array([], pa.list_(pa.int64())),
                "coarse": pa.array([], pa.int32())})
        S = np.vstack(t["signature"].to_pylist()).astype(np.int64)
        rid = np.repeat(t[id_col].to_numpy(), MD5MH_BANDS)
        band = np.tile(np.arange(MD5MH_BANDS, dtype=np.int32), n)
        h1 = S[:, 0::2].reshape(-1)
        h2 = S[:, 1::2].reshape(-1)
        sig_rep = [s for s in t["signature"].to_pylist()
                   for _ in range(MD5MH_BANDS)]
        coarse = ((h1 * 1000003 + h2 + band) % nc).astype(np.int32)
        return pa.table({
            id_col: pa.array(rid, pa.int64()),
            "band_id": pa.array(band, pa.int32()),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "signature": pa.array(sig_rep, pa.list_(pa.int64())),
            "coarse": pa.array(coarse)})

    def pairs_in_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"signature": "_payload"})

        def vec(sa, sb):
            e = (np.vstack(sa) == np.vstack(sb)).sum(axis=1) / float(
                MD5MH_PERM)
            return e >= threshold, e

        def one(sa, sb):
            e = float(np.sum(np.asarray(sa) == np.asarray(sb))) / MD5MH_PERM
            return e if e >= threshold else None

        ida, idb, est = _bucket_pairs(df, ["band_id", "h1", "h2"], id_col,
                                      one, vec, max_bucket=None)
        out = pd.DataFrame({"id_a": pd.array(ida, "int64"),
                            "id_b": pd.array(idb, "int64"),
                            "est_jaccard": pd.array(est, "float64")})
        out = out.drop_duplicates(["id_a", "id_b"])
        out["pcoarse"] = ((out["id_a"] * 1000003 + out["id_b"]) % nc) \
            .astype("int32")
        return out

    pairs = (ds.map_batches(band_rows, batch_format="pyarrow")
             .groupby("coarse").map_groups(pairs_in_coarse,
                                           batch_format="pandas"))
    return _dedup_pairs_coarse(pairs, "est_jaccard", pa.float64())


def _cross_chunks(m: int, n: int, pair_chunk: int):
    """Yield (a_i, b_i) index slabs covering the full m×n cross product
    with ≤ ~pair_chunk elements per slab — the rectangular sibling of
    _triu_chunks for old×new candidate sweeps."""
    if m == 0 or n == 0:
        return
    rows_per = max(1, pair_chunk // n)
    cols = np.arange(n)
    for i in range(0, m, rows_per):
        rows = np.arange(i, min(i + rows_per, m))
        yield np.repeat(rows, n), np.tile(cols, len(rows))


def minhash_pairs_md5_incremental(ds, old_pred,
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  threshold: float = 0.5,
                                  n_coarse: int | None = None):
    """INCREMENTAL near-dedup: candidate pairs between a NEW shard and an
    existing SNAPSHOT only — the steady-state production shape (each crawl
    near-dedups against everything already ingested; incremental_dedup is
    the exact-digest sibling, this is the MinHash one). ``old_pred`` maps
    an int64 id array to a bool snapshot-membership array (a pure function
    of the key, reproducible in SQL). Returns (new_id, old_id,
    est_jaccard) for every mixed pair sharing an LSH band with estimated
    Jaccard ≥ threshold — identical arithmetic to minhash_pairs_md5
    (md5-hash32 shingles, 16 affine perms mod 2^31-1, 8×2 banding,
    est = eq_count/16), so the same SQL oracle chain applies with an
    is_old split on the band self-join.

    Scale shape: same band exchange as minhash_pairs_md5, but the bucket
    walk sweeps the OLD×NEW rectangle instead of the full triangle — a
    bucket dominated by snapshot rows (the common case: the snapshot is
    the LARGER side at 100 TB) costs old·new, never old², and snapshot-
    internal pairs are never enumerated at all. Bounded slabs via
    _cross_chunks. The snapshot side is never broadcast — both sides ride
    the same coarse band shuffle and meet in-partition."""
    nc = n_coarse or N_COARSE

    def band_rows(batch: pa.Table) -> pa.Table:
        t = md5_minhash_batch(batch, id_col, text_col)
        n = t.num_rows
        if n == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "is_old": pa.array([], pa.bool_()),
                "band_id": pa.array([], pa.int32()),
                "h1": pa.array([], pa.int64()),
                "h2": pa.array([], pa.int64()),
                "signature": pa.array([], pa.list_(pa.int64())),
                "coarse": pa.array([], pa.int32())})
        S = np.vstack(t["signature"].to_pylist()).astype(np.int64)
        ids = t[id_col].to_numpy()
        old = np.asarray(old_pred(ids), bool)
        rid = np.repeat(ids, MD5MH_BANDS)
        rold = np.repeat(old, MD5MH_BANDS)
        band = np.tile(np.arange(MD5MH_BANDS, dtype=np.int32), n)
        h1 = S[:, 0::2].reshape(-1)
        h2 = S[:, 1::2].reshape(-1)
        sig_rep = [s for s in t["signature"].to_pylist()
                   for _ in range(MD5MH_BANDS)]
        coarse = ((h1 * 1000003 + h2 + band) % nc).astype(np.int32)
        return pa.table({
            id_col: pa.array(rid, pa.int64()),
            "is_old": pa.array(rold),
            "band_id": pa.array(band, pa.int32()),
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "signature": pa.array(sig_rep, pa.list_(pa.int64())),
            "coarse": pa.array(coarse)})

    def cross_pairs(df: pd.DataFrame) -> pd.DataFrame:
        new_id, old_id, est = [], [], []
        if len(df):
            code = (df.groupby(["band_id", "h1", "h2"], sort=False)
                    .ngroup().to_numpy())
            order = np.argsort(code, kind="stable")
            code = code[order]
            ids = df[id_col].to_numpy()[order]
            olds = df["is_old"].to_numpy()[order]
            payload = df["signature"].to_numpy()[order]
            bounds = np.searchsorted(code, np.arange(code[-1] + 2))
            for g in range(len(bounds) - 1):
                s, e = bounds[g], bounds[g + 1]
                if e - s < 2:
                    continue
                om = olds[s:e]
                if om.all() or not om.any():
                    continue
                oi = np.where(om)[0] + s
                ni = np.where(~om)[0] + s
                So = np.vstack(payload[oi])
                Sn = np.vstack(payload[ni])
                for a_i, b_i in _cross_chunks(len(oi), len(ni), 1 << 22):
                    ev = (So[a_i] == Sn[b_i]).sum(axis=1) \
                        / float(MD5MH_PERM)
                    ok = ev >= threshold
                    old_id.extend(ids[oi[a_i[ok]]].tolist())
                    new_id.extend(ids[ni[b_i[ok]]].tolist())
                    est.extend(ev[ok].tolist())
        out = pd.DataFrame({"id_a": pd.array(new_id, "int64"),
                            "id_b": pd.array(old_id, "int64"),
                            "est_jaccard": pd.array(est, "float64")})
        out = out.drop_duplicates(["id_a", "id_b"])
        out["pcoarse"] = ((out["id_a"] * 1000003 + out["id_b"]) % nc) \
            .astype("int32")
        return out

    pairs = (ds.map_batches(band_rows, batch_format="pyarrow")
             .groupby("coarse").map_groups(cross_pairs,
                                           batch_format="pandas"))
    out = _dedup_pairs_coarse(pairs, "est_jaccard", pa.float64())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"new_id": batch["id_a"], "old_id": batch["id_b"],
                         "est_jaccard": batch["est_jaccard"]})

    if isinstance(out, pa.Table):
        return out.rename_columns(["new_id", "old_id", "est_jaccard"])
    return out.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------- SimHash

def _token_hash64(token: str) -> int:
    """Top-64 bits of md5(token) — md5 (not blake2) so the simhash_docs
    SQL oracle reproduces it exactly:
    ``cast(('0x' || substring(md5(tok), 1, 16)) AS UBIGINT)``."""
    return int(hashlib.md5(token.encode()).hexdigest()[:16], 16)


def simhash64(text: str) -> int:
    """64-bit frequency-weighted simhash over \\w+ tokens (lowercased).
    ASCII \\w — the engine-wide RE2 tokenizer convention (pyarrow/DuckDB
    \\w is ASCII-only), so the SQL oracle tokenizes identically."""
    import re
    counts: dict[str, int] = {}
    for tok in re.findall(r"\w+", (text or "").lower(), re.ASCII):
        counts[tok] = counts.get(tok, 0) + 1
    if not counts:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok, c in counts.items():
        h = np.uint64(_token_hash64(tok))
        bits = (h >> shifts) & np.uint64(1)
        votes += np.where(bits == 1, c, -c)
    return int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))


def simhash_batch(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hashes = [simhash64(t) for t in texts]
    return pa.table({
        id_col: batch[id_col],
        # store as int64 two's-complement view of the uint64
        "simhash": pa.array([np.uint64(h).astype(np.int64) for h in hashes], pa.int64()),
    })


def simhash_near_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 3, n_coarse: int | None = None):
    """Near-dup pairs by simhash banding: 4 bands × 16 bits; docs sharing any
    band collide, verified by full Hamming distance ≤ max_hamming.

    Tokenless docs are EXCLUDED from pair generation: a doc with no ASCII
    \\w token (CJK/Cyrillic/emoji-only, empty) gets simhash 0 — content-
    free, not a fingerprint — and on a multilingual corpus every such doc
    would otherwise collide at hamming 0 and mass-merge as one giant
    near-dup clique. The simhash_pairs_doubled SQL oracle carries the same
    ``simhash <> 0`` predicate on both join sides."""
    nc = n_coarse or N_COARSE
    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hashes = batch["simhash"].to_pylist()
        oid, ob, oh, osim = [], [], [], []
        for i, h in zip(ids, hashes):
            u = np.int64(h).astype(np.uint64)
            for b in range(4):
                oid.append(i)
                ob.append(b)
                oh.append(int((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
                osim.append(h)
        return pa.table({id_col: pa.array(oid), "band_id": pa.array(ob, pa.int32()),
                         "band_val": pa.array(oh, pa.int64()),
                         "simhash": pa.array(osim, pa.int64())})

    def pairs_in_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"simhash": "_payload"})

        def vec(sa, sb):
            x = (sa.astype(np.int64).astype(np.uint64)
                 ^ sb.astype(np.int64).astype(np.uint64))
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            return ham <= max_hamming, ham

        def one(sa, sb):
            x = np.uint64(np.int64(sa)) ^ np.uint64(np.int64(sb))
            ham = bin(int(x)).count("1")
            return ham if ham <= max_hamming else None

        # max_bucket=None: simhash banding + hamming verify is an EXACT
        # pair set (full recall at hamming ≤ max for 4×16 bands) and its
        # oracle is a full self-join — a capped bucket would silently
        # under-emit on any corpus with a big near-identical family.
        # clique_band_col: identical simhashes share all 4 bands — their
        # pairs emit once (band 0) with one hamming eval per clique, and
        # the bucket sweep runs over distinct fingerprints, not rows
        ida, idb, ham = _bucket_pairs(df, ["band_id", "band_val"], id_col,
                                      one, vec, max_bucket=None,
                                      clique_band_col="band_id")
        out = pd.DataFrame({"id_a": pd.array(ida, "int64"),
                            "id_b": pd.array(idb, "int64"),
                            "hamming": pd.array(ham, "int64")})
        out = out.drop_duplicates(["id_a", "id_b"])
        out["pcoarse"] = ((out["id_a"] * 1000003 + out["id_b"]) % nc).astype("int32")
        return out

    def add_coarse(batch: pa.Table) -> pa.Table:
        # coarse partition of the (band_id, band_val) key space (see the
        # minhash variant for rationale: nc dispatches instead of ~256k)
        bid = np.asarray(batch["band_id"])
        bval = np.asarray(batch["band_val"])
        coarse = ((bval * np.int64(2654435761) + bid) % nc).astype(np.int32)
        return batch.append_column("coarse", pa.array(coarse, pa.int32()))

    sims = ds.map_batches(lambda b: simhash_batch(b, id_col, text_col),
                          batch_format="pyarrow")
    # tokenless docs (simhash 0) carry no content signal — see docstring
    sims = sims.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b["simhash"], 0))),
        batch_format="pyarrow")
    bands = sims.map_batches(band_rows, batch_format="pyarrow")
    pairs = (bands.map_batches(add_coarse, batch_format="pyarrow")
             .groupby("coarse").map_groups(pairs_in_coarse, batch_format="pandas"))
    return _dedup_pairs_coarse(pairs, "hamming", pa.int64())


# ---------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard(text_a: str, text_b: str, n: int = SHINGLE_N) -> float:
    a = set(shingle_hashes(text_a, n).tolist())
    b = set(shingle_hashes(text_b, n).tolist())
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def ngram_set(text: str, n: int = SHINGLE_N) -> set[str]:
    """Distinct word n-gram STRINGS (exact — no hashing, so results are
    collision-free and reproducible in SQL for the oracle)."""
    words = (text or "").lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def ngram_jaccard_exact(text_a: str, text_b: str, n: int = SHINGLE_N) -> float:
    a, b = ngram_set(text_a, n), ngram_set(text_b, n)
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def adjacent_ngram_jaccard(ds, id_col: str = "doc_id", text_col: str = "text",
                           n: int = SHINGLE_N, n_coarse: int | None = None):
    """Exact n-gram Jaccard between each (id, id+1) document pair.

    Pairwise ops over a Dataset need co-location, not a driver loop: each row
    fans out to at most two pair groups — as the LEFT member of pair ``id``
    and the RIGHT member of pair ``id-1`` — then ``groupby(pair_id)`` brings
    both texts of a pair to one task. The shuffle moves each text exactly
    twice regardless of corpus size (no broadcast, no N² join).
    Returns (id_a, id_b = id_a+1, jaccard) for pairs where both ids exist.
    """
    nc = n_coarse or N_COARSE

    def fan_out(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        pid, role, txt = [], [], []
        for i, t in zip(ids, texts):
            pid.append(i); role.append("a"); txt.append(t)
            if i > 0:
                pid.append(i - 1); role.append("b"); txt.append(t)
        coarse = [p % nc for p in pid]
        return pa.table({"pair_id": pa.array(pid, pa.int64()),
                         "coarse": pa.array(coarse, pa.int32()),
                         "role": pa.array(role, pa.string()),
                         "text": pa.array(txt, pa.string())})

    def pairs_in_coarse(df: pd.DataFrame) -> pd.DataFrame:
        ida, idb, jac = [], [], []
        for p, group in df.groupby("pair_id", sort=False):
            roles = dict(zip(group["role"], group["text"]))
            if "a" in roles and "b" in roles:
                ida.append(int(p)); idb.append(int(p) + 1)
                jac.append(ngram_jaccard_exact(roles["a"], roles["b"], n))
        return pd.DataFrame({"id_a": pd.array(ida, "int64"),
                             "id_b": pd.array(idb, "int64"),
                             "jaccard": pd.array(jac, "float64")})

    fanned = ds.map_batches(fan_out, batch_format="pyarrow")
    return _typed_empty_union(
        fanned.groupby("coarse").map_groups(pairs_in_coarse, batch_format="pandas"),
        {"id_a": pa.int64(), "id_b": pa.int64(), "jaccard": pa.float64()})


def _verify_pairs_core(pairs_ds, docs_ds, id_col: str, text_col: str,
                       n_coarse: int | None, semi_join_max_ids: int,
                       kernel_factory, extra_cols: "dict[str, pa.DataType]"):
    """Shared candidate→verify repartition-join machinery (see
    verify_pairs_ngram for the full scale rationale). ``kernel_factory()``
    is called once per verify partition and must return
    ``fn(id_a, text_a, id_b, text_b) -> tuple`` producing one value per
    ``extra_cols`` entry — per-partition state (memo caches, encoders)
    lives in the factory closure.

    Two-shuffle repartition join (no driver materialization, no broadcast —
    the documents side may be the whole corpus):
      1. pairs explode to per-member refs (id, pid, side); union with the
         documents rows (id, text); groupby(id) stamps the text onto every
         ref of that document;
      2. groupby(pid) reunites the two stamped sides and runs the kernel.
    Both shuffles group on a COARSE partition of their key (id % N_COARSE,
    crc32(pid) % N_COARSE) and resolve exact keys with a vectorized pandas
    merge/join inside the group fn — Ray dispatches 256 groups instead of
    one per document/pair (see minhash_dedup_pairs rationale).

    SEMI-JOIN REDUCTION: only docs that appear in some pair need to enter
    the stamp shuffle, and that id set is proportional to the DUPLICATE
    set, not the corpus. When the pair count is small enough that the
    distinct-id array fits a broadcast (≤ ``semi_join_max_ids``), the ids
    are collected once (bounded by the guard, unlike an unbounded label
    loop), broadcast via ray.put, and the corpus side is mask-filtered with
    a vectorized binary search BEFORE the shuffle — at a 20-30% dup rate
    this keeps 70-80% of a 100 TB corpus's text bytes out of the exchange.
    Larger pair sets fall back to the full-corpus repartition join.
    Returns (id_a, id_b, est_jaccard, *extra_cols).
    """
    import ray

    nc = n_coarse or N_COARSE

    pairs_mat = pairs_ds.materialize()
    ids_ref = None
    if pairs_mat.count() * 2 <= semi_join_max_ids:
        # numpy-native unique over the arrow columns (no Python int boxing),
        # sorted once here so the probe side can binary-search per batch
        chunks = [
            np.concatenate([b["id_a"].to_numpy(zero_copy_only=False),
                            b["id_b"].to_numpy(zero_copy_only=False)])
            for b in pairs_mat.select_columns(["id_a", "id_b"]).iter_batches(
                batch_size=65536, batch_format="pyarrow")]
        ids_sorted = (np.unique(np.concatenate(chunks).astype(np.int64))
                      if chunks else np.array([], dtype=np.int64))
        ids_ref = ray.put(ids_sorted)
    pairs_ds = pairs_mat

    def pair_refs(batch: pa.Table) -> pa.Table:
        # fully vectorized interleave: (a,b) → rows [a:"a", b:"b"] per pair
        n = batch.num_rows
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        rid = np.empty(2 * n, np.int64)
        rid[0::2] = a
        rid[1::2] = b
        keys = np.char.add(np.char.add(a.astype("U20"), "_"),
                           b.astype("U20"))
        ej = np.full(2 * n, np.nan)
        ej_mask = np.ones(2 * n, bool)  # True = null
        if "est_jaccard" in batch.column_names:
            est = batch["est_jaccard"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ej[0::2] = est
            ej_mask[0::2] = np.isnan(est)
        return pa.table({"id": pa.array(rid),
                         "coarse": pa.array((rid % nc).astype(np.int32)),
                         "pid": pa.array(np.repeat(keys, 2), pa.string()),
                         "side": pa.array(np.tile(np.array(["a", "b"],
                                                           object), n),
                                          pa.string()),
                         "text": pa.array([None] * (2 * n), pa.string()),
                         "est_jaccard": pa.array(ej, pa.float64(),
                                                 mask=ej_mask)})

    def doc_rows(batch: pa.Table) -> pa.Table:
        nn = batch.num_rows
        ids = batch[id_col].to_pylist()
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "coarse": pa.array([i % nc for i in ids], pa.int32()),
                         "pid": pa.array([None] * nn, pa.string()),
                         "side": pa.array(["t"] * nn, pa.string()),
                         "text": pc.cast(batch[text_col], pa.string()),
                         "est_jaccard": pa.array([None] * nn, pa.float64())})

    def stamp_coarse(df: pd.DataFrame) -> pd.DataFrame:
        texts = (df[df["side"] == "t"][["id", "text"]]
                 .drop_duplicates("id").rename(columns={"text": "doc_text"}))
        refs = df[df["side"] != "t"][["id", "pid", "side", "est_jaccard"]]
        out = refs.merge(texts, on="id", how="inner")
        from ..str_hash import str_coarse
        out["pcoarse"] = str_coarse(out["pid"], nc)
        return out[["pid", "pcoarse", "side", "doc_text", "est_jaccard"]]

    def verify_coarse(df: pd.DataFrame) -> pa.Table:
        a_side = df[df["side"] == "a"].set_index("pid")
        b_side = df[df["side"] == "b"].set_index("pid")
        joined = a_side.join(b_side, how="inner", lsuffix="_a", rsuffix="_b")
        kernel = kernel_factory()
        ida, idb, est = [], [], []
        extra = [[] for _ in extra_cols]
        for p, row in joined.iterrows():
            x, y = (int(v) for v in p.split("_"))
            ida.append(x); idb.append(y)
            est.append(row["est_jaccard_a"])
            for lst, v in zip(extra, kernel(x, row["doc_text_a"],
                                            y, row["doc_text_b"])):
                lst.append(v)
        return pa.table(
            {"id_a": pa.array(ida, pa.int64()),
             "id_b": pa.array(idb, pa.int64()),
             "est_jaccard": pa.array(est, pa.float64()),
             **{name: pa.array(vals, typ) for (name, typ), vals
                in zip(extra_cols.items(), extra)}})

    def filter_members(batch: pa.Table) -> pa.Table:
        # membership via binary search against the PRE-SORTED broadcast ids
        # (np.isin would re-sort the whole id array per batch)
        ids_sorted = ray.get(ids_ref)
        keys = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids_sorted) == 0:
            return batch.slice(0, 0)
        pos = np.searchsorted(ids_sorted, keys)
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        mask = ids_sorted[pos_c] == keys
        return batch.filter(pa.array(mask))

    refs = pairs_ds.map_batches(pair_refs, batch_format="pyarrow")
    if ids_ref is not None:
        docs_ds = docs_ds.map_batches(filter_members, batch_format="pyarrow")
    docs = docs_ds.map_batches(doc_rows, batch_format="pyarrow")
    stamped = refs.union(docs).groupby("coarse").map_groups(
        stamp_coarse, batch_format="pandas")
    return _typed_empty_union(
        stamped.groupby("pcoarse").map_groups(verify_coarse, batch_format="pandas"),
        {"id_a": pa.int64(), "id_b": pa.int64(), "est_jaccard": pa.float64(),
         **extra_cols})


def verify_pairs_ngram(pairs_ds, docs_ds, id_col: str = "doc_id",
                       text_col: str = "text", n: int = SHINGLE_N,
                       n_coarse: int | None = None,
                       semi_join_max_ids: int = 5_000_000):
    """Attach exact n-gram Jaccard to candidate pairs, fully distributed
    (the _verify_pairs_core repartition join; see its docstring for the
    scale rationale). Returns (id_a, id_b, est_jaccard, jaccard)."""
    def kernel_factory():
        # per-DOC gram-set memo: a doc in k pairs of this partition builds
        # its n-gram set once, not k times (the gram split dominates the
        # kernel; texts repeat heavily in near-dup pair sets). BOUNDED: a
        # partition full of distinct large docs must not hold every gram
        # set to completion — past the cap, misses recompute instead
        gram_cache: dict[int, set] = {}
        GRAM_CACHE_MAX = 4096

        def grams_of(did: int, text) -> set:
            g = gram_cache.get(did)
            if g is None:
                g = ngram_set(text, n)
                if len(gram_cache) < GRAM_CACHE_MAX:
                    gram_cache[did] = g
            return g

        def kernel(x, ta, y, tb):
            ga, gb = grams_of(x, ta), grams_of(y, tb)
            return (1.0 if not ga and not gb
                    else len(ga & gb) / len(ga | gb),)

        return kernel

    return _verify_pairs_core(pairs_ds, docs_ds, id_col, text_col, n_coarse,
                              semi_join_max_ids, kernel_factory,
                              {"jaccard": pa.float64()})


def levenshtein_bytes(a: "str | None", b: "str | None") -> int:
    """Exact Levenshtein distance over UTF-8 BYTES. Byte semantics (not
    codepoints) are deliberate: DuckDB's ``levenshtein()`` is byte-based
    (``levenshtein('café','cafe') = 2``), so this kernel stays
    oracle-equal beyond ASCII. Vectorized row DP: the Python loop runs
    over the SHORTER string, each row is O(len) numpy ops; the
    sequential insertion relaxation cur[j] = min(cand[j], cur[j-1]+1)
    is exact as a running-min transform on cand[j]-j."""
    ab = (a or "").encode("utf-8")
    bb = (b or "").encode("utf-8")
    if ab == bb:
        return 0
    la, lb = len(ab), len(bb)
    if la == 0 or lb == 0:
        return la or lb
    if la > lb:
        ab, bb, la, lb = bb, ab, lb, la
    bv = np.frombuffer(bb, np.uint8).astype(np.int64)
    prev = np.arange(lb + 1, dtype=np.int64)
    jix = np.arange(1, lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        sub = prev[:-1] + (bv != ab[i - 1])
        cand = np.minimum(prev[1:] + 1, sub)
        # cur[j] = min_{k<=j} (cand-with-cur0[k] + (j-k)); cand-j running min
        f = np.minimum.accumulate(
            np.concatenate(([np.int64(i)], cand - jix)))
        prev = np.concatenate(([np.int64(i)], f[1:] + jix))
    return int(prev[-1])


def verify_pairs_edit(pairs_ds, docs_ds, id_col: str = "doc_id",
                      text_col: str = "text", near_sim: float = 0.9,
                      n_coarse: int | None = None,
                      semi_join_max_ids: int = 5_000_000):
    """Attach the exact Levenshtein edit distance to candidate pairs —
    the edit-level verify stage (LSH recall, character-exact precision;
    catches near-dups whose edits are character-local rather than
    token-local, where n-gram Jaccard over-penalizes). Same
    _verify_pairs_core repartition join as verify_pairs_ngram.

    Returns (id_a, id_b, est_jaccard, edit_dist, edit_sim, is_near):
    edit_dist is byte-exact Levenshtein (levenshtein_bytes — DuckDB
    ``levenshtein()`` parity), edit_sim = 1 − dist/max(octet_len) is one
    IEEE division and one subtraction of exact integers (bit-equal in
    SQL), both-empty pairs score 1.0, and is_near = edit_sim ≥
    ``near_sim``."""
    def kernel_factory():
        enc_cache: dict[int, int] = {}
        ENC_CACHE_MAX = 65536

        def octets(did: int, text) -> int:
            v = enc_cache.get(did)
            if v is None:
                v = len((text or "").encode("utf-8"))
                if len(enc_cache) < ENC_CACHE_MAX:
                    enc_cache[did] = v
            return v

        def kernel(x, ta, y, tb):
            dist = levenshtein_bytes(ta, tb)
            m = max(octets(x, ta), octets(y, tb))
            sim = 1.0 - dist / m if m else 1.0
            return dist, sim, sim >= near_sim

        return kernel

    return _verify_pairs_core(pairs_ds, docs_ds, id_col, text_col, n_coarse,
                              semi_join_max_ids, kernel_factory,
                              {"edit_dist": pa.int64(),
                               "edit_sim": pa.float64(),
                               "is_near": pa.bool_()})


# ------------------------------------- winnowing fingerprint collisions


def fingerprint_collision_pairs(ds, id_col: str = "doc_id",
                                text_col: str = "text",
                                threshold: float = 0.5,
                                n_coarse: int | None = None,
                                n_coarse_pairs: int | None = None):
    """Substring-overlap near-dup candidates (MOSS-style): doc pairs whose
    winnowing-fingerprint overlap coefficient
    |A ∩ B| / min(|A|, |B|) ≥ ``threshold``
    (text_analysis.winnow_fingerprints — Schleimer et al., SIGMOD'03).
    The overlap coefficient, not a raw shared count, separates true
    partial copies from templated boilerplate: on the synthetic corpus
    random pairs peak at ~0.35 while clones sit at 1.0.

    Fingerprints shared by > MAX_BUCKET docs are DISCRIMINATIVE-filtered
    (ubiquitous boilerplate substrings — the usual salt guard), and the
    overlap is computed consistently over the SURVIVING fingerprints on
    both sides: each fp's full bucket lives in exactly one partition, so
    per-doc effective fp counts are per-partition partials that ride the
    same doc-keyed passes as the pair partials below — exact clones score
    1.0 by construction regardless of how much boilerplate they carry.

    Exactly THREE shuffles end to end (each unavoidable: one per
    co-location the algorithm needs):
      1. fp % nc — the bucket walk (full explode volume);
      2. id_a % ncp — pair partials AND per-doc eff partials co-locate by
         the pair's LEFT doc, so one group fn both finishes the pair sums
         and attaches eff_a (the doc key of an eff row IS its id_a);
      3. id_b % ncp — eff rows re-keyed by doc meet the pairs again to
         attach eff_b, compute the overlap, and filter.
    The pair rows shuffled in 2 and 3 are the MAX_BUCKET-bounded candidate
    set — the same volume the pair-sum shuffle alone carried in the
    previous formulation, which additionally paid two doc-keyed hash joins
    and two materialization barriers on top (measured 3.3 s → 1.6 s at
    sf0.01×2, 32 CPUs). Returns (id_a, id_b, n_shared, overlap),
    id_a < id_b."""
    import ray.data
    from .text_analysis import winnow_fingerprints

    nc = n_coarse or N_COARSE
    # the pair/count table is ~100x smaller than the fp explode — size its
    # two doc-keyed passes separately so they don't pay the explode tier's
    # per-partition fixed costs
    ncp = n_coarse_pairs or nc

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_fp = [], []
        for i, t in zip(ids, texts):
            for f in set(winnow_fingerprints(t or "")):
                out_id.append(i)
                out_fp.append(f)
        fp = np.asarray(out_fp, np.int64) if out_fp else np.array([], np.int64)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "fp": pa.array(fp),
                         "coarse": pa.array((fp % nc).astype(np.int32))})

    def finalize(pairs: pd.DataFrame) -> pd.DataFrame:
        n = pairs["n_shared"].to_numpy()
        overlap = n / np.maximum(
            np.minimum(pairs["eff_a"].to_numpy(),
                       pairs["eff_b"].to_numpy()), 1)
        keep = overlap >= threshold
        return pd.DataFrame({
            "id_a": pd.array(pairs["id_a"].to_numpy()[keep], "int64"),
            "id_b": pd.array(pairs["id_b"].to_numpy()[keep], "int64"),
            "n_shared": pd.array(n[keep], "int64"),
            "overlap": pd.array(overlap[keep], "float64")})

    out = _fp_overlap_pairs(ds.map_batches(explode, batch_format="pyarrow"),
                            id_col=id_col, cap=MAX_BUCKET, ncp=ncp,
                            finalize=finalize)
    return _typed_empty_union(out, {"id_a": pa.int64(), "id_b": pa.int64(),
                                    "n_shared": pa.int64(),
                                    "overlap": pa.float64()})


def _fp_overlap_pairs(exploded, *, id_col: str, cap: int, ncp: int,
                      finalize):
    """The shared 3-shuffle fingerprint-overlap machinery (see
    fingerprint_collision_pairs for the shuffle accounting): ``exploded``
    carries per-doc DISTINCT (id_col, fp, coarse) rows with the full
    bucket of any fp routed to one coarse partition. Buckets larger than
    ``cap`` are discriminative-filtered consistently from BOTH the pair
    walk and the per-doc effective counts. ``finalize`` receives the
    resolved (id_a, id_b, n_shared, eff_a, eff_b) frame per id_b
    partition and scores/filters it."""

    def pairs_and_counts(df: pd.DataFrame) -> pd.DataFrame:
        # surviving buckets: fp doc-frequency <= cap (the full bucket is
        # in THIS partition — frequency is exact, not partial)
        sizes = df.groupby("fp")["fp"].transform("size")
        surv = df[sizes <= cap]
        # per-doc effective fp partial count (kind rows: id_b = -1)
        eff = surv.groupby(id_col, as_index=False).size()
        kind_rows = pd.DataFrame({
            "id_a": pd.array(eff[id_col], "int64"),
            "id_b": pd.array([-1] * len(eff), "int64"),
            "n_shared": pd.array(eff["size"], "int64")})
        # all-pairs per bucket, fully vectorized BY SIZE CLASS: every bucket
        # of size s contributes its C(s,2) triu pairs in one gather — no
        # per-pair Python (the value here is the constant 1, so the generic
        # _bucket_pairs payload walk isn't needed)
        code = surv.groupby("fp", sort=False).ngroup().to_numpy()
        order = np.argsort(code, kind="stable")
        ids_sorted = surv[id_col].to_numpy()[order]
        bsizes = np.bincount(code) if len(code) else np.array([], np.int64)
        starts = np.concatenate([[0], np.cumsum(bsizes)])
        out_a, out_b = [], []
        for s in np.unique(bsizes):
            if s < 2:
                continue
            bsel = np.where(bsizes == s)[0]
            idx = starts[bsel][:, None] + np.arange(s)[None, :]
            mat = ids_sorted[idx]                      # (n_buckets, s)
            iu, ju = np.triu_indices(int(s), k=1)
            A, B = mat[:, iu].ravel(), mat[:, ju].ravel()
            out_a.append(np.minimum(A, B))
            out_b.append(np.maximum(A, B))
        if out_a:
            pair_rows = pd.DataFrame({
                "id_a": pd.array(np.concatenate(out_a), "int64"),
                "id_b": pd.array(np.concatenate(out_b), "int64")})
            pair_rows = (pair_rows.groupby(["id_a", "id_b"], as_index=False)
                         .size().rename(columns={"size": "n_shared"}))
        else:
            pair_rows = pd.DataFrame({"id_a": pd.array([], "int64"),
                                      "id_b": pd.array([], "int64"),
                                      "n_shared": pd.array([], "int64")})
        out = pd.concat([pair_rows, kind_rows], ignore_index=True)
        out["k1"] = (out["id_a"] % ncp).astype("int32")
        return out

    def sum_and_attach_a(df: pd.DataFrame) -> pd.DataFrame:
        # partition = id_a % ncp. An eff row's doc key IS its id_a, so the
        # exact per-doc eff count and every partial of each (id_a, *) pair
        # finish HERE in one dispatch.
        g = df.groupby(["id_a", "id_b"], as_index=False)["n_shared"].sum()
        effs = g[g["id_b"] < 0]
        pairs = g[g["id_b"] >= 0].copy()
        eff_a = pairs["id_a"].map(
            pd.Series(effs["n_shared"].to_numpy(),
                      index=effs["id_a"].to_numpy()))
        pairs["eff_a"] = pd.array(eff_a.to_numpy(), "int64")
        pairs["k2"] = (pairs["id_b"] % ncp).astype("int32")
        # eff rows ride to pass 3 re-keyed by doc, for the id_b side
        effs = effs.assign(eff_a=pd.array([0] * len(effs), "int64"),
                           k2=(effs["id_a"] % ncp).astype("int32"))
        return pd.concat([pairs, effs], ignore_index=True)

    def attach_b_and_finalize(df: pd.DataFrame) -> pd.DataFrame:
        effs = df[df["id_b"] < 0]
        pairs = df[df["id_b"] >= 0].copy()
        pairs["eff_b"] = pd.array(pairs["id_b"].map(
            pd.Series(effs["n_shared"].to_numpy(),
                      index=effs["id_a"].to_numpy())).to_numpy(), "int64")
        return finalize(pairs)

    return (exploded
            .groupby("coarse").map_groups(pairs_and_counts,
                                          batch_format="pandas")
            .groupby("k1").map_groups(sum_and_attach_a,
                                      batch_format="pandas")
            .groupby("k2").map_groups(attach_b_and_finalize,
                                      batch_format="pandas"))


CONT_DF_CAP = 16     # shingles in more docs are boilerplate: excluded
CONT_MIN_GRAMS = 3   # both sides need this many effective shingles


def shingle_containment_pairs(ds, id_col: str = "doc_id",
                              text_col: str = "text",
                              threshold: float = 0.9,
                              n_coarse: int | None = None,
                              n_coarse_pairs: int | None = None):
    """ASYMMETRIC containment near-dups (Broder 1997 distinguishes
    resemblance — Jaccard — from CONTAINMENT c(A→B) = |S(A)∩S(B)|/|S(A)|):
    the subset/superset duplicate class MinHash misses — a quote, an
    article embedded in a longer page, a doc plus appended boilerplate —
    scores c ≈ 1 on the contained side while symmetric Jaccard can sit
    arbitrarily low. Shingles are DISTINCT md5-hash32 word 3-grams
    (md5_shingle32 — the value-exact SQL-reproducible domain).

    Two rules are part of the operator SEMANTICS and mirrored exactly in
    the SQL oracle (so nothing is a silent engine-side cap):
    - document-frequency cap ``CONT_DF_CAP``: shingles present in more
      than 16 docs are boilerplate-filtered from both intersections and
      doc sizes — this also bounds the per-shingle pair fan-out at
      C(16,2), so the pair walk is exact, never truncated;
    - minimum size ``CONT_MIN_GRAMS``: pairs where either side has < 3
      effective shingles are dropped (one-shingle docs are 'contained'
      in anything sharing that shingle — noise, not duplication).

    Rides the shared 3-shuffle _fp_overlap_pairs machinery
    (fingerprint_collision_pairs' accounting): one full-explode bucket
    shuffle + two candidate-bounded doc-keyed passes. Returns
    (id_a, id_b, n_shared, cont_a, cont_b), id_a < id_b, where
    cont_a = n_shared / |S(id_a)| — each a single IEEE division of exact
    ints, bit-equal to the SQL."""
    nc = n_coarse or N_COARSE
    ncp = n_coarse_pairs or nc

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_fp = [], []
        for i, t in zip(ids, texts):
            fps = np.unique(md5_shingle32(t))
            out_id.extend([i] * len(fps))
            out_fp.append(fps)
        fp = (np.concatenate(out_fp).astype(np.int64) if out_fp
              else np.array([], np.int64))
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "fp": pa.array(fp),
                         "coarse": pa.array((fp % nc).astype(np.int32))})

    def finalize(pairs: pd.DataFrame) -> pd.DataFrame:
        n = pairs["n_shared"].to_numpy()
        eff_a = pairs["eff_a"].to_numpy()
        eff_b = pairs["eff_b"].to_numpy()
        cont_a = n / np.maximum(eff_a, 1)
        cont_b = n / np.maximum(eff_b, 1)
        keep = ((np.maximum(cont_a, cont_b) >= threshold)
                & (eff_a >= CONT_MIN_GRAMS) & (eff_b >= CONT_MIN_GRAMS))
        return pd.DataFrame({
            "id_a": pd.array(pairs["id_a"].to_numpy()[keep], "int64"),
            "id_b": pd.array(pairs["id_b"].to_numpy()[keep], "int64"),
            "n_shared": pd.array(n[keep], "int64"),
            "cont_a": pd.array(cont_a[keep], "float64"),
            "cont_b": pd.array(cont_b[keep], "float64")})

    out = _fp_overlap_pairs(ds.map_batches(explode, batch_format="pyarrow"),
                            id_col=id_col, cap=CONT_DF_CAP, ncp=ncp,
                            finalize=finalize)
    return _typed_empty_union(out, {"id_a": pa.int64(), "id_b": pa.int64(),
                                    "n_shared": pa.int64(),
                                    "cont_a": pa.float64(),
                                    "cont_b": pa.float64()})


# ------------------------------------------------- embedding near-dup (LSH)

N_PLANES = 16


def _planes(dim: int) -> np.ndarray:
    # shared with the ANN module — ONE sign-LSH plane generator keeps
    # bucket assignments seed-compatible across dedup and similarity search
    from .similarity import _planes as ann_planes

    return ann_planes(dim, N_PLANES)


def embedding_near_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                         threshold: float = 0.95, brute: bool = False,
                         n_coarse: int | None = None):
    """Embedding-cosine near-dup pairs.

    Scale path: sign-LSH over 16 fixed hyperplanes → bucket groupby →
    within-bucket pairwise cosine. Brute path (oracle-sized inputs): single
    pairwise pass per group of everything (bucket = 0).
    """
    nc = n_coarse or N_COARSE

    def bucket_rows(batch: pa.Table) -> pa.Table:
        # null-row-dropping Arrow flatten (stages/similarity) — a null
        # embedding can't participate and must not abort the job
        from .similarity import _batch_matrix

        ids, vecs = _batch_matrix(batch, id_col=id_col, emb_col=vec_col)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "coarse": pa.array([], pa.int32()),
                             "unit": pa.array([], pa.list_(pa.float64()))})
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        if brute:
            buckets = np.zeros(len(ids), dtype=np.int64)
        else:
            planes = _planes(vecs.shape[1])
            bits = (unit @ planes.T) > 0
            buckets = (bits.astype(np.uint64) << np.arange(N_PLANES, dtype=np.uint64)).sum(axis=1).astype(np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "coarse": pa.array(buckets % nc, pa.int32()),
                         "unit": pa.array(list(unit), pa.list_(pa.float64()))})

    def pairs_in_coarse(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, group in df.groupby("bucket", sort=False):
            g = group.drop_duplicates(id_col).sort_values(id_col)
            if len(g) < 2:
                continue
            ids = g[id_col].to_numpy()
            mat = np.array(g["unit"].tolist(), dtype=np.float64)
            sims = mat @ mat.T
            ii, jj = np.triu_indices(len(ids), k=1)
            keep = sims[ii, jj] >= threshold
            for i, j, s in zip(ii[keep], jj[keep], sims[ii, jj][keep]):
                rows.append({"id_a": int(ids[i]), "id_b": int(ids[j]),
                             "cosine": float(s)})
        return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"]).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"})

    buckets = ds.map_batches(bucket_rows, batch_format="pyarrow")
    return _typed_empty_union(
        buckets.groupby("coarse").map_groups(pairs_in_coarse, batch_format="pandas"),
        {"id_a": pa.int64(), "id_b": pa.int64(), "cosine": pa.float64()})


# -------------------------------------------- duplicate-cluster assignment

MAX_CC_ROUNDS = 64  # safety cap for the convergence loop: propagation is
# one hop per round, so rounds needed = eccentricity of the component min
# (≤ diameter); real dup graphs are dense cliques/short chains that
# converge in 2-4. Hitting the cap raises instead of silently returning
# unconverged labels (which would break the value-exact keep oracles).


def dup_clusters(pairs_ds, n_iter: "int | None" = None):
    """Connected components over the dup-PAIR graph by iterative min-label
    propagation — FULLY DISTRIBUTED (no driver-side label materialization).

    ``n_iter=None`` (default) iterates to the DISTRIBUTED FIXPOINT
    (changed == 0), raising RuntimeError past MAX_CC_ROUNDS — labels are
    true component minima, matching the recursive-CTE SQL oracles even on
    long near-dup chains (hamming adjacency is not transitive, so chains
    deeper than any fixed hop count exist in principle). An explicit int
    bounds the rounds instead: label = min id reachable within n_iter
    hops, the round-3 behavior.

    Per round, label(src) ← min over neighbors' labels. The relabel step is
    a dst-partitioned hash join: edges (keyed by dst) and the current label
    table (keyed by node) are co-partitioned by ``key % N_COARSE`` via a
    tagged union + groupby(coarse).map_groups, and merged with a vectorized
    pandas merge inside each partition. A partial min per src inside the
    join partition (combiner) shrinks the second shuffle; a src-partitioned
    groupby finishes the min and compares against the previous label.

    Convergence is a distributed sum over a per-row ``changed`` flag:
    propagation is monotone (labels only decrease; the self-edge keeps the
    current label as a candidate), so changed == 0 ⇔ fixpoint. Each round's
    label table is materialized (proportional to the duplicate set, never
    the corpus) so rounds don't re-execute prior lineage.

    Node ids must be non-negative: -1 is the null sentinel in the tagged
    union (doc ids here are always >= 0).

    The coarse partition count adapts to the edge count (~100k edges per
    partition, capped at N_COARSE) so tiny graphs don't pay 256-way shuffle
    fixed costs while 100 TB-scale graphs still spread across the cluster.

    Returns (src, label = min id reachable within n_iter hops).
    """
    import ray.data

    def explode(batch: pa.Table) -> pa.Table:
        # edges both directions + self edges (self edge ⇒ every node is its
        # own label candidate and appears as a join key in its partition)
        a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b, a, b])
        dst = np.concatenate([b, a, a, b])
        return pa.table({
            "kind": pa.array(np.zeros(len(src), np.int8)),
            "src": pa.array(src),
            "key": pa.array(dst),  # join/partition key = dst
            "label": pa.array(np.full(len(src), -1, np.int64))})

    edges = pairs_ds.map_batches(explode, batch_format="pyarrow")
    edges = edges.materialize()  # pair graph only; reused every round
    n_edges = edges.count()
    if n_edges == 0:
        # duplicate-free corpus → empty pair graph; keep the (src, label)
        # schema so downstream sorts/selects still work
        return ray.data.from_arrow(pa.table({
            "src": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}))
    n_coarse = min(N_COARSE, n_edges // 100_000 + 1)
    if edges.num_blocks() > 4 * n_coarse:
        # upstream pair generators emit one tiny block per coarse shuffle
        # partition; every later execution pays a per-block fixed cost
        # (~10 ms/block × rounds), so coalesce once to the round block count
        edges = edges.repartition(n_coarse).materialize()

    def add_coarse(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "coarse", pa.array((key % n_coarse).astype(np.int32)))

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "kind": pa.array(np.ones(len(node), np.int8)),
            "src": pa.array(np.full(len(node), -1, np.int64)),
            "key": pa.array(node),
            "label": pa.array(lbl)})

    def join_relabel(df: pd.DataFrame) -> pd.DataFrame:
        # one coarse partition: edges (kind 0) ⨝ labels (kind 1) on key.
        # Round 1 has no label rows — the fillna(key) fallback makes the
        # identity labeling implicit, so no separate initial pass is needed.
        edg = df[df["kind"] == 0]
        lbl = df[df["kind"] == 1]
        if edg.empty:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                 "label": pd.Series([], dtype="int64"),
                                 "is_old": pd.Series([], dtype="int8"),
                                 "coarse2": pd.Series([], dtype="int32")})
        m = edg[["src", "key"]].merge(
            lbl[["key", "label"]], on="key", how="left")
        m["label"] = m["label"].fillna(m["key"]).astype("int64")
        # combiner: partial min per src inside the join partition shrinks
        # the second shuffle to ≤ one row per (src, partition)
        part = m.groupby("src", as_index=False)["label"].min()
        part["is_old"] = np.int8(0)
        # self-edge rows carry the PREVIOUS label of src (identity in r1)
        old = m.loc[m["src"] == m["key"], ["src", "label"]].drop_duplicates("src")
        old["is_old"] = np.int8(1)
        out = pd.concat([part, old], ignore_index=True)
        out["coarse2"] = (out["src"] % n_coarse).astype("int32")
        return out

    def finalize_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src")
        new = g["label"].min()  # old label is among candidates (self-edge)
        old = df[df["is_old"] == 1].groupby("src")["label"].first()
        out = new.reset_index()
        out["changed"] = (new.to_numpy() < old.reindex(new.index).to_numpy()
                          ).astype("int64")
        return out[["src", "label", "changed"]]

    labels = None
    rounds = n_iter if n_iter is not None else MAX_CC_ROUNDS
    converged = False
    for _ in range(rounds):
        tagged = edges if labels is None else edges.union(
            labels.map_batches(tag_labels, batch_format="pyarrow"))
        labels = (tagged.map_batches(add_coarse, batch_format="pyarrow")
                  .groupby("coarse")
                  .map_groups(join_relabel, batch_format="pandas")
                  .groupby("coarse2")
                  .map_groups(finalize_min, batch_format="pandas")
                  .materialize())
        changed = labels.sum("changed", ignore_nulls=True) or 0
        if changed == 0:
            converged = True
            break  # fixpoint — typical dup graphs (pairs, small clusters)
            # stabilize after round 2; skip remaining shuffles
    if n_iter is None and not converged:
        raise RuntimeError(
            f"dup_clusters did not converge within {MAX_CC_ROUNDS} rounds "
            f"({changed} labels still changing) — pathological chain "
            "diameter; pass an explicit n_iter to accept bounded-hop labels")
    return labels.drop_columns(["changed"])


# --------------------------------------------------------- line-level dedup

LINE_MIN_CHARS = 30


def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
               min_chars: int = LINE_MIN_CHARS,
               n_coarse: int | None = None,
               n_coarse_docs: int | None = None):
    """C4-style line-level dedup across the WHOLE corpus: a line of
    ``min_chars``+ characters survives only at its first occurrence
    (lowest (doc_id, line_idx)); shorter lines always survive (blank
    lines and headers are structure, not boilerplate — and exempting
    them also keeps the hot-key skew of ubiquitous short strings out of
    the line shuffle). Documents are reassembled in original line order.
    Returns (id, clean_text, n_removed). C4 (Raffel et al., JMLR'20 §2.2)
    applies the same rule at three-sentence granularity.

    Exactly TWO shuffles:
      1. line-keyed (crc32(line) % nc) — every copy of an eligible line
         lands in one partition, where a vectorized sort marks the first
         occurrence. INELIGIBLE lines ride the same exchange under a
         (doc, line_idx)-derived key instead of the line hash: they need
         no co-location (always kept), and routing them by value would
         put every blank line in one partition.
      2. doc-keyed (id % ncd) — lines regroup per document and rejoin in
         line_idx order.
    """
    nc = n_coarse or N_COARSE
    ncd = n_coarse_docs or nc

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        lines = pc.split_pattern(text, "\n")
        lines = lines.combine_chunks() \
            if isinstance(lines, pa.ChunkedArray) else lines
        flat = lines.flatten()
        lens = pc.list_value_length(lines).to_numpy().astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        ends = np.cumsum(lens)
        idxs = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
        rids = np.repeat(ids, lens)
        nch = pc.utf8_length(flat).to_numpy().astype(np.int64)
        elig = nch >= min_chars
        coarse = (rids * 1000003 + idxs) % nc          # spread, no skew
        if elig.any():
            # only eligible lines are hashed — straight off the Arrow
            # buffer (str_hash), no Python-object conversion at all
            from ..str_hash import crc32_of_strings
            coarse[elig] = crc32_of_strings(
                flat.filter(pa.array(elig))) % nc
        return pa.table({
            "_id": pa.array(rids, pa.int64()),
            "line_idx": pa.array(idxs, pa.int64()),
            "line": flat,
            "elig": pa.array(elig),
            "coarse": pa.array(coarse.astype(np.int32))})

    return _first_occurrence_dedup(ds, explode, id_col, "\n", ncd)


def _first_occurrence_dedup(ds, explode, id_col: str, join_sep: str,
                            ncd: int):
    """Shared spine of line_dedup / sentence_dedup: ``explode`` emits
    (_id, line_idx, line, elig, coarse) unit rows; eligible units survive
    only at their first (doc_id, idx) occurrence; docs reassemble in unit
    order joined by ``join_sep``. Two shuffles (unit-keyed resolve,
    doc-keyed reassemble), exactly as documented on line_dedup."""

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.ones(len(df), dtype=bool)
        e = df[df["elig"]]
        if len(e):
            order = e.sort_values(["line", "_id", "line_idx"],
                                  kind="mergesort")
            first = ~order["line"].duplicated().to_numpy()
            keep[order.index.to_numpy()] = first
        out = df[["_id", "line_idx", "line"]].copy()
        out["keep"] = keep
        out["dcoarse"] = (out["_id"] % ncd).astype(np.int32)
        return out

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # map_groups never passes empty groups today, but
            return pd.DataFrame({  # keep the fn total rather than half-guarded
                "_id": pd.array([], "int64"),
                "clean_text": pd.array([], "string"),
                "n_removed": pd.array([], "int64")})
        d = df.sort_values(["_id", "line_idx"], kind="mergesort")
        ids = d["_id"].to_numpy()
        keep = d["keep"].to_numpy()
        lines = d["line"].to_numpy()
        # doc boundaries over the (id, line_idx)-sorted rows
        bound = np.flatnonzero(np.diff(ids)) + 1
        starts = np.concatenate(([0], bound))
        ends_ = np.concatenate((bound, [len(ids)]))
        texts = [join_sep.join(lines[s:e][keep[s:e]])
                 for s, e in zip(starts, ends_)]
        removed = np.add.reduceat(~keep, starts)
        return pd.DataFrame({
            "_id": pd.array(ids[starts], "int64"),
            "clean_text": pd.array(texts, "string"),
            "n_removed": pd.array(removed.astype(np.int64), "int64")})

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("coarse").map_groups(resolve, batch_format="pandas")
           .groupby("dcoarse").map_groups(reassemble, batch_format="pandas"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["_id"],
                         "clean_text": pc.cast(batch["clean_text"],
                                               pa.string()),
                         "n_removed": batch["n_removed"]})

    out = out.map_batches(rename, batch_format="pyarrow")
    return nonempty_or_typed_table(out, {
        id_col: pa.int64(), "clean_text": pa.string(),
        "n_removed": pa.int64()})


SENTENCE_MARK = "\x01"
SENTENCE_SPLIT_PAT = r"([.!?])[ \t\n\r\f\v]+"
SENTENCE_TRIM_CHARS = " \t\n\r\f\v"


def sentence_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                   min_chars: int = LINE_MIN_CHARS,
                   n_coarse: int | None = None,
                   n_coarse_docs: int | None = None):
    """C4's actual granularity (Raffel et al., JMLR'20 §2.2 deduplicates
    three-SENTENCE spans; line_dedup is the per-line variant): a sentence
    of ``min_chars``+ characters survives only at its first (doc_id,
    sentence_idx) occurrence; docs reassemble in sentence order joined by
    a single space.

    The sentence rule is deliberately EXPLICIT-ASCII so both sides are
    exact: mark ``([.!?])[ \\t\\n\\r\\f\\v]+`` boundaries by rewriting to
    ``\\1`` + chr(1) (RE2 backref replace — vectorized Arrow kernel, no
    per-row Python), split on chr(1), trim the same six-char whitespace
    set, drop empties. A chr(1) already present in a document acts as a
    boundary on BOTH sides (engine and SQL share the mark-and-split rule
    verbatim, so parity holds even for pathological inputs). Unlike the
    reference F1 splitter this avoids unicode ``\\s``/strip semantics —
    RE2 has no lookbehind and ASCII-vs-unicode whitespace would silently
    diverge between re and DuckDB.

    Same two-shuffle scale shape as line_dedup (the shared
    _first_occurrence_dedup spine)."""
    nc = n_coarse or N_COARSE
    ncd = n_coarse_docs or nc

    def explode(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        marked = pc.replace_substring_regex(
            text, pattern=SENTENCE_SPLIT_PAT,
            replacement="\\1" + SENTENCE_MARK)
        lists = pc.split_pattern(marked, SENTENCE_MARK)
        lists = lists.combine_chunks() \
            if isinstance(lists, pa.ChunkedArray) else lists
        flat = pc.utf8_trim(lists.flatten(), SENTENCE_TRIM_CHARS)
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rids = np.repeat(ids, lens)
        nch = pc.utf8_length(flat).to_numpy().astype(np.int64)
        nonempty = nch > 0
        flat = flat.filter(pa.array(nonempty))
        rids = rids[nonempty]
        nch = nch[nonempty]
        # within-doc index among the KEPT (non-empty) sentences: nonempty
        # rows stay in flat (doc-major) order, so consecutive equal rids
        # form one doc segment — a running arange per segment reindexes
        if len(rids):
            seg = np.flatnonzero(np.diff(rids)) + 1
            starts = np.concatenate(([0], seg))
            seg_len = np.diff(np.concatenate((starts, [len(rids)])))
            idxs = (np.arange(len(rids), dtype=np.int64)
                    - np.repeat(starts, seg_len))
        else:
            idxs = np.array([], np.int64)
        elig = nch >= min_chars
        coarse = (rids * 1000003 + idxs) % nc
        if elig.any():
            from ..str_hash import crc32_of_strings
            coarse[elig] = crc32_of_strings(
                flat.filter(pa.array(elig))) % nc
        return pa.table({
            "_id": pa.array(rids, pa.int64()),
            "line_idx": pa.array(idxs, pa.int64()),
            "line": flat,
            "elig": pa.array(elig),
            "coarse": pa.array(coarse.astype(np.int32))})

    return _first_occurrence_dedup(ds, explode, id_col, " ", ncd)


# --------------------------------------------- k-token window dup statistics

WINDOW_K = 13          # eval-decontamination-grade window (13 tokens)
_WIN_B1 = np.uint64(0x9E3779B97F4A7C15 | 1)   # odd → invertible mod 2^64
_WIN_B2 = np.uint64(0xC2B2AE3D27D4EB4F | 1)
_WIN_M = 1 << 64


def _window_hashes(tokens_per_doc: "list[list[str]]", k: int):
    """Rolling polynomial hash of every k-token window, vectorized over the
    FLAT token stream of a whole batch (one crc32 pass + numpy cumsum /
    cumprod; no per-window loop). See _rolling_hashes for the math.

    Returns (doc_index_per_window, within_doc_offset, h1, h2) numpy arrays.
    """
    lens = np.fromiter((len(t) for t in tokens_per_doc), np.int64,
                       len(tokens_per_doc))
    n = int(lens.sum())
    if n == 0:
        z = np.array([], np.int64)
        return z, z, z.astype(np.uint64), z.astype(np.uint64)
    flat = [tok for doc in tokens_per_doc for tok in doc]
    th = np.fromiter((zlib.crc32(t.encode()) for t in flat), np.uint64, n)
    return _rolling_hashes(th, lens, k)


def _rolling_hashes(th: np.ndarray, lens: np.ndarray, k: int):
    """Rolling polynomial hash of every k-unit window over a flat uint64
    value stream ``th`` segmented into documents by ``lens`` (units may be
    token crc32s or raw codepoints — any injective per-unit value).

    H[i] = Σ_{d<k} th[i+d] · Binv^d  (mod 2^64), computed as
    (S[i+k] − S[i]) · B^i from the prefix sums S of th·Binv^position —
    B odd makes Binv = B⁻¹ mod 2^64 exact, so window hashes at different
    offsets canonicalize to the same value. Two independent bases give a
    128-bit effective key (collision-safe at 100 TB window counts).
    Windows never cross documents: start positions whose span would leave
    the document are masked out, and the cross-doc prefix-sum terms cancel
    in the S difference for every retained window.

    Returns (doc_index_per_window, within_doc_offset, h1, h2) numpy arrays.
    """
    n = int(lens.sum())
    if n == 0:
        z = np.array([], np.int64)
        return z, z, z.astype(np.uint64), z.astype(np.uint64)

    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    # valid window starts: offset o in [0, len_doc - k]
    nw = np.maximum(lens - k + 1, 0)
    total_w = int(nw.sum())
    if total_w == 0:
        z = np.array([], np.int64)
        return z, z, z.astype(np.uint64), z.astype(np.uint64)
    wdoc = np.repeat(np.arange(len(lens), dtype=np.int64), nw)
    wends = np.cumsum(nw)
    woff = np.arange(total_w, dtype=np.int64) - np.repeat(wends - nw, nw)
    wpos = np.repeat(starts, nw) + woff   # flat start index per window

    def poly(base: np.uint64) -> np.ndarray:
        binv = np.uint64(pow(int(base), -1, _WIN_M))
        binv_pow = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n, binv, np.uint64))))
        b_pow = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(n, base, np.uint64))))
        s = np.concatenate(
            ([np.uint64(0)], np.cumsum(th * binv_pow[:n], dtype=np.uint64)))
        return (s[wpos + k] - s[wpos]) * b_pow[wpos]

    return wdoc, woff, poly(_WIN_B1), poly(_WIN_B2)


def _window_count_rows(batch: pa.Table, id_col: str, text_col: str,
                       k: int, nc: int, side: int) -> pa.Table:
    """Shared window combiner for dup_window_stats / cross_window_overlap:
    (id, h1, h2) copy counts per batch, coarse = h1 % nc, plus a ``side``
    tag (0 = doc side, 1 = reference side) so the two operators key their
    shuffles identically by construction."""
    texts = batch[text_col].to_pylist()
    toks = [(t or "").split() for t in texts]
    wdoc, _, h1, h2 = _window_hashes(toks, k)
    empty = pa.table({"_id": pa.array([], pa.int64()),
                      "side": pa.array([], pa.int8()),
                      "h1": pa.array([], pa.int64()),
                      "h2": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64()),
                      "coarse": pa.array([], pa.int32())})
    if len(wdoc) == 0:
        return empty
    if id_col is not None:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"_id": pa.array(ids[wdoc]),
                      "h1": pa.array(h1.view(np.int64)),
                      "h2": pa.array(h2.view(np.int64)),
                      "one": pa.array(np.ones(len(wdoc), np.int64))})
        g = t.group_by(["_id", "h1", "h2"]).aggregate([("one", "sum")])
        cnt = g["one_sum"]
    else:
        # reference side: DISTINCT window membership, ids irrelevant
        t = pa.table({"h1": pa.array(h1.view(np.int64)),
                      "h2": pa.array(h2.view(np.int64))})
        g = t.group_by(["h1", "h2"]).aggregate([])
        g = g.append_column("_id", pa.array(
            np.zeros(g.num_rows, np.int64)))
        cnt = pa.array(np.zeros(g.num_rows, np.int64))
    coarse = (g["h1"].to_numpy().view(np.uint64) % np.uint64(nc))
    return pa.table({"_id": g["_id"],
                     "side": pa.array(np.full(g.num_rows, side, np.int8)),
                     "h1": g["h1"], "h2": g["h2"], "cnt": cnt,
                     "coarse": pa.array(coarse.astype(np.int32))})


def dup_window_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                     k: int = WINDOW_K, min_docs: int = 2,
                     n_coarse: int | None = None,
                     n_coarse_docs: int | None = None):
    """Exact duplicated-substring statistics at k-token window granularity
    (the fixed-window form of Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL'22 §4 — suffix-array dup spans approximated
    by every k-token sliding window; the reference's cache-level "identical
    input" notion, app2.py:329-336, pushed down to substrings).

    → (doc_id, n_windows, n_dup_windows, dup_ratio) for every doc with at
    least one window (≥ k whitespace tokens). A window is duplicated iff
    its token sequence occurs in ≥ ``min_docs`` DISTINCT documents
    corpus-wide.

    Exactly two bucketed shuffles, combiner-compressed on both sides:
      1. window-hash-keyed: stage 1 pre-aggregates (doc, h1, h2) → copy
         count per batch (combiner), shuffles on crc-derived
         ``h1 % n_coarse`` so every copy of a window value co-locates;
         inside a partition a vectorized pandas transform marks hashes
         reaching ``min_docs`` distinct docs and re-aggregates to one row
         per (doc, partition);
      2. doc-keyed: per-doc sums over ≤ n_coarse partial rows per doc.
    Neither shuffle ever carries window TEXT — only 128-bit hashes, and
    after the combiner only per-(doc,hash) counts.
    """
    nc = n_coarse or N_COARSE
    ncd = n_coarse_docs or nc

    def explode(batch: pa.Table) -> pa.Table:
        return _window_count_rows(batch, id_col, text_col, k, nc, side=0)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        # all copies of a given (h1, h2) are in this partition
        ndocs = df.groupby(["h1", "h2"])["_id"].transform("nunique")
        dup = (ndocs >= min_docs).to_numpy()
        cnt = df["cnt"].to_numpy()
        out = pd.DataFrame({
            "_id": df["_id"].to_numpy(),
            "n_part": cnt,
            "n_dup_part": np.where(dup, cnt, 0)})
        out = out.groupby("_id", as_index=False).sum()
        out["dcoarse"] = (out["_id"] % ncd).astype(np.int32)
        return out

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_id", as_index=False)[["n_part", "n_dup_part"]].sum()
        return pd.DataFrame({
            "_id": g["_id"].astype("int64"),
            "n_windows": g["n_part"].astype("int64"),
            "n_dup_windows": g["n_dup_part"].astype("int64"),
            # IEEE double division — bit-matches the oracle's nd*1.0/nw
            "dup_ratio": g["n_dup_part"].to_numpy(np.float64)
                         / g["n_part"].to_numpy(np.float64)})

    out = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("coarse").map_groups(resolve, batch_format="pandas")
           .groupby("dcoarse").map_groups(per_doc, batch_format="pandas"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["_id"],
                         "n_windows": batch["n_windows"],
                         "n_dup_windows": batch["n_dup_windows"],
                         "dup_ratio": batch["dup_ratio"]})

    out = out.map_batches(rename, batch_format="pyarrow")
    return nonempty_or_typed_table(out, {
        id_col: pa.int64(), "n_windows": pa.int64(),
        "n_dup_windows": pa.int64(), "dup_ratio": pa.float64()})


_OWNER_OFF_BASE = 100_000_000  # owner key = doc_id·BASE + offset (offsets ≪ BASE)


def _span_removal_dedup(ds, explode, reassemble, out_schema: dict,
                        id_col: str, text_col: str, ncd: int,
                        opname: str):
    """Shared spine of window_dedup (token windows) and exact_substr_dedup
    (char windows): ``explode`` emits one (_id, off, h1, h2, coarse) row
    per unit-window occurrence; every occurrence of a (h1, h2) value
    co-locates in its coarse partition, where the owner resolves to the
    min packed (doc_id, off) key and each NON-owner occurrence becomes a
    removal row; removals rejoin the doc's text under the doc key (text
    rides that exchange exactly once) and ``reassemble`` (pandas
    per-dcoarse-group fn over off=-1 text rows + off≥0 removal rows)
    rebuilds documents. ``out_schema`` is the final {col: arrow type}
    mapping with ``id_col`` first; reassemble must emit ``_id`` plus the
    non-id columns of out_schema."""

    def removals(df: pd.DataFrame) -> pd.DataFrame:
        ids_a = df["_id"].to_numpy(np.int64)
        offs_a = df["off"].to_numpy(np.int64)
        # the packed owner key (doc_id·BASE + off) totally orders
        # (doc_id, off) ONLY while off < BASE and |doc_id| stays clear of
        # int64 overflow; a violation would silently misresolve owners
        # (and the SQL oracles, which mirror the packing, couldn't catch
        # it) — so reject loudly instead
        if len(offs_a) and (int(offs_a.max()) >= _OWNER_OFF_BASE
                            or int(np.abs(ids_a).max())
                            >= (2**63 - 1) // _OWNER_OFF_BASE):
            raise ValueError(
                f"{opname} owner-key overflow: need off < "
                f"{_OWNER_OFF_BASE} (got max {int(offs_a.max())}) and "
                f"|doc_id| < {(2**63 - 1) // _OWNER_OFF_BASE} "
                f"(got max {int(np.abs(ids_a).max())})")
        okey = ids_a * _OWNER_OFF_BASE + offs_a
        d = df.assign(okey=okey)
        g = d.groupby(["h1", "h2"])["okey"]
        cnt = g.transform("size").to_numpy()
        owner = g.transform("min").to_numpy()
        rem = d[(cnt >= 2) & (okey != owner)]
        out = pd.DataFrame({"_id": rem["_id"], "off": rem["off"]})
        out["dcoarse"] = (out["_id"] % ncd).astype(np.int32)
        return out

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "_id": pa.array(ids),
            "off": pa.array(np.full(len(ids), -1, np.int64)),  # text row
            "text": pc.cast(pc.fill_null(batch[text_col], ""), pa.string()),
            "dcoarse": pa.array((ids % ncd).astype(np.int32))})

    def tag_removals(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "_id": batch["_id"], "off": batch["off"],
            "text": pa.array([None] * n, pa.string()),
            "dcoarse": batch["dcoarse"]})

    rem = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("coarse").map_groups(removals, batch_format="pandas")
           .map_batches(tag_removals, batch_format="pyarrow"))
    out = (ds.map_batches(doc_rows, batch_format="pyarrow")
           .union(rem)
           .groupby("dcoarse").map_groups(reassemble,
                                          batch_format="pandas"))

    payload = {c: t for c, t in out_schema.items() if c != id_col}

    def rename(batch: pa.Table) -> pa.Table:
        cols = {id_col: batch["_id"]}
        for c, t in payload.items():
            cols[c] = pc.cast(batch[c], t)
        return pa.table(cols)

    out = out.map_batches(rename, batch_format="pyarrow")
    return nonempty_or_typed_table(out, out_schema)


def window_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                 k: int = WINDOW_K,
                 n_coarse: int | None = None,
                 n_coarse_docs: int | None = None):
    """Duplicated-substring REMOVAL at k-token window granularity — the
    full Lee et al. (ACL'22) semantics the stats operator only measures:
    every k-token window occurring ≥2 times in the corpus (any positions,
    within-doc repeats included) survives only at its OWNER occurrence
    (lexicographic min (doc_id, offset)); every other occurrence marks its
    k token positions for removal; documents are reassembled from the
    uncovered tokens (single-space join — removal operates on the token
    stream, so original whitespace is normalized; mirrored exactly in the
    SQL oracle).

    Two bucketed shuffles, hash-only exchange (the _span_removal_dedup
    spine, shared with exact_substr_dedup):
      1. window-hash-keyed rows (doc, off, h1, h2) — within a coarse
         partition every occurrence of a window value is present, so
         occurrence count and owner resolve locally; only NON-owner
         occurrences (the removal set, proportional to the dup rate)
         leave the partition;
      2. doc-keyed: removal offsets rejoin the doc's token list (text
         rides this exchange once, like line_dedup); coverage is a
         vectorized diff-array cumsum per doc.
    Returns (doc_id, clean_text, n_removed_tokens, n_tokens).
    """
    nc = n_coarse or N_COARSE
    ncd = n_coarse_docs or nc

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        toks = [(t or "").split() for t in texts]
        wdoc, woff, h1, h2 = _window_hashes(toks, k)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(wdoc) == 0:
            return pa.table({"_id": pa.array([], pa.int64()),
                             "off": pa.array([], pa.int64()),
                             "h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "coarse": pa.array([], pa.int32())})
        coarse = (h1 % np.uint64(nc)).astype(np.int32)
        return pa.table({"_id": pa.array(ids[wdoc]),
                         "off": pa.array(woff),
                         "h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64)),
                         "coarse": pa.array(coarse)})

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_txt, out_rm, out_nt = [], [], [], []
        for did, grp in df.groupby("_id", sort=True):
            trow = grp[grp["off"] < 0]
            if not len(trow):        # removal rows for a doc outside ds —
                continue             # impossible by construction; be total
            toks = (trow["text"].iloc[0] or "").split()
            n = len(toks)
            offs = grp.loc[grp["off"] >= 0, "off"] \
                .to_numpy(np.int64)
            cover = np.zeros(n + 1, np.int64)
            if len(offs):
                np.add.at(cover, offs, 1)
                np.add.at(cover, np.minimum(offs + k, n), -1)
            covered = np.cumsum(cover[:-1]) > 0
            kept = [t for t, c in zip(toks, covered) if not c]
            out_id.append(did)
            out_txt.append(" ".join(kept))
            out_rm.append(int(covered.sum()))
            out_nt.append(n)
        return pd.DataFrame({
            "_id": pd.array(out_id, "int64"),
            "clean_text": pd.array(out_txt, "string"),
            "n_removed_tokens": pd.array(out_rm, "int64"),
            "n_tokens": pd.array(out_nt, "int64")})

    return _span_removal_dedup(
        ds, explode, reassemble,
        {id_col: pa.int64(), "clean_text": pa.string(),
         "n_removed_tokens": pa.int64(), "n_tokens": pa.int64()},
        id_col, text_col, ncd, "window_dedup")


EXACT_SUBSTR_L = 50   # Lee et al. duplicate-span threshold, in characters


def exact_substr_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                       min_len: int = EXACT_SUBSTR_L,
                       n_coarse: int | None = None,
                       n_coarse_docs: int | None = None):
    """ExactSubstr at its NATIVE granularity (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22 §4.1: remove any
    substring of ≥ ``min_len`` units that occurs twice anywhere in the
    corpus) — character-level, unlike window_dedup's token windows, so
    removal boundaries are byte-exact and surviving text keeps its
    ORIGINAL whitespace (the token variant space-normalizes on reassembly).
    A duplicated span of length m ≥ min_len is exactly the union of its
    m−min_len+1 duplicated min_len-char windows, so fixed-size window
    coverage reproduces maximal-span removal. Like the paper's tool we
    keep the lexicographically first occurrence (min (doc_id, offset))
    and remove every other occurrence, within-doc repeats included.

    Two bucketed shuffles — the _span_removal_dedup spine (shared with
    window_dedup) at char granularity:
      1. window-hash-keyed (doc, off, h1, h2) rows — one per char
         position, 36 B each; hashes are 128-bit rolling polynomials over
         raw codepoints (_rolling_hashes), so the exchange never carries
         text. Cost is ∝ total corpus characters — the price of exact
         substring semantics in a distributed setting (the paper's suffix
         array is single-node and needs the corpus in RAM; a Bloom
         prefilter pass could drop the ~unique majority of windows before
         the shuffle and is the documented 100-TB refinement).
      2. doc-keyed: non-owner offsets rejoin the doc text (text moves
         once); coverage is a diff-array cumsum over chars; kept
         codepoints reassemble via a numpy mask on the utf-32 view.

    Returns (doc_id, clean_text, n_removed_chars, n_chars) for EVERY
    input doc (empty docs pass through with 0/0)."""
    nc = n_coarse or N_COARSE
    ncd = n_coarse_docs or nc

    def explode(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[text_col].to_pylist()]
        lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        cps = np.frombuffer("".join(texts).encode("utf-32-le"),
                            np.uint32).astype(np.uint64) + 1
        wdoc, woff, h1, h2 = _rolling_hashes(cps, lens, min_len)
        if len(wdoc) == 0:
            return pa.table({"_id": pa.array([], pa.int64()),
                             "off": pa.array([], pa.int64()),
                             "h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "coarse": pa.array([], pa.int32())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        coarse = (h1 % np.uint64(nc)).astype(np.int32)
        return pa.table({"_id": pa.array(ids[wdoc]),
                         "off": pa.array(woff),
                         "h1": pa.array(h1.view(np.int64)),
                         "h2": pa.array(h2.view(np.int64)),
                         "coarse": pa.array(coarse)})

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_txt, out_rm, out_nc = [], [], [], []
        for did, grp in df.groupby("_id", sort=True):
            trow = grp[grp["off"] < 0]
            if not len(trow):        # removal rows for a doc outside ds —
                continue             # impossible by construction; be total
            text = trow["text"].iloc[0] or ""
            n = len(text)
            offs = grp.loc[grp["off"] >= 0, "off"].to_numpy(np.int64)
            if len(offs):
                cover = np.zeros(n + 1, np.int64)
                np.add.at(cover, offs, 1)
                np.add.at(cover, np.minimum(offs + min_len, n), -1)
                covered = np.cumsum(cover[:-1]) > 0
                cps = np.frombuffer(text.encode("utf-32-le"), np.uint32)
                clean = cps[~covered].tobytes().decode("utf-32-le")
                n_rm = int(covered.sum())
            else:
                clean, n_rm = text, 0
            out_id.append(did)
            out_txt.append(clean)
            out_rm.append(n_rm)
            out_nc.append(n)
        return pd.DataFrame({
            "_id": pd.array(out_id, "int64"),
            "clean_text": pd.array(out_txt, "string"),
            "n_removed_chars": pd.array(out_rm, "int64"),
            "n_chars": pd.array(out_nc, "int64")})

    return _span_removal_dedup(
        ds, explode, reassemble,
        {id_col: pa.int64(), "clean_text": pa.string(),
         "n_removed_chars": pa.int64(), "n_chars": pa.int64()},
        id_col, text_col, ncd, "exact_substr_dedup")


def cross_window_overlap(docs_ds, ref_ds, id_col: str = "doc_id",
                         text_col: str = "text",
                         ref_text_col: str = "text",
                         k: int = WINDOW_K,
                         n_coarse: int | None = None,
                         n_coarse_docs: int | None = None):
    """Cross-corpus window overlap: for every doc, how many of its k-token
    windows also occur ANYWHERE in a reference corpus — the cross-dataset
    form of eval decontamination (Brown et al. GPT-3 App. C measure
    overlap of training docs against benchmarks at 13-gram granularity;
    here either side can be 100 TB). Same two-bucketed-shuffle shape as
    dup_window_stats: window hashes only (never text) cross the first
    exchange; the reference side pre-collapses to DISTINCT hashes per
    batch (combiner) so a massive reference costs its distinct-window
    count, not its token count. Returns (doc_id, n_windows,
    n_overlap_windows, overlap_ratio) for docs with ≥1 window."""
    nc = n_coarse or N_COARSE
    ncd = n_coarse_docs or nc

    def explode_docs(batch: pa.Table) -> pa.Table:
        return _window_count_rows(batch, id_col, text_col, k, nc, side=0)

    def explode_ref(batch: pa.Table) -> pa.Table:
        # reference side: DISTINCT hashes only (membership, not counts);
        # an explicit side tag — NOT an id sentinel — separates the
        # streams, so negative doc ids on the docs side stay valid
        return _window_count_rows(batch, None, ref_text_col, k, nc,
                                  side=1)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        ref = df[df["side"] == 1][["h1", "h2"]].drop_duplicates()
        doc = df[df["side"] == 0]
        hit = doc.merge(ref.assign(_in=True), on=["h1", "h2"], how="left")
        cnt = hit["cnt"].to_numpy()
        out = pd.DataFrame({
            "_id": hit["_id"].to_numpy(),
            "n_part": cnt,
            "n_hit_part": np.where(hit["_in"].notna(), cnt, 0)})
        out = out.groupby("_id", as_index=False).sum()
        out["dcoarse"] = (out["_id"] % ncd).astype(np.int32)
        return out

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_id", as_index=False)[["n_part", "n_hit_part"]] \
            .sum()
        return pd.DataFrame({
            "_id": g["_id"].astype("int64"),
            "n_windows": g["n_part"].astype("int64"),
            "n_overlap_windows": g["n_hit_part"].astype("int64"),
            "overlap_ratio": g["n_hit_part"].to_numpy(np.float64)
                             / g["n_part"].to_numpy(np.float64)})

    out = (docs_ds.map_batches(explode_docs, batch_format="pyarrow")
           .union(ref_ds.map_batches(explode_ref, batch_format="pyarrow"))
           .groupby("coarse").map_groups(resolve, batch_format="pandas")
           .groupby("dcoarse").map_groups(per_doc, batch_format="pandas"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["_id"],
                         "n_windows": batch["n_windows"],
                         "n_overlap_windows": batch["n_overlap_windows"],
                         "overlap_ratio": batch["overlap_ratio"]})

    out = out.map_batches(rename, batch_format="pyarrow")
    return nonempty_or_typed_table(out, {
        id_col: pa.int64(), "n_windows": pa.int64(),
        "n_overlap_windows": pa.int64(), "overlap_ratio": pa.float64()})


# ------------------------------------------- content-defined chunking (CDC)

CDC_WINDOW = 4   # words per rolling cut window
CDC_DIVISOR = 8  # cut when hash32(window) % CDC_DIVISOR == 0 (~8-word chunks)


def cdc_chunk_rows(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text", window: int = CDC_WINDOW,
                   divisor: int = CDC_DIVISOR) -> pa.Table:
    """Explode each document into content-defined chunks (FastCDC-style,
    at word granularity): a chunk boundary falls after word i when the
    md5-hash32 of the last ``window`` words is 0 mod ``divisor`` (and at
    end-of-doc). Boundaries depend only on local content, so inserting a
    word shifts ONLY the chunk containing it — every later chunk realigns
    and deduplicates, unlike fixed-width chunking.

    md5-hash32 is the repo-wide oracle-able hash rule
    (``('0x' || substring(md5(s),1,8))::UBIGINT`` in DuckDB); the 100-TB
    path swaps in a gear/crc rolling hash with identical plumbing — this
    is the correctness-anchor variant, the minhash_pairs_md5 convention.
    Per-row explode, no shuffle."""
    text = pc.fill_null(batch[text_col], "")
    n = batch.num_rows
    words = pc.split_pattern_regex(text, r"\s+")
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words)
    mask = pc.not_equal(flat, "")
    w = flat.filter(mask).to_numpy(zero_copy_only=False)
    p = parent.filter(mask).to_numpy()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    cols = {id_col: pa.int64(), "chunk_idx": pa.int64(),
            "n_chunk_words": pa.int64(), "chunk_hash": pa.string()}
    if len(w) == 0:
        return pa.table({k: pa.array([], t) for k, t in cols.items()})

    nw = np.bincount(p, minlength=n)
    starts = np.concatenate([[0], np.cumsum(nw)[:-1]])
    widx = np.arange(len(p), dtype=np.int64) - starts[p]

    s = pd.Series(w, dtype=object)
    win = s
    for k in range(1, window):
        win = s.shift(k) + " " + win
    wv = win.to_numpy()

    cut = np.zeros(len(p), bool)
    cut[:-1] = p[:-1] != p[1:]
    cut[-1] = True
    idx = np.nonzero(widx >= window - 1)[0]
    cut[idx] |= np.fromiter(
        (int(hashlib.md5(wv[i].encode("utf-8")).hexdigest()[:8], 16)
         % divisor == 0 for i in idx), bool, len(idx))

    cum = np.concatenate([[0], np.cumsum(cut[:-1])]).astype(np.int64)
    cidx = cum - cum[starts[p]]
    g = pd.DataFrame({"p": p, "c": cidx, "w": w}).groupby(["p", "c"],
                                                          sort=True)
    ch = g["w"].agg(" ".join).reset_index()
    sizes = g.size().to_numpy()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in ch["w"]]
    return pa.table({
        id_col: pa.array(ids[ch["p"].to_numpy()], pa.int64()),
        "chunk_idx": pa.array(ch["c"].to_numpy().astype(np.int64)),
        "n_chunk_words": pa.array(sizes.astype(np.int64)),
        "chunk_hash": pa.array(hashes, pa.string())})


def cdc_chunk_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    window: int = CDC_WINDOW, divisor: int = CDC_DIVISOR,
                    n_coarse: int = N_COARSE):
    """Corpus-level chunk dedup over content-defined chunks: every chunk
    row is labeled with its global owner = min (doc_id, chunk_idx) among
    identical chunk hashes, and ``is_dup`` for non-owners — the
    storage-dedup ratio view of a corpus (and the primitive behind
    incremental-crawl chunk stores).

    One coarse digest-prefix exchange (the exact_dedup shuffle shape) —
    chunk TEXT never moves, only 16-byte-hash-keyed stat rows; owners
    resolve vectorized inside each coarse partition."""
    chunks = ds.map_batches(
        lambda b: cdc_chunk_rows(b, id_col, text_col, window, divisor),
        batch_format="pyarrow")

    def add_coarse(batch: pa.Table) -> pa.Table:
        coarse = str_hash.crc32_of_strings(batch["chunk_hash"]) % n_coarse
        return batch.append_column(
            "coarse", pa.array(coarse.astype(np.int32), pa.int32()))

    def owners(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["chunk_hash", id_col, "chunk_idx"],
                           kind="mergesort").reset_index(drop=True)
        h = d["chunk_hash"].to_numpy()
        new = np.ones(len(d), bool)
        if len(d) > 1:
            new[1:] = h[1:] != h[:-1]
        sizes = np.diff(np.append(np.nonzero(new)[0], len(d)))
        od = np.repeat(d[id_col].to_numpy()[new], sizes)
        oc = np.repeat(d["chunk_idx"].to_numpy()[new], sizes)
        mine = (od == d[id_col].to_numpy()) & \
               (oc == d["chunk_idx"].to_numpy())
        return pd.DataFrame({
            id_col: d[id_col], "chunk_idx": d["chunk_idx"],
            "n_chunk_words": d["n_chunk_words"],
            "chunk_hash": d["chunk_hash"],
            "owner_doc_id": pd.array(od, "int64"),
            "owner_chunk_idx": pd.array(oc, "int64"),
            "is_dup": ~mine})

    out = (chunks.map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse").map_groups(owners, batch_format="pandas"))
    return _typed_empty_union(out, {
        id_col: pa.int64(), "chunk_idx": pa.int64(),
        "n_chunk_words": pa.int64(), "chunk_hash": pa.string(),
        "owner_doc_id": pa.int64(), "owner_chunk_idx": pa.int64(),
        "is_dup": pa.bool_()})
