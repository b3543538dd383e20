"""Training-data analysis pipelines over the driver tables (documents /
embeddings) + extraction-derived analytics over the synthetic pages corpus.

Each function takes ``sf_dir`` and returns a Dataset whose column names
match the corresponding SQL oracle in ``__ray_entry__`` exactly.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum

from .. import corpus, str_hash
from ..functions.textproc import compression_ratio, summarize
from ..stages import crawl, dedup, similarity, text_analysis
from . import reads
from .extract import extract_pipeline, extract_pipeline_dedup, read_pages

DOUBLE_OFFSET = 1_000_000  # doc_id offset for the duplicated-corpus variants


def _docs(sf_dir: str, columns=None):
    return reads.read_small_aware(os.path.join(sf_dir, "documents.parquet"),
                                  columns=columns)


def _coarse_hint_for(path: str, mult: int = 1) -> int:
    """Coarse shuffle-partition hint sized to a parquet table (~2k rows per
    partition, capped at dedup.N_COARSE) — parquet METADATA row count, no
    scan. Tiny tiers then don't pay 256-way per-block fixed costs
    (~10 ms/partition/pass) while CPU-heavy group fns still parallelize
    (measured sweep at the 20k-row tier: 1 partition serializes the verify
    join at 7.4 s, 4-16 partitions hit 4.8 s); 100 TB corpora cap at 256
    and spread across the full cluster."""
    n = pq.ParquetFile(path).metadata.num_rows
    return min(dedup.N_COARSE, (n * mult) // 2_000 + 1)


def _docs_coarse_hint(sf_dir: str, mult: int = 1) -> int:
    return _coarse_hint_for(os.path.join(sf_dir, "documents.parquet"), mult)


def _doubled_docs(sf_dir: str):
    """documents ∪ (documents with doc_id + DOUBLE_OFFSET): every text is
    duplicated exactly once — a guaranteed-positive dedup workload."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.add(batch["doc_id"], pa.scalar(DOUBLE_OFFSET, pa.int64())),
            "text": batch["text"]})

    return base.union(base.map_batches(shift, batch_format="pyarrow"))


# ------------------------------------------------------------ text analysis

def token_counts_docs(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_analysis.token_counts, batch_format="pyarrow").sort("doc_id")


def quality_docs(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_analysis.quality_scores, batch_format="pyarrow").sort("doc_id")


def gram_novelty_docs(sf_dir: str):
    """Per-doc distinct-3-gram count + corpus-novel (df == 1) count —
    the memorization/duplication-pressure signal (stages/text_analysis
    .gram_novelty: explode → distributed df carrying Min(doc_id) →
    join-free per-doc rollup; value-exact SQL oracle over the same gram
    strings)."""
    return text_analysis.gram_novelty(_docs(sf_dir, ["doc_id", "text"]))


def langid_docs(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_analysis.lang_id, batch_format="pyarrow").sort("doc_id")


def fingerprint_docs(sf_dir: str):
    def stats(batch: pa.Table) -> pa.Table:
        fp = text_analysis.fingerprint(batch)
        firsts = [f[0] if f else None for f in fp["fingerprints"].to_pylist()]
        return pa.table({"doc_id": fp["doc_id"],
                         "n_fingerprints": fp["n_fingerprints"],
                         "first_fp": pa.array(firsts, pa.int64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow").sort("doc_id")


def summarize_docs(sf_dir: str):
    """Extractive summary (F4, v2 semantics: ratio 0.3, max 5 sentences,
    30-word gate app2.py:1336/1446) over every document."""
    def s(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sums, ratios = [], []
        for t in texts:
            t = t or ""
            out = t if len(t.split()) < 30 else summarize(t, 0.3, 5)
            sums.append(out)
            ratios.append(compression_ratio(out, t))
        return pa.table({"doc_id": batch["doc_id"],
                         "summary": pa.array(sums, pa.string()),
                         "compression_ratio": pa.array(ratios, pa.float64())})
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        s, batch_format="pyarrow").sort("doc_id")


import re as _re

# re.ASCII so \w ≡ [A-Za-z0-9_] — the SAME token class as the RE2 engines
# on both oracle sides (DuckDB regexp_extract_all and Arrow's pc count);
# Python's default unicode \w would diverge on any non-ASCII word
# character ('café' → 'café' vs RE2's 'caf'). ONE compiled tokenizer
# shared by every word-count operator (word_freq_top, unigram_logprob,
# heavy_hitter_words) so their value-exactness cannot drift apart.
_WORD_TOKEN_RE = _re.compile(r"\w+", _re.ASCII)


def _word_count_partial(batch: pa.Table) -> pa.Table:
    """The shared per-batch wordcount combiner: Counter over lowered
    ``\\w+`` tokens → one (word, n) row per distinct word — the shuffle
    is bounded by per-batch vocabulary, not token count."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch["text"].to_pylist():
        c.update(_WORD_TOKEN_RE.findall((t or "").lower()))
    return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                     "n": pa.array(list(c.values()), pa.int64())})


def word_freq_top(sf_dir: str, k: int = 100):
    """G4 as a distributed wordcount: per-batch partial Counter (combiner)
    → groupby(word) Sum → global top-k by (count desc, word asc)."""
    from ..stages.topk import topk_table

    agg = (_docs(sf_dir, ["text"])
           .map_batches(_word_count_partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("n", alias_name="n")))
    # distributed partial-top-k finisher — no global sort to keep k rows
    return topk_table(agg, [("n", "descending"), ("word", "ascending")], k)


def _bigram_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch adjacent-bigram combiner: Counter over whitespace tokens
    (str.split semantics — matches the oracle's regexp_split_to_array with
    empties filtered) → one (bigram, n) row per distinct bigram."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch["text"].to_pylist():
        toks = (t or "").split()
        c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    return pa.table({"bigram": pa.array(list(c.keys()), pa.string()),
                     "n": pa.array(list(c.values()), pa.int64())})


def bigram_freq_top(sf_dir: str, k: int = 100):
    """Corpus-wide adjacent-bigram counts, top-k by (count desc, bigram
    asc) — the n-gram-LM statistics pass (combiner → one bounded-vocab
    groupby → tiny global sort/limit)."""
    from ..stages.topk import topk_table

    agg = (_docs(sf_dir, ["text"])
           .map_batches(_bigram_count_partial, batch_format="pyarrow")
           .groupby("bigram").aggregate(Sum("n", alias_name="n")))
    return topk_table(agg, [("n", "descending"), ("bigram", "ascending")], k)


CHUNK_WIDTH = 120
CHUNK_STRIDE = 80


def chunk_docs(sf_dir: str):
    """RAG-prep chunking: overlapping fixed windows (120 chars, stride
    80 → 40-char overlap) per document — the flat-map exploder every
    retrieval pipeline runs before embedding. Fully vectorized: one
    utf8 slice kernel per window offset, masked to rows long enough;
    empty/null docs produce no chunks. Returns
    (doc_id, chunk_idx, chunk_text, n_chars)."""

    def explode(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        lens = pc.utf8_length(t).to_numpy().astype(np.int64)
        maxlen = int(lens.max()) if len(lens) else 0
        ids, idxs, chunks = [], [], []
        for k, start in enumerate(range(0, max(maxlen, 1), CHUNK_STRIDE)):
            mask = lens > start
            if not mask.any():
                break
            m = pa.array(mask)
            ids.append(batch["doc_id"].filter(m))
            piece = pc.utf8_slice_codeunits(
                t.filter(m), start, start + CHUNK_WIDTH)
            chunks.append(piece)
            idxs.append(np.full(int(mask.sum()), k, np.int64))
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_chars": pa.array([], pa.int64())})
        text = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in chunks])
        return pa.table({
            "doc_id": pa.concat_arrays(
                [i.combine_chunks() if isinstance(i, pa.ChunkedArray)
                 else i for i in ids]),
            "chunk_idx": pa.array(np.concatenate(idxs), pa.int64()),
            "chunk_text": text,
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(explode, batch_format="pyarrow")
            .sort(["doc_id", "chunk_idx"]))


SPLIT_PCT = (90, 95)  # train < 90% ≤ val < 95% ≤ test


def train_val_test_split(sf_dir: str):
    """Deterministic corpus split: md5(doc_id) hash ranges assign
    train/val/test at 90/5/5 — membership is a pure function of the key
    (the sample_docs rule), so the split is stable across runs,
    partitionings, cluster sizes, and reproducible in SQL."""
    lo = (1 << 32) * SPLIT_PCT[0] // 100
    hi = (1 << 32) * SPLIT_PCT[1] // 100

    def assign(batch: pa.Table) -> pa.Table:
        h = np.array([_hash32(i) for i in batch["doc_id"].to_pylist()],
                     np.uint64)
        split = np.where(h < lo, "train", np.where(h < hi, "val", "test"))
        return pa.table({"doc_id": batch["doc_id"],
                         "split": pa.array(split, pa.string())})

    return (_docs(sf_dir, ["doc_id"])
            .map_batches(assign, batch_format="pyarrow").sort("doc_id"))


def normalize_docs(sf_dir: str):
    """Canonical text normalization — the first transform of every
    ingestion pipeline: lowercase, collapse whitespace runs to single
    spaces, strip edges. Value-exact STRING output (one vectorized RE2
    replace + trim per batch), plus the removed-char count. Purely
    per-row → no shuffle."""

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        clean = pc.utf8_trim(pc.replace_substring_regex(
            pc.utf8_lower(t), r"\s+", " "), " ")
        return pa.table({
            "doc_id": batch["doc_id"],
            "norm_text": clean,
            "n_removed_chars": pc.subtract(
                pc.cast(pc.utf8_length(t), pa.int64()),
                pc.cast(pc.utf8_length(clean), pa.int64()))})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(norm, batch_format="pyarrow").sort("doc_id"))


def nfc_docs(sf_dir: str):
    """Unicode NFC normalization — the canonical-composition pass every
    multilingual ingest needs before hashing/dedup (é as one codepoint
    vs e+combining-acute hash differently but read identically).
    Value-exact STRING output: CPython ``unicodedata.normalize('NFC')``
    is byte-identical to DuckDB's utf8proc ``nfc_normalize`` (pyarrow's
    ``utf8_normalize`` emits DECOMPOSED forms for form='NFC' in this
    build — verified wrong, not used). Per-row C call only on the
    non-ASCII rows (``str.isascii`` fast path — ASCII is NFC by
    definition and covers the bulk of webtext); purely per-row, no
    shuffle. Returns (doc_id, nfc_text, changed, n_cp, n_cp_nfc)."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(_nfc_kernel, batch_format="pyarrow")
            .sort("doc_id"))


def _nfc_kernel(batch: pa.Table) -> pa.Table:
    """The per-batch NFC kernel (module-level so tests drive it on
    crafted composed/decomposed/compat strings directly)."""
    import unicodedata

    out = []
    for t in batch["text"].to_pylist():
        t = t or ""
        out.append(t if t.isascii() else unicodedata.normalize("NFC", t))
    nfc = pa.array(out, pa.string())
    src = pc.fill_null(batch["text"], "")
    return pa.table({
        "doc_id": batch["doc_id"],
        "nfc_text": nfc,
        "changed": pc.not_equal(nfc, src),
        "n_cp": pc.cast(pc.utf8_length(src), pa.int64()),
        "n_cp_nfc": pc.cast(pc.utf8_length(nfc), pa.int64())})


MIX_TARGET_DEN = 4  # mixed sample targets 1/4 of corpus tokens


def mixed_sample_docs(sf_dir: str):
    """Deterministic data mixing: subsample every source to an equal
    token budget (total_tokens/4 split evenly across sources) — the
    mixture-rebalancing step of training-corpus assembly, but with
    hash-function membership instead of RNG so the sample is stable
    across runs, partitionings and cluster sizes, and reproducible in
    SQL. rate_s = min(1, budget / tokens_s); a doc survives iff
    md5(doc_id)'s first 8 hex digits fall under floor(2^32 · rate_s) —
    the sample_docs rule generalized to per-source float rates (floor of
    identical IEEE doubles on both sides).

    Scale shape: per-source token totals via an in-batch combiner (one
    row per source per batch) → tiny groupby → rates dict broadcast into
    a vectorized filter; the corpus streams through once."""

    def tok(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "n_tokens": pc.cast(pc.count_substring_regex(t, r"\S+"),
                                pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text", "source"]) \
        .map_batches(tok, batch_format="pyarrow").materialize()

    st = docs.groupby("source").sum("n_tokens").to_pandas()
    toks = st["sum(n_tokens)"].astype(np.int64)
    target = int(toks.sum()) // MIX_TARGET_DEN
    budget = float(target) / len(st)
    # a zero-token source keeps everything — matches the oracle's
    # least(1.0, x/0.0 = inf) = 1.0, and never divides by zero
    rates = {s: min(1.0, budget / float(t)) if t else 1.0
             for s, t in zip(st["source"], toks)}

    def keep(batch: pa.Table) -> pa.Table:
        thr = np.array([np.floor(4294967296.0 * rates[s])
                        for s in batch["source"].to_pylist()], np.float64)
        h = np.array([_hash32(i) for i in batch["doc_id"].to_pylist()],
                     np.float64)
        return batch.filter(pa.array(h < thr))

    return docs.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def incremental_dedup_docs(sf_dir: str):
    """Incremental exact dedup of a NEW shard against an existing
    snapshot — the steady-state shape of a production corpus (each crawl
    dedups against everything already ingested, never rescanning it at
    content grain). Snapshot membership is the deterministic 50%
    doc_id-hash rule (pure function of the key, reproducible in SQL);
    'old' rows contribute only their distinct digests.

    Scale shape: ONE digest-prefix shuffle — snapshot and new rows
    co-locate by content digest (the anti-join partitioning; never a
    broadcast, since at 100 TB the snapshot is the LARGER side), and
    inside each partition a vectorized resolve applies both gates: any
    digest the snapshot contains kills its new rows, otherwise the
    minimum-doc_id new row survives. Returns (doc_id, digest) of the
    surviving new rows. Runs over the DOUBLED corpus: a clone and its
    original hash to independent sides of the snapshot boundary, so both
    gates fire on real rows (~25% of clone pairs straddle it)."""
    nc = _docs_coarse_hint(sf_dir, 2)

    def project(batch: pa.Table) -> pa.Table:
        t = dedup.add_md5_digest(batch).select(["doc_id", "digest"])
        is_old = pa.array([_hash_keep(i, 50)
                           for i in t["doc_id"].to_pylist()], pa.bool_())
        coarse = [int(d[:4], 16) % nc for d in t["digest"].to_pylist()]
        return t.append_column("is_old", is_old) \
                .append_column("coarse", pa.array(coarse, pa.int32()))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        has_old = df.groupby("digest")["is_old"].transform("any")
        new = df[~df["is_old"] & ~has_old.to_numpy()]
        new = new.sort_values("doc_id").drop_duplicates("digest")
        return new[["doc_id", "digest"]]

    out = (_doubled_docs(sf_dir)
           .map_batches(project, batch_format="pyarrow")
           .groupby("coarse").map_groups(resolve, batch_format="pandas")
           .sort("doc_id"))
    return dedup.nonempty_or_typed_table(out, {
        "doc_id": pa.int64(), "digest": pa.string()})


def near_dedup_incremental_docs(sf_dir: str):
    """Incremental NEAR-dedup of a new shard against an existing snapshot
    — the MinHash sibling of incremental_dedup (same deterministic 50%
    doc_id-hash snapshot rule, same doubled corpus so clone pairs
    straddle the boundary), completing the incremental dimension of the
    dedup ladder at near-dup grain. Returns every (new_id, old_id,
    est_jaccard) mixed pair sharing an LSH band with est >= 0.5, via the
    value-exact md5-minhash arithmetic (stages/dedup.minhash_pairs_md5
    conventions); the bucket walk sweeps only the old×new rectangle, so
    snapshot-internal pairs are never enumerated."""

    def old_pred(ids: np.ndarray) -> np.ndarray:
        return np.array([_hash_keep(int(i), 50) for i in ids], bool)

    out = dedup.minhash_pairs_md5_incremental(
        _doubled_docs(sf_dir), old_pred,
        n_coarse=_docs_coarse_hint(sf_dir, 2))
    return out if isinstance(out, pa.Table) \
        else out.sort(["new_id", "old_id"])


MG_CAPACITY = 2000     # Misra-Gries summary size per batch
MG_CANDIDATES = 400    # candidate pool carried into the exact pass


def heavy_hitter_words(sf_dir: str, k: int = 100,
                       capacity: int = MG_CAPACITY,
                       candidates: int = MG_CANDIDATES):
    """Top-k words by the two-pass heavy-hitters recipe — the bounded-
    memory alternative to a full-vocabulary shuffle at 100 TB:

    1. per-batch Misra-Gries summary of ``capacity`` counters (exact
       batch Counter compressed by decrementing the (C+1)-th largest
       count — any word with batch share > 1/C survives with a lower
       bound) → groupby sum of lower bounds → top ``candidates`` to the
       driver (BOUNDED — this is the only vocabulary that ever leaves
       the distributed side);
    2. exact counts for the broadcast candidate set only → top-k.

    Output equals word_freq_top exactly whenever the candidate pool
    covers the true top-k (guaranteed for words with corpus share
    > 1/capacity; the unit test exercises an eviction-heavy capacity),
    so the same SQL oracle value-checks this operator."""
    from collections import Counter

    def mg_partial(batch: pa.Table) -> pa.Table:
        t = _word_count_partial(batch)
        c = Counter(dict(zip(t["word"].to_pylist(), t["n"].to_pylist())))
        if len(c) > capacity:
            cut = sorted(c.values(), reverse=True)[capacity]
            c = Counter({w: n - cut for w, n in c.items() if n > cut})
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    docs = _docs(sf_dir, ["text"])
    from ..stages.topk import topk_table

    pool = topk_table(
        docs.map_batches(mg_partial, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("n", alias_name="n")),
        [("n", "descending"), ("word", "ascending")], candidates).to_pandas()
    if "word" not in pool.columns or not len(pool):
        # token-free corpus: all-empty blocks erode columns (known trap)
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    cand = set(pool["word"])

    def exact_partial(batch: pa.Table) -> pa.Table:
        t = _word_count_partial(batch)
        return t.filter(pc.is_in(t["word"],
                                 value_set=pa.array(sorted(cand))))

    exact = (docs.map_batches(exact_partial, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n", alias_name="n")))
    return topk_table(exact, [("n", "descending"), ("word", "ascending")], k)


UNIGRAM_VOCAB_K = 100
NLP_SCALE = 1_000_000  # fixed-point micro-nats: order-independent sums


def unigram_logprob_docs(sf_dir: str, vocab_k: int = UNIGRAM_VOCAB_K):
    """Unigram-LM surprisal scoring — the classic cheap perplexity proxy
    for webtext quality (CCNet-style, lighter than a KenLM): p(w) =
    corpus_count(w)/total_tokens over a bounded top-k vocabulary,
    out-of-vocabulary tokens smoothed to count 1; per-document score =
    mean token surprisal -ln p(w).

    Scale shape: corpus counts via the word_freq combiner (shuffle bounded
    by per-batch vocabulary), materialized once for its two bounded
    consumers (total-token scalar, top-k vocab); the k-row vocab
    broadcasts into the scoring stage — the corpus streams through once,
    nothing joins at token grain. Per-token surprisals are quantized to
    integer micro-nats (floor, like the integer-cent currency sums) so
    per-doc sums are order-independent, and the quantization is
    PRECOMPUTED per distinct count with libm ``math.log`` — DuckDB's ln
    is bit-identical to math.log (verified 0/50k fuzzed mismatches)
    while numpy's SIMD log diverges by 1 ulp on ~20% of inputs, which
    could flip a floor; the per-token hot path is then a pure integer
    dict lookup."""
    import math

    counts = (_docs(sf_dir, ["text"])
              .map_batches(_word_count_partial, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("n", alias_name="n"))
              .materialize())
    if counts.count() == 0:  # token-free corpus: every doc scores zero
        vmap, total = {}, 0
    else:
        total = counts.sum("n") or 0
        vocab = counts.sort(["n", "word"], descending=[True, False]) \
                      .limit(vocab_k).to_pandas()
        vmap = dict(zip(vocab["word"], vocab["n"].astype(np.int64)))
    qmap = {int(c): int(math.floor(-math.log(c / total) * NLP_SCALE))
            for c in set(vmap.values()) | {1}} if total else {}
    qv = {w: qmap[int(c)] for w, c in vmap.items()}
    q_oov = qmap.get(1, 0)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        n = batch.num_rows
        n_tok = np.zeros(n, np.int64)
        n_oov = np.zeros(n, np.int64)
        sum_q = np.zeros(n, np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = _WORD_TOKEN_RE.findall((t or "").lower())
            if not toks or not total:
                continue
            n_tok[i] = len(toks)
            n_oov[i] = sum(w not in qv for w in toks)
            sum_q[i] = sum(qv.get(w, q_oov) for w in toks)
        avg = sum_q.astype(np.float64) \
            / (np.maximum(n_tok, 1) * float(NLP_SCALE))
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
            "avg_surprisal": pa.array(avg, pa.float64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(score, batch_format="pyarrow").sort("doc_id"))


BIGRAM_OOV = "#oov"  # '#' is not a \w character, so no token collides


def bigram_surprisal_docs(sf_dir: str, vocab_k: int = UNIGRAM_VOCAB_K):
    """Class-based bigram-LM surprisal — the CCNet-style (Wenzek et al.
    2020) LM-perplexity quality signal one order up from
    unigram_logprob_docs: every token maps to a top-k vocabulary class
    or a single OOV class (alphabet V = k + 1, so the model is BOUNDED
    regardless of corpus vocabulary), and each adjacent pair scores
    -ln p(c2|c1) with add-one smoothing
        p(c2|c1) = (c(c1,c2) + 1) / (c_first(c1) + V),
    c_first(c1) = Σ_b c(c1,b) (the bigram-table row mass, so the
    distribution normalizes exactly).

    Scale shape: one corpus pass for unigram counts (word_freq
    combiner), one for class-bigram counts (per-batch Counter emits
    ≤ V² rows per batch; the groupby output is ≤ V² = (k+1)² rows
    total — driver-bounded by construction), one scoring pass with the
    precomputed q-table riding the closure. Per-pair surprisals are
    floor-quantized to integer micro-nats with libm ``math.log``
    (DuckDB-ln-bit-identical — the unigram_logprob convention) so
    per-doc sums are order-independent int64."""
    return _bigram_surprisal(_docs(sf_dir, ["doc_id", "text"]), vocab_k)


def _bigram_fit(docs, vocab_k: int = UNIGRAM_VOCAB_K) -> dict:
    """Fit the class-bigram LM of bigram_surprisal_docs over a (text)
    Dataset and return the scoring model as a plain dict:

      vset     — top-``vocab_k`` vocabulary (class alphabet minus OOV)
      v_alpha  — |vset| + 1 (the add-one smoothing V)
      q_pair   — (c1, c2) → micro-nat surprisal for FIT-observed pairs
      q_unseen — c1 → surprisal of an unseen pair after a seen-first c1
      q_cold   — surprisal when c1 was never observed first in the fit
                 corpus (den = 0 + V); reachable when scoring docs
                 OUTSIDE the fit corpus (Moore-Lewis in-domain model)

    All three tiers collapse to ONE formula — q(c1, c2) =
    floor(-ln((c(c1,c2) + 1) / (c_first(c1) + V)) · 1e6) with missing
    counts read as 0 — which is what the SQL oracles compute with
    coalesce(n, 0) / coalesce(nf, 0); the dict split here is just the
    hot-path lookup layout. Micro-nats use libm ``math.log`` (DuckDB-ln
    bit-identical; numpy's SIMD log diverges by 1 ulp on ~20% of inputs
    and could flip a floor)."""
    import math

    from ray.data.aggregate import Sum as _Sum
    counts = (docs.select_columns(["text"])
              .map_batches(_word_count_partial, batch_format="pyarrow")
              .groupby("word").aggregate(_Sum("n", alias_name="n"))
              .materialize())
    if counts.count() == 0:
        vset: set = set()
    else:
        vocab = counts.sort(["n", "word"], descending=[True, False]) \
                      .limit(vocab_k).to_pandas()
        vset = set(vocab["word"])
    v_alpha = len(vset) + 1  # class alphabet incl. OOV

    def classes_of(text) -> list:
        toks = _WORD_TOKEN_RE.findall((text or "").lower())
        return [w if w in vset else BIGRAM_OOV for w in toks]

    def bigram_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            cls = classes_of(t)
            c.update(zip(cls, cls[1:]))
        return pa.table({
            "w1": pa.array([k[0] for k in c], pa.string()),
            "w2": pa.array([k[1] for k in c], pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    bigc = (docs.select_columns(["text"])
            .map_batches(bigram_partial, batch_format="pyarrow")
            .groupby(["w1", "w2"]).aggregate(_Sum("n", alias_name="n"))
            .to_pandas())  # ≤ (k+1)² rows — bounded by the class alphabet
    if len(bigc) == 0:  # 0-row to_pandas drops columns — rebuild typed
        bigc = pd.DataFrame({"w1": pd.array([], "string"),
                             "w2": pd.array([], "string"),
                             "n": pd.array([], "int64")})
    c_first: dict = {}
    for w1, n in zip(bigc["w1"], bigc["n"].astype(np.int64)):
        c_first[w1] = c_first.get(w1, 0) + int(n)
    # precompute micro-nat surprisals per distinct (num, den) with libm
    # math.log (numpy's SIMD log diverges by 1 ulp and could flip a floor)
    qmap = {(num, den): int(math.floor(-math.log(num / den) * NLP_SCALE))
            for num, den in
            {(int(n) + 1, c_first[w1] + v_alpha)
             for w1, n in zip(bigc["w1"], bigc["n"].astype(np.int64))}
            | {(1, c_first.get(c, 0) + v_alpha)
               for c in set(c_first) | {BIGRAM_OOV}}}
    q_pair = {(w1, w2): qmap[(int(n) + 1, c_first[w1] + v_alpha)]
              for w1, w2, n in zip(bigc["w1"], bigc["w2"],
                                   bigc["n"].astype(np.int64))}
    q_unseen = {c: qmap[(1, c_first.get(c, 0) + v_alpha)]
                for c in set(c_first) | {BIGRAM_OOV}}
    # first-class never observed first anywhere: den = 0 + V (only
    # reachable when scoring docs outside the fit corpus)
    q_cold = int(math.floor(-math.log(1 / v_alpha) * NLP_SCALE))
    return {"vset": vset, "v_alpha": v_alpha, "q_pair": q_pair,
            "q_unseen": q_unseen, "q_cold": q_cold}


def _bigram_doc_q(model: dict, text) -> tuple:
    """(n_bigrams, Σ micro-nat surprisal) of one document under a
    _bigram_fit model — the shared scoring kernel."""
    vset = model["vset"]
    toks = _WORD_TOKEN_RE.findall((text or "").lower())
    cls = [w if w in vset else BIGRAM_OOV for w in toks]
    if len(cls) < 2:
        return 0, 0
    q_pair, q_unseen = model["q_pair"], model["q_unseen"]
    q_cold = model["q_cold"]
    return len(cls) - 1, sum(
        q_pair[p] if p in q_pair else q_unseen.get(p[0], q_cold)
        for p in zip(cls, cls[1:]))


def _bigram_surprisal(docs, vocab_k: int = UNIGRAM_VOCAB_K):
    """Core of bigram_surprisal_docs over an arbitrary (doc_id, text)
    Dataset (split out so tests can run synthetic corpora): fit the
    class-bigram LM on the SAME corpus it scores."""
    model = _bigram_fit(docs, vocab_k)

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_big = np.zeros(n, np.int64)
        sum_q = np.zeros(n, np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            n_big[i], sum_q[i] = _bigram_doc_q(model, t)
        avg = sum_q.astype(np.float64) \
            / (np.maximum(n_big, 1) * float(NLP_SCALE))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_big, pa.int64()),
            "surprisal_micro_nats": pa.array(sum_q, pa.int64()),
            "avg_surprisal": pa.array(avg, pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


def _int_quantile_disc(ds, col: str, qs, bin_shift: int = 16) -> list:
    """Exact discrete quantiles sorted[max(ceil(q·n)−1, 0)] (the DuckDB
    quantile_disc rule pinned by event_value_quantiles) of an int64
    column WITHOUT materializing the value set — the scalable_quantiles
    two-pass histogram refinement, generic over any integer column:

      pass 1 — per-batch ``value >> bin_shift`` histogram partials
        (arithmetic shift: monotone, negatives floor) → bounded driver
        merge (occupied bins ≤ value-range / 2^bin_shift);
      driver — cumulative counts locate each rank's bin + within-rank;
      pass 2 — stream again keeping only candidate-bin rows (~n/range
        each); their sorted values yield the exact elements.

    ``ds`` is streamed twice — pass a materialized Dataset. Returns one
    int per q (None for each q when the column is empty)."""
    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        ub, cnt = np.unique(v >> bin_shift, return_counts=True)
        return pa.table({"bin": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bin", as_index=False)["n"].sum()

    raw = (ds.map_batches(hist_partial, batch_format="pyarrow")
           .map_batches(combine, batch_format="pandas").to_pandas())
    if not len(raw):
        return [None] * len(qs)
    hist = combine(raw).sort_values("bin")
    n = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    bins = hist["bin"].to_numpy()
    need: dict[int, list[tuple[int, int]]] = {}
    for qi, q in enumerate(qs):
        idx = max(int(np.ceil(q * n)) - 1, 0)
        j = int(np.searchsorted(cum, idx + 1))
        within = idx - (int(cum[j - 1]) if j else 0)
        need.setdefault(int(bins[j]), []).append((qi, within))
    cand_bins = np.array(sorted(need), np.int64)

    def collect(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(v >> bin_shift, cand_bins)
        return pa.table({col: pa.array(v[mask], pa.int64())})

    cand = (ds.map_batches(collect, batch_format="pyarrow")
            .to_pandas())
    cv = (cand[col].to_numpy().astype(np.int64) if len(cand)
          else np.array([], np.int64))
    out: list = [None] * len(qs)
    for b, wants in need.items():
        vals = np.sort(cv[(cv >> bin_shift) == b])
        for qi, within in wants:
            out[qi] = int(vals[within])
    return out


def perplexity_buckets_docs(sf_dir: str, vocab_k: int = UNIGRAM_VOCAB_K):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.4): docs
    split into head / middle / tail TERCILES of the class-bigram LM
    surprisal — the standard webtext curation signal (train on head,
    downsample tail). The per-doc statistic is avg_micro =
    surprisal_micro_nats // max(n_bigrams, 1): an INTEGER floor
    division, so the tercile cut elements and every comparison are
    value-exact in SQL (no float quantiles).

    Scale shape: the scored table (4 int64 cols per doc) materializes
    once — it is orders of magnitude smaller than the corpus — then the
    two-pass _int_quantile_disc histogram refinement finds the cut
    elements without sorting it; the bucket pass is one comparison per
    row. Cut ranks use ceil(q·n) with q = 1/3, 2/3 as IEEE doubles
    (CAST(1 AS DOUBLE)/3 in SQL — the identical double on both
    sides)."""
    scored = _bigram_surprisal(_docs(sf_dir, ["doc_id", "text"]), vocab_k)

    def add_avg(batch: pa.Table) -> pa.Table:
        s = batch["surprisal_micro_nats"].to_numpy(zero_copy_only=False)
        nb = batch["n_bigrams"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": batch["n_bigrams"],
            "avg_micro": pa.array(s // np.maximum(nb, 1), pa.int64())})

    scored = scored.map_batches(add_avg,
                                batch_format="pyarrow").materialize()
    cols = {"doc_id": pa.int64(), "n_bigrams": pa.int64(),
            "avg_micro": pa.int64(), "bucket": pa.string()}
    if scored.count() == 0:
        return pa.table({c: pa.array([], t) for c, t in cols.items()})
    c1, c2 = _int_quantile_disc(scored, "avg_micro", (1 / 3, 2 / 3))

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch["avg_micro"].to_numpy(zero_copy_only=False)
        b = np.where(v <= c1, "head",
                     np.where(v <= c2, "middle", "tail"))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_bigrams": batch["n_bigrams"],
                         "avg_micro": batch["avg_micro"],
                         "bucket": pa.array(b.astype(object), pa.string())})

    return scored.map_batches(bucketize,
                               batch_format="pyarrow").sort("doc_id")


ML_TARGET_SOURCE = "src0"  # target_affinity_docs' in-domain convention


def moore_lewis_docs(sf_dir: str, target_source: str = ML_TARGET_SOURCE,
                     vocab_k: int = UNIGRAM_VOCAB_K):
    """Moore-Lewis cross-entropy-difference data selection (Moore &
    Lewis 2010, "Intelligent Selection of Language Model Training
    Data"): score every document by H_in(d) − H_out(d), the surprisal
    under an IN-DOMAIN LM (fit only on the ``target_source`` slice)
    minus the surprisal under the general-corpus LM, and keep the
    below-median half — text that looks more like the target domain
    than like the corpus at large. The LMs are the class-bigram models
    of bigram_surprisal_docs (bounded alphabet = top-k vocab + OOV,
    add-one smoothing); scoring docs OUTSIDE the fit slice exercises
    the model's unseen-pair / cold-first fallbacks, which collapse to
    the single coalesce formula the SQL oracle uses (see _bigram_fit).

    Scale shape: two LM fits (each = one wordcount combiner pass + one
    bounded ≤(k+1)² bigram-count pass; the in-domain fit streams only
    the target slice), then ONE scoring pass over the corpus computes
    both sums from one tokenization — the two models ride the closure
    (≤ (k+1)² ints each). delta_micro = in − out is an exact int64;
    avg_delta_micro is a Python-floor division (negative-safe — DuckDB
    ``//`` truncates, so the oracle uses the (a − ((a%n)+n)%n)//n floor
    identity); the median cut reuses the _int_quantile_disc two-pass
    histogram, so the keep flag is value-exact end to end."""
    docs = _docs(sf_dir, ["doc_id", "text", "source"])

    def in_slice(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(
            pc.fill_null(batch["source"], ""), target_source))

    m_in = _bigram_fit(
        docs.map_batches(in_slice, batch_format="pyarrow"), vocab_k)
    m_out = _bigram_fit(docs, vocab_k)

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_big = np.zeros(n, np.int64)
        s_in = np.zeros(n, np.int64)
        s_out = np.zeros(n, np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            n_big[i], s_in[i] = _bigram_doc_q(m_in, t)
            _, s_out[i] = _bigram_doc_q(m_out, t)
        delta = s_in - s_out
        avg = delta // np.maximum(n_big, 1)  # numpy floors like Python
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bigrams": pa.array(n_big, pa.int64()),
            "in_micro_nats": pa.array(s_in, pa.int64()),
            "out_micro_nats": pa.array(s_out, pa.int64()),
            "delta_micro": pa.array(delta, pa.int64()),
            "avg_delta_micro": pa.array(avg, pa.int64())})

    scored = (docs.map_batches(score, batch_format="pyarrow")
              .materialize())  # 6 int64 cols/doc; streamed twice below
    cols = {"doc_id": pa.int64(), "n_bigrams": pa.int64(),
            "in_micro_nats": pa.int64(), "out_micro_nats": pa.int64(),
            "delta_micro": pa.int64(), "avg_delta_micro": pa.int64(),
            "keep": pa.bool_()}
    if scored.count() == 0:
        return pa.table({c: pa.array([], t) for c, t in cols.items()})
    med = _int_quantile_disc(scored, "avg_delta_micro", (0.5,))[0]

    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "keep", pc.less_equal(batch["avg_delta_micro"],
                                  pa.scalar(med, pa.int64())))

    return scored.map_batches(flag, batch_format="pyarrow").sort("doc_id")


BM25_K1 = 1.2
BM25_B = 0.75
BM25_K1P1 = 2.2  # k1 + 1 as a LITERAL: both sides parse the same double
BM25_TOPK = 50
BM25_QUERY_OFFSET = 10  # query = vocab ranks 11..20 (mid-frequency terms)
BM25_QUERY_TERMS = 10


def bm25_top_docs(sf_dir: str, k: int = BM25_TOPK):
    """BM25 retrieval top-k (Robertson-Spärck Jones probabilistic
    ranking, the Lucene ln(1 + (N − df + 0.5)/(df + 0.5)) idf form,
    k1 = 1.2, b = 0.75): score every document against a deterministic
    query — the corpus vocabulary ranked (n DESC, word) rows 11..20,
    i.e. mid-frequency terms, so the query derives from the data and
    the oracle can rebuild it — and keep the top-k by score.

    Value-exactness: per-(doc, term) scores are floor-quantized to
    integer micro-units; every float factor is either a single IEEE
    op chain written identically in SQL (casts from exact int64,
    ×/÷ in the same association order, identical decimal literals —
    never derived constants) or libm ln ≡ DuckDB ln, so per-doc sums
    are order-independent int64 and the (score DESC, doc_id) top-k is
    a total order on both sides.

    Scale shape: one wordcount-combiner pass gives the vocabulary
    (query terms + total token count for avgdl); one corpus pass emits
    ≤ |query| long rows (doc_id, term, tf, dl) per matching doc — the
    materialized posting slice is bounded by matches, orders smaller
    than the corpus; df is a 10-row aggregate of it; the scoring pass
    + distributed partial-top-k finisher never sorts globally."""
    import math

    from ray.data.aggregate import Sum as _Sum
    docs = _docs(sf_dir, ["doc_id", "text"])
    counts = (docs.select_columns(["text"])
              .map_batches(_word_count_partial, batch_format="pyarrow")
              .groupby("word").aggregate(_Sum("n", alias_name="n"))
              .materialize())
    cols = {"doc_id": pa.int64(), "n_terms": pa.int64(),
            "score_micro": pa.int64(), "score": pa.float64()}
    empty = pa.table({c: pa.array([], t) for c, t in cols.items()})
    if counts.count() == 0:
        return empty
    total = counts.sum("n") or 0
    vocab = (counts.sort(["n", "word"], descending=[True, False])
             .limit(BM25_QUERY_OFFSET + BM25_QUERY_TERMS).to_pandas())
    qterms = list(vocab["word"][BM25_QUERY_OFFSET:])
    if not qterms:
        return empty
    qset = set(qterms)
    n_docs = docs.count()

    def postings(batch: pa.Table) -> pa.Table:
        from collections import Counter
        ids, terms, tfs, dls = [], [], [], []
        did = batch["doc_id"].to_pylist()
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = _WORD_TOKEN_RE.findall((t or "").lower())
            c = Counter(w for w in toks if w in qset)
            for w, tf in c.items():
                ids.append(did[i])
                terms.append(w)
                tfs.append(tf)
                dls.append(len(toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "term": pa.array(terms, pa.string()),
                         "tf": pa.array(tfs, pa.int64()),
                         "dl": pa.array(dls, pa.int64())})

    long = docs.map_batches(postings, batch_format="pyarrow") \
               .materialize()  # ≤ |query| rows per matching doc
    df_tab = (long.groupby("term")
              .aggregate(Count(alias_name="df")).to_pandas())
    idf = {t: math.log(1.0 + (float(n_docs - int(d)) + 0.5)
                       / (float(int(d)) + 0.5))
           for t, d in zip(df_tab["term"], df_tab["df"])}
    avgdl = float(total) / float(n_docs)

    def q_rows(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dl = batch["dl"].to_numpy(zero_copy_only=False)
        terms = batch["term"].to_pylist()
        q = np.empty(len(terms), np.int64)
        for i in range(len(terms)):  # libm-exact scalar chain per row
            tfw = float(tf[i])
            v = idf[terms[i]] \
                * ((tfw * BM25_K1P1)
                   / (tfw + BM25_K1 * ((1.0 - BM25_B)
                                       + BM25_B * (float(dl[i]) / avgdl)))) \
                * 1000000.0
            q[i] = math.floor(v)
        return pa.table({"doc_id": batch["doc_id"],
                         "q": pa.array(q, pa.int64())})

    from ..stages.topk import topk_table
    scored = (long.map_batches(q_rows, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(Count(alias_name="n_terms"),
                         _Sum("q", alias_name="score_micro")))
    top = topk_table(scored, [("score_micro", "descending"),
                              ("doc_id", "ascending")], k)
    if top.num_rows == 0 or "score_micro" not in top.column_names:
        return empty
    top = top.select(["doc_id", "n_terms", "score_micro"])
    score = pc.divide(pc.cast(top["score_micro"], pa.float64()),
                      pa.scalar(1000000.0, pa.float64()))
    return top.append_column("score", score)


def source_overlap_matrix(sf_dir: str):
    """Cross-source contamination matrix: for every source pair, the
    number of distinct word-bigrams they share and the Jaccard over their
    distinct-bigram sets — the standard check that corpus slices meant to
    be independent are not mirroring each other.

    Scale shape: per-batch distinct (source, bigram) rows (in-batch
    combiner) → ONE gram-hash coarse shuffle → per-partition global
    dedup, then per-gram source-set self-merge (bounded by n_sources² per
    gram) → pair partial counts. Everything after the shuffle is bounded
    by n_sources² + distinct grams; only the two tiny tables (per-source
    totals, pair counts) reach the driver."""
    nc = _docs_coarse_hint(sf_dir, 2)

    def explode(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(pc.fill_null(batch["text"], ""))
        w, p = text_analysis.word_frames(lower)
        src = batch["source"].to_numpy(zero_copy_only=False)
        adj = p[1:] == p[:-1] if len(p) > 1 else np.array([], bool)
        gp = p[:-1][adj] if len(p) > 1 else np.array([], np.int64)
        if not len(gp):
            return pa.table({"source": pa.array([], pa.string()),
                             "g": pa.array([], pa.string()),
                             "coarse": pa.array([], pa.int32())})
        g2 = (pd.Series(w[:-1][adj]) + " " + pd.Series(w[1:][adj])) \
            .to_numpy()
        df = pd.DataFrame({"source": src[gp], "g": g2}).drop_duplicates()
        coarse = str_hash.str_coarse(df["g"], nc)
        return pa.table({"source": pa.array(df["source"], pa.string()),
                         "g": pa.array(df["g"], pa.string()),
                         "coarse": pa.array(coarse)})

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["source", "g"])
        # per-partition per-source distinct-gram totals ride along under
        # kind='t' (an out-of-band marker — a sentinel VALUE in source_b
        # would collide with a legitimate empty-string source) so ONE
        # group pass feeds both outputs
        tot = d.groupby("source").size().reset_index(name="n")
        m = d.merge(d, on="g")
        m = m[m["source_x"] < m["source_y"]]
        pairs = m.groupby(["source_x", "source_y"]).size() \
                 .reset_index(name="n")
        return pd.DataFrame({
            "kind": ["t"] * len(tot) + ["p"] * len(pairs),
            "source_a": pd.concat([tot["source"], pairs["source_x"]],
                                  ignore_index=True),
            "source_b": [""] * len(tot) + list(pairs["source_y"]),
            "n": pd.concat([tot["n"], pairs["n"]],
                           ignore_index=True).astype("int64")})

    parts = (_docs(sf_dir, ["doc_id", "text", "source"])
             .map_batches(explode, batch_format="pyarrow")
             .groupby("coarse").map_groups(pair_counts,
                                           batch_format="pandas")
             .groupby(["kind", "source_a", "source_b"])
             .aggregate(Sum("n", alias_name="n")))
    agg = parts.to_pandas()  # bounded: n_sources + n_sources² rows
    if "kind" not in agg.columns or not len(agg):
        # bigram-free corpus: all-empty blocks erode columns (known trap)
        return pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_shared": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())})
    tot = agg[agg["kind"] == "t"].set_index("source_a")["n"]
    pairs = agg[agg["kind"] == "p"].copy()
    na = tot.reindex(pairs["source_a"]).to_numpy()
    nb = tot.reindex(pairs["source_b"]).to_numpy()
    shared = pairs["n"].to_numpy()
    out = pa.table({
        "source_a": pa.array(pairs["source_a"], pa.string()),
        "source_b": pa.array(pairs["source_b"], pa.string()),
        "n_shared": pa.array(shared.astype(np.int64)),
        "n_a": pa.array(na.astype(np.int64)),
        "n_b": pa.array(nb.astype(np.int64)),
        "jaccard": pa.array(shared.astype(np.float64)
                            / (na + nb - shared).astype(np.float64))})
    return out.sort_by([("source_a", "ascending"),
                        ("source_b", "ascending")])


def tfidf_top_terms(sf_dir: str, k: int = 5):
    """Per-doc top-k TF-IDF terms over the documents table (distributed df
    count + word-keyed join back — no vocabulary broadcast). The query
    surface emits the integer-exact columns (rank, word, tf, df): the
    RANKING is ulp-stable across engines (exact (tf, df) ties break by
    word on both sides; numpy log and DuckDB ln differ only in the last
    ulp), so it has a value-exact oracle — the float score itself is
    pinned by the pandas-recompute test instead (np.log vs ln disagree
    bitwise on ~28% of inputs, measured)."""
    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    return text_analysis.tfidf_top_terms(
        _docs(sf_dir, ["doc_id", "text"]), n_docs=n, k=k,
        n_coarse=_docs_coarse_hint(sf_dir, 8)) \
        .select_columns(["doc_id", "rank", "word", "tf", "df"]) \
        .sort(["doc_id", "rank"])


SCRUB_PATTERN = r"\b(spark|hash)\b"
SCRUB_TOKEN = "[REDACTED]"


def scrub_docs(sf_dir: str):
    """Redaction transform (the PII-scrub shape): replace every whole-word
    match of SCRUB_PATTERN with a redaction token — ONE vectorized RE2
    replace per batch (pc.replace_substring_regex) plus a vectorized match
    count. The oracle is DuckDB regexp_replace with the 'g' flag over the
    SAME pattern, making this a value-exact check of a string TRANSFORM
    (the other oracles compare aggregates)."""

    def scrub(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "scrubbed": pc.replace_substring_regex(
                batch["text"], SCRUB_PATTERN, SCRUB_TOKEN),
            "n_redacted": pc.cast(
                pc.count_substring_regex(batch["text"], SCRUB_PATTERN),
                pa.int64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(scrub, batch_format="pyarrow").sort("doc_id"))


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = r"\b\d[\d\- ]{6,}\d\b"


def pii_scrub_docs(sf_dir: str):
    """PII redaction (emails → <EMAIL>, IPv4 → <IP>, phone-like digit
    runs → <PHONE>) with per-category counts — the standard pre-training
    privacy pass, value-exact as a string TRANSFORM oracle.

    The corpus carries no natural PII, so the query first GRAFTS a
    deterministic PII suffix onto hash32(doc_id)%4∈{0,1,2} docs (the
    crawl_diff synthesis convention — both engine and SQL construct the
    same modified text), then scrubs. Patterns apply in order
    email → ip → phone, each count taken on the PREVIOUS stage's string,
    exactly as the SQL's nested regexp_replace does; all three are RE2 on
    both sides. One vectorized replace+count chain per batch, no
    shuffle."""

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        base = batch["text"].to_pylist()
        texts = []
        for i, t in zip(ids, base):
            g = _hash32(i) % 4
            t = t or ""
            if g == 0:
                t += f" contact user{i}@example.com now"
            elif g == 1:
                t += f" node 10.0.{i % 256}.{(i * 7) % 256} responded"
            elif g == 2:
                t += f" call 0812-34{i % 100:02d}-7890 today"
            texts.append(t)
        t0 = pa.array(texts, pa.string())
        n_emails = pc.cast(pc.count_substring_regex(t0, PII_EMAIL_RE),
                           pa.int64())
        t1 = pc.replace_substring_regex(t0, PII_EMAIL_RE, "<EMAIL>")
        n_ips = pc.cast(pc.count_substring_regex(t1, PII_IP_RE), pa.int64())
        t2 = pc.replace_substring_regex(t1, PII_IP_RE, "<IP>")
        n_phones = pc.cast(pc.count_substring_regex(t2, PII_PHONE_RE),
                           pa.int64())
        t3 = pc.replace_substring_regex(t2, PII_PHONE_RE, "<PHONE>")
        return pa.table({"doc_id": batch["doc_id"], "scrubbed": t3,
                         "n_emails": n_emails, "n_ips": n_ips,
                         "n_phones": n_phones})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(scrub, batch_format="pyarrow").sort("doc_id"))


def per_lang_topk_sample(sf_dir: str, k: int = 20):
    """Per-group fixed-size deterministic sample: the k docs per language
    with the smallest md5(doc_id) hash — the 'give me exactly k rows per
    stratum' counterpart to the fraction samplers. Hash order is a pure
    function of the key (stable across partitionings); rank runs in
    coarse lang-hash partitions (top-k-per-key shape, same as
    relational.top_events_per_user)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [_hash32(i) for i in batch["doc_id"].to_pylist()]
        return batch.append_column("h", pa.array(hs, pa.int64()))

    def topk(df):
        d = df.sort_values(["lang", "h", "doc_id"])
        d = d.assign(rnk=d.groupby("lang").cumcount() + 1)
        d = d[d["rnk"] <= k]
        return d[["lang", "rnk", "doc_id", "n_chars"]]

    return (_docs(sf_dir, ["doc_id", "lang", "n_chars"])
            .map_batches(add_hash, batch_format="pyarrow")
            .groupby("lang")
            .map_groups(topk, batch_format="pandas")
            .sort(["lang", "rnk"]))


def exact_dedup_kept(sf_dir: str):
    """D1's keep-side: one representative row (min doc_id) per distinct
    text — the corpus-filtering form of exact dedup (vs the stats form)."""
    return (dedup.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))
            .sort("doc_id"))


def quality_filtered(sf_dir: str, min_score: float = 0.5, min_words: int = 20):
    """Quality gate: keep documents with quality_score ≥ min_score and
    ≥ min_words whitespace words — the filter every training-data pipeline
    runs after scoring. Bit-exact vs SQL (same expression tree per row)."""
    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_analysis.quality_scores, batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["quality_score"], pa.scalar(min_score)),
                    pc.greater_equal(batch["n_words"],
                                     pa.scalar(min_words, pa.int64())))
        return batch.filter(m).select(["doc_id", "n_words", "quality_score"])

    return scored.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def docs_with_embeddings(sf_dir: str):
    """Distributed hash join of two large tables (documents ⨝ embeddings on
    doc_id = vec_id) via the general stages/joins.py operator — both sides
    shuffle once, co-partitioned on the key; no broadcast. Emits the joined
    row plus the embedding dim (deterministic int, so the oracle hash is
    exact without comparing floats)."""
    from ..stages.joins import hash_join

    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    embs = _embeddings(sf_dir)
    joined = hash_join(docs, embs, "doc_id", "vec_id", how="inner",
                       n_coarse=_docs_coarse_hint(sf_dir))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"], "lang": batch["lang"],
            "n_chars": batch["n_chars"],
            "emb_dim": pc.cast(pc.list_value_length(batch["embedding"]),
                               pa.int64())})

    return joined.map_batches(finalize, batch_format="pyarrow").sort("doc_id")


# ------------------------------------------------------------------- dedup

def exact_dedup_docs(sf_dir: str):
    return dedup.exact_dedup_stats(_docs(sf_dir, ["doc_id", "text"])).sort("digest")


def exact_dedup_doubled(sf_dir: str):
    return dedup.exact_dedup_stats(_doubled_docs(sf_dir)).sort("digest")


SKEW_HOT_TEXT = "HOT DUPLICATE PAYLOAD"


def exact_dedup_skew(sf_dir: str):
    """Hot-key stress form of exact dedup (SURVEY §2.7 D1): ~30% of the
    corpus is rewritten to ONE hot payload (keep ⇔ hash32(doc_id) % 10 < 3,
    the engine-wide sampling hash), so a single digest owns ~30% of all
    rows — the worst-case key skew a 100 TB dedup hits on boilerplate
    pages. Correct AND straggler-free under that skew because
    exact_dedup_stats exchanges per-block PARTIALS (Min/Count combine
    inside each block before the shuffle), so the hot digest reaches its
    reducer as ~n_blocks one-row partials, never 30% of the corpus;
    tests/test_operators.py asserts the wall-time stays comparable to the
    uniform corpus. Value-exact vs the same CASE/md5 SQL."""
    def skew(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = [SKEW_HOT_TEXT if _hash32(i) % 10 < 3 else (t or "")
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(out, pa.string())})

    skewed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        skew, batch_format="pyarrow")
    return dedup.exact_dedup_stats(skewed).sort("digest")


def soft_dedup_weights_doubled(sf_dir: str):
    """SoftDeDup duplication reweighting (stages/dedup.soft_dedup_weights)
    over the doubled corpus — every text has ≥2 copies, so every row's
    weight is a real reduction (1_000_000 // cluster_size micro-units).
    One coarse digest-prefix exchange of (id, digest) rows; value-exact
    vs the SQL count-per-md5-group + integer division."""
    return dedup.soft_dedup_weights(
        _doubled_docs(sf_dir),
        n_coarse=_docs_coarse_hint(sf_dir, 2)).sort("doc_id")


def soft_dedup_sampled_docs(sf_dir: str):
    """SoftDeDup sampling — the reweighting APPLIED: keep each row of the
    doubled corpus with probability weight_micro/1e6 via the engine-wide
    deterministic Bernoulli rule (keep ⇔ hash32(doc_id)·1e6 <
    weight_micro·2^32, pure function of the key — integer compare, no
    float). A 2-copy cluster keeps each member at ~50%, so in
    expectation one copy's worth of mass survives per cluster while
    every cluster keeps nonzero coverage. Membership never depends on
    partitioning; value-exact in SQL with the shared md5-prefix hash."""
    weights = dedup.soft_dedup_weights(
        _doubled_docs(sf_dir), n_coarse=_docs_coarse_hint(sf_dir, 2))

    def keep(batch: pa.Table) -> pa.Table:
        h = np.array([_hash32(i) for i in batch["doc_id"].to_pylist()],
                     np.int64)
        w = batch["weight_micro"].to_numpy().astype(np.int64)
        mask = h * 1_000_000 < w * (1 << 32)
        return batch.select(
            ["doc_id", "cluster_size", "weight_micro"]).filter(
            pa.array(mask))

    return weights.map_batches(keep, batch_format="pyarrow").sort("doc_id")


SOURCE_MIX_BUDGET = 1_000_000  # token budget the epoch plan allocates


def source_epoch_plan(sf_dir: str):
    """Mixture/epoch planning table (the LLaMA-recipe 'epochs per source'
    computation, done on-engine with exact integers): per-source corpus
    inventory (n_docs, n_tokens) + a deterministic relative weight
    (1 + source_index % 4), allocated a fixed token budget
    proportionally — target_tokens = budget·rel_w // Σrel_w,
    epochs_micro = target·1e6 // n_tokens (how many passes over the
    source the budget implies, in micro-epochs), effective_tokens =
    n_tokens·epochs_micro // 1e6. Per-batch (source, count, Σtokens)
    partials → one bounded source groupby → the ≤|sources| plan computed
    on the driver; all divisions integer-floor so the plan is
    partition-invariant and value-exact in SQL."""
    from ray.data.aggregate import Count, Sum

    def partials(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        return pa.table({
            "source": batch["source"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(t, r"\S+"), pa.int64())})

    rows = (_docs(sf_dir, ["doc_id", "text", "source"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"))
            .to_pandas().sort_values("source").reset_index(drop=True))
    idx = rows["source"].str.slice(3).astype(int)
    rel = (1 + idx % 4).astype(np.int64)
    total_rel = int(rel.sum())
    target = SOURCE_MIX_BUDGET * rel // total_rel
    ntok = rows["n_tokens"].astype(np.int64)
    epochs_micro = np.where(
        ntok > 0, target * 1_000_000 // np.maximum(ntok, 1), 0)
    return pa.table({
        "source": pa.array(rows["source"], pa.string()),
        "n_docs": pa.array(rows["n_docs"].astype(np.int64), pa.int64()),
        "n_tokens": pa.array(ntok, pa.int64()),
        "rel_weight": pa.array(rel, pa.int64()),
        "target_tokens": pa.array(target.astype(np.int64), pa.int64()),
        "epochs_micro": pa.array(epochs_micro.astype(np.int64), pa.int64()),
        "effective_tokens": pa.array(
            (ntok * epochs_micro // 1_000_000).astype(np.int64),
            pa.int64())})


SAMPLE_EXACT_K = 50


def sample_exact_k_docs(sf_dir: str):
    """Deterministic EXACT-k corpus sample — the fixed-size complement of
    sample_docs' Bernoulli fraction (an eval set needs exactly k rows, not
    ~k): the k smallest (hash32(doc_id), doc_id) rows, i.e. a seedless
    uniform draw that is a pure function of the key set. One distributed
    partial-top-k pass (stages/topk.topk_table — each block prunes to its
    own top k, the driver merges ≤ k·blocks rows); no global sort, no
    Bernoulli variance. Value-exact vs SQL ORDER BY md5-prefix LIMIT k."""
    from ..stages.topk import topk_table

    docs = _docs(sf_dir, ["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = np.array([_hash32(i) for i in batch["doc_id"].to_pylist()],
                     np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "text": batch["text"],
                         "h": pa.array(h, pa.int64())})

    t = topk_table(docs.map_batches(add_hash, batch_format="pyarrow"),
                   [("h", "ascending"), ("doc_id", "ascending")],
                   SAMPLE_EXACT_K)
    return (ray.data.from_arrow(t.select(["doc_id", "text"]))
            .sort("doc_id"))


def length_percentile_docs(sf_dir: str):
    """Exact global rank + percentile of every document by (n_chars,
    doc_id) — the rank-transform normalization
    (stages/text_analysis.global_value_rank): value-range bucketing +
    a bounded driver prefix sum, no global sort. Value-exact vs SQL
    row_number over the same order."""
    return text_analysis.global_value_rank(
        _docs(sf_dir, ["doc_id", "n_chars"]),
        value_col="n_chars").sort("doc_id")


def lang_percentile_docs(sf_dir: str):
    """Per-GROUP rank transform: every document's rank and exact integer
    percentile by (n_chars, doc_id) WITHIN its language — the group-scoped
    sibling of length_percentile_docs (per-group normalization wants the
    group's own distribution, per the group_zscore rationale). One lang
    groupby; ranks resolve vectorized per group (argsort + arange, no
    per-row dispatch). Value-exact vs SQL row_number PARTITION BY lang."""

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["n_chars", "doc_id"],
                           kind="mergesort").reset_index(drop=True)
        n = len(d)
        rank = np.arange(n, dtype=np.int64)
        return pd.DataFrame({
            "doc_id": d["doc_id"].to_numpy(),
            "lang": d["lang"].to_numpy(),
            "n_chars": d["n_chars"].to_numpy(),
            "rank_idx": rank,
            "percentile_micro": rank * 1_000_000 // n})

    out = (_docs(sf_dir, ["doc_id", "lang", "n_chars"])
           .groupby("lang").map_groups(rank_group, batch_format="pandas"))
    return out.sort("doc_id")


def cms_word_counts_docs(sf_dir: str):
    """Count-min sketch frequency estimates for the quality-stopword
    probe set (stages/text_analysis.cms_word_counts): 4×1024 cells,
    md5-prefix bucket hash, sparse per-batch cell combiner, one bounded
    groupby-sum — the mergeable fixed-memory counting sketch. Value-exact
    in SQL (same hash, same min-over-depths)."""
    return text_analysis.cms_word_counts(
        _docs(sf_dir, ["doc_id", "text"]),
        text_analysis.QUALITY_STOPWORDS)


def shuffle_order_docs(sf_dir: str):
    """Deterministic seeded global training-order shuffle
    (stages/text_analysis.global_shuffle_order): rank = position of
    (md5('s0:' || doc_id), doc_id) in corpus order, shard = rank % 8.
    Hash-first-byte range partitioning + a ≤256-row driver prefix sum —
    NO global sort, and the text column never moves. Value-exact vs
    row_number() over the same md5 ordering in SQL."""
    return text_analysis.global_shuffle_order(
        _docs(sf_dir, ["doc_id"])).sort("doc_id")


def length_fit_docs(sf_dir: str):
    """On-engine exact least-squares fit of n_chars on n_ws_tokens
    (stages/text_analysis.length_fit): five int64 partial sums per batch,
    one distributed Sum, Cramer closed form on the driver — partials are
    exact integers so the fit is partition-invariant and value-exact
    (BIGINT sums + identical cast/divide order for the float slope)."""
    return text_analysis.length_fit(_docs(sf_dir, ["doc_id", "text"]))


def minhash_pairs_doubled(sf_dir: str):
    return dedup.minhash_dedup_pairs(
        _doubled_docs(sf_dir), threshold=0.7,
        n_coarse=_docs_coarse_hint(sf_dir, 2)).sort(["id_a", "id_b"])


def minhash_pairs_md5_doubled(sf_dir: str):
    """Value-exact MinHash LSH over the doubled corpus
    (stages/dedup.minhash_pairs_md5: md5-hash32 shingles, 16 affine
    permutations mod 2^31-1, 8×2 banding on literal component pairs) —
    the oracle-able sibling of minhash_pairs_doubled, whose crc32 +
    uint64-wrap arithmetic has no SQL form."""
    return dedup.minhash_pairs_md5(
        _doubled_docs(sf_dir),
        n_coarse=_docs_coarse_hint(sf_dir, 2)).sort(["id_a", "id_b"])


def minhash_pairs_two_pass_doubled(sf_dir: str):
    """Two-pass MinHash LSH (bands shuffle without signatures; signatures
    re-attached by partitioned joins) — the 100 TB shuffle-volume path;
    output identical to minhash_pairs_doubled."""
    return dedup.minhash_dedup_pairs(
        _doubled_docs(sf_dir), threshold=0.7, two_pass=True,
        n_coarse=_docs_coarse_hint(sf_dir, 2)).sort(["id_a", "id_b"])


def simhash_pairs_doubled(sf_dir: str):
    return dedup.simhash_near_pairs(
        _doubled_docs(sf_dir), max_hamming=3,
        n_coarse=_docs_coarse_hint(sf_dir, 2)).sort(["id_a", "id_b"])


def simhash_docs(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        dedup.simhash_batch, batch_format="pyarrow").sort("doc_id")


def ngram_jaccard_adjacent(sf_dir: str):
    """Exact 3-gram Jaccard between every (doc_id, doc_id+1) pair — the
    n-gram Jaccard dedup kernel exercised as a distributed pairwise op with
    a full SQL oracle (gram sets reproduced verbatim in DuckDB)."""
    return dedup.adjacent_ngram_jaccard(
        _docs(sf_dir, ["doc_id", "text"]),
        n_coarse=_docs_coarse_hint(sf_dir)).sort("id_a")


def minhash_verified_pairs_doubled(sf_dir: str):
    """MinHash candidates verified by exact n-gram Jaccard ≥ 0.7 — the
    candidate→verify composition (LSH recall, exact precision) via the
    two-shuffle repartition join in dedup.verify_pairs_ngram."""
    docs = _doubled_docs(sf_dir)
    hint = _docs_coarse_hint(sf_dir, 2)
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.7, n_coarse=hint)
    verified = dedup.verify_pairs_ngram(pairs, docs, n_coarse=hint)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["jaccard"], pa.scalar(0.7)))

    return verified.map_batches(keep, batch_format="pyarrow").sort(["id_a", "id_b"])


def edit_verified_pairs_doubled(sf_dir: str):
    """MinHash candidates verified by EXACT Levenshtein edit distance
    (stages/dedup.verify_pairs_edit) — the character-level verify stage
    that catches near-dups whose edits are character-local (typos, OCR
    noise, truncation) where token-gram Jaccard over-penalizes.

    The doubled corpus is MUTATED so distances are non-trivial: each
    twin drops its first ``doc_id % 7`` characters (``substring(text,
    (doc_id % 7) + 1)`` verbatim in SQL), so edit distances spread over
    0..6 while the shingle sets stay band-collidable. Candidates come
    from the value-exact md5 MinHash (minhash_pairs_md5), the distance
    kernel is byte-exact vs DuckDB ``levenshtein()``, and edit_sim =
    1 − dist/max(octet_length) is a single exact-int division — the
    whole composition is value-exact in SQL."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def construct(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        t = pc.fill_null(batch["text"], "")
        slices = [pc.utf8_slice_codeunits(t, k)
                  .to_numpy(zero_copy_only=False) for k in range(7)]
        twin = np.select([ids % 7 == k for k in range(7)], slices,
                         default="")
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([ids, ids + DOUBLE_OFFSET]), pa.int64()),
            "text": pa.array(
                np.concatenate([t.to_numpy(zero_copy_only=False),
                                twin]).astype(object), pa.string())})

    mutated = docs.map_batches(construct, batch_format="pyarrow")
    hint = _docs_coarse_hint(sf_dir, 2)
    pairs = dedup.minhash_pairs_md5(mutated, n_coarse=hint)
    out = dedup.verify_pairs_edit(pairs, mutated, n_coarse=hint)
    return out if isinstance(out, pa.Table) else out.sort(["id_a", "id_b"])


def dup_clusters_doubled(sf_dir: str):
    pairs = dedup.minhash_dedup_pairs(_doubled_docs(sf_dir), threshold=0.7,
                                      n_coarse=_docs_coarse_hint(sf_dir, 2))
    return dedup.dup_clusters(pairs).sort("src")


def fingerprint_pairs_doubled(sf_dir: str, threshold: float = 0.5):
    """Winnowing fingerprint-collision near-dup pairs on the doubled corpus
    (substring-overlap dedup — catches partially copied documents that
    whole-document digests miss)."""
    # two hints: the fp EXPLODE (~100 fingerprints per doc) sizes the
    # bucket shuffle; the much smaller pair/count table sizes the two
    # doc-keyed eff-attach passes
    return dedup.fingerprint_collision_pairs(
        _doubled_docs(sf_dir), threshold=threshold,
        n_coarse=_docs_coarse_hint(sf_dir, 2 * 64),
        n_coarse_pairs=_docs_coarse_hint(sf_dir, 8)).sort(["id_a", "id_b"])


LINE_WIDTH = 80  # synthetic line derivation for line_dedup_docs


def _chunked_text(t: "pa.ChunkedArray | pa.Array"):
    """The 80-char chunk construction shared by line_dedup_docs /
    sentence_dedup_docs: each row's text split into LINE_WIDTH-char
    slices joined by '\\n' — byte-identical to the SQL oracles'
    ``array_to_string([substring(t, i, 80) FOR i IN range(1, length(t)
    + 1, 80)], chr(10))``, including for text that itself ends in
    newlines. Slices are batch-wide (one kernel per 80-char step up to
    the batch max length); a row's nonexistent padding slices become
    NULL and a null_handling='skip' join drops exactly them — no rtrim,
    which would also eat GENUINE trailing newlines and diverge from the
    per-row SQL construction."""
    maxlen = pc.max(pc.utf8_length(t)).as_py() or 0
    lens = pc.utf8_length(t)
    slices = []
    for i in range(0, max(maxlen, 1), LINE_WIDTH):
        s = pc.utf8_slice_codeunits(t, i, i + LINE_WIDTH)
        if i > 0:
            s = pc.if_else(pc.greater(lens, i), s,
                           pa.scalar(None, pa.string()))
        slices.append(s)
    return slices[0] if len(slices) == 1 else \
        pc.binary_join_element_wise(*slices, "\n",
                                    null_handling="skip")


def line_dedup_docs(sf_dir: str):
    """C4-style line-level dedup (first occurrence of every 30+-char line
    survives corpus-wide, documents reassembled in order) over the doubled
    corpus. The synthetic docs carry no newlines, so lines derive from
    fixed 80-char chunking (_chunked_text — mirrored as ``substring(t, i,
    80)`` slices in the SQL oracle); every full-width chunk is eligible,
    the <30-char tail chunk is exempt, so the doubled clone loses every
    full chunk to its original and keeps only its short tail — exercising
    partial removal + reassembly."""
    docs = _doubled_docs(sf_dir)

    def to_lines(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "text": _chunked_text(
                             pc.fill_null(batch["text"], ""))})

    ds = docs.map_batches(to_lines, batch_format="pyarrow")
    nc = _docs_coarse_hint(sf_dir, 2)
    out = dedup.line_dedup(ds, n_coarse=nc, n_coarse_docs=nc)
    # empty corpus → the stage's typed-empty pa.Table (already "sorted")
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def sentence_dedup_docs(sf_dir: str):
    """C4's native granularity (Raffel et al. JMLR'20 §2.2 removes
    repeated SPANS at sentence boundaries; line_dedup_docs is the
    per-line variant): first occurrence of every 30+-char sentence
    survives corpus-wide, docs reassembled space-joined. The synthetic
    docs carry no punctuation, so sentence structure derives from the
    SAME 80-char chunk construction as line_dedup_docs with '. ' as the
    chunk separator (lines text rewritten '\\n' → '. '): each chunk
    becomes a 'chunk.' sentence under the explicit-ASCII mark-and-split
    rule (stages/dedup.sentence_dedup), the doubled clone loses every
    shared sentence to its original, and docs whose raw text already
    contains [.!?] boundaries split further — identically on both
    sides, since the SQL applies the same regex to the same constructed
    text. Zero-sentence docs (empty text) are absent from the output on
    both sides."""
    docs = _doubled_docs(sf_dir)

    def to_sentenced(batch: pa.Table) -> pa.Table:
        lt = _chunked_text(pc.fill_null(batch["text"], ""))
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pc.replace_substring(lt, "\n", ". ")})

    ds = docs.map_batches(to_sentenced, batch_format="pyarrow")
    nc = _docs_coarse_hint(sf_dir, 2)
    out = dedup.sentence_dedup(ds, n_coarse=nc, n_coarse_docs=nc)
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def exact_substr_dedup_docs(sf_dir: str):
    """ExactSubstr (Lee et al. ACL'22 §4.1) over the doubled corpus:
    every ≥50-char substring occurring twice anywhere survives only at
    its first (doc_id, offset) occurrence; covered characters elsewhere
    are removed, originals' whitespace preserved byte-exactly. Each
    clone duplicates its original in full, so any clone of ≥50 chars is
    erased to '' (its every window is owned by the original); originals
    lose only corpus-internal repeats. Value-exact SQL oracle — the
    window/owner/coverage construction restated over substring() rows."""
    docs = _doubled_docs(sf_dir)
    nc = _docs_coarse_hint(sf_dir, 2)
    out = dedup.exact_substr_dedup(docs, n_coarse=nc, n_coarse_docs=nc)
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def near_dedup_kept_doubled(sf_dir: str):
    """The full near-dedup pipeline end to end: MinHash pairs → connected
    components → keep ONE representative (the cluster label = min doc_id)
    per cluster, plus every unclustered doc. The anti-filter side is the
    cluster table (proportional to the duplicate set, never the corpus),
    re-attached with a left hash join — docs with no cluster row or whose
    label equals their own id survive."""
    from ..stages.joins import hash_join

    docs = _doubled_docs(sf_dir)
    pairs = dedup.minhash_dedup_pairs(docs, threshold=0.7,
                                      n_coarse=_docs_coarse_hint(sf_dir, 2))
    clusters = dedup.dup_clusters(pairs).materialize()
    nc = _docs_coarse_hint(sf_dir, 2)

    if clusters.count() == 0:
        return docs.sort("doc_id")

    joined = hash_join(docs, clusters, "doc_id", "src", how="left",
                       n_coarse=nc)

    def keep(batch: pa.Table) -> pa.Table:
        lbl = batch["label"]
        mask = pc.or_kleene(pc.is_null(lbl),
                            pc.equal(lbl, batch["doc_id"]))
        return batch.filter(pc.fill_null(mask, False)).select(
            ["doc_id", "text"])

    return joined.map_batches(keep, batch_format="pyarrow").sort("doc_id")


DECON_BENCHMARK_DOCS = 10  # first-k docs stand in for the eval benchmark
DECON_NGRAM = 8
DECON_MIN_HITS = 1


def decontaminate_docs(sf_dir: str, n: int = DECON_NGRAM,
                       min_hits: int = DECON_MIN_HITS):
    """Benchmark decontamination: flag every document sharing ≥ min_hits
    word n-grams with the benchmark set (here: the corpus's first
    DECON_BENCHMARK_DOCS docs, a deterministic stand-in for an eval set).

    The benchmark's n-gram set is SMALL by construction (eval suites are
    tiny next to the corpus) — built once on the driver, broadcast via
    ray.put, probed per batch with EXACT string-set intersection (no gram
    hashing: a crc32 collision against an unrelated benchmark gram would
    silently flag a clean doc and break the value-exact SQL oracle). The
    corpus side streams; nothing shuffles. Returns
    (doc_id, n_hits, contaminated)."""
    ref = ray.put(_bench_gram_set(sf_dir, n))

    def flag(batch: pa.Table) -> pa.Table:
        grams_ref = ray.get(ref)
        hits = [len(dedup.ngram_set(t or "", n) & grams_ref)
                for t in batch["text"].to_pylist()]
        h = pa.array(hits, pa.int64())
        return pa.table({"doc_id": batch["doc_id"],
                         "n_hits": h,
                         "contaminated": pc.greater_equal(
                             h, pa.scalar(min_hits, pa.int64()))})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(flag, batch_format="pyarrow").sort("doc_id"))


# ---------------------------------------------------------------------------
# Per-source boilerplate vocabulary + removal (CCNet / RefinedWeb-style):
# a word is "boilerplate" for a source when it appears in >= NUM/DEN of that
# source's documents — the distributed analogue of stripping nav bars /
# footers that repeat across a domain's pages. Integer threshold rule
# (n_with * DEN >= NUM * n_docs) so the engine and the SQL oracle agree at
# boundaries without float comparisons.

BOILER_NUM = 9
BOILER_DEN = 10



BLOOM_M_BITS = 1 << 17  # 16 KB filter
BLOOM_K = 4


def _bloom_positions(gram: str, m_bits: int, k: int) -> list[int]:
    """k deterministic bit positions per gram: crc32 over a salt prefix —
    no RNG, so the filter is identical across runs and partitionings."""
    return [zlib.crc32(f"{j}:{gram}".encode()) % m_bits for j in range(k)]


def bloom_decontaminate_docs(sf_dir: str, n: int = DECON_NGRAM,
                             min_hits: int = DECON_MIN_HITS,
                             m_bits: int = BLOOM_M_BITS,
                             k: int = BLOOM_K):
    """Bloom-filter decontamination — the fixed-memory form of
    decontaminate_docs for benchmark suites too large to broadcast as
    exact string sets: benchmark grams fold into an m-bit Bloom filter
    (k crc32 hashes), the filter broadcasts at m/8 bytes REGARDLESS of
    benchmark size, and each corpus doc counts grams whose k bits are
    all set. One-sided by construction: never misses a true hit
    (n_maybe_hits >= the exact operator's n_hits for every doc — the
    differential test pins this), may overcount on bit collisions.
    Returns (doc_id, n_maybe_hits, contaminated_maybe)."""
    bits = np.zeros(m_bits // 8, np.uint8)
    for g in _bench_gram_set(sf_dir, n):
        for h in _bloom_positions(g, m_bits, k):
            bits[h >> 3] |= np.uint8(1 << (h & 7))
    ref = ray.put(bits)

    def flag(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)

        def gram_in(g: str) -> bool:
            return all(b[h >> 3] & (1 << (h & 7))
                       for h in _bloom_positions(g, m_bits, k))

        hits = [sum(gram_in(g) for g in dedup.ngram_set(t or "", n))
                for t in batch["text"].to_pylist()]
        h = pa.array(hits, pa.int64())
        return pa.table({"doc_id": batch["doc_id"],
                         "n_maybe_hits": h,
                         "contaminated_maybe": pc.greater_equal(
                             h, pa.scalar(min_hits, pa.int64()))})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(flag, batch_format="pyarrow").sort("doc_id"))


def _word_doc_counts(sf_dir: str):
    """(source, word, n_docs_with): distinct-per-doc word explode with a
    per-batch combiner (Arrow group_by inside the batch) so the global
    (source, word) groupby shuffles pre-aggregated counts, not one row per
    word occurrence. Tokenizer = RE2 ``\\s+`` split with empties dropped —
    the SAME regex engine and pattern as the oracle's
    regexp_split_to_array (Arrow's utf8_split_whitespace would split on
    Unicode whitespace like NBSP that RE2 ``\\s`` does not)."""

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(batch["text"], r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        mask = pc.not_equal(flat, "")          # Arrow split emits empties
        tb = pa.table({
            "source": batch["source"].take(parent.filter(mask)),
            "word": flat.filter(mask),
            "parent": parent.filter(mask)})
        distinct = tb.group_by(["source", "word", "parent"]).aggregate([])
        g = distinct.group_by(["source", "word"]).aggregate(
            [("parent", "count")])
        return pa.table({"source": g["source"], "word": g["word"],
                         "n": g["parent_count"].cast(pa.int64())})

    return (_docs(sf_dir, ["text", "source"])
            .map_batches(partial, batch_format="pyarrow", batch_size=8192)
            .groupby(["source", "word"])
            .aggregate(Sum("n", alias_name="n_docs_with")))


def _source_doc_counts(sf_dir: str) -> dict:
    """Documents per source, computed distributed then collected — bounded
    by the number of sources/domains (millions at web scale: still a
    broadcastable dict, never the corpus itself)."""
    g = (_docs(sf_dir, ["source"]).groupby("source")
         .aggregate(Count(alias_name="n_docs")).to_pandas())
    return dict(zip(g["source"], g["n_docs"].astype(int)))


def _boiler_counts(sf_dir: str, num: int, den: int):
    """Filtered (source, word, n_docs_with, doc_frac) rows, UNSORTED and
    unguarded — the shared core of vocab (adds sort + empty guard) and
    scrub (collapses to a key set, needs neither)."""
    nd = _source_doc_counts(sf_dir)
    ref = ray.put(nd)
    counts = _word_doc_counts(sf_dir)

    def finalize(batch: pa.Table) -> pa.Table:
        ndmap = ray.get(ref)
        n_docs = pa.array(
            pd.Series(batch["source"].to_pylist()).map(ndmap).to_numpy(),
            pa.int64())
        keep = pc.greater_equal(pc.multiply(batch["n_docs_with"],
                                            pa.scalar(den, pa.int64())),
                                pc.multiply(n_docs,
                                            pa.scalar(num, pa.int64())))
        out = pa.table({
            "source": batch["source"], "word": batch["word"],
            "n_docs_with": batch["n_docs_with"],
            "doc_frac": pc.divide(batch["n_docs_with"].cast(pa.float64()),
                                  n_docs.cast(pa.float64()))})
        return out.filter(keep)

    return counts.map_batches(finalize, batch_format="pyarrow")


def boilerplate_vocab(sf_dir: str, num: int = BOILER_NUM,
                      den: int = BOILER_DEN):
    """(source, word, n_docs_with, doc_frac) for words in >= num/den of a
    source's docs. The per-source doc counts are a tiny broadcast side;
    the (source, word) count table streams through the filter."""
    out = _boiler_counts(sf_dir, num, den).sort(["source", "word"])
    return dedup.nonempty_or_typed_table(out, {
        "source": pa.string(), "word": pa.string(),
        "n_docs_with": pa.int64(), "doc_frac": pa.float64()})


def _boiler_key_set(sf_dir: str, num: int, den: int) -> frozenset:
    """The per-source boilerplate vocabulary as combined source\\x00word
    membership keys — the broadcast side shared by every scrub caller."""
    vdf = _boiler_counts(sf_dir, num, den).to_pandas()
    if vdf.empty or "source" not in vdf.columns:   # all-empty block drop
        return frozenset()
    return frozenset(vdf["source"] + "\x00" + vdf["word"])


def _bench_gram_set(sf_dir: str, n: int) -> frozenset:
    """Benchmark n-gram set: the DECON_BENCHMARK_DOCS smallest doc_ids
    (explicit key order, not parquet file order, so the SQL oracle selects
    the same set), exact STRING grams — no hashing (a crc32 collision
    would silently flag a clean doc and break the value-exact oracle)."""
    import duckdb

    bench = duckdb.connect().execute(
        "SELECT text FROM read_parquet(?) ORDER BY doc_id LIMIT ?",
        [os.path.join(sf_dir, "documents.parquet"),
         DECON_BENCHMARK_DOCS]).fetchall()
    return frozenset(
        g for (t,) in bench for g in dedup.ngram_set(t or "", n))


def boilerplate_scrubbed_docs(sf_dir: str, num: int = BOILER_NUM,
                              den: int = BOILER_DEN):
    """(doc_id, clean_text, n_removed): every document with its source's
    boilerplate vocabulary stripped, whitespace-normalized (join on single
    spaces — same as ' '.join(text.split())). Vocab is stopword-sized per
    source, collected once and broadcast via ray.put; the corpus side
    streams. Membership test is a vectorized isin over a combined
    source\\x00word key; only the final per-row string join is Python."""
    ref = ray.put(_boiler_key_set(sf_dir, num, den))

    def scrub(batch: pa.Table) -> pa.Table:
        bad = ray.get(ref)
        texts, n_removed = _scrub_kernel(batch, bad)
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(texts, pa.string()),
            "n_removed": pa.array(n_removed, pa.int64())})

    return (_docs(sf_dir, ["doc_id", "text", "source"])
            .map_batches(scrub, batch_format="pyarrow").sort("doc_id"))


def _scrub_kernel(batch: pa.Table, bad: frozenset):
    """Vectorized boilerplate removal over a batch's (text, source):
    RE2 split, isin membership on combined source\\x00word keys, per-row
    single-space rejoin. Returns (clean_texts list, n_removed array)."""
    words = pc.split_pattern_regex(batch["text"], r"\s+")
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words)
    mask = pc.not_equal(flat, "")
    flat_np = flat.filter(mask).to_pandas()
    parent_np = parent.filter(mask).to_numpy()
    src_np = batch["source"].to_pandas().to_numpy()
    n = batch.num_rows
    key = pd.Series(src_np[parent_np]) + "\x00" + flat_np
    keep = (~key.isin(bad)).to_numpy()
    n_words = np.bincount(parent_np, minlength=n)
    kept_words = flat_np.to_numpy()[keep]
    kept_parent = parent_np[keep]
    n_kept = np.bincount(kept_parent, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(n_kept)))
    texts = [" ".join(kept_words[offsets[i]:offsets[i + 1]])
             for i in range(n)]
    return texts, n_words - n_kept


def curated_docs(sf_dir: str, min_score: float = 0.5, min_words: int = 20):
    """End-to-end curation — the composition a real training-data run
    executes: per-source boilerplate scrub → quality gate on the SCRUBBED
    text → benchmark decontamination → exact dedup keeping the min-doc_id
    representative per distinct clean text.

    All per-row work (scrub, quality features, contamination probe) is
    fused into ONE map_batches pass so the corpus streams through once.
    The two lookup sides are broadcast via a single ray.put: the
    per-source vocabulary (stopword-sized per source) and the benchmark
    8-gram set (eval suites are tiny next to the corpus). The only
    shuffle is the digest-coarse exact-dedup groupby — and it runs over
    gate SURVIVORS, not the full corpus. Returns
    (doc_id, clean_text, n_words, quality_score) sorted by doc_id."""
    ref = ray.put((_boiler_key_set(sf_dir, BOILER_NUM, BOILER_DEN),
                   _bench_gram_set(sf_dir, DECON_NGRAM)))

    def curate(batch: pa.Table) -> pa.Table:
        bad, grams = ray.get(ref)
        texts, _ = _scrub_kernel(batch, bad)
        clean = pa.array(texts, pa.string())
        t = pa.table({"doc_id": batch["doc_id"], "clean_text": clean})
        q = text_analysis.quality_scores(t, text_col="clean_text")
        hits = np.fromiter(
            (len(dedup.ngram_set(s, DECON_NGRAM) & grams) for s in texts),
            np.int64, len(texts))
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(q["quality_score"], pa.scalar(min_score)),
                pc.greater_equal(q["n_words"],
                                 pa.scalar(min_words, pa.int64()))),
            pc.less(pa.array(hits, pa.int64()),
                    pa.scalar(DECON_MIN_HITS, pa.int64())))
        out = pa.table({"doc_id": batch["doc_id"], "clean_text": clean,
                        "n_words": q["n_words"],
                        "quality_score": q["quality_score"]})
        return out.filter(keep)

    kept = (_docs(sf_dir, ["doc_id", "text", "source"])
            .map_batches(curate, batch_format="pyarrow"))
    out = dedup.exact_dedup(kept, text_col="clean_text").sort("doc_id")
    return dedup.nonempty_or_typed_table(out, {
        "doc_id": pa.int64(), "clean_text": pa.string(),
        "n_words": pa.int64(), "quality_score": pa.float64()})


def repetition_stats(sf_dir: str):
    """Gopher-style within-document repetition metrics: (doc_id, n_words,
    n_distinct_words, top_word_frac, dup_2gram_frac). Fully vectorized per
    batch — one RE2 split, flat (parent, word) frames, pandas groupby for
    per-doc counts, adjacency mask for bigrams (space-joined, the same
    pair encoding as the SQL oracle; words cannot contain spaces). Purely
    per-row → embarrassingly parallel, no shuffle."""

    def stats(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w, p = text_analysis.word_frames(batch["text"])
        n_words, top, dis, n_g2, dis_g2 = \
            text_analysis.repetition_counts(w, p, n)

        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_distinct_words": pa.array(dis, pa.int64()),
            "top_word_frac": pa.array(
                top.astype(np.float64) /
                np.maximum(n_words, 1).astype(np.float64), pa.float64()),
            "dup_2gram_frac": pa.array(
                (n_g2 - dis_g2).astype(np.float64) /
                np.maximum(n_g2, 1).astype(np.float64), pa.float64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(stats, batch_format="pyarrow").sort("doc_id"))


def packed_sequence_texts(sf_dir: str):
    """The consumer of the packing plan: materialize each training
    sequence by co-locating its member documents and concatenating their
    texts in doc_id order (a doc belongs to the sequence containing its
    START offset). The heavy text moves exactly once, keyed by seq_id —
    the plan's whole point. Returns (seq_id, n_docs, seq_text).

    Shapes: pack_sequences' plan (16 B/doc) hash-joins back to the text
    column on doc_id, then one seq-keyed coarse shuffle reassembles
    members in order — string concatenation is per-group vectorized."""
    from ..stages.joins import hash_join

    plan = _packing_plan(sf_dir)
    cols = {"seq_id": pa.int64(), "n_docs": pa.int64(),
            "seq_text": pa.string()}
    if isinstance(plan, pa.Table):  # empty corpus
        return pa.table({k: pa.array([], t) for k, t in cols.items()})
    # NOT Dataset.rename_columns: Ray 2.49's projection assumes Arrow
    # blocks and dies on the pandas-format blocks map_groups emits
    # ("'DataFrame' object has no attribute 'rename_columns'")
    plan = plan.select_columns(["doc_id", "seq_id"]) \
               .map_batches(lambda b: pa.table({"plan_doc": b["doc_id"],
                                                "seq_id": b["seq_id"]}),
                            batch_format="pyarrow")
    docs = _docs(sf_dir, ["doc_id", "text"])
    joined = hash_join(docs, plan, "doc_id", "plan_doc")
    nc = _docs_coarse_hint(sf_dir, 2)

    def add_coarse(batch: pa.Table) -> pa.Table:
        s = batch["seq_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "coarse", pa.array((s % nc).astype(np.int32)))

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["seq_id", "doc_id"], kind="mergesort")
        g = d.groupby("seq_id", sort=True)
        return pd.DataFrame({
            "seq_id": pd.array(list(g.groups.keys()), "int64"),
            "n_docs": pd.array(g.size().to_numpy(), "int64"),
            "seq_text": pd.array(
                g["text"].apply(lambda s: " ".join(x or "" for x in s)),
                "string")})

    out = (joined.map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse").map_groups(reassemble,
                                         batch_format="pandas")
           .map_batches(lambda b: pa.table({
               "seq_id": b["seq_id"],
               "n_docs": b["n_docs"],
               "seq_text": pc.cast(b["seq_text"], pa.string())}),
               batch_format="pyarrow")
           .sort("seq_id"))
    return dedup.nonempty_or_typed_table(out, cols)


def gopher_quality_flags(sf_dir: str):
    """Gopher-rule quality flags per document: one boolean per rule
    (word-count band, mean word length, distinct stopwords, top-word
    fraction, duplicate-bigram fraction) plus the composite keep.
    Purely per-row, no shuffle."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(text_analysis.gopher_flags, batch_format="pyarrow")
            .sort("doc_id"))


PACK_BUDGET = 512


def _packing_plan(sf_dir: str):
    """The ONE packing-plan construction shared by packed_sequences and
    packed_sequence_texts — budget/width tuning cannot drift between the
    plan producer and its materializer. range_width is sized from
    parquet metadata so the test tiers run ~10 id-ranges, exercising the
    multi-range distributed prefix-sum path."""
    path = os.path.join(sf_dir, "documents.parquet")
    n = pq.ParquetFile(path).metadata.num_rows
    width = max(1, n // _docs_coarse_hint(sf_dir, 32))
    return text_analysis.pack_sequences(
        _docs(sf_dir, ["doc_id", "text"]), budget=PACK_BUDGET,
        range_width=width)


def packed_sequences(sf_dir: str):
    """Concat-and-chunk sequence-packing plan over documents at a
    512-token budget (see _packing_plan)."""
    out = _packing_plan(sf_dir)
    # empty corpus → the stage's typed-empty pa.Table (already "sorted")
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def quality_median_filtered(sf_dir: str):
    """Per-language median-quality gate: keep documents whose
    quality_score >= their language's median, the discrete quantile rule
    sorted[ceil(0.5*n)-1] (DuckDB quantile_disc — an actual element, so
    the >= comparison agrees bit-for-bit with the oracle).

    The scored projection (doc_id, lang, quality_score) is materialized
    ONCE and consumed twice (medians + filter) — the multi-consumer
    lineage rule; it is ~50× narrower than the corpus, so the
    materialization is bounded. Per-lang medians come from a per-lang
    group sort (lang cardinality is tiny; the 100 TB path swaps the group
    fn for a distributed sort / t-digest, same seam as
    analytics.event_value_quantiles) and broadcast as a dict."""
    def score(b: pa.Table) -> pa.Table:
        q = text_analysis.quality_scores(b)     # _emit keeps doc_id only
        return pa.table({"doc_id": q["doc_id"], "lang": b["lang"],
                         "quality_score": q["quality_score"]})

    scored = (_docs(sf_dir, ["doc_id", "text", "lang"])
              .map_batches(score, batch_format="pyarrow")
              .materialize())

    def med(df: pd.DataFrame) -> pd.DataFrame:
        # quantile over SCORED docs only: null-text rows carry NaN scores
        # and the oracle's quantile_disc ignores NULLs — counting them in
        # the rank would select a higher-ranked element than DuckDB
        v = df["quality_score"].to_numpy()
        v = np.sort(v[~np.isnan(v)])
        if len(v) == 0:
            return pd.DataFrame(
                {"lang": pd.Series([], dtype=df["lang"].dtype),
                 "median_score": pd.Series([], dtype="float64")})
        idx = max(int(np.ceil(0.5 * len(v))) - 1, 0)
        return pd.DataFrame([{"lang": df["lang"].iloc[0],
                              "median_score": v[idx]}])

    meds = scored.groupby("lang").map_groups(med, batch_format="pandas") \
                 .to_pandas()
    # empty corpus: the group fn never ran and to_pandas drops columns
    mmap = (dict(zip(meds["lang"], meds["median_score"]))
            if "lang" in meds.columns else {})
    ref = ray.put(mmap)

    def keep(batch: pa.Table) -> pa.Table:
        mm = ray.get(ref)
        thr = pa.array(
            pd.Series(batch["lang"].to_pylist()).map(mm).to_numpy(),
            pa.float64())
        return batch.filter(
            pc.greater_equal(batch["quality_score"], thr))

    out = scored.map_batches(keep, batch_format="pyarrow").sort("doc_id")
    return dedup.nonempty_or_typed_table(out, {
        "doc_id": pa.int64(), "lang": pa.string(),
        "quality_score": pa.float64()})


def label_centroids(sf_dir: str):
    """Per-label embedding centroid in long format (label, dim, centroid,
    n_vectors): per-batch numpy partial sums (labels × dim rows per batch,
    independent of row count) → one (label, dim) groupby over
    pre-aggregated partials → divide.

    float32 components summed in float64 are EXACT (24-bit mantissas with
    bounded exponent spread: every partial sum is representable), so the
    distributed sum is order-independent and the mean is bit-identical to
    DuckDB's avg regardless of partitioning.

    Null rows are excluded (ListArray.flatten skips null slots; the dim
    index is built per row from list_value_length, so a null or short row
    never shifts a neighbour's components across labels); null COMPONENTS
    are skipped by the Arrow group sum/count, matching SQL avg. n_vectors
    counts the non-null components at each (label, dim)."""
    emb = reads.read_small_aware(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks() \
            if isinstance(batch["embedding"], pa.ChunkedArray) \
            else batch["embedding"]
        lens = pc.list_value_length(col).fill_null(0) \
                 .to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        labels = batch["label"].to_numpy(zero_copy_only=False) \
                               .astype(np.int64)
        ends = np.cumsum(lens)
        dims = np.arange(total, dtype=np.int64) \
            - np.repeat(ends - lens, lens)
        comp = pa.table({
            "label": pa.array(np.repeat(labels, lens), pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "v": pc.cast(col.flatten(), pa.float64())})
        g = comp.group_by(["label", "dim"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return pa.table({"label": g["label"], "dim": g["dim"],
                         "s": g["v_sum"],
                         "c": g["v_count"].cast(pa.int64())})

    agg = (emb.map_batches(partial, batch_format="pyarrow")
           .groupby(["label", "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c")))

    def finalize(batch: pa.Table) -> pa.Table:
        c = batch["c"].combine_chunks() if isinstance(
            batch["c"], pa.ChunkedArray) else batch["c"]
        mean = pc.if_else(pc.equal(c, 0), pa.scalar(None, pa.float64()),
                          pc.divide(batch["s"], c.cast(pa.float64())))
        return pa.table({
            "label": batch["label"], "dim": batch["dim"],
            "centroid": mean, "n_vectors": c})

    return agg.map_batches(finalize, batch_format="pyarrow") \
              .sort(["label", "dim"])


def exact_dup_clusters_doubled(sf_dir: str):
    """Connected components over the EXACT-duplicate pair graph — the same
    distributed label-propagation operator as dup_clusters_doubled, but fed
    star pairs from content equality, so the fixpoint has a SQL-expressible
    ground truth (label = min(doc_id) per text group) and the whole
    propagation machinery is value-checked by the driver's oracle hash."""
    pairs = dedup.exact_dup_pairs(_doubled_docs(sf_dir),
                                  n_coarse=_docs_coarse_hint(sf_dir, 2))
    return dedup.dup_clusters(pairs).sort("src")


def _embeddings(sf_dir: str):
    return reads.read_small_aware(os.path.join(sf_dir, "embeddings.parquet"),
                                  columns=["vec_id", "embedding"])


def _doubled_embeddings(sf_dir: str):
    """embeddings ∪ (embeddings with vec_id + DOUBLE_OFFSET): every vector
    duplicated exactly once — the _doubled_docs twin for the embedding
    family (one definition; three ops share it)."""
    base = _embeddings(sf_dir)

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": pc.add(batch["vec_id"],
                             pa.scalar(DOUBLE_OFFSET, pa.int64())),
            "embedding": batch["embedding"]})

    return base.union(base.map_batches(shift, batch_format="pyarrow"))


def _doubled_clone_pairs(sf_dir: str):
    """Exact-clone pair graph of the doubled embeddings (cosine ≥
    0.999999 — only the clones qualify among gaussian vectors), id
    columns only. Shared by the pairs / clusters / keep ops."""
    pairs = dedup.embedding_near_pairs(
        _doubled_embeddings(sf_dir), threshold=0.999999,
        n_coarse=_coarse_hint_for(
            os.path.join(sf_dir, "embeddings.parquet"), 2))
    return pairs.map_batches(
        lambda b: pa.table({"id_a": b["id_a"], "id_b": b["id_b"]}),
        batch_format="pyarrow")


def embedding_pairs_doubled(sf_dir: str):
    return _doubled_clone_pairs(sf_dir).sort(["id_a", "id_b"])


# ------------------------------------------------------- similarity search

ANN_K = 10
ANN_N_QUERIES = 4


def _query_matrix(sf_dir: str) -> np.ndarray:
    dim = reads.embedding_dim(os.path.join(sf_dir, "embeddings.parquet"))
    return similarity.fixed_queries(dim, ANN_N_QUERIES, seed=7)


def ann_brute_topk(sf_dir: str):
    """Exact cosine top-10 per fixed query; emits rank + vec_id (score kept
    out of the compared columns — cross-engine float ordering only)."""
    res = similarity.brute_topk(_embeddings(sf_dir), _query_matrix(sf_dir), k=ANN_K)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "rank", "vec_id"])

    return res.map_batches(strip, batch_format="pyarrow").sort(["query_id", "rank"])


def hard_negatives(sf_dir: str):
    """Contrastive hard-negative mining over the embeddings table
    (stages/similarity.hard_negative_topk): for each of the 8 anchor
    vectors (vec_id < 8), the 10 most-cosine-similar DIFFERENT-label
    vectors. Anchors broadcast once via ray.put; the corpus streams
    through one matmul/mask/top-k pass + the bounded global reduce.
    Compared columns are (anchor_id, rank, vec_id) — the float score is
    kept out per the ann_brute_topk cross-engine-float convention."""
    emb = reads.read_small_aware(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"])
    res = similarity.hard_negative_topk(emb, k=ANN_K)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["anchor_id", "rank", "vec_id"])

    return (res.map_batches(strip, batch_format="pyarrow")
            .sort(["anchor_id", "rank"]))


def mmr_diverse_sample(sf_dir: str, k: int = 16, lam: float = 0.7):
    """MMR diverse selection over the embeddings table against the fixed
    query (stages/similarity.mmr_select): shortlist-then-rerank —
    bounded partial-top-256 relevance pass, one broadcast-set vector
    fetch, deterministic greedy on the driver. Emits the selection order
    (rank, vec_id) plus relevance/mmr_score."""
    import ray.data

    t = similarity.mmr_select(_embeddings(sf_dir), _query_matrix(sf_dir)[0],
                              k=k, lam=lam)
    return ray.data.from_arrow(t)


def knn_graph_topk(sf_dir: str, k: int = 5):
    """Exact cosine k-NN graph over the embeddings corpus (self excluded);
    emits (vec_id, rank, nbr_id) — ranks only, same cross-engine float
    discipline as ann_brute_topk. Corpus side broadcasts once as the index
    (see stages/similarity.knn_graph for the scale-path note)."""
    res = similarity.knn_graph(_embeddings(sf_dir), k=k)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["vec_id", "rank", "nbr_id"])

    return res.map_batches(strip, batch_format="pyarrow").sort(["vec_id", "rank"])


def ann_lsh_topk(sf_dir: str):
    res = similarity.lsh_topk(_embeddings(sf_dir), _query_matrix(sf_dir), k=ANN_K)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "rank", "vec_id"])

    return res.map_batches(strip, batch_format="pyarrow").sort(["query_id", "rank"])


def ann_recall_eval(sf_dir: str):
    """ANN self-evaluation (the similarity-family sibling of
    extraction_eval): run brute-force cosine top-k (ground truth) and
    both approximate routes (sign-LSH multiprobe, IVF) over the SAME
    fixed queries, and score each method's recall@k = |approx ∩ brute|/k
    per query. All three result tables are bounded by construction
    (n_queries × k rows), so the set intersection happens on the driver
    over tiny frames — the mmr_select bounded-driver convention; the
    corpus itself streams through each method's own distributed pass.
    Deterministic (fixed hyperplanes/centroid seeding), but the LSH/IVF
    bucketing has no SQL form → rows-only, pinned by the brute-self-
    recall=1.0 invariant and a differential recompute of each recall
    value from the underlying result tables."""
    emb = _embeddings(sf_dir)
    q = _query_matrix(sf_dir)
    results = {
        "brute": similarity.brute_topk(emb, q, k=ANN_K).to_pandas(),
        "lsh": similarity.lsh_topk(emb, q, k=ANN_K).to_pandas(),
        "ivf": similarity.ivf_topk(emb, q, k=ANN_K).to_pandas(),
    }
    truth = {qid: set(g.vec_id)
             for qid, g in results["brute"].groupby("query_id")}
    method_col, qid_col, hits_col, napp_col, rec_col = [], [], [], [], []
    for method in ("brute", "lsh", "ivf"):
        df = results[method]
        got = {qid: set(g.vec_id) for qid, g in df.groupby("query_id")}
        for qid in sorted(truth):
            inter = len(got.get(qid, set()) & truth[qid])
            method_col.append(method)
            qid_col.append(int(qid))
            hits_col.append(inter)
            napp_col.append(len(got.get(qid, set())))
            rec_col.append(inter / ANN_K)
    return pa.table({
        "method": pa.array(method_col, pa.string()),
        "query_id": pa.array(qid_col, pa.int64()),
        "n_approx": pa.array(napp_col, pa.int64()),
        "n_hits": pa.array(hits_col, pa.int64()),
        "recall": pa.array(rec_col, pa.float64())})


def embedding_quantized(sf_dir: str):
    """Int8 quantization of the embeddings table, EXPLODED to
    (vec_id, dim_idx, q, scale) rows for the value-exact gate — the
    storage form (scale + d-byte binary codes,
    stages/similarity.quantize_int8) is what a 100-TB ANN corpus
    persists; the floor(+0.5) code rule is replayed bit-for-bit by
    DuckDB floor over the same double casts."""
    q = similarity.quantize_int8(_embeddings(sf_dir))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        dims = batch["dim"].to_numpy(zero_copy_only=False)
        scales = batch["scale"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "dim_idx": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64()),
                             "scale": pa.array([], pa.float64())})
        d = int(dims[0])
        codes = np.frombuffer(
            b"".join(batch["q_bytes"].to_pylist()), np.int8)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, d).astype(np.int64)),
            "dim_idx": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(ids))),
            "q": pa.array(codes.astype(np.int64)),
            "scale": pa.array(np.repeat(scales, d), pa.float64())})

    return (q.map_batches(explode, batch_format="pyarrow")
            .sort(["vec_id", "dim_idx"]))


def ann_quantized_topk(sf_dir: str):
    """Cosine top-10 per fixed query over int8-quantized vectors
    (stages/similarity.quantized_topk) — the recall probe for the
    quantized storage path; same rank-only output discipline as
    ann_brute_topk."""
    res = similarity.quantized_topk(
        _embeddings(sf_dir), _query_matrix(sf_dir), k=ANN_K)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "rank", "vec_id"])

    return res.map_batches(strip, batch_format="pyarrow") \
        .sort(["query_id", "rank"])


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN (k-means coarse quantizer, n_probe nearest lists)."""
    res = similarity.ivf_topk(_embeddings(sf_dir), _query_matrix(sf_dir), k=ANN_K)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["query_id", "rank", "vec_id"])

    return res.map_batches(strip, batch_format="pyarrow").sort(["query_id", "rank"])


# ----------------------------------------------------- extraction analytics

def _pages_dir_for(sf_dir: str) -> str:
    """Deterministic pages corpus sized by the tier's documents row count."""
    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    return corpus.ensure_corpus(n_rows=n_docs * 2, seed=42)


def _corpus_rows(corpus_dir: str) -> int:
    """Row count of a pages corpus — parquet shard METADATA only, no scan."""
    pdir = os.path.join(corpus_dir, "pages.parquet")
    return sum(pq.read_metadata(os.path.join(pdir, f)).num_rows
               for f in sorted(os.listdir(pdir)))


def extract_pages(sf_dir: str):
    d = _pages_dir_for(sf_dir)
    out = extract_pipeline(read_pages(os.path.join(d, "pages.parquet")))
    return out.select_columns(["url", "extracted_text", "confidence", "total_pages",
                               "payload_kind", "source", "status", "summary",
                               "compression_ratio", "lang", "quality"]).sort("url")


def extract_pages_skew(sf_dir: str):
    """extract_pages through the SKEW-AWARE pipeline (extract_pipeline_
    skew_aware): oversized payload rows (> BIG_ROW_BYTES ≈ 2 MiB; the
    corpus guarantees one multi-MB row per ≥1000-row tier) are isolated
    into BIG_ROW_BATCH-sized batches so a 16 MB blob never rides in a
    128-row batch. Output is identical to extract_pages — the routing is
    a pure partition of the input (pinned by
    tests/test_pipeline.py::TestSkewQuerySurface)."""
    from .extract import extract_pipeline_skew_aware

    d = _pages_dir_for(sf_dir)
    out = extract_pipeline_skew_aware(
        read_pages(os.path.join(d, "pages.parquet")))
    return out.select_columns(["url", "extracted_text", "confidence",
                               "total_pages", "payload_kind", "source",
                               "status", "summary", "compression_ratio",
                               "lang", "quality"]).sort("url")


def extract_pages_actors(sf_dir: str):
    """extract_pages through the ACTOR-POOL stage form (A1's second body:
    warm state in ``__init__`` once per actor, work in ``__call__`` — the
    shape for kernels with genuinely expensive state like model weights).
    Output is identical to the task form; this surfaces the actor path to
    the driver's correctness sampling rather than leaving it pytest-only."""
    from .extract import EXTRACT_BATCH_SIZE, extract_pipeline

    d = _pages_dir_for(sf_dir)
    out = extract_pipeline(read_pages(os.path.join(d, "pages.parquet")),
                           use_actors=True, batch_size=EXTRACT_BATCH_SIZE)
    return out.select_columns(["url", "extracted_text", "confidence",
                               "total_pages", "payload_kind", "source",
                               "status", "summary", "compression_ratio",
                               "lang", "quality"]).sort("url")


def extract_pages_dedup(sf_dir: str):
    d = _pages_dir_for(sf_dir)
    out = extract_pipeline_dedup(read_pages(os.path.join(d, "pages.parquet")))
    return out.select_columns(["url", "extracted_text", "confidence", "status",
                               "dedup_source_url"]).sort("url")


def pdf_page_rows(sf_dir: str):
    """M6 doc→pages explode over the pages corpus: one row per PDF page
    (non-PDF rows pass through as page 0). Payload bytes are dropped from
    the result — only (url, page, total_pages, page_bytes) metadata."""
    from ..stages.pages_ops import explode_pdf_pages

    d = _pages_dir_for(sf_dir)
    ds = read_pages(os.path.join(d, "pages.parquet"))

    def meta(batch: pa.Table) -> pa.Table:
        exploded = explode_pdf_pages(batch)
        sizes = [len(p) if p is not None else 0 for p in exploded["html"].to_pylist()]
        return pa.table({"url": exploded["url"], "page": exploded["page"],
                         "total_pages": exploded["total_pages"],
                         "page_bytes": pa.array(sizes, pa.int64())})

    return ds.map_batches(meta, batch_format="pyarrow").sort(["url", "page"])


def doc_structure_stats(sf_dir: str):
    """M8 structure analysis rollup: per-document paragraph/column/sentence/
    span counts from the nested structure columns the extractor emits."""
    d = _pages_dir_for(sf_dir)
    out = extract_pipeline(read_pages(os.path.join(d, "pages.parquet")),
                           with_summary=False, build_spans=True)

    def stats(batch: pa.Table) -> pa.Table:
        paras = batch["paragraphs"].to_pylist()
        cols = batch["columns"].to_pylist()
        spans = batch["spans"].to_pylist()
        n_sent = [sum(len(p["sentences"]) for p in ps) if ps else 0 for ps in paras]
        return pa.table({
            "url": batch["url"],
            "n_paragraphs": pa.array([len(p) if p else 0 for p in paras], pa.int64()),
            "n_columns": pa.array([len(c) if c else 0 for c in cols], pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "n_spans": pa.array([len(s) if s else 0 for s in spans], pa.int64()),
            "status": batch["status"],
        })

    return out.map_batches(stats, batch_format="pyarrow").sort("url")


def image_meta(sf_dir: str):
    """Multimodal decode stage (actor pool) over the pages corpus: every
    payload through ImageDecodeStage; non-image payloads surface as
    status='error' rows (M11 row-level isolation), IMGX decodes natively."""
    from ..stages.multimodal import ImageDecodeStage, image_payload_mask

    d = _pages_dir_for(sf_dir)
    ds = read_pages(os.path.join(d, "pages.parquet"))

    def strip_non_images(batch: pa.Table) -> pa.Table:
        # vectorized magic-byte prefilter (cheap task stage): non-image
        # payloads (the ~90% HTML majority) are nulled out so multi-MB blobs
        # never ship into the actor pool; the stage's own mask then routes
        # null rows straight to the vectorized error-row path
        pcol = batch["html"] if "html" in batch.column_names else batch["payload"]
        mask = image_payload_mask(pcol)
        return pa.table({"url": batch["url"],
                         "payload": pc.if_else(mask, pcol,
                                               pa.scalar(None, pa.binary()))})

    # fractional num_cpus: a pool of 4 × 1.0 CPUs would monopolize a small
    # session and starve the read stage into deadlock (ACTOR_NUM_CPUS rule,
    # pipelines/extract.py)
    out = (ds.map_batches(strip_non_images, batch_format="pyarrow")
           .map_batches(ImageDecodeStage, batch_format="pyarrow",
                        batch_size=256, concurrency=4, num_cpus=0.5))
    return out.sort("url")


def image_dhash_dups(sf_dir: str):
    """Perceptual-hash image near-dup detection over the pages corpus:
    IMGX payloads → 64-bit dHash (stages/multimodal.ImageDHashStage;
    gradient-sign fingerprint that survives re-encode / brightness / small
    noise where byte digests split) → global owner labeling per hash via
    the exact_dedup coarse digest-prefix exchange (16-byte hash rows move,
    pixels never do). The hamming-tolerant extension is the simhash
    4-band machinery (stages/dedup.simhash_pairs) over the same column."""
    from .. import str_hash
    from ..stages.multimodal import ImageDHashStage, image_payload_mask

    d = _pages_dir_for(sf_dir)
    ds = read_pages(os.path.join(d, "pages.parquet"))

    def strip_non_images(batch: pa.Table) -> pa.Table:
        pcol = batch["html"] if "html" in batch.column_names \
            else batch["payload"]
        mask = image_payload_mask(pcol)
        return pa.table({"url": batch["url"],
                         "payload": pc.if_else(mask, pcol,
                                               pa.scalar(None, pa.binary()))})

    hashed = (ds.map_batches(strip_non_images, batch_format="pyarrow")
              .map_batches(ImageDHashStage, batch_format="pyarrow",
                           batch_size=256, concurrency=4, num_cpus=0.5))

    def add_coarse(batch: pa.Table) -> pa.Table:
        coarse = str_hash.crc32_of_strings(batch["dhash"]) % 64
        return batch.append_column(
            "coarse", pa.array(coarse.astype(np.int32), pa.int32()))

    def owners(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["dhash", "url"], kind="mergesort") \
            .reset_index(drop=True)
        h = d["dhash"].to_numpy()
        new = np.ones(len(d), bool)
        if len(d) > 1:
            new[1:] = h[1:] != h[:-1]
        sizes = np.diff(np.append(np.nonzero(new)[0], len(d)))
        own = np.repeat(d["url"].to_numpy()[new], sizes)
        return pd.DataFrame({
            "url": d["url"], "dhash": d["dhash"],
            "width": d["width"], "height": d["height"],
            "owner_url": pd.array(own, "string"),
            "is_dup": own != d["url"].to_numpy()})

    out = (hashed.map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse").map_groups(owners, batch_format="pandas"))
    out = dedup.nonempty_or_typed_table(out, {
        "url": pa.string(), "dhash": pa.string(), "width": pa.int64(),
        "height": pa.int64(), "owner_url": pa.string(),
        "is_dup": pa.bool_()})
    return out.sort("url")


def frame_samples(sf_dir: str):
    """Frame sampling over PDFX multi-frame containers (video stand-in):
    every 2nd frame, metadata only."""
    from ..stages.multimodal import sample_frames

    d = _pages_dir_for(sf_dir)
    ds = read_pages(os.path.join(d, "pages.parquet"))

    def meta(batch: pa.Table) -> pa.Table:
        s = sample_frames(batch, every_nth=2)
        sizes = [len(f) if f is not None else 0 for f in s["frame"].to_pylist()]
        return pa.table({"url": s["url"], "frame_idx": s["frame_idx"],
                         "total_frames": s["total_frames"],
                         "frame_bytes": pa.array(sizes, pa.int64())})

    return ds.map_batches(meta, batch_format="pyarrow").sort(["url", "frame_idx"])


def audio_features(sf_dir: str):
    """Audio feature extraction over deterministic AUDX payloads synthesized
    from the embeddings table (vec_id-keyed sine waves) — exercises the
    decode → DSP actor stage end-to-end with no external codecs."""
    from ..stages.multimodal import AudioFeatureStage, encode_audx

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        payloads = []
        for i in ids:
            freq = 100.0 + (i % 400)
            t = np.arange(0, 4000) / 16000.0
            payloads.append(encode_audx(10000.0 * np.sin(2 * np.pi * freq * t)))
        return pa.table({"url": pa.array([f"audx://{i}" for i in ids], pa.string()),
                         "payload": pa.array(payloads, pa.binary())})

    ds = _embeddings(sf_dir).map_batches(synth, batch_format="pyarrow")
    out = ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                         batch_size=128, concurrency=4, num_cpus=0.5)
    return out.sort("url")


RECRAWL_SHIFT_US = 7 * 24 * 3600 * 1_000_000  # recrawl 7 days later


def latest_capture_per_url(sf_dir: str):
    """Capture dedup over a simulated recrawl: pages ∪ (same urls, warc_ts
    + 7 days, crawl_gen 2) → exactly one row per url, the newest capture.
    The two-stage partial argmax (stages/crawl.py) means the union's rows
    shrink per batch before the url-hash shuffle — at k captures/url the
    exchange carries ~1/k of the crawl. Every surviving row must be gen 2
    by construction; the pandas-differential test checks exactly that."""
    d = _pages_dir_for(sf_dir)
    base = read_pages(os.path.join(d, "pages.parquet"),
                      columns=["url", "warc_ts", "lang"])

    def gen(g: int, shift_us: int):
        def tag(batch: pa.Table) -> pa.Table:
            ts = pc.add(batch["warc_ts"].cast(pa.int64()),
                        pa.scalar(shift_us, pa.int64()))
            return pa.table({
                "url": batch["url"],
                "warc_ts": ts.cast(pa.timestamp("us")),
                "lang": batch["lang"],
                "crawl_gen": pa.array(
                    np.full(batch.num_rows, g, np.int64))})
        return tag

    ds = (base.map_batches(gen(1, 0), batch_format="pyarrow")
          .union(base.map_batches(gen(2, RECRAWL_SHIFT_US),
                                  batch_format="pyarrow")))
    out = crawl.latest_rows_per_key(
        ds, "url", ["warc_ts", "crawl_gen"],
        n_coarse=_docs_coarse_hint(sf_dir, 2),
        schema={"url": pa.string(), "warc_ts": pa.timestamp("us"),
                "lang": pa.string(), "crawl_gen": pa.int64()})
    return out.sort("url")


def domain_page_stats(sf_dir: str):
    """Per-domain crawl rollup: page count, raw html bytes, newest capture
    — host extracted from the url with one vectorized RE2 per batch, a
    per-batch combiner (Arrow group_by inside the batch), then one domain
    groupby over pre-aggregated rows. Ray's native Max degrades timestamp
    values to second resolution (measured, see memory), so the max rides
    as int64 µs and is cast back after the aggregate."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html", "warc_ts"])

    def partial(batch: pa.Table) -> pa.Table:
        tb = pa.table({
            # schemeless/malformed urls roll up under "" — the host_edges
            # / host_capped_pages convention (a null group would also be
            # dropped by some group paths)
            "domain": pc.fill_null(crawl.host_of(batch["url"]), ""),
            "b": pc.binary_length(batch["html"]).cast(pa.int64()),
            "ts_us": batch["warc_ts"].cast(pa.int64())})
        g = tb.group_by("domain").aggregate(
            [("b", "sum"), ("b", "count"), ("ts_us", "max")])
        return pa.table({
            "domain": g["domain"],
            "total_html_bytes": g["b_sum"],
            "n_pages": g["b_count"].cast(pa.int64()),
            "ts_us": g["ts_us_max"]})

    agg = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby("domain")
           .aggregate(Sum("total_html_bytes", alias_name="total_html_bytes"),
                      Sum("n_pages", alias_name="n_pages"),
                      Max("ts_us", alias_name="ts_us")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "domain": batch["domain"],
            "n_pages": batch["n_pages"],
            "total_html_bytes": batch["total_html_bytes"],
            "last_capture": batch["ts_us"].cast(pa.int64())
                                          .cast(pa.timestamp("us"))})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("domain")


def extract_lang_stats(sf_dir: str):
    """G6 — the one true wide aggregation over extraction output: per-lang
    doc counts + mean confidence + mean extracted length."""
    d = _pages_dir_for(sf_dir)
    out = extract_pipeline(read_pages(os.path.join(d, "pages.parquet")),
                           with_summary=False, build_spans=False)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"lang": batch["lang"], "confidence": batch["confidence"],
                         "n_chars": pc.cast(pc.utf8_length(batch["extracted_text"]), pa.int64()),
                         "ok": pc.cast(pc.equal(batch["status"], pa.scalar("ok")), pa.int64())})

    agg = (out.map_batches(project, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Count(alias_name="n_docs"), Mean("confidence", alias_name="avg_confidence"),
                      Sum("n_chars", alias_name="total_chars"), Sum("ok", alias_name="n_ok")))
    return agg.sort("lang")


from ..hashing import hash32 as _hash32  # noqa: E402 — shared sampling hash


def _hash_keep(doc_id, pct: int) -> bool:
    """Fraction-membership rule on top of _hash32: under pct% of 2^32."""
    return _hash32(doc_id) < (1 << 32) * pct // 100


def sample_docs(sf_dir: str, pct: int = 10):
    """Deterministic hash sampling — reproducible corpus subsampling for
    training-data curation: keep a row iff md5(doc_id) falls under pct% of
    the 32-bit space (_hash_keep). Unlike random_shuffle or seeded
    sampling, membership is a pure function of the key: stable across
    runs, partitionings and cluster sizes, and reproducible in SQL
    (md5 available in DuckDB) for the oracle."""

    def keep(batch: pa.Table) -> pa.Table:
        mask = [_hash_keep(i, pct) for i in batch["doc_id"].to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(keep, batch_format="pyarrow").sort("doc_id"))


STRATA_PCT = {"eng": 20, "ind": 50}
STRATA_DEFAULT_PCT = 100


def stratified_sample_docs(sf_dir: str, strata: dict[str, int] | None = None):
    """Stratified deterministic sampling: a PER-GROUP hash fraction
    (downsample over-represented languages, keep the rest) — the standard
    rebalancing step for training-data curation. Same pure-function
    membership as sample_docs (md5 of the key), so it is stable across
    partitionings and reproducible in the SQL oracle; the per-lang
    fraction is a vectorized bound lookup, no shuffle."""
    # {} must mean "no downsampling anywhere", not "use defaults"
    pcts = STRATA_PCT if strata is None else strata

    def keep(batch: pa.Table) -> pa.Table:
        mask = [_hash_keep(i, pcts.get(lang, STRATA_DEFAULT_PCT))
                for i, lang in zip(batch["doc_id"].to_pylist(),
                                   batch["lang"].to_pylist())]
        return batch.filter(pa.array(mask, pa.bool_()))

    return (_docs(sf_dir, ["doc_id", "lang", "n_chars"])
            .map_batches(keep, batch_format="pyarrow").sort("doc_id"))


def dup_window_stats_docs(sf_dir: str):
    """Per-doc duplicated k-token-window statistics over documents (window
    duplicated ⇔ its token sequence appears in ≥2 distinct docs anywhere in
    the corpus — the shared source boilerplate makes this a live signal on
    the plain corpus, no doubling needed). Value-exact SQL oracle."""
    nc = _docs_coarse_hint(sf_dir)
    out = dedup.dup_window_stats(_docs(sf_dir, ["doc_id", "text"]),
                                 n_coarse=nc, n_coarse_docs=nc)
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


# --------------------------------------------------------- link graph

def _pages_coarse_hint(sf_dir: str) -> int:
    d = _pages_dir_for(sf_dir)
    shards = os.listdir(os.path.join(d, "pages.parquet"))
    n = pq.ParquetFile(os.path.join(d, "pages.parquet",
                                    sorted(shards)[0])).metadata.num_rows
    return min(dedup.N_COARSE, (n * len(shards)) // 2_000 + 1)


def page_links(sf_dir: str):
    """Per-page out-links (src_url, dst_url, anchor_text) over the crawl
    corpus — resolved, fragment-stripped, http(s)-only."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    return pages.map_batches(linkgraph.extract_links,
                             batch_format="pyarrow") \
                .sort(["src_url", "dst_url", "anchor_text"])


def host_graph_edges(sf_dir: str):
    """Host→host link-count rollup of the crawl's hyperlink graph."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    out = linkgraph.host_edges(links, n_coarse=_pages_coarse_hint(sf_dir))
    return out if isinstance(out, pa.Table) else \
        out.sort(["src_host", "dst_host"])


def host_pagerank(sf_dir: str):
    """PageRank over the host link graph (10 rounds, d=0.85, deterministic
    sorted summation — bit-identical across partitionings/parallelism)."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    nc = _pages_coarse_hint(sf_dir)
    edges = linkgraph.host_edges(links, n_coarse=nc)
    if isinstance(edges, pa.Table):          # empty corpus
        return pa.table({"node": pa.array([], pa.string()),
                         "pr": pa.array([], pa.float64())})
    out = linkgraph.pagerank(edges, n_coarse=nc)
    return out if isinstance(out, pa.Table) else out.sort("node")


def host_pagerank_int(sf_dir: str):
    """Fixed-point integer PageRank over the host link graph
    (stages/linkgraph.pagerank_int, 10 rounds, damping 85/100, scale 1e9
    micro-units). Pure-integer floor-division recurrence ⇒ value-exact vs
    an unrolled MATERIALIZED-CTE SQL oracle — the oracle-able sibling of
    host_pagerank, whose iterated float products have no SQL form."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    nc = _pages_coarse_hint(sf_dir)
    edges = linkgraph.host_edges(links, n_coarse=nc)
    out = linkgraph.pagerank_int(edges, n_coarse=nc)
    return out if isinstance(out, pa.Table) else out.sort("node")


def authority_filtered_pages(sf_dir: str, k: int = 16):
    """Authority-weighted corpus curation, end to end: keep every crawled
    page whose host ranks in the top-``k`` by fixed-point integer
    PageRank — the link-graph metric feeding the corpus filter (the
    RefinedWeb/quality-crawl-frontier pattern: spend the training-token
    budget on high-authority hosts). Output (url, host, pr_int).

    Scale shape: the rank table is hosts²-sparse (never the corpus); its
    top-k by (pr_int DESC, node ASC) comes from the partial-top-k
    finisher, rides the closure as a k-entry dict, and the filter pass
    re-reads ONLY the url column (column pruning — the html bytes never
    leave storage a second time). Pure-integer ranks ⇒ the whole
    composition is value-exact vs one generated SQL statement."""
    import ray  # noqa: F401

    from ..stages import crawl, linkgraph
    from ..stages.topk import topk_table

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    nc = _pages_coarse_hint(sf_dir)
    edges = linkgraph.host_edges(links, n_coarse=nc)
    pr = linkgraph.pagerank_int(edges, n_coarse=nc)

    # top-k among CRAWLED hosts only: the link graph is dominated by
    # target-only external domains with no pages to keep, so ranking the
    # raw node table would spend most of the budget on empty hosts
    import ray.data as _rd

    from ..stages.joins import hash_join
    from ..stages.linkgraph import _str_coarse

    urls = read_pages(os.path.join(d, "pages.parquet"), columns=["url"])

    def host_rows(batch: pa.Table) -> pa.Table:
        h = pc.drop_null(crawl.host_of(batch["url"])).unique()
        return pa.table({"host": h, "coarse": pa.array(_str_coarse(h, nc))})

    def first_host(df: pd.DataFrame) -> pa.Table:
        g = df.drop_duplicates("host").sort_values("host")
        return pa.table({"host": pa.array(g["host"], pa.string())})

    crawled = (urls.map_batches(host_rows, batch_format="pyarrow")
               .groupby("coarse").map_groups(first_host,
                                             batch_format="pandas"))
    pr_ds = _rd.from_arrow(pr) if isinstance(pr, pa.Table) else pr
    ranked = hash_join(pr_ds, crawled, "node", "host") \
        .select_columns(["node", "pr_int"])
    top = topk_table(ranked, [("pr_int", "descending"),
                              ("node", "ascending")], k)
    rank = dict(zip(top["node"].to_pylist(), top["pr_int"].to_pylist()))

    hosts_arr = pa.array(sorted(rank), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        host = crawl.host_of(batch["url"])
        mask = pc.fill_null(pc.is_in(host, value_set=hosts_arr), False)
        t = pa.table({"url": batch["url"], "host": host}).filter(mask)
        # surviving rows are answer-proportional; the dict map is tiny
        return t.append_column("pr_int", pa.array(
            [rank[h] for h in t["host"].to_pylist()], pa.int64()))

    out = urls.map_batches(keep, batch_format="pyarrow")
    from ..stages.dedup import nonempty_or_typed_table
    out = nonempty_or_typed_table(out, {"url": pa.string(),
                                        "host": pa.string(),
                                        "pr_int": pa.int64()})
    return out if isinstance(out, pa.Table) else out.sort("url")


def host_hits(sf_dir: str):
    """HITS hubs/authorities over the host link graph
    (stages/linkgraph.hits, 10 rounds, L1-normalized half-steps,
    deterministic sorted summation). Rows-only at the gate — iterated
    float products have no SQL form (the host_pagerank justification);
    local ≡ distributed and numpy differentials pin it."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    edges = linkgraph.host_edges(links,
                                 n_coarse=_pages_coarse_hint(sf_dir))
    out = linkgraph.hits(edges)
    return out if isinstance(out, pa.Table) else out.sort("node")


def host_hits_int(sf_dir: str):
    """Fixed-point integer HITS over the host link graph
    (stages/linkgraph.hits_int, 10 rounds, scale 1e6 micro-units,
    L1 floor-normalized half-steps). Pure-integer order-free recurrence
    ⇒ value-exact vs an unrolled MATERIALIZED-CTE SQL oracle — the
    oracle-able sibling of host_hits, whose iterated float products
    have no SQL form (the host_pagerank_int convention)."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    nc = _pages_coarse_hint(sf_dir)
    edges = linkgraph.host_edges(links, n_coarse=nc)
    out = linkgraph.hits_int(edges, n_coarse=nc)
    return out if isinstance(out, pa.Table) else out.sort("node")


def host_components(sf_dir: str):
    """Weakly-connected components of the host link graph
    (stages/linkgraph.host_components): component id = lexicographically
    smallest member host; value-exact vs a recursive-CTE min-reachability
    oracle over the same edge rollup."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    edges = linkgraph.host_edges(links,
                                 n_coarse=_pages_coarse_hint(sf_dir))
    out = linkgraph.host_components(edges)
    return out if isinstance(out, pa.Table) else out.sort("host")


def canonical_capture_dedup(sf_dir: str):
    """Capture dedup keyed on the CANONICAL url: a simulated recrawl
    re-observes every page under a mangled variant (uppercased scheme,
    utm tracking params, fragment) 7 days later; canonicalization must
    collapse each variant onto its original so exactly one row — the
    newer, gen-2 capture — survives per page. Returns
    (url = canonical, warc_ts, crawl_gen) sorted by url."""
    d = _pages_dir_for(sf_dir)
    base = read_pages(os.path.join(d, "pages.parquet"),
                      columns=["url", "warc_ts"])

    def gen1(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "crawl_gen": pa.array(np.ones(batch.num_rows, np.int64))})

    def gen2(batch: pa.Table) -> pa.Table:
        mangled = pc.binary_join_element_wise(
            pc.replace_substring(batch["url"].cast(pa.string()),
                                 "https://", "HTTPS://"),
            pa.array(["?utm_source=recrawl&utm_campaign=x#top"]
                     * batch.num_rows), "")
        ts = pc.add(batch["warc_ts"].cast(pa.int64()),
                    pa.scalar(RECRAWL_SHIFT_US, pa.int64()))
        return pa.table({
            "url": mangled,
            "warc_ts": ts.cast(pa.timestamp("us")),
            "crawl_gen": pa.array(np.full(batch.num_rows, 2, np.int64))})

    def canon(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("url"), "url",
            crawl.canonical_urls(batch["url"]))

    ds = (base.map_batches(gen1, batch_format="pyarrow")
          .union(base.map_batches(gen2, batch_format="pyarrow"))
          .map_batches(canon, batch_format="pyarrow"))
    out = crawl.latest_rows_per_key(
        ds, "url", ["warc_ts", "crawl_gen"],
        n_coarse=_docs_coarse_hint(sf_dir, 2),
        schema={"url": pa.string(), "warc_ts": pa.timestamp("us"),
                "crawl_gen": pa.int64()})
    return out.sort("url")


def kmeans_labels(sf_dir: str):
    """Full-corpus Lloyd k-means over the embeddings table (k=8, 5 exact
    centroid-update rounds, deterministic lowest-vec_id init)."""
    out = similarity.kmeans_labels(_embeddings(sf_dir), k=8, n_iter=5)
    return out if isinstance(out, pa.Table) else out.sort("vec_id")


def _page_meta_kernel(batch: pa.Table) -> pa.Table:
    """Shared per-batch metadata kernel: (url, title, meta_description),
    empty strings for null/non-HTML payloads."""
    from ..stages import html_extract

    titles, descs = [], []
    for p in batch["html"].to_pylist():
        if p is None:
            titles.append("")
            descs.append("")
            continue
        t, m = html_extract.page_metadata(p)
        titles.append(t)
        descs.append(m)
    return pa.table({
        "url": batch["url"],
        "title": pa.array(titles, pa.string()),
        "meta_description": pa.array(descs, pa.string())})


def page_metadata(sf_dir: str):
    """Per-page metadata (title, meta description) over the crawl corpus
    — empty strings for non-HTML payloads. Vectorized over the html
    column with the same per-row kernel class as extraction."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    return pages.map_batches(_page_meta_kernel,
                             batch_format="pyarrow").sort("url")


def html_markup_stats(sf_dir: str):
    """Markup-density diagnostics per HTML page — the text-to-markup
    ratio every content-extraction heuristic thresholds on (boilerplate
    pages are tag-dense; article pages are text-dense): tag-token count,
    script-open count, markup vs text chars (markup = chars removed by
    stripping ``<[^>]*>`` tokens), and the ratio as one float division
    of exact ints. Gate = the page_metadata DOCTYPE rule. Three
    vectorized RE2 kernels per batch, no shuffle; value-exact in SQL
    over the blob→varchar reconstruction."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])

    def kernel(batch: pa.Table) -> pa.Table:
        html = batch["html"]
        mask = pc.starts_with(pc.fill_null(html, b""),
                              pattern=b"<!DOCTYPE html>")
        t = pa.table({"url": batch["url"], "html": html}).filter(mask)
        doc = pc.cast(t["html"], pa.string())
        n_chars = pc.cast(pc.utf8_length(doc), pa.int64())
        n_tags = pc.cast(pc.count_substring_regex(doc, r"<[^>]*>"),
                         pa.int64())
        n_scripts = pc.cast(pc.count_substring_regex(
            doc, r"(?is)<script\b"), pa.int64())
        text_chars = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(doc, r"<[^>]*>", "")), pa.int64())
        markup = pc.subtract(n_chars, text_chars)
        ratio = pc.divide(
            pc.cast(text_chars, pa.float64()),
            pc.max_element_wise(pc.cast(n_chars, pa.float64()),
                                pa.scalar(1.0)))
        return pa.table({
            "url": t["url"], "n_chars": n_chars, "n_tags": n_tags,
            "n_scripts": n_scripts, "markup_chars": markup,
            "text_chars": text_chars, "text_ratio": ratio})

    return pages.map_batches(kernel, batch_format="pyarrow").sort("url")


def host_boilerplate_pages(sf_dir: str):
    """Host-scoped line-level boilerplate removal over the HTML crawl:
    a 4+-char line appearing in >=2 distinct pages of the SAME host is
    template chrome and is removed from every page of that host (the
    CCNet/jusText boilerplate semantic — remove all copies, host-scoped
    — vs line_dedup's corpus-wide keep-first). Returns (url, host,
    n_lines, n_removed, clean_text) sorted by url; value-exact in SQL
    over the blob→varchar doc reconstruction."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    nc = _pages_coarse_hint(sf_dir)
    out = crawl.host_line_boilerplate(pages, n_coarse=nc,
                                      n_coarse_docs=nc)
    return out if isinstance(out, pa.Table) else out.sort("url")


def anchor_text_summary(sf_dir: str):
    """dst_url → in-link count + bounded distinct anchor-text digest over
    the crawl's hyperlink graph."""
    from ..stages import linkgraph

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])
    links = pages.map_batches(linkgraph.extract_links,
                              batch_format="pyarrow")
    out = linkgraph.anchor_text_index(
        links, n_coarse=_pages_coarse_hint(sf_dir))
    return out if isinstance(out, pa.Table) else out.sort("dst_url")


MIX_TEMP_ALPHA = 0.7


def temperature_mixed_docs(sf_dir: str, alpha: float = MIX_TEMP_ALPHA):
    """Temperature-based source mixing (the mT5/XLM-R α-sampling rule,
    α = 0.7): source s gets sampling share w_s = tokens_s^α / Σ tokens^α
    — flatter than natural (α=1), so small sources are upweighted — and
    per-source keep rate min(1, target·w_s / tokens_s) against the same
    total/4 token target and md5-threshold membership as
    ``mixed_sample_docs``. The Σ tokens^α denominator is a LEFT FOLD over
    sources in lexicographic order (functools.reduce here,
    list_reduce(list(... ORDER BY source)) in the oracle), so the float is
    bit-identical on both sides; every other term derives from integer
    totals. Returns kept (doc_id, source, n_tokens)."""
    import functools
    import operator

    def tok(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "n_tokens": pc.cast(pc.count_substring_regex(t, r"\S+"),
                                pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text", "source"]) \
        .map_batches(tok, batch_format="pyarrow").materialize()

    st = docs.groupby("source").sum("n_tokens").to_pandas() \
        .sort_values("source")
    toks = st["sum(n_tokens)"].astype(np.int64)
    target = int(toks.sum()) // MIX_TARGET_DEN
    pows = [float(t) ** alpha for t in toks]
    den = functools.reduce(operator.add, pows, 0.0)
    rates = {}
    for s, t, p in zip(st["source"], toks, pows):
        rates[s] = 1.0 if t == 0 else \
            min(1.0, (float(target) * (p / den)) / float(t))

    def keep(batch: pa.Table) -> pa.Table:
        thr = np.array([np.floor(4294967296.0 * rates[s])
                        for s in batch["source"].to_pylist()], np.float64)
        h = np.array([_hash32(i) for i in batch["doc_id"].to_pylist()],
                     np.float64)
        return batch.filter(pa.array(h < thr))

    return docs.map_batches(keep, batch_format="pyarrow") \
               .select_columns(["doc_id", "source", "n_tokens"]) \
               .sort("doc_id")


def crawl_diff(sf_dir: str):
    """Diff of two simulated crawl generations over the corpus: gen 2
    drops every url with hash32%4==0, rewrites content where %4==1
    (one appended comment byte-string), keeps %4∈{2,3} byte-identical,
    and discovers one new '?page=2' url per %4==2 page — so every status
    class is populated. Returns (url, status, old_digest, new_digest)
    sorted by url."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])

    def mod4(batch: pa.Table) -> np.ndarray:
        return np.array([_hash32(u) % 4
                         for u in batch["url"].to_pylist()], np.int64)

    def gen2(batch: pa.Table) -> pa.Table:
        m = mod4(batch)
        keep = batch.filter(pa.array(m != 0))
        km = m[m != 0]
        html = keep["html"].to_pylist()
        html = [h + b"<!-- rev2 -->" if g == 1 else h
                for h, g in zip(html, km)]
        urls = keep["url"].to_pylist()
        add_urls = [u + "?page=2" for u, g in zip(urls, km) if g == 2]
        add_html = [b"<p>continuation page body for the new capture</p>"
                    ] * len(add_urls)
        return pa.table({
            "url": pa.array(urls + add_urls, pa.string()),
            "html": pa.array(html + add_html, pa.binary())})

    out = crawl.diff_by_key(pages,
                            pages.map_batches(gen2, batch_format="pyarrow"),
                            n_coarse=_docs_coarse_hint(sf_dir, 2))
    return out if isinstance(out, pa.Table) else out.sort("url")


def crawl_diff_status(sf_dir: str):
    """Value-exact surface of crawl_diff: (url, status) only.

    The digest columns are hashlib-md5 over RAW bytes; DuckDB's md5() is
    VARCHAR-only, so it cannot reproduce them for the corpus's binary
    (non-UTF-8) payloads — that keeps full crawl_diff rows-only. But
    status depends only on byte EQUALITY of the two generations, which
    SQL compares directly on the BLOBs (old.html = new.html), so the diff
    LOGIC is value-oracled end to end here."""
    out = crawl_diff(sf_dir)
    if isinstance(out, pa.Table):
        return out.select(["url", "status"])
    return out.select_columns(["url", "status"])


def corpus_datasheet(sf_dir: str):
    """Per-(source, lang) corpus datasheet — the 'datasheets for datasets'
    rollup every release ships: doc/token/char totals plus integer-exact
    averages (float division of exact int sums, so the SQL oracle agrees
    bit-for-bit). One in-batch combiner pass → one tiny groupby; null
    text counts as zero tokens/chars but still a doc."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        tb = pa.table({
            "source": batch["source"],
            "lang": batch["lang"],
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "tok": pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64()),
            "ch": pc.cast(pc.utf8_length(t), pa.int64())})
        g = tb.group_by(["source", "lang"]).aggregate(
            [("one", "sum"), ("tok", "sum"), ("ch", "sum")])
        return pa.table({"source": g["source"], "lang": g["lang"],
                         "n_docs": g["one_sum"], "tok": g["tok_sum"],
                         "ch": g["ch_sum"]})

    agg = (_docs(sf_dir, ["text", "lang", "source"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["source", "lang"])
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("tok", alias_name="total_tokens"),
                      Sum("ch", alias_name="total_chars")))

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_docs"].cast(pa.int64())
        tok = batch["total_tokens"].cast(pa.int64())
        ch = batch["total_chars"].cast(pa.int64())
        return pa.table({
            "source": batch["source"], "lang": batch["lang"],
            "n_docs": nd, "total_tokens": tok, "total_chars": ch,
            "avg_tokens": pc.divide(pc.cast(tok, pa.float64()),
                                    pc.cast(nd, pa.float64())),
            "avg_chars": pc.divide(pc.cast(ch, pa.float64()),
                                   pc.cast(nd, pa.float64()))})

    return agg.map_batches(finish, batch_format="pyarrow") \
              .sort(["source", "lang"])


HOST_CAP_K = 5


def host_capped_pages(sf_dir: str, k: int = HOST_CAP_K):
    """Per-host crawl-budget cap: at most k pages per host — the
    anti-spam / politeness sampler every web corpus applies so no domain
    dominates training data (C4 and RefinedWeb both cap per-domain
    contributions). Membership is the k smallest md5(url) hashes per host
    (pure function of the key: stable across runs, partitionings, cluster
    sizes). Per-batch PARTIAL top-k per host combines before the shuffle,
    so the exchange carries ≤ k rows per (host, batch) — never the crawl.
    Returns (host, rank, url)."""

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hosts = crawl.host_of(batch["url"]).to_pylist()
        df = pd.DataFrame({
            # schemeless/malformed urls (host None) group under "" and are
            # capped like any host — pandas groupby drops NaN keys, which
            # would silently delete those rows instead
            "host": ["" if h is None else h for h in hosts],
            "url": urls,
            "h": [_hash32(u) for u in urls]})
        d = df.sort_values(["host", "h", "url"], kind="mergesort")
        d = d[d.groupby("host").cumcount() < k]
        coarse = str_hash.str_coarse(d["host"], dedup.N_COARSE)
        t = pa.Table.from_pandas(d, preserve_index=False)
        return t.append_column("coarse", pa.array(coarse))

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["host", "h", "url"], kind="mergesort")
        d = d.assign(rank=d.groupby("host").cumcount() + 1)
        d = d[d["rank"] <= k]
        return pd.DataFrame({"host": d["host"],
                             "rank": d["rank"].astype("int64"),
                             "url": d["url"]})

    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"), columns=["url"])
    out = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby("coarse").map_groups(resolve, batch_format="pandas"))
    out = dedup.nonempty_or_typed_table(out, {
        "host": pa.string(), "rank": pa.int64(), "url": pa.string()})
    return out if isinstance(out, pa.Table) else out.sort(["host", "rank"])


def window_dedup_docs(sf_dir: str):
    """Lee-et-al-style duplicated-window REMOVAL over documents: every
    13-token window occurring twice anywhere in the corpus survives only
    at its lexicographically-first (doc_id, offset) occurrence; covered
    tokens elsewhere are removed and docs reassembled from the token
    stream. Value-exact SQL oracle (strings included)."""
    nc = _docs_coarse_hint(sf_dir)
    out = dedup.window_dedup(_docs(sf_dir, ["doc_id", "text"]),
                             n_coarse=nc, n_coarse_docs=nc)
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def url_features_pages(sf_dir: str):
    """URL shape/spam features (stages/crawl.url_features) over the
    simulated messy crawl log: each corpus url spawns one deterministic
    variant by hash32%4 (tracking params, numeric id, deep path, paged
    query) so every feature fires. One vectorized RE2 pass per feature,
    column-pruned to the url — the html payload never reads."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"), columns=["url"])

    def messy(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        out = list(urls)
        for u in urls:
            g = _hash32(u) % 4
            out.append(u + ["?utm_source=news&utm_medium=rss",
                            "?id=123456", "/a/b/c/d/e",
                            "?q=x&page=2&ref=9"][g])
        return pa.table({"url": pa.array(out, pa.string())})

    return crawl.url_features(
        pages.map_batches(messy, batch_format="pyarrow")).sort("url")


def url_filtered_pages(sf_dir: str):
    """URL blocklist gate over a simulated messy crawl log: each corpus
    url spawns one trap variant by hash32%4 (media asset, session-id,
    calendar trap, deep pagination) alongside the clean original; the
    filter must quarantine every variant and keep every original.
    Returns the quarantined rows (url, rule_idx, status) sorted."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"), columns=["url"])

    def messy(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        out = list(urls)
        for u in urls:
            g = _hash32(u) % 4
            out.append(u + ["/img.jpeg", "?phpsessid=abc123",
                            "/calendar/2024/01/15", "?page=1234"][g])
        return pa.table({"url": pa.array(out, pa.string())})

    kept, quarantined = crawl.url_filter(
        pages.map_batches(messy, batch_format="pyarrow"))
    return quarantined.sort("url")


@ray.remote(num_cpus=1)
def _golden_digests_task(path: str) -> pa.Table:
    """Load the golden fixture and reduce it to its broadcast form — url,
    md5(golden_text), golden_exact, payload_kind — INSIDE a Ray task, so
    the driver only ever holds the ObjectRef (dim_broadcast convention)
    and the golden TEXT never enters the broadcast payload. Row groups
    stream one at a time: peak task memory is one row group of text plus
    the digest-only output, never the whole text column (a just-under-cap
    golden with multi-KB texts would otherwise hold GBs in one heap)."""
    import pyarrow.parquet as _pqm

    pf = _pqm.ParquetFile(path)
    parts = []
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(
            rg, columns=["url", "golden_text", "golden_exact",
                         "payload_kind"])
        parts.append(dedup.add_md5_digest(t, text_col="golden_text",
                                          out_col="gold_digest")
                     .drop_columns(["golden_text"]))
    return pa.concat_tables(parts).combine_chunks()


def extraction_eval(sf_dir: str, broadcast_cap_rows: "int | None" = None):
    """Corpus-wide self-evaluation of the byte-identical invariant (the
    north rule's per-row check, as a first-class operator): run the
    flagship extraction, join the results back to the generation-time
    golden table on url, and roll up per payload kind — rows, rows with a
    golden byte-equality guarantee (golden_exact), and how many of those
    matched byte-for-byte. The per-url flags reduce via an in-batch
    combiner; only (kind, 3 ints) rows reach the driver. Byte equality is
    checked as md5-digest equality computed BEFORE any exchange — the
    crawl_diff convention: only 32-hex digests ride, never the two text
    corpora.

    Join routing (stages/dim_broadcast): golden is a bounded per-shard
    fixture, so below the row cap a Ray task loads it, computes the
    digests in-task, and every fused extract task probes the broadcast
    with an acero join — the eval rides the extraction stream with NO
    sort barrier (measured at sf0.1/32cpus: 6.1 s → ~extract wall).
    Above the cap both digest streams take the co-partitioned
    stages/joins.hash_join, identical output (pinned by
    tests/test_pipeline.py::TestExtractionEvalRouting)."""
    from ..stages.dim_broadcast import should_broadcast
    from ..stages.joins import hash_join

    def dig(col: str, out: str):
        # ONE digest convention repo-wide: dedup.add_md5_digest
        def fn(batch: pa.Table) -> pa.Table:
            return dedup.add_md5_digest(batch, text_col=col, out_col=out) \
                .drop_columns([col])
        return fn

    d = _pages_dir_for(sf_dir)
    golden_path = os.path.join(d, "golden.parquet")
    extracted = extract_pipeline(
        read_pages(os.path.join(d, "pages.parquet"))) \
        .select_columns(["url", "extracted_text"]) \
        .map_batches(dig("extracted_text", "ext_digest"),
                     batch_format="pyarrow")
    try:
        take_broadcast = should_broadcast(golden_path, broadcast_cap_rows)
    except OSError:
        # sharded-directory golden (no single footer) → shuffle route
        take_broadcast = False
    if take_broadcast:
        gref = _golden_digests_task.remote(golden_path)

        def probe_golden(batch: pa.Table) -> pa.Table:
            probe = pa.table({"url": batch["url"],
                              "ext_digest": batch["ext_digest"]})
            return probe.join(ray.get(gref), keys=["url"],
                              join_type="inner")

        joined = extracted.map_batches(probe_golden, batch_format="pyarrow")
    else:
        golden = reads.read_small_aware(
            golden_path,
            columns=["url", "golden_text", "golden_exact", "payload_kind"]) \
            .map_batches(dig("golden_text", "gold_digest"),
                         batch_format="pyarrow")
        joined = hash_join(extracted, golden, "url", "url", how="inner",
                           n_coarse=_docs_coarse_hint(sf_dir, 2))

    def flags(batch: pa.Table) -> pa.Table:
        exact = pc.fill_null(batch["golden_exact"], False)
        match = pc.and_kleene(
            exact, pc.equal(pc.fill_null(batch["ext_digest"], ""),
                            pc.fill_null(batch["gold_digest"], "")))
        t = pa.table({
            "payload_kind": batch["payload_kind"],
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "guaranteed": pc.cast(exact, pa.int64()),
            "matched": pc.cast(pc.fill_null(match, False), pa.int64())})
        g = t.group_by("payload_kind").aggregate(
            [("one", "sum"), ("guaranteed", "sum"), ("matched", "sum")])
        return pa.table({"payload_kind": g["payload_kind"],
                         "n_rows": g["one_sum"],
                         "n_guaranteed": g["guaranteed_sum"],
                         "n_byte_exact": g["matched_sum"]})

    return (joined.map_batches(flags, batch_format="pyarrow")
            .groupby("payload_kind")
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("n_guaranteed", alias_name="n_guaranteed"),
                       Sum("n_byte_exact", alias_name="n_byte_exact"))
            .sort("payload_kind"))


def compressibility_docs(sf_dir: str):
    """Per-doc zlib compression ratio over documents (repetitiveness
    gate signal; not SQL-expressible — differentially tested)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_analysis.compressibility, batch_format="pyarrow") \
        .sort("doc_id")


def training_shards_manifest(sf_dir: str):
    """Sharded training-data export end to end: documents → 16
    deterministic md5-hash shards under /tmp, one atomic parquet +
    lineage-manifest row each (state/manifest machinery), returning the
    manifest (shard_id, row_count, content_digest). A fresh export each
    call (scratch dir wiped) so the digests pin byte-determinism of the
    whole write path; resume-after-preemption is exercised separately in
    tests/test_training_export.py."""
    import shutil

    from ..state import manifest as mstate

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    # per-process dir: concurrent sessions (bench + oracle runner) must
    # not rmtree each other mid-export; digests are content-derived so
    # determinism is unaffected
    base = "/tmp/mobile_ocr_training_shards"
    out_dir = f"{base}/n{n_docs}_p{os.getpid()}"
    # reap scratch dirs left by exited processes (per-PID isolation keeps
    # concurrent runs safe; dead owners' dirs would otherwise accumulate)
    if os.path.isdir(base):
        for d in os.listdir(base):
            pid = d.rsplit("_p", 1)[-1]
            if pid.isdigit() and int(pid) != os.getpid() \
                    and not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    mstate.export_training_shards(_docs(sf_dir, ["doc_id", "text"]),
                                  out_dir, n_shards=16)
    t = mstate.shard_manifest_table(out_dir)
    return t.select(["shard_id", "row_count", "content_digest"]) \
            .sort_by("shard_id")


def compacted_shards_manifest(sf_dir: str):
    """Small-file compaction end to end (state/manifest
    .compact_partitions): a fresh 16-shard training export under /tmp is
    bin-packed into ~4 compacted files (target = total_bytes/4 + 1, so
    the group structure is scale-free), one Ray task per group, same
    atomic commit + lineage-manifest discipline as the original writer.
    Returns (group_id, n_inputs, first_shard, last_shard, row_count) —
    row-level equality with the uncompacted export, exact resume, and
    the target-bytes packing invariant are pinned in
    tests/test_training_export.py::TestCompaction."""
    import shutil

    from ..state import manifest as mstate

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    base = "/tmp/mobile_ocr_compact"
    root = f"{base}/n{n_docs}_p{os.getpid()}"
    if os.path.isdir(base):
        for d in os.listdir(base):
            pid = d.rsplit("_p", 1)[-1]
            if pid.isdigit() and int(pid) != os.getpid() \
                    and not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    out_dir = os.path.join(root, "export")
    mstate.export_training_shards(_docs(sf_dir, ["doc_id", "text"]),
                                  out_dir, n_shards=16)
    total = int(sum(m["bytes"]
                    for m in mstate._complete_manifests(out_dir)))
    t = mstate.compact_partitions(out_dir, os.path.join(root, "compact"),
                                  target_bytes=total // 4 + 1)
    return t.select(["group_id", "n_inputs", "first_shard", "last_shard",
                     "row_count"]).sort_by("group_id")


def jsonl_export_manifest(sf_dir: str):
    """Compressed-NDJSON training export end to end (the interchange twin
    of training_shards_manifest): documents → 16 md5-hash
    ``shard-N.jsonl.gz`` files under /tmp via state/manifest
    .export_jsonl_shards, returning the lineage manifest. Byte-determinism
    of the gz shards and the read_table_auto ROUND TRIP are pinned in
    tests/test_training_export.py::TestJsonlExport."""
    import shutil

    from ..state import manifest as mstate

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    base = "/tmp/mobile_ocr_jsonl_shards"
    out_dir = f"{base}/n{n_docs}_p{os.getpid()}"
    if os.path.isdir(base):
        for d in os.listdir(base):
            pid = d.rsplit("_p", 1)[-1]
            if pid.isdigit() and int(pid) != os.getpid() \
                    and not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    mstate.export_jsonl_shards(_docs(sf_dir, ["doc_id", "text"]),
                               out_dir, n_shards=16)
    t = mstate.shard_manifest_table(out_dir)
    return t.select(["shard_id", "row_count", "content_digest"]) \
            .sort_by("shard_id")


def embedding_dup_clusters_doubled(sf_dir: str):
    """Connected components over the embedding-cosine near-dup pair graph
    (doubled corpus → every pair is an exact clone at cosine 1.0, so the
    cluster fixpoint has a SQL ground truth: label = min vec_id per
    identical embedding). Composes the sign-LSH pair generator with the
    distributed label-propagation operator — the embedding-side twin of
    exact_dup_clusters_doubled."""
    out = dedup.dup_clusters(_doubled_clone_pairs(sf_dir))
    return out if isinstance(out, pa.Table) else out.sort("src")


def vocab_coverage(sf_dir: str, k: int = 100):
    """Coverage of the top-k word vocabulary: what fraction of all corpus
    word occurrences the k most frequent words account for (the first
    statistic a tokenizer-budget decision reads). Reuses the wordcount
    combiner; one bounded groupby + a driver-side k-row reduce; single
    output row (n_total, n_covered, coverage = float division of exact int
    sums — bit-identical in SQL)."""
    agg = (_docs(sf_dir, ["text"])
           .map_batches(_word_count_partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("n", alias_name="n"))
           .materialize())
    total = int(agg.sum("n") or 0)
    top = agg.sort(["n", "word"], descending=[True, False]).limit(k) \
        .to_pandas()
    covered = int(top["n"].sum())
    return pa.table({
        "n_total": pa.array([total], pa.int64()),
        "n_covered": pa.array([covered], pa.int64()),
        "coverage": pa.array([float(covered) / float(total)
                              if total else 0.0], pa.float64())})


def length_quartile_docs(sf_dir: str):
    """Per-doc length-quartile label (q1..q4) against exact corpus-wide
    n_chars quartiles — the bucketing a curation pipeline uses to
    stratify by length. Thresholds follow DuckDB's quantile_disc rule
    (sorted index ceil(p·n)−1, pinned empirically) computed from a
    distinct-value CDF: per-batch Arrow value-count combiner → one
    bounded groupby (≤ distinct lengths rows, never the corpus) → tiny
    driver reduce; assignment is one vectorized pass. Value-exact SQL
    oracle."""
    docs = _docs(sf_dir, ["doc_id", "n_chars"]).materialize()

    def vc(batch: pa.Table) -> pa.Table:
        g = pa.table({"v": batch["n_chars"],
                      "one": pa.array(np.ones(batch.num_rows, np.int64))}) \
            .group_by("v").aggregate([("one", "sum")])
        return pa.table({"v": g["v"], "n": g["one_sum"]})

    cdf = (docs.map_batches(vc, batch_format="pyarrow")
           .groupby("v").sum("n").to_pandas().sort_values("v"))
    vals = cdf["v"].to_numpy(np.int64)
    cnts = cdf["sum(n)"].to_numpy(np.int64)
    n = int(cnts.sum())
    cum = np.cumsum(cnts)

    def q_disc(p: float) -> int:
        target = int(np.ceil(p * n)) - 1          # 0-indexed rank
        return int(vals[np.searchsorted(cum, target + 1)])

    q1, q2, q3 = (q_disc(p) for p in (0.25, 0.5, 0.75))

    def label(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        lab = np.where(v <= q1, "q1",
                       np.where(v <= q2, "q2",
                                np.where(v <= q3, "q3", "q4")))
        return pa.table({"doc_id": batch["doc_id"],
                         "n_chars": batch["n_chars"],
                         "quartile": pa.array(lab, pa.string())})

    return docs.map_batches(label, batch_format="pyarrow").sort("doc_id")


def embedding_dedup_kept_doubled(sf_dir: str):
    """SemDeDup-style semantic-dedup KEEP over the doubled embeddings
    corpus: embedding-cosine near-pairs (≥ 0.999999 — among gaussian
    vectors only the exact clones qualify, the same ground-truth trick as
    ``embedding_pairs_doubled``) → connected components → one
    representative (min vec_id) per cluster plus every unclustered
    vector. The embedding-side member of the near-dedup-keep family
    (minhash / simhash twins above) — value-exact SQL oracle: kept =
    min(vec_id) per identical embedding list. Returns (vec_id)."""
    from ..stages.joins import hash_join

    nc = _coarse_hint_for(os.path.join(sf_dir, "embeddings.parquet"), 2)
    ids = _doubled_embeddings(sf_dir).select_columns(["vec_id"])
    clusters = dedup.dup_clusters(_doubled_clone_pairs(sf_dir)).materialize()
    if clusters.count() == 0:
        return ids.sort("vec_id")
    joined = hash_join(ids, clusters, "vec_id", "src", how="left",
                       n_coarse=nc)

    def keep(batch: pa.Table) -> pa.Table:
        lbl = batch["label"]
        mask = pc.or_kleene(pc.is_null(lbl), pc.equal(lbl, batch["vec_id"]))
        return batch.filter(pc.fill_null(mask, False)) \
            .select(["vec_id"])

    return joined.map_batches(keep, batch_format="pyarrow").sort("vec_id")


def near_dedup_kept_simhash_doubled(sf_dir: str):
    """The simhash-side twin of near_dedup_kept_doubled: SimHash banded
    near-pairs → connected components → one representative (min doc_id)
    per cluster plus every unclustered doc — same anti-filter join, a
    different candidate generator. Exercises family composability."""
    from ..stages.joins import hash_join

    docs = _doubled_docs(sf_dir)
    nc = _docs_coarse_hint(sf_dir, 2)
    pairs = dedup.simhash_near_pairs(docs, n_coarse=nc)

    def to_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"id_a": batch["id_a"], "id_b": batch["id_b"]})

    clusters = dedup.dup_clusters(
        pairs.map_batches(to_ids, batch_format="pyarrow")).materialize()
    if clusters.count() == 0:
        return docs.sort("doc_id")
    joined = hash_join(docs, clusters, "doc_id", "src", how="left",
                       n_coarse=nc)

    def keep(batch: pa.Table) -> pa.Table:
        lbl = batch["label"]
        mask = pc.or_kleene(pc.is_null(lbl), pc.equal(lbl, batch["doc_id"]))
        return batch.filter(pc.fill_null(mask, False)).select(
            ["doc_id", "text"])

    return joined.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def doc_cluster_labels(sf_dir: str):
    """End-to-end text clustering with zero external models: documents →
    feature-hashed bag-of-words vectors (hashing trick, 128-dim) →
    full-corpus Lloyd k-means (k=8). The whole chain is deterministic, so
    labels are a pure function of the corpus."""
    vecs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        text_analysis.hashed_doc_vectors, batch_format="pyarrow")
    out = similarity.kmeans_labels(vecs, k=8, n_iter=5)
    return out if isinstance(out, pa.Table) else out.sort("vec_id")


def nb_source_predictions(sf_dir: str):
    """Self-train/self-predict Naive Bayes over documents: fit P(word |
    source) with one distributed count aggregation, broadcast the bounded
    model (top-2000-word vocab) into a vectorized predict pass, emit
    (doc_id, source, pred, correct). The end-to-end 'train a filter model
    on the corpus' loop (fastText-style quality/source classifiers) with
    zero external dependencies."""
    docs = _docs(sf_dir, ["doc_id", "text", "source"]).materialize()
    model = text_analysis.nb_fit(docs)
    mref = ray.put(model)

    class Predict:
        def __init__(self, ref):
            self.model = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = text_analysis.nb_predict(batch, self.model)
            # fit maps null labels to '' — compare against the same
            correct = pc.equal(out["pred"],
                               pc.fill_null(pc.cast(batch["source"],
                                                    pa.string()), ""))
            return pa.table({
                "doc_id": out["doc_id"],
                "source": batch["source"],
                "pred": out["pred"],
                "correct": pc.fill_null(correct, False)})

    return docs.map_batches(Predict, fn_constructor_kwargs={"ref": mref},
                            batch_format="pyarrow", concurrency=4,
                            num_cpus=0.5).sort("doc_id")


KWIC_TERM = "data"
KWIC_CTX = 40


def kwic_snippets(sf_dir: str, term: str = KWIC_TERM, ctx: int = KWIC_CTX):
    """Keyword-in-context snippets: for every doc containing ``term``
    (case-insensitive, first occurrence), a ±ctx-char window around the
    match — the search-result/debug view over an extracted corpus. One
    vectorized find + slice per batch, no shuffle; value-exact SQL oracle
    (DuckDB position/substring agree with the codeunit slice on this
    ASCII corpus). Returns (doc_id, pos — 1-based like SQL, snippet)."""

    def kernel(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch["text"], "")
        pos = pc.find_substring(pc.utf8_lower(txt), term.lower())
        mask = pc.greater_equal(pos, 0)
        t = batch.filter(mask)
        p = pos.to_numpy(zero_copy_only=False)
        p = p[mask.to_numpy(zero_copy_only=False)]
        starts = np.maximum(0, p - ctx)
        width = 2 * ctx + len(term)
        # per-row offsets vary, so the scalar-offset Arrow slice kernel
        # doesn't apply; plain code-point slicing matches DuckDB
        # substring exactly and is one pass
        texts = pc.fill_null(t["text"], "").to_pylist()
        snips = [x[s:s + width] for x, s in zip(texts, starts)]
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": pa.array((p + 1).astype(np.int64)),
            "snippet": pa.array(snips, pa.string())})

    out = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(kernel, batch_format="pyarrow")
    out = dedup.nonempty_or_typed_table(out, {
        "doc_id": pa.int64(), "pos": pa.int64(), "snippet": pa.string()})
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def cross_corpus_overlap(sf_dir: str):
    """Documents × extracted-web-text window overlap: run the flagship
    extraction over the crawl corpus, then measure per-document 13-token
    window overlap against the extracted text — the cross-dataset eval-
    decontamination check (GPT-3 App. C at 13-gram granularity), with the
    reference side produced by the engine's own extraction pipeline."""
    d = _pages_dir_for(sf_dir)
    extracted = extract_pipeline(
        read_pages(os.path.join(d, "pages.parquet"))) \
        .select_columns(["extracted_text"])
    nc = _docs_coarse_hint(sf_dir, 2)
    out = dedup.cross_window_overlap(
        _docs(sf_dir, ["doc_id", "text"]), extracted,
        ref_text_col="extracted_text", n_coarse=nc, n_coarse_docs=nc)
    return out if isinstance(out, pa.Table) else out.sort("doc_id")


def langid_confusion(sf_dir: str):
    """Language-ID confusion matrix: predicted lang (n-gram heuristic) vs
    the table's lang label, with counts — the eval view of the lang-ID
    operator. In-batch combiner → one tiny groupby; value-exact oracle
    reuses the langid SQL expression."""

    def partial(batch: pa.Table) -> pa.Table:
        pred = text_analysis.lang_id(batch)
        t = pa.table({
            "lang": pc.fill_null(pc.cast(batch["lang"], pa.string()), ""),
            "lang_pred": pred["lang_pred"],
            "one": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["lang", "lang_pred"]).aggregate([("one", "sum")])
        return pa.table({"lang": g["lang"], "lang_pred": g["lang_pred"],
                         "n": g["one_sum"]})

    return (_docs(sf_dir, ["text", "lang"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "lang_pred"]).sum("n")
            .map_batches(lambda b: pa.table({
                "lang": b["lang"], "lang_pred": b["lang_pred"],
                "n": pc.cast(b["sum(n)"], pa.int64())}),
                batch_format="pyarrow")
            .sort(["lang", "lang_pred"]))


PAIR_BODY_CHARS = 200
PAIR_BUCKET_ROWS = 2_000   # target rows per negative-sampling bucket


def _pair_bucket_count(n_rows: int) -> int:
    """Negative-sampling bucket count for ``contrastive_pairs``: sized so
    each bucket's pandas group stays ~PAIR_BUCKET_ROWS rows REGARDLESS of
    corpus size. Deliberately NOT capped at dedup.N_COARSE — these
    buckets become whole in-memory map_groups frames, so a cap would make
    group size corpus/cap (the round-2 scale-killer: a fixed %64 put
    corpus/64 rows in one pandas frame)."""
    return max(1, n_rows // PAIR_BUCKET_ROWS + 1)


def contrastive_pairs(joined, n_buckets: int,
                      text_col: str = "extracted_text"):
    """(url, title, text) rows → (url, title, body, neg_body) contrastive
    training pairs: the positive is the row's own body, the negative is
    the PREVIOUS row's body within the row's url-hash bucket (np.roll over
    url-sorted bucket rows — the standard in-batch-negative construction,
    made deterministic by keying bucket membership on crc32(url) %
    n_buckets instead of physical batch boundaries). Bucket membership is
    a pure function of (url, n_buckets) and rows are url-sorted inside the
    bucket, so the output is partition-invariant (pinned by
    tests/test_pipeline.py::TestTitleBodyPairs). Single-row buckets (no
    true negative available) drop rather than emit neg == pos. Bodies
    truncate to PAIR_BODY_CHARS."""

    def project(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["title"], "")
        b = pc.utf8_slice_codeunits(
            pc.fill_null(batch[text_col], ""), 0, PAIR_BODY_CHARS)
        keep = pc.and_(pc.greater(pc.utf8_length(t), 0),
                       pc.greater(pc.utf8_length(b), 0))
        f = pa.table({"url": batch["url"], "title": t, "body": b}) \
            .filter(keep)
        return f.append_column(
            "negc", pa.array(str_hash.str_coarse(f["url"], n_buckets)))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("url", kind="mergesort")
        if len(d) < 2:
            return pd.DataFrame({"url": pd.array([], "string"),
                                 "title": pd.array([], "string"),
                                 "body": pd.array([], "string"),
                                 "neg_body": pd.array([], "string")})
        body = d["body"].to_numpy(object)
        neg = np.roll(body, 1)
        # degenerate pairs drop: adjacent url-sorted rows can share the
        # same truncated body (duplicate boilerplate openings) and a
        # neg == pos row is a broken training example, not a pair
        keep = neg != body
        d = d[keep]
        return pd.DataFrame({"url": d["url"], "title": d["title"],
                             "body": d["body"], "neg_body": neg[keep]})

    # no trailing global sort: the pair SET is deterministic (bucket
    # membership + url-sorted rows inside each bucket), the driver check
    # is order-insensitive, and a second all-to-all barrier just to
    # prettify row order costs more than the whole pair construction at
    # the small-block tail (measured: 64-block sort ≈ 2.7 s of pure
    # per-block fixed cost at sf0.1)
    return (joined.map_batches(project, batch_format="pyarrow")
            .groupby("negc").map_groups(pairs, batch_format="pandas"))


def _meta_body_kernel(batch: pa.Table) -> pa.Table:
    """Fused (title, extracted body) in ONE pass over the html batch:
    both the metadata kernel and the extraction kernel are row-wise over
    the same payloads, so running them side by side per batch removes the
    second corpus read AND the url hash-join barrier that composing the
    two pipelines costs (measured: title_body_pairs 10.8 s → the
    extraction path + two small exchanges at sf0.1). Identical values to
    the composed form — title_body_pairs' test checks title ≡ the
    page_metadata query per url."""
    from ..pipelines.extract import _worker_extractor

    meta = _page_meta_kernel(batch)
    ext = _worker_extractor("medium", True, False, False)(batch)  # flagship params
    return pa.table({"url": batch["url"],
                     "title": meta["title"],
                     "extracted_text": ext["extracted_text"]})


def title_body_pairs(sf_dir: str):
    """Retrieval-style training pairs from the crawl: per page, (title →
    body) as the positive and a url-hash-bucket neighbor's body as the
    negative (see ``contrastive_pairs``). Title and body come from one
    fused kernel pass over the pages (``_meta_body_kernel``); pages with
    an empty title or body drop out. Bucket count adapts to the corpus
    (~2k rows per bucket at any scale). Returns
    (url, title, body, neg_body)."""
    d = _pages_dir_for(sf_dir)
    n_pages = _corpus_rows(d)
    # text + lang ride along: the direct-text cheap path (M5) and lang
    # routing must behave exactly as in the flagship extraction
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html", "text", "lang"])
    joined = pages.map_batches(_meta_body_kernel, batch_format="pyarrow")
    return contrastive_pairs(joined, _pair_bucket_count(n_pages))


def target_affinity_docs(sf_dir: str, target_source: str = "src0"):
    """DSIR-style data selection signal (Xie et al. 2023, simplified to an
    exact-integer affinity ratio): fit hashed-unigram count vectors for
    target (source == target_source) vs raw (everything else) over the
    documents table — a fixed 2 × 4096 int64 table regardless of corpus
    size — then score every doc with
    affinity = target_mass / max(raw_mass, 1). Two streaming passes, one
    bounded groupby, no corpus-scale shuffle; the count vectors ride into
    the score tasks as a 64 KB constant. Value-exact SQL oracle via the
    shared md5-hash32 bucket rule."""
    docs = _docs(sf_dir, ["doc_id", "text", "source"])
    tgt, raw = text_analysis.affinity_fit(docs, target_source)
    scored = text_analysis.affinity_score(
        _docs(sf_dir, ["doc_id", "text"]), tgt, raw)
    return scored.sort("doc_id")


def dsir_resampled_docs(sf_dir: str, target_source: str = "src0"):
    """DSIR importance RESAMPLING (the selection step after the scoring
    step, `stages/text_analysis.affinity_resample`): accept a doc iff
    uniform(doc) < affinity, with uniform = hash32(doc_id) / 2^32 (the
    samplers' md5 membership rule) — evaluated in EXACT integer
    arithmetic (hash32 * max(raw_mass,1) < 2^32 * target_mass, Python
    bigints / SQL HUGEINT), so the kept set is bit-stable across
    engines. Target-heavy docs (affinity ≥ 1) are always kept;
    zero-target docs never. Composes the two already-value-exact
    primitives (affinity scorer + hash sampler) in one extra streaming
    filter BEFORE the presentation sort — the filter adds no shuffle and
    the single trailing sort runs over the (smaller) kept set only."""
    docs = _docs(sf_dir, ["doc_id", "text", "source"])
    tgt, raw = text_analysis.affinity_fit(docs, target_source)
    scored = text_analysis.affinity_score(
        _docs(sf_dir, ["doc_id", "text"]), tgt, raw)
    return text_analysis.affinity_resample(scored).sort("doc_id")


def source_unigram_kl_docs(sf_dir: str):
    """Per-source lexical drift vs the corpus mixture
    (stages/text_analysis.source_unigram_kl): KL divergence of each
    source's hashed-4096-bucket unigram distribution against the whole
    documents table, exact-int micro-nat quantization per bucket term so
    the sum is order-independent and the SQL oracle reproduces it
    bit-for-bit."""
    import ray.data

    t = text_analysis.source_unigram_kl(
        _docs(sf_dir, ["text", "source"]))
    return ray.data.from_arrow(t)


def zipf_by_source(sf_dir: str):
    """Per-source Zipf rank–frequency slope + vocabulary/hapax stats
    (stages/text_analysis.zipf_fit_by_source): vocab-bounded combiner →
    one groupby → driver reduce; slope is one float division of exact
    bigint micro-unit sums (value-exact in SQL via HUGEINT)."""
    import ray.data

    t = text_analysis.zipf_fit_by_source(
        _docs(sf_dir, ["text", "source"]))
    return ray.data.from_arrow(t)


def source_jsd_matrix_docs(sf_dir: str):
    """Pairwise Jensen–Shannon divergence between source slices
    (stages/text_analysis.source_jsd_matrix): symmetric bounded drift
    over the shared hashed-4096-bucket unigram distributions, per-pair
    micro-nat int sums so the SQL oracle reproduces it bit-for-bit."""
    import ray.data

    t = text_analysis.source_jsd_matrix(
        _docs(sf_dir, ["text", "source"]))
    return ray.data.from_arrow(t)


def inverted_index_docs(sf_dir: str, k: int = 100):
    """Inverted-index build over the documents table: posting rows
    (word, df, doc_id) for the k highest-df terms
    (stages/text_analysis.inverted_index_topdf: per-batch distinct-doc df
    combiner → vocab-bounded groupby → partial-top-k term selection →
    broadcast term set → posting pass proportional to the answer)."""
    return text_analysis.inverted_index_topdf(
        _docs(sf_dir, ["doc_id", "text"]), k=k)


def c4_clean_docs(sf_dir: str):
    """C4 cleaning rules (terminal-punctuation / 5-word / javascript line
    filters + lorem-ipsum / brace / <3-kept-lines document quarantine;
    stages/text_analysis.c4_clean).

    The documents table is single-line word soup (no newlines, no
    terminal punctuation), so the query first BUILDS a deterministic
    multi-line construction — the pii_scrub / crawl_diff synthesis
    convention, reproduced verbatim in SQL: words grouped into 8-word
    lines, '.' appended when (doc_id + line_no) % 3 != 2, and a marker
    line grafted by doc_id % 16 (0 → 'lorem ipsum', 1 → '{',
    2 → a javascript line) so every status branch occurs in the corpus.
    The construction rides inside the same map_batches as the vectorized
    kernel — one streaming pass, no shuffle; dropped docs surface as
    status rows per the S2 quarantine convention."""
    import re as _re

    ws_re = _re.compile(r"\S+")

    def build_and_clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        txts = batch["text"].to_pylist()
        out = []
        for i, t in zip(ids, txts):
            ws = ws_re.findall(t or "")
            n_l = (len(ws) + 7) // 8
            lines = [" ".join(ws[j * 8:j * 8 + 8])
                     + ("." if (i + j + 1) % 3 != 2 else "")
                     for j in range(n_l)]
            g = i % 16
            if g == 0:
                lines.append("lorem ipsum")
            elif g == 1:
                lines.append("{")
            elif g == 2:
                lines.append("please enable javascript to continue here.")
            out.append("\n".join(lines))
        built = pa.table({"doc_id": batch["doc_id"],
                          "text": pa.array(out, pa.string())})
        return text_analysis.c4_clean(built)

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(build_and_clean, batch_format="pyarrow")
            .sort("doc_id"))


def quality_dedup_kept_doubled(sf_dir: str):
    """Quality-aware dedup keep (stages/dedup.canonical_quality_keep):
    per canonical-form cluster, keep the highest-quality MEMBER — the
    representative-choice policy web pipelines use instead of min-id.

    The documents table is punctuation-free word soup, so the query
    grafts deterministic formatting variants (the c4_clean / pii_scrub
    construction convention, reproduced verbatim in SQL): every doc gets
    a doc_id%3 punctuation suffix, and a +DOUBLE_OFFSET twin that is
    either punct-soup-degraded (even ids → lower quality) or
    punct-stripped (odd ids → higher quality). Originals and twins
    share a canonical form by construction, so every cluster forces a
    real quality comparison and winners land on BOTH sides."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    soup = " " + "!?;" * 12

    def construct(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        t = pc.fill_null(batch["text"], "")
        suffix = np.select([ids % 3 == 0, ids % 3 == 1],
                           [" !!", ""], default=" ;;;;").astype(object)
        orig = pc.binary_join_element_wise(
            t, pa.array(suffix, pa.string()), "")
        degraded = pc.binary_join_element_wise(
            orig, pa.scalar(soup, pa.string()), "")
        stripped = pc.replace_substring_regex(orig, r"[^\w\s]", "")
        twin = np.where(ids % 2 == 0,
                        degraded.to_numpy(zero_copy_only=False),
                        stripped.to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([ids, ids + DOUBLE_OFFSET]), pa.int64()),
            "text": pa.array(
                np.concatenate([orig.to_numpy(zero_copy_only=False),
                                twin]).astype(object), pa.string())})

    kept = dedup.canonical_quality_keep(
        docs.map_batches(construct, batch_format="pyarrow"),
        n_coarse=_docs_coarse_hint(sf_dir, mult=2))

    def finalize(b: pa.Table) -> pa.Table:
        src = pc.if_else(
            pc.greater_equal(b["doc_id"],
                             pa.scalar(DOUBLE_OFFSET, pa.int64())),
            pa.scalar("twin"), pa.scalar("original"))
        return pa.table({"digest": b["digest"], "doc_id": b["doc_id"],
                         "source": src,
                         "quality_score": b["quality_score"]})

    return kept.map_batches(finalize, batch_format="pyarrow").sort("digest")


def encoding_qc_docs(sf_dir: str):
    """Encoding-artifact QC (stages/text_analysis.encoding_qc) — the
    decode-sanity gate before training. The documents table is clean
    ASCII soup, so the query grafts each artifact class deterministically
    by doc_id % 8 (the c4_clean construction convention, reproduced
    verbatim in SQL): 0 → mojibake 'Ã©' sequences, 1 → curly-quote
    mojibake, 2 → a U+FFFD replacement char, 3 → a BEL control char,
    else untouched — so every status branch occurs and 'clean' dominates.
    One streaming pass, no shuffle."""
    markers = {0: " cafÃ© Ã©tÃ©", 1: " itâ€™s â€œq",
               2: " a\N{REPLACEMENT CHARACTER}b", 3: " x\x07y"}

    def build_and_qc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        t = pc.fill_null(batch["text"], "")
        suffix = np.select(
            [ids % 8 == k for k in markers],
            [np.full(len(ids), m, dtype=object) for m in markers.values()],
            default="").astype(object)
        built = pc.binary_join_element_wise(
            t, pa.array(suffix, pa.string()), "")
        return text_analysis.encoding_qc(
            pa.table({"doc_id": batch["doc_id"], "text": built}))

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(build_and_qc, batch_format="pyarrow")
            .sort("doc_id"))


def unigram_entropy_docs(sf_dir: str):
    """RedPajama-v2 rps_doc_unigram_entropy over documents
    (stages/text_analysis.unigram_entropy): per-doc Shannon entropy of
    the word distribution as order-independent micro-nat int sums +
    one exact float division. One streaming pass, no shuffle;
    value-exact in SQL (libm-ln cast-order convention)."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(text_analysis.unigram_entropy,
                         batch_format="pyarrow")
            .sort("doc_id"))


def cdc_chunk_dedup_doubled(sf_dir: str):
    """Content-defined-chunking dedup (stages/dedup.cdc_chunk_dedup)
    over the doubled corpus: each doc gets a +DOUBLE_OFFSET twin with ONE
    word ('zzz') inserted at the front. Because chunk boundaries are
    content-defined, the insertion invalidates only the twin's first
    chunk — every later chunk realigns and dedups against the original,
    the property fixed-width chunking lacks (and the reason incremental
    crawl/chunk stores use CDC). One coarse hash-keyed exchange; chunk
    text never moves."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def construct(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        twin = pc.binary_join_element_wise(
            pa.array(np.full(batch.num_rows, "zzz", object), pa.string()),
            t, " ")
        orig = pa.table({"doc_id": batch["doc_id"], "text": t})
        twins = pa.table({
            "doc_id": pc.add(batch["doc_id"],
                             pa.scalar(DOUBLE_OFFSET, pa.int64())),
            "text": twin})
        return pa.concat_tables([orig, twins]).combine_chunks()

    doubled = docs.map_batches(construct, batch_format="pyarrow")
    return dedup.cdc_chunk_dedup(doubled).sort(["doc_id", "chunk_idx"])


def paragraph_dedup_docs(sf_dir: str):
    """Within-doc duplicate-paragraph removal + Gopher dup-paragraph
    metrics (stages/text_analysis.paragraph_dedup): 6-word paragraph
    construction with a doc_id%3-grafted duplicate, keep-first-occurrence
    rule, exact-int char fractions. One streaming pass, no shuffle."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(text_analysis.paragraph_dedup,
                         batch_format="pyarrow")
            .sort("doc_id"))


def readability_docs(sf_dir: str):
    """Flesch reading-ease / FK grade per document
    (stages/text_analysis.readability): vowel-group syllable heuristic +
    the deterministic k-word sentence rule over the unpunctuated corpus.
    One streaming pass, no shuffle; both scores bit-exact in SQL (float
    expressions of exact ints in identical literal order)."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(text_analysis.readability,
                         batch_format="pyarrow")
            .sort("doc_id"))


def badwords_filtered_docs(sf_dir: str):
    """C4 §2.2 bad-words page gate (stages/text_analysis.badwords_counts):
    per-term whole-word hit counts over the blocklist stand-in, total,
    and the drop-on-any-hit kept flag. One vectorized RE2 pass per term,
    no shuffle; bit-exact vs the same RE2 alternation in SQL."""
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(text_analysis.badwords_counts,
                         batch_format="pyarrow")
            .sort("doc_id"))


def length_zscore_by_lang(sf_dir: str):
    """Per-language z-score of document length (stages/text_analysis
    .group_zscore) — normalize a per-doc signal WITHIN each language so a
    single threshold works across languages with different length
    distributions. Exact-int moments per lang (bounded driver reduce)
    → one vectorized scoring pass; z is a float expression of exact ints
    on both sides."""
    def n_words(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        return pa.table({
            "doc_id": batch["doc_id"], "lang": batch["lang"],
            "n_words": pc.cast(
                pc.count_substring_regex(t, r"\S+"), pa.int64())})

    ds = _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        n_words, batch_format="pyarrow")
    return text_analysis.group_zscore(
        ds, "lang", "n_words", out_col="z_words").sort("doc_id")


def bpe_pair_counts_docs(sf_dir: str, k: int = 100):
    """Round-1 BPE merge candidates over the documents table
    (stages/text_analysis.bpe_pair_counts): top-k adjacent-character
    pair frequencies, the statistic a BPE tokenizer fit maximizes."""
    return text_analysis.bpe_pair_counts(
        _docs(sf_dir, ["doc_id", "text"]), k=k)


def bpe_merges_docs(sf_dir: str, n_merges: int = 8):
    """Iterative BPE tokenizer fit (stages/text_analysis.bpe_merges):
    n_merges rounds of distributed pair count → argmax merge. Rows-only
    at the driver (each round's statistic depends on the previous
    argmax — no SQL form); round-1 equals the value-exact
    bpe_pair_counts_docs argmax by construction, and a pure-python
    differential test pins the full loop."""
    return text_analysis.bpe_merges(
        _docs(sf_dir, ["doc_id", "text"]), n_merges=n_merges)


def bpe_encoded_docs(sf_dir: str, n_merges: int = 8):
    """Fit-then-ENCODE: run the iterative BPE fit on the corpus, then
    apply the merge table to every document
    (stages/text_analysis.bpe_encode) — per-doc BPE token counts, the
    real packing/budget statistic. The fit's merge table (≤ n_merges
    rows) is the only thing that crosses stages; the encode pass
    streams, no shuffle. Rows-only (the fit is iterative — no SQL
    form); a pure-python differential pins segmentations and counts."""
    merges = text_analysis.bpe_merges(
        _docs(sf_dir, ["doc_id", "text"]), n_merges=n_merges)
    return text_analysis.bpe_encode(
        _docs(sf_dir, ["doc_id", "text"]), merges).sort("doc_id")


def pmi_top_bigrams(sf_dir: str, k: int = 100, min_count: int = 5):
    """Collocation mining — top-k adjacent word pairs by pointwise mutual
    information, the classic lexical-association statistic (Church &
    Hanks 1990): pmi = ln(n_xy·N / (n_x·n_y)) over lowered ``\\w+``
    tokens (the shared word-count tokenizer), restricted to pairs with
    n_xy ≥ min_count.

    Scale shape: unigram counts via the shared wordcount combiner
    (materialized ONCE — vocab-scale, two bounded consumers); bigram
    counts via a per-batch distinct-pair combiner → pair-keyed groupby →
    min-count filter; then two co-partitioned `stages/joins.hash_join`s
    decorate each surviving pair with its word counts (vocab-scale
    exchanges, never token-grain); pmi is computed with libm
    ``math.log`` over the EXACT int counts in the same
    cast-multiply-divide order as the SQL (the unigram_logprob
    convention — DuckDB ln ≡ math.log bit-for-bit, numpy's SIMD log is
    not), so the (pmi DESC, w1, w2) top-k finisher orders identically on
    both sides. Returns (w1, w2, n_xy, n_x, n_y, pmi)."""
    return _pmi_from_ds(_docs(sf_dir, ["text"]), k=k, min_count=min_count)


def _pmi_from_ds(docs, k: int, min_count: int,
                 broadcast_cap_rows: "int | None" = None):
    """Dataset-level core of ``pmi_top_bigrams`` (docs needs a ``text``
    column) — split out so tests control partitioning and the
    broadcast-vs-join routing cap directly."""
    import math

    import ray.data

    from ..stages.joins import hash_join
    from ..stages.topk import topk_table

    uni = (docs.map_batches(_word_count_partial, batch_format="pyarrow")
           .groupby("word").aggregate(Sum("n", alias_name="n"))
           .materialize())
    total = int(uni.sum("n") or 0)

    def bigram_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            toks = _WORD_TOKEN_RE.findall((t or "").lower())
            c.update(zip(toks, toks[1:]))
        return pa.table({
            "w1": pa.array([p[0] for p in c], pa.string()),
            "w2": pa.array([p[1] for p in c], pa.string()),
            "n_xy": pa.array(list(c.values()), pa.int64())})

    big = (docs.map_batches(bigram_partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("n_xy", alias_name="n_xy"))
           .filter(expr=f"n_xy >= {int(min_count)}"))

    def _pmi_vals(n_xy, n_x, n_y):
        # float sequence mirrors the SQL expression operation-for-
        # operation: (xy·N as double) / (x as double · y as double)
        return [math.log((float(a) * float(total))
                         / (float(x) * float(y)))
                for a, x, y in zip(n_xy, n_x, n_y)]

    from ..stages.dim_broadcast import DIM_BROADCAST_CAP_ROWS
    cap = DIM_BROADCAST_CAP_ROWS if broadcast_cap_rows is None \
        else broadcast_cap_rows
    if uni.count() <= cap:
        # vocab fits the dim-broadcast cap: ship ONE {word: n} dict into
        # the decorate pass instead of two vocab-keyed hash_join
        # exchanges (the knn_graph/dim_broadcast size-routing
        # convention; identical values either route — pinned by test)
        import ray
        vref = ray.put({r["word"]: int(r["n"]) for r in uni.take_all()})

        def decorate(batch: pa.Table) -> pa.Table:
            v = ray.get(vref)
            n_x = [v[w] for w in batch["w1"].to_pylist()]
            n_y = [v[w] for w in batch["w2"].to_pylist()]
            t = batch.append_column("n_x", pa.array(n_x, pa.int64()))
            t = t.append_column("n_y", pa.array(n_y, pa.int64()))
            return t.append_column("pmi", pa.array(
                _pmi_vals(batch["n_xy"].to_pylist(), n_x, n_y),
                pa.float64()))

        scored = big.map_batches(decorate, batch_format="pyarrow")
    else:
        u1 = uni.map_batches(
            lambda b: b.select(["word", "n"]).rename_columns(
                ["w1", "n_x"]), batch_format="pyarrow")
        u2 = uni.map_batches(
            lambda b: b.select(["word", "n"]).rename_columns(
                ["w2", "n_y"]), batch_format="pyarrow")
        j = hash_join(hash_join(big, u1, "w1", "w1"), u2, "w2", "w2")

        def score(batch: pa.Table) -> pa.Table:
            return batch.append_column("pmi", pa.array(
                _pmi_vals(batch["n_xy"].to_pylist(),
                          batch["n_x"].to_pylist(),
                          batch["n_y"].to_pylist()), pa.float64()))

        scored = j.map_batches(score, batch_format="pyarrow")
    top = topk_table(scored, [("pmi", "descending"), ("w1", "ascending"),
                              ("w2", "ascending")], k)
    cols = ["w1", "w2", "n_xy", "n_x", "n_y", "pmi"]
    if top.num_rows == 0:
        top = pa.table({"w1": pa.array([], pa.string()),
                        "w2": pa.array([], pa.string()),
                        "n_xy": pa.array([], pa.int64()),
                        "n_x": pa.array([], pa.int64()),
                        "n_y": pa.array([], pa.int64()),
                        "pmi": pa.array([], pa.float64())})
    return ray.data.from_arrow(top.select(cols))


def bow_dedup_docs(sf_dir: str):
    """Bag-of-words canonical dedup: docs whose TOKEN MULTISETS match are
    duplicates even when token order differs — the paragraph-shuffle /
    sentence-reorder near-dup class that byte-exact digest dedup misses
    entirely (reference digest semantics: app2.py md5-of-bytes).

    The corpus is single-order word soup, so the query constructs a
    guaranteed-positive workload (the _doubled_docs convention): every
    doc gets a +DOUBLE_OFFSET twin whose tokens are REVERSED — a
    different byte string (exact dedup keeps both) with the identical
    multiset (bag-of-words dedup collapses the pair). bow_hash =
    md5(' '.join(sorted(ascii-\\w tokens of lower(text)))); tokens are
    [0-9a-z_]-only so Python codepoint sort == DuckDB binary collation.

    Scale shape: the canonicalization runs inside the projection
    map_batches, so only (doc_id, 32-char hash) rows reach the single
    groupby — the corpus text never shuffles; the aggregate is Ray
    Data's distributed Min/Count, no map_groups materialization."""
    import hashlib
    import re as _re

    word_re = _re.compile(r"\w+", _re.ASCII)
    docs = _docs(sf_dir, ["doc_id", "text"])

    def project(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        txts = pc.fill_null(batch["text"], "").to_pylist()
        out_id, out_h = [], []
        for i, t in zip(ids, txts):
            toks = word_re.findall(t.lower())
            out_id.append(i)
            out_h.append(hashlib.md5(
                " ".join(sorted(toks)).encode()).hexdigest())
            # the reversed twin goes through the SAME tokenize+sort path
            twin_toks = word_re.findall(" ".join(reversed(toks)).lower())
            out_id.append(i + DOUBLE_OFFSET)
            out_h.append(hashlib.md5(
                " ".join(sorted(twin_toks)).encode()).hexdigest())
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "bow_hash": pa.array(out_h, pa.string())})

    from ray.data.aggregate import Min
    agg = (docs.map_batches(project, batch_format="pyarrow")
           .groupby("bow_hash")
           .aggregate(Min("doc_id", alias_name="doc_id"),
                      Count(alias_name="n_members")))

    def order_cols(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "bow_hash", "n_members"])

    return agg.map_batches(order_cols, batch_format="pyarrow").sort("doc_id")


def fineweb_filter_docs(sf_dir: str):
    """Composite quality gate with FIRST-FAIL reason routing (the
    FineWeb/RefinedWeb production shape: every rejected doc carries the
    single rule that killed it, in a FIXED priority order, so filter-rate
    dashboards and ablations attribute removals unambiguously).

    Rules are the five Gopher flags already oracled individually
    (stages/text_analysis.gopher_flags); this op adds the routing:
    reason = first failed flag in (word_count, mean_word_len, stopwords,
    top_word, dup_2gram) order, 'keep' when all pass — np.select
    first-hit semantics, reproduced in SQL as the identical ordered CASE
    chain over the gopher oracle's metric CTE. Purely per-row, one
    vectorized pass, no shuffle."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def kernel(batch: pa.Table) -> pa.Table:
        g = text_analysis.gopher_flags(batch)
        flags = {n: g[n].to_numpy(zero_copy_only=False)
                 for n in ("flag_word_count", "flag_mean_word_len",
                           "flag_stopwords", "flag_top_word",
                           "flag_dup_2gram", "keep")}
        reason = np.select(
            [~flags["flag_word_count"], ~flags["flag_mean_word_len"],
             ~flags["flag_stopwords"], ~flags["flag_top_word"],
             ~flags["flag_dup_2gram"]],
            ["word_count", "mean_word_len", "stopwords",
             "top_word", "dup_2gram"],
            default="keep")
        return pa.table({
            "doc_id": g["doc_id"],
            "n_words": g["n_words"],
            "reason": pa.array(list(reason), pa.string()),
            "keep": pa.array(flags["keep"])})

    return (docs.map_batches(kernel, batch_format="pyarrow")
            .sort("doc_id"))


# deterministic non-ASCII grafts for script_mix_docs, keyed by doc_id%4;
# reproduced verbatim in the SQL oracle (the c4_clean construction
# convention — the base corpus is ASCII soup, so every script class must
# be grafted to occur at all)
_SCRIPT_GRAFTS = {1: " привет мир", 2: " 你好 世界", 3: " αβγδ εζ"}


def script_mix_docs(sf_dir: str):
    """Unicode-script histogram + dominant script per doc
    (stages/text_analysis.script_mix). Construction: doc_id%4 grafts a
    Cyrillic / CJK / Greek tail (doc_id%4==0 stays pure ASCII) so every
    script class and the 'mixed-script' signal occur in the corpus."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def build_and_count(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        t = pc.fill_null(batch["text"], "")
        tail = np.array([_SCRIPT_GRAFTS.get(int(i) % 4, "")
                         for i in ids], dtype=object)
        built = pc.binary_join_element_wise(
            t, pa.array(tail, pa.string()), "")
        return text_analysis.script_mix(
            pa.table({"doc_id": batch["doc_id"], "text": built}))

    return (docs.map_batches(build_and_count, batch_format="pyarrow")
            .sort("doc_id"))


def embedding_pca_docs(sf_dir: str, d_out: int = 8):
    """Distributed PCA projection of the embeddings table
    (stages/similarity.pca_fit/pca_project): bounded two-pass fit
    (per-block moment partials, 64-way pre-combine, driver eigh of the
    dim×dim covariance) + one streaming projection pass. Rows-only at
    the driver (eigendecomposition has no SQL form — the HLL/zlib
    justification class); correctness is pinned by the differential
    test against numpy PCA on the full matrix."""
    return (similarity.pca_project(_embeddings(sf_dir), d_out=d_out)
            .sort("vec_id"))


def dup_cluster_size_hist(sf_dir: str):
    """Dedup diagnostics rollup: histogram of exact-dup cluster sizes
    (cluster_size → number of clusters, rows covered) — the one-page
    summary a dedup run reports (how much corpus mass sits in what
    duplication depth) before anyone commits to a keep policy.

    Construction: the doubled corpus plus a SECOND twin (+2·OFFSET) for
    every doc_id%10==0 row, so the histogram has two real buckets
    (size 2 and size 3) at every tier instead of a degenerate single
    row. Scale shape: exact_dedup_stats' digest groupby already reduces
    to one row per distinct content; the histogram is a per-batch
    combiner over THOSE rows (size → count inside each batch) + a
    second groupby over ≤ distinct-sizes rows — the exchange after the
    digest pass carries cluster-size integers, never digests."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def triple(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        t = batch.filter(pa.array(ids % 10 == 0))
        return pa.table({
            "doc_id": pc.add(t["doc_id"],
                             pa.scalar(2 * DOUBLE_OFFSET, pa.int64())),
            "text": t["text"]})

    corpus3 = _doubled_docs(sf_dir).union(
        base.map_batches(triple, batch_format="pyarrow"))
    stats = dedup.exact_dedup_stats(corpus3)

    def partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"cluster_size": batch["dup_count"]})
             .group_by("cluster_size")
             .aggregate([("cluster_size", "count")]))
        return pa.table({
            "cluster_size": pc.cast(g["cluster_size"], pa.int64()),
            "n": pc.cast(g["cluster_size_count"], pa.int64())})

    agg = (stats.map_batches(partial, batch_format="pyarrow")
           .groupby("cluster_size")
           .aggregate(Sum("n", alias_name="n_clusters")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_size": batch["cluster_size"],
            "n_clusters": pc.cast(batch["n_clusters"], pa.int64()),
            "n_docs": pc.multiply(
                pc.cast(batch["cluster_size"], pa.int64()),
                pc.cast(batch["n_clusters"], pa.int64()))})

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .sort("cluster_size"))


# host-level text-density gate: hosts whose aggregate text/markup ratio
# falls below this per-mille threshold are blocklisted wholesale (the
# synthetic crawl's host ratios span ~450-950‰, so both branches occur
# at every tier)
HOST_TEXT_PERMILLE_MIN = 680


def host_quality_blocklist(sf_dir: str,
                           thresh_permille: int = HOST_TEXT_PERMILLE_MIN,
                           broadcast_cap_rows: "int | None" = None):
    """Two-level quality gate (the CCNet / UT1-blocklist production
    shape): page-level text-density signal → HOST-level decision →
    page-level action. A host whose aggregate text_chars/n_chars ratio
    is below ``thresh_permille`` is blocklisted wholesale; every page
    carries its host verdict, so downstream stages filter on a boolean
    instead of recomputing density.

    Integer semantics end to end: blocked ⇔ Σtext·1000 < thresh·Σchars
    and host_text_permille = Σtext·1000 // max(Σchars,1) — exact in SQL.
    Scale shape: one signal pass (DOCTYPE-gated, the html_markup_stats
    kernel), per-batch host combiner → one host groupby; the verdict
    table is host-sized, so it rides the dim_broadcast size routing —
    ≤ cap: ray.put dict lookup inside map_batches (the pmi decorate
    convention); past the cap: the shuffle_probe_join hash-join route.
    Both routes are differential-tested on the same input."""
    d = _pages_dir_for(sf_dir)
    pages = read_pages(os.path.join(d, "pages.parquet"),
                       columns=["url", "html"])

    def signal(batch: pa.Table) -> pa.Table:
        html = batch["html"]
        mask = pc.starts_with(pc.fill_null(html, b""),
                              pattern=b"<!DOCTYPE html>")
        t = pa.table({"url": batch["url"], "html": html}).filter(mask)
        doc = pc.cast(t["html"], pa.string())
        n_chars = pc.cast(pc.utf8_length(doc), pa.int64())
        text_chars = pc.cast(pc.utf8_length(
            pc.replace_substring_regex(doc, r"<[^>]*>", "")), pa.int64())
        return pa.table({
            "url": t["url"],
            "host": pc.fill_null(crawl.host_of(t["url"]), ""),
            "text_chars": text_chars, "n_chars": n_chars})

    sig = pages.map_batches(signal, batch_format="pyarrow").materialize()

    def host_partial(batch: pa.Table) -> pa.Table:
        g = (pa.table({"host": batch["host"], "st": batch["text_chars"],
                       "sc": batch["n_chars"]})
             .group_by("host").aggregate([("st", "sum"), ("sc", "sum")]))
        return pa.table({"host": g["host"], "st": g["st_sum"],
                         "sc": g["sc_sum"]})

    hosts = (sig.map_batches(host_partial, batch_format="pyarrow")
             .groupby("host")
             .aggregate(Sum("st", alias_name="st"),
                        Sum("sc", alias_name="sc")))

    thresh = int(thresh_permille)

    def verdict(batch: pa.Table) -> pa.Table:
        st = pc.cast(batch["st"], pa.int64()).to_numpy()
        sc = pc.cast(batch["sc"], pa.int64()).to_numpy()
        permille = st * 1000 // np.maximum(sc, 1)
        blocked = st * 1000 < thresh * sc
        return pa.table({
            "host": batch["host"],
            "host_text_permille": pa.array(permille, pa.int64()),
            "blocked": pa.array(blocked)})

    hv = hosts.map_batches(verdict, batch_format="pyarrow").materialize()

    from ..stages.dim_broadcast import DIM_BROADCAST_CAP_ROWS
    cap = DIM_BROADCAST_CAP_ROWS if broadcast_cap_rows is None \
        else broadcast_cap_rows
    probe = sig.select_columns(["url", "host"])
    if hv.count() <= cap:
        vref = ray.put({r["host"]: (int(r["host_text_permille"]),
                                    bool(r["blocked"]))
                        for r in hv.take_all()})

        def attach(batch: pa.Table) -> pa.Table:
            m = ray.get(vref)
            vals = [m[h] for h in batch["host"].to_pylist()]
            return pa.table({
                "url": batch["url"], "host": batch["host"],
                "host_text_permille": pa.array(
                    [v[0] for v in vals], pa.int64()),
                "blocked": pa.array([v[1] for v in vals])})

        out = probe.map_batches(attach, batch_format="pyarrow")
    else:
        from ..stages.dim_broadcast import shuffle_probe_join
        out = shuffle_probe_join(
            probe, hv, "host", "host",
            ["url", "host", "host_text_permille", "blocked"])
    return out.sort("url")


def fineweb_filter_rates(sf_dir: str):
    """Filter-rate dashboard companion to ``fineweb_filter_docs``: docs
    per first-fail reason + exact integer micro-share of the corpus —
    the per-rule removal attribution FineWeb publishes for every filter
    ablation. One vectorized kernel pass + per-batch reason combiner →
    a ≤6-row global groupby; the denominator is the parquet footer row
    count (metadata-only, no extra pass)."""
    import pyarrow.parquet as _pq

    n_total = _pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    docs = _docs(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        g = text_analysis.gopher_flags(batch)
        flags = {n: g[n].to_numpy(zero_copy_only=False)
                 for n in ("flag_word_count", "flag_mean_word_len",
                           "flag_stopwords", "flag_top_word",
                           "flag_dup_2gram")}
        reason = np.select(
            [~flags["flag_word_count"], ~flags["flag_mean_word_len"],
             ~flags["flag_stopwords"], ~flags["flag_top_word"],
             ~flags["flag_dup_2gram"]],
            ["word_count", "mean_word_len", "stopwords",
             "top_word", "dup_2gram"],
            default="keep")
        u, c = np.unique(reason, return_counts=True)
        return pa.table({"reason": pa.array(list(u), pa.string()),
                         "n": pa.array(c, pa.int64())})

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("reason").aggregate(Sum("n", alias_name="n_docs")))

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["n_docs"], pa.int64()).to_numpy()
        return pa.table({
            "reason": batch["reason"],
            "n_docs": pa.array(n, pa.int64()),
            "share_micro": pa.array(
                n * 1_000_000 // max(n_total, 1), pa.int64())})

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .sort("reason"))


def lang_ttr_corr(sf_dir: str):
    """Per-language Pearson correlation between document token count and
    DISTINCT-token count — the type-token-ratio (lexical diversity)
    drift diagnostic run per language slice before mixing corpora (a
    slice whose diversity stops growing with length is template/spam
    heavy). Exact-integer moment sums (n, Σx, Σy, Σxy, Σx², Σy²) flow
    through a per-batch lang combiner → one ≤n_langs groupby; the
    correlation is ONE fixed float expression over those ints, mirrored
    operation-for-operation in SQL (num and both variance terms formed
    in integers, each cast to double once) — value-exact. Token counts
    reuse the shared word_frames/repetition_counts kernels (the gopher
    tokenizer), so engines cannot drift. Int64 moment sums are exact at
    the test tiers; a 100-TB run would lift the Σx² lanes to the int128
    partial convention."""
    import math

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        w, p = text_analysis.word_frames(t)
        x, _, y, _, _ = text_analysis.repetition_counts(
            w, p, batch.num_rows)
        df = pd.DataFrame({"lang": batch["lang"].to_pylist(),
                           "x": np.asarray(x, np.int64),
                           "y": np.asarray(y, np.int64)})
        df["xy"] = df.x * df.y
        df["xx"] = df.x * df.x
        df["yy"] = df.y * df.y
        g = df.groupby("lang", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"), syy=("yy", "sum"))
        g = g.reset_index()
        return pa.table({c: pa.array(g[c].to_numpy(), pa.int64())
                         if c != "lang" else pa.array(g[c], pa.string())
                         for c in ("lang", "n", "sx", "sy", "sxy",
                                   "sxx", "syy")})

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy")))

    def finalize(batch: pa.Table) -> pa.Table:
        d = batch.to_pydict()
        corr = []
        for i in range(len(d["lang"])):
            n, sx, sy = d["n"][i], d["sx"][i], d["sy"][i]
            sxy, sxx, syy = d["sxy"][i], d["sxx"][i], d["syy"][i]
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            if vx > 0 and vy > 0:
                corr.append(float(n * sxy - sx * sy)
                            / (math.sqrt(float(vx)) * math.sqrt(float(vy))))
            else:
                corr.append(0.0)
        return pa.table({
            "lang": pa.array(d["lang"], pa.string()),
            "n_docs": pa.array(d["n"], pa.int64()),
            "sum_words": pa.array(d["sx"], pa.int64()),
            "sum_distinct": pa.array(d["sy"], pa.int64()),
            "ttr_corr": pa.array(corr, pa.float64())})

    return agg.map_batches(finalize, batch_format="pyarrow").sort("lang")


def host_split_pages(sf_dir: str):
    """Leakage-safe corpus split at HOST granularity: every page of a host
    lands in the same train/val/test bucket (90/5/5 by hash32(host) — the
    train_val_test_split rule with the host string as the key). Splitting
    a web corpus at page granularity leaks template and near-duplicate
    content from the same site across the eval boundary (the C4
    train/test contamination finding, Dodge et al. 2021 §5); holding out
    whole domains is the standard mitigation. Membership is a pure
    function of the host string — stable across runs, partitionings and
    cluster sizes, SQL-reproducible — so the operator is one streaming
    map_batches over the url column only (html never reads), no shuffle.
    Returns (url, host, split) sorted by url; schemeless/malformed urls
    (host None) group under '' and split together like any host."""
    lo = (1 << 32) * SPLIT_PCT[0] // 100
    hi = (1 << 32) * SPLIT_PCT[1] // 100
    d = _pages_dir_for(sf_dir)
    ds = read_pages(os.path.join(d, "pages.parquet"), columns=["url"])

    def assign(batch: pa.Table) -> pa.Table:
        hosts = ["" if h is None else h
                 for h in crawl.host_of(batch["url"]).to_pylist()]
        h = np.array([_hash32(s) for s in hosts], np.uint64)
        split = np.where(h < lo, "train", np.where(h < hi, "val", "test"))
        return pa.table({"url": batch["url"],
                         "host": pa.array(hosts, pa.string()),
                         "split": pa.array(split, pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow").sort("url")


REDIRECT_TERM_MOD = 4  # terminal when hash32(doc_id) % 4 == 0 (or id 0)
REDIRECT_SKIP_MOD = 3  # parent = doc_id - 1 - hash32(doc_id) % 3


def redirect_chains(sf_dir: str):
    """Redirect-chain canonicalization — the URL-graph cleanup every crawl
    pipeline runs before dedup (captures of ``a → b → c`` redirect chains
    must all credit the terminal url, or per-url dedup/stats split across
    chain members). The corpus has no real redirects, so the chain table
    is GRAFTED deterministically over doc_id (both sides derive it from
    the shared sampling hash): doc i redirects to
    ``max(i - 1 - hash32(i) % 3, 0)`` unless terminal
    (``hash32(i) % 4 == 0`` or ``i == 0``) — termination is geometric per
    hop, so chain lengths reach ~log_{4/3}(n) ≈ 25+ at corpus scale and
    genuinely exercise the doubling. Resolution is
    ``crawl.resolve_pointer_chains`` pointer doubling: ⌈log2 L⌉
    co-partitioned self-join rounds over (id, ptr, hops) rows — never a
    sequential walk, never a driver-side dict. The SQL oracle walks the
    same grafted parent table with a recursive CTE, so the fixpoint is
    value-exact end to end. Returns (doc_id, final_id, n_hops)."""

    def ptr_table(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.array([_hash32(int(i)) for i in ids], np.uint64)
        term = (ids == 0) | (h % REDIRECT_TERM_MOD == 0)
        parent = np.maximum(ids - 1 - (h % REDIRECT_SKIP_MOD).astype(np.int64), 0)
        return pa.table({
            "id": pa.array(ids),
            "ptr": pa.array(np.where(term, ids, parent)),
            "hops": pa.array(np.where(term, 0, 1).astype(np.int64))})

    ptrs = _docs(sf_dir, ["doc_id"]).map_batches(ptr_table,
                                                 batch_format="pyarrow")
    res = crawl.resolve_pointer_chains(
        ptrs, n_coarse=_docs_coarse_hint(sf_dir))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["id"], "final_id": batch["final_id"],
                         "n_hops": batch["n_hops"]})

    return res.map_batches(rename, batch_format="pyarrow").sort("doc_id")


SUPERSET_FILLER = " qq0 ww1 ee2 rr3 tt4 yy5"  # appended to every twin


def _superset_docs(sf_dir: str):
    """documents ∪ superset twins (doc_id + DOUBLE_OFFSET, text +
    SUPERSET_FILLER): every twin CONTAINS its base verbatim plus extra
    words — containment(base→twin) = 1.0 by construction while symmetric
    Jaccard sits below 1, the workload the asymmetric operator exists
    for. The filler's interior shingles recur in every twin, so the
    CONT_DF_CAP boilerplate rule provably fires at every tier."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def shift(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.add(batch["doc_id"],
                             pa.scalar(DOUBLE_OFFSET, pa.int64())),
            "text": pc.binary_join_element_wise(
                pc.fill_null(batch["text"], ""), SUPERSET_FILLER, "")})

    return base.union(base.map_batches(shift, batch_format="pyarrow"))


def containment_pairs_doubled(sf_dir: str):
    """Shingle-containment near-dup pairs over the superset-twin corpus —
    see stages/dedup.shingle_containment_pairs for the semantics and the
    two SQL-mirrored rules (DF cap, min size)."""
    return dedup.shingle_containment_pairs(
        _superset_docs(sf_dir),
        n_coarse=_docs_coarse_hint(sf_dir, mult=2)).sort(["id_a", "id_b"])
