"""Null-robustness: every operator family must survive — and stay
value-exact against its SQL oracle on — inputs containing NULL text,
NULL embedding lists, and NULL event values.

At 100 TB a single null row must not abort a job (np.array over a list
containing None raises; rint(NaN).astype(int64) is silent garbage), and
the engine's null semantics must match SQL aggregate semantics (sum/avg/
quantile skip NULLs, count(*) does not). The shipped sf tiers contain no
nulls, so this module builds a null-injected copy of sf0.001 and runs
the engine-vs-DuckDB comparison for the operator families that touch
nullable columns.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"

# one representative per operator family that reads a nullable column
QUERIES = [
    # text: tokenize / digest / score / median-gate / langid / scrub
    "langid_docs", "exact_dedup", "exact_dedup_doubled",
    "quality_median_filtered", "ngram_jaccard_adjacent",
    "decontaminate_docs", "boilerplate_scrubbed_docs", "curated_docs",
    "line_dedup_docs", "packed_sequences", "packed_sequence_texts",
    "gopher_quality_flags",
    "unigram_logprob", "bigram_surprisal", "source_overlap_matrix",
    "heavy_hitter_words", "edit_verified_pairs_doubled",
    "incremental_dedup", "mixed_sample_docs", "normalize_docs",
    "chunk_docs",
    "bloom_decontaminate_docs",
    # embeddings: matrix extraction, ANN, centroids, near-pairs
    "ann_brute_topk", "knn_graph_topk", "label_centroids",
    "embedding_pairs_doubled",
    # event values: cents kernels, windows, quantiles, histograms
    "sessionize_events", "user_moving_avg", "event_value_quantiles",
    "scalable_quantiles", "purchases_after_click", "event_value_stats",
    "value_histogram", "sliding_event_counts",
]

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def null_tier(tmp_path_factory):
    """sf0.001 with NULLs injected: ~6% of document texts, ~8% of
    embedding lists, ~9% of event values."""
    dst = str(tmp_path_factory.mktemp("nulltier"))
    for f in os.listdir(SRC):
        s, d = os.path.join(SRC, f), os.path.join(dst, f)
        (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, d)

    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    m = pa.array(t["doc_id"].to_numpy() % 17 == 0)
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pc.if_else(m, pa.scalar(None, pa.string()), t["text"]))
    pq.write_table(t, os.path.join(dst, "documents.parquet"))

    e = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    em = e["vec_id"].to_numpy() % 13 == 0
    col = e["embedding"].combine_chunks()
    col = pa.array([None if m_ else v
                    for m_, v in zip(em, col.to_pylist())], col.type)
    e = e.set_column(e.schema.get_field_index("embedding"), "embedding", col)
    pq.write_table(e, os.path.join(dst, "embeddings.parquet"))

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    vm = pa.array(ev["event_id"].to_numpy() % 11 == 0)
    ev = ev.set_column(ev.schema.get_field_index("value"), "value",
                       pc.if_else(vm, pa.scalar(None, pa.float64()),
                                  ev["value"]))
    pq.write_table(ev, os.path.join(dst, "events.parquet"))
    return dst


@pytest.fixture(scope="module")
def oracle_con(null_tier):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        p = os.path.join(null_tier, f"{name}.parquet")
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def _to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_null_tier_matches_oracle(ray_session, null_tier, oracle_con, name):
    import __ray_entry__ as entrymod

    ours = _to_pandas(entrymod.queries()[name](null_tier))
    sql = entrymod.oracle_sql().get(name)
    if sql is None:  # rows-only query: surviving the nulls IS the test
        assert len(ours) >= 0
        return
    theirs = oracle_con.sql(sql).df()
    assert sorted(ours.columns) == sorted(theirs.columns)
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)}"
    a, b = _canon(ours), _canon(theirs)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(np.float64), bv.astype(np.float64)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            assert eq.all(), f"{name}.{col}: {(~eq).sum()} diffs"
        else:
            sa = pd.Series(av).fillna("\0")
            sb = pd.Series(bv).fillna("\0")
            assert (sa == sb).all(), \
                f"{name}.{col}: {(sa != sb).sum()} diffs"
