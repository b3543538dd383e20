"""Full-corpus Lloyd k-means (stages/similarity.kmeans_labels)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mobile_ocr_api_ray.stages import similarity


def emb_ds(ids, mat, blocks=1):
    import ray.data
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in mat],
                                        pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def numpy_lloyd(ids, X, k, n_iter):
    order = np.argsort(ids, kind="stable")
    C = X[order[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = (np.sum(X * X, axis=1, keepdims=True) - 2 * X @ C.T
              + np.sum(C * C, axis=1))
        lab = np.argmin(d2, axis=1)
        for c in range(C.shape[0]):
            m = X[lab == c]
            if len(m):
                C[c] = m.mean(axis=0)
    d2 = (np.sum(X * X, axis=1, keepdims=True) - 2 * X @ C.T
          + np.sum(C * C, axis=1))
    lab = np.argmin(d2, axis=1)
    return lab, np.sqrt(np.maximum(d2[np.arange(len(lab)), lab], 0.0))


def run(ds):
    out = similarity.kmeans_labels(ds, k=3, n_iter=4)
    df = out.to_pandas() if not isinstance(out, pa.Table) else out.to_pandas()
    return df.sort_values("vec_id").reset_index(drop=True)


class TestKMeans:
    def test_three_obvious_clusters(self, ray_session):
        rng = np.random.RandomState(0)
        centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        X = np.vstack([c + 0.1 * rng.randn(20, 2) for c in centers])
        ids = np.arange(60)
        df = run(emb_ds(ids, X))
        # all members of one blob share a label; blobs get distinct labels
        labs = [set(df.label[i * 20:(i + 1) * 20]) for i in range(3)]
        assert all(len(s) == 1 for s in labs)
        assert len(set().union(*labs)) == 3
        assert (df.dist < 1.0).all()

    def test_differential_vs_numpy(self, ray_session):
        rng = np.random.RandomState(4)
        X = rng.randn(80, 6)
        ids = np.arange(80)
        df = run(emb_ds(ids, X, blocks=5))
        lab, dist = numpy_lloyd(ids, X, k=3, n_iter=4)
        assert list(df.label) == list(lab)
        assert np.allclose(df.dist, dist, atol=1e-9)

    def test_partition_invariance_allclose(self, ray_session):
        # across block layouts partial sums associate differently →
        # centroids agree to float rounding, not bit-exactly (the
        # docstring's documented contract; 400x8 experiment measured
        # ~1e-16 relative drift)
        rng = np.random.RandomState(9)
        X = rng.randn(50, 4)
        ids = np.arange(50)
        a = run(emb_ds(ids, X, blocks=1))
        b = run(emb_ds(ids, X, blocks=7))
        assert list(a.label) == list(b.label)
        assert np.allclose(a.dist, b.dist, rtol=1e-9)

    def test_same_layout_reproducible(self, ray_session):
        rng = np.random.RandomState(14)
        X = rng.randn(60, 5)
        ids = np.arange(60)
        a = run(emb_ds(ids, X, blocks=6))
        b = run(emb_ds(ids, X, blocks=6))
        pd.testing.assert_frame_equal(a, b)   # exact for a fixed layout

    def test_k_exceeds_corpus(self, ray_session):
        X = np.eye(2)
        out = similarity.kmeans_labels(emb_ds([5, 9], X), k=8, n_iter=2)
        df = out.to_pandas().sort_values("vec_id")
        assert list(df.label) == [0, 1]
        assert np.allclose(df.dist, 0.0)

    def test_empty(self, ray_session):
        import ray.data
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64()))}))
        out = similarity.kmeans_labels(ds)
        assert isinstance(out, pa.Table)
        assert out.num_rows == 0


class TestHashedVectors:
    def test_deterministic_and_unit_norm(self):
        from mobile_ocr_api_ray.stages import text_analysis as ta
        t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array(["alpha beta gamma", "alpha beta gamma",
                                        None])})
        a = ta.hashed_doc_vectors(t)
        b = ta.hashed_doc_vectors(t)
        assert a.equals(b)
        v0 = np.array(a["embedding"][0].as_py())
        v1 = np.array(a["embedding"][1].as_py())
        assert np.allclose(v0, v1)
        assert abs(np.linalg.norm(v0) - 1.0) < 1e-12
        assert np.allclose(a["embedding"][2].as_py(), 0.0)  # empty → zero

    def test_disjoint_vocab_orthogonalish(self):
        from mobile_ocr_api_ray.stages import text_analysis as ta
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["cat dog bird fish " * 10,
                                        "table chair lamp desk " * 10])})
        v = ta.hashed_doc_vectors(t)
        a = np.array(v["embedding"][0].as_py())
        b = np.array(v["embedding"][1].as_py())
        assert abs(float(a @ b)) < 0.5   # disjoint vocab → low cosine

    def test_cluster_query(self, ray_session):
        from mobile_ocr_api_ray.pipelines import analysis
        df1 = analysis.doc_cluster_labels("/root/testdata/sf0.001")
        df1 = df1.to_pandas() if not isinstance(df1, pa.Table) \
            else df1.to_pandas()
        assert len(df1) > 0 and df1.label.nunique() > 1
