"""Checkpoint/resume tests (SURVEY.md §5 item 3, BASELINE.md resumability):
kill-after-k-partitions → resume → byte-identical final output."""

import os

import pyarrow.parquet as pq
import pytest

from mobile_ocr_api_ray.state import manifest


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


class TestManifest:
    def test_partitioning_deterministic(self):
        urls = [f"https://x{i}.example/p" for i in range(100)]
        a = manifest.partition_of(urls, 16)
        b = manifest.partition_of(urls, 16)
        assert a == b
        assert set(a) <= set(range(16))

    def test_full_run_then_resume_noop(self, ray_session, small_corpus, out_dir):
        pages = os.path.join(small_corpus, "pages.parquet")
        r1 = manifest.run_partitioned_extract(pages, out_dir, n_partitions=8,
                                              concurrency=2)
        assert r1["completed_now"] == 8
        done = manifest.completed_partitions(out_dir)
        assert done == set(range(8))
        # resume: everything skipped
        r2 = manifest.run_partitioned_extract(pages, out_dir, n_partitions=8,
                                              concurrency=2)
        assert r2["completed_before"] == 8
        assert r2["completed_now"] == 0
        # output covers every input row exactly once
        total = pq.read_table(pages, columns=["url"]).num_rows
        out = manifest.read_output(out_dir).to_pandas()
        assert len(out) == total
        assert out.url.is_unique

    def test_preempt_and_resume_identical(self, ray_session, small_corpus,
                                          out_dir, tmp_path):
        pages = os.path.join(small_corpus, "pages.parquet")
        # full reference run
        ref_dir = str(tmp_path / "ref")
        manifest.run_partitioned_extract(pages, ref_dir, n_partitions=8,
                                         concurrency=2)
        ref = manifest.read_output(ref_dir).to_pandas().sort_values("url").reset_index(drop=True)

        # preempted run: stop after ~3 partitions, then resume
        manifest.run_partitioned_extract(pages, out_dir, n_partitions=8,
                                         concurrency=2, max_partitions=3)
        partial = manifest.completed_partitions(out_dir)
        assert 0 < len(partial) <= 8
        manifest.run_partitioned_extract(pages, out_dir, n_partitions=8,
                                         concurrency=2)
        assert manifest.completed_partitions(out_dir) == set(range(8))
        got = manifest.read_output(out_dir).to_pandas().sort_values("url").reset_index(drop=True)
        assert (got.url == ref.url).all()
        assert (got.extracted_text == ref.extracted_text).all()
        assert (got.summary.fillna("") == ref.summary.fillna("")).all()

    def test_manifest_metrics(self, ray_session, small_corpus, out_dir):
        pages = os.path.join(small_corpus, "pages.parquet")
        manifest.run_partitioned_extract(pages, out_dir, n_partitions=4,
                                         concurrency=2)
        import json
        mdir = os.path.join(out_dir, "_manifest")
        rows = [json.load(open(os.path.join(mdir, f))) for f in sorted(os.listdir(mdir))]
        assert len(rows) == 4
        for m in rows:
            assert m["status"] == "complete"
            assert m["row_count"] > 0
            assert m["bytes"] > 0
            assert len(m["content_digest"]) == 64
            assert m["input_shard"] == pages
