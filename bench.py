"""Benchmark harness.

Runs the headline flagship extraction pipeline plus representative operator
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "extract_docs_per_s": ...}

--scaling: runs the headline in two FRESH processes (num_cpus=8 and 32) on
the same corpus and reports both throughputs + efficiency
E = (docs_per_s_32 / docs_per_s_8) / 4  (SURVEY.md §4 scaling-evidence plan).
Corpus generation and OS cache warm-up happen before timing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def corpus_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    return n_docs * 2


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from mobile_ocr_api_ray import corpus
    from mobile_ocr_api_ray.pipelines import analysis as a
    from mobile_ocr_api_ray.pipelines import relational as r
    from mobile_ocr_api_ray.pipelines.extract import extract_pipeline, read_pages

    n_rows = corpus_rows(sf_dir)
    pages_dir = corpus.ensure_corpus(n_rows, seed=42)   # cached; untimed
    pages_path = os.path.join(pages_dir, "pages.parquet")
    # warm OS page cache so we measure compute+shuffle, not first disk read
    with open(pages_path, "rb") as f:
        while f.read(1 << 24):
            pass

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: flagship extraction (actor pool sized to the session CPUs)
    def headline():
        ds = read_pages(pages_path)
        out = extract_pipeline(ds, concurrency=num_cpus, batch_size=32)
        n = 0
        for b in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
            n += b.num_rows
        return n

    n_extracted = timed("extract", headline)

    timed("extract_lang_stats", lambda: a.extract_lang_stats(sf_dir).to_pandas())
    timed("lineitem_pricing", lambda: r.lineitem_pricing(sf_dir).to_pandas())
    timed("events_hourly", lambda: r.events_hourly(sf_dir).to_pandas())
    timed("sessionize_events", lambda: r.sessionize_events(sf_dir).to_pandas())
    timed("token_counts", lambda: a.token_counts_docs(sf_dir).to_pandas())
    timed("quality_scores", lambda: a.quality_docs(sf_dir).to_pandas())
    timed("exact_dedup", lambda: a.exact_dedup_docs(sf_dir).to_pandas())
    timed("minhash_pairs_doubled", lambda: a.minhash_pairs_doubled(sf_dir).to_pandas())
    timed("ann_brute_topk", lambda: a.ann_brute_topk(sf_dir).to_pandas())

    result = {
        "metric": "flagship extraction wall time (docs -> extracted+summary), "
                  "plus per-operator pipeline seconds",
        "value": timings["extract"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(sf_dir),
        "num_cpus": num_cpus,
        "extract_rows": n_extracted,
        "extract_docs_per_s": round(n_extracted / timings["extract"], 2),
    }
    ray.shutdown()
    return result


def run_headline_subprocess(sf_dir: str, ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
               GRAFT_HEADLINE_ONLY="1")
    out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                         capture_output=True, text=True, check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_headline_only(sf_dir: str, num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from mobile_ocr_api_ray import corpus
    from mobile_ocr_api_ray.pipelines.extract import extract_pipeline, read_pages

    pages_dir = corpus.ensure_corpus(corpus_rows(sf_dir), seed=42)
    pages_path = os.path.join(pages_dir, "pages.parquet")
    with open(pages_path, "rb") as f:
        while f.read(1 << 24):
            pass
    t0 = time.perf_counter()
    ds = read_pages(pages_path)
    out = extract_pipeline(ds, concurrency=num_cpus, batch_size=32)
    n = 0
    for b in out.iter_batches(batch_size=4096, batch_format="pyarrow"):
        n += b.num_rows
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"value": round(dt, 3), "unit": "sec", "rows": n,
            "docs_per_s": round(n / dt, 2), "num_cpus": num_cpus}


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = run_headline_subprocess(sf_dir, lo)
        r_hi = run_headline_subprocess(sf_dir, hi)
        eff = (r_hi["docs_per_s"] / r_lo["docs_per_s"]) / (hi / lo)
        print(json.dumps({
            "metric": "extraction throughput scaling efficiency (N vs 4N CPUs, fresh sessions)",
            "sf": sf_of(sf_dir),
            "docs_per_s_8": r_lo["docs_per_s"], "sec_8": r_lo["value"],
            "docs_per_s_32": r_hi["docs_per_s"], "sec_32": r_hi["value"],
            "scaling_efficiency": round(eff, 3),
        }))
        return

    if os.environ.get("GRAFT_HEADLINE_ONLY") == "1":
        print(json.dumps(run_headline_only(sf_dir, num_cpus)))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
