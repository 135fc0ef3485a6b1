"""Scale smoke: synthesize N pages, build the index with auto-sized P,
report wall / docs-per-sec / partition balance / bytes-per-posting.

Used for the 1M/3M/10M measurements recorded in BASELINE.md §scale-smokes.

  python scripts/smoke.py --docs 10000000 --cpus 32
  python scripts/smoke.py --docs 10000000 --cpus 32 --queries   # + BM25 batch

The pages corpus is the deterministic synthetic fixture (FIXTURES.md);
synthesis is idempotent, so reruns over the same --docs reuse the parquet.
Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=128)
    ap.add_argument("--queries", action="store_true", help="also run a 200-query BM25 batch")
    ap.add_argument("--keep-index", action="store_true")
    ap.add_argument(
        "--waves", type=int, default=1,
        help="run the postings exchange in W disjoint part-waves "
        "(BuildConfig.exchange_waves): each wave re-tokenizes the corpus but "
        "materializes only 1/W of the packed exchange, bounding object-store "
        "+ spill-disk footprint. The 30M smoke needs ~3 on this host.",
    )
    ap.add_argument(
        "--object-store-gb", type=float, default=None,
        help="Ray object-store size in GiB (default: Ray's 30%% of RAM). The "
        "postings exchange materializes in the store; on disk-constrained "
        "hosts a RAM-sized store avoids spilling the whole exchange to /tmp "
        "(the 30M smoke needs this: its exchange exceeds the effective disk).",
    )
    args = ap.parse_args()

    # see bench.py: keep large numpy allocations on the reusable heap
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             object_store_memory=(
                 int(args.object_store_gb * (1 << 30))
                 if args.object_store_gb else None
             ))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from searchengine_ray.functions.runtime import silence_ray_empty_block_schema_warning

    silence_ray_empty_block_schema_warning()

    from searchengine_ray.pipelines.build import BuildConfig, build_index
    from searchengine_ray.synth import write_pages

    pages_dir = f"/tmp/seray_smoke_pages_{args.docs}"
    t0 = time.perf_counter()
    write_pages(pages_dir, n_rows=args.docs, n_files=args.files, parallel=True)
    synth_s = time.perf_counter() - t0

    index_dir = f"/tmp/seray_smoke_idx_{args.docs}_{args.cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.perf_counter()
    # num_partitions=None -> auto-sized from input bytes (the knob the
    # round-2 verdict asked to exercise at the 10M scale)
    metrics = build_index(pages_dir, index_dir,
                          BuildConfig(num_partitions=None, exchange_waves=args.waves),
                          source="pages")
    build_s = time.perf_counter() - t0

    seg = metrics.get("segments", {})
    n_docs = metrics["n_docs"]
    out = {
        "n_docs": n_docs,
        "num_cpus": args.cpus,
        "synth_s": round(synth_s, 1),
        "build_s": round(build_s, 1),
        "docs_per_sec": round(n_docs / build_s, 1),
        "auto_P": metrics["config"]["num_partitions"],
        "waves": args.waves,
        "n_postings": seg.get("n_postings"),
        "bytes_per_posting": seg.get("bytes_per_posting"),
        "max_part_postings": seg.get("max_part_postings"),
        "min_part_postings": seg.get("min_part_postings"),
        "stage_wall_s": metrics.get("stage_wall_s"),
    }
    if seg.get("max_part_postings") and seg.get("n_postings"):
        mean = seg["n_postings"] / metrics["config"]["num_partitions"]
        out["part_balance_pct"] = round(
            100 * max(seg["max_part_postings"] / mean - 1,
                      1 - seg["min_part_postings"] / mean), 2)

    if args.queries:
        from searchengine_ray.state.shards import SearchEngine
        from searchengine_ray.synth import make_queries_table

        q = make_queries_table(200).column("query").to_pylist()
        engine = SearchEngine(index_dir, n_shards=max(2, args.cpus // 2), mode="bm25")
        engine.search_batch(q[:8], k=10)
        t0 = time.perf_counter()
        engine.search_batch(q, k=10)
        out["bm25_200_queries_s"] = round(time.perf_counter() - t0, 2)
        lat = []
        for query in q[:50]:
            t1 = time.perf_counter()
            engine.search(query, k=10)
            lat.append((time.perf_counter() - t1) * 1000)
        lat.sort()
        out["query_ms_p50"] = round(lat[len(lat) // 2], 1)
        engine.shutdown()

    if not args.keep_index:
        shutil.rmtree(index_dir, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
