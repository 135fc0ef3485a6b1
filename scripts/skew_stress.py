"""Adversarial hot-term skew stress (round-3 verdict ask #9, SURVEY §4
skew row): ONE term ("stopword") appears `--hot-tf` times in `--hot-frac`
(default 90%) of `--docs` documents. A term-partitioned layout would put
that term's posting list — most of the corpus — into a single partition;
the doc-bucketed layout (`part = mix64(doc_id) % P`, pipelines/build.py)
must keep partition postings uniform. Reports the measured spread; the
companion regression test is tests/test_skew.py::test_hot_term_90pct.

  python scripts/skew_stress.py --docs 1000000 --cpus 32

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
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--hot-tf", type=int, default=20)
    ap.add_argument("--keep-index", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from searchengine_ray.functions.runtime import silence_ray_empty_block_schema_warning

    silence_ray_empty_block_schema_warning()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.build import BuildConfig, build_index
    from searchengine_ray.schemas import PAGES

    pages_dir = f"/tmp/seray_skew_pages_{args.docs}_{args.hot_tf}"
    marker = os.path.join(pages_dir, "_DONE")
    tag = f"v1:{args.docs}:{args.files}:{args.hot_frac}:{args.hot_tf}"

    @ray.remote
    def gen(start: int, stop: int, path: str) -> None:
        g = np.random.Generator(np.random.PCG64(start + 7))
        L = "abcdefghijklmnopqrstuvwxyz"
        vocab = ["w" + L[j // 676] + L[(j // 26) % 26] + L[j % 26] for j in range(5000)]
        hot = " ".join(["stopword"] * args.hot_tf)
        urls, htmls, texts = [], [], []
        for i in range(start, stop):
            body = " ".join(g.choice(vocab, 40))
            if (i % 10) < int(args.hot_frac * 10):  # deterministic 90%
                body = hot + " " + body
            title = f"t{i}"
            urls.append(f"u://skew/{i}")
            htmls.append(
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{body}</p></body></html>".encode()
            )
            texts.append(f"{title}\n{body}\n")
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array([0] * len(urls), pa.timestamp("us")),
                    "html": pa.array(htmls, pa.binary()),
                    "text": pa.array(texts, pa.large_string()),
                    "lang": pa.array(["en"] * len(urls), pa.string()),
                },
                schema=PAGES,
            ),
            path,
        )

    if not (os.path.exists(marker) and open(marker).read().strip() == tag):
        os.makedirs(pages_dir, exist_ok=True)
        bounds = np.linspace(0, args.docs, args.files + 1, dtype=np.int64)
        t0 = time.perf_counter()
        ray.get(
            [
                gen.remote(int(bounds[k]), int(bounds[k + 1]),
                           os.path.join(pages_dir, f"part-{k:04d}.parquet"))
                for k in range(args.files)
                if bounds[k] < bounds[k + 1]
            ]
        )
        with open(marker, "w") as f:
            f.write(tag)
        print(f"synth: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    index_dir = f"/tmp/seray_skew_idx_{args.docs}_{args.cpus}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.perf_counter()
    metrics = build_index(pages_dir, index_dir, BuildConfig(), source="pages")
    build_s = time.perf_counter() - t0
    seg = metrics["segments"]
    mean = seg["n_postings"] / seg["n_parts_built"]
    out = {
        "metric": "skew_partition_spread",
        "docs": metrics["n_docs"],
        "hot_frac": args.hot_frac,
        "hot_tf": args.hot_tf,
        "build_sec": round(build_s, 1),
        "docs_per_sec": round(metrics["n_docs"] / build_s, 1),
        "n_postings": seg["n_postings"],
        "num_partitions": seg["n_parts_built"],
        "max_part_postings": seg["max_part_postings"],
        "min_part_postings": seg["min_part_postings"],
        "spread_hi_pct": round((seg["max_part_postings"] / mean - 1) * 100, 2),
        "spread_lo_pct": round((1 - seg["min_part_postings"] / mean) * 100, 2),
        "num_cpus": args.cpus,
    }
    print(json.dumps(out))
    if not args.keep_index:
        shutil.rmtree(index_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
