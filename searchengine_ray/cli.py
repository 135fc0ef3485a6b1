"""Command-line entry points — parity with the reference's three
executables (Repository+Indexer -> `build`, Engine -> `serve`/`query`),
plus `validate` and `synth`.

  python -m searchengine_ray.cli synth    --out /tmp/pages --rows 10000
  python -m searchengine_ray.cli validate --input /tmp/pages
  python -m searchengine_ray.cli build    --input /tmp/pages --index /tmp/idx -p 16
  python -m searchengine_ray.cli query    --index /tmp/idx -q "some words" -k 10
  python -m searchengine_ray.cli serve    --index /tmp/idx --port 8080

Owns the Ray session (scripts do; the library does not).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    import ray

    kwargs = dict(
        address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR"
    )
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    if not ray.is_initialized():
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("synth", help="generate the deterministic pages fixture")
    sp.add_argument("--out", required=True)
    sp.add_argument("--rows", type=int, default=10_000)
    sp.add_argument("--files", type=int, default=8)

    vp = sub.add_parser("validate", help="check extract(html) == text per row")
    vp.add_argument("--input", required=True)

    bp = sub.add_parser("build", help="build the inverted index")
    bp.add_argument("--input", required=True)
    bp.add_argument("--index", required=True)
    bp.add_argument("-p", "--partitions", type=int, default=None,
        help="segment partition count (default: auto-sized from input bytes)")
    bp.add_argument("--source", choices=["pages", "documents"], default="pages")
    bp.add_argument("--lang", default="en", help="'none' disables the filter")
    bp.add_argument("--terms", action="store_true",
        help="also write the (term_hash -> term) explain sidecar")

    qp = sub.add_parser("query", help="run a query against a built index")
    qp.add_argument("--index", required=True)
    qp.add_argument("-q", "--query", required=True)
    qp.add_argument("-k", type=int, default=10)
    qp.add_argument("--mode", choices=["bm25", "reference"], default="bm25")
    qp.add_argument("--phrase", action="store_true", help="consecutive-token phrase match (index must be built with positions)")
    qp.add_argument("--slop", type=int, default=0,
        help="with --phrase: max extra tokens between consecutive words")

    sgp = sub.add_parser("suggest", help="autocomplete: top completions for a prefix")
    sgp.add_argument("--index", required=True)
    sgp.add_argument("-p", "--prefix", required=True)
    sgp.add_argument("-k", type=int, default=5)

    up = sub.add_parser("update", help="add documents as a new generation")
    up.add_argument("--input", required=True)
    up.add_argument("--index", required=True)
    up.add_argument("-p", "--partitions", type=int, default=None,
        help="segment partition count (default: auto-sized from input bytes)")
    up.add_argument("--source", choices=["pages", "documents"], default="pages")
    up.add_argument("--lang", default="en")

    dp = sub.add_parser("delete", help="tombstone documents by doc_id")
    dp.add_argument("--index", required=True)
    dp.add_argument("--ids", required=True, help="comma-separated doc ids")

    cp = sub.add_parser(
        "compact", help="merge generations minus tombstones into a fresh index"
    )
    cp.add_argument("--index", required=True)

    svp = sub.add_parser("serve", help="HTTP search server")
    svp.add_argument("--index", required=True)
    svp.add_argument("--port", type=int, default=8080)
    svp.add_argument("--shards", type=int, default=4)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from .synth import write_pages

        write_pages(args.out, n_rows=args.rows, n_files=args.files, parallel=False)
        print(json.dumps({"out": args.out, "rows": args.rows}))
        return 0

    ray = _ray_init(args.num_cpus)
    try:
        if args.cmd == "validate":
            from .pipelines.validate import check_extract_invariant

            out = check_extract_invariant(args.input)
            print(json.dumps(out))
            return 0 if out["mismatches"] == 0 else 1
        if args.cmd == "build":
            from .pipelines.build import BuildConfig, build_index

            cfg = BuildConfig(
                num_partitions=args.partitions,
                lang_filter=None if args.lang == "none" else args.lang,
                term_strings=args.terms,
            )
            metrics = build_index(args.input, args.index, cfg, source=args.source)
            print(json.dumps(metrics, default=str))
            return 0
        if args.cmd == "query":
            from .state.shards import SearchEngine

            engine = SearchEngine(args.index, n_shards=2, mode=args.mode)
            if args.phrase:
                results = engine.phrase_search(args.query, k=args.k, slop=args.slop)
                urls = engine.hydrate([d for d, _ in results])
                for d, score in results:
                    print(f"{score:12.6f}  {urls[d]}")
            else:
                for url, score in engine.search_hydrated(args.query, k=args.k):
                    print(f"{score:12.6f}  {url}")
            return 0
        if args.cmd == "update":
            from .pipelines.build import BuildConfig
            from .pipelines.update import update_index

            cfg = BuildConfig(
                num_partitions=args.partitions,
                lang_filter=None if args.lang == "none" else args.lang,
            )
            metrics = update_index(args.input, args.index, cfg, source=args.source)
            print(json.dumps(metrics, default=str))
            return 0
        if args.cmd == "delete":
            from .pipelines.update import delete_docs

            n = delete_docs(args.index, [int(x) for x in args.ids.split(",") if x])
            print(json.dumps({"n_tombstones": n}))
            return 0
        if args.cmd == "compact":
            from .pipelines.update import compact

            out = compact(args.index)
            print(json.dumps(out, default=str))
            return 0
        if args.cmd == "suggest":
            from .state.shards import SearchEngine

            engine = SearchEngine(args.index, n_shards=1)
            print(json.dumps(engine.suggest(args.prefix, k=args.k)))
            return 0
        if args.cmd == "serve":
            from .serve import serve

            server = serve(args.index, port=args.port, n_shards=args.shards)
            print(json.dumps({"serving": f"http://127.0.0.1:{args.port}/search?q=..."}))
            try:
                server.serve_forever()
            except KeyboardInterrupt:
                server.shutdown()
            return 0
    finally:
        ray.shutdown()
    return 2


if __name__ == "__main__":
    sys.exit(main())
