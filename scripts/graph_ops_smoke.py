"""Scale smoke for the round-3 batch-5 ops: pagerank, pack_sequences,
tokenize_ids, dedup_canonical over an N-doc synthetic documents table
(same corpus builder as llm_ops_smoke).

  PYTHONPATH=/root/repo python scripts/graph_ops_smoke.py [n_docs]
"""
import json
import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000


def _count(ds) -> int:
    return int(
        ds.map_batches(
            lambda t: pa.table({"c": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow",
        ).sum("c")
    )


def main() -> None:
    import ray

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from llm_ops_smoke import synth_documents  # same fixture dir/builder

    d = synth_documents()
    from searchengine_ray.pipelines import dedup as dedup_ops
    from searchengine_ray.pipelines import export as export_ops
    from searchengine_ray.pipelines import graph as graph_ops

    out = {"n_docs": N}

    t0 = time.perf_counter()
    n = _count(graph_ops.pagerank(d, iters=3, k=4))
    out["pagerank_s"] = round(time.perf_counter() - t0, 2)
    assert n == N, (n, N)

    t0 = time.perf_counter()
    n = _count(graph_ops.hits(d, iters=2, k=4))
    out["hits_s"] = round(time.perf_counter() - t0, 2)
    assert n == N, (n, N)

    t0 = time.perf_counter()
    n = _count(graph_ops.anchor_texts(d, k=4, topk=3))
    out["anchor_texts_s"] = round(time.perf_counter() - t0, 2)
    out["anchor_rows"] = n

    t0 = time.perf_counter()
    n = _count(export_ops.pack_sequences(d, seq_len=2048))
    out["pack_sequences_s"] = round(time.perf_counter() - t0, 2)
    out["packed_docs"] = n

    t0 = time.perf_counter()
    n = _count(export_ops.tokenize_ids(d))
    out["tokenize_ids_s"] = round(time.perf_counter() - t0, 2)
    assert n == N, (n, N)

    # canonical runs the full n-gram pair graph + label propagation; the 1%
    # injected-boilerplate corpus makes that graph dense, so gate it behind
    # an env flag (run at a smaller N or on a natural corpus)
    if os.environ.get("GRAFT_SMOKE_CANONICAL"):
        t0 = time.perf_counter()
        n = _count(dedup_ops.dedup_canonical(d))
        out["dedup_canonical_s"] = round(time.perf_counter() - t0, 2)
        assert n == N, (n, N)

    for k in list(out):
        if k.endswith("_s"):
            out[k[:-2] + "_docs_per_s"] = round(N / out[k], 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
