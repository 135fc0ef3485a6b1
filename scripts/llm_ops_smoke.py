"""Scale smoke for the LLM-data ops: synthesize an N-doc documents table
(synth pages text + injected boilerplate so span-strip has real work),
then time strip_dup_spans / decontaminate / unigram_logprob at 32 CPUs.

  PYTHONPATH=/root/repo python scripts/llm_ops_smoke.py [n_docs]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
BOILER = (
    "subscribe to our newsletter for the latest updates and follow the "
    "links below to continue reading about this topic today"
)
OUT = f"/tmp/seray_llmdocs_{N}"


def synth_documents() -> str:
    from searchengine_ray.synth import make_pages_table

    if os.path.exists(os.path.join(OUT, "_DONE")):
        return OUT
    os.makedirs(os.path.join(OUT, "documents.parquet"), exist_ok=True)
    n_files = 32
    per = -(-N // n_files)
    row = 0
    for f in range(n_files):
        lo, hi = f * per, min((f + 1) * per, N)
        if lo >= hi:
            break
        t = make_pages_table(lo, hi)
        texts = [x.replace("\n", " ").strip() for x in t.column("text").to_pylist()]
        ids = np.arange(lo, hi, dtype=np.int64)
        texts = [
            tx + " " + BOILER if i % 100 == 7 else tx for i, tx in zip(ids, texts)
        ]
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}),
            os.path.join(OUT, "documents.parquet", f"part-{f:04d}.parquet"),
        )
        row += hi - lo
    open(os.path.join(OUT, "_DONE"), "w").write(str(row))
    return OUT


def main() -> None:
    import ray

    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    d = synth_documents()
    from searchengine_ray.pipelines import corpus as corpus_ops
    from searchengine_ray.pipelines import dedup as dedup_ops

    out = {"n_docs": N}
    t0 = time.perf_counter()
    n_removed = int(
        dedup_ops.strip_dup_spans(d)
        .map_batches(lambda t: pa.table({"s": pa.array([0] * 0, pa.int64())})
                     if t.num_rows == 0 else
                     pa.table({"s": pa.array([int(sum(t.column("n_removed").to_pylist()))], pa.int64())}),
                     batch_format="pyarrow")
        .sum("s")
    )
    out["strip_dup_spans_s"] = round(time.perf_counter() - t0, 2)
    out["tokens_removed"] = n_removed

    t0 = time.perf_counter()
    c = dedup_ops.decontaminate(d).map_batches(
        lambda t: pa.table({"c": pa.array([int(np.sum(t.column("contaminated").to_numpy(zero_copy_only=False)))], pa.int64())}),
        batch_format="pyarrow").sum("c")
    out["decontaminate_s"] = round(time.perf_counter() - t0, 2)
    out["contaminated"] = int(c)

    t0 = time.perf_counter()
    corpus_ops.unigram_logprob(d).map_batches(
        lambda t: pa.table({"c": pa.array([t.num_rows], pa.int64())}),
        batch_format="pyarrow").sum("c")
    out["unigram_logprob_s"] = round(time.perf_counter() - t0, 2)
    for k in ("strip_dup_spans_s", "decontaminate_s", "unigram_logprob_s"):
        out[k.replace("_s", "_docs_per_s")] = round(N / out[k], 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
