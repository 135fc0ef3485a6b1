"""Incremental index maintenance: add-only generations + tombstone deletes.

The reference can only rebuild from scratch (stage gates on output files,
/root/reference/Indexer/Program.cs:45-62). Here, Lucene-style:

- `update_index(new_input, index_dir)`: builds a COMPLETE mini-index (its
  own segments/manifests/lexicon/stats, fully resumable) under
  `index_dir/gen-NNN/` via the ordinary build_index, then recomputes the
  parent's global lexicon + stats over ALL generations' segment stat
  files. Readers (`state/shards.segment_part_dirs`) enumerate every
  generation; doc-bucketed partitioning makes generations disjoint shards
  of the doc space, so scoring against the merged global stats is exactly
  what a from-scratch rebuild of the union would produce (PROVIDED doc ids
  are disjoint across generations — the caller's contract).
- `delete_docs(index_dir, doc_ids)`: appends tombstones; queries filter
  them out. Global stats are NOT adjusted until `compact` (standard
  Lucene-style drift: deleted docs still count toward N/avgdl/df).
- `compact(index_dir)` is a full rebuild from the unioned inputs — out of
  scope here (the reference's only mode); documented for completeness.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state import manifest as mf
from .build import BuildConfig, build_index, compute_lexicon_and_stats


def _generation_roots(index_dir: str) -> list[str]:
    return [index_dir] + sorted(
        os.path.join(index_dir, d)
        for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if d.startswith("gen-") and os.path.isdir(os.path.join(index_dir, d))
    )


def refresh_global(index_dir: str) -> dict:
    """Recompute the parent lexicon + stats over every generation."""
    import json

    part_files: list[str] = []
    n_docs = 0
    for root in _generation_roots(index_dir):
        seg = os.path.join(root, "segments")
        if os.path.isdir(seg):
            part_files.extend(
                os.path.join(seg, d, "postings.parquet")
                for d in sorted(os.listdir(seg))
                if d.startswith("part-") and not d.endswith(".tmp")
            )
        gen_json = os.path.join(root, "gen.json")
        if os.path.exists(gen_json):
            with open(gen_json) as fh:
                n_docs += int(json.load(fh)["n_docs"])
    with open(os.path.join(index_dir, "stats.json")) as fh:
        base = json.load(fh)
    return compute_lexicon_and_stats(
        index_dir,
        part_files,
        n_docs,
        base["num_partitions"],
        base["block_size"],
        base["fingerprint"],
        base["source"],
    )


def update_index(
    input_path: str,
    index_dir: str,
    cfg: BuildConfig | None = None,
    source: str = "pages",
) -> dict:
    """Add documents to an existing index as a new generation.

    Caller contract: the new input's doc ids (hash64(url) for pages) are
    DISJOINT from every existing generation — re-adding an existing doc
    duplicates it (delete it first)."""
    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        raise FileNotFoundError(f"{index_dir} is not a built index (stats.json missing)")
    existing = [r for r in _generation_roots(index_dir) if r != index_dir]
    g = len(existing) + 1
    sub = os.path.join(index_dir, f"gen-{g:03d}")
    metrics = build_index(input_path, sub, cfg, source=source)
    fin = refresh_global(index_dir)
    metrics["generation"] = g
    metrics["global_stats"] = fin["stats"]
    return metrics


def delete_docs(index_dir: str, doc_ids: list[int]) -> int:
    """Tombstone documents; returns the total tombstone count. Readers
    filter these at query time (state/shards.load_tombstones)."""
    path = os.path.join(index_dir, "tombstones.parquet")
    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    if os.path.exists(path):
        old = pq.read_table(path, columns=["doc_id"]).column("doc_id").to_numpy(
            zero_copy_only=False
        )
        ids = np.union1d(old, ids)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, path)
    mf.write_json_atomic(
        os.path.join(index_dir, "tombstones.meta.json"), {"n_tombstones": int(len(ids))}
    )
    return int(len(ids))
