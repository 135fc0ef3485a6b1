"""Incremental index maintenance: add-only generations + tombstone deletes
+ compaction.

The reference can only rebuild from scratch (stage gates on output files,
/root/reference/Indexer/Program.cs:45-62). Here, Lucene-style:

- `update_index(new_input, index_dir)`: builds a COMPLETE mini-index (its
  own segments/manifests/lexicon/stats, fully resumable) under
  `index_dir/gen-NNN/` via the ordinary build_index, then recomputes the
  parent's global lexicon + stats over ALL committed generations.
  COMMIT PROTOCOL: a generation becomes visible only when its build
  finishes and writes `gen.json` (the last step of build_index); readers
  (state/shards.committed_generation_roots) and refresh_global skip
  uncommitted gen dirs, and a re-run of the same update RESUMES into the
  uncommitted dir (per-partition manifests) instead of allocating a new
  generation — a killed update can neither serve half-built segments nor
  double-add documents.
  Doc-bucketed partitioning makes generations disjoint shards of the doc
  space, so scoring against merged global stats equals a from-scratch
  rebuild of the union (PROVIDED doc ids are disjoint across LIVE copies:
  to REPLACE a doc, delete_docs it first, then update_index the new
  version — the tombstone hides only the old generations' copies).
- `delete_docs(index_dir, doc_ids)`: appends tombstones scoped to the
  generations that exist at delete time (gen_watermark); a later
  re-add in a NEWER generation is served (the watermark does not cover
  it). Global stats are NOT adjusted until `compact` (standard
  Lucene-style drift: deleted docs still count toward N/avgdl/df).
- `compact(index_dir)`: merges every committed generation's partition-k
  segments (minus watermark-applicable tombstones) and re-encodes with
  the ordinary build_segment — the result is BIT-IDENTICAL to a fresh
  build of the surviving docs (tested), resets stats drift, clears
  tombstones. Per-partition merge tasks run as a Ray Data pipeline
  (partition-granular, no driver data plane).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state import manifest as mf
from .build import (
    BuildConfig,
    _fingerprint,
    auto_num_partitions,
    build_index,
    compute_lexicon_and_stats,
)


def _all_generation_dirs(index_dir: str) -> list[str]:
    return sorted(
        os.path.join(index_dir, d)
        for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if d.startswith("gen-") and os.path.isdir(os.path.join(index_dir, d))
    )


def refresh_global(index_dir: str) -> dict:
    """Recompute the parent lexicon + stats over every COMMITTED generation
    (uncommitted = no gen.json = invisible)."""
    from ..state.shards import committed_generation_roots

    part_files: list[str] = []
    n_docs = 0
    for root, _g in committed_generation_roots(index_dir):
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


def _base_store_positions(index_dir: str) -> bool:
    seg = os.path.join(index_dir, "segments")
    if not os.path.isdir(seg):
        return False
    for d in sorted(os.listdir(seg)):
        f = os.path.join(seg, d, "postings.parquet")
        if d.startswith("part-") and os.path.exists(f):
            return "positions" in pq.read_schema(f).names
    return False


def update_index(
    input_path: str,
    index_dir: str,
    cfg: BuildConfig | None = None,
    source: str = "pages",
) -> dict:
    """Add documents to an existing index as a new generation (docstring of
    this module: commit protocol, replacement = delete_docs then update)."""
    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        raise FileNotFoundError(f"{index_dir} is not a built index (stats.json missing)")
    with open(os.path.join(index_dir, "stats.json")) as fh:
        base = json.load(fh)
    cfg = cfg or BuildConfig()
    if cfg.num_partitions is None:  # resolve BEFORE fingerprinting (build.py)
        from dataclasses import replace

        cfg = replace(cfg, num_partitions=auto_num_partitions(input_path))
    # a generation with a different block_size would be silently
    # mis-decoded (readers use the parent stats.json block_size), and a
    # store_positions mismatch silently disables phrase queries there
    if cfg.block_size != int(base["block_size"]):
        raise ValueError(
            f"cfg.block_size={cfg.block_size} != index block_size={base['block_size']}"
        )
    if cfg.store_positions != _base_store_positions(index_dir):
        raise ValueError(
            "cfg.store_positions must match the base index "
            f"(base={_base_store_positions(index_dir)})"
        )
    # resume an uncommitted generation of the SAME input (update.json
    # intent marker written before the build starts); discard one of a
    # different input; otherwise allocate the next number
    sub = None
    fp = _fingerprint(input_path, cfg, source)
    for d in _all_generation_dirs(index_dir):
        if not os.path.exists(os.path.join(d, "gen.json")):
            intent = os.path.join(d, "update.json")
            same = False
            if os.path.exists(intent):
                with open(intent) as fh:
                    same = json.load(fh).get("fingerprint") == fp
            if same:
                sub = d  # killed update of the same input -> resume into it
            else:
                shutil.rmtree(d)  # stale partial of a different input
            break
    if sub is None:
        committed = [
            d
            for d in _all_generation_dirs(index_dir)
            if os.path.exists(os.path.join(d, "gen.json"))
        ]
        g = len(committed) + 1
        sub = os.path.join(index_dir, f"gen-{g:03d}")
    else:
        g = int(os.path.basename(sub).split("-")[1])
    os.makedirs(sub, exist_ok=True)
    mf.write_json_atomic(os.path.join(sub, "update.json"), {"fingerprint": fp})
    metrics = build_index(input_path, sub, cfg, source=source)
    fin = refresh_global(index_dir)
    metrics["generation"] = g
    metrics["global_stats"] = fin["stats"]
    return metrics


def _committed_watermark(index_dir: str) -> int:
    from ..state.shards import committed_generation_roots

    return max(g for _r, g in committed_generation_roots(index_dir))


def delete_docs(index_dir: str, doc_ids: list[int]) -> int:
    """Tombstone documents; returns the total tombstone count. Each
    tombstone records the highest committed generation at delete time
    (gen_watermark) and hides the doc in generations <= that watermark
    only — re-adding the doc in a LATER generation serves the new copy
    (state/shards.load_tombstones). Re-deleting bumps the watermark."""
    path = os.path.join(index_dir, "tombstones.parquet")
    wm = _committed_watermark(index_dir)
    ids = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    wms = np.full(len(ids), wm, dtype=np.int64)
    if os.path.exists(path):
        old = pq.read_table(path)
        old_ids = old.column("doc_id").to_numpy(zero_copy_only=False)
        if "gen_watermark" in old.column_names:
            old_wm = old.column("gen_watermark").to_numpy(zero_copy_only=False)
        else:  # legacy file: applies to everything that existed
            old_wm = np.full(len(old_ids), np.iinfo(np.int64).max, dtype=np.int64)
        ids = np.concatenate([old_ids, ids])
        wms = np.concatenate([old_wm, wms])
        # per doc keep the MAX watermark (latest delete wins)
        order = np.lexsort((wms, ids))
        ids, wms = ids[order], wms[order]
        last = np.ones(len(ids), dtype=bool)
        last[:-1] = ids[1:] != ids[:-1]
        ids, wms = ids[last], wms[last]
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "gen_watermark": pa.array(wms, pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)
    mf.write_json_atomic(
        os.path.join(index_dir, "tombstones.meta.json"), {"n_tombstones": int(len(ids))}
    )
    return int(len(ids))


def compact(index_dir: str) -> dict:
    """Merge all committed generations minus tombstones into a single
    fresh-equivalent index, IN PLACE.

    Per partition k (doc-bucketed with the same P in every generation, so
    bucket k is the same doc subset everywhere): decode each generation's
    part-k back to flat postings (state/segments.segment_to_postings),
    drop watermark-applicable tombstoned docs, re-encode with the same
    build_segment the normal build uses — byte-identical output to a
    fresh build of the surviving docs (tested in tests/test_update.py).
    Partition merges run as a Ray Data pipeline; the driver only touches
    metadata. Resets stats drift and clears tombstones."""
    import ray.data as rd

    from ..functions.runtime import cap_worker_threads
    from ..state.segments import build_segment, segment_to_postings
    from ..state.shards import committed_generation_roots, load_tombstones

    mf.recover_compaction(index_dir)  # heal a crashed earlier swap first
    with open(os.path.join(index_dir, "stats.json")) as fh:
        base = json.load(fh)
    block_size = int(base["block_size"])
    num_partitions = int(base["num_partitions"])
    roots = committed_generation_roots(index_dir)
    tomb_ids, tomb_wm = load_tombstones(index_dir)
    out_dir = index_dir + ".compacting"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
    fingerprint = base["fingerprint"] + "+compact"

    # one merge task per partition id; data stays inside the task
    def merge_part(batch: pa.Table) -> pa.Table:
        cap_worker_threads()
        rows_docs = []
        for part in batch.column("part").to_pylist():
            pname = mf.part_name(part)
            tables = []
            for root, g in roots:
                pdir = os.path.join(root, "segments", pname)
                if not os.path.isdir(pdir):
                    continue
                t = segment_to_postings(pdir, block_size)
                if len(tomb_ids):
                    applicable = tomb_ids[tomb_wm >= g]
                    if len(applicable):
                        keep = ~np.isin(
                            t.column("doc_id").to_numpy(zero_copy_only=False), applicable
                        )
                        t = t.filter(pa.array(keep))
                tables.append(t)
            if not tables:
                rows_docs.append((part, 0, 0))
                continue
            merged = pa.concat_tables(tables)
            if merged.num_rows == 0:
                # a fresh build would produce no part dir for an empty
                # bucket — neither does compact
                rows_docs.append((part, 0, 0))
                continue
            docmeta, postings = build_segment(merged, block_size=block_size)
            part_dir = os.path.join(out_dir, "segments", pname)
            tmp_dir = part_dir + ".tmp"
            os.makedirs(tmp_dir, exist_ok=True)
            pq.write_table(docmeta, os.path.join(tmp_dir, "docs.parquet"))
            pq.write_table(postings, os.path.join(tmp_dir, "postings.parquet"))
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
            os.rename(tmp_dir, part_dir)
            mf.write_part_manifest(
                out_dir,
                part,
                {
                    "part": part,
                    "fingerprint": fingerprint,
                    "n_docs": docmeta.num_rows,
                    "n_terms": postings.num_rows,
                    "n_postings": merged.num_rows,
                    "ords_bytes": postings.column("ords").nbytes,
                    "tfs_bytes": postings.column("tfs").nbytes,
                },
            )
            rows_docs.append((part, docmeta.num_rows, merged.num_rows))
        return pa.table(
            {
                "part": pa.array([r[0] for r in rows_docs], pa.int64()),
                "n_docs": pa.array([r[1] for r in rows_docs], pa.int64()),
                "n_postings": pa.array([r[2] for r in rows_docs], pa.int64()),
            }
        )

    parts_tbl = pa.table({"part": pa.array(list(range(num_partitions)), pa.int64())})
    result = (
        rd.from_arrow(parts_tbl)
        .map_batches(merge_part, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    n_docs = int(result["n_docs"].sum())

    # docs/ map (pages source): union generations minus tombstones — the
    # filter is applied PER GENERATION with the same watermark rule the
    # readers use, so a deleted-then-re-added doc keeps its (newer) row
    docs_out = os.path.join(out_dir, "docs")
    doc_dss = []
    for r, g in roots:
        ddir = os.path.join(r, "docs")
        if not os.path.isdir(ddir):
            continue
        files = [
            os.path.join(ddir, f) for f in sorted(os.listdir(ddir)) if f.endswith(".parquet")
        ]
        if not files:
            continue
        ds = rd.read_parquet(files)
        applicable = tomb_ids[tomb_wm >= g] if len(tomb_ids) else tomb_ids
        if len(applicable):

            def drop(t: pa.Table, gone=applicable) -> pa.Table:
                keep = ~np.isin(t.column("doc_id").to_numpy(zero_copy_only=False), gone)
                return t.filter(pa.array(keep))

            ds = ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)
        doc_dss.append(ds)
    if doc_dss:
        ds = doc_dss[0].union(*doc_dss[1:]) if len(doc_dss) > 1 else doc_dss[0]
        ds.write_parquet(docs_out)

    part_files = [
        os.path.join(out_dir, "segments", d, "postings.parquet")
        for d in sorted(os.listdir(os.path.join(out_dir, "segments")))
        if d.startswith("part-")
    ]
    fin = compute_lexicon_and_stats(
        out_dir, part_files, n_docs, num_partitions, block_size, fingerprint,
        base["source"],
    )
    mf.write_json_atomic(os.path.join(out_dir, "gen.json"), {"n_docs": n_docs})

    # atomic-ish swap: old index moved aside, compacted one takes its place
    old = index_dir + ".pre-compact"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(index_dir, old)
    os.rename(out_dir, index_dir)
    shutil.rmtree(old)
    return {"n_docs": n_docs, "n_postings": int(result["n_postings"].sum()), "stats": fin["stats"]}
