"""Index build pipeline — the Ray-Data re-architecture of the reference's
Repository + 9-stage Indexer (/root/reference/Indexer/Repository/Program.cs:25-41,
/root/reference/Indexer/Program.cs:42-65; mapping in SURVEY.md §3.1-3.2).

The reference's nine checkpoint-gated single-node stages collapse to three
streaming stages with ONE all-to-all shuffle:

  docs:     read_parquet(url,lang)            -> docs table + N        (no shuffle)
  segments: read_parquet(html|text,lang)
              -> map_batches(extract+tokenize+count)   [zero-copy Arrow]
              -> groupby(part).map_groups(encode+write)  [THE shuffle]
  lexicon:  read segment stats (field,term_hash,df,cf)
              -> groupby.sum -> lexicon.parquet        (tiny shuffle)

`part = mix64(doc_id) % P` — doc-bucketed. Head-term skew (the reference's
ReverseIndex scatter is O(postings) per term regardless, Program.cs:617-723)
is handled structurally: a hot term's list is split ("salted") across all P
partitions by doc bucket, so partition sizes are uniform by construction
and serving is document-partitioned (per-shard top-k pruning stays exact).

Resume: per-partition manifests (state/manifest.py). A rerun skips
partitions whose manifest matches the input fingerprint; killed builds
restart where they stopped (tested in tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..functions.runtime import stabilize_fsspec_http

stabilize_fsspec_http()

from ..functions.hashing import doc_partition, hash64, hash64_array
from ..functions.runtime import cap_worker_threads
from ..functions.tokenize import count_postings_hashed
from ..schemas import FIELD_BODY, FIELD_TITLE, POSTINGS, POSTINGS_POS
from ..stages.extract import extract_text
from ..state import manifest as mf
from ..state.segments import build_segment


# Auto partition sizing (SURVEY.md §4: P ≈ total_postings_bytes / 512 MB so
# one partition's raw postings fit a worker's heap during encode).
# postings-per-input ratio measured at sf0.1 pages: ~25 MB parquet ->
# 12.2 M postings x ~29 B raw packed ≈ 350 MB (parquet compression ~2.5x
# + markup->token blow-up); 16x is the rounded-up, deliberately
# conservative estimate. A factor-of-few error only moves partition size
# within the safe 100 MB - 1 GB band.
TARGET_PART_POSTINGS_BYTES = 512 << 20
POSTINGS_BYTES_PER_INPUT_BYTE = 16


def auto_num_partitions(input_path: str) -> int:
    """Size P from input bytes when BuildConfig.num_partitions is None.
    No hard cap — at 100 TB the estimate yields ~3M partitions of ~512 MB,
    which is the intended shape (partition count scales with data, worker
    memory does not).

    Floor: 2x the cluster CPU count (min 8). P is also the SortReduce/encode
    parallelism, so at small data sizes a bytes-derived P below the CPU count
    leaves most of the cluster idle through the whole reduce stage (measured
    3x on a 95k-doc corpus: P=8 took 16.6 s vs P=64 6.1 s at 16 CPUs). At
    real scale the bytes estimate dominates and the floor is inert. The
    resolved P is fingerprinted, so resuming an auto-P build on a different
    cluster size restarts rather than mixing partitionings."""
    total = 0
    if os.path.isdir(input_path):
        for fn in os.listdir(input_path):
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(input_path, fn))
    elif os.path.exists(input_path):
        total = os.path.getsize(input_path)
    est = total * POSTINGS_BYTES_PER_INPUT_BYTE
    floor = 8
    try:
        import ray

        if ray.is_initialized():
            floor = max(floor, 2 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        pass
    return int(max(floor, -(-est // TARGET_PART_POSTINGS_BYTES)))


@dataclass(frozen=True)
class BuildConfig:
    # None -> auto-sized from input bytes at build time (auto_num_partitions);
    # the RESOLVED value is what reaches the fingerprint and stats.json
    num_partitions: int | None = None
    block_size: int = 128
    lang_filter: str | None = "en"
    batch_size: int = 2048
    store_positions: bool = False  # per-posting token positions (phrase queries)
    shuffle_compression: str | None = "zstd"  # IPC codec for the packed
    # shuffle payloads: the sort exchange is DRAM-bandwidth-bound at scale
    # (measured: 10.7 GB of raw packed rows for 366 M postings put ~7,400 s
    # of CPU into SortMap/SortReduce copies at 3 M docs); zstd roughly
    # halves the bytes the exchange touches for ~1 GB/s/core of codec cost
    index_title: bool = True  # pages source: also build the title field
    # (the reference builds two complete indexes, titles_* and repos_*,
    #  Engine/Engine/Engine.cs:100-122; here it is a field code)
    term_strings: bool = False  # also write the (term_hash -> term) sidecar
    # (costs a second tokenize pass over the corpus; see build_term_strings)
    store_text: bool = False  # docs map also stores the extracted body text
    # (enables serving-time snippets/highlighting via DocMapShardActor point
    # reads; costs the docs stage a full html read + extract for the pages
    # source instead of the ~1% url/lang column read)
    doc_title_tokens: int | None = None  # documents source: ALSO index a
    # synthetic FIELD_TITLE = each doc's first K kept tokens (documents
    # have no real title column; per-field dl/avgdl/df follow normally, so
    # field-scoped queries work on a documents-built index). SQL-mirrorable
    # contract: title tokens == list_slice(body_tokens, 1, K).
    exchange_waves: int = 1  # run the postings exchange in W disjoint
    # part-waves (wave w builds parts with part % W == w). Each wave
    # re-tokenizes the input but materializes only 1/W of the packed
    # exchange in the object store — the multi-pass external-shuffle lever
    # for when store + spill disk < ~2x the packed corpus (measured: the
    # 30M-doc smoke's single-wave exchange spilled past the sandbox disk).
    # EXECUTION-ONLY: output segments are byte-identical for any W, so this
    # knob is excluded from the resume fingerprint.


def _fingerprint(input_path: str, cfg: BuildConfig, source: str) -> str:
    """Input+config identity for checkpoint validity. File names+sizes stand
    in for content at 100 TB scale (re-hashing the corpus would be a read)."""
    files = []
    if os.path.isdir(input_path):
        for fn in sorted(os.listdir(input_path)):
            p = os.path.join(input_path, fn)
            if fn.endswith(".parquet"):
                files.append((fn, os.path.getsize(p)))
    elif os.path.exists(input_path):
        files.append((os.path.basename(input_path), os.path.getsize(input_path)))
    cfg_d = asdict(cfg)
    # execution-only knobs produce byte-identical output — a build paused
    # under one wave count must resume under another
    cfg_d.pop("exchange_waves", None)
    body = json.dumps({"files": files, "cfg": cfg_d, "source": source, "v": 1})
    return f"{hash64(body) & 0xFFFFFFFFFFFFFFFF:016x}"


def _postings_table(
    doc_ids: np.ndarray,
    texts_by_field: list[tuple],
    num_partitions: int,
    store_positions: bool = False,
) -> pa.Table:
    """Tokenize one batch's docs (per field) into flat POSTINGS rows.
    Entries are (field_code, texts) or (field_code, texts, token_limit);
    a limit keeps only each row's first K kept tokens (synthetic title)."""
    schema = POSTINGS_POS if store_positions else POSTINGS
    parts_out: list[pa.Table] = []
    for entry in texts_by_field:
        field_code, texts = entry[0], entry[1]
        limit = entry[2] if len(entry) > 2 else None
        if store_positions:
            th, rows, tf, dl, positions = count_postings_hashed(
                texts, with_positions=True, token_limit=limit
            )
        else:
            th, rows, tf, dl = count_postings_hashed(texts, token_limit=limit)
        if len(rows) == 0:
            continue
        did = doc_ids[rows]
        cols = {
            "part": pa.array(doc_partition(did, num_partitions), pa.uint32()),
            "field": pa.array(np.full(len(rows), field_code, dtype=np.uint8), pa.uint8()),
            "term_hash": pa.array(th, pa.int64()),
            "doc_id": pa.array(did, pa.int64()),
            "tf": pa.array(tf, pa.uint32()),
            "dl": pa.array(dl[rows], pa.uint32()),
        }
        if store_positions:
            cols["positions"] = positions
        parts_out.append(pa.table(cols, schema=schema))
    if not parts_out:
        return schema.empty_table()
    return pa.concat_tables(parts_out)


def _part_filter(out: pa.Table, skip: np.ndarray, wave: tuple[int, int] | None) -> pa.Table:
    """Drop postings for resume-completed parts and (under a waved exchange)
    parts outside this wave. Vectorized; the common path (no skip, no wave)
    is a no-op."""
    if not len(skip) and wave is None:
        return out
    parts = out.column("part").to_numpy(zero_copy_only=False)
    mask = None
    if wave is not None:
        w, n_waves = wave
        mask = (parts % np.uint32(n_waves)) == np.uint32(w)
    if len(skip):
        keep = np.isin(parts, skip, invert=True)
        mask = keep if mask is None else (mask & keep)
    return out.filter(pa.array(mask))


def make_pages_postings_fn(
    cfg: BuildConfig,
    skip_parts: frozenset[int] = frozenset(),
    wave: tuple[int, int] | None = None,
):
    """Batch fn: pages (url, html, lang) -> POSTINGS rows.

    Extraction runs on `html` (per-row invariant extract(html) == text is
    asserted separately, pipelines/validate.py); doc_id = hash64(url)
    (reference: titleCRC = Crc32(title), Repository/Program.cs:125).
    """
    skip = np.sort(np.fromiter(skip_parts, dtype=np.uint32, count=len(skip_parts)))

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if cfg.lang_filter is not None:
            t = t.filter(pc.equal(t.column("lang"), cfg.lang_filter))
        if t.num_rows == 0:
            return POSTINGS.empty_table()
        titles, text = extract_text(t.column("html"))
        doc_ids = hash64_array(t.column("url"))
        fields = [(FIELD_BODY, text)]
        if cfg.index_title:
            fields.append((FIELD_TITLE, titles))
        out = _postings_table(doc_ids, fields, cfg.num_partitions, cfg.store_positions)
        return _part_filter(out, skip, wave)

    return fn


def make_documents_postings_fn(
    cfg: BuildConfig,
    skip_parts: frozenset[int] = frozenset(),
    wave: tuple[int, int] | None = None,
):
    """Batch fn: testdata documents (doc_id, text[, lang]) -> POSTINGS rows
    (body field only; doc_id is given)."""
    skip = np.sort(np.fromiter(skip_parts, dtype=np.uint32, count=len(skip_parts)))

    def fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if cfg.lang_filter is not None:
            t = t.filter(pc.equal(t.column("lang"), cfg.lang_filter))
        if t.num_rows == 0:
            return POSTINGS.empty_table()
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        text_col = t.column("text").combine_chunks()
        fields: list[tuple] = [(FIELD_BODY, text_col)]
        if cfg.doc_title_tokens:
            # synthetic title field: first K kept tokens of the body stream
            fields.append((FIELD_TITLE, text_col, cfg.doc_title_tokens))
        out = _postings_table(
            doc_ids,
            fields,
            cfg.num_partitions,
            cfg.store_positions,
        )
        return _part_filter(out, skip, wave)

    return fn


def make_packed_fn(base_fn, compression: str | None = "zstd"):
    """Wrap a postings batch fn to PACK its output for the shuffle.

    Ray's groupby is a sort-based shuffle over ROWS; sorting/merging 10^7+
    postings rows costs more than the tokenize itself (measured: the Sort
    operator was ~100% of stage wall). Since a batch's postings for one
    partition always travel together, serialize them into ONE Arrow-IPC
    binary row per (batch, partition): the shuffle then sorts ~n_batches*P
    coarse rows instead of n_postings fine rows (measured 1.5x stage
    speedup at sf0.1), while the bytes moved stay identical."""

    # NB: IpcWriteOptions holds C++ state and cannot be pickled into the
    # task closure (same class of gotcha as struct.Struct in multimodal.py)
    # — capture only the codec NAME and construct per call (cheap).

    def fn(t: pa.Table) -> pa.Table:
        opts = pa.ipc.IpcWriteOptions(compression=compression)
        post = base_fn(t)
        if post.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.uint32()), "payload": pa.array([], pa.large_binary())}
            )
        parts = post.column("part").to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        post = post.take(pa.array(order))
        parts_s = post.column("part").to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(parts_s.astype(np.int64), prepend=-1))
        ends = np.append(bounds[1:], len(parts_s))
        out_p: list[int] = []
        out_b: list[bytes] = []
        for s, e in zip(bounds, ends):
            sub = post.slice(s, e - s)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema, options=opts) as w:
                w.write_table(sub)
            out_p.append(int(parts_s[s]))
            out_b.append(sink.getvalue().to_pybytes())
        return pa.table(
            {"part": pa.array(out_p, pa.uint32()), "payload": pa.array(out_b, pa.large_binary())}
        )

    return fn


def unpack_group(group: pa.Table) -> pa.Table:
    """Inverse of make_packed_fn inside the reduce task."""
    tables = [pa.ipc.open_stream(b).read_all() for b in group.column("payload").to_pylist()]
    return pa.concat_tables(tables)


def make_segment_writer(index_dir: str, fingerprint: str, block_size: int):
    """map_groups fn: one partition's postings -> segment files + manifest.

    Writes atomically (tmp+rename) and returns a one-row metrics table —
    the collected output of the shuffle stage is pure metadata, the data
    plane goes straight to Parquet (resumable layout)."""

    def fn(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        t0 = time.perf_counter()
        part = int(group.column("part")[0].as_py())
        if "payload" in group.column_names:
            group = unpack_group(group)
        docmeta, postings = build_segment(group, block_size=block_size)
        t_enc = time.perf_counter() - t0
        part_dir = os.path.join(index_dir, "segments", mf.part_name(part))
        tmp_dir = part_dir + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(docmeta, os.path.join(tmp_dir, "docs.parquet"))
        pq.write_table(postings, os.path.join(tmp_dir, "postings.parquet"))
        if os.path.isdir(part_dir):  # leftover from a retried task
            import shutil

            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        wall = time.perf_counter() - t0
        mf.write_part_manifest(
            index_dir,
            part,
            {
                "part": part,
                "fingerprint": fingerprint,
                "n_docs": docmeta.num_rows,
                "n_terms": postings.num_rows,
                "n_postings": group.num_rows,
                "ords_bytes": postings.column("ords").nbytes,
                "tfs_bytes": postings.column("tfs").nbytes,
                "wall_s": round(wall, 4),
                "encode_s": round(t_enc, 4),
                "write_s": round(wall - t_enc, 4),
            },
        )
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "n_docs": pa.array([docmeta.num_rows], pa.int64()),
                "n_terms": pa.array([postings.num_rows], pa.int64()),
                "n_postings": pa.array([group.num_rows], pa.int64()),
                "wall_s": pa.array([wall], pa.float64()),
            }
        )

    return fn



# Below this many per-part term-stat rows, one driver-side Arrow group_by
# beats any distributed exchange's fixed cost (input is per-part term
# STATS, not postings). Module-level so tests can force the distributed
# coarse-bucket path on small fixtures.
LEXICON_DRIVER_AGG_ROWS = 5_000_000


def compute_lexicon_and_stats(
    index_dir: str,
    part_files: list[str],
    n_docs: int,
    num_partitions: int,
    block_size: int,
    fingerprint: str,
    source: str,
) -> dict:
    """Global lexicon (df/cf per term) + stats.json over the given segment
    stat files — called by build_index for a single generation and by
    pipelines/update.py over ALL generations after an incremental update."""
    lex_dir = os.path.join(index_dir, "lexicon")
    if os.path.isdir(lex_dir):  # write_parquet appends; stale files double cf
        import shutil

        shutil.rmtree(lex_dir)
    seg_stat_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in part_files)
    if not part_files:
        from ..schemas import LEXICON

        os.makedirs(lex_dir, exist_ok=True)
        pq.write_table(LEXICON.empty_table(), os.path.join(lex_dir, "lexicon-0.parquet"))
    elif seg_stat_rows <= LEXICON_DRIVER_AGG_ROWS:
        # small input: one driver-side Arrow group_by beats a Ray shuffle's
        # fixed cost by seconds (input is per-part term stats, NOT postings)
        os.makedirs(lex_dir, exist_ok=True)
        lex_tbl = (
            pq.read_table(part_files, columns=["field", "term_hash", "df", "cf"])
            .group_by(["field", "term_hash"])
            .aggregate([("df", "sum"), ("cf", "sum")])
            .select(["field", "term_hash", "df_sum", "cf_sum"])
            .rename_columns(["field", "term_hash", "df", "cf"])
        )
        pq.write_table(lex_tbl, os.path.join(lex_dir, "lexicon-0.parquet"))
    else:
        # distributed path (round-5 rework): native groupby.aggregate does
        # a full sort exchange — 140 s for 7.8M skinny rows at the 10M-doc
        # smoke. The coarse term-bucket discipline used everywhere else
        # (exchange.coarse_bucket_apply + one vectorized run-scan sum per
        # group) moves each row once with no global sort; a web-scale
        # lexicon streams through bucket-by-bucket and is written sharded.
        from ..schemas import LEXICON
        from .exchange import coarse_bucket_apply

        def _sum_terms(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return LEXICON.empty_table()
            f = group.column("field").to_numpy(zero_copy_only=False).astype(np.int64)
            th = group.column("term_hash").to_numpy(zero_copy_only=False)
            df = group.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
            cf = group.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((f, th))
            f, th, df, cf = f[order], th[order], df[order], cf[order]
            new = np.r_[True, (th[1:] != th[:-1]) | (f[1:] != f[:-1])]
            starts = np.flatnonzero(new)
            return pa.table(
                {
                    "field": pa.array(f[starts].astype(np.uint8), pa.uint8()),
                    "term_hash": pa.array(th[starts], pa.int64()),
                    "df": pa.array(np.add.reduceat(df, starts), pa.int64()),
                    "cf": pa.array(np.add.reduceat(cf, starts), pa.int64()),
                }
            )

        coarse_bucket_apply(
            rd.read_parquet(part_files, columns=["field", "term_hash", "df", "cf"]),
            "term_hash",
            _sum_terms,
            n_buckets=256,
        ).write_parquet(lex_dir)  # streamed; a web-scale lexicon is itself big
    lex_files = [os.path.join(lex_dir, f) for f in os.listdir(lex_dir) if f.endswith(".parquet")]
    n_terms = sum(pq.ParquetFile(f).metadata.num_rows for f in lex_files)

    # global stats (avgdl per field = sum cf / N; SURVEY.md §1.3.3): two
    # scalars per field, streamed file-by-file on the driver (exact int sums)
    totals: dict[int, int] = {}
    for f in lex_files:
        t = pq.read_table(f, columns=["field", "cf"])
        fld = t.column("field").to_numpy(zero_copy_only=False)
        cfv = t.column("cf").to_numpy(zero_copy_only=False)
        for code in np.unique(fld):
            totals[int(code)] = totals.get(int(code), 0) + int(cfv[fld == code].sum())
    total_body = float(totals.get(FIELD_BODY, 0))
    total_title = float(totals.get(FIELD_TITLE, 0))
    stats = {
        "n_docs": int(n_docs),
        "total_len_body": total_body,
        "total_len_title": total_title,
        "avgdl_body": total_body / n_docs if n_docs else 0.0,
        "avgdl_title": total_title / n_docs if n_docs else 0.0,
        "num_partitions": num_partitions,
        "block_size": block_size,
        "fingerprint": fingerprint,
        "source": source,
    }
    mf.write_json_atomic(os.path.join(index_dir, "stats.json"), stats)
    return {"n_terms_global": n_terms, "stats": stats}


def build_term_strings(
    input_path: str, index_dir: str, cfg: BuildConfig, source: str = "pages"
) -> int:
    """Optional (term_hash, term) reverse-map sidecar -> index_dir/terms/.

    The reference lexicon stores first-seen term STRINGS
    (/root/reference/Indexer/Program.cs:131-138); the rebuild's lexicon and
    segments are hash-keyed, so hash->term for explain/debug output needs
    this sidecar. Survivor per hash is the MIN string ("first-seen" is
    scheduling-dependent under parallelism; min is deterministic — for the
    64-bit hash the two differ only on a hash collision). Costs one extra
    tokenize pass (per-batch DISTINCT pairs only — the shuffle moves the
    vocabulary, not the token stream), which is why it is opt-in
    (BuildConfig.term_strings). Returns the number of distinct hashes."""
    from ..functions.hashing import hash64
    from ..functions.tokenize import tokenize_flat

    def pairs_fn(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if cfg.lang_filter is not None:
            t = t.filter(pc.equal(t.column("lang"), cfg.lang_filter))
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int32()), "term_hash": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string())}
            )
        if source == "pages":
            titles, text = extract_text(t.column("html"))
            cols = [text, titles] if cfg.index_title else [text]
        else:
            cols = [t.column("text").combine_chunks()]
        vocabs = []
        for c in cols:
            _, toks = tokenize_flat(c)
            u = pc.unique(toks)
            u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
            # title/body extractors may yield string vs large_string;
            # concat_arrays requires identical types
            vocabs.append(u.cast(pa.string()))
        vocab = pc.unique(pa.concat_arrays(vocabs))
        words = vocab.to_pylist()
        th = np.fromiter((hash64(w) for w in words), dtype=np.int64, count=len(words))
        bucket = (th.view(np.uint64) % np.uint64(256)).astype(np.int32)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int32()),
                "term_hash": pa.array(th, pa.int64()),
                "term": vocab,
            }
        )

    def min_per_hash(group: pa.Table) -> pa.Table:
        # coarse bucket -> vectorized first-per-hash after a (hash, term)
        # sort: the kept row is the min term of each hash run
        idx = pc.sort_indices(
            group,
            sort_keys=[("term_hash", "ascending"), ("term", "ascending")],
        )
        g = group.take(idx)
        th = g.column("term_hash").to_numpy(zero_copy_only=False)
        new = np.empty(len(th), dtype=bool)
        new[0] = True
        new[1:] = th[1:] != th[:-1]
        return g.select(["term_hash", "term"]).take(pa.array(np.flatnonzero(new)))

    terms_dir = os.path.join(index_dir, "terms")
    if os.path.isdir(terms_dir):  # write_parquet appends
        import shutil

        shutil.rmtree(terms_dir)
    if source == "pages":
        src = rd.read_parquet(input_path, columns=["html", "lang"])
    else:
        src = rd.read_parquet(
            f"{input_path}/documents.parquet" if os.path.isdir(input_path) else input_path,
            columns=["text", "lang"],
        )
    (
        src.map_batches(
            pairs_fn, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(min_per_hash, batch_format="pyarrow")
        .write_parquet(terms_dir)
    )
    if not os.path.isdir(terms_dir):
        return 0
    return sum(
        pq.ParquetFile(os.path.join(terms_dir, f)).metadata.num_rows
        for f in os.listdir(terms_dir)
        if f.endswith(".parquet")
    )


def build_index(
    input_path: str,
    index_dir: str,
    cfg: BuildConfig | None = None,
    source: str = "pages",
) -> dict:
    """Run the full build. Returns a metrics dict (also written to
    index_dir/stats.json). Idempotent / resumable at partition granularity."""
    cfg = cfg or BuildConfig()
    if cfg.num_partitions is None:
        from dataclasses import replace

        cfg = replace(cfg, num_partitions=auto_num_partitions(input_path))
    fingerprint = _fingerprint(input_path, cfg, source)
    os.makedirs(index_dir, exist_ok=True)
    t_start = time.perf_counter()
    metrics: dict = {"fingerprint": fingerprint, "source": source, "config": asdict(cfg)}
    stage_wall: dict[str, float] = {}
    metrics["stage_wall_s"] = stage_wall
    t_stage = time.perf_counter()

    # --- stage: docs (N + id->url map; no tokenization, column-pruned) ---
    # Independent of the segments stage -> executed CONCURRENTLY from a
    # driver thread (two separate Ray Data pipelines; the url/lang read is
    # ~1% of the input bytes thanks to column pruning).
    docs_path = os.path.join(index_dir, "docs")

    def run_docs_stage() -> int:
        if source == "pages":
            docs_cols = ["url", "html", "lang"] if cfg.store_text else ["url", "lang"]
            ds = rd.read_parquet(input_path, columns=docs_cols)
            if cfg.lang_filter is not None:
                ds = ds.map_batches(
                    lambda t: t.filter(pc.equal(t.column("lang"), cfg.lang_filter)),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )

            def to_docs(t: pa.Table) -> pa.Table:
                cap_worker_threads()
                cols = {
                    "doc_id": pa.array(hash64_array(t.column("url")), pa.int64()),
                    "url": t.column("url").combine_chunks(),
                }
                if cfg.store_text:
                    _titles, body = extract_text(t.column("html"))
                    cols["text"] = body
                return pa.table(cols)

            # stream to a partitioned directory — never materialized on the
            # driver. write_parquet APPENDS into an existing dir: clear it
            # first or a rebuild double-counts every doc.
            if os.path.isdir(docs_path):
                import shutil

                shutil.rmtree(docs_path)
            ds.map_batches(to_docs, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
                docs_path
            )
            if not os.path.isdir(docs_path):  # zero rows written
                return 0
            return sum(
                pq.ParquetFile(os.path.join(docs_path, f)).metadata.num_rows
                for f in os.listdir(docs_path)
                if f.endswith(".parquet")
            )
        doc_cols = ["doc_id", "text", "lang"] if cfg.store_text else ["doc_id", "lang"]
        ds = rd.read_parquet(
            f"{input_path}/documents.parquet" if os.path.isdir(input_path) else input_path,
            columns=doc_cols,
        )
        if cfg.lang_filter is not None:
            ds = ds.map_batches(
                lambda t: t.filter(pc.equal(t.column("lang"), cfg.lang_filter)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        if cfg.store_text:
            # documents have no url; the docs map stores (doc_id, text) for
            # snippet point reads (hydrate renders missing urls as raw ids)
            if os.path.isdir(docs_path):
                import shutil

                shutil.rmtree(docs_path)
            ds.map_batches(
                lambda t: t.select(["doc_id", "text"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).write_parquet(docs_path)
            if not os.path.isdir(docs_path):
                return 0
            return sum(
                pq.ParquetFile(os.path.join(docs_path, f)).metadata.num_rows
                for f in os.listdir(docs_path)
                if f.endswith(".parquet")
            )
        return ds.count()

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    docs_future = pool.submit(run_docs_stage)

    # --- stage: segments (tokenize -> shuffle -> encode; resumable) ---
    done = mf.completed_parts(index_dir, fingerprint)
    metrics["parts_skipped_resume"] = len(done)
    if len(done) < cfg.num_partitions:
        import pandas as pd

        n_waves = max(1, int(cfg.exchange_waves or 1))
        wave_frames: list = []
        stats_blobs: list[str] = []
        for w in range(n_waves):
            wave = (w, n_waves) if n_waves > 1 else None
            if source == "pages":
                src = rd.read_parquet(input_path, columns=["url", "html", "lang"])
                prep = make_pages_postings_fn(cfg, frozenset(done), wave=wave)
            else:
                src = rd.read_parquet(
                    f"{input_path}/documents.parquet" if os.path.isdir(input_path) else input_path,
                    columns=["doc_id", "text", "lang"],
                )
                prep = make_documents_postings_fn(cfg, frozenset(done), wave=wave)
            packed = src.map_batches(
                make_packed_fn(prep, cfg.shuffle_compression),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                zero_copy_batch=True,
            )
            writer = make_segment_writer(index_dir, fingerprint, cfg.block_size)
            seg_ds = packed.groupby("part").map_groups(writer, batch_format="pyarrow")
            wave_frames.append(seg_ds.to_pandas())
            # persist Ray's per-operator execution stats with the run lineage
            # (T5 analog of the reference's throughput sampler, SURVEY.md §2.3)
            try:
                stats_blobs.append(seg_ds.stats())
            except Exception:  # stats are observability, never fail the build
                pass
        seg_metrics = pd.concat(wave_frames) if wave_frames else pd.DataFrame()
        try:
            os.makedirs(mf.manifest_dir(index_dir), exist_ok=True)
            with open(os.path.join(mf.manifest_dir(index_dir), "ray_stats.txt"), "w") as fh:
                fh.write(f"\n\n{'=' * 20} wave boundary {'=' * 20}\n\n".join(stats_blobs))
        except Exception:
            pass
        if len(seg_metrics) == 0:  # every row filtered -> zero groups
            metrics["segments"] = {
                "n_parts_built": 0, "n_postings": 0, "n_terms": 0,
                "max_part_postings": 0, "min_part_postings": 0,
                "sum_encode_wall_s": 0.0,
            }
        else:
            metrics["segments"] = {
                "n_parts_built": int(len(seg_metrics)),
                "n_postings": int(seg_metrics["n_postings"].sum()),
                "n_terms": int(seg_metrics["n_terms"].sum()),
                "max_part_postings": int(seg_metrics["n_postings"].max()),
                "min_part_postings": int(seg_metrics["n_postings"].min()),
                "sum_encode_wall_s": round(float(seg_metrics["wall_s"].sum()), 3),
            }
            manifests = mf.read_part_manifests(index_dir)
            comp_bytes = sum(m["ords_bytes"] + m["tfs_bytes"] for m in manifests.values())
            if metrics["segments"]["n_postings"]:
                metrics["segments"]["bytes_per_posting"] = round(
                    comp_bytes / metrics["segments"]["n_postings"], 3
                )
    stage_wall["segments"] = round(time.perf_counter() - t_stage, 3)
    n_docs = docs_future.result()
    pool.shutdown()
    metrics["n_docs"] = int(n_docs)
    stage_wall["docs_join"] = round(time.perf_counter() - t_stage - stage_wall["segments"], 3)
    t_stage = time.perf_counter()

    # --- stage: lexicon + global stats ---
    seg_glob = os.path.join(index_dir, "segments")
    part_files = (
        [
            os.path.join(seg_glob, d, "postings.parquet")
            for d in sorted(os.listdir(seg_glob))
            if d.startswith("part-") and not d.endswith(".tmp")
        ]
        if os.path.isdir(seg_glob)
        else []
    )
    fin = compute_lexicon_and_stats(
        index_dir, part_files, int(n_docs), cfg.num_partitions, cfg.block_size,
        fingerprint, source,
    )
    metrics["n_terms_global"] = fin["n_terms_global"]
    # gen.json is the generation COMMIT MARKER: written only after every
    # stage (segments + lexicon + stats) completed. Readers and
    # refresh_global ignore gen-* dirs without it, so a killed incremental
    # update is never served half-built (state/shards.committed_generation_roots)
    mf.write_json_atomic(os.path.join(index_dir, "gen.json"), {"n_docs": int(n_docs)})
    stats = fin["stats"]
    stage_wall["lexicon"] = round(time.perf_counter() - t_stage, 3)
    t_stage = time.perf_counter()
    if cfg.term_strings:
        metrics["n_term_strings"] = build_term_strings(input_path, index_dir, cfg, source)
        stage_wall["terms"] = round(time.perf_counter() - t_stage, 3)
        t_stage = time.perf_counter()
    stage_wall["stats"] = round(time.perf_counter() - t_stage, 3)
    metrics["wall_s"] = round(time.perf_counter() - t_start, 3)
    metrics["stats"] = stats
    return metrics
