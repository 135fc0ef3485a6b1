"""Per-partition index segments.

Rebuild analog of reverse_index_sorted.bin + its index files
(/root/reference/Indexer/Program.cs:583-890), re-designed per the north
star: per (field, term) the posting list is LOCAL-ORDINAL-sorted,
delta-encoded, varbyte-compressed, cut into fixed-size blocks with
(first/last ordinal, max tf, min dl) metadata for block-max pruning.

Layout decisions vs the reference:
- postings reference LOCAL doc ordinals (row index into the partition's
  doc table), not global 64-bit ids — deltas are tiny, dl lookup is an
  array index (the reference instead re-reads a global sorted title index
  per query, Engine.cs:201-207).
- blocks are fixed-size (BLOCK_SIZE postings); block j of a list covers
  postings [j*B, (j+1)*B), so block boundaries need no stored positions;
  byte offsets per block allow selective decode for WAND skipping.
- the whole partition is encoded with ~20 numpy kernel calls: ONE varbyte
  pass over every delta in the partition, then zero-copy slicing into
  per-term Arrow large_binary values. No Python loop over terms.

Determinism: postings are fully sorted by (field, term_hash, ordinal) and
doc ordinals by doc_id before encoding, so segment bytes are identical
under any build parallelism (the reference is tie-nondeterministic,
SURVEY.md §1.3.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import varbyte_decode, varbyte_encode
from ..functions.tokenize import encode_group_positions
from ..schemas import FIELD_BODY, FIELD_TITLE, SEGMENT_DOCS, SEGMENT_POSTINGS

BLOCK_SIZE = 128


def _large_binary_from_slices(total_buf: bytes, offsets: np.ndarray) -> pa.LargeBinaryArray:
    """Zero-copy Arrow large_binary column over one shared buffer."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()), pa.py_buffer(total_buf)],
    )


def _list_array(values: np.ndarray, counts: np.ndarray, dtype: pa.DataType) -> pa.ListArray:
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(values, dtype))


def build_segment(group: pa.Table, block_size: int = BLOCK_SIZE) -> tuple[pa.Table, pa.Table]:
    """Encode one partition's flat postings -> (docmeta, postings) tables.

    `group` columns: field:uint8, term_hash:int64, doc_id:int64,
    tf:uint32, dl:uint32 (one row per (doc, field, term)).
    """
    has_pos = "positions" in group.column_names
    field = group.column("field").to_numpy(zero_copy_only=False).astype(np.uint8)
    th = group.column("term_hash").to_numpy(zero_copy_only=False).astype(np.int64)
    doc = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    tf = group.column("tf").to_numpy(zero_copy_only=False).astype(np.uint32)
    dl = group.column("dl").to_numpy(zero_copy_only=False).astype(np.uint32)
    n = len(th)
    if n == 0:
        return SEGMENT_DOCS.empty_table(), SEGMENT_POSTINGS.empty_table()

    # --- local doc table (row index == ordinal) ---
    uniq_docs = np.unique(doc)
    ords = np.searchsorted(uniq_docs, doc).astype(np.uint32)
    dl_by_field = {}
    for code in (FIELD_BODY, FIELD_TITLE):
        arr = np.zeros(len(uniq_docs), dtype=np.uint32)
        m = field == code
        arr[ords[m]] = dl[m]
        dl_by_field[code] = arr
    docmeta = pa.table(
        {
            "doc_id": pa.array(uniq_docs, pa.int64()),
            "dl_body": pa.array(dl_by_field[FIELD_BODY], pa.uint32()),
            "dl_title": pa.array(dl_by_field[FIELD_TITLE], pa.uint32()),
        },
        schema=SEGMENT_DOCS,
    )

    # --- global sort: (field, term_hash, ordinal) ---
    order = np.lexsort((ords, th, field))
    f_s, th_s, ord_s, tf_s, dl_s = field[order], th[order], ords[order], tf[order], dl[order]

    new_term = np.empty(n, dtype=bool)
    new_term[0] = True
    new_term[1:] = (th_s[1:] != th_s[:-1]) | (f_s[1:] != f_s[:-1])
    term_starts = np.flatnonzero(new_term)
    n_terms = len(term_starts)
    term_ends = np.append(term_starts[1:], n)
    term_id = np.cumsum(new_term) - 1
    within = np.arange(n, dtype=np.int64) - term_starts[term_id]

    block_starts = np.flatnonzero(within % block_size == 0)
    block_ends = np.append(block_starts[1:], n) - 1
    block_term = term_id[block_starts]
    blocks_per_term = np.bincount(block_term, minlength=n_terms)

    # --- deltas (reset to 0 at every block start; first ord kept in metadata) ---
    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = 0
    deltas[1:] = ord_s[1:].astype(np.int64) - ord_s[:-1].astype(np.int64)
    deltas[block_starts] = 0
    ords_buf, ords_sizes = varbyte_encode(deltas.astype(np.uint64))
    tfs_buf, tfs_sizes = varbyte_encode((tf_s - 1).astype(np.uint64))
    ords_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(ords_sizes, out=ords_off[1:])
    tfs_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tfs_sizes, out=tfs_off[1:])

    term_bounds = np.append(term_starts, n)
    ords_col = _large_binary_from_slices(ords_buf, ords_off[term_bounds])
    tfs_col = _large_binary_from_slices(tfs_buf, tfs_off[term_bounds])

    pos_col = None
    if has_pos:
        # re-pack per-posting position blobs into global sort order, then
        # slice per term (postings of a term are contiguous after the sort;
        # per-posting boundaries are recoverable from tf at decode time)
        taken = group.column("positions").combine_chunks().take(pa.array(order))
        _, off_buf, data_buf = taken.buffers()
        p_off = np.frombuffer(off_buf, dtype=np.int64, count=n + 1, offset=taken.offset * 8)
        p_data = np.frombuffer(data_buf, dtype=np.uint8)
        base = p_off[0]
        pos_col = _large_binary_from_slices(
            p_data[base : p_off[-1]].tobytes(), p_off[term_bounds] - base
        )

    postings = pa.table(
        {
            "field": pa.array(f_s[term_starts], pa.uint8()),
            "term_hash": pa.array(th_s[term_starts], pa.int64()),
            "df": pa.array((term_ends - term_starts).astype(np.uint32), pa.uint32()),
            "cf": pa.array(np.add.reduceat(tf_s.astype(np.int64), term_starts), pa.int64()),
            "ords": ords_col,
            "tfs": tfs_col,
            "blk_first": _list_array(ord_s[block_starts], blocks_per_term, pa.uint32()),
            "blk_last": _list_array(ord_s[block_ends], blocks_per_term, pa.uint32()),
            "blk_max_tf": _list_array(
                np.maximum.reduceat(tf_s, block_starts), blocks_per_term, pa.uint32()
            ),
            "blk_min_dl": _list_array(
                np.minimum.reduceat(dl_s, block_starts), blocks_per_term, pa.uint32()
            ),
            "blk_off_ords": _list_array(
                (ords_off[block_starts] - ords_off[term_starts[block_term]]).astype(np.uint32),
                blocks_per_term,
                pa.uint32(),
            ),
            "blk_off_tfs": _list_array(
                (tfs_off[block_starts] - tfs_off[term_starts[block_term]]).astype(np.uint32),
                blocks_per_term,
                pa.uint32(),
            ),
        },
        schema=SEGMENT_POSTINGS,
    )
    if pos_col is not None:
        postings = postings.append_column(
            pa.field("positions", pa.large_binary()), pos_col
        )
    return docmeta, postings


def segment_to_postings(part_dir: str, block_size: int) -> pa.Table:
    """Inverse of build_segment: reconstruct the partition's FLAT postings
    rows (field, term_hash, doc_id, tf, dl [, positions]) from its segment
    files. Round-trips exactly: build_segment(segment_to_postings(d)) is
    byte-identical to the original segment (compaction relies on this —
    pipelines/update.py compact).

    Fully vectorized: varbyte is self-delimiting and term boundaries align
    with byte offsets, so the WHOLE partition's ords/tfs/positions streams
    decode in one pass each (mirroring the one-pass encode in
    build_segment); per-term work is pure numpy indexing.
    """
    import os

    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(part_dir, "docs.parquet"))
    doc_ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
    dl_by_field = {
        FIELD_BODY: docs.column("dl_body").to_numpy(zero_copy_only=False),
        FIELD_TITLE: docs.column("dl_title").to_numpy(zero_copy_only=False),
    }
    post = pq.read_table(os.path.join(part_dir, "postings.parquet"))
    if post.num_rows == 0:
        return POSTINGS_FLAT_EMPTY()
    has_pos = "positions" in post.column_names
    f_col = post.column("field").to_numpy(zero_copy_only=False)
    th_col = post.column("term_hash").to_numpy(zero_copy_only=False)
    df = post.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(df.sum())

    def _flat_binary(name: str) -> np.ndarray:
        arr = post.column(name).combine_chunks()
        _, off_buf, data_buf = arr.buffers()
        off = np.frombuffer(off_buf, dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
        data = np.frombuffer(data_buf, dtype=np.uint8)
        return data[off[0] : off[-1]]

    # term/value geometry: term t covers value indices [starts[t], starts[t]+df[t])
    term_starts = np.zeros(len(df) + 1, dtype=np.int64)
    np.cumsum(df, out=term_starts[1:])
    term_of_value = np.repeat(np.arange(len(df), dtype=np.int64), df)

    # --- ords: one varbyte pass; deltas reset at every block start, with
    # the block's first ordinal kept in blk_first (same layout the encoder
    # wrote: block j of term t starts at value term_starts[t] + j*B) ---
    deltas = varbyte_decode(_flat_binary("ords")).astype(np.int64)
    assert len(deltas) == n
    within = np.arange(n, dtype=np.int64) - term_starts[term_of_value]
    block_start_mask = (within % block_size) == 0
    blk_first_flat = (
        post.column("blk_first").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    c = np.cumsum(deltas)
    bs_idx = np.flatnonzero(block_start_mask)
    assert len(bs_idx) == len(blk_first_flat)
    # value at each block start must equal blk_first; the per-block
    # adjustment applies to every value until the next block start
    carry = np.repeat(blk_first_flat - c[bs_idx], np.diff(np.append(bs_idx, n)))
    ords = (c + carry).astype(np.int64)

    tfs = (varbyte_decode(_flat_binary("tfs")) + np.uint64(1)).astype(np.uint32)
    assert len(tfs) == n

    field_flat = np.repeat(f_col, df).astype(np.uint8)
    dl = np.where(
        field_flat == FIELD_BODY,
        dl_by_field[FIELD_BODY][ords],
        dl_by_field[FIELD_TITLE][ords],
    ).astype(np.uint32)
    tbl = pa.table(
        {
            "field": pa.array(field_flat, pa.uint8()),
            "term_hash": pa.array(np.repeat(th_col, df), pa.int64()),
            "doc_id": pa.array(doc_ids[ords], pa.int64()),
            "tf": pa.array(tfs, pa.uint32()),
            "dl": pa.array(dl, pa.uint32()),
        }
    )
    if has_pos:
        # one pass over the whole positions stream: per-POSTING delta
        # groups (first absolute); posting p covers position indices
        # [pb[p], pb[p+1]) where pb = cumsum(tfs)
        pos_vals = varbyte_decode(_flat_binary("positions")).astype(np.int64)
        pb = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs.astype(np.int64), out=pb[1:])
        flat_pos = np.zeros(len(pos_vals), dtype=np.int64)
        if len(pos_vals):
            cp = np.cumsum(pos_vals)
            p_starts = pb[:-1]
            adj = np.repeat(cp[p_starts] - pos_vals[p_starts], np.diff(pb))
            flat_pos = cp - adj
        group = np.repeat(np.arange(n, dtype=np.int64), tfs.astype(np.int64))
        buf, bounds = encode_group_positions(group, flat_pos)
        pos_col = _large_binary_from_slices(buf, bounds)
        tbl = tbl.append_column(pa.field("positions", pa.large_binary()), pos_col)
    return tbl


def POSTINGS_FLAT_EMPTY() -> pa.Table:
    return pa.table(
        {
            "field": pa.array([], pa.uint8()),
            "term_hash": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.uint32()),
            "dl": pa.array([], pa.uint32()),
        }
    )


def decode_ords(ords_bytes: bytes, blk_first: np.ndarray, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Decode a term's full ordinal list (uint32, ascending)."""
    vals = varbyte_decode(ords_bytes)
    n = len(vals)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    c = np.cumsum(vals.astype(np.int64))
    starts = np.arange(0, n, block_size)
    counts = np.diff(np.append(starts, n))
    adjust = np.repeat(np.asarray(blk_first, dtype=np.int64) - c[starts], counts)
    return (c + adjust).astype(np.uint32)


def decode_tfs(tfs_bytes: bytes) -> np.ndarray:
    """Decode a term's tf list (stored as tf-1)."""
    return (varbyte_decode(tfs_bytes) + np.uint64(1)).astype(np.uint32)


def decode_positions(pos_bytes: bytes | np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Decode a term's concatenated per-posting position streams into a
    flat absolute-position array (len == sum(tfs)); posting j's positions
    are the slice [cumsum(tfs)[j-1] : cumsum(tfs)[j]]."""
    vals = varbyte_decode(pos_bytes).astype(np.int64)
    if len(vals) == 0:
        return vals
    starts = np.zeros(len(tfs), dtype=np.int64)
    np.cumsum(tfs[:-1], out=starts[1:])
    c = np.cumsum(vals)
    adjust = np.repeat(c[starts] - vals[starts], np.asarray(tfs, dtype=np.int64))
    return c - adjust


def decode_block(
    ords_bytes: bytes,
    tfs_bytes: bytes,
    blk_first: np.ndarray,
    blk_off_ords: np.ndarray,
    blk_off_tfs: np.ndarray,
    df: int,
    j: int,
    block_size: int = BLOCK_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Selective decode of block j only (for WAND skipping)."""
    o_end = blk_off_ords[j + 1] if j + 1 < len(blk_off_ords) else len(ords_bytes)
    t_end = blk_off_tfs[j + 1] if j + 1 < len(blk_off_tfs) else len(tfs_bytes)
    deltas = varbyte_decode(ords_bytes[blk_off_ords[j] : o_end])
    ords = np.cumsum(deltas.astype(np.int64)) + int(blk_first[j])
    tfs = (varbyte_decode(tfs_bytes[blk_off_tfs[j] : t_end]) + np.uint64(1)).astype(np.uint32)
    return ords.astype(np.uint32), tfs
