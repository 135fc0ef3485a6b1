from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.schemas import FIELD_BODY, FIELD_TITLE, POSTINGS
from searchengine_ray.state.segments import (
    build_segment,
    decode_block,
    decode_ords,
    decode_tfs,
)


def _make_group(rng, n_docs=200, n_terms=40, field_title_frac=0.2):
    """Random flat postings group (one partition's worth)."""
    rows = set()
    recs = []
    for _ in range(rng.integers(200, 1500)):
        d = int(rng.integers(0, n_docs)) * 7 + 3  # sparse doc ids
        t = int(rng.integers(0, n_terms))
        f = FIELD_TITLE if rng.random() < field_title_frac else FIELD_BODY
        if (f, t, d) in rows:
            continue
        rows.add((f, t, d))
        recs.append((f, t * 1000 + 1, d, int(rng.integers(1, 300))))
    dl_map = {}
    for f, t, d, tf in recs:
        dl_map[(f, d)] = dl_map.get((f, d), 0) + tf
    return pa.table(
        {
            "part": pa.array([0] * len(recs), pa.uint32()),
            "field": pa.array([r[0] for r in recs], pa.uint8()),
            "term_hash": pa.array([r[1] for r in recs], pa.int64()),
            "doc_id": pa.array([r[2] for r in recs], pa.int64()),
            "tf": pa.array([r[3] for r in recs], pa.uint32()),
            "dl": pa.array([dl_map[(r[0], r[2])] for r in recs], pa.uint32()),
        },
        schema=POSTINGS,
    ), recs, dl_map


def test_segment_roundtrip():
    rng = np.random.default_rng(7)
    group, recs, dl_map = _make_group(rng)
    docmeta, postings = build_segment(group, block_size=16)

    doc_ids = docmeta.column("doc_id").to_numpy(zero_copy_only=False)
    assert np.all(np.diff(doc_ids.astype(np.int64)) > 0)  # sorted unique

    # reconstruct every posting list and compare with the input records
    want: dict[tuple[int, int], dict[int, int]] = {}
    for f, t, d, tf in recs:
        want.setdefault((f, t), {})[d] = tf
    got_terms = 0
    for i in range(postings.num_rows):
        f = postings.column("field")[i].as_py()
        th = postings.column("term_hash")[i].as_py()
        blk_first = np.array(postings.column("blk_first")[i].as_py(), np.uint32)
        ords = decode_ords(postings.column("ords")[i].as_py(), blk_first, 16)
        tfs = decode_tfs(postings.column("tfs")[i].as_py())
        assert len(ords) == len(tfs) == postings.column("df")[i].as_py()
        assert np.all(np.diff(ords.astype(np.int64)) > 0)  # docID-sorted
        plist = {int(doc_ids[o]): int(tf) for o, tf in zip(ords, tfs)}
        assert plist == want[(f, th)]
        got_terms += 1
        # block metadata invariants
        blk_last = np.array(postings.column("blk_last")[i].as_py(), np.uint32)
        blk_max_tf = np.array(postings.column("blk_max_tf")[i].as_py(), np.uint32)
        blk_min_dl = np.array(postings.column("blk_min_dl")[i].as_py(), np.uint32)
        for j in range(len(blk_first)):
            lo, hi = j * 16, min((j + 1) * 16, len(ords))
            assert ords[lo] == blk_first[j] and ords[hi - 1] == blk_last[j]
            assert tfs[lo:hi].max() == blk_max_tf[j]
            dl_col = "dl_body" if f == FIELD_BODY else "dl_title"
            dls = docmeta.column(dl_col).to_numpy(zero_copy_only=False)[ords[lo:hi]]
            assert dls.min() == blk_min_dl[j]
        # selective block decode must agree with full decode
        blk_off_o = np.array(postings.column("blk_off_ords")[i].as_py(), np.uint32)
        blk_off_t = np.array(postings.column("blk_off_tfs")[i].as_py(), np.uint32)
        for j in range(len(blk_first)):
            bo, bt = decode_block(
                postings.column("ords")[i].as_py(),
                postings.column("tfs")[i].as_py(),
                blk_first,
                blk_off_o,
                blk_off_t,
                len(ords),
                j,
                16,
            )
            lo, hi = j * 16, min((j + 1) * 16, len(ords))
            np.testing.assert_array_equal(bo, ords[lo:hi])
            np.testing.assert_array_equal(bt, tfs[lo:hi])
    assert got_terms == len(want)

    # cf/df per term
    for i in range(postings.num_rows):
        f = postings.column("field")[i].as_py()
        th = postings.column("term_hash")[i].as_py()
        assert postings.column("cf")[i].as_py() == sum(want[(f, th)].values())
        assert postings.column("df")[i].as_py() == len(want[(f, th)])


def test_empty_group():
    docmeta, postings = build_segment(POSTINGS.empty_table())
    assert docmeta.num_rows == 0 and postings.num_rows == 0


def test_determinism_under_row_order():
    rng = np.random.default_rng(11)
    group, _, _ = _make_group(rng)
    perm = np.random.default_rng(3).permutation(group.num_rows)
    shuffled = group.take(pa.array(perm))
    d1, p1 = build_segment(group, block_size=32)
    d2, p2 = build_segment(shuffled, block_size=32)
    assert d1.equals(d2)
    assert p1.equals(p2)
