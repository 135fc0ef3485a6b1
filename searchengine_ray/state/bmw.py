"""Block-Max WAND — document-at-a-time top-k with block-level pruning.

The reference engine scores every posting of every query term
(/root/reference/Engine/Engine/Engine.cs:154-173, capped at the top-1000
postings per term). The north-star replacement: WAND pivoting over
docID-sorted compressed lists, refined with per-block upper bounds
(block max tf + block min dl -> max possible BM25 contribution), skipping
and never DECODING blocks that cannot beat the current threshold
(selective decode via the per-block byte offsets in the segment format).

Exactness: BMW returns the SAME top-k as exhaustive TAAT, bit-for-bit —
per-doc scores are summed in TermSpec order (not cursor order) so float
accumulation matches the TAAT kernel exactly (tested).

Upper bounds: ub(term) = max_j block_ub(j);
block_ub(j) = (qtf*idf) * (max_tf / (max_tf + k1*(1-b+b*(min_dl/avgdl))))
— monotone in tf (up) and dl (down), so (max_tf, min_dl) bounds the block.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..functions.codec import varbyte_decode
from ..functions.scoring import B, K1, bm25_term_scores, topk_by_score
from .segments import decode_ords, decode_tfs

_INF = np.iinfo(np.int64).max


class _Cursor:
    """One (term, partition) posting list with block-skipping state."""

    __slots__ = (
        "spec_idx", "weight", "avgdl", "dl", "ords_bytes", "tfs_bytes",
        "blk_first", "blk_last", "blk_max_tf", "blk_min_dl",
        "blk_off_ords", "blk_off_tfs", "n", "block_size",
        "blk_ubs", "ub", "j", "pos", "ords", "tfs", "cur",
    )

    def __init__(self, spec_idx, weight, avgdl, row, block_size, dl=None):
        self.spec_idx = spec_idx
        self.weight = weight  # qtf * idf
        self.avgdl = avgdl
        self.dl = dl  # this FIELD's per-ordinal doc lengths (multi-field:
        # each cursor scores against its own field's dl/avgdl)
        self.ords_bytes = row["ords"]
        self.tfs_bytes = row["tfs"]
        self.blk_first = np.asarray(row["blk_first"], dtype=np.int64)
        self.blk_last = np.asarray(row["blk_last"], dtype=np.int64)
        self.blk_max_tf = np.asarray(row["blk_max_tf"], dtype=np.float64)
        self.blk_min_dl = np.asarray(row["blk_min_dl"], dtype=np.float64)
        self.blk_off_ords = np.asarray(row["blk_off_ords"], dtype=np.int64)
        self.blk_off_tfs = np.asarray(row["blk_off_tfs"], dtype=np.int64)
        self.n = int(row["df"])
        self.block_size = block_size
        tf, dl = self.blk_max_tf, self.blk_min_dl
        self.blk_ubs = self.weight * (tf / (tf + K1 * (1.0 - B + B * (dl / avgdl))))
        self.ub = float(self.blk_ubs.max())
        self.j = -1
        self.ords: np.ndarray | None = None
        self.tfs: np.ndarray | None = None
        self.pos = 0
        self.cur = -1
        self._load_block(0)

    # -- block management -------------------------------------------------
    def _load_block(self, j: int) -> None:
        if j >= len(self.blk_first):
            self.cur = _INF
            return
        o_end = self.blk_off_ords[j + 1] if j + 1 < len(self.blk_off_ords) else len(self.ords_bytes)
        t_end = self.blk_off_tfs[j + 1] if j + 1 < len(self.blk_off_tfs) else len(self.tfs_bytes)
        deltas = varbyte_decode(self.ords_bytes[self.blk_off_ords[j] : o_end])
        self.ords = np.cumsum(deltas.astype(np.int64)) + self.blk_first[j]
        self.tfs = varbyte_decode(self.tfs_bytes[self.blk_off_tfs[j] : t_end]) + np.uint64(1)
        self.j = j
        self.pos = 0
        self.cur = int(self.ords[0])

    def block_ub(self) -> float:
        return float(self.blk_ubs[self.j]) if self.j < len(self.blk_ubs) else 0.0

    def block_last(self) -> int:
        return int(self.blk_last[self.j]) if self.j < len(self.blk_last) else _INF

    # -- iteration --------------------------------------------------------
    def advance(self) -> None:
        """One posting forward."""
        if self.cur == _INF:
            return
        self.pos += 1
        if self.pos < len(self.ords):
            self.cur = int(self.ords[self.pos])
        else:
            self._load_block(self.j + 1)

    def seek(self, target: int) -> None:
        """First posting with ord >= target; skips whole blocks WITHOUT
        decoding them (blk_last metadata)."""
        if self.cur >= target:
            return
        if self.block_last() < target:
            nxt = int(np.searchsorted(self.blk_last, target))
            if nxt >= len(self.blk_first):
                self.cur = _INF
                return
            self._load_block(nxt)
        self.pos = int(np.searchsorted(self.ords[self.pos :], target)) + self.pos
        if self.pos < len(self.ords):
            self.cur = int(self.ords[self.pos])
        else:  # target inside a gap at block end
            self._load_block(self.j + 1)

    def score_at(self, ordinal: int) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dl[ordinal])
        return self.weight * (tf / (tf + K1 * (1.0 - B + B * (dl / self.avgdl))))


SHORT_LIST_POSTINGS = 16384  # below this, vectorized exact scan beats WAND (measured)
# WAND pays off when the score threshold rises fast — i.e. when some list
# is much shorter (more selective) than the longest. For 2-3 head terms of
# similar df the pivot rarely skips and Python doc-at-a-time loses to the
# vectorized scan (measured 4x at 950k docs): take WAND only if
# min(df) * RATIO <= max(df). 0 disables the heuristic (tests force WAND).
WAND_SELECTIVITY_RATIO = 8
# Even with a dominant long list, the pivot VISITS every posting of the
# non-dominant lists — ~5 us of Python per pivot vs ~15 ns per posting for
# the vectorized scan, so WAND breaks even only when the non-dominant side
# is ~100 postings per partition (measured at 10M docs: a 24k-df head term
# paired with a 2k-df side ran 6x slower under WAND). Cap the pivot count;
# 0 disables (tests force WAND via WAND_SELECTIVITY_RATIO=0 anyway).
WAND_MAX_PIVOTS = 128


def _exact_short(cursors: list["_Cursor"], n_docs: int, k: int):
    """Vectorized exhaustive scoring for short lists — identical results
    (same kernel, same TermSpec accumulation order), ~10x less Python
    overhead than document-at-a-time pivoting. Standard WAND fallback."""
    scores = np.zeros(n_docs, dtype=np.float64)
    touched = np.zeros(n_docs, dtype=bool)
    for c in sorted(cursors, key=lambda c: c.spec_idx):
        ords = decode_ords(c.ords_bytes, c.blk_first, c.block_size)
        tfs = decode_tfs(c.tfs_bytes)
        # weight == qtf*idf; bm25_term_scores computes (qtf*idf)*... with
        # qtf=1.0 -> bit-identical product; dl is the CURSOR's field
        scores[ords] += bm25_term_scores(tfs, c.dl[ords], c.weight, 1.0, c.avgdl)
        touched[ords] = True
    cand = np.flatnonzero(touched)
    if not len(cand):
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    return topk_by_score(cand.astype(np.int64), scores[cand], k)


def bmw_topk(
    cursors: list[_Cursor], n_docs: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND over one partition (cursors may span FIELDS: each
    carries its own dl/avgdl; ordinals are shared across fields, so the
    doc-at-a-time pivot logic is field-agnostic). Returns (ords, scores)
    of the local top-k by (score desc, ord asc) — ord order == doc_id order."""
    cursors = [c for c in cursors if c.cur != _INF]
    ns = sorted((c.n for c in cursors), reverse=True)
    rest = sum(ns[1:])
    if sum(ns) <= max(SHORT_LIST_POSTINGS, 8 * k) or (
        WAND_SELECTIVITY_RATIO
        and (
            # WAND's skipping only wins when at most ONE list is long: the
            # pivot then rides the short lists and leaps through the long
            # one. One cursor, or several long lists (their union must be
            # visited doc-at-a-time anyway), lose to the vectorized scan
            # by the per-posting Python overhead (measured 5x at 950k docs).
            len(ns) == 1
            or rest * WAND_SELECTIVITY_RATIO > ns[0]
            or (WAND_MAX_PIVOTS and rest > WAND_MAX_PIVOTS)
        )
    ):
        return _exact_short(cursors, n_docs, k)
    heap: list[tuple[float, int]] = []  # min-heap of (score, -ord)
    theta = -np.inf

    def full() -> bool:
        return len(heap) >= k

    while cursors:
        cursors.sort(key=lambda c: c.cur)
        # pivot: smallest prefix whose UB sum can beat theta
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if not full() or acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break
        pivot = cursors[pivot_idx].cur
        if pivot == _INF:
            break
        if cursors[0].cur == pivot:
            # aligned: refine with BLOCK upper bounds before decoding/scoring
            in_play = [c for c in cursors if c.cur == pivot]
            block_acc = sum(c.block_ub() for c in in_play)
            if full() and block_acc <= theta:
                # the aligned cursors' current blocks can't beat theta ->
                # skip to the nearest block boundary, but never past the
                # next non-aligned cursor (it would contribute in between)
                nxt = min(c.block_last() for c in in_play) + 1
                rest = [c.cur for c in cursors if c.cur > pivot]
                if rest:
                    nxt = min(nxt, rest[0])
                for c in in_play:
                    c.seek(nxt)
            else:
                # score in TermSpec order -> bit-identical to TAAT sums
                in_play.sort(key=lambda c: c.spec_idx)
                s = 0.0
                for c in in_play:
                    s += c.score_at(pivot)
                if not full():
                    heapq.heappush(heap, (s, -pivot))
                    if full():
                        theta = heap[0][0]
                elif s > theta or (s == theta and -pivot > heap[0][1]):
                    heapq.heapreplace(heap, (s, -pivot))
                    theta = heap[0][0]
                for c in in_play:
                    c.advance()
        else:
            # not aligned: move the highest-UB cursor STRICTLY behind the
            # pivot up to it (a cursor already at the pivot would make
            # seek() a no-op and the loop would never advance)
            lag = max((c for c in cursors if c.cur < pivot), key=lambda c: c.ub)
            lag.seek(pivot)
        cursors = [c for c in cursors if c.cur != _INF]

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    ords = np.array([-d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return ords, scores
