"""Query serving: document-partitioned index shards as a Ray actor pool.

Reference analog: the Engine loads 6 index files + 256^3 prefix jump-tables
once at startup and serves queries from shared static arrays
(/root/reference/Engine/Engine/Engine.cs:97-124). Rebuild (SURVEY.md §2.3 T4):

- `LocalIndex` — plain Python: loads a set of partition segment dirs into
  RAM (Arrow-backed, zero-copy numpy views where possible) and answers
  exact top-k. Used directly for offline/batched evaluation
  (pipelines/query.py map_batches actor pool) and wrapped in an actor for
  online scatter-gather.
- `IndexShardActor` — `@ray.remote` wrapper; one actor owns a slice of
  partitions (load once in __init__).
- `SearchEngine` — coordinator: parses the query
  (split(' ')+lower+Counter, Engine.cs:127-139), looks up global term
  stats from the lexicon, scatter-gathers per-shard top-k and k-way
  merges with the deterministic tie-break (score desc, doc_id asc).

Because partitions are doc-bucketed, each doc's full score is computed inside
exactly one shard, so per-shard top-k + merge is EXACT (term-partitioned
layouts cannot prune this way — see package docstring).
"""

from __future__ import annotations

import json
import os
from collections import Counter, OrderedDict
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..functions.hashing import hash64
from ..functions.runtime import cap_worker_threads
from ..functions.scoring import (
    bm25_idf,
    bm25_term_scores,
    ref_body_term_scores,
    ref_title_term_scores,
    topk_by_score,
)
from ..functions.tokenize import parse_query, parse_query_ops
from ..schemas import FIELD_BODY, FIELD_TITLE
from ..state.segments import decode_ords, decode_positions, decode_tfs
from . import bmw as _bmw
from .bmw import _Cursor, bmw_topk
from ..state.manifest import part_name, recover_compaction


REF_TRUNCATE = 1000  # reference Engine caps at the top-1000 postings by tf
# (/root/reference/Engine/Engine/Engine.cs:185-199: lists are stored tf-asc
#  and read backwards from the end)


@dataclass
class TermSpec:
    """Everything a shard needs to score one (field, term): global stats are
    resolved by the coordinator (a shard only has local df/cf).

    tf_cut/doc_cut: reference-mode global posting truncation — when
    tf_cut >= 0, only postings with (tf > tf_cut) or (tf == tf_cut and
    doc_id >= doc_cut) are scored, which selects EXACTLY the global
    top-REF_TRUNCATE postings by (tf, doc_id) ascending-tail order (the
    oracle's deterministic version of Engine.cs:193-197). Computed by the
    coordinator from per-shard candidates (with_ref_cutoffs)."""

    field: int
    term_hash: int
    qtf: float
    idf: float  # bm25 mode
    cf: float  # reference mode (global collection frequency)
    df: float = 0.0  # global document frequency (truncation trigger)
    tf_cut: int = -1
    doc_cut: int = 0


def _binary_views(col) -> tuple[np.ndarray, np.ndarray]:
    """(data, offsets) numpy views over a large_binary column — per-row
    access becomes a zero-copy slice instead of an as_py() bytes copy."""
    arr = col.combine_chunks()
    _, off_buf, data_buf = arr.buffers()
    off = np.frombuffer(off_buf, dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data, off


def _list_views(col) -> tuple[np.ndarray, np.ndarray]:
    """(values, offsets) for a list<uint32> column (one materialization at load)."""
    arr = col.combine_chunks()
    return (
        arr.values.to_numpy(zero_copy_only=False),
        arr.offsets.to_numpy(zero_copy_only=False),
    )


DECODE_CACHE_MB = int(os.environ.get("SERAY_DECODE_CACHE_MB", "8"))


class _Part:
    """One partition's segments, loaded once; per-query decode works on
    zero-copy numpy views over the Arrow buffers (the reference similarly
    keeps the whole index in static arrays, Engine.cs:97-124).

    Hot-term decode reuse (round-5 verdict ask #7): profiling the 10M-doc
    query path put 41% of per-query wall in varbyte_decode re-decoding the
    same terms' postings for every query, so decoded (ords, tfs) pairs are
    kept in a per-part LRU bounded by SERAY_DECODE_CACHE_MB (default 8 MB
    per part; an actor serving P/n_shards parts holds at most parts x
    budget). Segments are immutable per generation, so cached decodes can
    never go stale; tombstones filter downstream of this cache."""

    _LIST_COLS = ("blk_first", "blk_last", "blk_max_tf", "blk_min_dl", "blk_off_ords", "blk_off_tfs")

    def __init__(self, part_dir: str, block_size: int, gen: int = 0):
        self._decoded: OrderedDict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = (
            OrderedDict()
        )
        self._decoded_bytes = 0
        self._decoded_budget = DECODE_CACHE_MB << 20
        self.gen = gen  # generation number (tombstone watermark scoping)
        docs = pq.read_table(os.path.join(part_dir, "docs.parquet"))
        self.doc_ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        self.dl = {
            FIELD_BODY: docs.column("dl_body").to_numpy(zero_copy_only=False),
            FIELD_TITLE: docs.column("dl_title").to_numpy(zero_copy_only=False),
        }
        post = pq.read_table(os.path.join(part_dir, "postings.parquet"))
        f = post.column("field").to_numpy(zero_copy_only=False)
        th = post.column("term_hash").to_numpy(zero_copy_only=False)
        # per-field sorted term arrays + searchsorted point lookup: O(terms)
        # numpy at load (the Python dict-building loop was O(terms)
        # interpreter time per actor cold-start — visible at web scale)
        self._by_field: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for code in np.unique(f):
            m = f == code
            ths = th[m].astype(np.int64)
            rows = np.flatnonzero(m).astype(np.int64)
            o = np.argsort(ths, kind="stable")
            self._by_field[int(code)] = (ths[o], rows[o])
        self.df = post.column("df").to_numpy(zero_copy_only=False)
        self.ords_data, self.ords_off = _binary_views(post.column("ords"))
        self.tfs_data, self.tfs_off = _binary_views(post.column("tfs"))
        self.lists = {name: _list_views(post.column(name)) for name in self._LIST_COLS}
        self.has_positions = "positions" in post.column_names
        if self.has_positions:
            self.pos_data, self.pos_off = _binary_views(post.column("positions"))
        self.block_size = block_size

    def _bin(self, data: np.ndarray, off: np.ndarray, row: int) -> np.ndarray:
        return data[off[row] : off[row + 1]]

    def _list(self, name: str, row: int) -> np.ndarray:
        values, off = self.lists[name]
        return values[off[row] : off[row + 1]]

    def find(self, field: int, term_hash: int) -> int | None:
        """Segment row index of (field, term) — binary search over the
        sorted per-field term array (reference analog: prefix jump-index +
        binary search, DataStructures/DataStructs/Functions.cs:130-193)."""
        got = self._by_field.get(int(field))
        if got is None:
            return None
        ths, rows = got
        i = int(np.searchsorted(ths, term_hash))
        if i < len(ths) and ths[i] == term_hash:
            return int(rows[i])
        return None

    def postings_for(
        self, field: int, term_hash: int, row: int | None = None
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """`row`: pass a segment row already located by find() to skip the
        duplicate lexicon binary search (the routed query path resolves
        every term's row up front for its df)."""
        key = (field, term_hash)
        hit = self._decoded.get(key)
        if hit is not None:
            self._decoded.move_to_end(key)
            return hit
        if row is None:
            row = self.find(field, term_hash)
        if row is None:
            return None
        ords = decode_ords(
            self._bin(self.ords_data, self.ords_off, row),
            self._list("blk_first", row),
            self.block_size,
        )
        tfs = decode_tfs(self._bin(self.tfs_data, self.tfs_off, row))
        sz = ords.nbytes + tfs.nbytes
        if sz <= self._decoded_budget:
            self._decoded[key] = (ords, tfs)
            self._decoded_bytes += sz
            while self._decoded_bytes > self._decoded_budget:
                _, (o, t) = self._decoded.popitem(last=False)
                self._decoded_bytes -= o.nbytes + t.nbytes
        return ords, tfs

    def postings_with_positions(
        self, field: int, term_hash: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """(ords, tfs, flat_positions) — requires an index built with
        store_positions=True (phrase queries)."""
        if not self.has_positions:
            return None
        row = self.find(field, term_hash)
        if row is None:
            return None
        got = self.postings_for(field, term_hash)
        if got is None:
            return None
        ords, tfs = got
        pos = decode_positions(self._bin(self.pos_data, self.pos_off, row), tfs)
        return ords, tfs, pos

    def tf_doc_candidates(
        self, field: int, term_hash: int, limit: int, dead: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """This partition's top-`limit` postings of (field, term) by
        (tf, doc_id) ascending-tail order — a superset contributor to the
        GLOBAL reference-mode truncation cutoff (the global top-limit is
        contained in the union of per-partition top-limits).

        `dead` (sorted tombstoned doc_ids applicable to this generation) is
        filtered out BEFORE the top-limit: otherwise deleted postings could
        hold cutoff slots and displace live ones relative to a truncating
        rebuild of the survivors."""
        got = self.postings_for(field, term_hash)
        if got is None:
            return None
        ords, tfs = got
        docs = self.doc_ids[ords]
        if dead is not None and len(dead):
            alive = ~np.isin(docs, dead)
            docs, tfs = docs[alive], tfs[alive]
            if not len(docs):
                return None
        if len(docs) > limit:
            keep = np.lexsort((docs, tfs))[-limit:]
            docs, tfs = docs[keep], tfs[keep]
        return tfs, docs

    def row_dict(
        self, field: int, term_hash: int, row: int | None = None
    ) -> dict | None:
        """Raw segment row views (for the BMW cursor's selective block
        decode). `row`: a segment row already located by find(), to skip
        the duplicate binary search on the routed query path."""
        if row is None:
            row = self.find(field, term_hash)
        if row is None:
            return None
        out = {
            "df": int(self.df[row]),
            "ords": self._bin(self.ords_data, self.ords_off, row),
            "tfs": self._bin(self.tfs_data, self.tfs_off, row),
        }
        for name in self._LIST_COLS:
            out[name] = self._list(name, row)
        return out


def committed_generation_roots(index_dir: str) -> list[tuple[str, int]]:
    """(root_dir, generation_number) for the base build (gen 0) and every
    COMMITTED incremental generation. A generation commits by writing
    gen.json at the END of its build (pipelines/build.py) — a killed
    update leaves no gen.json and its partial segments stay invisible to
    readers and to refresh_global (ADVICE: generation commit protocol)."""
    out = [(index_dir, 0)]
    for d in sorted(os.listdir(index_dir) if os.path.isdir(index_dir) else []):
        full = os.path.join(index_dir, d)
        if (
            d.startswith("gen-")
            and os.path.isdir(full)
            and os.path.exists(os.path.join(full, "gen.json"))
        ):
            out.append((full, int(d.split("-")[1])))
    return out


def segment_part_dirs_with_gen(index_dir: str) -> list[tuple[str, int]]:
    """(part_dir, generation) across committed generations, deterministic
    (generation, part) order."""
    out: list[tuple[str, int]] = []
    for r, g in committed_generation_roots(index_dir):
        seg = os.path.join(r, "segments")
        if os.path.isdir(seg):
            out.extend(
                (os.path.join(seg, d), g)
                for d in sorted(os.listdir(seg))
                if d.startswith("part-") and not d.endswith(".tmp")
            )
    return out


def segment_part_dirs(index_dir: str) -> list[str]:
    """All partition segment dirs across committed generations."""
    return [p for p, _ in segment_part_dirs_with_gen(index_dir)]


def load_tombstones(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids sorted, gen_watermark aligned) — a tombstone hides the doc
    in generations <= its watermark only, so a doc deleted and later
    re-added (in a newer generation) serves the NEW copy
    (pipelines/update.py delete_docs). Legacy files without the watermark
    column apply to every generation."""
    path = os.path.join(index_dir, "tombstones.parquet")
    if not os.path.exists(path):
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    t = pq.read_table(path)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    if "gen_watermark" in t.column_names:
        wm = t.column("gen_watermark").to_numpy(zero_copy_only=False)
    else:
        wm = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    return ids[order].astype(np.int64), wm[order].astype(np.int64)


class LocalIndex:
    """Exact scorer over a set of partitions (no Ray dependency)."""

    def __init__(self, index_dir: str, parts: list[int] | None = None):
        recover_compaction(index_dir)  # heal a crashed compact swap on open
        with open(os.path.join(index_dir, "stats.json")) as fh:
            self.stats = json.load(fh)
        part_dirs = segment_part_dirs_with_gen(index_dir)
        # `parts` selects positions in the flattened (generation, part) list
        # (for a single-generation index these coincide with part ids)
        self.part_ids = (
            list(range(len(part_dirs))) if parts is None else [p for p in parts if p < len(part_dirs)]
        )
        bs = int(self.stats["block_size"])
        self.parts = [_Part(part_dirs[p][0], bs, gen=part_dirs[p][1]) for p in self.part_ids]
        self._tomb_ids, self._tomb_wm = load_tombstones(index_dir)
        self.has_tombstones = len(self._tomb_ids) > 0
        self._tomb_cache: dict[int, np.ndarray] = {}
        self.avgdl = {
            FIELD_BODY: float(self.stats["avgdl_body"]),
            FIELD_TITLE: float(self.stats["avgdl_title"]),
        }
        self.n_docs = float(self.stats["n_docs"])

    def tombstones_for(self, gen: int) -> np.ndarray:
        """Sorted doc_ids whose tombstone applies to generation `gen`
        (watermark >= gen)."""
        got = self._tomb_cache.get(gen)
        if got is None:
            got = self._tomb_ids[self._tomb_wm >= gen]
            self._tomb_cache[gen] = got
        return got

    def topk(
        self,
        terms: list[TermSpec],
        k: int,
        mode: str = "bm25",
        algo: str = "taat",
        conjunctive: bool = False,
        exclude: list[TermSpec] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k. algo='taat': exhaustive vectorized term-at-a-time.
        algo='bmw' (bm25 only): block-max WAND with selective block decode —
        same results bit-for-bit, decodes only blocks that can matter.
        conjunctive=True: AND semantics — only docs containing EVERY
        globally-known query term are ranked (posting-list intersection;
        valid per partition because a doc's postings are co-located).
        exclude: docs containing ANY of these terms are dropped (NOT
        semantics; a rebuild extension — the reference has no operators).
        Exclusion is exact per partition for the same co-location reason
        and costs one extra postings_for per excluded term — no shuffle."""
        if not terms:
            # no known terms: nothing can match (without this, the
            # conjunctive filter `touched == 0` would match every doc)
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
        if algo == "bmw" and mode == "bm25" and not conjunctive and not exclude:
            if not self.has_tombstones:
                # multi-field included: each cursor carries its own field's
                # dl/avgdl (state/bmw.py); ordinals are shared across fields
                return self._topk_bmw(terms, k)
            # tombstones filter at the candidate stage -> exhaustive path
            algo = "taat"
        out_docs: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for part in self.parts:
            scores = np.zeros(len(part.doc_ids), dtype=np.float64)
            touched = np.zeros(len(part.doc_ids), dtype=np.int32)
            for t in terms:
                got = part.postings_for(t.field, t.term_hash)
                if got is None:
                    continue
                ords, tfs = got
                if mode != "bm25" and t.tf_cut >= 0:
                    # reference truncation: keep exactly the global
                    # top-REF_TRUNCATE postings (Engine.cs:185-199)
                    did = part.doc_ids[ords]
                    keep = (tfs > t.tf_cut) | ((tfs == t.tf_cut) & (did >= t.doc_cut))
                    ords, tfs = ords[keep], tfs[keep]
                    if not len(ords):
                        continue
                dl = part.dl[t.field][ords]
                if mode == "bm25":
                    contrib = bm25_term_scores(tfs, dl, t.idf, t.qtf, self.avgdl[t.field])
                elif t.field == FIELD_TITLE:
                    contrib = ref_title_term_scores(tfs, t.qtf)
                else:
                    contrib = ref_body_term_scores(tfs, t.qtf, self.n_docs, t.cf)
                scores[ords] += contrib
                touched[ords] += 1
            if conjunctive:
                cand = np.flatnonzero(touched == len(terms))
            else:
                cand = np.flatnonzero(touched)
            if exclude and len(cand):
                excl_mask = np.zeros(len(part.doc_ids), dtype=bool)
                for t in exclude:
                    got = part.postings_for(t.field, t.term_hash)
                    if got is not None:
                        excl_mask[got[0]] = True
                cand = cand[~excl_mask[cand]]
            if self.has_tombstones and len(cand):
                alive = ~np.isin(part.doc_ids[cand], self.tombstones_for(part.gen))
                cand = cand[alive]
            if len(cand):
                d, s = topk_by_score(part.doc_ids[cand], scores[cand], k)
                out_docs.append(d)
                out_scores.append(s)
        if not out_docs:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
        return topk_by_score(np.concatenate(out_docs), np.concatenate(out_scores), k)

    def tf_doc_candidates(
        self, field: int, term_hash: int, limit: int = REF_TRUNCATE
    ) -> tuple[np.ndarray, np.ndarray]:
        """Merged top-`limit` (tf, doc_id) candidates across THIS index's
        partitions (global when the index holds all partitions)."""
        tfs_all: list[np.ndarray] = []
        docs_all: list[np.ndarray] = []
        for part in self.parts:
            dead = self.tombstones_for(part.gen) if self.has_tombstones else None
            got = part.tf_doc_candidates(field, term_hash, limit, dead=dead)
            if got is None:
                continue
            tfs_all.append(got[0])
            docs_all.append(got[1])
        if not tfs_all:
            return np.zeros(0, np.uint32), np.zeros(0, np.int64)
        tfs = np.concatenate(tfs_all)
        docs = np.concatenate(docs_all)
        if len(docs) > limit:
            keep = np.lexsort((docs, tfs))[-limit:]
            tfs, docs = tfs[keep], docs[keep]
        return tfs, docs

    def phrase_topk(
        self,
        words: list[str],
        specs: list[TermSpec],
        k: int,
        field: int = FIELD_BODY,
        slop: int = 0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Phrase retrieval: docs where `words` occur IN ORDER with at most
        `slop` extra tokens between consecutive words (slop=0 = exact
        consecutive phrase == substring match on the space-joined token
        stream), ranked by the same BM25 sum as topk() over `specs`.
        Matching is NFA-style subset construction: `cur` holds EVERY
        position of word i that can end a valid chain of words 1..i, so a
        greedy-miss chain (earlier word-i match dead-ends but a later one
        survives) is still found. Requires store_positions=True."""
        out_docs: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        word_hashes = [hash64(w) for w in words]
        for part in self.parts:
            plists = {}
            ok = True
            for h in set(word_hashes):
                got = part.postings_with_positions(field, h)
                if got is None:
                    ok = False
                    break
                ords, tfs, flat_pos = got
                bounds = np.zeros(len(tfs) + 1, dtype=np.int64)
                np.cumsum(tfs, out=bounds[1:])
                plists[h] = (ords, tfs, flat_pos, bounds)
            if not ok or not plists:
                continue
            # candidate docs: intersection of all words' ordinal lists
            cand = None
            for h in set(word_hashes):
                o = plists[h][0]
                cand = o if cand is None else np.intersect1d(cand, o, assume_unique=True)
            if cand is None or len(cand) == 0:
                continue

            # vectorized adjacency over ALL candidate docs at once: encode
            # (doc_ord, position) as one int64 key (ord << 32 | pos); the
            # word-i check is a flat sorted-membership test of key+1 against
            # word i's key set. No per-candidate-doc Python — a stopword-ish
            # phrase costs O(total candidate positions) numpy, not a doc loop.
            def gather_keys(h: int) -> np.ndarray:
                o, _tfs, fp, b = plists[h]
                rows = np.searchsorted(o, cand)  # exact: cand ⊆ o
                starts, ends = b[rows], b[rows + 1]
                lens = (ends - starts).astype(np.int64)
                total = int(lens.sum())
                if total == 0:
                    return np.zeros(0, dtype=np.int64)
                cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
                idx = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(cum, lens)
                    + np.repeat(starts.astype(np.int64), lens)
                )
                pos = fp[idx].astype(np.int64)
                docs_rep = np.repeat(cand.astype(np.int64), lens)
                # keys ascend: cand is sorted, positions ascend within a doc
                return (docs_rep << np.int64(32)) | pos

            cur = gather_keys(word_hashes[0])
            for wi in range(1, len(word_hashes)):
                if not len(cur):
                    break
                keys = gather_keys(word_hashes[wi])
                if not len(keys):
                    cur = keys
                    break
                # word-(i+1) position q survives iff some chain end p has
                # q-(slop+1) <= p <= q-1 (same doc; the doc field lives in
                # the high bits, and a low-position underflow only widens
                # the window to [0, q-1], which equals the true window
                # clipped at position 0 — no cross-doc false hit)
                lo = keys - np.int64(slop + 1)
                j = np.searchsorted(cur, lo, side="left")
                ok = (j < len(cur)) & (cur[np.minimum(j, len(cur) - 1)] <= keys - 1)
                cur = keys[ok]
            if not len(cur):
                continue
            # BM25-score the matching docs with the standard spec accumulation
            m = np.unique(cur >> np.int64(32))
            if self.has_tombstones:
                m = m[~np.isin(part.doc_ids[m], self.tombstones_for(part.gen))]
                if not len(m):
                    continue
            scores = np.zeros(len(m), dtype=np.float64)
            for t in specs:
                got = part.postings_for(t.field, t.term_hash)
                if got is None:
                    continue
                ords, tfs = got
                idxs = np.searchsorted(ords, m)
                idxs = np.clip(idxs, 0, len(ords) - 1)
                hit = ords[idxs] == m
                if not hit.any():
                    continue
                dl = part.dl[t.field][m[hit]]
                scores[hit] += bm25_term_scores(
                    tfs[idxs[hit]], dl, t.idf, t.qtf, self.avgdl[t.field]
                )
            d, s = topk_by_score(part.doc_ids[m], scores, k)
            out_docs.append(d)
            out_scores.append(s)
        if not out_docs:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
        return topk_by_score(np.concatenate(out_docs), np.concatenate(out_scores), k)

    def explain_docs(
        self, specs: list[TermSpec], doc_ids: list[int], mode: str = "bm25"
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Per-(doc, spec) score contributions for the given docs — SAME
        kernels (and reference-mode truncation cutoffs) as topk(), so the
        contributions of a doc sum exactly to its search score. Returns
        flat aligned arrays (doc_id, field, term_hash, tf, contribution)."""
        want = np.asarray(sorted({int(d) for d in doc_ids}), dtype=np.int64)
        o_doc, o_fld, o_th, o_tf, o_c = [], [], [], [], []
        for part in self.parts:
            if not len(want) or not len(part.doc_ids):
                continue
            pos = np.searchsorted(part.doc_ids, want)
            posc = np.minimum(pos, len(part.doc_ids) - 1)
            present = part.doc_ids[posc] == want
            if not present.any():
                continue
            ords_want = posc[present].astype(np.int64)
            docs_here = want[present]
            for t in specs:
                got = part.postings_for(t.field, t.term_hash)
                if got is None:
                    continue
                ords, tfs = got
                if mode != "bm25" and t.tf_cut >= 0:
                    did = part.doc_ids[ords]
                    keep = (tfs > t.tf_cut) | ((tfs == t.tf_cut) & (did >= t.doc_cut))
                    ords, tfs = ords[keep], tfs[keep]
                    if not len(ords):
                        continue
                j = np.searchsorted(ords, ords_want)
                jc = np.minimum(j, max(len(ords) - 1, 0))
                hit = ords[jc] == ords_want
                if not hit.any():
                    continue
                dl = part.dl[t.field][ords_want[hit]]
                tf_hit = tfs[jc[hit]]
                if mode == "bm25":
                    contrib = bm25_term_scores(tf_hit, dl, t.idf, t.qtf, self.avgdl[t.field])
                elif t.field == FIELD_TITLE:
                    contrib = ref_title_term_scores(tf_hit, t.qtf)
                else:
                    contrib = ref_body_term_scores(tf_hit, t.qtf, self.n_docs, t.cf)
                n = int(hit.sum())
                o_doc.append(docs_here[hit])
                o_fld.append(np.full(n, t.field, dtype=np.int64))
                o_th.append(np.full(n, t.term_hash, dtype=np.int64))
                o_tf.append(tf_hit.astype(np.int64))
                o_c.append(contrib.astype(np.float64))
        if not o_doc:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z, z, np.zeros(0, dtype=np.float64)
        return (
            np.concatenate(o_doc),
            np.concatenate(o_fld),
            np.concatenate(o_th),
            np.concatenate(o_tf),
            np.concatenate(o_c),
        )

    def _topk_bmw(self, terms: list[TermSpec], k: int) -> tuple[np.ndarray, np.ndarray]:
        """Per-part selectivity routing (round-5 verdict ask #7): the WAND
        pivot only pays when one list dominates, so the routing decision is
        taken from the per-term dfs BEFORE any cursor is built — the exact
        route then scores from the part's LRU-cached decoded postings (the
        cursors' selective block decode necessarily bypasses that cache),
        and the WAND route builds cursors only for the parts that skip.
        Results are bit-identical either way (same scoring kernel, same
        TermSpec accumulation order — tested)."""
        bs = int(self.stats["block_size"])
        out_docs: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for part in self.parts:
            rows = []
            for si, t in enumerate(terms):
                r = part.find(t.field, t.term_hash)
                if r is not None:
                    rows.append((si, t, r))
            if not rows:
                continue
            # module-attribute reads so tests can monkeypatch the knobs
            ns = sorted((int(part.df[r]) for _si, _t, r in rows), reverse=True)
            rest = sum(ns[1:])
            exact = sum(ns) <= max(_bmw.SHORT_LIST_POSTINGS, 8 * k) or (
                _bmw.WAND_SELECTIVITY_RATIO
                and (
                    len(ns) == 1
                    or rest * _bmw.WAND_SELECTIVITY_RATIO > ns[0]
                    or (_bmw.WAND_MAX_PIVOTS and rest > _bmw.WAND_MAX_PIVOTS)
                )
            )
            if exact:
                scores = np.zeros(len(part.doc_ids), dtype=np.float64)
                touched = np.zeros(len(part.doc_ids), dtype=bool)
                for _si, t, r in rows:  # already in TermSpec order
                    ords, tfs = part.postings_for(t.field, t.term_hash, row=r)
                    scores[ords] += bm25_term_scores(
                        tfs, part.dl[t.field][ords], t.idf, t.qtf, self.avgdl[t.field]
                    )
                    touched[ords] = True
                cand = np.flatnonzero(touched)
                if not len(cand):
                    continue
                d, s = topk_by_score(part.doc_ids[cand], scores[cand], k)
            else:
                cursors = [
                    _Cursor(
                        si, t.qtf * t.idf, self.avgdl[t.field],
                        part.row_dict(t.field, t.term_hash, row=r), bs,
                        dl=part.dl[t.field],
                    )
                    for si, t, r in rows
                ]
                ords, s = bmw_topk(cursors, len(part.doc_ids), k)
                if not len(ords):
                    continue
                d = part.doc_ids[ords]
            out_docs.append(d)
            out_scores.append(s)
        if not out_docs:
            return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
        return topk_by_score(np.concatenate(out_docs), np.concatenate(out_scores), k)


@ray.remote
class IndexShardActor:
    """Stateful stage: segments loaded once per actor (SURVEY.md §2.3 T4)."""

    def __init__(self, index_dir: str, parts: list[int]):
        cap_worker_threads()
        self.index = LocalIndex(index_dir, parts)

    def topk(
        self,
        terms: list[TermSpec],
        k: int,
        mode: str,
        algo: str = "taat",
        exclude: list[TermSpec] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.index.topk(terms, k, mode, algo, exclude=exclude)

    def topk_batch(
        self,
        term_lists: list[list[TermSpec]],
        k: int,
        mode: str,
        algo: str = "taat",
        exclude_lists: list[list[TermSpec] | None] | None = None,
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        excl = exclude_lists or [None] * len(term_lists)
        return [
            self.index.topk(t, k, mode, algo, exclude=e)
            for t, e in zip(term_lists, excl)
        ]

    def phrase_topk(
        self, words: list[str], specs: list[TermSpec], k: int, field: int, slop: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.index.phrase_topk(words, specs, k, field, slop=slop)

    def tf_doc_candidates(
        self, field: int, term_hash: int, limit: int
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.index.tf_doc_candidates(field, term_hash, limit)

    def explain_docs(
        self, specs: list[TermSpec], doc_ids: list[int], mode: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        return self.index.explain_docs(specs, doc_ids, mode)


MAX_EXPAND = 64  # `pre*` expansion cap (ascending term order); the batch
# path (pipelines/query.py) imports this so both surfaces agree


class TermStrings:
    """hash -> term reverse map from the optional `terms/` sidecar
    (pipelines/build.build_term_strings; reference analog: lexicon.txt
    term strings, Indexer/Program.cs:131-138). Sorted-array point lookup;
    loaded lazily and only by explain/debug paths — query serving never
    touches it. At web scale the sidecar is only as big as the vocabulary
    (~10^8 rows), which one coordinator holds comfortably; shard it like
    LexiconShardActor if that ever stops being true."""

    def __init__(self, index_dir: str):
        files = [
            os.path.join(root, "terms", f)
            for root, _g in committed_generation_roots(index_dir)
            if os.path.isdir(os.path.join(root, "terms"))
            for f in sorted(os.listdir(os.path.join(root, "terms")))
            if f.endswith(".parquet")
        ]
        if files:
            t = pq.read_table(files, columns=["term_hash", "term"])
            th = t.column("term_hash").to_numpy(zero_copy_only=False).astype(np.int64)
            terms = t.column("term").combine_chunks()
            o = np.argsort(th, kind="stable")
            self._hashes = th[o]
            self._terms = terms.take(pa.array(o))
        else:
            self._hashes = np.zeros(0, dtype=np.int64)
            self._terms = pa.array([], pa.string())

    def __len__(self) -> int:
        return len(self._hashes)

    def get(self, term_hash: int) -> str | None:
        i = int(np.searchsorted(self._hashes, term_hash))
        if i < len(self._hashes) and self._hashes[i] == term_hash:
            return self._terms[i].as_py()
        return None

    def prefix_terms(self, prefix: str, limit: int = 64) -> list[str]:
        """Distinct vocabulary terms starting with `prefix`, ascending,
        capped at `limit` (deterministic expansion order for `pre*`
        queries). Term-sorted view built lazily on first use; range found
        by binary search, so each call is O(log V + limit)."""
        if not hasattr(self, "_terms_sorted"):
            self._terms_sorted = np.sort(
                np.asarray(self._terms.to_pylist(), dtype=object)
            )
        ts = self._terms_sorted
        lo = int(np.searchsorted(ts, prefix, side="left"))
        out: list[str] = []
        for i in range(lo, len(ts)):
            if not ts[i].startswith(prefix):
                break
            out.append(ts[i])
            if len(out) >= limit:
                break
        return out


@ray.remote
class DocMapShardActor:
    """One slice of the doc_id -> url display map (reference M8: docCRC ->
    title via the sorted title index, Engine.cs:201-207). Each actor owns a
    SUBSET of the docs parquet files: memory per actor = total/N and every
    file is read by exactly ONE actor (no read amplification). Lookups are
    sorted-array searchsorted point reads; the coordinator scatters the id
    list to every actor and merges hits — at 10^12 docs N grows with the
    corpus and the coordinator never holds any of the table."""

    def __init__(self, files: list[str]):
        cap_worker_threads()
        if files:
            have = set(pq.read_schema(files[0]).names)
            cols = ["doc_id"] + [c for c in ("url", "text") if c in have]
            t = pq.read_table(files, columns=cols)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(ids, kind="stable")
            self.ids = ids[o]
            oa = pa.array(o)
            self.urls = (
                t.column("url").combine_chunks().take(oa) if "url" in have else None
            )
            self.texts = (
                t.column("text").combine_chunks().take(oa) if "text" in have else None
            )
        else:
            self.ids = np.zeros(0, dtype=np.int64)
            self.urls = pa.array([], pa.string())
            self.texts = None

    def _find(self, d: int) -> int | None:
        i = int(np.searchsorted(self.ids, d))
        if i < len(self.ids) and self.ids[i] == d:
            return i
        return None

    def get_many(self, ids: list[int]) -> dict[int, str]:
        out: dict[int, str] = {}
        for d in ids:
            i = self._find(d)
            if i is not None and self.urls is not None:
                out[d] = self.urls[i].as_py()
        return out

    def snippet_many(
        self, ids: list[int], terms: list[str], width: int = 160
    ) -> dict[int, str]:
        """doc_id -> snippet window from the stored text (store_text builds).
        Deterministic: the window centers on the earliest occurrence of the
        FIRST term in `terms` that appears (callers pass terms ranked by
        idf desc, so the rarest matching term wins), snapped outward to
        whitespace; falls back to the text head. Case-insensitive find."""
        out: dict[int, str] = {}
        if self.texts is None:
            return out
        for d in ids:
            i = self._find(d)
            if i is None:
                continue
            text = self.texts[i].as_py() or ""
            low = text.lower()
            pos = -1
            for term in terms:
                pos = low.find(term.lower())
                if pos >= 0:
                    break
            if pos < 0:
                pos = 0
            start = max(0, pos - width // 3)
            end = min(len(text), pos + width)
            # snap to whitespace so words are not cut mid-token
            if start > 0:
                ws = text.rfind(" ", 0, start + 1)
                start = ws + 1 if ws >= 0 else start
            if end < len(text):
                ws = text.find(" ", end)
                end = ws if ws >= 0 else end
            snip = text[start:end].strip()
            if start > 0:
                snip = "… " + snip
            if end < len(text):
                snip = snip + " …"
            out[d] = snip
        return out


class Lexicon:
    """Global term stats lookup (df/cf per (field, term_hash)).

    Held by the coordinator. At 10^12-doc scale this table is itself
    sharded (hash by term_hash across lexicon actors); single-map here —
    only query terms are ever looked up, so the coordinator could equally
    fetch-on-miss."""

    def __init__(self, index_dir: str):
        lex_dir = os.path.join(index_dir, "lexicon")
        files = (
            [os.path.join(lex_dir, f) for f in sorted(os.listdir(lex_dir)) if f.endswith(".parquet")]
            if os.path.isdir(lex_dir)
            else []
        )
        # per-field sorted (term_hash, df, cf) arrays + searchsorted: no
        # Python loop over the lexicon at load (O(terms) numpy sort only)
        self._by_field: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        if files:
            t = pq.read_table(files)
            fld = t.column("field").to_numpy(zero_copy_only=False)
            th = t.column("term_hash").to_numpy(zero_copy_only=False).astype(np.int64)
            df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
            cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
            for code in np.unique(fld):
                m = fld == code
                o = np.argsort(th[m], kind="stable")
                self._by_field[int(code)] = (th[m][o], df[m][o], cf[m][o])
        self.n_terms = sum(len(v[0]) for v in self._by_field.values())

    def get(self, field: int, term_hash: int) -> tuple[int, int] | None:
        got = self._by_field.get(int(field))
        if got is None:
            return None
        ths, df, cf = got
        i = int(np.searchsorted(ths, term_hash))
        if i < len(ths) and ths[i] == term_hash:
            return (int(df[i]), int(cf[i]))
        return None


@ray.remote
class LexiconShardActor:
    """One shard of the global lexicon: rows with term_hash % n_shards ==
    shard, held as per-field sorted arrays (the 10^12-doc path — a web
    corpus's lexicon is itself too big for one process; RUNBOOK.md plan,
    now implemented). Point lookups batch per query round-trip."""

    def __init__(self, index_dir: str, shard: int, n_shards: int):
        cap_worker_threads()
        lex_dir = os.path.join(index_dir, "lexicon")
        files = (
            [
                os.path.join(lex_dir, f)
                for f in sorted(os.listdir(lex_dir))
                if f.endswith(".parquet")
            ]
            if os.path.isdir(lex_dir)
            else []
        )
        self._by_field: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        if files:
            t = pq.read_table(files)
            fld = t.column("field").to_numpy(zero_copy_only=False)
            th = t.column("term_hash").to_numpy(zero_copy_only=False).astype(np.int64)
            mine = (th.view(np.uint64) % np.uint64(n_shards)) == np.uint64(shard)
            fld, th = fld[mine], th[mine]
            df = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)[mine]
            cf = t.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)[mine]
            for code in np.unique(fld):
                m = fld == code
                o = np.argsort(th[m], kind="stable")
                self._by_field[int(code)] = (th[m][o], df[m][o], cf[m][o])

    def get_many(
        self, keys: list[tuple[int, int]]
    ) -> list[tuple[int, int] | None]:
        out: list[tuple[int, int] | None] = []
        for field, term_hash in keys:
            got = self._by_field.get(int(field))
            if got is None:
                out.append(None)
                continue
            ths, df, cf = got
            i = int(np.searchsorted(ths, term_hash))
            if i < len(ths) and ths[i] == term_hash:
                out.append((int(df[i]), int(cf[i])))
            else:
                out.append(None)
        return out


class ShardedLexicon:
    """Drop-in for `Lexicon` backed by a LexiconShardActor pool: keys route
    by term_hash % n_shards; `prefetch` batches one round-trip per shard
    for a whole query batch (the coordinator never holds the full table)."""

    def __init__(self, index_dir: str, n_shards: int = 4):
        self.n_shards = n_shards
        self.actors = [
            LexiconShardActor.remote(index_dir, s, n_shards) for s in range(n_shards)
        ]
        self._cache: dict[tuple[int, int], tuple[int, int] | None] = {}

    def _shard_of(self, term_hash: int) -> int:
        return int(np.uint64(np.int64(term_hash)) % np.uint64(self.n_shards))

    def prefetch(self, keys: list[tuple[int, int]]) -> None:
        """One get_many round-trip per shard for every uncached key."""
        need = [k for k in set(keys) if k not in self._cache]
        if not need:
            return
        per_shard: dict[int, list[tuple[int, int]]] = {}
        for k in need:
            per_shard.setdefault(self._shard_of(k[1]), []).append(k)
        futs = {
            s: self.actors[s].get_many.remote(ks) for s, ks in per_shard.items()
        }
        for s, ks in per_shard.items():
            for k, v in zip(ks, ray.get(futs[s])):
                self._cache[k] = v

    def get(self, field: int, term_hash: int) -> tuple[int, int] | None:
        k = (int(field), int(term_hash))
        if k not in self._cache:
            self.prefetch([k])
        return self._cache[k]


def make_term_specs(
    query: str,
    lexicon: Lexicon,
    n_docs: float,
    fields: tuple[int, ...],
    mode: str,
) -> list[TermSpec]:
    """Query words -> TermSpecs with global stats resolved; unknown words
    contribute nothing (reference behavior, Engine.cs:146-153)."""
    return make_term_specs_from_counts(
        parse_query(query), lexicon, n_docs, fields, mode
    )


def make_term_specs_from_counts(
    counts: "Counter[str]",
    lexicon: Lexicon,
    n_docs: float,
    fields: tuple[int, ...],
    mode: str,
) -> list[TermSpec]:
    specs: list[TermSpec] = []
    for word, qtf in counts.items():
        th = hash64(word)
        for field in fields:
            st = lexicon.get(field, th)
            if st is None:
                continue
            df, cf = st
            idf = bm25_idf(float(df), n_docs) if mode == "bm25" else 0.0
            specs.append(TermSpec(field, th, float(qtf), idf, float(cf), df=float(df)))
    return specs


_SCOPE_TO_FIELD = {"title": FIELD_TITLE, "body": FIELD_BODY}


def _split_scope(w: str) -> tuple[str, str]:
    """'title:word' -> ('title', 'word'); unknown prefixes (or a bare
    'title:') stay literal: ('', w)."""
    if ":" in w:
        p, rest = w.split(":", 1)
        if p in _SCOPE_TO_FIELD and rest:
            return p, rest
    return "", w


def parse_scoped_counts(query: str) -> "Counter[tuple[str, str]]":
    """parse_query plus field scoping: each space-separated word may carry
    a `title:` / `body:` prefix restricting it to that field; scope ''
    means the engine's default field set. Batch-pipeline counterpart of
    the online `syntax='ops'` scoping (SearchEngine._ops_counts)."""
    scoped: Counter[tuple[str, str]] = Counter()
    for w in query.split(" "):
        if w:
            scoped[_split_scope(w.lower())] += 1
    return scoped


def make_term_specs_scoped(
    scoped: "Counter[tuple[str, str]]",
    lexicon: Lexicon,
    n_docs: float,
    fields: tuple[int, ...],
    mode: str,
) -> list[TermSpec]:
    """Scoped counts {(scope, word): qtf} -> TermSpecs. scope '' means the
    engine's default field set; 'title'/'body' restrict the word to that
    single field, INTERSECTED with the served fields (scoping to a field
    the engine doesn't serve contributes nothing — same contract as an
    OOV word). The rebuild extension behind `title:word` query syntax;
    the reference query language has no operators (Engine.cs:127-139)."""
    specs: list[TermSpec] = []
    for (scope, word), qtf in scoped.items():
        fs = (
            fields
            if not scope
            else tuple(f for f in fields if f == _SCOPE_TO_FIELD[scope])
        )
        if not fs:
            continue
        specs.extend(
            make_term_specs_from_counts(
                Counter({word: qtf}), lexicon, n_docs, fs, mode
            )
        )
    return specs


def with_ref_cutoffs(
    specs: list[TermSpec],
    candidates_fn,
    limit: int = REF_TRUNCATE,
    cache: dict | None = None,
) -> list[TermSpec]:
    """Resolve reference-mode truncation cutoffs for terms with global
    df > limit. `candidates_fn(field, term_hash, limit)` must return the
    GLOBAL top-limit (tfs, docs) candidates (LocalIndex.tf_doc_candidates
    when one index holds every partition; a shard scatter-gather merge in
    SearchEngine). The boundary posting in (tf, doc_id)-ascending tail
    order becomes (tf_cut, doc_cut)."""
    from dataclasses import replace

    out: list[TermSpec] = []
    for t in specs:
        if t.df <= limit:
            out.append(t)
            continue
        key = (t.field, t.term_hash, limit)
        if cache is not None and key in cache:
            tf_cut, doc_cut = cache[key]
        else:
            tfs, docs = candidates_fn(t.field, t.term_hash, limit)
            if len(docs) < limit:  # lexicon df counts generations a
                out.append(t)  # truncated view can't see; no cutoff
                continue
            order = np.lexsort((docs, tfs))
            b = order[-limit]  # the smallest KEPT posting
            tf_cut, doc_cut = int(tfs[b]), int(docs[b])
            if cache is not None:
                cache[key] = (tf_cut, doc_cut)
        out.append(replace(t, tf_cut=tf_cut, doc_cut=doc_cut))
    return out


def _parse_quoted_phrase(query: str) -> tuple[str, int] | None:
    """`"alpha beta"` -> ("alpha beta", 0); `"alpha beta"~2` -> (..., 2);
    None when the query is not a single whole-query quoted phrase."""
    q = query.strip()
    if not q.startswith('"'):
        return None
    end = q.find('"', 1)
    if end < 0:
        return None
    phrase = q[1:end]
    rest = q[end + 1 :].strip()
    if not rest:
        return (phrase, 0)
    if rest.startswith("~") and rest[1:].isdigit():
        return (phrase, int(rest[1:]))
    return None  # trailing terms after the quote: unsupported mix


class SearchEngine:
    """Online scatter-gather coordinator over an IndexShardActor pool."""

    def __init__(
        self,
        index_dir: str,
        n_shards: int = 4,
        mode: str = "bm25",
        fields: tuple[int, ...] = (FIELD_BODY, FIELD_TITLE),
        algo: str = "taat",  # "bmw" = block-max WAND
        lexicon_shards: int | None = None,  # None: in-process sorted arrays;
        # N: LexiconShardActor pool (the 10^12-doc path — coordinator never
        # holds the full term table; batch queries prefetch per shard)
    ):
        recover_compaction(index_dir)  # heal a crashed compact swap on open
        self.index_dir = index_dir
        self.mode = mode
        self.algo = algo
        self.fields = fields
        self.lexicon = (
            ShardedLexicon(index_dir, lexicon_shards)
            if lexicon_shards
            else Lexicon(index_dir)
        )
        with open(os.path.join(index_dir, "stats.json")) as fh:
            self.stats = json.load(fh)
        self.n_docs = float(self.stats["n_docs"])
        all_parts = list(range(len(segment_part_dirs(index_dir))))
        n_shards = max(1, min(n_shards, max(1, len(all_parts))))
        self.shards = [
            IndexShardActor.remote(index_dir, all_parts[i::n_shards]) for i in range(n_shards)
        ]

    def _global_candidates(self, field: int, term_hash: int, limit: int):
        """Scatter-gather per-shard top-limit (tf, doc) candidates and merge
        — O(n_shards * limit) ints per hot term, cached per coordinator."""
        parts = ray.get(
            [s.tf_doc_candidates.remote(field, term_hash, limit) for s in self.shards]
        )
        tfs = np.concatenate([p[0] for p in parts])
        docs = np.concatenate([p[1] for p in parts])
        if len(docs) > limit:
            keep = np.lexsort((docs, tfs))[-limit:]
            tfs, docs = tfs[keep], docs[keep]
        return tfs, docs

    def _resolve_specs(
        self, query: str, fields=None, counts: Counter[str] | None = None,
        scoped: "Counter[tuple[str, str]] | None" = None,
    ) -> list[TermSpec]:
        if scoped is not None:
            specs = make_term_specs_scoped(
                scoped, self.lexicon, self.n_docs, fields or self.fields, self.mode
            )
        else:
            specs = make_term_specs_from_counts(
                parse_query(query) if counts is None else counts,
                self.lexicon, self.n_docs, fields or self.fields, self.mode,
            )
        if specs and self.mode == "reference":
            if not hasattr(self, "_cutoff_cache"):
                self._cutoff_cache: dict = {}
            specs = with_ref_cutoffs(
                specs, self._global_candidates, cache=self._cutoff_cache
            )
        return specs

    def _ops_counts(
        self, query: str
    ) -> tuple["Counter[tuple[str, str]]", Counter[str] | None]:
        """syntax='ops' parsing: `-word` excludes, `word*` prefix-expands
        (term-strings sidecar, MAX_EXPAND cap), `title:word` / `body:word`
        scope a positive literal to one field. Returns (scoped positive
        counts keyed (scope, word) with scope '' = default fields,
        exclusion counts or None). Negated/prefix terms are not scoped."""
        lit, pre, neg = parse_query_ops(query)
        scoped: Counter[tuple[str, str]] = Counter()
        for w, qtf in lit.items():
            scoped[_split_scope(w)] += qtf
        if pre:
            if not hasattr(self, "_term_strings"):
                self._term_strings = TermStrings(self.index_dir)
            for p, qtf in pre.items():
                for t in self._term_strings.prefix_terms(p, MAX_EXPAND):
                    scoped[("", t)] += qtf
        return scoped, (Counter(neg) if neg else None)

    def shutdown(self) -> None:
        """Kill the shard (and lexicon-shard) actors. Each actor reserves a
        CPU slot; a coordinator left alive starves later Ray Data jobs of
        workers (measured: 32 leaked actors tripled unrelated pipeline
        walls). Call when done with an engine."""
        for a in self.shards:
            ray.kill(a)
        self.shards = []
        for a in getattr(self, "_docmap", []):
            ray.kill(a)
        self._docmap = []
        lex = getattr(self, "lexicon", None)
        for a in getattr(lex, "actors", []):
            ray.kill(a)
        if lex is not None and hasattr(lex, "actors"):
            lex.actors = []

    def search(
        self, query: str, k: int = 10, syntax: str = "plain"
    ) -> list[tuple[int, float]]:
        """syntax='plain': reference-compatible parser (every word is a
        positive term). syntax='ops': `-word` negation + `word*` prefix
        expansion + whole-query `"quoted phrase"` / `"quoted phrase"~N`
        (Lucene-style slop) routing (rebuild extensions; see _ops_counts).
        A quoted query must be the ENTIRE query — mixing a phrase with
        loose terms is not supported (explicit 'not supported' beats a
        silently different ranking)."""
        exclude = None
        if syntax == "ops":
            ph = _parse_quoted_phrase(query)
            if ph is not None:
                phrase, slop = ph
                return self.phrase_search(phrase, k=k, slop=slop)
            scoped, excl_counts = self._ops_counts(query)
            specs = self._resolve_specs(query, scoped=scoped)
            if excl_counts:
                exclude = make_term_specs_from_counts(
                    excl_counts, self.lexicon, self.n_docs, self.fields, self.mode
                )
        else:
            specs = self._resolve_specs(query)
        if not specs:
            return []
        parts = ray.get(
            [
                s.topk.remote(specs, k, self.mode, self.algo, exclude)
                for s in self.shards
            ]
        )
        docs = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0)
        d, s = topk_by_score(docs, scores, k)
        return [(int(di), float(si)) for di, si in zip(d, s)]

    def phrase_search(
        self, query: str, k: int = 10, field: int = FIELD_BODY, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Phrase query (words in order, <= `slop` extra tokens between
        consecutive words; slop=0 = exact consecutive phrase), BM25-ranked.
        Requires an index built with store_positions=True."""
        words = [w.lower() for w in query.split(" ") if w]
        if not words:
            return []
        specs = make_term_specs(query, self.lexicon, self.n_docs, (field,), "bm25")
        if len({hash64(w) for w in words} - {t.term_hash for t in specs}):
            return []  # a phrase word is not a known token -> cannot match
        parts = ray.get(
            [sh.phrase_topk.remote(words, specs, k, field, slop) for sh in self.shards]
        )
        docs = np.concatenate([p[0] for p in parts]) if parts else np.zeros(0, np.int64)
        scores = np.concatenate([p[1] for p in parts]) if parts else np.zeros(0)
        d, s = topk_by_score(docs, scores, k)
        return [(int(di), float(si)) for di, si in zip(d, s)]

    def hydrate(self, doc_ids: list[int], n_map_shards: int = 4) -> dict[int, str]:
        """doc_id -> url display resolution via a DocMapShardActor pool
        (lazily created on first call; killed by shutdown()). The
        coordinator never materializes the docs table — each actor loads
        its own file subset once and answers point lookups; misses render
        as the raw id (docstring of DocMapShardActor)."""
        self._ensure_docmap(n_map_shards)
        out: dict[int, str] = {int(d): str(d) for d in doc_ids}
        if self._docmap and doc_ids:
            ids = [int(d) for d in doc_ids]
            for hits in ray.get([a.get_many.remote(ids) for a in self._docmap]):
                out.update(hits)
        return out

    def _ensure_docmap(self, n_map_shards: int = 4) -> None:
        if not hasattr(self, "_docmap"):
            files = [
                os.path.join(root, "docs", f)
                for root, _g in committed_generation_roots(self.index_dir)
                if os.path.isdir(os.path.join(root, "docs"))
                for f in sorted(os.listdir(os.path.join(root, "docs")))
                if f.endswith(".parquet")
            ]
            n = max(1, min(n_map_shards, len(files)))
            self._docmap = (
                [DocMapShardActor.remote(files[i::n]) for i in range(n)] if files else []
            )

    def snippets(
        self,
        doc_ids: list[int],
        query: str,
        width: int = 160,
        n_map_shards: int = 4,
        syntax: str = "plain",
    ) -> dict[int, str]:
        """doc_id -> snippet for result display (store_text builds only;
        returns {} otherwise). Terms are ranked rarest-first (df asc) so the
        window centers on the most informative matching term. Point reads
        via the same DocMapShardActor pool as hydrate — the coordinator
        never loads the docs table."""
        self._ensure_docmap(n_map_shards)
        if not self._docmap or not doc_ids:
            return {}
        if syntax == "ops":
            scoped, _excl = self._ops_counts(query)
            counts = Counter()
            for (_s, w), qtf in scoped.items():
                counts[w] += qtf
        else:
            counts = parse_query(query)
        specs = make_term_specs_from_counts(
            counts, self.lexicon, self.n_docs, self.fields, self.mode
        )
        by_rarity = sorted(specs, key=lambda t: (t.df, t.term_hash))
        seen: set[str] = set()
        terms: list[str] = []
        for t in by_rarity:
            for w in counts:
                if hash64(w) == t.term_hash and w not in seen:
                    seen.add(w)
                    terms.append(w)
        if not terms:
            terms = sorted(counts)
        ids = [int(d) for d in doc_ids]
        out: dict[int, str] = {}
        for hits in ray.get(
            [a.snippet_many.remote(ids, terms, width) for a in self._docmap]
        ):
            out.update(hits)
        return out

    def explain(self, query: str, k: int = 10) -> list[dict]:
        """Per-term score breakdown for the query's top-k (reference has no
        explain; this is the debug surface SURVEY §1.1's term strings make
        possible). Each entry: {doc_id, score, terms: [{term, field,
        term_hash, tf, contribution}]}; contributions sum to `score`
        exactly (same kernels, LocalIndex.explain_docs). Term strings
        resolve from the `terms/` sidecar when the index was built with
        term_strings=True, falling back to the query's own words."""
        specs = self._resolve_specs(query)
        if not specs:
            return []
        res = self.search(query, k)
        if not res:
            return []
        doc_ids = [d for d, _ in res]
        parts = ray.get(
            [s.explain_docs.remote(specs, doc_ids, self.mode) for s in self.shards]
        )
        docs = np.concatenate([p[0] for p in parts])
        flds = np.concatenate([p[1] for p in parts])
        ths = np.concatenate([p[2] for p in parts])
        tfs = np.concatenate([p[3] for p in parts])
        contribs = np.concatenate([p[4] for p in parts])
        if not hasattr(self, "_term_strings"):
            self._term_strings = TermStrings(self.index_dir)
        by_word = {hash64(w): w for w in parse_query(query)}

        def term_of(h: int) -> str:
            return self._term_strings.get(h) or by_word.get(h) or f"0x{h & 0xFFFFFFFFFFFFFFFF:016x}"

        out = []
        for d, score in res:
            m = docs == d
            terms = [
                {
                    "term": term_of(int(h)),
                    "field": int(f),
                    "term_hash": int(h),
                    "tf": int(tf),
                    "contribution": float(c),
                }
                for f, h, tf, c in zip(flds[m], ths[m], tfs[m], contribs[m])
            ]
            terms.sort(key=lambda e: -e["contribution"])
            out.append({"doc_id": int(d), "score": float(score), "terms": terms})
        return out

    def suggest(
        self,
        prefix: str,
        k: int = 5,
        field: int | None = None,
        with_meta: bool = False,
    ) -> list[dict] | tuple[list[dict], bool]:
        """Autocomplete: top-k vocabulary completions of `prefix` by global
        cf desc, term asc (the serving analog of textops.suggest_terms).
        Candidates come from the TermStrings sidecar's sorted range scan —
        capped at max(32k, 256) ascending terms, so a prefix with more
        completions than the cap may miss high-cf terms beyond it (the
        batch op is the exact full-lexicon path). Truncation is DETECTED
        (over-fetch by one) and surfaced: with_meta=True returns
        (suggestions, truncated) so /suggest can flag results that may
        disagree with the exact batch op (round-3 ADVICE). Stats are
        lexicon point lookups (sharded-lexicon prefetch batches one
        round-trip/shard)."""
        if not hasattr(self, "_term_strings"):
            self._term_strings = TermStrings(self.index_dir)
        f = self.fields[0] if field is None else field
        cap = max(k * 32, 256)
        cands = self._term_strings.prefix_terms(prefix, limit=cap + 1)
        truncated = len(cands) > cap
        cands = cands[:cap]
        keys = [(f, hash64(t)) for t in cands]
        if isinstance(self.lexicon, ShardedLexicon):
            self.lexicon.prefetch(keys)
        scored = []
        for t, (fld, th) in zip(cands, keys):
            st = self.lexicon.get(fld, th)
            if st is not None:
                scored.append((-st[1], t))
        scored.sort()
        out = [{"term": t, "cf": int(-neg)} for neg, t in scored[:k]]
        return (out, truncated) if with_meta else out

    def search_hydrated(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        res = self.search(query, k)
        urls = self.hydrate([d for d, _ in res])
        return [(urls[d], s) for d, s in res]

    def search_batch(
        self, queries: list[str], k: int = 10, syntax: str = "plain"
    ) -> list[list[tuple[int, float]]]:
        """Batched scatter-gather: one round trip per shard for ALL queries."""
        if syntax == "ops":
            parsed = [self._ops_counts(q) for q in queries]
            word_lists = [
                [w for _s, w in c] + list(e or ()) for c, e in parsed
            ]
        else:
            parsed = None
            word_lists = [list(parse_query(q)) for q in queries]
        if isinstance(self.lexicon, ShardedLexicon):
            # one get_many round-trip per lexicon shard for the WHOLE batch
            self.lexicon.prefetch(
                [(f, hash64(w)) for ws in word_lists for w in ws for f in self.fields]
            )
        if parsed is not None:
            spec_lists = [
                self._resolve_specs(q, scoped=c) for q, (c, _e) in zip(queries, parsed)
            ]
            exclude_lists = [
                make_term_specs_from_counts(
                    e, self.lexicon, self.n_docs, self.fields, self.mode
                )
                if e
                else None
                for _c, e in parsed
            ]
        else:
            spec_lists = [self._resolve_specs(q) for q in queries]
            exclude_lists = None
        futures = [
            s.topk_batch.remote(spec_lists, k, self.mode, self.algo, exclude_lists)
            for s in self.shards
        ]
        per_shard = ray.get(futures)
        out = []
        for qi in range(len(queries)):
            docs = np.concatenate([shard[qi][0] for shard in per_shard])
            scores = np.concatenate([shard[qi][1] for shard in per_shard])
            d, s = topk_by_score(docs, scores, k)
            out.append([(int(di), float(si)) for di, si in zip(d, s)])
        return out
