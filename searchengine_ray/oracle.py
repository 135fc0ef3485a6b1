"""Brute-force oracles (pure Python/numpy, no Ray, no index) used to prove
rank-identity of the engine (SURVEY.md §5.2).

Builds in-memory postings with the pure-Python reference tokenizer
(`tokenize_py`) — a fully independent implementation path from the
vectorized engine — then scores every candidate doc exhaustively with the
SAME scoring kernels (functions/scoring.py), so any engine bug in
extraction, tokenization, hashing, partitioning, encoding, decoding or
merging shows up as a rank mismatch.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field as dc_field

import numpy as np

from .functions.scoring import (
    bm25_idf,
    bm25_term_scores,
    ref_body_term_scores,
    ref_title_term_scores,
    topk_by_score,
)
from .functions.tokenize import parse_query, tokenize_py
from .schemas import FIELD_BODY, FIELD_TITLE


@dataclass
class BruteIndex:
    n_docs: int = 0
    doc_ids: list[int] = dc_field(default_factory=list)
    # (field, term) -> {doc_id: tf}
    postings: dict[tuple[int, str], dict[int, int]] = dc_field(default_factory=dict)
    dl: dict[tuple[int, int], int] = dc_field(default_factory=dict)  # (field, doc_id) -> dl
    total_len: dict[int, int] = dc_field(default_factory=dict)
    tokens: dict[tuple[int, int], list[str]] = dc_field(default_factory=dict)  # (field, doc_id) -> stream


def build_brute_index(docs: list[tuple[int, str, str | None]]) -> BruteIndex:
    """docs: (doc_id, body_text, title_text-or-None)."""
    idx = BruteIndex()
    for doc_id, body, title in docs:
        idx.n_docs += 1
        idx.doc_ids.append(doc_id)
        for field, text in ((FIELD_BODY, body), (FIELD_TITLE, title)):
            if text is None:
                continue
            toks = tokenize_py(text)
            idx.tokens[(field, doc_id)] = toks
            idx.dl[(field, doc_id)] = len(toks)
            idx.total_len[field] = idx.total_len.get(field, 0) + len(toks)
            for w, tf in Counter(toks).items():
                idx.postings.setdefault((field, w), {})[doc_id] = tf
    return idx


def _chain_exists(toks: list[str], words: list[str], slop: int) -> bool:
    """Ordered-proximity reference matcher: positions p1 < ... < pn of
    words 1..n with p_{i+1} - p_i <= slop + 1 (simple NFA forward pass)."""
    cur = [i for i, t in enumerate(toks) if t == words[0]]
    for w in words[1:]:
        if not cur:
            return False
        curset = set(cur)
        cur = [
            q
            for q, t in enumerate(toks)
            if t == w and any((q - slop - 1) <= p <= q - 1 for p in curset)
        ]
    return bool(cur)


def brute_phrase_topk(
    idx: BruteIndex, query: str, k: int = 10, field: int = FIELD_BODY, slop: int = 0
) -> list[tuple[int, float]]:
    """Phrase oracle: docs whose kept-token stream contains `query`'s words
    in order within `slop` extra tokens per step (slop=0 = consecutive),
    BM25-ranked with the same spec accumulation as brute_topk."""
    words = [w.lower() for w in query.split(" ") if w]
    if not words:
        return []
    matched = []
    L = len(words)
    for doc_id in idx.doc_ids:
        toks = idx.tokens.get((field, doc_id), [])
        if slop == 0:
            hit = any(toks[i : i + L] == words for i in range(len(toks) - L + 1))
        else:
            hit = _chain_exists(toks, words, slop)
        if hit:
            matched.append(doc_id)
    if not matched:
        return []
    matched_set = set(matched)
    full = brute_topk(idx, query, k=idx.n_docs, mode="bm25", fields=(field,))
    kept = [(d, s) for d, s in full if d in matched_set]
    # docs that matched the phrase but scored 0 cannot exist (every phrase
    # word is a posting), so `kept` covers all matches
    d = np.fromiter((x for x, _ in kept), dtype=np.int64, count=len(kept))
    s = np.fromiter((x for _, x in kept), dtype=np.float64, count=len(kept))
    dd, ss = topk_by_score(d, s, k)
    return [(int(a), float(b)) for a, b in zip(dd, ss)]


def brute_topk(
    idx: BruteIndex,
    query: str,
    k: int = 10,
    mode: str = "bm25",
    fields: tuple[int, ...] = (FIELD_BODY, FIELD_TITLE),
    ref_truncate: int | None = None,
    conjunctive: bool = False,
) -> list[tuple[int, float]]:
    """Exhaustive scorer. `ref_truncate=1000` reproduces the reference
    Engine's literal behavior of reading only the top-N postings by tf
    (stored tf-ascending, read from the tail — Engine.cs:185-199). The
    reference's order among equal-tf postings at the cut boundary is
    thread-timing-dependent (SURVEY.md §1.3.6); this oracle fixes the tie
    deterministically as (tf asc, doc_id asc) -> keep the tail, i.e. among
    boundary ties the larger doc_ids survive. df/cf stay GLOBAL (the
    reference reads them from the full frequency tables, Engine.cs:146-153).
    Fixtures keep every df < 1000 so truncation is a no-op there."""
    counts = parse_query(query)
    scores: dict[int, float] = {}
    n = float(idx.n_docs)
    for word, qtf in counts.items():
        for field in fields:
            plist = idx.postings.get((field, word))
            if not plist:
                continue
            avgdl = idx.total_len.get(field, 0) / n if n else 0.0
            df = float(len(plist))
            cf = float(sum(plist.values()))
            docs = np.fromiter(plist.keys(), dtype=np.int64, count=len(plist))
            tfs = np.fromiter(plist.values(), dtype=np.uint32, count=len(plist))
            if ref_truncate is not None and len(docs) > ref_truncate:
                keep = np.lexsort((docs, tfs))[-ref_truncate:]
                docs, tfs = docs[keep], tfs[keep]
            if mode == "bm25":
                dl = np.array([idx.dl[(field, int(d))] for d in docs], dtype=np.uint32)
                contrib = bm25_term_scores(tfs, dl, bm25_idf(df, n), float(qtf), avgdl)
            elif field == FIELD_TITLE:
                contrib = ref_title_term_scores(tfs, float(qtf))
            else:
                contrib = ref_body_term_scores(tfs, float(qtf), n, cf)
            for d, c in zip(docs.tolist(), contrib.tolist()):
                scores[d] = scores.get(d, 0.0) + c
    if conjunctive:
        # AND semantics: keep docs matched by EVERY (field, word) pair that
        # exists in the index (mirrors LocalIndex.topk(conjunctive=True))
        known = [
            (f, w) for w in counts for f in fields if idx.postings.get((f, w))
        ]
        if known:
            scores = {
                d: s
                for d, s in scores.items()
                if all(d in idx.postings[(f, w)] for f, w in known)
            }
        else:
            scores = {}
    if not scores:
        return []
    d = np.fromiter(scores.keys(), dtype=np.int64, count=len(scores))
    s = np.fromiter(scores.values(), dtype=np.float64, count=len(scores))
    dd, ss = topk_by_score(d, s, k)
    return [(int(a), float(b)) for a, b in zip(dd, ss)]
