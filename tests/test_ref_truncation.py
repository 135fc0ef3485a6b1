"""The reference Engine reads only the top-1000 postings per term by tf
(Engine.cs:185-199). The conformance oracle reproduces it literally;
fixtures are sized so it is a no-op there (FIXTURES.md §1)."""

from __future__ import annotations

from searchengine_ray.oracle import brute_topk, build_brute_index
from searchengine_ray.schemas import FIELD_BODY


def _corpus(n_docs: int):
    # doc i contains 'hot' with tf = 1 + (i % 7); rare docs get 'rare'
    docs = []
    for i in range(n_docs):
        body = " ".join(["hot"] * (1 + i % 7)) + (" rare" if i < 3 else "")
        docs.append((i, body + "\n", None))
    return build_brute_index(docs)


def test_truncation_noop_below_limit():
    idx = _corpus(500)
    full = brute_topk(idx, "hot", k=10, fields=(FIELD_BODY,))
    trunc = brute_topk(idx, "hot", k=10, fields=(FIELD_BODY,), ref_truncate=1000)
    assert full == trunc


def test_truncation_changes_results_above_limit():
    idx = _corpus(3000)  # df(hot) = 3000 > 1000
    full = brute_topk(idx, "hot rare", k=10, mode="reference", fields=(FIELD_BODY,))
    trunc = brute_topk(idx, "hot rare", k=10, mode="reference", fields=(FIELD_BODY,), ref_truncate=1000)
    # truncation keeps only the 1000 highest-tf 'hot' postings: docs whose
    # tf(hot) is low can vanish from the scored set
    assert full != trunc
    # truncation can only REMOVE contributions: any doc present in both
    # rankings scores at most its full-scan score ('rare' df=3 untouched,
    # but a doc's low-tf 'hot' posting may have been cut)
    full_map = dict(full)
    for d, s in trunc:
        if d in full_map:
            assert s <= full_map[d]


def test_truncation_tie_rule_deterministic():
    idx = _corpus(2500)
    a = brute_topk(idx, "hot", k=10, fields=(FIELD_BODY,), ref_truncate=1000)
    b = brute_topk(idx, "hot", k=10, fields=(FIELD_BODY,), ref_truncate=1000)
    assert a == b
