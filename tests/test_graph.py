"""PageRank on a hand-computable graph: 4 dense doc_ids, k=2, 1-2 rounds
computed by hand in integer micro-units (floor-division contract)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.pipelines import graph as gp


def _write_docs(tmp_path, n):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["t"] * n, pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _expected(n, iters, k):
    ids = np.arange(n, dtype=np.int64)
    r = np.full(n, 1_000_000, np.int64)
    for _ in range(iters):
        nxt = np.zeros(n, np.int64)
        h = ids % 1000003
        for j in range(1, k + 1):
            v = (h * (h + j)) % n
            np.add.at(nxt, v, r // k)
        r = 150_000 + (85 * nxt) // 100
    return r


def test_pagerank_matches_reference_loop(tmp_path, ray_session):
    d = _write_docs(tmp_path, 7)
    out = (
        gp.pagerank(d, iters=3, k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _expected(7, iters=3, k=4)
    assert list(out["doc_id"]) == list(range(7))
    assert list(out["rank_micro"]) == list(want)


def test_pagerank_mass_and_base(tmp_path, ray_session):
    # k=1 on 3 nodes: each node has exactly one out-edge; every surviving
    # rank is >= the 150_000 teleport base and total mass stays bounded
    d = _write_docs(tmp_path, 3)
    out = gp.pagerank(d, iters=2, k=1).to_pandas()
    assert len(out) == 3
    assert (out["rank_micro"] >= 150_000).all()
    want = _expected(3, iters=2, k=1)
    got = out.sort_values("doc_id")["rank_micro"].to_numpy()
    assert (got == want).all()


def _expected_hits(n, iters, k):
    ids = np.arange(n, dtype=np.int64)
    h = np.full(n, 1_000_000, np.int64)
    a = np.zeros(n, np.int64)
    hh = ids % 1000003
    edges = [(hh * (hh + j)) % n for j in range(1, k + 1)]
    for _ in range(iters):
        ar = np.zeros(n, np.int64)
        for v in edges:
            np.add.at(ar, v, h)
        a = ar * 1_000_000 // ar.max() if ar.max() else np.zeros(n, np.int64)
        hr = np.zeros(n, np.int64)
        for v in edges:
            hr += a[v]
        h = hr * 1_000_000 // hr.max() if hr.max() else np.zeros(n, np.int64)
    return a, h


def test_hits_matches_reference_loop(tmp_path, ray_session):
    d = _write_docs(tmp_path, 9)
    out = (
        gp.hits(d, iters=2, k=4).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    a, h = _expected_hits(9, iters=2, k=4)
    assert list(out["doc_id"]) == list(range(9))
    assert list(out["authority_micro"]) == list(a)
    assert list(out["hub_micro"]) == list(h)
    # normalization: the best authority and best hub sit at exactly 1e6
    assert out["authority_micro"].max() == 1_000_000
    assert out["hub_micro"].max() == 1_000_000


def test_anchor_texts_matches_reference_loop(tmp_path, ray_session):
    """anchor_texts == a pure-Python evaluation of the derived-graph rule:
    doc u's j-th edge carries anchor term T_u[(j-1) % L_u] to
    v = (h*(h+j)) % n, h = u % 1000003; top-3 per target by
    (count desc, term asc)."""
    from collections import Counter, defaultdict

    n = 9
    texts = [
        "alpha beta gamma",
        "delta",
        "",  # no tokens: out-edges carry no anchors
        "echo foxtrot",
        "golf golf hotel india",
        "juliet kilo",
        "lima",
        "mike november oscar papa",
        "quebec",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["t"] * n, pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    per_target = defaultdict(Counter)
    for u, s in enumerate(texts):
        toks = s.split()
        if not toks:
            continue
        h = u % 1000003
        for j in range(1, 5):
            v = (h * (h + j)) % n
            per_target[v][toks[(j - 1) % len(toks)]] += 1
    want = []
    for v, ctr in per_target.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (term, cf) in enumerate(ranked, 1):
            want.append((v, rk, term, cf))
    want.sort()

    out = (
        gp.anchor_texts(str(tmp_path), k=4, topk=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    got = list(zip(out.doc_id, out["rank"], out.term, out.anchor_cf))
    assert got == want
