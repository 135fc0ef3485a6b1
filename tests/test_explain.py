"""Term-strings sidecar + explain surface (round-3 additions).

- build_term_strings writes a deterministic (term_hash -> term) reverse
  map (min-by-term per hash; reference lexicon strings analog,
  /root/reference/Indexer/Program.cs:131-138).
- SearchEngine.explain's per-term contributions sum exactly to the
  search() score (same kernels).
- hydrate goes through the DocMapShardActor pool — the coordinator never
  materializes the docs table.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import numpy as np
import pytest

from searchengine_ray.functions.hashing import hash64
from searchengine_ray.functions.tokenize import parse_query, tokenize_py
from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.state.shards import SearchEngine, TermStrings

SF_DIR = "/root/testdata/sf0.001"

DOC_QUERIES = [
    "join hash",
    "dup",
    "spark window stream",
    "the the fast",
    "customer order line",
    "query",
    "merge sort merge",
    "big data vector",
    "agg group value key",
    "dup batch",
    "slow scan table column",
    "part row small",
]


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, ray_session) -> str:
    d = str(tmp_path_factory.mktemp("idx_explain"))
    build_index(
        SF_DIR,
        d,
        BuildConfig(num_partitions=4, lang_filter=None, term_strings=True),
        source="documents",
    )
    return d


def test_sidecar_maps_every_doc_query_term(index_dir):
    """Every DOC_QUERIES term present in the corpus maps hash -> string."""
    ts = TermStrings(index_dir)
    assert len(ts) > 0
    import pyarrow.parquet as pq

    corpus_terms = set()
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"]).column("text")
    for t in texts.to_pylist():
        corpus_terms.update(tokenize_py(t))
    for q in DOC_QUERIES:
        for w in parse_query(q):
            if w in corpus_terms:
                assert ts.get(hash64(w)) == w, w


def test_sidecar_is_deterministic_min_by_term(index_dir, tmp_path_factory):
    d2 = str(tmp_path_factory.mktemp("idx_explain2"))
    build_index(
        SF_DIR,
        d2,
        BuildConfig(num_partitions=2, lang_filter=None, term_strings=True),
        source="documents",
    )
    a, b = TermStrings(index_dir), TermStrings(d2)
    assert len(a) == len(b)
    assert np.array_equal(a._hashes, b._hashes)
    assert a._terms.equals(b._terms)


def test_explain_contributions_sum_to_score(index_dir):
    engine = SearchEngine(index_dir, n_shards=2, mode="bm25")
    try:
        for q in ["join hash", "the the fast", "dup batch", "merge sort merge"]:
            res = dict(engine.search(q, k=5))
            entries = engine.explain(q, k=5)
            assert [e["doc_id"] for e in entries] == list(res.keys())
            for e in entries:
                total = sum(t["contribution"] for t in e["terms"])
                assert abs(total - e["score"]) < 1e-9
                assert abs(e["score"] - res[e["doc_id"]]) < 1e-12
                # term strings resolved (sidecar present): no hex fallback
                for t in e["terms"]:
                    assert not t["term"].startswith("0x")
                    assert t["tf"] >= 1
    finally:
        engine.shutdown()


def test_explain_empty_for_oov(index_dir):
    engine = SearchEngine(index_dir, n_shards=1, mode="bm25")
    try:
        assert engine.explain("zzznotaword", k=5) == []
    finally:
        engine.shutdown()


def test_hydrate_never_materializes_on_coordinator(index_dir):
    engine = SearchEngine(index_dir, n_shards=1, mode="bm25")
    try:
        res = engine.search("join", k=3)
        assert res
        got = engine.hydrate([d for d, _ in res] + [123456789])
        # docs built from the documents table have no url column -> the
        # actor map is empty and every id falls back to its string form;
        # what we assert here is the POOL shape: actors exist, and the
        # coordinator process holds no docs arrays at all
        assert got[123456789] == "123456789"
        assert not hasattr(engine, "_docs_ids")
        assert not hasattr(engine, "_docs_urls")
    finally:
        engine.shutdown()
        assert engine._docmap == []


def test_http_explain_endpoint(index_dir):
    from searchengine_ray.serve import serve

    server = serve(index_dir, port=18741, n_shards=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            "http://127.0.0.1:18741/explain?q=join+hash&k=3"
        ) as r:
            body = json.loads(r.read())
        assert len(body["results"]) == 3
        for e in body["results"]:
            assert abs(sum(t["contribution"] for t in e["terms"]) - e["score"]) < 1e-9
            assert {t["term"] for t in e["terms"]} <= {"join", "hash"}
    finally:
        server.shutdown()


def test_prefix_terms_cap_and_order(index_dir):
    """prefix_terms: ascending term order, deterministic cap, exact-prefix
    range (no over-match)."""
    ts = TermStrings(index_dir)
    all_t = ts.prefix_terms("", limit=10**9)  # whole vocabulary
    assert all_t == sorted(all_t) and len(all_t) == len(set(all_t))
    # every returned term actually has the prefix; cap truncates the head
    for p in ("t", "s", "b"):
        full = [t for t in all_t if t.startswith(p)]
        assert ts.prefix_terms(p, limit=10**9) == full
        assert ts.prefix_terms(p, limit=2) == full[:2]
    assert ts.prefix_terms("zzzznope") == []


def test_prefix_query_pipeline_equivalence(index_dir, ray_session):
    """`jo*` scores identically to the explicit OR of its expansions."""
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.pipelines.query import evaluate_queries
    from searchengine_ray.schemas import FIELD_BODY

    ts = TermStrings(index_dir)
    expansion = ts.prefix_terms("jo", limit=64)
    assert expansion  # vocab has join/joins-like terms
    qs = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "query": pa.array(["jo*"], pa.string()),
        "k": pa.array([20], pa.int32()),
    })
    got = evaluate_queries(
        rd.from_arrow(qs), index_dir, fields=(FIELD_BODY,),
        concurrency=2, prefix=True,
    ).to_pandas()
    qs2 = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "query": pa.array([" ".join(expansion)], pa.string()),
        "k": pa.array([20], pa.int32()),
    })
    want = evaluate_queries(
        rd.from_arrow(qs2), index_dir, fields=(FIELD_BODY,), concurrency=2,
    ).to_pandas()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.score.tolist() == want.score.tolist()


def test_online_ops_syntax_matches_batch(index_dir, ray_session):
    """SearchEngine(syntax='ops') gives the same results as the batch
    pipeline's negation/prefix paths (shared kernels, shared parser caps)."""
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.pipelines.query import evaluate_queries
    from searchengine_ray.schemas import FIELD_BODY

    engine = SearchEngine(index_dir, n_shards=2, fields=(FIELD_BODY,))
    try:
        cases = [("join -hash", "negation"), ("jo* -hash", None), ("s* merge", "prefix")]
        for q, flavor in cases:
            got = engine.search(q, k=10, syntax="ops")
            if flavor in ("negation", "prefix"):
                qs = pa.table({
                    "query_id": pa.array([0], pa.int64()),
                    "query": pa.array([q], pa.string()),
                    "k": pa.array([10], pa.int32()),
                })
                want = evaluate_queries(
                    rd.from_arrow(qs), index_dir, fields=(FIELD_BODY,),
                    concurrency=2, negation=flavor == "negation",
                    prefix=flavor == "prefix",
                ).to_pandas()
                assert [d for d, _ in got] == [int(x) for x in want.doc_id]
                assert [round(s, 9) for _, s in got] == [
                    round(float(x), 9) for x in want.score
                ]
            else:
                assert got  # combined ops parse produced results
    finally:
        engine.shutdown()


def test_suggest_matches_lexicon(index_dir, ray_session):
    """Engine autocomplete = exact (cf desc, term asc) top-k over the
    lexicon restricted to the prefix (small vocab: cap not in play)."""
    import pyarrow.parquet as pq
    from searchengine_ray.state.shards import SearchEngine

    engine = SearchEngine(index_dir, n_shards=2, fields=(0,))
    lex = pq.read_table(f"{index_dir}/lexicon").to_pandas()
    lex = lex[lex["field"] == 0]
    ts = TermStrings(index_dir)
    term_of = {}
    for h in lex["term_hash"]:
        t = ts.get(int(h))
        if t is not None:
            term_of[int(h)] = t
    for prefix in ("s", "qu", "da", "zz"):
        got = engine.suggest(prefix, k=4)
        rows = sorted(
            (
                (-int(cf), term_of[int(h)])
                for h, cf in zip(lex["term_hash"], lex["cf"])
                if int(h) in term_of and term_of[int(h)].startswith(prefix)
            ),
        )[:4]
        want = [{"term": t, "cf": -neg} for neg, t in rows]
        assert got == want, (prefix, got, want)
    # truncation surfaced (round-3 ADVICE): with_meta reports whether the
    # candidate range scan hit its cap; this small vocab never does
    got, truncated = engine.suggest("s", k=4, with_meta=True)
    assert truncated is False and got

    # ... and the flag trips when the completion range exceeds the cap
    class _HugePrefixStub:
        def prefix_terms(self, prefix, limit):
            return [f"{prefix}{i:05d}" for i in range(limit)]

    engine._term_strings = _HugePrefixStub()
    _, truncated = engine.suggest("s", k=1, with_meta=True)
    assert truncated is True
    engine.shutdown() if hasattr(engine, "shutdown") else None
