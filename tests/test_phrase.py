"""Positional index + phrase queries (store_positions=True)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.functions.hashing import hash64
from searchengine_ray.oracle import brute_phrase_topk, build_brute_index
from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.schemas import FIELD_BODY, PAGES
from searchengine_ray.state.shards import SearchEngine


DOCS = [
    ("u://0", "alpha beta gamma delta", "t zero"),
    ("u://1", "beta alpha beta gamma", "t one"),
    ("u://2", "gamma beta alpha", "t two"),
    ("u://3", "alpha beta alpha beta gamma", "t three"),
    ("u://4", "delta delta alpha 123 beta", "t four"),  # digits break adjacency? no: digits are dropped, so alpha/beta ARE adjacent kept tokens
]


def _write(tmp_path):
    rows = []
    for url, body, title in DOCS:
        html = (
            "<html><head><title>" + title + "</title></head><body><p>" + body + "</p></body></html>"
        ).encode()
        rows.append((url, html, title + "\n" + body + "\n"))
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        },
        schema=PAGES,
    )
    pq.write_table(t, str(tmp_path / "pages.parquet"))
    return str(tmp_path)


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("phrase")
    src = _write(d)
    idx = str(d / "idx")
    build_index(src, idx, BuildConfig(num_partitions=3, store_positions=True), source="pages")
    return SearchEngine(idx, n_shards=2)


def _urls(engine, results):
    u = engine.hydrate([d for d, _ in results])
    return sorted(u[d] for d, _ in results)


def test_phrase_basic(engine):
    got = _urls(engine, engine.phrase_search("alpha beta"))
    # doc0: "alpha beta gamma..." yes; doc1: "beta alpha beta gamma" has alpha beta at pos 1-2;
    # doc3: yes; doc4: "...alpha 123 beta" -> 123 dropped, kept stream "delta delta alpha beta" -> adjacent!
    assert got == ["u://0", "u://1", "u://3", "u://4"]
    got3 = _urls(engine, engine.phrase_search("alpha beta gamma"))
    # doc1 "beta alpha beta gamma" contains it at positions 1-3 too
    assert got3 == ["u://0", "u://1", "u://3"]
    assert engine.phrase_search("gamma alpha") == []
    assert engine.phrase_search("alpha zzz") == []
    assert engine.phrase_search("") == []
    # single-word phrase == docs containing the word
    assert len(engine.phrase_search("delta")) == 2


def test_phrase_matches_oracle(engine):
    brute = build_brute_index(
        [(hash64(u), t + "\n" + b + "\n", t + "\n") for u, b, t in DOCS]
    )
    for q in ("alpha beta", "beta gamma", "delta delta", "beta alpha beta", "alpha", "gamma delta"):
        got = engine.phrase_search(q, k=10)
        want = brute_phrase_topk(brute, q, k=10, field=FIELD_BODY)
        assert got == want, q


def test_phrase_requires_positions(tmp_path, ray_session):
    src = _write(tmp_path)
    idx = str(tmp_path / "idx_nopos")
    build_index(src, idx, BuildConfig(num_partitions=2, store_positions=False), source="pages")
    eng = SearchEngine(idx, n_shards=1)
    # without positions the index cannot match phrases -> empty, not wrong
    assert eng.phrase_search("alpha beta") == []


def test_phrase_slop(engine):
    # slop=1: one extra token allowed between consecutive words.
    # doc0 "alpha beta gamma delta"; doc1 "beta alpha beta gamma";
    # doc3 "alpha beta alpha beta gamma" (alpha@3 -> gamma@5, gap 1)
    assert _urls(engine, engine.phrase_search("alpha gamma", slop=1)) == [
        "u://0",
        "u://1",
        "u://3",
    ]
    # slop=0 keeps the exact semantics
    assert engine.phrase_search("alpha gamma", slop=0) == []
    # wider slop relaxes further: "alpha delta" in doc0 needs gap 2
    assert _urls(engine, engine.phrase_search("alpha delta", slop=2)) == ["u://0"]
    assert engine.phrase_search("alpha delta", slop=1) == []
    # order still required even with slop: no gamma AFTER delta anywhere
    assert engine.phrase_search("delta gamma", slop=2) == []


def test_phrase_slop_subset_construction(tmp_path_factory, ray_session):
    """Greedy earliest-match would FAIL here: from a@2 the earliest b@3
    dead-ends (c not within gap), but b@4 completes the chain — the
    NFA-style matcher must keep all viable positions."""
    d = tmp_path_factory.mktemp("phrase_nfa")
    rows = [("u://g", "qq alpha beta beta xx gamma", "t g")]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "html": pa.array(
                [
                    (
                        "<html><head><title>" + ti + "</title></head><body><p>"
                        + b + "</p></body></html>"
                    ).encode()
                    for _u, b, ti in rows
                ],
                pa.binary(),
            ),
            "text": pa.array([ti + "\n" + b + "\n" for _u, b, ti in rows], pa.large_string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        },
        schema=PAGES,
    )
    pq.write_table(t, str(d / "pages.parquet"))
    idx = str(d / "idx")
    build_index(str(d), idx, BuildConfig(num_partitions=1, store_positions=True), source="pages")
    eng = SearchEngine(idx, n_shards=1)
    # kept body tokens: qq(1) alpha(2) beta(3) beta(4) xx(5) gamma(6)
    # alpha->beta within gap1: beta@3 (greedy) or beta@4; gamma@6 only
    # reachable from beta@4 (6 <= 4+2). Greedy-from-earliest would miss it.
    assert len(eng.phrase_search("alpha beta gamma", slop=1)) == 1
    assert eng.phrase_search("alpha beta gamma", slop=0) == []


def test_quoted_phrase_ops_syntax(engine):
    # whole-query quotes route to phrase_search (same results)
    assert engine.search('"alpha beta"', k=10, syntax="ops") == engine.phrase_search(
        "alpha beta", k=10
    )
    # ~N slop suffix
    assert engine.search('"alpha gamma"~1', k=10, syntax="ops") == engine.phrase_search(
        "alpha gamma", k=10, slop=1
    )
    # plain syntax is the reference parser (split(' ')+lower, NO filtering):
    # '"gamma' keeps its quote, misses the lexicon, contributes nothing
    assert engine.search('"gamma alpha"', k=10, syntax="plain") == []
    # phrase-order still enforced through the quoted route
    assert engine.search('"gamma alpha"', k=10, syntax="ops") == []


def test_phrase_slop_matches_brute_randomized(engine):
    """Randomized equivalence: engine slop search == exhaustive NFA oracle
    for every (phrase, slop) over a small vocab (fixed seed)."""
    rng = np.random.default_rng(42)
    brute = build_brute_index(
        [(hash64(u), t + "\n" + b + "\n", t + "\n") for u, b, t in DOCS]
    )
    vocab = ["alpha", "beta", "gamma", "delta"]
    for _ in range(60):
        n = int(rng.integers(2, 4))
        words = list(rng.choice(vocab, n))
        slop = int(rng.integers(0, 4))
        q = " ".join(words)
        got = engine.phrase_search(q, k=10, slop=slop)
        want = brute_phrase_topk(brute, q, k=10, field=FIELD_BODY, slop=slop)
        assert got == want, (q, slop, got, want)
