from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from searchengine_ray.functions.hashing import hash64
from searchengine_ray.oracle import brute_topk, build_brute_index
from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.pipelines.query import evaluate_queries
from searchengine_ray.schemas import FIELD_BODY, FIELD_TITLE
from searchengine_ray.state.shards import SearchEngine
from searchengine_ray.synth import make_queries_table


@pytest.fixture(scope="module")
def built(pages_dir, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index_t1"))
    cfg = BuildConfig(num_partitions=8, block_size=32)
    metrics = build_index(pages_dir, index_dir, cfg, source="pages")
    return index_dir, metrics, cfg


@pytest.fixture(scope="module")
def brute(pages_dir):
    """Independent oracle: pure-Python tokenizer over the golden text column."""
    tbl = pq.read_table(pages_dir)
    docs = []
    for url, text, lang in zip(
        tbl.column("url").to_pylist(),
        tbl.column("text").to_pylist(),
        tbl.column("lang").to_pylist(),
    ):
        if lang != "en":
            continue
        title = text.split("\n", 1)[0] + "\n"
        docs.append((hash64(url), text, title))
    return build_brute_index(docs)


def test_build_metrics(built, brute):
    index_dir, metrics, cfg = built
    assert metrics["n_docs"] == brute.n_docs
    seg = metrics["segments"]
    assert seg["n_parts_built"] == cfg.num_partitions
    # doc-bucketed partitioning: near-uniform partitions even with Zipf head
    # terms. At 1000 docs / 8 parts the doc-count noise is ~±10%, so bound
    # against the mean (the 100k-id uniformity bound lives in test_hashing).
    mean = metrics["segments"]["n_postings"] / seg["n_parts_built"]
    assert seg["max_part_postings"] < 1.5 * mean
    assert seg["min_part_postings"] > 0.5 * mean
    # global stats agree with the oracle
    assert metrics["stats"]["total_len_body"] == brute.total_len[FIELD_BODY]
    assert metrics["stats"]["total_len_title"] == brute.total_len[FIELD_TITLE]


@pytest.mark.parametrize("mode", ["bm25", "reference"])
def test_rank_identity_vs_oracle(built, brute, mode, ray_session):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir, n_shards=2, mode=mode)
    queries = make_queries_table(60).column("query").to_pylist()
    results = engine.search_batch(queries, k=10)
    n_nonempty = 0
    for q, got in zip(queries, results):
        want = brute_topk(brute, q, k=10, mode=mode)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=0, atol=0
        )  # scores bit-identical (same kernels, same accumulation order)
        n_nonempty += bool(got)
    assert n_nonempty > len(queries) * 0.8  # the query set mostly hits


def test_batch_eval_matches_online(built, ray_session):
    index_dir, _, _ = built
    q_tbl = make_queries_table(30)
    out = (
        evaluate_queries(rd.from_arrow(q_tbl), index_dir, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    engine = SearchEngine(index_dir, n_shards=2)
    online = engine.search_batch(q_tbl.column("query").to_pylist(), k=10)
    for qid, want in enumerate(online):
        sub = out[out.query_id == qid]
        assert [int(d) for d in sub.doc_id] == [d for d, _ in want]


def test_empty_and_oov_queries(built, ray_session):
    index_dir, _, _ = built
    engine = SearchEngine(index_dir, n_shards=1)
    assert engine.search("zzzznotaword", k=10) == []
    assert engine.search("naïve", k=10) == []  # dropped at index time, present in query
    assert engine.search("", k=10) == []


def test_sharded_lexicon_identical_results(built, ray_session):
    """Round-2: LexiconShardActor pool (term_hash-sharded) returns the same
    stats — and the engine the same ranked results — as the in-process
    lexicon."""
    from searchengine_ray.state.shards import Lexicon, SearchEngine, ShardedLexicon
    from searchengine_ray.synth import make_queries_table

    index_dir, _metrics, _cfg = built
    local = Lexicon(index_dir)
    sharded = ShardedLexicon(index_dir, n_shards=3)
    for field, (ths, _df, _cf) in local._by_field.items():
        for th in ths[:: max(1, len(ths) // 50)]:
            assert sharded.get(field, int(th)) == local.get(field, int(th))
    assert sharded.get(0, 123456789) is None  # miss behaves like the local map

    queries = make_queries_table(30).column("query").to_pylist()
    a = SearchEngine(index_dir, n_shards=2).search_batch(queries, k=10)
    b = SearchEngine(index_dir, n_shards=2, lexicon_shards=3).search_batch(queries, k=10)
    assert a == b


def test_negated_query_excludes_docs(built, brute, ray_session):
    """`alpha -beta`: excluded docs vanish, surviving ranks/scores equal the
    unnegated run filtered against the brute term-membership oracle."""
    import pyarrow as pa

    from searchengine_ray.state.shards import (
        Lexicon,
        LocalIndex,
        make_term_specs,
        make_term_specs_from_counts,
    )

    index_dir, _, _ = built
    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)

    # pick a positive and negative term that both exist in the corpus
    from searchengine_ray.synth import VOCAB

    pos_w, neg_w = str(VOCAB[25]), str(VOCAB[120])  # mid terms: both present,
    # negative rare enough that some positives survive
    specs = make_term_specs(pos_w, lex, index.n_docs, (FIELD_BODY,), "bm25")
    from collections import Counter

    excl = make_term_specs_from_counts(
        Counter([neg_w]), lex, index.n_docs, (FIELD_BODY,), "bm25"
    )
    assert specs and excl
    base_docs, base_scores = index.topk(specs, 1000)
    not_docs, not_scores = index.topk(specs, 1000, exclude=excl)

    # brute membership of the negative term
    neg_set = set(brute.postings.get((FIELD_BODY, neg_w), {}))
    want = [(d, s) for d, s in zip(base_docs.tolist(), base_scores.tolist())
            if d not in neg_set]
    assert list(zip(not_docs.tolist(), not_scores.tolist())) == want
    assert 0 < len(not_docs) < len(base_docs)

    # the batch pipeline (negation=True) agrees end-to-end
    q_tbl = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "query": pa.array([f"{pos_w} -{neg_w}"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    out = evaluate_queries(
        rd.from_arrow(q_tbl), index_dir, fields=(FIELD_BODY,),
        concurrency=2, negation=True,
    ).to_pandas().sort_values("rank")
    assert [int(d) for d in out.doc_id] == [d for d, _ in want[:10]]


def test_field_scoped_query_terms(built, ray_session):
    """`title:word` / `body:word` (syntax='ops') restrict a term to one
    field. Contract (make_term_specs_scoped): scoping to a served field
    equals a plain search on an engine serving ONLY that field; scoping
    to an unserved field contributes nothing (OOV-like); an unknown
    prefix stays a literal token."""
    from searchengine_ray.synth import VOCAB

    index_dir, _, _ = built
    w = str(VOCAB[25])
    both = SearchEngine(index_dir, n_shards=2)  # (body, title)
    title_only = SearchEngine(index_dir, n_shards=2, fields=(FIELD_TITLE,))
    body_only = SearchEngine(index_dir, n_shards=2, fields=(FIELD_BODY,))
    try:
        # scoped-on-both == plain-on-single-field engine (scores included)
        assert both.search(f"title:{w}", k=20, syntax="ops") == \
            title_only.search(w, k=20)
        assert both.search(f"body:{w}", k=20, syntax="ops") == \
            body_only.search(w, k=20)
        assert both.search(f"title:{w}", k=20, syntax="ops") != \
            both.search(w, k=20)  # scoping actually changed the ranking

        # scoping to a field the engine does not serve -> no contribution
        assert body_only.search(f"title:{w}", k=20, syntax="ops") == []

        # unknown prefix stays a literal token (OOV here)
        assert both.search(f"zzz:{w}", k=20, syntax="ops") == []

        # mixed query: scoped + unscoped terms sum per-doc contributions;
        # verify against explicit spec construction through the public path
        from collections import Counter

        from searchengine_ray.state.shards import make_term_specs_scoped

        w2 = str(VOCAB[40])
        scoped = Counter({("title", w): 1, ("", w2): 1})
        specs = make_term_specs_scoped(
            scoped, both.lexicon, both.n_docs, both.fields, both.mode
        )
        fields_seen = {(t.term_hash, t.field) for t in specs}
        assert (hash64(w), FIELD_TITLE) in fields_seen
        assert (hash64(w), FIELD_BODY) not in fields_seen
        assert (hash64(w2), FIELD_BODY) in fields_seen
        got = both.search(f"title:{w} {w2}", k=15, syntax="ops")
        assert got  # scoped mixed query returns ranked results

        # batch path agrees with one-at-a-time
        qs = [f"title:{w}", f"body:{w} {w2}", f"title:{w} {w2}"]
        batch = both.search_batch(qs, k=15, syntax="ops")
        single = [both.search(q, k=15, syntax="ops") for q in qs]
        assert batch == single
    finally:
        both.shutdown()
        title_only.shutdown()
        body_only.shutdown()
