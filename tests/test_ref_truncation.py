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


def test_engine_truncation_matches_oracle(tmp_path, ray_session):
    """Round-2: the SERVING engine now applies the reference's global
    top-1000-postings-by-tf truncation (Engine.cs:185-199) — on a corpus
    where df('hot') = 1200 > 1000, reference-mode results must be
    rank+score identical to the truncating brute oracle, and differ from
    the non-truncating scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.build import BuildConfig, build_index
    from searchengine_ray.state.shards import (
        LocalIndex, Lexicon, make_term_specs, with_ref_cutoffs,
    )

    n = 1200
    texts = []
    for i in range(n):
        body = " ".join(["hot"] * (1 + i % 7)) + (" rare" if i < 3 else "")
        texts.append(body)
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["t"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    idx_dir = str(tmp_path / "idx")
    build_index(
        str(tmp_path), idx_dir,
        BuildConfig(num_partitions=4, lang_filter=None), source="documents",
    )
    index = LocalIndex(idx_dir)
    lex = Lexicon(idx_dir)

    oracle = build_brute_index([(i, texts[i] + "\n", None) for i in range(n)])
    for q in ("hot rare", "hot", "rare"):
        specs = make_term_specs(q, lex, index.n_docs, (FIELD_BODY,), "reference")
        specs = with_ref_cutoffs(specs, index.tf_doc_candidates)  # limit=1000
        docs, scores = index.topk(specs, 10, mode="reference")
        want = brute_topk(
            oracle, q, k=10, mode="reference", fields=(FIELD_BODY,), ref_truncate=1000
        )
        got = [(int(d), float(s)) for d, s in zip(docs, scores)]
        assert got == [(int(d), float(s)) for d, s in want], q
    # and the truncation is actually doing something on this corpus
    full = brute_topk(oracle, "hot rare", k=10, mode="reference", fields=(FIELD_BODY,))
    trunc = brute_topk(
        oracle, "hot rare", k=10, mode="reference", fields=(FIELD_BODY,), ref_truncate=1000
    )
    assert full != trunc
