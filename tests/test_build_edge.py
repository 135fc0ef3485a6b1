"""Build-pipeline edge cases: empty inputs, token-free docs, tiny corpora."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.schemas import PAGES
from searchengine_ray.state.shards import Lexicon, LocalIndex, SearchEngine, make_term_specs
from searchengine_ray.schemas import FIELD_BODY


def _write_pages(tmp_path, rows):
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
        },
        schema=PAGES,
    )
    pq.write_table(t, str(tmp_path / "pages.parquet"))
    return str(tmp_path)


def test_tokenless_and_tiny_docs(tmp_path, ray_session):
    rows = [
        ("u://1", b"<html><head><title>alpha beta</title></head><body><p>gamma delta gamma</p></body></html>",
         "alpha beta\ngamma delta gamma\n", "en"),
        # no kept tokens at all (digits/punctuation only)
        ("u://2", b"<html><head><title>123</title></head><body><p>456 ... 789</p></body></html>",
         "123\n456 ... 789\n", "en"),
        # filtered out by lang
        ("u://3", b"<html><head><title>x</title></head><body><p>y</p></body></html>", "x\ny\n", "de"),
    ]
    d = _write_pages(tmp_path, rows)
    idx = str(tmp_path / "idx")
    m = build_index(d, idx, BuildConfig(num_partitions=4), source="pages")
    # N counts the token-free doc (it passed the lang filter) — BM25 semantics
    assert m["n_docs"] == 2
    engine = SearchEngine(idx, n_shards=1)
    res = engine.search_hydrated("gamma", k=5)
    assert len(res) == 1 and res[0][0] == "u://1"
    assert engine.search("y", k=5) == []  # lang-filtered doc is not indexed


def test_single_doc_corpus(tmp_path, ray_session):
    rows = [("u://only", b"<html><head><title>solo</title></head><body><p>one two one</p></body></html>",
             "solo\none two one\n", "en")]
    d = _write_pages(tmp_path, rows)
    idx = str(tmp_path / "idx1")
    m = build_index(d, idx, BuildConfig(num_partitions=4), source="pages")
    assert m["n_docs"] == 1
    index = LocalIndex(idx)
    lex = Lexicon(idx)
    specs = make_term_specs("one", lex, index.n_docs, (FIELD_BODY,), "bm25")
    docs, scores = index.topk(specs, 3)
    assert len(docs) == 1 and scores[0] > 0
    # bmw agrees on the degenerate corpus
    d2, s2 = index.topk(specs, 3, algo="bmw")
    assert docs.tolist() == d2.tolist() and scores.tolist() == s2.tolist()


def test_all_filtered_corpus(tmp_path, ray_session):
    rows = [("u://a", b"<html><head><title>t</title></head><body><p>b</p></body></html>", "t\nb\n", "fr")]
    d = _write_pages(tmp_path, rows)
    idx = str(tmp_path / "idx2")
    m = build_index(d, idx, BuildConfig(num_partitions=2), source="pages")
    assert m["n_docs"] == 0
    assert m["n_terms_global"] == 0
    engine = SearchEngine(idx, n_shards=1)
    assert engine.search("t", k=5) == []


def test_auto_num_partitions_floor_and_scaling(tmp_path, ray_session):
    """auto-P: floored at 2x cluster CPUs (reduce parallelism), scales with
    input bytes above the floor, and the resolved value is fingerprinted."""
    import ray

    from searchengine_ray.pipelines.build import (
        POSTINGS_BYTES_PER_INPUT_BYTE,
        TARGET_PART_POSTINGS_BYTES,
        auto_num_partitions,
    )

    fake = tmp_path / "fake_inputs"
    fake.mkdir()
    small = fake / "small.parquet"
    small.write_bytes(b"x" * 1024)
    floor = max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    assert auto_num_partitions(str(small)) == floor

    # a file big enough that the bytes estimate dominates the floor
    n_big = (floor + 5) * TARGET_PART_POSTINGS_BYTES // POSTINGS_BYTES_PER_INPUT_BYTE
    big = fake / "big.parquet"
    with open(big, "wb") as f:
        f.truncate(n_big)  # sparse: size matters, content does not
    assert auto_num_partitions(str(big)) == floor + 5

    rows = [("u://a", b"<html><head><title>t</title></head><body><p>alpha beta</p></body></html>",
             "t\nalpha beta\n", "en")]
    pages_dir = tmp_path / "pages_auto"
    pages_dir.mkdir()
    d = _write_pages(pages_dir, rows)
    idx = str(tmp_path / "idx_auto")
    m = build_index(d, idx, BuildConfig(num_partitions=None), source="pages")
    assert m["config"]["num_partitions"] == floor  # resolved value recorded


def test_doc_title_tokens_synthetic_field(ray_session, tmp_path_factory):
    """BuildConfig.doc_title_tokens=K on the documents source: FIELD_TITLE
    postings are each doc's first K kept tokens (SQL-mirrorable contract
    list_slice(toks, 1, K)); per-field dl/avgdl follow; body postings are
    byte-identical to a build without the title field."""
    import json
    import os

    import pyarrow.parquet as pq

    from searchengine_ray.functions.tokenize import count_postings_hashed, tokenize_py
    from searchengine_ray.pipelines.build import BuildConfig, build_index
    from searchengine_ray.schemas import FIELD_TITLE
    from searchengine_ray.state.shards import LocalIndex

    sf = "/root/testdata/sf0.001"
    K = 4
    d = str(tmp_path_factory.mktemp("idx_title"))
    build_index(
        sf, d, BuildConfig(num_partitions=4, lang_filter=None, doc_title_tokens=K),
        source="documents",
    )
    with open(os.path.join(d, "stats.json")) as fh:
        stats = json.load(fh)
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        int(i): tokenize_py(t)
        for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    }
    want_total_title = sum(min(len(v), K) for v in toks.values())
    assert stats["total_len_title"] == want_total_title
    assert stats["avgdl_title"] == want_total_title / stats["n_docs"]

    # the kernel contract: token_limit=K == pure-python first-K slice
    th, rows, tf, dl = count_postings_hashed(tbl.column("text"), token_limit=K)
    assert dl.max() <= K
    from collections import Counter

    from searchengine_ray.functions.hashing import hash64

    texts = tbl.column("text").to_pylist()
    for r in {int(rows[0]), int(rows[len(rows) // 2]), int(rows[-1])}:
        want = Counter(hash64(w) for w in tokenize_py(texts[r])[:K])
        got = {int(h): int(c) for h, c, rr in zip(th, tf, rows) if rr == r}
        assert got == dict(want)

    # a title-scoped engine search over the built index returns results
    # (end-to-end scoped parity vs DuckDB is tests/test_contract.py::
    # test_query_matches_oracle[bm25_scoped_topk])
    from searchengine_ray.state.shards import SearchEngine

    eng = SearchEngine(d, n_shards=1)
    try:
        w = next(w for w in toks[int(tbl.column("doc_id")[0].as_py())][:K])
        assert eng.search(f"title:{w}", k=5, syntax="ops")
        title_df = eng.lexicon.get(FIELD_TITLE, hash64(w))
        body_df = eng.lexicon.get(0, hash64(w))
        assert title_df is not None and body_df is not None
        assert title_df[0] <= body_df[0]  # title df can never exceed body df
    finally:
        eng.shutdown()


def test_distributed_lexicon_path_matches_driver_agg(tmp_path, ray_session, monkeypatch):
    """Forcing the >threshold coarse-bucket lexicon path on a small corpus
    must produce the same (field, term_hash, df, cf) rows as the driver-
    side Arrow group_by (the round-5 rework of the distributed branch)."""
    import numpy as np

    import searchengine_ray.pipelines.build as build_mod
    from searchengine_ray.synth import write_pages

    d = write_pages(str(tmp_path / "pages"), n_rows=400, n_files=4, parallel=False)

    def lex_rows(index_dir):
        import glob

        files = sorted(glob.glob(index_dir + "/lexicon/*.parquet"))
        t = pa.concat_tables([pq.read_table(f) for f in files])
        df = t.to_pandas().sort_values(["field", "term_hash"]).reset_index(drop=True)
        return df

    idx_a = str(tmp_path / "idx_driver")
    build_index(d, idx_a, BuildConfig(num_partitions=4), source="pages")
    a = lex_rows(idx_a)

    monkeypatch.setattr(build_mod, "LEXICON_DRIVER_AGG_ROWS", 0)
    idx_b = str(tmp_path / "idx_dist")
    build_index(d, idx_b, BuildConfig(num_partitions=4), source="pages")
    b = lex_rows(idx_b)

    assert len(a) == len(b) > 0
    for col in ("field", "term_hash", "df", "cf"):
        assert np.array_equal(a[col].to_numpy(), b[col].to_numpy()), col


def test_write_pages_layout_change_clears_stale_parts(tmp_path):
    """Rewriting a fixture dir with a different (n_rows, n_files) layout
    must not leave the old layout's extra part files behind (a mixed dir
    duplicates urls and silently breaks BM25 rank-identity)."""
    import os

    import pyarrow.parquet as pq

    from searchengine_ray.synth import write_pages

    d = str(tmp_path / "pages")
    write_pages(d, n_rows=200, n_files=8, parallel=False)
    write_pages(d, n_rows=100, n_files=2, parallel=False)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    assert len(files) == 2, files
    total = sum(pq.ParquetFile(os.path.join(d, f)).metadata.num_rows for f in files)
    assert total == 100
    urls = pq.read_table(d, columns=["url"]).column("url").to_pylist()
    assert len(urls) == len(set(urls))
