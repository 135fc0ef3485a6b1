"""Block-max WAND: identical results to exhaustive TAAT, bit-for-bit,
and actually skips block decodes."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.schemas import FIELD_BODY
from searchengine_ray.state.shards import Lexicon, LocalIndex, make_term_specs
from searchengine_ray.synth import make_queries_table


@pytest.fixture(scope="module")
def index_dir(pages_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_bmw"))
    build_index(pages_dir, d, BuildConfig(num_partitions=4, block_size=32), source="pages")
    return d


def test_bmw_matches_taat(index_dir, ray_session, monkeypatch):
    import searchengine_ray.state.bmw as bmw_mod

    monkeypatch.setattr(bmw_mod, "SHORT_LIST_POSTINGS", 0)  # force true WAND
    monkeypatch.setattr(bmw_mod, "WAND_SELECTIVITY_RATIO", 0)
    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)
    queries = make_queries_table(80).column("query").to_pylist()
    n_hits = 0
    for q in queries:
        specs = make_term_specs(q, lex, index.n_docs, (FIELD_BODY,), "bm25")
        if not specs:
            continue
        d1, s1 = index.topk(specs, 10, "bm25", algo="taat")
        d2, s2 = index.topk(specs, 10, "bm25", algo="bmw")
        np.testing.assert_array_equal(d1, d2, err_msg=q)
        np.testing.assert_array_equal(s1, s2, err_msg=q)  # bit-identical
        n_hits += len(d1) > 0
    assert n_hits > 40


def test_bmw_short_list_fallback_matches(index_dir, ray_session):
    """Below SHORT_LIST_POSTINGS the WAND path takes the vectorized exact
    fallback — results must be identical either way."""
    import searchengine_ray.state.bmw as bmw_mod

    assert bmw_mod.SHORT_LIST_POSTINGS > 0
    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)
    for q in ("taaa", "taaa tabc tzzz", "tbcd taab taac"):
        specs = make_term_specs(q, lex, index.n_docs, (FIELD_BODY,), "bm25")
        if not specs:
            continue
        d1, s1 = index.topk(specs, 10, "bm25", algo="taat")
        d2, s2 = index.topk(specs, 10, "bm25", algo="bmw")  # fallback path
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(s1, s2)


def test_bmw_k1(index_dir, ray_session):
    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)
    specs = make_term_specs("taaa tbcd", lex, index.n_docs, (FIELD_BODY,), "bm25")
    d1, s1 = index.topk(specs, 1, "bm25", algo="taat")
    d2, s2 = index.topk(specs, 1, "bm25", algo="bmw")
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(s1, s2)


def test_bmw_skips_blocks(index_dir, ray_session, monkeypatch):
    """For a selective query (rare term + head term), BMW must decode fewer
    blocks than the total — the whole point of the block-max metadata."""
    import searchengine_ray.state.bmw as bmw_mod

    monkeypatch.setattr(bmw_mod, "SHORT_LIST_POSTINGS", 0)  # force true WAND
    monkeypatch.setattr(bmw_mod, "WAND_SELECTIVITY_RATIO", 0)

    decoded = {"n": 0}
    orig = bmw_mod._Cursor._load_block

    def counting(self, j):
        if j < len(self.blk_first):
            decoded["n"] += 1
        return orig(self, j)

    monkeypatch.setattr(bmw_mod._Cursor, "_load_block", counting)
    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)
    # taaa: Zipf head (df ~ all docs); tzzz-ish rare tail term
    specs = make_term_specs("taaa tqzv", lex, index.n_docs, (FIELD_BODY,), "bm25")
    if not specs:
        pytest.skip("fixture vocabulary drift")
    index.topk(specs, 10, "bm25", algo="bmw")
    total_blocks = 0
    for part in index.parts:
        for t in specs:
            row = part.row_dict(t.field, t.term_hash)
            if row:
                total_blocks += len(row["blk_first"])
    assert 0 < decoded["n"] <= total_blocks


def test_bmw_multifield_matches_taat(index_dir, ray_session, monkeypatch):
    """Round-2: the default two-field config (body+title) now runs true
    BMW (per-cursor dl/avgdl) instead of falling back — bit-identical to
    exhaustive TAAT on the fuzz query set."""
    import searchengine_ray.state.bmw as bmw_mod

    from searchengine_ray.schemas import FIELD_TITLE

    monkeypatch.setattr(bmw_mod, "SHORT_LIST_POSTINGS", 0)  # force true WAND
    monkeypatch.setattr(bmw_mod, "WAND_SELECTIVITY_RATIO", 0)
    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)
    queries = make_queries_table(60).column("query").to_pylist()
    n_hits = 0
    for q in queries:
        specs = make_term_specs(q, lex, index.n_docs, (FIELD_BODY, FIELD_TITLE), "bm25")
        if not specs:
            continue
        d1, s1 = index.topk(specs, 10, "bm25", algo="taat")
        d2, s2 = index.topk(specs, 10, "bm25", algo="bmw")
        np.testing.assert_array_equal(d1, d2, err_msg=q)
        np.testing.assert_array_equal(s1, s2, err_msg=q)  # bit-identical
        n_hits += len(d1) > 0
    assert n_hits > 30


def test_bmw_multifield_short_fallback(index_dir, ray_session):
    from searchengine_ray.schemas import FIELD_TITLE

    index = LocalIndex(index_dir)
    lex = Lexicon(index_dir)
    for q in ("taaa", "taaa tabc tzzz", "tbcd taab taac"):
        specs = make_term_specs(q, lex, index.n_docs, (FIELD_BODY, FIELD_TITLE), "bm25")
        if not specs:
            continue
        d1, s1 = index.topk(specs, 10, "bm25", algo="taat")
        d2, s2 = index.topk(specs, 10, "bm25", algo="bmw")
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(s1, s2)
