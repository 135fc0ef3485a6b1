"""Incremental generations + tombstone deletes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.functions.hashing import hash64
from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.pipelines.update import delete_docs, update_index
from searchengine_ray.schemas import PAGES
from searchengine_ray.state.shards import SearchEngine
from searchengine_ray.synth import make_pages_table, make_queries_table


def _write_slice(tmp_path, name, start, stop):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(make_pages_table(start, stop), str(d / "pages.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory, ray_session):
    """A: rows 0-600; B: rows 600-1000 (disjoint doc ids); FULL: 0-1000."""
    base = tmp_path_factory.mktemp("upd")
    a = _write_slice(base, "a", 0, 600)
    b = _write_slice(base, "b", 600, 1000)
    full = _write_slice(base, "full", 0, 1000)
    cfg = BuildConfig(num_partitions=4, block_size=32)
    idx_inc = str(base / "idx_inc")
    build_index(a, idx_inc, cfg, source="pages")
    update_index(b, idx_inc, cfg, source="pages")
    idx_full = str(base / "idx_full")
    build_index(full, idx_full, cfg, source="pages")
    return idx_inc, idx_full


def test_incremental_equals_full_rebuild(dirs, ray_session):
    idx_inc, idx_full = dirs
    eng_inc = SearchEngine(idx_inc, n_shards=2)
    eng_full = SearchEngine(idx_full, n_shards=2)
    queries = make_queries_table(60).column("query").to_pylist()
    inc = eng_inc.search_batch(queries, k=10)
    full = eng_full.search_batch(queries, k=10)
    for q, ri, rf in zip(queries, inc, full):
        assert ri == rf, q  # doc ids AND scores identical (same global stats)


def test_incremental_hydrates_both_generations(dirs, ray_session):
    idx_inc, _ = dirs
    eng = SearchEngine(idx_inc, n_shards=1)
    # a doc from each half must be retrievable + hydrate to its url
    res = eng.search_hydrated("taaa", k=500)
    urls = {u for u, _ in res}
    assert any(u < "https://example.org/wiki/Doc_00000600" for u in urls)
    assert any(u >= "https://example.org/wiki/Doc_00000600" for u in urls)


def test_delete_docs(dirs, ray_session):
    idx_inc, _ = dirs
    eng = SearchEngine(idx_inc, n_shards=2)
    before = eng.search("taaa", k=5)
    assert before
    victim = before[0][0]
    n = delete_docs(idx_inc, [victim])
    assert n == 1
    eng2 = SearchEngine(idx_inc, n_shards=2)  # fresh actors -> reload tombstones
    after = eng2.search("taaa", k=5)
    assert victim not in [d for d, _ in after]
    # remaining docs keep their exact scores (stats not recomputed by design)
    before_map = dict(before)
    for d, s in after:
        if d in before_map:
            assert s == before_map[d]
    # bmw falls back but stays correct under tombstones
    from searchengine_ray.schemas import FIELD_BODY

    eng3 = SearchEngine(idx_inc, n_shards=1, fields=(FIELD_BODY,), algo="bmw")
    assert victim not in [d for d, _ in eng3.search("taaa", k=5)]
