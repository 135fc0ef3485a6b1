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


# ---------------------------------------------------------------------------
# Round-2: generation commit protocol, watermark tombstones, compaction


def test_update_validates_config(dirs, ray_session, tmp_path):
    idx_inc, _ = dirs
    src = str(tmp_path / "more")
    import os

    os.makedirs(src)
    pq.write_table(make_pages_table(2000, 2010), src + "/pages.parquet")
    with pytest.raises(ValueError, match="block_size"):
        update_index(src, idx_inc, BuildConfig(num_partitions=4, block_size=64))
    with pytest.raises(ValueError, match="store_positions"):
        update_index(
            src, idx_inc, BuildConfig(num_partitions=4, block_size=32, store_positions=True)
        )


def test_uncommitted_generation_invisible_and_resumed(tmp_path, ray_session):
    """A killed update (no gen.json) must not be served, must not be
    counted by refresh_global, and a re-run of the SAME update resumes
    into the same generation instead of double-adding."""
    import os

    from searchengine_ray.pipelines.build import _fingerprint
    from searchengine_ray.pipelines.update import refresh_global
    from searchengine_ray.state import manifest as mf
    from searchengine_ray.state.shards import segment_part_dirs

    a = str(tmp_path / "a"); os.makedirs(a)
    b = str(tmp_path / "b"); os.makedirs(b)
    pq.write_table(make_pages_table(0, 300), a + "/pages.parquet")
    pq.write_table(make_pages_table(300, 500), b + "/pages.parquet")
    cfg = BuildConfig(num_partitions=4, block_size=32)
    idx = str(tmp_path / "idx")
    build_index(a, idx, cfg, source="pages")
    n_parts_base = len(segment_part_dirs(idx))
    base_stats = refresh_global(idx)["stats"]

    # simulate a KILLED update of input b: intent marker + partial debris,
    # no gen.json
    fp = _fingerprint(b, cfg, "pages")
    gen = os.path.join(idx, "gen-001")
    os.makedirs(os.path.join(gen, "segments", "part-00000.tmp"), exist_ok=True)
    mf.write_json_atomic(os.path.join(gen, "update.json"), {"fingerprint": fp})

    # invisible to readers and refresh_global
    assert len(segment_part_dirs(idx)) == n_parts_base
    assert refresh_global(idx)["stats"]["n_docs"] == base_stats["n_docs"]

    # rerun of the same update RESUMES into gen-001 (no gen-002 appears)
    m = update_index(b, idx, cfg, source="pages")
    assert m["generation"] == 1
    assert not os.path.isdir(os.path.join(idx, "gen-002"))
    assert os.path.exists(os.path.join(idx, "gen-001", "gen.json"))

    # a stale partial of a DIFFERENT input would have been discarded:
    gen2 = os.path.join(idx, "gen-002")
    os.makedirs(os.path.join(gen2, "segments"), exist_ok=True)
    mf.write_json_atomic(os.path.join(gen2, "update.json"), {"fingerprint": "bogus"})
    c = str(tmp_path / "c"); os.makedirs(c)
    pq.write_table(make_pages_table(500, 600), c + "/pages.parquet")
    m2 = update_index(c, idx, cfg, source="pages")
    assert m2["generation"] == 2
    assert os.path.exists(os.path.join(idx, "gen-002", "gen.json"))


def test_readd_after_delete_serves_new_copy(tmp_path, ray_session):
    """ADVICE fix: tombstones are watermark-scoped — deleting a doc and
    re-adding it in a newer generation serves the re-added copy."""
    import os

    a = str(tmp_path / "a"); os.makedirs(a)
    re_add = str(tmp_path / "readd"); os.makedirs(re_add)
    pq.write_table(make_pages_table(0, 300), a + "/pages.parquet")
    pq.write_table(make_pages_table(7, 8), re_add + "/pages.parquet")  # same url/doc_id
    cfg = BuildConfig(num_partitions=4, block_size=32)
    idx = str(tmp_path / "idx")
    build_index(a, idx, cfg, source="pages")

    url7 = make_pages_table(7, 8).column("url")[0].as_py()
    doc7 = hash64(url7)
    eng = SearchEngine(idx, n_shards=1)
    hits = eng.search("taaa", k=500)
    assert doc7 in {d for d, _ in hits}

    delete_docs(idx, [doc7])
    eng2 = SearchEngine(idx, n_shards=1)
    assert doc7 not in {d for d, _ in eng2.search("taaa", k=500)}

    update_index(re_add, idx, cfg, source="pages")
    eng3 = SearchEngine(idx, n_shards=1)
    assert doc7 in {d for d, _ in eng3.search("taaa", k=500)}  # new copy visible


def test_compact_bit_identical_to_fresh_build(tmp_path, ray_session):
    """compact() == fresh build of the surviving docs, byte for byte
    (segments + lexicon), and clears the stats drift."""
    import filecmp
    import os

    from searchengine_ray.pipelines.update import compact

    a = str(tmp_path / "a"); os.makedirs(a)
    b = str(tmp_path / "b"); os.makedirs(b)
    pq.write_table(make_pages_table(0, 400), a + "/pages.parquet")
    pq.write_table(make_pages_table(400, 700), b + "/pages.parquet")
    cfg = BuildConfig(num_partitions=4, block_size=32)
    idx = str(tmp_path / "idx")
    build_index(a, idx, cfg, source="pages")
    update_index(b, idx, cfg, source="pages")

    # tombstone a handful of docs (mixed generations)
    full = make_pages_table(0, 700)
    urls = full.column("url").to_pylist()
    victims_rows = [3, 11, 450, 460]
    victims = [hash64(urls[i]) for i in victims_rows]
    delete_docs(idx, victims)
    compact(idx)

    # fresh build over the surviving rows
    keep = [i for i in range(700) if i not in victims_rows]
    surv = str(tmp_path / "surv"); os.makedirs(surv)
    pq.write_table(full.take(keep), surv + "/pages.parquet")
    fresh = str(tmp_path / "fresh")
    build_index(surv, fresh, cfg, source="pages")

    seg_a = sorted(os.listdir(os.path.join(idx, "segments")))
    seg_b = sorted(os.listdir(os.path.join(fresh, "segments")))
    assert seg_a == seg_b
    for part in seg_a:
        for f in ("docs.parquet", "postings.parquet"):
            pa_f = os.path.join(idx, "segments", part, f)
            pb_f = os.path.join(fresh, "segments", part, f)
            assert filecmp.cmp(pa_f, pb_f, shallow=False), (part, f)
    assert filecmp.cmp(
        os.path.join(idx, "lexicon", "lexicon-0.parquet"),
        os.path.join(fresh, "lexicon", "lexicon-0.parquet"),
        shallow=False,
    )
    import json as _json

    sa = _json.load(open(os.path.join(idx, "stats.json")))
    sb = _json.load(open(os.path.join(fresh, "stats.json")))
    for k in ("n_docs", "total_len_body", "total_len_title", "avgdl_body", "avgdl_title"):
        assert sa[k] == sb[k], k

    # compacted index serves identically to the fresh build
    qs = make_queries_table(40).column("query").to_pylist()
    ra = SearchEngine(idx, n_shards=2).search_batch(qs, k=10)
    rb = SearchEngine(fresh, n_shards=2).search_batch(qs, k=10)
    assert ra == rb


def test_compact_bit_identical_with_positions(tmp_path, ray_session):
    """compact() round-trips the positional index too (per-posting varbyte
    position streams re-encode canonically)."""
    import filecmp
    import os

    from searchengine_ray.pipelines.update import compact

    a = str(tmp_path / "a"); os.makedirs(a)
    pq.write_table(make_pages_table(0, 250), a + "/pages.parquet")
    cfg = BuildConfig(num_partitions=4, block_size=32, store_positions=True)
    idx = str(tmp_path / "idx")
    build_index(a, idx, cfg, source="pages")

    full = make_pages_table(0, 250)
    urls = full.column("url").to_pylist()
    victims_rows = [5, 17]
    delete_docs(idx, [hash64(urls[i]) for i in victims_rows])
    compact(idx)

    keep = [i for i in range(250) if i not in victims_rows]
    surv = str(tmp_path / "surv"); os.makedirs(surv)
    pq.write_table(full.take(keep), surv + "/pages.parquet")
    fresh = str(tmp_path / "fresh")
    build_index(surv, fresh, cfg, source="pages")

    for part in sorted(os.listdir(os.path.join(idx, "segments"))):
        for f in ("docs.parquet", "postings.parquet"):
            assert filecmp.cmp(
                os.path.join(idx, "segments", part, f),
                os.path.join(fresh, "segments", part, f),
                shallow=False,
            ), (part, f)


def test_compact_preserves_readded_doc(tmp_path, ray_session):
    """delete -> re-add -> compact: the re-added copy survives in segments
    AND in the docs map (hydration), old copies are gone, tombstones clear."""
    import os

    from searchengine_ray.pipelines.update import compact

    a = str(tmp_path / "a"); os.makedirs(a)
    re_add = str(tmp_path / "readd"); os.makedirs(re_add)
    pq.write_table(make_pages_table(0, 200), a + "/pages.parquet")
    pq.write_table(make_pages_table(7, 8), re_add + "/pages.parquet")
    cfg = BuildConfig(num_partitions=4, block_size=32)
    idx = str(tmp_path / "idx")
    build_index(a, idx, cfg, source="pages")
    url7 = make_pages_table(7, 8).column("url")[0].as_py()
    doc7 = hash64(url7)
    delete_docs(idx, [doc7])
    update_index(re_add, idx, cfg, source="pages")
    compact(idx)
    assert not os.path.exists(os.path.join(idx, "tombstones.parquet"))
    eng = SearchEngine(idx, n_shards=1)
    hits = {d for d, _ in eng.search("taaa", k=500)}
    assert doc7 in hits
    assert eng.hydrate([doc7])[doc7] == url7  # docs map kept the new row


def test_compact_crash_window_recovery(tmp_path, ray_session):
    """A crash between compact()'s two swap renames must not strand the
    index: recover_compaction rolls FORWARD when the compacted dir is
    committed, BACK when it is not, and finishes cleanup when only the
    .pre-compact leftover remains (round-2 ADVICE)."""
    import os
    import shutil

    from searchengine_ray.state import manifest as mf

    src = _write_slice(tmp_path, "src", 0, 300)
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(num_partitions=2, block_size=32)
    build_index(src, idx, cfg, source="pages")
    engine = SearchEngine(idx, n_shards=1)
    want = engine.search("taaa", k=5)
    engine.shutdown()
    assert want

    # state 1: crash BETWEEN the renames, compacted dir committed -> forward
    shutil.copytree(idx, idx + ".compacting")
    os.rename(idx, idx + ".pre-compact")
    assert mf.recover_compaction(idx) == "rolled_forward"
    assert os.path.isdir(idx) and not os.path.isdir(idx + ".pre-compact")
    assert not os.path.isdir(idx + ".compacting")

    # state 2: crash between renames with an UNcommitted compacting dir
    # (no gen.json) -> roll back to the pre-compact original
    shutil.copytree(idx, idx + ".compacting")
    os.remove(os.path.join(idx + ".compacting", "gen.json"))
    os.rename(idx, idx + ".pre-compact")
    assert mf.recover_compaction(idx) == "rolled_back"
    assert os.path.isdir(idx) and not os.path.isdir(idx + ".compacting")

    # state 3: crash after the swap, before cleanup -> finish cleanup
    shutil.copytree(idx, idx + ".pre-compact")
    assert mf.recover_compaction(idx) == "cleaned"
    assert not os.path.isdir(idx + ".pre-compact")
    assert mf.recover_compaction(idx) is None

    # a reader opening the index heals state 1 transparently
    shutil.copytree(idx, idx + ".compacting")
    os.rename(idx, idx + ".pre-compact")
    engine = SearchEngine(idx, n_shards=1)
    got = engine.search("taaa", k=5)
    engine.shutdown()
    assert got == want
