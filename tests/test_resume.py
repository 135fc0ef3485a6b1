from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from searchengine_ray.pipelines.build import BuildConfig, build_index
from searchengine_ray.state import manifest as mf


def _segments_equal(a: str, b: str) -> bool:
    for part in sorted(os.listdir(os.path.join(a, "segments"))):
        for f in ("docs.parquet", "postings.parquet"):
            ta = pq.read_table(os.path.join(a, "segments", part, f))
            tb = pq.read_table(os.path.join(b, "segments", part, f))
            if not ta.equals(tb):
                return False
    return True


@pytest.fixture(scope="module")
def cfg():
    return BuildConfig(num_partitions=6, block_size=32)


def test_resume_skips_completed_partitions(pages_dir, tmp_path_factory, cfg, ray_session):
    full = str(tmp_path_factory.mktemp("idx_full"))
    build_index(pages_dir, full, cfg, source="pages")

    # simulate a build killed after 4 of 6 partitions completed
    interrupted = str(tmp_path_factory.mktemp("idx_resume"))
    build_index(pages_dir, interrupted, cfg, source="pages")
    for part in (1, 4):
        shutil.rmtree(os.path.join(interrupted, "segments", mf.part_name(part)))
        os.unlink(os.path.join(mf.manifest_dir(interrupted), mf.part_name(part) + ".json"))

    metrics = build_index(pages_dir, interrupted, cfg, source="pages")
    assert metrics["parts_skipped_resume"] == 4
    assert metrics["segments"]["n_parts_built"] == 2
    # resumed result byte-identical to the uninterrupted build
    assert _segments_equal(full, interrupted)


def test_stale_manifest_invalidated_by_config_change(pages_dir, tmp_path_factory, ray_session):
    idx = str(tmp_path_factory.mktemp("idx_stale"))
    build_index(pages_dir, idx, BuildConfig(num_partitions=4, block_size=32), source="pages")
    # different config -> different fingerprint -> nothing skipped
    metrics = build_index(pages_dir, idx, BuildConfig(num_partitions=4, block_size=64), source="pages")
    assert metrics["parts_skipped_resume"] == 0


def test_determinism_across_parallelism(pages_dir, tmp_path_factory, cfg, ray_session):
    """Same input, different batch sizes -> byte-identical segments (the
    property the reference lacks, SURVEY.md §1.3.6)."""
    a = str(tmp_path_factory.mktemp("idx_a"))
    b = str(tmp_path_factory.mktemp("idx_b"))
    build_index(pages_dir, a, cfg, source="pages")
    import dataclasses

    cfg_b = dataclasses.replace(cfg, batch_size=97)
    build_index(pages_dir, b, cfg_b, source="pages")
    assert _segments_equal(a, b)


def test_shuffle_compression_is_transport_only(pages_dir, tmp_path, ray_session):
    """zstd-compressed vs raw packed shuffle payloads must produce
    byte-identical segments (the codec is pure transport)."""
    import filecmp
    import os

    from searchengine_ray.pipelines.build import BuildConfig, build_index

    a = str(tmp_path / "zstd")
    b = str(tmp_path / "raw")
    build_index(pages_dir, a, BuildConfig(num_partitions=4, block_size=32,
                                          shuffle_compression="zstd"), source="pages")
    build_index(pages_dir, b, BuildConfig(num_partitions=4, block_size=32,
                                          shuffle_compression=None), source="pages")
    for part in sorted(os.listdir(os.path.join(a, "segments"))):
        for f in ("docs.parquet", "postings.parquet"):
            assert filecmp.cmp(
                os.path.join(a, "segments", part, f),
                os.path.join(b, "segments", part, f),
                shallow=False,
            ), (part, f)


def test_exchange_waves_byte_identical(pages_dir, tmp_path_factory, cfg, ray_session):
    """A waved exchange (exchange_waves=3: each wave builds only parts with
    part % 3 == w, bounding the materialized shuffle to ~1/3 of the packed
    corpus) must produce byte-identical segments AND the same resume
    fingerprint as the single-wave build — the knob is execution-only."""
    import dataclasses
    import json

    single = str(tmp_path_factory.mktemp("idx_wave1"))
    waved = str(tmp_path_factory.mktemp("idx_wave3"))
    build_index(pages_dir, single, cfg, source="pages")
    cfg_w = dataclasses.replace(cfg, exchange_waves=3)
    m = build_index(pages_dir, waved, cfg_w, source="pages")
    assert m["segments"]["n_parts_built"] == cfg.num_partitions
    assert _segments_equal(single, waved)
    with open(os.path.join(single, "stats.json")) as fh:
        fp_single = json.load(fh)["fingerprint"]
    with open(os.path.join(waved, "stats.json")) as fh:
        fp_waved = json.load(fh)["fingerprint"]
    assert fp_single == fp_waved

    # a build interrupted mid-wave resumes: drop one part from each wave
    # residue class and rebuild under a DIFFERENT wave count
    for part in (1, 3, 5):
        shutil.rmtree(os.path.join(waved, "segments", mf.part_name(part)))
        os.unlink(os.path.join(mf.manifest_dir(waved), mf.part_name(part) + ".json"))
    m2 = build_index(pages_dir, waved, dataclasses.replace(cfg, exchange_waves=2),
                     source="pages")
    assert m2["parts_skipped_resume"] == 3
    assert m2["segments"]["n_parts_built"] == 3
    assert _segments_equal(single, waved)
