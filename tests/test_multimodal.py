from __future__ import annotations

import pytest

from searchengine_ray.pipelines.multimodal import (
    KIND_VIDEO,
    MediaDecodeStage,
    media_meta,
    sample_frames,
    synth_media_dataset,
)


def test_media_meta_roundtrip(ray_session):
    ds = synth_media_dataset(100)
    meta = media_meta(ds).to_pandas().sort_values("media_id")
    assert len(meta) == 100
    assert meta.decoded_ok.all()
    assert (meta.width >= 16).all() and (meta.width < 512).all()
    assert (meta.n_bytes > 16).all()
    # deterministic: same seed -> same metadata
    meta2 = media_meta(synth_media_dataset(100)).to_pandas().sort_values("media_id")
    assert meta.reset_index(drop=True).equals(meta2.reset_index(drop=True))


def test_frame_sampling(ray_session):
    ds = synth_media_dataset(100)
    meta = media_meta(ds).to_pandas()
    frames = sample_frames(ds, stride=10).to_pandas()
    vids = meta[meta.kind == KIND_VIDEO]
    # every video contributes ceil(n_frames/10) frames; others only if multi-frame
    want = int(sum((vids.n_frames + 9) // 10)) + int((meta.kind != KIND_VIDEO).sum())
    assert len(frames) == want
    assert (frames.frame.str.len() > 0).all()


def test_strict_mode_raises():
    import pyarrow as pa

    stage = MediaDecodeStage(strict=True)
    with pytest.raises(NotImplementedError, match="PIL"):
        stage(pa.table({"media_id": pa.array([1], pa.int64()),
                        "payload": pa.array([b"SRAY" + b"\0" * 12], pa.binary())}))


def test_corrupt_payload_flagged(ray_session):
    import pyarrow as pa
    import ray.data as rd

    bad = rd.from_arrow(
        pa.table({"media_id": pa.array([7], pa.int64()),
                  "payload": pa.array([b"not a media blob"], pa.binary())})
    )
    meta = media_meta(bad).to_pandas()
    assert not meta.decoded_ok.iloc[0]
    assert meta.kind.iloc[0] == -1
