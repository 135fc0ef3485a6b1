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


def test_strict_mode():
    """strict=True: real formats and the fixture header decode; anything
    else raises instead of flowing through as decoded_ok=False."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.functions.media import encode_png, encode_wav

    stage = MediaDecodeStage(strict=True)
    img = encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    wav = encode_wav(np.arange(100, dtype=np.int16), 8000)
    out = stage(
        pa.table(
            {
                "media_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array([b"SRAY" + b"\0" * 12, img, wav], pa.binary()),
            }
        )
    ).to_pandas()
    assert out.decoded_ok.all()
    assert list(out.width) == [0, 4, 1]  # header w=0; png w=4; wav channels=1
    assert out.height.iloc[2] == 8000 and out.n_frames.iloc[2] == 100
    with pytest.raises(ValueError, match="strict"):
        stage(pa.table({"media_id": pa.array([9], pa.int64()),
                        "payload": pa.array([b"garbage bytes here"], pa.binary())}))


def test_real_png_wav_decode_kernels(ray_session):
    """The decode stage runs the REAL pure-stdlib codecs end-to-end through
    the actor pool, and ImageFeatureStage computes true pixel statistics."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.functions.media import decode_png, encode_png, encode_wav
    from searchengine_ray.pipelines.multimodal import image_features

    g = np.random.Generator(np.random.PCG64(5))
    imgs = [g.integers(0, 256, (h, w, 3), dtype=np.uint8) for h, w in [(8, 6), (3, 9), (16, 16)]]
    payloads = [encode_png(a) for a in imgs] + [
        encode_wav((g.standard_normal(256) * 1000).astype(np.int16), 22050)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "media_id": pa.array(list(range(len(payloads))), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
    )
    meta = media_meta(ds).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert meta.decoded_ok.all()
    assert list(meta.width[:3]) == [6, 9, 16]
    assert list(meta.height[:3]) == [8, 3, 16]
    assert meta.height.iloc[3] == 22050 and meta.n_frames.iloc[3] == 256
    feats = image_features(ds).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert list(feats.ok) == [True, True, True, False]
    for i, a in enumerate(imgs):
        f = a.astype(np.float64)
        luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        assert abs(feats.mean_luma[i] - luma.mean()) < 1e-9
        assert abs(feats.std_luma[i] - luma.std()) < 1e-9
        # decode really inverts encode
        assert (decode_png(payloads[i]) == a).all()


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


def test_video_container_roundtrip_and_strict():
    """SRVF motion-PNG (round 4): encode -> meta parse -> frame walk ->
    per-frame REAL PNG decode inverts the pixels; MediaDecodeStage
    recognizes the container under strict=True; truncation raises."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.functions import media as m

    frames = [
        ((np.arange(5 * 6 * 3) * (f + 3)) % 256).astype(np.uint8).reshape(5, 6, 3)
        for f in range(4)
    ]
    b = m.encode_video(frames, fps=12)
    assert m.parse_video_meta(b) == (6, 5, 4, 12)
    for i, off, png in m.iter_video_frames(b):
        assert b[off : off + len(png)] == png  # offsets are container-true
        assert (m.decode_video_frame(png) == frames[i]).all()
    # strict decode ladder recognizes the container as a video
    stage = MediaDecodeStage(strict=True)
    out = stage(
        pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([b], pa.binary())})
    ).to_pandas()
    assert out.decoded_ok.iloc[0] and out.kind.iloc[0] == KIND_VIDEO
    assert (out.width.iloc[0], out.height.iloc[0], out.n_frames.iloc[0]) == (6, 5, 4)
    # truncated container raises on the frame walk
    with pytest.raises(ValueError, match="truncated"):
        list(m.iter_video_frames(b[: len(b) - 3]))


def test_frame_sampling_real_video(ray_session):
    """FrameSampleStage's SRVF rung: sampled rows carry the TRUE container
    offsets and the frame bytes are real PNGs that decode to the source
    pixels; the fake-header rung keeps working alongside (mixed input)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from searchengine_ray.functions import media as m
    from searchengine_ray.pipelines.multimodal import make_media_payload

    frames = [
        ((np.arange(4 * 4 * 3) + 7 * f) % 256).astype(np.uint8).reshape(4, 4, 3)
        for f in range(5)
    ]
    vid = m.encode_video(frames, fps=10)
    fake = make_media_payload(2, 8, 8, 25, bytes(range(200)))  # KIND_VIDEO fake
    ds = rd.from_arrow(
        pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([vid, fake], pa.binary())})
    )
    out = sample_frames(ds, stride=2).to_pandas().sort_values(["media_id", "frame_idx"])
    real = out[out.media_id == 1]
    assert list(real.frame_idx) == [0, 2, 4]
    for _, r in real.iterrows():
        assert vid[int(r.frame_off) : int(r.frame_off) + int(r.frame_len)] == r.frame
        assert (m.decode_video_frame(r.frame) == frames[int(r.frame_idx)]).all()
    fake_rows = out[out.media_id == 2]
    assert list(fake_rows.frame_idx) == list(range(0, 25, 2))
