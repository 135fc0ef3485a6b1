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
