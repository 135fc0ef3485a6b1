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


# --- baseline JPEG codec (round 5: motion-JPEG container) -------------------


def test_jpeg_constant_tiles_exact():
    """The determinism contract behind media_video_stats_jpeg: constant
    8x8 blocks round-trip the baseline codec EXACTLY (luma DC quant entry
    8 makes the quantized DC = v - 128 for any v; gray RGB constants put
    chroma DC at 0)."""
    import numpy as np

    from searchengine_ray.functions import media as m

    for v in (0, 1, 7, 128, 200, 255):
        img = np.full((16, 24), v, np.uint8)
        dec = m.decode_jpeg(m.encode_jpeg(img))
        assert dec.shape == (16, 24, 1)
        assert (dec[:, :, 0] == v).all()

    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:8, :8] = 37
    rgb[:8, 8:] = 130
    rgb[8:, :8] = 255
    rgb[8:, 8:] = 4
    assert (m.decode_jpeg(m.encode_jpeg(rgb)) == rgb).all()


def test_jpeg_general_roundtrip_and_meta():
    """General (non-constant) images go through real Huffman AC coding and
    come back within quantization error; odd dims pad+crop; SOF meta
    parses; non-JPEG and progressive streams raise."""
    import numpy as np
    import pytest as _pytest

    from searchengine_ray.functions import media as m

    x = np.linspace(0, 255, 40)
    y = np.linspace(0, 255, 24)
    img = ((x[None, :] + y[:, None]) / 2).astype(np.uint8)
    dec = m.decode_jpeg(m.encode_jpeg(img))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3

    rgb = np.stack([img, img[::-1], 255 - img], axis=2)
    dec3 = m.decode_jpeg(m.encode_jpeg(rgb))
    assert dec3.shape == rgb.shape
    assert np.abs(dec3.astype(int) - rgb.astype(int)).max() <= 20

    odd = (np.arange(13 * 21, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(13, 21)
    assert m.decode_jpeg(m.encode_jpeg(odd)).shape == (13, 21, 1)

    b = m.encode_jpeg(np.zeros((13, 21, 3), np.uint8))
    assert m.parse_jpeg_meta(b) == (21, 13, 3)
    assert m.parse_jpeg_meta(b"notajpeg") is None
    with _pytest.raises(ValueError, match="not a JPEG"):
        m.decode_jpeg(b"notajpeg")
    # flip SOF0 (0xC0) to SOF2 (0xC2, progressive) -> explicit refusal
    prog = bytearray(b)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        m.decode_jpeg(bytes(prog))


def test_jpeg_restart_intervals():
    """DRI streams decode identically to single-interval streams: the
    reader must realign at every RSTn boundary even though it usually
    still holds pad bits (the .marker latch is only set by a read that
    ran dry). Covers gray/444/420, RST0..7 cycling, and a corrupted
    restart byte raising instead of mis-decoding."""
    import numpy as np
    import pytest as _pytest

    from searchengine_ray.functions import media as m

    rng = np.random.default_rng(7)
    for shape, sub in [((16, 16), "444"), ((24, 17, 3), "444"), ((33, 31, 3), "420")]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = m.decode_jpeg(m.encode_jpeg(img, subsample=sub))
        for ri in (1, 3):
            b = m.encode_jpeg(img, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in b and b"\xff\xd0" in b  # DRI + RST0
            assert np.array_equal(m.decode_jpeg(b), base)

    # > 8 intervals: markers cycle RST0..RST7 and keep decoding exactly
    img = rng.integers(0, 256, (8, 8 * 20), dtype=np.uint8)
    b = m.encode_jpeg(img, restart_interval=1)
    for n in range(8):
        assert bytes([0xFF, 0xD0 + n]) in b
    assert np.array_equal(m.decode_jpeg(b), m.decode_jpeg(m.encode_jpeg(img)))

    # corrupting a restart marker fails loudly, never silently mis-decodes
    i = b.find(b"\xff\xd0")
    bad = b[: i + 1] + b"\xd9" + b[i + 2 :]
    with _pytest.raises(ValueError, match="restart"):
        m.decode_jpeg(bad)


def test_jpeg_dct_matches_naive_reference():
    """The 8x8 DCT matrix used by both codec directions reproduces the
    T.81 double-loop definition."""
    import math

    import numpy as np

    from searchengine_ray.functions import media as m

    rng = np.random.RandomState(7)
    blk = rng.randint(0, 256, (8, 8)).astype(np.float64) - 128.0
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for xx in range(8):
                for yy in range(8):
                    s += (
                        blk[xx, yy]
                        * math.cos((2 * xx + 1) * u * math.pi / 16)
                        * math.cos((2 * yy + 1) * v * math.pi / 16)
                    )
            ref[u, v] = 0.25 * cu * cv * s
    assert np.abs(m._DCT_M @ blk @ m._DCT_M.T - ref).max() < 1e-9


def test_motion_jpeg_container_roundtrip_and_strict():
    """encode_video(codec='jpeg') produces a container of real baseline
    JPEG frames: meta parses, the walk yields JFIF payloads, constant-tile
    frames decode exactly, strict MediaDecodeStage accepts it, truncation
    raises, and mixed PNG/JPEG containers decode per frame."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.functions import media as m

    frames = []
    for f in range(3):
        tiles = ((np.arange(6, dtype=np.int64) * 13 + 5 * f) % 256).astype(np.uint8)
        gray = np.kron(tiles.reshape(2, 3), np.ones((8, 8), np.uint8))
        frames.append(np.repeat(gray[:, :, None], 3, axis=2))
    b = m.encode_video(frames, fps=10, codec="jpeg")
    assert m.parse_video_meta(b) == (24, 16, 3, 10)
    for i, off, payload in m.iter_video_frames(b):
        assert payload[:2] == b"\xff\xd8"  # a real JFIF frame
        assert m.parse_jpeg_meta(payload) == (24, 16, 3)
        assert (m.decode_video_frame(payload) == frames[i]).all()
    stage = MediaDecodeStage(strict=True)
    out = stage(
        pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([b], pa.binary())})
    ).to_pandas()
    assert out.decoded_ok.iloc[0] and out.kind.iloc[0] == KIND_VIDEO
    with pytest.raises(ValueError, match="truncated"):
        list(m.iter_video_frames(b[: len(b) - 2]))
    # mixed-codec container: the per-frame sniff picks the right decoder
    mixed_frames = [m.encode_png(frames[0]), m.encode_jpeg(frames[1])]
    import struct as _struct

    hdr = _struct.pack("<4sHHHH", m.VIDEO_SIG, 24, 16, 2, 10)
    body = b"".join(
        _struct.pack("<I", len(p)) + p for p in mixed_frames
    )
    got = [m.decode_video_frame(p) for _i, _o, p in m.iter_video_frames(hdr + body)]
    assert (got[0] == frames[0]).all() and (got[1] == frames[1]).all()


def test_jpeg_420_subsampling():
    """4:2:0 both directions: constant 16x16 MCU tiles round-trip exactly
    (box-averaged chroma of a constant is the constant); gradients come
    back within quantization+subsampling tolerance; odd dims pad+crop;
    the SOF carries the 0x22/0x11 sampling factors."""
    import numpy as np

    from searchengine_ray.functions import media as m

    img = np.zeros((32, 32, 3), np.uint8)
    img[:16, :16] = 40
    img[:16, 16:] = 131
    img[16:, :16] = 254
    img[16:, 16:] = 6
    b = m.encode_jpeg(img, subsample="420")
    assert m.parse_jpeg_meta(b) == (32, 32, 3)
    assert (m.decode_jpeg(b) == img).all()

    x = np.linspace(0, 255, 48)
    y = np.linspace(0, 255, 32)
    gr = ((x[None, :] + y[:, None]) / 2).astype(np.uint8)
    rgb = np.stack([gr, gr[::-1], 255 - gr], axis=2)
    dec = m.decode_jpeg(m.encode_jpeg(rgb, subsample="420"))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.max() <= 40 and err.mean() < 6

    odd = np.random.RandomState(3).randint(0, 256, (19, 27, 3), np.uint8)
    assert m.decode_jpeg(m.encode_jpeg(odd, subsample="420")).shape == (19, 27, 3)


def test_oversized_actor_pool_request_completes(ray_session):
    """Requesting a fixed-size actor pool larger than the cluster must not
    deadlock: Ray Data waits for ALL actors of a fixed-size pool, so the
    library clamps concurrency to cluster CPUs (functions/runtime.py
    cap_pool_size; measured hang: concurrency=8 on a 4-CPU session)."""
    from searchengine_ray.pipelines.multimodal import media_video_stats_jpeg

    df = media_video_stats_jpeg(
        "/root/testdata/sf0.001", concurrency=64
    ).to_pandas()
    assert len(df) > 0


def test_actor_pool_on_one_cpu_cluster_completes():
    """A fixed-size pool on a 1-CPU cluster is the degenerate deadlock: the
    single 1-CPU actor claims the only CPU and the upstream read tasks
    starve forever (measured hang before the fix). pool_kwargs drops the
    actor to num_cpus=0 there so reads can interleave. Fresh subprocess:
    needs its own ray.init(num_cpus=1)."""
    import subprocess
    import sys

    code = """
import ray, sys
sys.path.insert(0, "/root/repo")
ray.init(address="local", num_cpus=1, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from searchengine_ray.pipelines.multimodal import media_meta, media_dataset_from_documents
df = media_meta(media_dataset_from_documents("/root/testdata/sf0.001")).to_pandas()
assert len(df) > 0, len(df)
ray.shutdown()
print("ONECPU_OK", len(df))
"""
    import os

    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert "ONECPU_OK" in out.stdout, out.stdout + out.stderr


def test_jpeg_fast_entropy_reader_matches_bitwise_reference():
    """The LUT16 fast entropy path must be bit-identical to the T.81
    F.2.2 bit-by-bit procedure (the _JpegBitReader/_huff_decode_symbol
    pair, kept as the executable reference). Fuzz random images through
    every subsample/restart shape and replay each scan with both readers,
    comparing every decoded Huffman symbol and value-bit read."""
    import numpy as np

    from searchengine_ray.functions import media as m

    rng = np.random.default_rng(20260818)

    def replay(b):
        """Decode b's entropy stream symbol-by-symbol with BOTH readers,
        returning the (symbol, bits) transcript of each."""
        # parse just enough of the headers (tables + scan offset)
        pos = 2
        import struct as st

        huff_raw = {}
        comps = []
        restart = 0
        scan_tabs = []
        h = w = 0
        while True:
            marker = b[pos + 1]
            ln = st.unpack(">H", b[pos + 2 : pos + 4])[0]
            body = b[pos + 4 : pos + 2 + ln]
            if marker == 0xC4:
                off = 0
                while off < len(body):
                    tc, th = body[off] >> 4, body[off] & 0x0F
                    bits = list(body[off + 1 : off + 17])
                    nv = sum(bits)
                    vals = list(body[off + 17 : off + 17 + nv])
                    huff_raw[(tc, th)] = (bits, vals)
                    off += 17 + nv
            elif marker in (0xC0, 0xC1):
                _p, h, w, nc = st.unpack(">BHHB", body[:6])
                for ci in range(nc):
                    _cid, samp, _tq = body[6 + 3 * ci : 9 + 3 * ci]
                    comps.append((samp >> 4, samp & 0x0F))
            elif marker == 0xDD:
                restart = st.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                ns = body[0]
                scan_tabs = [
                    (body[2 + 2 * si] >> 4, body[2 + 2 * si] & 0x0F)
                    for si in range(ns)
                ]
                scan_pos = pos + 2 + ln
                break
            pos += 2 + ln

        hmax = max(c[0] for c in comps)
        vmax = max(c[1] for c in comps)
        mcu_rows, mcu_cols = -(-h // (8 * vmax)), -(-w // (8 * hmax))

        def walk(decode_symbol, read_bits, do_restart):
            out = []
            pred_reset = [0]
            mcu = 0
            for _my in range(mcu_rows):
                for _mx in range(mcu_cols):
                    if restart and mcu and mcu % restart == 0:
                        do_restart()
                    mcu += 1
                    for ci, (hi, vi) in enumerate(comps):
                        for _ in range(hi * vi):
                            size = decode_symbol((0, scan_tabs[ci][0]))
                            out.append(("dc", size, read_bits(size) if size else 0))
                            k = 1
                            while k < 64:
                                sym = decode_symbol((1, scan_tabs[ci][1]))
                                out.append(("ac", sym))
                                if sym == 0x00:
                                    break
                                run, sz = sym >> 4, sym & 0x0F
                                if sz == 0:
                                    k += 16
                                    continue
                                k += run
                                out.append(("bits", read_bits(sz)))
                                k += 1
            return out

        slow = m._JpegBitReader(b, scan_pos)
        slow_tabs = {k: m._huff_decode_table(*v) for k, v in huff_raw.items()}
        t_slow = walk(
            lambda key: m._huff_decode_symbol(slow, slow_tabs[key]),
            slow.read_bits,
            slow.restart,
        )
        fast = m._FastEntropyReader(m._split_entropy_segments(b, scan_pos))
        fast_tabs = {k: m._huff_lut16(*v) for k, v in huff_raw.items()}
        t_fast = walk(
            lambda key: fast.decode_symbol(fast_tabs[key]),
            fast.read_bits,
            fast.restart,
        )
        return t_slow, t_fast

    for trial in range(6):
        hgt, wid = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        if trial % 2:
            img = rng.integers(0, 256, (hgt, wid, 3), np.uint8)
        else:
            img = rng.integers(0, 256, (hgt, wid), np.uint8)
        for kwargs in ({}, {"restart_interval": 2}):
            if img.ndim == 3 and trial % 3 == 0:
                kwargs = dict(kwargs, subsample="420")
            b = m.encode_jpeg(img, **kwargs)
            t_slow, t_fast = replay(b)
            assert t_slow == t_fast, (trial, kwargs)


def test_jpeg_large_segment_ndarray_window(monkeypatch):
    """Above _WINDOW_LIST_MAX_BITS the entropy window stays an int32
    ndarray (memory bound); the decode must be identical to the list
    path, including value extension (signed arithmetic) and restarts."""
    import numpy as np

    from searchengine_ray.functions import media as m

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (48, 56, 3), np.uint8)
    for kwargs in ({}, {"restart_interval": 3}, {"subsample": "420"}):
        b = m.encode_jpeg(img, **kwargs)
        want = m.decode_jpeg(b)  # list path
        monkeypatch.setattr(m, "_WINDOW_LIST_MAX_BITS", 0)
        got = m.decode_jpeg(b)  # ndarray path
        monkeypatch.undo()
        assert np.array_equal(got, want), kwargs
