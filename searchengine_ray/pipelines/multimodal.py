"""Multimodal columns: image/audio/video as opaque `binary` with typed
metadata. The decode kernels themselves are STUBS (no image/audio libs in
this container — clearly marked below); the Ray-side plumbing — schema,
actor-pool stage, batch sizing, output layout — is real and tested.

Pattern: a stateful actor-pool `map_batches` stage (decoder state built
once per actor in __init__), small batch sizes because each row carries a
large binary payload, `batch_format="pyarrow"` end-to-end (binary columns
do NOT round-trip pandas cleanly).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.runtime import cap_worker_threads

# 16-byte deterministic fake media header: magic, kind, width, height, n_frames
# NB: a module-level struct.Struct would break pickle-by-value task
# serialization (__ray_entry__ registers this module; Struct objects are
# unpicklable) — use the format-string API instead.
_MAGIC = b"SRAY"
_HEADER_FMT = "<4sHHHHxx"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2


def make_media_payload(kind: int, width: int, height: int, n_frames: int, body: bytes) -> bytes:
    """Synthesize a deterministic fake media blob (fixtures + tests)."""
    return struct.pack(_HEADER_FMT, _MAGIC, kind, width, height, n_frames) + body


class MediaDecodeStage:
    """Actor-pool stage: binary payload -> typed metadata (+ features).

    __init__ loads the decoder ONCE per actor. Real decoders (PIL,
    libsndfile, pyav) are not in this container: `strict=True` raises
    NotImplementedError at the decode site; the default decodes the
    deterministic fake header, which exercises the identical plumbing.
    """

    def __init__(self, strict: bool = False):
        cap_worker_threads()
        self.strict = strict
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict and not self.pil:
            raise NotImplementedError(
                "real media decode requires PIL/libsndfile/pyav (not in container); "
                "run with strict=False for the deterministic fake-header decoder"
            )
        payloads = t.column("payload").to_pylist()
        kinds, widths, heights, frames, nbytes, ok = [], [], [], [], [], []
        for p in payloads:
            nbytes.append(len(p))
            if p[:4] == _MAGIC and len(p) >= _HEADER_SIZE:
                _, kind, w, h, nf = struct.unpack(_HEADER_FMT, p[:_HEADER_SIZE])
                kinds.append(kind)
                widths.append(w)
                heights.append(h)
                frames.append(nf)
                ok.append(True)
            else:
                kinds.append(-1)
                widths.append(0)
                heights.append(0)
                frames.append(0)
                ok.append(False)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": pa.array(kinds, pa.int32()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_frames": pa.array(frames, pa.int32()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "decoded_ok": pa.array(ok, pa.bool_()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: sample every `stride`-th frame of a fake video
    payload; emits one row per sampled frame (flat_map shape). Frame
    content here is a deterministic slice of the body bytes — the real
    kernel would be pyav decode (stubbed, see MediaDecodeStage)."""

    def __init__(self, stride: int = 10, frame_bytes: int = 64):
        cap_worker_threads()
        self.stride = stride
        self.frame_bytes = frame_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, frame_idx, offs, lens, frames = [], [], [], [], []
        for mid, p in zip(t.column("media_id").to_pylist(), t.column("payload").to_pylist()):
            if p[:4] != _MAGIC:
                continue
            _, kind, w, h, nf = struct.unpack(_HEADER_FMT, p[:_HEADER_SIZE])
            body = p[_HEADER_SIZE:]
            for j in range(0, nf, self.stride):
                start = (j * self.frame_bytes) % max(1, len(body) or 1)
                frame = body[start : start + self.frame_bytes]
                ids_out.append(mid)
                frame_idx.append(j)
                offs.append(start)
                lens.append(len(frame))
                frames.append(frame)
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame_off": pa.array(offs, pa.int64()),
                "frame_len": pa.array(lens, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_meta(media_ds: rd.Dataset, concurrency: int = 2, batch_size: int = 64) -> rd.Dataset:
    """Decode metadata via the actor pool (small batches: binary payloads)."""
    return media_ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(media_ds: rd.Dataset, stride: int = 10, concurrency: int = 2) -> rd.Dataset:
    return media_ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_dataset_from_documents(sf_dir: str) -> rd.Dataset:
    """Deterministic media table DERIVED from the `documents` table: one
    payload per doc_id, with header fields computed from doc_id by fixed
    integer formulas. This makes the decode plumbing oracle-checkable —
    the DuckDB oracle recomputes the expected metadata from doc_id with
    the same formulas, so media_meta/media_frames verify that the binary
    encode -> actor-pool decode round-trip inverts exactly. The payload
    BYTES are real (built + parsed through the same struct header as any
    media blob); only their content rule is synthetic (no media libs in
    this container — see MediaDecodeStage)."""
    from ..sources.tables import read_documents

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        kinds = ids % 3
        widths = 16 + ids % 497
        heights = 16 + (ids // 7) % 481
        nfs = np.where(kinds == 2, 1 + ids % 97, 1)
        blens = 64 + ids % 256
        payloads = []
        for i in range(len(ids)):
            body = bytes((int(ids[i]) + 31 * j) % 256 for j in range(int(blens[i])))
            payloads.append(
                make_media_payload(
                    int(kinds[i]), int(widths[i]), int(heights[i]), int(nfs[i]), body
                )
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return read_documents(sf_dir, columns=["doc_id"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def synth_media_dataset(n: int = 200, seed: int = 99) -> rd.Dataset:
    """Deterministic fake media table (media_id, payload)."""
    g = np.random.Generator(np.random.PCG64(seed))
    rows_id, rows_payload = [], []
    for i in range(n):
        kind = int(g.integers(0, 3))
        w, h = int(g.integers(16, 512)), int(g.integers(16, 512))
        nf = int(g.integers(1, 100)) if kind == KIND_VIDEO else 1
        body = g.integers(0, 256, int(g.integers(64, 2048)), dtype=np.uint8).tobytes()
        rows_id.append(i)
        rows_payload.append(make_media_payload(kind, w, h, nf, body))
    return rd.from_arrow(
        pa.table(
            {"media_id": pa.array(rows_id, pa.int64()), "payload": pa.array(rows_payload, pa.binary())}
        )
    )
