"""Worker-process runtime tuning.

pyarrow sizes its compute (Acero group_by, parquet codec) thread pool to
the machine's core count PER PROCESS. Under Ray, N worker processes each
spawn an N-thread pool and the node thrashes (measured 3-17x CPU-time
inflation on the tokenize and encode stages at 32 workers). Every
worker-side batch fn calls `cap_worker_threads()` first — idempotent,
~0 cost after the first call. The DRIVER process is intentionally NOT
capped (driver-side Arrow fast paths want the full pool).
"""

from __future__ import annotations

import sys
import types

import pyarrow as pa

_capped = False


def stabilize_fsspec_http() -> None:
    """Make `from fsspec.implementations.http import HTTPFileSystem` safe
    under concurrent pipelines.

    aiohttp is absent in this environment, so that import always fails; Ray
    catches the ModuleNotFoundError per call — but when two Ray Data
    pipelines start concurrently (docs ∥ segments threads), one thread can
    observe the partially-initialized module and get a plain ImportError,
    which Ray does NOT catch. Pre-seeding a stub module (with a sentinel
    HTTPFileSystem class that nothing is an instance of) removes the import
    machinery from the hot path entirely."""
    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)
    except ImportError:
        stub = types.ModuleType(name)

        class HTTPFileSystem:  # sentinel: no local fs is an instance
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules[name] = stub


def cap_worker_threads(n: int = 2) -> None:
    global _capped
    if _capped:
        return
    if pa.cpu_count() > n:
        pa.set_cpu_count(n)
        pa.set_io_thread_count(n)
    # also quiet two Ray-internal per-worker log lines that carry no signal
    # for this repo (empty shuffle blocks / schema-set hashing fallback)
    silence_ray_empty_block_schema_warning()
    _capped = True


def silence_ray_empty_block_schema_warning() -> None:
    """Drop the streaming executor's "RefBundle with a different schema"
    warning on the DRIVER.

    Measured (round 3): Ray's sort exchange emits schema-LESS empty blocks
    for empty partitions even when every user batch fn is schema-stable (a
    minimal range->map_batches->groupby->map_groups pipeline with fixed
    schemas still triggers it), so the warning carries no signal about this
    repo's operators — all of which now guard empty inputs with explicit
    pa.schema empty_table() returns (pipelines/events.py). Real drift in
    our fns would surface as hard errors (missing columns) instead."""
    import logging

    class _DropEmptyBlockSchemaNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "RefBundle with a different schema" not in record.getMessage()

    class _DropSchemaHashNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            # transform_pyarrow falls back to a full unify when the schema
            # set is unhashable — correctness is unaffected, the warning
            # only reports the missed dedup fast path
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptyBlockSchemaNoise())
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashNoise())


_SIZE_SUFFIXES = ("B", "KB", "MB", "GB", "TB", "PB", "EB")


def size_suffix(n_bytes: int, decimals: int = 1) -> str:
    """Human-readable byte count (reference F4: SizeSuffix,
    /root/reference/DataStructures/DataStructs/Functions.cs:13-28 —
    1024-based units, fixed decimal places)."""
    if n_bytes < 0:
        return "-" + size_suffix(-n_bytes, decimals)
    value = float(n_bytes)
    i = 0
    while value >= 1024 and i < len(_SIZE_SUFFIXES) - 1:
        value /= 1024.0
        i += 1
    return f"{value:.{decimals}f} {_SIZE_SUFFIXES[i]}"


def cap_pool_size(concurrency: int) -> int:
    """Clamp a fixed-size actor-pool request to what the cluster can start.

    Ray Data's ActorPoolMapOperator waits for ALL `concurrency` actors of a
    fixed-size pool before finishing; requesting more 1-CPU actors than the
    cluster has CPUs deadlocks the job (measured: concurrency=8 on a 4-CPU
    session hangs forever). One CPU is left for the upstream read tasks."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", concurrency + 1))
            return max(1, min(concurrency, cpus - 1))
    except Exception:
        pass
    return concurrency


def pool_kwargs(concurrency: int) -> dict:
    """map_batches kwargs for a fixed-size 1-CPU actor pool that cannot
    deadlock the cluster: {"concurrency": capped, "num_cpus": c}.

    Beyond cap_pool_size's size clamp, a 1-CPU cluster needs the actor at
    num_cpus=0 — even a single 1-CPU actor claims the only CPU forever and
    starves the upstream read tasks (measured: a concurrency=1 pool on a
    num_cpus=1 session hangs until killed; num_cpus=0 completes). The
    zero-CPU actor oversubscribes a 1-CPU box, which merely timeslices."""
    n = cap_pool_size(concurrency)
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", concurrency + 1))
            if cpus <= 1:
                return {"concurrency": n, "num_cpus": 0}
    except Exception:
        pass
    return {"concurrency": n, "num_cpus": 1}
