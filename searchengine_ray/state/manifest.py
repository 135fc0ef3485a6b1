"""Per-partition manifests: checkpoint/resume + lineage + metrics.

The reference checkpoints at stage granularity (skip a stage when its
output file exists, /root/reference/Indexer/Program.cs:45-62); the rebuild
checkpoints at PARTITION granularity: each inversion partition writes
`_manifest/part-NNNNN.json` atomically (tmp+rename) recording its input
fingerprint, row counts and timings. A rerun skips partitions whose
manifest matches the current input fingerprint — that is what "resumable
from checkpoint with per-partition lineage + metrics" means for a 10^12-doc
build (north rule).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "_manifest")


def part_name(part: int) -> str:
    return f"part-{part:05d}"


def write_json_atomic(path: str, payload: dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        os.replace(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_part_manifest(index_dir: str, part: int, payload: dict[str, Any]) -> None:
    write_json_atomic(os.path.join(manifest_dir(index_dir), part_name(part) + ".json"), payload)


def read_part_manifests(index_dir: str) -> dict[int, dict[str, Any]]:
    d = manifest_dir(index_dir)
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(d):
        return out
    for fn in os.listdir(d):
        if fn.startswith("part-") and fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                m = json.load(f)
            out[int(m["part"])] = m
    return out


def completed_parts(index_dir: str, fingerprint: str) -> set[int]:
    """Parts whose manifest exists AND matches the current input/config."""
    return {
        p
        for p, m in read_part_manifests(index_dir).items()
        if m.get("fingerprint") == fingerprint
    }


def recover_compaction(index_dir: str) -> str | None:
    """Heal a crashed compact() swap (pipelines/update.compact renames
    index_dir -> .pre-compact, then .compacting -> index_dir; a crash
    between the renames would otherwise strand the data with NOTHING at
    index_dir). Called on index open and at compact start.

    - index_dir present, .pre-compact left over  -> finish the cleanup
    - index_dir missing, .compacting committed (gen.json) -> roll FORWARD
    - index_dir missing, only .pre-compact      -> roll BACK
    Returns the action taken, or None if nothing needed healing."""
    import shutil

    pre = index_dir + ".pre-compact"
    comp = index_dir + ".compacting"
    if os.path.isdir(index_dir):
        if os.path.isdir(pre):
            shutil.rmtree(pre)
            return "cleaned"
        return None
    if os.path.isdir(comp) and os.path.exists(os.path.join(comp, "gen.json")):
        os.rename(comp, index_dir)
        if os.path.isdir(pre):
            shutil.rmtree(pre)
        return "rolled_forward"
    if os.path.isdir(pre):
        os.rename(pre, index_dir)
        if os.path.isdir(comp):
            shutil.rmtree(comp)
        return "rolled_back"
    return None
