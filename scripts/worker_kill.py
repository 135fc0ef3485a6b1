"""Worker-loss fault-tolerance smoke: SIGKILL Ray data workers mid-build
and assert the finished index equals an undisturbed build.

Driver-kill RESUME is tests/test_resume.py; this is WORKER loss — the
routine failure mode on a real multi-node cluster — exercising Ray's task
retry over the build's idempotent atomic tmp+rename writes. Expectation
(measured, BASELINE.md): the build completes, segments/ and lexicon/ are
BYTE-identical, and the docs map is content-identical (its file names are
Ray write_parquet UUIDs, which differ run to run by design).

  python scripts/worker_kill.py [--pages /tmp/seray_bench_pages_100000]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUILD = r"""
import sys, ray
sys.path.insert(0, %(repo)r)
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
from searchengine_ray.pipelines.build import BuildConfig, build_index
m = build_index(%(pages)r, %(idx)r, BuildConfig(num_partitions=64), source="pages")
print("BUILT", m["n_docs"], m["segments"]["n_postings"])
"""


def tree_hash(d: str, sub: str) -> str:
    h = hashlib.sha256()
    base = os.path.join(d, sub)
    for root, dirs, files in sorted(os.walk(base)):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(root, f), d)
                h.update(rel.encode())
                h.update(open(os.path.join(root, f), "rb").read())
    return h.hexdigest()


def run_build(pages: str, idx: str, kill: bool) -> tuple[int, str, int]:
    shutil.rmtree(idx, ignore_errors=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(
        [sys.executable, "-c", BUILD % {"repo": REPO, "pages": pages, "idx": idx}],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    kills = 0
    if kill:
        deadline = time.time() + 120
        while time.time() < deadline and p.poll() is None and kills < 3:
            time.sleep(2.0)
            # list workers WITH their titles and skip ray::IDLE — killing
            # only idle workers would pass the check vacuously
            out = subprocess.run(
                ["pgrep", "-a", "-f", "ray::"], capture_output=True, text=True
            ).stdout.splitlines()
            busy = [
                int(line.split()[0])
                for line in out
                if "ray::" in line and "ray::IDLE" not in line
            ]
            for v in busy[:1]:
                try:
                    os.kill(v, signal.SIGKILL)
                    kills += 1
                except ProcessLookupError:
                    pass
    stdout, _ = p.communicate(timeout=600)
    return p.returncode, stdout.strip().splitlines()[-1] if stdout.strip() else "", kills


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="/tmp/seray_bench_pages_100000")
    args = ap.parse_args()
    # this script SIGKILLs any `ray::` worker process on the box — it must
    # own the host (same discipline as bench.py); refuse if Ray is already up
    pre = subprocess.run(["pgrep", "-f", "raylet"], capture_output=True, text=True)
    if pre.stdout.strip():
        sys.exit("refusing to run: another Ray session is alive on this host")
    if not os.path.isdir(args.pages):
        sys.path.insert(0, REPO)
        from searchengine_ray.synth import write_pages

        write_pages(args.pages, n_rows=100_000, n_files=32, parallel=False)

    rc0, out0, _ = run_build(args.pages, "/tmp/fk_idx_clean", kill=False)
    rc1, out1, kills = run_build(args.pages, "/tmp/fk_idx_killed", kill=True)
    import pyarrow.parquet as pq

    docs_same = (
        pq.read_table("/tmp/fk_idx_clean/docs").sort_by("doc_id").equals(
            pq.read_table("/tmp/fk_idx_killed/docs").sort_by("doc_id")
        )
    )
    print(json.dumps({
        "clean_rc": rc0, "clean": out0, "killed_rc": rc1, "killed": out1,
        "workers_killed": kills,
        "segments_byte_identical": tree_hash("/tmp/fk_idx_clean", "segments")
        == tree_hash("/tmp/fk_idx_killed", "segments"),
        "lexicon_byte_identical": tree_hash("/tmp/fk_idx_clean", "lexicon")
        == tree_hash("/tmp/fk_idx_killed", "lexicon"),
        "docs_content_identical": bool(docs_same),
    }))


if __name__ == "__main__":
    main()
