"""bench.py drives the per-round BENCH recording: its LAST stdout line must
be one parseable JSON object with the agreed keys, regardless of worker
prints earlier in the stream."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        # the inline two-level scaling pair belongs to the driver's real
        # bench run; the contract test checks the JSON shape quickly
        GRAFT_SKIP_SCALING="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=420,
    ).stdout
    d = json.loads(out.strip().splitlines()[-1])
    assert d["metric"] == "index_build_sec"
    assert d["unit"] == "sec"
    assert d["value"] > 0
    assert d["num_cpus"] == 4
    assert d["sf"] == 0.001
    assert d["n_docs"] > 0 and d["docs_per_sec"] > 0
    for k in ("index_build", "bm25_200_queries", "lexicon_documents", "dedup_minhash", "ann_brute"):
        assert k in d["queries"], k


def test_bench_scaling_inline():
    """The default (driver-recorded) bench embeds the two-level scaling
    evidence: scaling_efficiency + per-level throughput. Tiny input +
    build-only children keep this test fast."""
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        GRAFT_SCALE_LO="2",
        GRAFT_SCALE_HI="4",
        GRAFT_PAGES_MULT="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=420,
    ).stdout
    d = json.loads(out.strip().splitlines()[-1])
    assert "scaling_efficiency" in d, d.get("scaling_error")
    assert d["scaling_efficiency"] > 0
    s = d["scaling"]
    assert s["cpus_lo"] == 2 and s["cpus_hi"] == 4
    assert s["docs_per_sec_lo"] > 0 and s["docs_per_sec_hi"] > 0
