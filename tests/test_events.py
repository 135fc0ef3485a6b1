"""Event-stream operator unit tests on crafted fixtures (the contract tests
cover oracle parity on the sf tables; these pin the tie/edge semantics)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.pipelines.events import asof_join


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, us, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_join_semantics(tmp_path, ray_session):
    """Strictly-earlier match; equal-ts rights break ties by max event_id;
    equal-ts left/right do NOT match; unmatched lefts are dropped; users
    never cross."""
    rows = [
        # user 1: two views at the SAME us=100 (ids 11, 12) then clicks
        (11, 1, 100, "view", 0.0),
        (12, 1, 100, "view", 0.0),
        (20, 1, 100, "click", 0.0),   # same ts as views -> NO match (strict)
        (21, 1, 150, "click", 0.0),   # matches view 12 (max id at us=100)
        (13, 1, 160, "view", 0.0),
        (22, 1, 170, "click", 0.0),   # matches view 13
        # user 2: click before any view -> dropped
        (30, 2, 50, "click", 0.0),
        (14, 2, 60, "view", 0.0),
        (31, 2, 90, "click", 0.0),    # matches view 14
        # user 3: views only -> no output
        (15, 3, 10, "view", 0.0),
        # other event types are ignored entirely
        (40, 1, 155, "purchase", 1.0),
    ]
    d = _write_events(tmp_path, rows)
    out = asof_join(d).to_pandas().sort_values("event_id").reset_index(drop=True)
    got = list(zip(out.event_id, out.matched_event_id, out.lag_us))
    assert got == [(21, 12, 50), (22, 13, 10), (31, 14, 30)]
    assert list(out.user_id) == [1, 1, 2]


def test_asof_join_empty_sides(tmp_path, ray_session):
    d = _write_events(tmp_path, [(1, 1, 10, "view", 0.0)])
    out = asof_join(d).to_pandas()
    assert len(out) == 0
    # Ray's to_pandas drops columns when EVERY block is empty; when columns
    # survive they must match the declared schema
    if len(out.columns):
        assert list(out.columns) == [
            "event_id", "user_id", "matched_event_id", "lag_us",
        ]
