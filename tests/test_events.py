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


def test_range_join_semantics(tmp_path, ray_session):
    """Inclusive-right (r.ts == l.ts matches), exclusive-left boundary
    (r.ts == l.ts - W does NOT match), multi-match expansion, per-user
    isolation."""
    from searchengine_ray.pipelines.events import range_join

    W = 100  # window_s
    w_us = W * 1_000_000
    rows = [
        # user 1: click at t=1000s(us scale below); views at boundary points
        (10, 1, 5 * w_us, "view", 0.0),            # exactly l.ts - W -> OUT
        (11, 1, 5 * w_us + 1, "view", 0.0),        # just inside -> IN
        (12, 1, 6 * w_us - 7, "view", 0.0),        # inside -> IN
        (13, 1, 6 * w_us, "view", 0.0),            # equal ts -> IN
        (20, 1, 6 * w_us, "click", 0.0),
        # user 2 same timestamps must not leak into user 1
        (14, 2, 6 * w_us - 3, "view", 0.0),
        # a second click of user 1 later, window empty
        (21, 1, 9 * w_us, "click", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    got = (
        range_join(sf, window_s=W)
        .to_pandas()
        .sort_values(["event_id", "matched_event_id"])
        .reset_index(drop=True)
    )
    assert list(got["event_id"]) == [20, 20, 20]
    assert list(got["matched_event_id"]) == [11, 12, 13]
    assert list(got["lag_us"]) == [w_us - 1, 7, 0]
    assert set(got["user_id"]) == {1}


def test_hopping_counts_fanout_and_sums(tmp_path, ray_session):
    """One event lands in exactly window_s/hop_s consecutive windows, with
    identical n_events/sum_value in each; two events a hop apart share the
    overlapping windows."""
    from searchengine_ray.pipelines.events import hopping_counts

    hop_us = 10 * 1_000_000
    rows = [
        (1, 1, 100 * hop_us + 3, "view", 1.25),
        (2, 2, 101 * hop_us + 4, "view", 2.5),
    ]
    sf = _write_events(tmp_path, rows)
    got = (
        hopping_counts(sf, window_s=40, hop_s=10)
        .to_pandas()
        .sort_values("window_id")
        .reset_index(drop=True)
    )
    # event 1 in windows 97..100, event 2 in 98..101
    assert list(got["window_id"]) == [97, 98, 99, 100, 101]
    assert list(got["n_events"]) == [1, 2, 2, 2, 1]
    assert list(got["sum_value"]) == [1.25, 3.75, 3.75, 3.75, 2.5]
    assert list(got["n_users"]) == [1, 2, 2, 2, 1]


def test_distinct_hll_deterministic_and_mergeable(tmp_path, ray_session):
    """The estimate is identical no matter how rows are batched/duplicated
    (register max is order-free and idempotent), and within the expected
    error envelope of the true distinct count."""
    from searchengine_ray.pipelines.events import distinct_hll

    rng = np.random.default_rng(7)
    users = rng.choice(100_000, size=400, replace=False)
    rows = [(i, int(u), i * 1000, "view", 0.0) for i, u in enumerate(users)]
    sf = _write_events(tmp_path, rows)
    a = distinct_hll(sf, p=6).to_pandas()
    # duplicate every event (same users, different event ids/ts) -> same sketch
    rows2 = rows + [
        (10_000 + i, int(u), 999_000_000 + i, "view", 1.0)
        for i, u in enumerate(users)
    ]
    sf2 = _write_events(tmp_path, rows2)
    b = distinct_hll(sf2, p=6).to_pandas()
    assert a["est_distinct"].iloc[0] == b["est_distinct"].iloc[0]
    assert a["n_registers"].iloc[0] + a["v_zero"].iloc[0] == 64
    # m=64 -> ~13% std error; allow 4 sigma
    assert abs(a["est_distinct"].iloc[0] - 400) < 400 * 0.13 * 4

    # higher precision tightens the estimate
    c = distinct_hll(sf, p=10).to_pandas()
    assert abs(c["est_distinct"].iloc[0] - 400) < 400 * 0.033 * 4


def test_rolling_window_tied_timestamps(tmp_path, ray_session):
    """RANGE-frame semantics: rows with the SAME (user, ts) are peers — every
    one of them sees the whole peer group; boundary at exactly ts - W is
    excluded; users isolated."""
    from searchengine_ray.pipelines.events import rolling_user_window

    W = 10  # seconds
    w_us = W * 1_000_000
    rows = [
        (1, 1, 0, "view", 1.00),            # exactly t-W for event at w_us -> OUT
        (2, 1, 1, "view", 2.00),            # just inside
        (3, 1, w_us, "view", 4.00),         # peer A at t
        (4, 1, w_us, "view", 8.00),         # peer B at t (later id, same frame)
        (5, 2, w_us, "view", 100.00),       # other user, same ts
    ]
    sf = _write_events(tmp_path, rows)
    got = (
        rolling_user_window(sf, window_s=W)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert got.loc[1, "n_in_window"] == 1 and got.loc[1, "sum_value"] == 1.0
    assert got.loc[2, "n_in_window"] == 2 and got.loc[2, "sum_value"] == 3.0
    # peers 3 and 4 both see {2, 3, 4} (event 1 is exactly t-W -> excluded)
    for e in (3, 4):
        assert got.loc[e, "n_in_window"] == 3
        assert got.loc[e, "sum_value"] == 14.0
    assert got.loc[5, "n_in_window"] == 1 and got.loc[5, "sum_value"] == 100.0


def test_pivot_counts(tmp_path, ray_session):
    from searchengine_ray.pipelines.events import pivot_event_counts

    rows = [
        (1, 7, 10, "click", 0.0),
        (2, 7, 20, "click", 0.0),
        (3, 7, 30, "view", 0.0),
        (4, 8, 40, "error", 0.0),
        (5, 8, 50, "weird_type", 0.0),  # outside the fixed list -> n_total only
    ]
    sf = _write_events(tmp_path, rows)
    got = pivot_event_counts(sf).to_pandas().set_index("user_id").sort_index()
    assert got.loc[7, "n_click"] == 2 and got.loc[7, "n_view"] == 1
    assert got.loc[7, "n_total"] == 3 and got.loc[7, "n_error"] == 0
    assert got.loc[8, "n_error"] == 1 and got.loc[8, "n_total"] == 2
    assert got.loc[8, "n_click"] == 0


def test_split_assign_stable_and_proportional(ray_session):
    """Hash-based split: proportions approximately match weights at sf0.01, and each
    doc's assignment is a pure function of doc_id — independent of which
    other docs exist (checked by subsetting)."""
    from searchengine_ray.pipelines.textops import split_assign

    df = split_assign("/root/testdata/sf0.01").to_pandas()
    n = len(df)
    frac = df["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac.get("val", 0) - 0.1) < 0.04
    assert abs(frac.get("test", 0) - 0.1) < 0.04
    small = split_assign("/root/testdata/sf0.001").to_pandas()
    merged = small.merge(df, on="doc_id", suffixes=("_s", "_l"))
    assert len(merged) > 0
    assert (merged["split_s"] == merged["split_l"]).all()


def test_funnel_strictly_after_semantics(ray_session, tmp_path):
    """Crafted chains: same-timestamp stage-2 events do NOT count
    (strictly-after); out-of-order stages don't either; the earliest
    valid chain is picked per user."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.events import funnel

    base = 1_700_000_000_000_000  # us
    rows = [
        # user 1: full chain view(0) -> click(10) -> purchase(20)
        (1, 1, base + 0, "view"),
        (2, 1, base + 10, "click"),
        (3, 1, base + 20, "purchase"),
        # user 2: click at SAME ts as view -> stops at step 1
        (4, 2, base + 0, "view"),
        (5, 2, base + 0, "click"),
        # user 3: purchase BEFORE click -> steps 2 (view, click) only
        (6, 3, base + 0, "view"),
        (7, 3, base + 5, "purchase"),
        (8, 3, base + 9, "click"),
        # user 4: two views; chain must start at the EARLIEST view, and a
        # click between them still counts (strictly after view#1)
        (9, 4, base + 0, "view"),
        (10, 4, base + 3, "click"),
        (11, 4, base + 6, "view"),
        # user 5: no view at all -> 0 steps
        (12, 5, base + 0, "click"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/events.parquet")
    out = funnel(d).to_pandas().set_index("user_id").sort_index()
    assert out.loc[1, "steps_completed"] == 3 and out.loc[1, "t3_us"] == base + 20
    assert out.loc[2, "steps_completed"] == 1 and out.loc[2, "t2_us"] == -1
    assert out.loc[3, "steps_completed"] == 2 and out.loc[3, "t3_us"] == -1
    assert out.loc[4, "steps_completed"] == 2 and out.loc[4, "t1_us"] == base + 0
    assert out.loc[5, "steps_completed"] == 0 and out.loc[5, "t1_us"] == -1


def test_retention_cohorts_crafted(tmp_path, ray_session):
    """Weeks are epoch-aligned (us // 7d); cohort = user's min week; one
    count per (user, offset) even with many events that week."""
    from searchengine_ray.pipelines.events import retention_cohorts

    WEEK = 7 * 86400 * 1_000_000
    rows = [
        # user 1: cohort week 0, active weeks 0, 1, 3 (two events in wk 1)
        (1, 1, 10, "view", 0.0),
        (2, 1, WEEK + 5, "view", 0.0),
        (3, 1, WEEK + 99, "click", 0.0),
        (4, 1, 3 * WEEK + 1, "view", 0.0),
        # user 2: cohort week 1, active weeks 1 and 2
        (5, 2, WEEK + 50, "view", 0.0),
        (6, 2, 2 * WEEK + 50, "view", 0.0),
        # user 3: cohort week 0 only
        (7, 3, 20, "view", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    out = (
        retention_cohorts(d)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    got = list(zip(out.cohort_week, out.week_offset, out.n_users))
    assert got == [
        (0, 0, 2),  # users 1, 3
        (0, 1, 1),  # user 1 back in week 1 (counted once)
        (0, 3, 1),  # user 1 back in week 3
        (1, 0, 1),  # user 2's cohort
        (1, 1, 1),  # user 2 back in week 2
    ]


def test_anomaly_days_crafted(tmp_path, ray_session):
    """Integer z-test: a flat series flags nothing... except that a
    constant series has var 0, so EVERY day satisfies (nc-s)^2 >= 0 —
    the degenerate-but-correct z-test edge; a single spike day in an
    otherwise flat series is the only flag once var > 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines import events as ev

    day_us = 86400 * 1_000_000
    # type "flat": 3 events/day for 10 days -> var 0 -> all 10 days flag
    # type "spiky": 2/day for 9 days, 30 on day 9 -> only day 9 flags at 2σ
    ts, typ = [], []
    for d in range(10):
        ts += [d * day_us + i for i in range(3)]
        typ += ["flat"] * 3
    for d in range(9):
        ts += [d * day_us + 1000 + i for i in range(2)]
        typ += ["spiky"] * 2
    ts += [9 * day_us + 1000 + i for i in range(30)]
    typ += ["spiky"] * 30
    n = len(ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(typ, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = ev.anomaly_days(str(tmp_path)).to_pandas()
    flat = out[out.event_type == "flat"]
    spiky = out[out.event_type == "spiky"]
    assert len(flat) == 10  # zero-variance: every day trivially flags
    assert list(spiky.day_id) == [9] and list(spiky.n_events) == [30]


def test_anomaly_integer_ztest_matches_rational():
    """Property: the integer flag (n*c - s)^2 >= sigma^2*(n*s2 - s^2) is
    EXACTLY (c - mean)^2 >= sigma^2 * var over the rationals — no float
    boundary cases exist by construction."""
    from fractions import Fraction

    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(200):
        n = int(rng.integers(1, 12))
        counts = rng.integers(1, 10_000, n).tolist()
        s, s2 = sum(counts), sum(c * c for c in counts)
        mean = Fraction(s, n)
        var = Fraction(s2, n) - mean * mean
        for c in counts:
            int_flag = (n * c - s) ** 2 >= 4 * (n * s2 - s * s)
            frac_flag = (Fraction(c) - mean) ** 2 >= 4 * var
            assert int_flag == frac_flag
