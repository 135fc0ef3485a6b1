"""Event-stream operators over the `events` table (event_id, ts, user_id,
event_type, value, props).

The reference is a bounded-streaming system with no event-time operators
(SURVEY.md §2.9), but a training-data pipeline wants the windowed shapes —
expressed here Ray-Data-first:

- `windowed_counts`: tumbling-window aggregate — per-batch partial
  aggregation (combiner) BEFORE the groupby shuffle, so only one row per
  (window, type, user) per batch crosses the wire; value sums use integer
  cents so the result is bit-deterministic under any add order (the SQL
  oracle does the same).
- `sessionize`: per-user session assignment (gap > `gap_s` starts a new
  session) — groupby(user) with a fully vectorized per-group kernel
  (sort, diff, cumsum); the classic window-function shape without a
  window-function engine.

Both have DuckDB oracles in __ray_entry__.oracle_sql().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.runtime import cap_worker_threads

WINDOW_S = 3600
SESSION_GAP_S = 1800

# Empty-input batches MUST return these exact schemas: Acero's group_by on
# a zero-row table silently DROPS the aggregate columns (verified against
# pyarrow in this repo's round-3 session), so an unguarded partial() would
# emit a schema-drifted block and the downstream .select() would fail.
_PARTIAL_SCHEMA = pa.schema(
    [
        ("window_id", pa.int64()),
        ("event_type", pa.string()),
        ("user_id", pa.int64()),
        ("n_p", pa.int64()),
        ("cents_p", pa.int64()),
    ]
)
_WINDOW_SCHEMA = pa.schema(
    [
        ("window_id", pa.int64()),
        ("event_type", pa.string()),
        ("n_events", pa.int64()),
        ("sum_value", pa.float64()),
        ("n_users", pa.int64()),
    ]
)
_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("start_us", pa.int64()),
        ("end_us", pa.int64()),
    ]
)


def read_events(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    path = f"{sf_dir}/events.parquet"
    return rd.read_parquet(path, columns=columns)


def windowed_counts(sf_dir: str, window_s: int = WINDOW_S) -> rd.Dataset:
    """(window_id, event_type, n_events, sum_value, n_users) per tumbling
    window of `window_s` seconds. window_id = epoch_us(ts) // (window_s*1e6).
    sum_value is accumulated in integer cents (deterministic under any
    aggregation order) and divided once at the end."""
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = us // win_us
        typ = t.column("event_type").combine_chunks()
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        sub = pa.table(
            {
                "window_id": pa.array(win, pa.int64()),
                "event_type": typ,
                "user_id": pa.array(user, pa.int64()),
                "n_p": pa.array(np.ones(len(us), np.int64), pa.int64()),
                "cents_p": pa.array(cents, pa.int64()),
            }
        )
        # per-batch combine: one row per (window, type, user)
        agg = (
            sub.group_by(["window_id", "event_type", "user_id"])
            .aggregate([("n_p", "sum"), ("cents_p", "sum")])
            .select(  # name-based: Acero's key/agg column order varies
                ["window_id", "event_type", "user_id", "n_p_sum", "cents_p_sum"]
            )
        )
        return agg.rename_columns(
            ["window_id", "event_type", "user_id", "n_p", "cents_p"]
        )

    def finalize(group: pa.Table) -> pa.Table:
        # one coarse group = many (window, type) cells; vectorized runs
        if group.num_rows == 0:
            return _WINDOW_SCHEMA.empty_table()
        win = group.column("window_id").to_numpy(zero_copy_only=False)
        typ = group.column("event_type").combine_chunks()
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        n_p = group.column("n_p").to_numpy(zero_copy_only=False)
        cents = group.column("cents_p").to_numpy(zero_copy_only=False)
        typ_codes = typ.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((user, typ_codes, win))
        win, user, n_p, cents, typ_codes = (
            win[order], user[order], n_p[order], cents[order], typ_codes[order]
        )
        typ = typ.take(pa.array(order))
        new = np.empty(len(win), dtype=bool)
        new[0] = True
        new[1:] = (win[1:] != win[:-1]) | (typ_codes[1:] != typ_codes[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(win))
        seg = np.cumsum(new) - 1
        n_events = np.add.reduceat(n_p, starts)
        sum_cents = np.add.reduceat(cents, starts)
        # distinct users per cell: user changes within a cell run
        u_new = np.empty(len(win), dtype=bool)
        u_new[0] = True
        u_new[1:] = new[1:] | (user[1:] != user[:-1])
        n_users = np.bincount(seg[u_new], minlength=len(starts))
        return pa.table(
            {
                "window_id": pa.array(win[starts], pa.int64()),
                "event_type": typ.take(pa.array(starts)),
                "n_events": pa.array(n_events, pa.int64()),
                "sum_value": pa.array(sum_cents / 100.0, pa.float64()),
                "n_users": pa.array(n_users.astype(np.int64), pa.int64()),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        win = t.column("window_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket",
            pa.array((win.view(np.uint64) % np.uint64(64)).astype(np.int32), pa.int32()),
        )

    return (
        read_events(sf_dir, columns=["ts", "event_type", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(finalize, batch_format="pyarrow")
    )


def sessionize(sf_dir: str, gap_s: int = SESSION_GAP_S) -> rd.Dataset:
    """(user_id, session_id, n_events, start_us, end_us) — a session is a
    maximal run of a user's events with inter-event gap <= gap_s;
    session_id counts from 1 in time order per user."""
    gap_us = np.int64(gap_s) * np.int64(1_000_000)

    def per_user(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _SESSION_SCHEMA.empty_table()
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((us, user))
        user, us = user[order], us[order]
        brk = np.empty(len(us), dtype=bool)
        brk[0] = True
        brk[1:] = (user[1:] != user[:-1]) | (us[1:] - us[:-1] > gap_us)
        sid_global = np.cumsum(brk) - 1  # session index across users
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(us))
        # per-user session numbering from 1
        sess_user = user[starts]
        first_of_user = np.empty(len(sess_user), dtype=bool)
        first_of_user[0] = True
        first_of_user[1:] = sess_user[1:] != sess_user[:-1]
        user_first_idx = np.maximum.accumulate(
            np.where(first_of_user, np.arange(len(sess_user)), 0)
        )
        session_id = np.arange(len(sess_user)) - user_first_idx + 1
        return pa.table(
            {
                "user_id": pa.array(sess_user, pa.int64()),
                "session_id": pa.array(session_id.astype(np.int64), pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "start_us": pa.array(us[starts], pa.int64()),
                "end_us": pa.array(us[ends - 1], pa.int64()),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket",
            pa.array((u.view(np.uint64) % np.uint64(64)).astype(np.int32), pa.int32()),
        )

    return (
        read_events(sf_dir, columns=["user_id", "ts"])
        .map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_user, batch_format="pyarrow")
    )


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("matched_event_id", pa.int64()),
        ("lag_us", pa.int64()),
    ]
)


def asof_join(
    sf_dir: str, left_type: str = "click", right_type: str = "view"
) -> rd.Dataset:
    """Per-user as-of join: each `left_type` event matches the latest
    `right_type` event of the SAME user with a strictly earlier timestamp
    (tie among equal-ts rights: max event_id; unmatched lefts dropped).

    The classic range/as-of join Ray Data lacks natively, expressed as a
    coarse user-bucket shuffle + a vectorized per-group kernel — same
    partitioning discipline as sessionize: ONE groupby on `user_id % 64`,
    never a per-user group call. Within a group, rights are lexsorted by
    (user, ts, id) and each left binary-searches a packed (user-rank, ts)
    int64 key — no Python per-row loop.

    Packing assumption (guarded): distinct users per bucket < 2^20 and the
    group's ts span < 2^43 us (~278 years). At larger scale raise the
    bucket count — the per-bucket invariant is what matters, not N.
    """

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _ASOF_SCHEMA.empty_table()
        import pyarrow.compute as pc

        typ = group.column("event_type")
        is_l = pc.equal(typ, left_type).combine_chunks().to_numpy(zero_copy_only=False)
        is_r = pc.equal(typ, right_type).combine_chunks().to_numpy(zero_copy_only=False)
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        if not is_l.any() or not is_r.any():
            return _ASOF_SCHEMA.empty_table()

        # dense user ranks shared by both sides
        uniq, rank = np.unique(user, return_inverse=True)
        t0 = us.min()
        span = int(us.max() - t0) + 1
        ts_bits = max(1, span.bit_length())
        if len(uniq) >= (1 << 20) or ts_bits > 43:  # pragma: no cover
            raise ValueError(
                "asof_join bucket too wide for key packing; raise bucket count"
            )
        key = (rank.astype(np.int64) << ts_bits) | (us - t0)

        l_key, l_us, l_eid, l_user, l_rank = (
            key[is_l], us[is_l], eid[is_l], user[is_l], rank[is_l]
        )
        r_key, r_us, r_eid, r_rank = key[is_r], us[is_r], eid[is_r], rank[is_r]
        order = np.lexsort((r_eid, r_key))  # (user, ts) asc, id asc within ties
        r_key, r_us, r_eid, r_rank = (
            r_key[order], r_us[order], r_eid[order], r_rank[order]
        )
        pos = np.searchsorted(r_key, l_key, side="left") - 1
        ok = pos >= 0
        ok[ok] &= r_rank[pos[ok]] == l_rank[ok]  # same user, strictly earlier ts
        pos = pos[ok]
        return pa.table(
            {
                "event_id": pa.array(l_eid[ok], pa.int64()),
                "user_id": pa.array(l_user[ok], pa.int64()),
                "matched_event_id": pa.array(r_eid[pos], pa.int64()),
                "lag_us": pa.array(l_us[ok] - r_us[pos], pa.int64()),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket",
            pa.array((u.view(np.uint64) % np.uint64(64)).astype(np.int32), pa.int32()),
        )

    return (
        read_events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])
        .filter(
            expr=f"event_type == '{left_type}' or event_type == '{right_type}'"
        )
        .map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
