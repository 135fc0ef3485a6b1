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
- `hopping_counts`: sliding (hopping) windows — each event lands in
  window_s/hop_s overlapping windows; the fan-out happens INSIDE the
  per-batch combiner (np.repeat then immediate group-compress), so the
  shuffle still moves one row per (window, type, user) per batch.
- `range_join`: banded equi+range join (attribution shape): every left
  event matches ALL right events of the same user inside a lookback
  window — the multi-match generalization of `asof_join`, with the same
  coarse-user-bucket shuffle and a vectorized two-searchsorted +
  np.repeat expansion per bucket (no per-row Python).
- `distinct_hll`: HyperLogLog distinct-count sketch (p -> m=2^p
  registers) with a bit-exact deterministic contract: md5-derived 64-bit
  hashes, register rho computed by integer bit-smearing + popcount (no
  float log2), register merges are max (order-free), and the final
  harmonic sum is an INTEGER (sum of 2^(59-rho) per register) so the
  estimate is reproducible bit-for-bit at any cluster size — and
  recomputable by the DuckDB oracle.

All have DuckDB oracles in __ray_entry__.oracle_sql().
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.runtime import cap_worker_threads
from .exchange import coarse_bucket_apply, packed_user_ts_key

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


def _finalize_window_cells(group: pa.Table) -> pa.Table:
    """Merge (window, type, user) partial rows into final (window, type)
    cells — one coarse group holds many cells; fully vectorized runs.
    Shared by windowed_counts (tumbling) and hopping_counts (sliding):
    the merge semantics are identical."""
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

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["ts", "event_type", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "window_id",
        _finalize_window_cells,
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

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["user_id", "ts"]), "user_id", per_user
    )


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("matched_event_id", pa.int64()),
        ("lag_us", pa.int64()),
    ]
)


def _lr_arrays(group: pa.Table, left_type: str, right_type: str):
    """Type masks + column arrays shared by the as-of/range join kernels;
    None when either side is empty in this bucket."""
    typ = group.column("event_type")
    is_l = pc.equal(typ, left_type).combine_chunks().to_numpy(zero_copy_only=False)
    is_r = pc.equal(typ, right_type).combine_chunks().to_numpy(zero_copy_only=False)
    if not is_l.any() or not is_r.any():
        return None
    user = group.column("user_id").to_numpy(zero_copy_only=False)
    us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    return is_l, is_r, user, us, eid


def _lr_events(sf_dir: str, left_type: str, right_type: str) -> rd.Dataset:
    return read_events(
        sf_dir, columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")


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
    (user, ts, id) and each left binary-searches the shared packed
    (user-rank, ts) int64 key (exchange.packed_user_ts_key, width-guarded)
    — no Python per-row loop.
    """

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _ASOF_SCHEMA.empty_table()
        lr = _lr_arrays(group, left_type, right_type)
        if lr is None:
            return _ASOF_SCHEMA.empty_table()
        is_l, is_r, user, us, eid = lr
        rank, _, _, key = packed_user_ts_key(user, us, "asof_join")

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

    return coarse_bucket_apply(
        _lr_events(sf_dir, left_type, right_type), "user_id", per_bucket
    )


RANGE_JOIN_WINDOW_S = 21_600  # 6 h lookback
HOP_S = 900


def range_join(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "view",
    window_s: int = RANGE_JOIN_WINDOW_S,
) -> rd.Dataset:
    """Banded equi+range join: each `left_type` event matches EVERY
    `right_type` event of the same user with ts in (left.ts - window_s,
    left.ts] — all matches, not just the latest (that's `asof_join`).
    Output (event_id, user_id, matched_event_id, lag_us), lag_us in
    [0, window_s*1e6).

    Scale shape: the equi-key (user) rides a coarse 64-way bucket shuffle;
    inside a bucket rights are sorted ONCE by the shared packed
    (user-rank, ts) int64 key (exchange.packed_user_ts_key, width-guarded)
    and every left finds its match run with two np.searchsorted calls; the
    run expansion is np.repeat + arange arithmetic — output work is
    O(n_matches), never O(n_left * n_right).
    """
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _ASOF_SCHEMA.empty_table()
        lr = _lr_arrays(group, left_type, right_type)
        if lr is None:
            return _ASOF_SCHEMA.empty_table()
        is_l, is_r, user, us, eid = lr
        rank, off, ts_bits, key = packed_user_ts_key(user, us, "range_join")

        l_us, l_eid, l_user = us[is_l], eid[is_l], user[is_l]
        l_rank, l_off = rank[is_l], off[is_l]
        r_key, r_us, r_eid = key[is_r], us[is_r], eid[is_r]
        order = np.argsort(r_key, kind="stable")
        r_key, r_us, r_eid = r_key[order], r_us[order], r_eid[order]

        # match run per left: rights with same user, ts in (l.ts - W, l.ts]
        base = l_rank.astype(np.int64) << ts_bits
        lo_key = base | np.maximum(l_off - (win_us - 1), 0)
        hi_key = base | l_off
        lo = np.searchsorted(r_key, lo_key, side="left")
        hi = np.searchsorted(r_key, hi_key, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return _ASOF_SCHEMA.empty_table()
        li = np.repeat(np.arange(len(l_eid)), counts)
        # right position = run start + offset within run
        run_start = np.repeat(lo, counts)
        run_first = np.repeat(np.cumsum(counts) - counts, counts)
        ri = run_start + (np.arange(total) - run_first)
        return pa.table(
            {
                "event_id": pa.array(l_eid[li], pa.int64()),
                "user_id": pa.array(l_user[li], pa.int64()),
                "matched_event_id": pa.array(r_eid[ri], pa.int64()),
                "lag_us": pa.array(l_us[li] - r_us[ri], pa.int64()),
            }
        )

    return coarse_bucket_apply(
        _lr_events(sf_dir, left_type, right_type), "user_id", per_bucket
    )


def hopping_counts(
    sf_dir: str, window_s: int = WINDOW_S, hop_s: int = HOP_S
) -> rd.Dataset:
    """Sliding-window aggregate: windows of `window_s` seconds start every
    `hop_s` seconds (window_s % hop_s == 0); window_id = start_epoch_s //
    hop_s, so window `w` covers [w*hop_s, w*hop_s + window_s). Every event
    lands in window_s/hop_s consecutive windows. Output schema matches
    windowed_counts: (window_id, event_type, n_events, sum_value, n_users).

    The xK fan-out is applied INSIDE the per-batch combiner (np.repeat,
    then the same group-compress as windowed_counts), so the shuffle still
    carries at most one row per (window, type, user) per batch — the
    replication never crosses the wire uncompressed.
    """
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s
    hop_us = np.int64(hop_s) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = us // hop_us
        typ = t.column("event_type").combine_chunks()
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(us)
        # event at hop index h belongs to windows h-k+1 .. h
        win = (h[:, None] - np.arange(k, dtype=np.int64)[None, :]).reshape(-1)
        idx = np.repeat(np.arange(n), k)
        sub = pa.table(
            {
                "window_id": pa.array(win, pa.int64()),
                "event_type": typ.take(pa.array(idx)),
                "user_id": pa.array(user[idx], pa.int64()),
                "n_p": pa.array(np.ones(n * k, np.int64), pa.int64()),
                "cents_p": pa.array(cents[idx], pa.int64()),
            }
        )
        agg = (
            sub.group_by(["window_id", "event_type", "user_id"])
            .aggregate([("n_p", "sum"), ("cents_p", "sum")])
            .select(["window_id", "event_type", "user_id", "n_p_sum", "cents_p_sum"])
        )
        return agg.rename_columns(
            ["window_id", "event_type", "user_id", "n_p", "cents_p"]
        )

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["ts", "event_type", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "window_id",
        _finalize_window_cells,
    )


# --- HyperLogLog distinct-count sketch -------------------------------------

HLL_P = 6  # m = 64 registers; ~13% std err — determinism, not precision,
# is the tested contract (precision scales as 1.04/sqrt(2^p))

_HLL_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("reg", pa.int64()),
        ("rho", pa.int64()),
    ]
)

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact per-element bit_length of a uint64 array via bit smearing +
    byte-table popcount — NO float log2 (a float path rounds up across
    power-of-two boundaries and would diverge from the integer oracle)."""
    w = w.copy()
    for s in (1, 2, 4, 8, 16, 32):
        w |= w >> np.uint64(s)
    return _POP8[w.view(np.uint8).reshape(len(w), 8)].sum(axis=1).astype(np.int64)


def distinct_hll(sf_dir: str, p: int = HLL_P) -> rd.Dataset:
    """(event_type, n_registers, v_zero, est_distinct): HyperLogLog
    estimate of distinct user_id per event_type.

    Deterministic contract (mirrored bit-for-bit by the SQL oracle):
    - hash = first 8 bytes (big-endian) of md5(str(user_id)) — the repo's
      standard md5-derived 64-bit hash.
    - register = top p bits; rho = leading-zero count of the remaining
      (64-p) bits + 1, computed by integer smearing+popcount.
    - merge = per-register MAX (order-free, mergeable at any parallelism).
    - harmonic sum as an INTEGER: S = sum over registers of 2^(59-rho)
      (rho=0 for empty registers), exact in HUGEINT/Python int — no
      float accumulation order to disagree on.
    - raw estimate alpha * m * m * 2^59 / S with the standard small-range
      linear-counting branch (E <= 2.5m and v_zero > 0 -> m*ln(m/v_zero));
      result rounded to 6 decimals.

    Scale shape: per-batch partials emit at most m rows per event_type per
    batch (register max over unique users in the batch); the shuffle is a
    groupby over (event_type) cells of <= m rows each — sketch bytes, not
    data bytes, cross the wire. p is a knob: p=12 gives ~1.6% error at 32 KB
    per (type) cell per batch.
    """
    import hashlib

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    shift = np.uint64(64 - p)
    mask = np.uint64((1 << (64 - p)) - 1)

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _HLL_SCHEMA.empty_table()
        typ = t.column("event_type").combine_chunks()
        user = t.column("user_id").to_numpy(zero_copy_only=False)
        codes = typ.dictionary_encode()
        tcode = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tdict = codes.dictionary
        # hash only the batch's UNIQUE (type, user) pairs
        pair = np.stack([tcode, user], axis=1)
        upair = np.unique(pair, axis=0)
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[:8], "big")
                for u in upair[:, 1]
            ),
            dtype=np.uint64,
            count=len(upair),
        )
        reg = (h >> shift).astype(np.int64)
        w = h & mask
        rho = (np.int64(64 - p) - _bit_length_u64(w)) + 1
        # per (type, reg) max rho
        cell = upair[:, 0] * m + reg
        order = np.argsort(cell, kind="stable")
        cell_s, rho_s = cell[order], rho[order]
        new = np.empty(len(cell_s), dtype=bool)
        if len(cell_s):
            new[0] = True
            new[1:] = cell_s[1:] != cell_s[:-1]
        starts = np.flatnonzero(new)
        rho_max = np.maximum.reduceat(rho_s, starts) if len(starts) else rho_s
        cells = cell_s[starts]
        return pa.table(
            {
                "event_type": tdict.take(pa.array(cells // m)),
                "reg": pa.array(cells % m, pa.int64()),
                "rho": pa.array(rho_max, pa.int64()),
            }
        ).cast(_HLL_SCHEMA)

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.schema(
                [
                    ("event_type", pa.string()),
                    ("n_registers", pa.int64()),
                    ("v_zero", pa.int64()),
                    ("est_distinct", pa.float64()),
                ]
            ).empty_table()
        # one group = one event_type's partial registers from all batches
        reg = group.column("reg").to_numpy(zero_copy_only=False)
        rho = group.column("rho").to_numpy(zero_copy_only=False)
        order = np.argsort(reg, kind="stable")
        reg_s, rho_s = reg[order], rho[order]
        new = np.empty(len(reg_s), dtype=bool)
        new[0] = True
        new[1:] = reg_s[1:] != reg_s[:-1]
        starts = np.flatnonzero(new)
        rho_max = np.maximum.reduceat(rho_s, starts)
        n_present = len(starts)
        v_zero = m - n_present
        # integer harmonic sum: empty registers contribute 2^59 each
        s_int = int(sum(1 << (59 - int(r)) for r in rho_max)) + v_zero * (1 << 59)
        alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1.0 + 1.079 / m))
        est = alpha * m * m * float(2**59) / float(s_int)
        if est <= 2.5 * m and v_zero > 0:
            est = m * float(np.log(m / v_zero))
        est = float(np.floor(est * 1e6 + 0.5) / 1e6)
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n_registers": pa.array([n_present], pa.int64()),
                "v_zero": pa.array([v_zero], pa.int64()),
                "est_distinct": pa.array([est], pa.float64()),
            }
        )

    # partial() caps the shuffle at m rows per event_type per batch — the
    # pre-groupby dataset is sketch-sized by construction, so coalesce to
    # one block (no empty schema-less sort blocks; groups << blocks)
    return (
        read_events(sf_dir, columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .groupby("event_type")
        .map_groups(finalize, batch_format="pyarrow")
    )


ROLLING_WINDOW_S = 3600


def rolling_user_window(
    sf_dir: str, window_s: int = ROLLING_WINDOW_S
) -> rd.Dataset:
    """Per-event rolling aggregate: for EVERY event, the count and
    integer-cent sum of the same user's events with ts in
    (ts - window_s, ts] — the SQL `RANGE BETWEEN ... PRECEDING AND CURRENT
    ROW` window frame (tied timestamps are peers: all rows at the same ts
    see the same frame). Output (event_id, user_id, n_in_window,
    sum_value).

    Scale shape: coarse user-bucket shuffle; inside a bucket, ONE lexsort
    by packed (user-rank, ts) key + a prefix cumsum; every event's frame is
    two np.searchsorted probes into the packed keys — O(n log n) per
    bucket, no per-row Python, no per-user group calls.
    """
    win_us = np.int64(window_s) * np.int64(1_000_000)
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("n_in_window", pa.int64()),
            ("sum_value", pa.float64()),
        ]
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return out_schema.empty_table()
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            group.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)

        rank, off, ts_bits, key = packed_user_ts_key(
            user, us, "rolling_user_window"
        )
        order = np.argsort(key, kind="stable")
        key_s, cents_s = key[order], cents[order]
        csum = np.concatenate(([0], np.cumsum(cents_s)))

        base = rank.astype(np.int64) << ts_bits
        lo_key = base | np.maximum(off - (win_us - 1), 0)
        hi_key = key  # (rank, own ts)
        lo = np.searchsorted(key_s, lo_key, side="left")
        hi = np.searchsorted(key_s, hi_key, side="right")  # incl. ALL ts peers
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(user, pa.int64()),
                "n_in_window": pa.array((hi - lo).astype(np.int64), pa.int64()),
                "sum_value": pa.array((csum[hi] - csum[lo]) / 100.0, pa.float64()),
            }
        )

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["event_id", "user_id", "ts", "value"]),
        "user_id",
        per_bucket,
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(
    sf_dir: str, types: tuple[str, ...] = PIVOT_TYPES
) -> rd.Dataset:
    """Pivot/crosstab: one row per user with a count column per event type
    (fixed, explicit `types` list — a pivot's output schema must be known
    up front to be distributable) plus n_total. Types outside the list
    count only toward n_total.

    Scale shape: per-batch combiner collapses to (user, type) cell counts
    before the shuffle; the coarse user-bucket finalize widens cells to
    columns with one bincount per type — no per-user Python.
    """
    fields = [("user_id", pa.int64())]
    fields += [(f"n_{t}", pa.int64()) for t in types]
    fields.append(("n_total", pa.int64()))
    out_schema = pa.schema(fields)
    cell_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()), ("n_p", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return cell_schema.empty_table()
        agg = (
            t.select(["user_id", "event_type"])
            .append_column("n_p", pa.array(np.ones(t.num_rows, np.int64), pa.int64()))
            .group_by(["user_id", "event_type"])
            .aggregate([("n_p", "sum")])
            .select(["user_id", "event_type", "n_p_sum"])
        )
        return agg.rename_columns(["user_id", "event_type", "n_p"]).cast(cell_schema)

    def finalize(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        typ = group.column("event_type").to_pylist()
        n_p = group.column("n_p").to_numpy(zero_copy_only=False)
        uniq, uidx = np.unique(user, return_inverse=True)
        cols: dict[str, pa.Array] = {"user_id": pa.array(uniq, pa.int64())}
        tcode = np.array([types.index(x) if x in types else -1 for x in typ])
        for ti, tname in enumerate(types):
            mask = tcode == ti
            cols[f"n_{tname}"] = pa.array(
                np.bincount(uidx[mask], weights=n_p[mask], minlength=len(uniq))
                .astype(np.int64),
                pa.int64(),
            )
        cols["n_total"] = pa.array(
            np.bincount(uidx, weights=n_p, minlength=len(uniq)).astype(np.int64),
            pa.int64(),
        )
        return pa.table(cols)

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        finalize,
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(sf_dir: str, steps: tuple[str, ...] = FUNNEL_STEPS) -> rd.Dataset:
    """(user_id, steps_completed, t1_us, t2_us, t3_us) — classic ordered
    conversion funnel: t1 = user's earliest step-1 event; t_{i+1} = earliest
    step-(i+1) event STRICTLY AFTER t_i. steps_completed counts defined
    stages; missing stages report -1. Every user with >= 1 event appears.

    Scale shape: one coarse user-bucket shuffle (same discipline as
    sessionize); inside a bucket the chain is fully vectorized — one
    np.minimum.at pass per funnel stage over the bucket's events, no
    per-user Python."""
    assert len(steps) == 3  # output schema is fixed at 3 stages
    _F = pa.schema(
        [
            ("user_id", pa.int64()),
            ("steps_completed", pa.int64()),
            ("t1_us", pa.int64()),
            ("t2_us", pa.int64()),
            ("t3_us", pa.int64()),
        ]
    )
    NONE = np.int64(np.iinfo(np.int64).max)

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _F.empty_table()
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        typ = group.column("event_type").to_numpy(zero_copy_only=False)
        uu, inv = np.unique(user, return_inverse=True)
        n = len(uu)
        ts_stage = []
        prev = np.full(n, np.int64(-1))  # stage-0 sentinel: strictly-after -inf
        for s in steps:
            cur = np.full(n, NONE)
            m = (typ == s) & (us > prev[inv])
            np.minimum.at(cur, inv[m], us[m])
            ts_stage.append(cur)
            prev = cur
        done = np.sum([t != NONE for t in ts_stage], axis=0).astype(np.int64)
        out = {
            "user_id": pa.array(uu.astype(np.int64), pa.int64()),
            "steps_completed": pa.array(done, pa.int64()),
        }
        for i, t in enumerate(ts_stage, start=1):
            out[f"t{i}_us"] = pa.array(np.where(t == NONE, np.int64(-1), t), pa.int64())
        return pa.table(out)

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["user_id", "ts", "event_type"]),
        "user_id",
        per_bucket,
    )


def journeys(sf_dir: str, k: int = 20, gap_s: int = SESSION_GAP_S) -> rd.Dataset:
    """(journey, n_sessions) — the `k` most common per-session event-type
    paths (the '>'-joined sequence of a session's events in (ts, event_id)
    order; sessions are the sessionize() gap definition). Path analysis:
    which journeys dominate the event stream.

    Total order inside a session is (ts, event_id) — event_id breaks ts
    ties, so the string is deterministic (and the SQL oracle's
    string_agg(... ORDER BY ts, event_id) reproduces it exactly).

    Scale shape: one coarse user-bucket shuffle builds per-session strings
    (a user's events co-locate, so bucket-local sessions are global
    sessions); each bucket emits only its DISTINCT (journey, count)
    partials; a journey groupby sums them; per-block local top-k caps the
    final sort at k x n_blocks rows. The per-session ''.join is string
    assembly, not scoring (same class as the md5-per-row fingerprints)."""
    from ray.data.aggregate import Sum

    gap_us = np.int64(gap_s) * np.int64(1_000_000)
    _P = pa.schema([("journey", pa.string()), ("c_p", pa.int64())])

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _P.empty_table()
        user = group.column("user_id").to_numpy(zero_copy_only=False)
        us = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        typ = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, us, user))
        user, us, typ = user[order], us[order], typ[order]
        brk = np.empty(len(us), dtype=bool)
        brk[0] = True
        brk[1:] = (user[1:] != user[:-1]) | (us[1:] - us[:-1] > gap_us)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(us))
        js = np.fromiter(
            (">".join(typ[s:e]) for s, e in zip(starts, ends)),
            dtype=object,
            count=len(starts),
        )
        u, c = np.unique(js, return_counts=True)
        return pa.table(
            {
                "journey": pa.array(u, pa.string()),
                "c_p": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("journey", pa.string()), ("n_sessions", pa.int64())]
            ).empty_table()
        c = t.column("n_sessions").to_numpy(zero_copy_only=False)
        g = np.asarray(t.column("journey").to_pylist(), dtype=object)
        order = np.lexsort((g, -c))[:k]
        return pa.table(
            {
                "journey": pa.array(g[order], pa.string()),
                "n_sessions": pa.array(c[order], pa.int64()),
            }
        )

    return (
        coarse_bucket_apply(
            read_events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"]),
            "user_id",
            per_bucket,
        )
        .groupby("journey")
        .aggregate(Sum("c_p", alias_name="n_sessions"))
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key=["n_sessions", "journey"], descending=[True, False])
        .limit(k)
    )


def props_stats(sf_dir: str) -> rd.Dataset:
    """(event_type, n, sum_k, avg_k) — semi-structured extraction: pull the
    integer `k` field out of the JSON `props` column and aggregate it per
    event type. The extraction is a VECTORIZED Arrow regex kernel
    (pc.extract_regex), not a per-row json.loads — the schema contract
    (props = single-level object with integer k) is asserted by the
    match count; the SQL oracle parses with real JSON functions, so the
    regex shortcut is verified against a strict parser. avg_k =
    round6(sum_k / n) from exact integer sums."""
    from ..functions.scoring import round6

    _P = pa.schema(
        [("event_type", pa.string()), ("n_p", pa.int64()), ("sum_p", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        ks = pc.cast(pc.struct_field(m, "k"), pa.int64())
        assert ks.null_count == 0, "props row without an integer k field"
        k = ks.to_numpy(zero_copy_only=False)
        dic = pc.dictionary_encode(t.column("event_type").combine_chunks())
        inv = dic.indices.to_numpy(zero_copy_only=False)
        labels = dic.dictionary.to_pylist()
        return pa.table(
            {
                "event_type": pa.array(labels, pa.string()),
                "n_p": pa.array(np.bincount(inv, minlength=len(labels)).astype(np.int64)),
                "sum_p": pa.array(
                    np.bincount(inv, weights=k, minlength=len(labels)).astype(np.int64)
                ),
            }
        )

    _O = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("sum_k", pa.int64()),
            ("avg_k", pa.float64()),
        ]
    )

    def merge(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        n = int(group.column("n_p").to_numpy(zero_copy_only=False).sum())
        s = int(group.column("sum_p").to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n": pa.array([n], pa.int64()),
                "sum_k": pa.array([s], pa.int64()),
                "avg_k": pa.array([float(round6(np.float64(s / n)))], pa.float64()),
            }
        )

    return (
        read_events(sf_dir, columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # |types| rows per block: tiny by construction
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


_WEEK_US = np.int64(7 * 86400) * np.int64(1_000_000)


def retention_cohorts(sf_dir: str) -> rd.Dataset:
    """(cohort_week, week_offset, n_users) — weekly retention cohorts: a
    user's cohort is the epoch-aligned week of their FIRST event
    (week = epoch_us // 7d, the windowed_counts window convention); the
    cohort's row at offset k counts the DISTINCT users active again in
    cohort_week + k (offset 0 == cohort size). The classic growth-analytics
    triangle, recomputable in SQL.

    Scale shape (two exchanges, combiner-first): per-batch DISTINCT
    (user, week) pairs -> coarse USER-bucket groupby co-locates each
    user's weeks, dedupes them globally, takes min as the cohort and emits
    ONE row per (user, offset) -> a native groupby-sum over
    (cohort_week, week_offset) counts users (no second distinct needed —
    step 2 already emits each user once per offset).

    Timestamp contract: ts >= 0 (epoch-microsecond event logs). numpy's
    `//` floors toward -inf while the SQL oracle's integer `/` truncates
    toward zero, so a NEGATIVE (pre-1970) timestamp would bucket into a
    different week than the oracle — same documented convention as
    windowed_counts (round-4 ADVICE)."""
    from ray.data.aggregate import Sum as _Sum

    _P = pa.schema([("user_id", pa.int64()), ("wk", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        user = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        wk = us // _WEEK_US
        # batch-local distinct (user, week)
        order = np.lexsort((wk, user))
        u_s, w_s = user[order], wk[order]
        first = np.r_[True, (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])]
        return pa.table(
            {
                "user_id": pa.array(u_s[first], pa.int64()),
                "wk": pa.array(w_s[first], pa.int64()),
            }
        )

    _C = pa.schema(
        [("cohort_week", pa.int64()), ("week_offset", pa.int64()), ("n_p", pa.int64())]
    )

    def per_user(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _C.empty_table()
        user = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        wk = group.column("wk").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((wk, user))
        user, wk = user[order], wk[order]
        uniq = np.r_[True, (user[1:] != user[:-1]) | (wk[1:] != wk[:-1])]
        user, wk = user[uniq], wk[uniq]  # global distinct (user, week)
        new = np.r_[True, user[1:] != user[:-1]]
        run_id = np.cumsum(new) - 1
        cohort = wk[new][run_id]  # first (= min) week of each user's run
        return pa.table(
            {
                "cohort_week": pa.array(cohort, pa.int64()),
                "week_offset": pa.array(wk - cohort, pa.int64()),
                "n_p": pa.array(np.ones(len(wk), np.int64), pa.int64()),
            }
        )

    return coarse_bucket_apply(
        read_events(sf_dir, columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        per_user,
        n_buckets=256,
    ).groupby(["cohort_week", "week_offset"]).aggregate(
        _Sum("n_p", alias_name="n_users")
    )


_DAY_US = np.int64(86400) * np.int64(1_000_000)


def anomaly_days(sf_dir: str, sigma: int = 2) -> rd.Dataset:
    """(event_type, day_id, n_events) — the event-rate anomaly monitor a
    production ingest pipeline runs over its logs: days whose event count
    deviates from the type's own mean by >= `sigma` POPULATION std-devs
    (over the days the type has >= 1 event). day_id = epoch_us // 1 day
    (the windowed_counts window convention; ts >= 0 contract as
    documented there).

    Exactness contract (no float mean/std anywhere): with n = #days of the
    type, s = sum of day counts, s2 = sum of squared day counts, a day of
    count c is flagged iff

        (n*c - s)^2 >= sigma^2 * (n*s2 - s^2)

    — the z-test with both sides multiplied by n^2, all in integers, so
    the SQL oracle (HUGEINT arithmetic) matches bit-exactly.

    Scale shape: per-batch Arrow group_by combiner (one row per
    (type, day) per batch) -> ONE coarse day-bucket exchange makes the
    counts global -> the flag pass is a native groupby over the
    (type x day) COUNTS table, which is analysis-metadata-sized (days in
    corpus x event types), never event-sized. int64 throughout with a loud
    overflow assert ((n*c)^2 must fit; trips at ~3e9 events/day/type)."""
    _P = pa.schema(
        [("event_type", pa.string()), ("day_id", pa.int64()), ("n_p", pa.int64())]
    )
    _O = pa.schema(
        [("event_type", pa.string()), ("day_id", pa.int64()), ("n_events", pa.int64())]
    )
    sig2 = int(sigma) * int(sigma)

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        sub = pa.table(
            {
                "event_type": t.column("event_type").combine_chunks(),
                "day_id": pa.array(us // _DAY_US, pa.int64()),
            }
        )
        agg = (
            sub.group_by(["event_type", "day_id"])
            .aggregate([([], "count_all")])
            .select(["event_type", "day_id", "count_all"])
        )
        return agg.rename_columns(["event_type", "day_id", "n_p"])

    def day_sums(group: pa.Table) -> pa.Table:
        # all partials for this bucket's days are here -> global sums
        cap_worker_threads()
        if group.num_rows == 0:
            return _P.empty_table()
        agg = (
            group.select(["event_type", "day_id", "n_p"])
            .group_by(["event_type", "day_id"])
            .aggregate([("n_p", "sum")])
            .select(["event_type", "day_id", "n_p_sum"])
        )
        return agg.rename_columns(["event_type", "day_id", "n_p"])

    def flag(group: pa.Table) -> pa.Table:
        # one event type (possibly several, under map_groups batching) of
        # the COUNTS table: vectorized run scan per type
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        typ = group.column("event_type").combine_chunks()
        codes = typ.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        day = group.column("day_id").to_numpy(zero_copy_only=False)
        c = group.column("n_p").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((day, codes))
        codes_s, day_s, c_s = codes[order], day[order], c[order]
        new = np.r_[True, codes_s[1:] != codes_s[:-1]]
        run_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(c_s)]).astype(np.int64)[run_id]
        s = np.add.reduceat(c_s, starts)[run_id]
        s2 = np.add.reduceat(c_s * c_s, starts)[run_id]
        # loud int64 guard (ADVICE style): (n*c)^2 and sig2*n*s2 must fit
        peak = max(int(np.max(n * c_s)), int(np.max(s)))
        assert peak < (1 << 31) and sig2 * int(np.max(n * s2)) < (1 << 62), (
            "anomaly_days int64 overflow: day counts too large; shard days"
        )
        lhs = (n * c_s - s) ** 2
        rhs = sig2 * (n * s2 - s * s)
        keep = lhs >= rhs
        return pa.table(
            {
                "event_type": typ.take(pa.array(order)).filter(pa.array(keep)),
                "day_id": pa.array(day_s[keep], pa.int64()),
                "n_events": pa.array(c_s[keep], pa.int64()),
            }
        )

    counts = coarse_bucket_apply(
        read_events(sf_dir, columns=["ts", "event_type"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        "day_id",
        day_sums,
    )
    # counts is (types x days)-sized metadata; the string-keyed native
    # groupby here shuffles only that
    return counts.groupby("event_type").map_groups(flag, batch_format="pyarrow")
