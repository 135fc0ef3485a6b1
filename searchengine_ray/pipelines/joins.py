"""General relational joins over the TPC-H-ish testdata tables.

The reference engine's only joins are key lookups (CRC -> lexicon slot,
doc -> title; SURVEY.md §2.4, /root/reference/Engine/Engine/Engine.cs:201-207)
— a complete data engine also needs arbitrary table joins. Expressed
Ray-Data-first, with one implementation per size regime:

- big JOIN big     -> native `Dataset.join` (hash-shuffle; Ray 2.49). Both
                      sides repartition by key hash; num_partitions scales
                      with data, not cluster size.
- big JOIN small   -> `broadcast_lookup`: the small side is put in the
                      object store ONCE (`ray.put`) as sorted key + value
                      arrays; every map_batches task reads it zero-copy and
                      resolves rows via vectorized `np.searchsorted`. No
                      shuffle, no per-batch re-ship.
- anti / semi      -> native `left_anti` / `left_semi` join types.

Always aggregate partial BEFORE a join/shuffle when the downstream only
needs aggregates (combiner discipline, same as events.py): the flagship
`revenue_by_nation` moves one row per (batch, custkey) — not one per order
— through the join exchange.

Money columns sum as INTEGER cents / 1e-4 units so results are
bit-deterministic under any add order (floats are not associative; the SQL
oracles use the same integer contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.runtime import cap_worker_threads
from ..functions.scoring import round6

# Join exchange width. At testdata scale any small value works; at real
# scale size this like build partitions (bytes / 512 MB target), not from
# cluster CPU count — see build.auto_num_partitions.
JOIN_PARTITIONS = 16


def _cents(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Exact integer cents from a 2-decimal dollar column."""
    v = col.to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def broadcast_lookup(
    ds: rd.Dataset,
    small: pa.Table,
    left_on: str,
    right_on: str,
    take: list[str],
    how: str = "inner",
) -> rd.Dataset:
    """big JOIN small without a shuffle: `small` (unique-keyed) is broadcast
    via ray.put once; each batch resolves matches with np.searchsorted.

    how="inner" drops unmatched left rows; how="left" keeps them (taken
    int64/int32 columns get 0, string columns ""). Raises on duplicate
    right keys — this is a LOOKUP join; use Dataset.join for m:n."""
    keys = small.column(right_on).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
        raise ValueError(f"broadcast_lookup: duplicate keys in right side '{right_on}'")
    vals = {c: small.column(c).take(pa.array(order)).combine_chunks() for c in take}
    ref = ray.put((keys, vals))

    def lookup(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        k_sorted, v = ray.get(ref)
        lk = t.column(left_on).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(k_sorted, lk)
        pos_c = np.minimum(pos, len(k_sorted) - 1)
        hit = (len(k_sorted) > 0) & (k_sorted[pos_c] == lk)
        if how == "inner":
            idx = np.flatnonzero(hit)
            out = t.take(pa.array(idx))
            cols = {c: out.column(c) for c in out.column_names}
            for c, arr in v.items():
                cols[c] = arr.take(pa.array(pos_c[idx]))
            return pa.table(cols)
        # left: unmatched rows take the type's zero value
        cols = {c: t.column(c) for c in t.column_names}
        for c, arr in v.items():
            taken = arr.take(pa.array(pos_c))
            if pa.types.is_string(arr.type):
                fill = pa.scalar("", arr.type)
            else:
                fill = pa.scalar(0, arr.type)
            cols[c] = pc.if_else(pa.array(hit), taken, fill)
        return pa.table(cols)

    return ds.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """(n_name, n_orders, revenue_cents) — order revenue rolled up to the
    customer's nation. orders JOIN customer is the shuffle join (both sides
    scale with data); nation (25 fixed rows) is a broadcast lookup;
    per-batch combiners bound both exchanges."""
    _P = pa.schema(
        [("o_custkey", pa.int64()), ("n_orders", pa.int64()), ("cents", pa.int64())]
    )

    def per_cust(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("o_totalprice"))
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(u, pa.int64()),
                "n_orders": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "cents": pa.array(np.bincount(inv, weights=cents).astype(np.int64), pa.int64()),
            }
        )

    orders = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(per_cust, batch_format="pyarrow", zero_copy_batch=True)
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = orders.join(
        customer,
        "inner",
        num_partitions=JOIN_PARTITIONS,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    _N = pa.schema(
        [
            ("c_nationkey", pa.int64()),
            ("n_orders", pa.int64()),
            ("revenue_cents", pa.int64()),
        ]
    )

    def per_nation(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _N.empty_table()
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(nk, return_inverse=True)
        n_ord = t.column("n_orders").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_nationkey": pa.array(u, pa.int64()),
                "n_orders": pa.array(np.bincount(inv, weights=n_ord).astype(np.int64), pa.int64()),
                "revenue_cents": pa.array(np.bincount(inv, weights=cents).astype(np.int64), pa.int64()),
            }
        )

    def merge_nation(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _N.empty_table()
        return pa.table(
            {
                "c_nationkey": pa.array([group.column("c_nationkey")[0].as_py()], pa.int64()),
                "n_orders": pa.array(
                    [int(group.column("n_orders").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "revenue_cents": pa.array(
                    [int(group.column("revenue_cents").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation = nation.set_column(
        0, "n_nationkey", pc.cast(nation.column("n_nationkey"), pa.int64())
    )

    # the partials are one row per (block, nationkey) — tiny by construction;
    # coalesce to one block so the groupby sort emits no empty schema-less
    # blocks (same pattern as textops.length_quantiles)
    agg = (
        joined.map_batches(per_nation, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .groupby("c_nationkey")
        .map_groups(merge_nation, batch_format="pyarrow")
    )
    out = broadcast_lookup(agg, nation, "c_nationkey", "n_nationkey", ["n_name"])
    return out.map_batches(
        lambda t: t.select(["n_name", "n_orders", "revenue_cents"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def order_priority_revenue(sf_dir: str) -> rd.Dataset:
    """(o_orderpriority, n_items, revenue_e4) — the big JOIN big shape:
    lineitem JOIN orders on orderkey via the native hash-shuffle join,
    discounted revenue in integer 1e-4-dollar units
    (round(price*100) * (100 - round(discount*100))), per-batch combiner
    after the join, tiny final groupby."""
    _P = pa.schema(
        [("l_orderkey", pa.int64()), ("n_items", pa.int64()), ("rev_e4", pa.int64())]
    )

    def per_order(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        price_c = _cents(t.column("l_extendedprice"))
        disc_pct = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = price_c * (100 - disc_pct)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(u, pa.int64()),
                "n_items": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "rev_e4": pa.array(np.bincount(inv, weights=rev).astype(np.int64), pa.int64()),
            }
        )

    lineitem = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(per_order, batch_format="pyarrow", zero_copy_batch=True)
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = lineitem.join(
        orders,
        "inner",
        num_partitions=JOIN_PARTITIONS,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    # only DISTRIBUTIVE sums here: a distinct-order count would need the
    # orderkey partials deduped (an orderkey spans lineitem batches), i.e.
    # an extra shuffle — out of contract for this op
    _A = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("n_items", pa.int64()),
            ("revenue_e4", pa.int64()),
        ]
    )

    def per_prio(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _A.empty_table()
        g = (
            t.group_by(["o_orderpriority"])
            .aggregate([("n_items", "sum"), ("rev_e4", "sum")])
            .rename_columns(["o_orderpriority", "n_items", "revenue_e4"])
        )
        return g.cast(_A)

    def merge_prio(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _A.empty_table()
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [group.column("o_orderpriority")[0].as_py()], pa.string()
                ),
                "n_items": pa.array(
                    [int(group.column("n_items").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "revenue_e4": pa.array(
                    [int(group.column("revenue_e4").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    return (
        joined.map_batches(per_prio, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .groupby("o_orderpriority")
        .map_groups(merge_prio, batch_format="pyarrow")
    )


def customers_without_orders(sf_dir: str, priority: str = "1-URGENT") -> rd.Dataset:
    """(c_custkey, c_name, c_mktsegment) — customers with NO order of the
    given priority (NOT EXISTS): the native left_anti join. Filter is
    pushed to the read; the right side is pre-shrunk to per-batch distinct
    custkeys (combiner), so the anti-join exchange carries keys, not
    orders. Scoped to a priority class because in the testdata every
    customer has SOME order — an unconditionally-empty result would
    exercise nothing."""
    _K = pa.schema([("o_custkey", pa.int64())])

    def distinct_keys(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        t = t.filter(pc.equal(t.column("o_orderpriority"), priority))
        if t.num_rows == 0:
            return _K.empty_table()
        u = np.unique(t.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(u, pa.int64())})

    orders = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        .map_batches(distinct_keys, batch_format="pyarrow", zero_copy_batch=True)
    )
    customer = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    return customer.join(
        orders,
        "left_anti",
        num_partitions=JOIN_PARTITIONS,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )


BLOOM_BITS = 1 << 16  # m
BLOOM_K = 4  # probes per key (16 bits of the md5-u64 hash each)


def _bloom_indices(keys: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) int64 bit indices. Hash contract (mirrored by the SQL
    oracle): h = md5-derived u64 of str(key); probe j = (h >> 16j) % m."""
    import hashlib

    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(x)).encode()).digest()[:8], "big")
            for x in keys
        ),
        dtype=np.uint64,
        count=len(keys),
    )
    out = np.empty((len(keys), BLOOM_K), dtype=np.int64)
    for j in range(BLOOM_K):
        out[:, j] = ((h >> np.uint64(16 * j)) % np.uint64(BLOOM_BITS)).astype(np.int64)
    return out


def bloom_semi_join(sf_dir: str, priority: str = "1-URGENT") -> rd.Dataset:
    """(l_orderkey, n_items) — lineitem keys that PASS a Bloom filter built
    from the keys of `priority` orders (false positives included by design
    and by the oracle: the filter itself is the deterministic contract).

    The scale primitive this demonstrates: a semi-join where the right side
    is too big to broadcast as raw keys but fits as a BIT SET — m bits
    regardless of key count (10^9 keys at 10 bits/key is ~1.2 GB vs ~8 GB
    of raw int64s; m here is 2^16 for the testdata). Build is distributed
    (per-batch partial index sets -> distributed unique, bounded by m —
    metadata-sized by construction); the probe is a broadcast-bitset
    map_batches filter, no shuffle of the big side until the final
    per-key count groupby.
    """
    _B = pa.schema([("bit", pa.int32())])

    def batch_bits(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        t = t.filter(pc.equal(t.column("o_orderpriority"), priority))
        if t.num_rows == 0:
            return _B.empty_table()
        keys = np.unique(t.column("o_orderkey").to_numpy(zero_copy_only=False))
        idx = np.unique(_bloom_indices(keys).reshape(-1))
        return pa.table({"bit": pa.array(idx.astype(np.int32), pa.int32())})

    bits = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )
        .map_batches(batch_bits, batch_format="pyarrow", zero_copy_batch=True)
        .unique("bit")
    )
    bitset = np.zeros(BLOOM_BITS, dtype=bool)
    bitset[np.asarray(bits, dtype=np.int64)] = True
    ref = ray.put(bitset)

    _P = pa.schema([("l_orderkey", pa.int64()), ("n_p", pa.int64())])

    def probe(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        bs = ray.get(ref)
        lk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        u, inv = np.unique(lk, return_inverse=True)
        ok = bs[_bloom_indices(u)].all(axis=1)
        if not ok.any():
            return _P.empty_table()
        n_per_key = np.bincount(inv, minlength=len(u)).astype(np.int64)
        sel = np.flatnonzero(ok)
        return pa.table(
            {
                "l_orderkey": pa.array(u[sel], pa.int64()),
                "n_p": pa.array(n_per_key[sel], pa.int64()),
            }
        )

    _O = pa.schema([("l_orderkey", pa.int64()), ("n_items", pa.int64())])

    def merge(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        lk = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        n_p = group.column("n_p").to_numpy(zero_copy_only=False)
        u, inv = np.unique(lk, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(u, pa.int64()),
                "n_items": pa.array(
                    np.bincount(inv, weights=n_p).astype(np.int64), pa.int64()
                ),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket",
            pa.array((k.view(np.uint64) % np.uint64(64)).astype(np.int32), pa.int32()),
        )

    return (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Classic scan-aggregate / having-join-back report shapes (TPC-H Q1 / Q18
# analogs over the testdata tables). The reference engine has no relational
# layer at all; these are the wide-aggregate shapes a data engine serves.


_Q1_P = pa.schema(
    [
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("sum_qty", pa.int64()),
        ("sum_base_cents", pa.int64()),
        ("sum_disc_e4", pa.int64()),
        ("sum_charge_e6", pa.int64()),
        ("sum_disc100", pa.int64()),
        ("count_order", pa.int64()),
    ]
)

_Q1_SUM_COLS = (
    "sum_qty", "sum_base_cents", "sum_disc_e4", "sum_charge_e6",
    "sum_disc100", "count_order",
)


def _q1_partials(sf_dir: str, cutoff: str) -> rd.Dataset:
    """Per-batch Q1 combiner: <= |flag x status| (~4) exact-integer rows
    per block (shared by pricing_summary and pricing_rollup)."""
    from datetime import datetime

    cut = datetime.fromisoformat(cutoff)

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(cut)))
        if t.num_rows == 0:
            return _Q1_P.empty_table()
        key = pc.binary_join_element_wise(
            t.column("l_returnflag"), t.column("l_linestatus"), "|"
        )
        dic = pc.dictionary_encode(key)
        inv = dic.combine_chunks().indices.to_numpy(zero_copy_only=False)
        labels = dic.combine_chunks().dictionary.to_pylist()
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        base = _cents(t.column("l_extendedprice"))
        d100 = _cents(t.column("l_discount"))  # discount as integer percent
        t100 = _cents(t.column("l_tax"))
        disc_e4 = base * (100 - d100)
        charge_e6 = disc_e4 * (100 + t100)
        n = len(labels)
        flags, statuses = zip(*(s.split("|") for s in labels))
        return pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "l_linestatus": pa.array(statuses, pa.string()),
                "sum_qty": pa.array(np.bincount(inv, weights=qty, minlength=n).astype(np.int64)),
                "sum_base_cents": pa.array(np.bincount(inv, weights=base, minlength=n).astype(np.int64)),
                "sum_disc_e4": pa.array(np.bincount(inv, weights=disc_e4, minlength=n).astype(np.int64)),
                "sum_charge_e6": pa.array(np.bincount(inv, weights=charge_e6, minlength=n).astype(np.int64)),
                "sum_disc100": pa.array(np.bincount(inv, weights=d100, minlength=n).astype(np.int64)),
                "count_order": pa.array(np.bincount(inv, minlength=n).astype(np.int64)),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> rd.Dataset:
    """(l_returnflag, l_linestatus, sum_qty, sum_base_cents, sum_disc_e4,
    sum_charge_e6, avg_qty, avg_price, avg_disc, count_order) — the Q1
    pricing-summary shape: full lineitem scan, derived money expressions,
    multi-aggregate rollup to a handful of groups.

    Money is exact integer arithmetic end-to-end (cents; the discount /
    tax factors are integer percents, so disc_price lands in 1e-4-dollar
    units and charge in 1e-6) — bit-deterministic under any add order.
    Overflow headroom: |charge_e6| < 1e11 per row, so int64 partials hold
    to ~1e7 rows/batch and the final Python-int merge is unbounded.
    Per-batch combiners collapse each block to <= |flag x status| (~4)
    rows; the groupby exchange moves ~4 rows per block."""

    _O = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("sum_qty", pa.int64()),
            ("sum_base_cents", pa.int64()),
            ("sum_disc_e4", pa.int64()),
            ("sum_charge_e6", pa.int64()),
            ("avg_qty", pa.float64()),
            ("avg_price", pa.float64()),
            ("avg_disc", pa.float64()),
            ("count_order", pa.int64()),
        ]
    )

    def merge(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        s = {
            c: int(group.column(c).to_numpy(zero_copy_only=False).sum())
            for c in (
                "sum_qty", "sum_base_cents", "sum_disc_e4", "sum_charge_e6",
                "sum_disc100", "count_order",
            )
        }
        n = s["count_order"]
        return pa.table(
            {
                "l_returnflag": pa.array([group.column("l_returnflag")[0].as_py()]),
                "l_linestatus": pa.array([group.column("l_linestatus")[0].as_py()]),
                "sum_qty": pa.array([s["sum_qty"]], pa.int64()),
                "sum_base_cents": pa.array([s["sum_base_cents"]], pa.int64()),
                "sum_disc_e4": pa.array([s["sum_disc_e4"]], pa.int64()),
                "sum_charge_e6": pa.array([s["sum_charge_e6"]], pa.int64()),
                "avg_qty": pa.array([float(round6(np.float64(s["sum_qty"] / n)))]),
                "avg_price": pa.array([float(round6(np.float64(s["sum_base_cents"] / (100.0 * n))))]),
                "avg_disc": pa.array([float(round6(np.float64(s["sum_disc100"] / (100.0 * n))))]),
                "count_order": pa.array([n], pa.int64()),
            }
        )

    return (
        _q1_partials(sf_dir, cutoff)
        .repartition(1)  # partials are ~4 rows/block: keep the groupby tiny
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(merge, batch_format="pyarrow")
    )


def pricing_rollup(sf_dir: str, cutoff: str = "1998-09-02") -> rd.Dataset:
    """(l_returnflag, l_linestatus, sum_qty, sum_charge_e6, count_order) —
    the GROUPING SETS / ROLLUP shape over the Q1 aggregate: detail rows
    per (flag, status), subtotals per flag (linestatus = 'ALL'), and the
    grand total ('ALL', 'ALL'). All levels derive from the SAME exact
    integer partials in one final one-block pass — no extra scan, no
    second shuffle (a rollup is re-aggregation of the combiner output,
    which is group-cardinality-sized by construction)."""

    def rollup(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        import pandas as pd

        df = t.to_pandas()
        levels = []
        detail = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
                ["sum_qty", "sum_charge_e6", "count_order"]
            ].sum()
        )
        levels.append(detail)
        sub = detail.groupby("l_returnflag", as_index=False)[
            ["sum_qty", "sum_charge_e6", "count_order"]
        ].sum()
        sub.insert(1, "l_linestatus", "ALL")
        levels.append(sub)
        tot = detail[["sum_qty", "sum_charge_e6", "count_order"]].sum().to_frame().T
        tot.insert(0, "l_returnflag", "ALL")
        tot.insert(1, "l_linestatus", "ALL")
        levels.append(tot)
        out = pd.concat(levels, ignore_index=True)
        return pa.table(
            {
                "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
                "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
                "sum_qty": pa.array(out["sum_qty"].astype("int64")),
                "sum_charge_e6": pa.array(out["sum_charge_e6"].astype("int64")),
                "count_order": pa.array(out["count_order"].astype("int64")),
            }
        )

    return (
        _q1_partials(sf_dir, cutoff)
        .repartition(1)  # combiner output is ~4 rows/block
        # batch_size=None: the single coalesced block IS the batch, so the
        # rollup sees every partial at once
        .map_batches(
            rollup, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )


def large_volume_orders(sf_dir: str, threshold: int = 300) -> rd.Dataset:
    """(c_name, c_custkey, o_orderkey, total_qty, totalprice_cents) — the
    Q18 shape: GROUP BY ... HAVING on the big fact table, then join the
    (small) surviving keys back through orders to customer.

    lineitem -> per-batch partial qty sums per orderkey (lines of an order
    cluster in files, so partials shrink the exchange) -> native Sum
    aggregate (vectorized, no per-group Python) -> threshold filter. The
    survivors JOIN orders uses the native hash-shuffle join (no driver
    materialization at any point); customer resolves via broadcast_lookup."""
    from ray.data.aggregate import Sum

    _Q = pa.schema([("l_orderkey", pa.int64()), ("qty", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _Q.empty_table()
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(u, pa.int64()),
                "qty": pa.array(np.bincount(inv, weights=q).astype(np.int64), pa.int64()),
            }
        )

    heavy = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="total_qty"))
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("total_qty"), threshold)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # the native Aggregate emits SCHEMA-LESS empty blocks; feeding those
        # into Dataset.join fails with "No match for FieldRef" inside acero
        # (same root cause as the pre-groupby coalesce elsewhere). The
        # HAVING survivors are output-sized, so one block is right-sized;
        # at a scale where they aren't, coalesce to ceil(rows/block) instead
        .repartition(1)
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    joined = heavy.join(
        orders,
        "inner",
        num_partitions=JOIN_PARTITIONS,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    import pyarrow.parquet as pq

    customer = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = broadcast_lookup(joined, customer, "o_custkey", "c_custkey", ["c_name"])

    def finish(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        return pa.table(
            {
                "c_name": t.column("c_name"),
                "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "o_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
                "total_qty": pc.cast(t.column("total_qty"), pa.int64()),
                "totalprice_cents": pa.array(_cents(t.column("o_totalprice")), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def running_totals(sf_dir: str) -> rd.Dataset:
    """(o_custkey, o_orderkey, o_orderdate_us, running_cents) — per-customer
    running order-value total in (o_orderdate, o_orderkey) order: the
    cumulative-sum window frame (SUM() OVER (PARTITION BY ... ORDER BY ...
    ROWS UNBOUNDED PRECEDING)) as a distributed op.

    Scale shape: one coarse custkey-bucket shuffle (a customer's orders
    co-locate); inside a bucket one lexsort + segmented cumsum over integer
    cents — vectorized, order-deterministic, no per-customer Python."""
    _O = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate_us", pa.int64()),
            ("running_cents", pa.int64()),
        ]
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        ck = group.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(group.column("o_totalprice"))
        order = np.lexsort((ok, ts, ck))
        ck, ok, ts, cents = ck[order], ok[order], ts[order], cents[order]
        csum = np.cumsum(cents)
        # segmented cumsum: subtract the prefix total at each customer start
        new = np.r_[True, ck[1:] != ck[:-1]]
        base = np.where(new, csum - cents, 0)
        running = csum - np.maximum.accumulate(base)
        return pa.table(
            {
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_orderdate_us": pa.array(ts, pa.int64()),
                "running_cents": pa.array(running, pa.int64()),
            }
        )

    def coarse(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket",
            pa.array((ck.view(np.uint64) % np.uint64(64)).astype(np.int32), pa.int32()),
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def distinct_users_per_type(sf_dir: str) -> rd.Dataset:
    """(event_type, n_users, n_events) — exact COUNT(DISTINCT user_id) plus
    plain COUNT per event type.

    Scale shape: per-batch combiner to DISTINCT (event_type, user_id)
    rows carrying partial event counts -> one groupby co-locating each
    pair -> vectorized run scan counts distinct users and sums events per
    type -> tiny final groupby (|types| rows). The exchange moves one row
    per (type, user, batch), never one per event."""
    from ray.data.aggregate import Sum

    _P = pa.schema(
        [("event_type", pa.string()), ("user_id", pa.int64()), ("n_p", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        cap_worker_threads()
        if t.num_rows == 0:
            return _P.empty_table()
        agg = (
            t.select(["event_type", "user_id"])
            .group_by(["event_type", "user_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "user_id": agg.column("user_id"),
                "n_p": agg.column("count_all").cast(pa.int64()),
            }
        )

    _O = pa.schema(
        [("event_type", pa.string()), ("n_users", pa.int64()), ("n_events", pa.int64())]
    )

    def per_type(group: pa.Table) -> pa.Table:
        cap_worker_threads()
        if group.num_rows == 0:
            return _O.empty_table()
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        c = group.column("n_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n_users": pa.array([int(len(np.unique(u)))], pa.int64()),
                "n_events": pa.array([int(c.sum())], pa.int64()),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)  # |types| x |users| partial rows: tiny by construction
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
    )
