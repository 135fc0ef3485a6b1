"""Join operators (pipelines/joins.py): broadcast_lookup semantics and the
flagship join pipelines' structural invariants. Full value parity vs DuckDB
is covered by the auto-parametrized tests/test_contract.py rows
(join_revenue_by_nation / join_priority_revenue / join_customers_no_orders).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from searchengine_ray.pipelines import joins

SF_DIR = "/root/testdata/sf0.001"


def _left_ds():
    return rd.from_arrow(
        pa.table({"k": pa.array([5, 1, 7, 5, 99], pa.int64()),
                  "v": pa.array([10, 20, 30, 40, 50], pa.int64())})
    )


def _small():
    return pa.table(
        {"rk": pa.array([1, 5, 7], pa.int64()),
         "name": pa.array(["one", "five", "seven"], pa.string()),
         "w": pa.array([100, 500, 700], pa.int64())}
    )


def test_broadcast_lookup_inner(ray_session):
    out = joins.broadcast_lookup(
        _left_ds(), _small(), "k", "rk", ["name", "w"]
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    # the unmatched key 99 is dropped
    assert out["k"].tolist() == [1, 5, 5, 7]
    assert out["name"].tolist() == ["one", "five", "five", "seven"]
    assert out["w"].tolist() == [100, 500, 500, 700]


def test_broadcast_lookup_left_fills_zero(ray_session):
    out = joins.broadcast_lookup(
        _left_ds(), _small(), "k", "rk", ["name", "w"], how="left"
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert len(out) == 5  # all left rows kept
    miss = out[out["k"] == 99]
    assert miss["name"].tolist() == [""] and miss["w"].tolist() == [0]


def test_broadcast_lookup_rejects_duplicate_keys(ray_session):
    dup = pa.table({"rk": pa.array([1, 1], pa.int64()),
                    "name": pa.array(["a", "b"], pa.string())})
    with pytest.raises(ValueError, match="duplicate"):
        joins.broadcast_lookup(_left_ds(), dup, "k", "rk", ["name"])


def test_revenue_by_nation_invariants(ray_session):
    out = joins.revenue_by_nation(SF_DIR).to_pandas()
    # every order lands in exactly one nation: totals must equal the
    # orders table's own totals (integer-cent contract)
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    cents = np.floor(
        orders.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
    ).astype(np.int64)
    assert out["n_orders"].sum() == orders.num_rows
    assert out["revenue_cents"].sum() == cents.sum()
    assert out["n_name"].is_unique


def test_anti_join_disjoint_from_semi(ray_session):
    """left_anti customers + customers-with-urgent-orders partition the
    customer table."""
    import pyarrow.parquet as pq

    anti = joins.customers_without_orders(SF_DIR).to_pandas()
    n_customers = pq.ParquetFile(f"{SF_DIR}/customer.parquet").metadata.num_rows
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_with = con.execute(
        "SELECT COUNT(DISTINCT c_custkey) FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey "
        "AND o.o_orderpriority='1-URGENT')"
    ).fetchone()[0]
    assert len(anti) + n_with == n_customers
    assert anti["c_custkey"].is_unique
