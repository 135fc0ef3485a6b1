"""Driver-contract parity: every queries() entry with an oracle_sql() entry
must match DuckDB on the same testdata tables (row count, schema-ish, and
exact values after the shared rounding contract) — this mirrors the
driver's CORRECTNESS check."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF_DIR = "/root/testdata/sf0.001"


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, ray_session):
    got = normalize(to_pandas(entrymod.queries()[name](SF_DIR)))
    want = normalize(run_oracle(entrymod.oracle_sql()[name], SF_DIR))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=0)


def test_rows_only_entries_run(ray_session):
    q = entrymod.queries()
    for name in sorted(set(q) - set(ORACLE_KEYS)):
        res = to_pandas(q[name](SF_DIR))
        assert isinstance(res, pd.DataFrame), name
        # schema is stable and non-degenerate
        assert len(res.columns) >= 2, name


def test_entry_smoke(ray_session):
    df = to_pandas(entrymod.entry())
    assert len(df) >= 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
