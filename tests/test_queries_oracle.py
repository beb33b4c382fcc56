"""Driver-style correctness gate, run locally: every queries() entry vs
its oracle_sql() under DuckDB at sf0.001 — row count, sorted-column
schema, and order-insensitive value hash."""

import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{os.path.join(SF, t)}.parquet')")
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize integer dtypes (int32 vs int64) before compare
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def test_all_queries_match_oracle(entrymod, con):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert set(sqls).issubset(set(qs))
    failures = []
    for name, fn in qs.items():
        if name not in sqls:
            continue
        got = _canon(_to_pandas(fn(SF)))
        exp = _canon(con.execute(sqls[name]).fetchdf())
        if list(got.columns) != list(exp.columns):
            failures.append((name, "columns", list(got.columns), list(exp.columns)))
            continue
        if len(got) != len(exp):
            failures.append((name, "rowcount", len(got), len(exp)))
            continue
        if not got.equals(exp):
            neq = (got != exp).any(axis=1)
            failures.append((name, "values", got[neq].head(3), exp[neq].head(3)))
    assert not failures, failures


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "tile_id" in df.columns
    assert len(df) > 50
