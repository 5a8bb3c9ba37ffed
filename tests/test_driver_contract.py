"""Replicates the driver's correctness gate: every queries() entry
runs at sf0.01 and must match its oracle_sql() DuckDB result on
row count, column names, and (order-insensitive) values."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith(("int", "Int", "uint", "UInt")) or dt == "object" and all(
            isinstance(x, int) for x in df[c].dropna().head(5)
        ):
            try:
                df[c] = df[c].astype("Int64")
            except (TypeError, OverflowError, ValueError):
                pass
        if dt.startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, con, name):
    actual = _norm(QUERIES[name](spark, SF_DIR).toPandas())
    expected = _norm(con.execute(ORACLES[name]).df())
    assert list(actual.columns) == list(expected.columns), (
        list(actual.columns), list(expected.columns))
    assert len(actual) == len(expected), (len(actual), len(expected))
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if str(e.dtype).startswith("float") or str(a.dtype).startswith("float"):
            aa = a.astype(float).to_numpy()
            ee = e.astype(float).to_numpy()
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(aa, ee))
                if not (
                    (math.isnan(x) and math.isnan(y)) or x == y
                )
            ]
            assert not bad, (name, c, bad[:5])
        else:
            pd.testing.assert_series_equal(
                a, e, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
