"""Mirror of the driver's correctness gate: every queries() entry is run on
Spark AND through its DuckDB oracle at sf0.01, then compared row-by-row
(order-insensitive, column names sorted) — so CORRECTNESS_r{N}.json holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _entries():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    return [(name, fn, os_.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,oracle", _entries(), ids=[n for n, *_ in _entries()])
def test_query_matches_oracle(spark, name, fn, oracle):
    got = fn(spark, SF_DIR).toPandas()
    assert len(got) > 0, f"{name}: empty result"
    if oracle is None:
        return  # rows-only check, like the driver's weak path
    con = _duck()
    want = con.sql(oracle).df()
    got_n, want_n = _normalize(got), _normalize(want)
    assert list(got_n.columns) == list(want_n.columns), (
        f"{name}: columns {list(got_n.columns)} != {list(want_n.columns)}"
    )
    assert len(got_n) == len(want_n), f"{name}: {len(got_n)} rows != {len(want_n)}"
    for c in got_n.columns:
        g, w = got_n[c], want_n[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            # driver hashes values: require bit-exact floats (NaN-safe)
            np.testing.assert_array_equal(
                g.astype(float).values, w.astype(float).values, err_msg=f"{name}.{c}"
            )
        else:
            assert (g.values == w.values).all() or (
                pd.isna(g.values) == pd.isna(w.values)
            ).all(), f"{name}.{c} mismatch"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
