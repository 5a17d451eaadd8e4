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
    # same strictness as the driver's value hash: serialized representation
    # must match exactly (catches dtype drift like DuckDB HUGEINT sums)
    gcsv, wcsv = got_n.to_csv(index=False), want_n.to_csv(index=False)
    if gcsv != wcsv:
        for c in got_n.columns:
            g, w = got_n[c], want_n[c]
            if g.dtype.kind == "f" or w.dtype.kind == "f":
                np.testing.assert_array_equal(
                    g.astype(float).values, w.astype(float).values, err_msg=f"{name}.{c}"
                )
            else:
                assert (g.astype(str).values == w.astype(str).values).all(), (
                    f"{name}.{c} mismatch"
                )
        raise AssertionError(f"{name}: CSV hash mismatch (dtype/format drift)")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
