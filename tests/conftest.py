from __future__ import annotations

import math

import duckdb
import pytest

from eel_spark.session import get_session

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_session("eel-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def assert_df_matches_oracle(df, con, sql, sort=True):
    """Mimic the driver's compare: row count, column-name-sorted values,
    order-insensitive."""
    cols = sorted(df.columns)
    spark_rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]

    res = con.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in sorted(names)]
    duck_rows = [tuple(_norm(row[i]) for i in idx) for row in res.fetchall()]

    assert sorted(names) == cols, f"columns differ: {sorted(names)} vs {cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    key = lambda t: tuple(str(x) for x in t)
    s_sorted, d_sorted = sorted(spark_rows, key=key), sorted(duck_rows, key=key)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=0, abs_tol=0) or x == y, (
                    f"row {i}: {a} != {b}"
                )
            else:
                assert str(x) == str(y), f"row {i}: {a} != {b} (field {x!r} vs {y!r})"
