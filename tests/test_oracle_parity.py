"""Spark-vs-DuckDB oracle parity, mimicking the driver's comparison:
row count + schema-name + order-insensitive value equality at sf0.001.
"""

import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, Decimal):
                vals.append(("f", round(float(v), 6)))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", round(v, 6)))
            elif v is None:
                vals.append(("n",))
            else:
                vals.append((type(v).__name__[0], v))
        out.append(tuple(vals))
    out.sort()
    return out


QUERIES = sorted(set(entry_mod.oracle_sql()) - {"crawl_fixture"})


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF)
    cols = sorted(sdf.columns)
    spark_rows = [
        {c: r[c] for c in cols} for r in sdf.collect()
    ]
    sql = entry_mod.oracle_sql()[name]
    res = ddb.execute(sql).fetchall()
    dcols = [d[0] for d in ddb.execute(sql).description]
    assert sorted(dcols) == cols, (name, dcols, cols)
    idx = [dcols.index(c) for c in cols]
    duck_rows = [{c: row[i] for c, i in zip(cols, idx)} for row in res]
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows)
    )
    a = normalize(spark_rows, cols)
    b = normalize(duck_rows, cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
