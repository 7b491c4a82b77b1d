"""Pins the driver contract: every queries() entry runs; every
oracle-paired entry matches DuckDB exactly (row count + column names +
sorted normalized values) at sf0.001.  (The driver itself re-checks at
sf0.01; full-scale parity is exercised via ``python -m tools.parity``.)
"""

from __future__ import annotations

import duckdb
import pytest

from tools.parity import TABLES, rows_of

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__

    return __spark_entry__.queries(), __spark_entry__.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    return con


def test_every_query_has_callable(contract):
    qs, oracles = contract
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # SQL-expressible coverage: at least 80% oracle-paired (rows-only
    # entries are kernel/sketch/LSH scale paths gated by pytest or the
    # golden-fixture suite instead)
    assert len(oracles) / len(qs) > 0.8


def test_oracle_parity(spark, contract, duck):
    # Typed comparison through the same pandas/Arrow path the driver uses
    # (Spark toPandas vs DuckDB .df()) — int-kind vs float-kind vs Decimal
    # are distinct, so an uncast HUGEINT sum in an oracle fails here too.
    qs, oracles = contract
    failures = []
    for name, sql in sorted(oracles.items()):
        spd = qs[name](spark, SF_DIR).toPandas()
        dpd = duck.execute(sql).df()
        if sorted(spd.columns) != sorted(dpd.columns):
            failures.append(
                f"{name}: cols {sorted(spd.columns)} != {sorted(dpd.columns)}"
            )
        elif len(spd) != len(dpd):
            failures.append(f"{name}: rows {len(spd)} != {len(dpd)}")
        elif rows_of(spd) != rows_of(dpd):
            failures.append(f"{name}: typed values differ")
    assert not failures, failures


def test_entry_smoke(spark):
    import __spark_entry__

    df = __spark_entry__.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "kind", "text", "media_ref", "order"]
