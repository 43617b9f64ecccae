"""Driver-contract smoke: entry() runs, registry is well-formed, and a
spot-check of oracle agreement (the exhaustive sweep lives in
tools/check_oracle.py and the driver's own gate)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 55
    assert set(oracles) <= set(qs)
    # at most a handful of rows-only entries (approximate ops)
    assert len(set(qs) - set(oracles)) <= 3


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
@pytest.mark.parametrize(
    "name", ["tpch_q1_pricing", "crawl_wave_schedule", "dedup_minhash_lsh"]
)
def test_oracle_spot_check(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sdf = entry_mod.queries()[name](spark, SF)
    srows = sorted(map(tuple, ((str(c) for c in row) for row in sdf.collect())))
    ores = con.sql(entry_mod.oracle_sql()[name])
    # align column order by name, as the driver does
    scols = sdf.columns
    order = [scols.index(c) for c in sorted(scols)]
    srows = sorted(
        tuple(str(row[i]) for i in order) for row in sdf.collect()
    )
    ocols = list(ores.columns)
    oorder = [ocols.index(c) for c in sorted(ocols)]
    orows = sorted(
        tuple(str(row[i]) for i in oorder) for row in ores.fetchall()
    )
    assert len(srows) == len(orows)
