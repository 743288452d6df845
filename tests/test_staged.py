"""Run the driver's exact Spark-vs-DuckDB compare over every staged.py
entry. Since the round-5 flip these are LIVE (catalog.load_all promotes
them); the per-entry compare stays as the local correctness gate."""

from __future__ import annotations

import os

import duckdb
import pytest

from virapipe_spark import catalog
from virapipe_spark.oracle_compare import compare_frames
from virapipe_spark.queries.staged import STAGED

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in catalog.TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield c
    c.close()


def test_staged_entries_promoted_into_live_catalog():
    catalog.load_all()
    assert STAGED and set(STAGED) <= set(catalog.QUERIES)
    # every promoted entry carries its oracle (full hash check, not
    # rows-only) under the same name
    assert set(STAGED) <= set(catalog.ORACLES)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_entry_matches_oracle(spark, con, name):
    fn, oracle = STAGED[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = con.execute(oracle).df()
    assert len(sdf) > 0, f"{name}: empty result passes trivially"
    problems = compare_frames(sdf, ddf)
    assert not problems, f"{name}: {problems}"
