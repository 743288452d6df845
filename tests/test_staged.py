"""Run the driver's exact Spark-vs-DuckDB compare over every STAGED
round-5 entry (virapipe_spark/queries/staged.py) — the entries are
correctness-verified NOW, so promoting them into the live catalog next
round is a pre-validated one-line flip."""

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


def test_staged_registry_disjoint_from_live_catalog():
    catalog.load_all()
    assert STAGED and not (set(STAGED) & set(catalog.QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_entry_matches_oracle(spark, con, name):
    fn, oracle = STAGED[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = con.execute(oracle).df()
    assert len(sdf) > 0, f"{name}: empty result passes trivially"
    problems = compare_frames(sdf, ddf)
    assert not problems, f"{name}: {problems}"
