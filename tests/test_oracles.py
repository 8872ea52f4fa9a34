"""Driver-contract conformance: every __spark_entry__ query runs, and
each oracled query matches DuckDB at sf0.001 (the driver runs the same
comparison at sf0.01)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


ORACLED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    got = normalize(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want), f"{name}: value mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    # deterministic: second run produces identical rows
    a = sorted(map(tuple, df.toPandas().itertuples(index=False)))
    b = sorted(map(tuple, entrymod.queries()[name](spark, SF_DIR).toPandas().itertuples(index=False)))
    assert a == b


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "n_tables", "n_spans", "accuracy", "whitespace"} <= set(df.columns)
    assert all(r["n_tables"] >= 1 for r in rows)
