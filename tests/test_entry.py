"""Driver-contract smoke tests over the real testdata parquet at sf0.001:
entry() runs and returns rows with a stable schema; every queries() entry
executes; oracle_sql() keys are a subset of queries() keys.
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns[0] == "url"
    assert len(rows) > 0


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # SQL-expressible coverage: at least 2/3 of queries have oracles
    assert len(o) >= (2 * len(q)) // 3


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_each_query_executes(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    n = df.count()  # forces full execution
    assert len(df.columns) > 0
    # every query produces rows at sf0.001 (a 0-row result would be a
    # vacuous pass downstream in the oracle gate)
    assert n > 0, f"{name} returned no rows at {SF}"
