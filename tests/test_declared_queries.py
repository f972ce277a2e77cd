"""Every declared query must hash-match its DuckDB oracle at sf0.001.

This is the fast local version of the driver's t2 gate (which runs at
sf0.01); tools/check_oracle.py runs the same comparison at any SF.
"""

from __future__ import annotations

import pytest

from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries
from advanced_data_mining_and_big_data_analysis_spark.testing import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    qd = QUERIES[name]
    sdf = qd.fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        assert len(sdf) >= 0  # rows-only contract: must run and be stable
        return
    odf = duck.execute(qd.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
