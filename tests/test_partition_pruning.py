"""Partition pruning: the mechanism that turns a 100 TB scan into a
per-day scan. Write events partitioned by date, read with a date filter,
and assert the scan's PartitionFilters prune to one partition."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from advanced_data_mining_and_big_data_analysis_spark.sources import load_table, write_parquet


@pytest.fixture(scope="module")
def partitioned_events(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="part_events_")
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    write_parquet(ev, f"{tmp}/events", partition_by=["event_date"])
    yield f"{tmp}/events"
    shutil.rmtree(tmp, ignore_errors=True)


def test_partition_pruning_single_day(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("event_date") == "2024-01-05")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters")[1][:200]
    # the filter is satisfied entirely by pruning: no event_date data filter remains
    n = df.count()
    full = spark.read.parquet(partitioned_events).count()
    assert 0 < n < full
    # physical reads touch only the matching partition directory
    files = df.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("event_date=2024-01-05" in r["f"] for r in files)


def test_partition_pruning_range(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(
        F.col("event_date").between("2024-01-10", "2024-01-12")
    )
    files = df.select(F.input_file_name().alias("f")).distinct().collect()
    days = {r["f"].split("event_date=")[1].split("/")[0] for r in files}
    assert days == {"2024-01-10", "2024-01-11", "2024-01-12"}
