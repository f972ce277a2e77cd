"""Sources (CSV round-trip, schema'd reads) and E1 enrichment operators
(GDP unpivot + broadcast join, pseudo-label union), plus time-series CV."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import functions as F
from pyspark.sql import types as T

from advanced_data_mining_and_big_data_analysis_spark.functions import enrich as E
from advanced_data_mining_and_big_data_analysis_spark.ml.cv import (
    expanding_window_splits,
    time_series_cross_validate,
)
from advanced_data_mining_and_big_data_analysis_spark.sources import (
    load_table,
    read_csv,
    write_csv_single,
)

GDP_SCHEMA = T.StructType(
    [
        T.StructField("year", T.IntegerType()),
        T.StructField("GDP_Finland", T.DoubleType()),
        T.StructField("GDP_Norway", T.DoubleType()),
        T.StructField("GDP_Sweden", T.DoubleType()),
    ]
)


def test_csv_round_trip_with_schema(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    tmp = tempfile.mkdtemp(prefix="csv_rt_")
    try:
        write_csv_single(region, f"{tmp}/region_csv")
        schema = T.StructType(
            [T.StructField("r_regionkey", T.IntegerType()), T.StructField("r_name", T.StringType())]
        )
        back = read_csv(spark, f"{tmp}/region_csv", schema)
        assert sorted(r["r_name"] for r in back.collect()) == sorted(
            r["r_name"] for r in region.collect()
        )
        # single-file contract (one part file + metadata)
        parts = [f for f in os.listdir(f"{tmp}/region_csv") if f.startswith("part-")]
        assert len(parts) == 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="module")
def gdp_wide(spark):
    rows = [
        (2015, 234.5, 386.6, 505.1),
        (2016, 240.8, 371.1, 515.7),
        (2017, 255.0, 398.4, 536.0),
    ]
    return spark.createDataFrame(rows, GDP_SCHEMA)


def test_gdp_unpivot_and_broadcast_join(spark, gdp_wide):
    facts = spark.createDataFrame(
        [("2015-03-01", "Finland"), ("2016-07-01", "Norway"), ("2017-01-01", "Sweden"),
         ("2015-05-01", "Norway")],
        "date string, country string",
    ).select(F.to_date("date").alias("date"), "country")
    out = E.join_gdp(facts, gdp_wide, ["Finland", "Norway", "Sweden"], log_transform=False)
    got = {(r["country"], r["date"].year): r["gdp"] for r in out.collect()}
    assert got[("Finland", 2015)] == 234.5
    assert got[("Norway", 2016)] == 371.1
    assert got[("Norway", 2015)] == 386.6
    # log1p variant applies the reference's conditioning (kaggle.py:202)
    logged = E.join_gdp(facts, gdp_wide, ["Finland", "Norway", "Sweden"], log_transform=True)
    import math

    got_log = {(r["country"], r["date"].year): r["gdp"] for r in logged.collect()}
    assert got_log[("Finland", 2015)] == pytest.approx(math.log1p(234.5))
    # the join must be broadcast (no shuffle of the fact side)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pseudo_label_union(spark):
    train = spark.createDataFrame(
        [(0, "a", 10.0), (1, "b", 20.0)], "row_id long, k string, num_sold float"
    )
    test = spark.createDataFrame([(100, "c"), (101, "d")], "row_id long, k string")
    pseudo = spark.createDataFrame([(100, 33.5)], "row_id long, num_sold float")
    out = E.add_pseudo_labels(train, test, pseudo)
    assert out.count() == 3  # 2 train + 1 labeled test (101 has no label -> dropped)
    got = {r["row_id"]: r["num_sold"] for r in out.collect()}
    assert got[100] == pytest.approx(33.5)


def test_time_series_cv_improves_with_more_history(spark):
    # y = day index + noise-free trend; expanding window folds must all fit
    rows = [(f"2020-01-{d:02d}", float(d)) for d in range(1, 29)]
    df = (
        spark.createDataFrame(rows, "date string, label double")
        .select(F.to_date("date").alias("date"), "label")
        .withColumn("t", F.dayofmonth("date").cast("double"))
    )
    df = VectorAssembler(inputCols=["t"], outputCol="features").transform(df)
    est = LinearRegression(featuresCol="features", labelCol="label")
    splits = expanding_window_splits(
        [
            ("2020-01-14", "2020-01-15", "2020-01-21"),
            ("2020-01-21", "2020-01-22", "2020-01-28"),
        ]
    )
    res = time_series_cross_validate(df, est, splits, label_col="label", metric="mae")
    assert len(res) == 2
    assert all(r["mae"] < 1e-6 for r in res)  # exactly linear target
