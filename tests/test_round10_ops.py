"""Round-10 operator property tests (beyond the oracle hash)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_hilbert_adjacency_property(spark):
    """The a0183 transform must BE a Hilbert curve: over the full
    256x256 grid the index is a bijection and consecutive indices are
    grid neighbors (unit Manhattan step) — the locality property the
    layout claim rests on."""
    from advanced_data_mining_and_big_data_analysis_spark.plans.round10b import (
        _H_N,
        hilbert_stages,
    )

    grid = spark.range(_H_N * _H_N).select(
        (F.col("id") % _H_N).alias("x"),
        (F.col("id") / _H_N).cast("long").alias("y"),
        (F.col("id") % _H_N).alias("px"),
        (F.col("id") / _H_N).cast("long").alias("py"),
    )
    h = hilbert_stages(grid).select("hval", "px", "py")
    assert h.groupBy("hval").count().filter("count > 1").count() == 0
    w = Window.orderBy("hval")
    steps = h.select(
        (
            F.abs(F.col("px") - F.lag("px").over(w)) + F.abs(F.col("py") - F.lag("py").over(w))
        ).alias("step")
    )
    assert steps.filter(F.col("step").isNotNull() & (F.col("step") != 1)).count() == 0


def test_hilbert_beats_zorder_on_misaligned_files(spark, sf_dir):
    """At a file count that is not a power of 4 (ranges misaligned with
    quadrant blocks), Hilbert's strict locality must show: its mean and
    worst per-file footprint are no worse than Z-order's, and the
    Z-order worst file exhibits the Morton seam jump (span > 2x
    Hilbert's worst)."""
    from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

    rows = {
        r["layout"]: r
        for r in all_queries()["a0183_hilbert_layout"].fn(spark, sf_dir).collect()
    }
    h, z = rows["hilbert"], rows["zorder"]
    assert h["avg_span_frac"] <= z["avg_span_frac"]
    assert h["max_span_frac"] * 2 < z["max_span_frac"]


def test_flagship_pipeline_funnel_monotone(spark, sf_dir):
    """Every stage of a0142 can only shrink the per-source corpus."""
    from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

    for r in all_queries()["a0142_flagship_pipeline"].fn(spark, sf_dir).collect():
        assert (
            r["n_raw"] >= r["n_dedup"] >= r["n_quality"] >= r["n_decontam"] >= r["n_sampled"]
        ), r
        assert r["n_chunks"] <= r["total_tokens"] or r["n_chunks"] == 0
        assert 0 <= r["pack_utilization"] <= 1


def test_int4_packing_checksum_bounds(spark, sf_dir):
    """a0141: 64 dims -> 32 bytes per vector; bytes in [0, 255]."""
    from advanced_data_mining_and_big_data_analysis_spark.plans import all_queries

    for r in all_queries()["a0141_int4_quantization"].fn(spark, sf_dir).collect():
        assert r["n_bytes"] == r["n_vecs"] * 32, r
        assert r["max_abs_err"] >= 0 and r["mse"] >= 0
