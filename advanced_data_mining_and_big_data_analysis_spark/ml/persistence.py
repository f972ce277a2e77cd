"""Composite-model persistence (VERDICT round-1 gap: E2→E3 handoff,
reference kaggle.py:656-697 trains then 804-859 scores — a persisted
fitted ensemble is implied between the two).

Spark ML models already ship MLWriter/MLReader; what the reference's
recipe needs on top is persistence for the COMPOSITE estimators
(BoostedHybridModel, StackingModel) that hold several fitted stages plus
plain-Python config. Layout: one subdirectory per stage (each written by
its own native MLWriter) plus a ``meta.json`` naming the Python class of
every stage so load can reassemble blind.

All file IO goes through the Hadoop FileSystem API, so paths can be
hdfs:// / s3a:// / file:// alike — same contract as Spark ML's own
writers (a driver-local json.dump would break on a real cluster).
"""

from __future__ import annotations

import importlib
import json

from pyspark.ml.util import MLReadable
from pyspark.sql import SparkSession


def write_text_file(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file through the Hadoop FS API (overwrite)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text_file(spark: SparkSession, path: str) -> str:
    sc = spark.sparkContext
    jvm = sc._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def stage_meta(stage) -> dict:
    """Class pointer persisted for a fitted stage."""
    return {"module": type(stage).__module__, "cls": type(stage).__name__}


def save_stage(stage, path: str) -> None:
    """Save one fitted stage: native MLWriter when available, else the
    composite's own ``save(path)`` (our convention)."""
    if hasattr(stage, "write"):
        stage.write().overwrite().save(path)
    else:
        stage.save(path)


def load_stage(spark: SparkSession, meta: dict, path: str):
    cls = getattr(importlib.import_module(meta["module"]), meta["cls"])
    if isinstance(cls, type) and issubclass(cls, MLReadable):
        return cls.load(path)
    return cls.load(spark, path)  # composite convention: load(spark, path)


def save_meta(spark: SparkSession, path: str, meta: dict) -> None:
    write_text_file(spark, f"{path}/meta.json", json.dumps(meta, indent=2))


def load_meta(spark: SparkSession, path: str) -> dict:
    return json.loads(read_text_file(spark, f"{path}/meta.json"))
