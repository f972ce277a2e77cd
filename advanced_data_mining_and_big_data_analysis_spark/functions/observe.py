"""Pipeline observability: zero-cost inline metrics via df.observe().

A 100 TB curation job cannot afford a second pass just to learn how
many rows it dropped — `Observation` piggybacks named aggregates onto
the job's OWN action (metrics are accumulated by the executors during
the normal scan), so every pipeline stage can publish row counts /
null rates / means for free. This is the engine-level twin of the
run-report counters in examples/corpus_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_scan(
    df: DataFrame, name: str, metrics: dict[str, F.Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation to `df`. Returns (df, observation); after
    ANY action on the returned frame, `observation.get` yields the
    metric dict — no extra job, no second scan.

    Default metrics: row count. Pass aggregate Columns for more, e.g.
    ``{"n": F.count(F.lit(1)), "null_text": F.sum(F.col("text").isNull().cast("long"))}``.
    """
    obs = Observation(name)
    if not metrics:
        metrics = {"n_rows": F.count(F.lit(1))}
    cols = [v.alias(k) for k, v in metrics.items()]
    return df.observe(obs, *cols), obs
