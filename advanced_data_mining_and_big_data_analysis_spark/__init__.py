"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo 7-RED/Advanced-Data-Mining-and-Big-Data-Analysis.

The reference (see SURVEY.md) is a Kaggle TPS Jan-2022 time-series notebook
(`kaggle/kaggle.py`) plus a 2-node Hadoop cluster tutorial (`hadoop.md`).
This package re-expresses everything it computes as scalable, Catalyst-
optimizable Spark DataFrame operators, and extends the surface with the
relational operators the DuckDB-oracle queries need plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
    session      SparkSession factory (local-mode tuned, AQE on)
    sources/     table catalog, schema'd readers/writers
    functions/   column-expression builders (calendar, fourier, metrics, scalar)
    operators/   composite operators (dedup, similarity, text, multimodal)
    plans/       declared query registry (drives __spark_entry__ + bench)
    streaming/   Structured Streaming wiring (windows, sessions, dedup)
    ml/          Spark ML pipeline pieces (BoostedHybrid, stacking, encoders)
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
