"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference stock stream+batch pipeline
(rudranshdas/Stock_price_prediction_using_stream_and_Batch_processing),
re-expressed Spark-first.

Layout:
    sources/    parquet/stream sources, seeded tick generator (parity fixture)
    functions/  column-expression library (text, vectors, scaling, hashing)
    operators/  DataFrame -> DataFrame ops (windows, joins, dedup, similarity,
                text analysis, top-k, multimodal plumbing)
    ml/         model inference (pandas-UDF batched; Keras gated, linear fallback)
    plans/      the named query registry backing __spark_entry__.py
    streaming/  Structured Streaming pipelines (reference parity + stateful)
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
