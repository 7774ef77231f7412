"""smartpool_bigdata_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse pipeline (ivanuclm/smartpool-bigdata,
surveyed in SURVEY.md): medallion batch pipelines (Bronze/Silver/Gold),
incremental ingestion with watermark state, declarative data-quality
expectations, windowed streaming aggregation, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Everything is expressed through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, join strategy and whole-stage codegen;
engine code confines itself to semantics Spark does not provide (state
protocol, drift-tolerant typing, expectations, pipeline topology).
"""

from smartpool_bigdata_spark.session import get_spark, session_builder
from smartpool_bigdata_spark.catalog import Catalog, load_table, register_views

__all__ = [
    "get_spark",
    "session_builder",
    "Catalog",
    "load_table",
    "register_views",
]

__version__ = "0.1.0"
