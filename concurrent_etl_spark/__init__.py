"""concurrent_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``nichoteloo/concurrent-etl``
(single-node pandas/threading ETL) on Spark's DataFrame / SQL /
Catalyst / Structured Streaming stack, extended with the operators a
large-scale (100 TB) LLM training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, multimodal binary columns, and text analysis.

Design stance (see SURVEY.md §7):
  * everything is a lazy DataFrame -> DataFrame function; Catalyst
    plans it, Tungsten executes it;
  * no chunk loops, no semaphores, no driver-side row iteration;
  * Python UDFs only where built-ins genuinely cannot express the
    semantics, and then always Arrow-vectorized (pandas_udf /
    mapInPandas / applyInPandas);
  * small dimensions broadcast; big joins shuffle on their keys; AQE
    handles skew and partition coalescing at runtime.
"""

from concurrent_etl_spark.engine import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]

__version__ = "0.1.0"
