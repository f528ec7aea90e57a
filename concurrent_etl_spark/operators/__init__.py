"""Operator layer (SURVEY.md §2).

DataFrame -> DataFrame functions only. Relational primitives come
straight from Spark; composite ETL ops (dimension upsert, template
routing, staging merge) and the LLM-pipeline ops (dedup, similarity,
text analysis, multimodal) are compositions of built-ins, dropping to
Arrow-vectorized pandas only where built-ins cannot express the
semantics.
"""

from concurrent_etl_spark.operators.dims import upsert_dimension
from concurrent_etl_spark.operators.relational import (
    anti_join,
    broadcast_left_join,
    composite_key_join,
    dedup_by_key,
    new_keys,
    semi_join,
)

__all__ = [
    "upsert_dimension",
    "anti_join",
    "broadcast_left_join",
    "composite_key_join",
    "dedup_by_key",
    "new_keys",
    "semi_join",
]
