"""Scalar function helpers shared across operators."""

from kafka_streams_spark.functions.numeric import java_round, money
from kafka_streams_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["java_round", "money", "cosine_similarity", "dot", "l2_norm"]
