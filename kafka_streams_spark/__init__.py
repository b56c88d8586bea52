"""kafka_streams_spark — a PySpark-native analytics/stream-processing engine.

Re-expresses the full capability surface of the reference stream processor
(lydtechconsulting/kafka-streams: a Kafka Streams payment-routing topology,
see SURVEY.md) as idiomatic Spark: batch DataFrame transforms that double as
Structured Streaming stages, a foreachBatch multi-sink router, queryable
state, and an extended large-scale data-pipeline operator library (dedup,
similarity search, text analysis, multimodal plumbing).

Design rules (enforced throughout):
- Declarative DataFrame/SQL plans; Catalyst plans shuffles/pushdown/pruning.
- JVM-side built-in functions in hot paths; Pandas UDFs only where column
  expressions genuinely cannot express the semantics.
- Every operator is written for 100 TB / 1000-executor scale: broadcast the
  small side, pre-bucket self-joins, never collect to the driver.
"""

from kafka_streams_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
