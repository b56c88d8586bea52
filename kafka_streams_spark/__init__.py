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


def _register_self_contained_udfs() -> None:
    """Serialize this package's UDF closures BY VALUE, not by module
    reference. Arrow closures (mapInPandas/pandas_udf) defined inside
    the package otherwise pickle as references to
    ``kafka_streams_spark.*`` — and a Python WORKER whose interpreter
    cannot import the package (driver launched from another cwd with
    the repo reached via a sys.path insert, which does not propagate
    to workers) dies with ModuleNotFoundError at the first Arrow
    stage. By-value registration makes every shipped closure
    self-contained, so the engine works from any launch directory with
    zero deploy steps. On a real cluster, pip-installing the package
    on executors makes this a harmless no-op (reference pickling would
    also work there); the registration stays because zero-install
    correctness is the safer default.
    """
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - very old pyspark layouts
        return
    if not hasattr(cloudpickle, "register_pickle_by_value"):  # pragma: no cover
        return
    import importlib

    # every module that defines a worker-side closure
    # (pandas_udf / mapInPandas / applyInPandas*)
    for mod in [
        "kafka_streams_spark.operators.dedup",
        "kafka_streams_spark.operators.similarity",
        "kafka_streams_spark.operators.text",
        "kafka_streams_spark.operators.multimodal",
        "kafka_streams_spark.streaming.stateful",
        "kafka_streams_spark.dsl",
    ]:
        cloudpickle.register_pickle_by_value(importlib.import_module(mod))


_register_self_contained_udfs()

__all__ = ["get_spark"]
__version__ = "0.1.0"
