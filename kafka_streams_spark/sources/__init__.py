from kafka_streams_spark.sources.testdata import (
    PAYMENTS_FROM_EVENTS_SQL,
    load_table,
    payments_from_events,
)

__all__ = ["load_table", "payments_from_events", "PAYMENTS_FROM_EVENTS_SQL"]
