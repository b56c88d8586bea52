from kafka_streams_spark.streaming.router import (
    BalanceView,
    run_payment_stream,
)

__all__ = ["run_payment_stream", "BalanceView"]
