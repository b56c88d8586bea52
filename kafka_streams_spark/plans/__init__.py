from kafka_streams_spark.plans.audit import (
    PlanAudit,
    audit,
)

__all__ = ["PlanAudit", "audit"]
