from .schemas import REQUEST_SCHEMA, RESPONSE_FIELDS, SENTINEL_PREDICTION, SENTINEL_PROBABILITY
from .stateful import running_user_stats
from .inference import (
    build_inference_pipeline,
    kafka_sink,
    kafka_source,
    logistic_score,
    model_score,
    parse_requests,
)

__all__ = [
    "running_user_stats",
    "REQUEST_SCHEMA",
    "RESPONSE_FIELDS",
    "SENTINEL_PREDICTION",
    "SENTINEL_PROBABILITY",
    "parse_requests",
    "build_inference_pipeline",
    "model_score",
    "logistic_score",
    "kafka_source",
    "kafka_sink",
]
