"""Wire-level envelopes of the streaming plane (SURVEY.md §1.1/§1.3).

Request: ``{request_id, timestamp, payload{Temperature, Humidity, CO2,
HumidityRatio}}`` — the declared StructType mirrors
``infrastructure/stream_inference.py:28-42``: every payload field is
nullable **on purpose** so malformed input degrades to NULLs (which the
validity router converts to sentinel responses) instead of killing the
stream.

Response: ``{request_id, timestamp, features{...}, prediction, probability}``
(``stream_inference.py:132-148``); sentinel contract −1 / −1.0
(``stream_inference.py:124-126``) is part of the public API.
"""

from __future__ import annotations

from pyspark.sql import types as T

FEATURE_NAMES = ["Temperature", "Humidity", "CO2", "HumidityRatio"]

PAYLOAD_SCHEMA = T.StructType(
    [T.StructField(name, T.DoubleType(), True) for name in FEATURE_NAMES]
)

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType(), False),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("payload", PAYLOAD_SCHEMA, True),
    ]
)

RESPONSE_FIELDS = ["request_id", "timestamp", *FEATURE_NAMES, "prediction", "probability"]

SENTINEL_PREDICTION = -1
SENTINEL_PROBABILITY = -1.0
