"""End-to-end RPC façade test: HTTP /predict → file bus → streaming scorer
→ response — the reference's full §3.3 lifecycle without Kafka/FastAPI."""

from __future__ import annotations

import json
import threading
import urllib.request
import urllib.error

import pytest
from pyspark.sql import Row

from big_data_occupancy_detection_spark.ml.pipelines import (
    build_weighted_lr_pipeline,
    strip_training_summary,
)
from big_data_occupancy_detection_spark.operators.relational import class_weights
from big_data_occupancy_detection_spark.serving import (
    FileRpcBus,
    serve,
    start_scoring_query,
)

FEATURES = ["Temperature", "Humidity", "CO2", "HumidityRatio"]


@pytest.fixture(scope="module")
def tiny_model(spark):
    rows = [
        Row(
            Temperature=21.0 + (3.0 if i % 2 else 0.0),
            Humidity=30.0,
            CO2=500.0 + (700.0 if i % 2 else 0.0),
            HumidityRatio=0.004,
            label=i % 2,
        )
        for i in range(200)
    ]
    df = class_weights(spark.createDataFrame(rows), "label")
    return strip_training_summary(build_weighted_lr_pipeline(FEATURES).fit(df))


def _post(port, body: dict, timeout=40):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_predict_rpc_end_to_end(spark, tmp_path, tiny_model):
    bus = FileRpcBus(str(tmp_path / "bus"))
    query = start_scoring_query(
        spark, tiny_model, bus, str(tmp_path / "ckpt")
    )
    server = serve(bus, port=18742, deadline_s=30.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # valid request → real prediction with probability in [0,1]
        status, resp = _post(
            18742,
            {"Temperature": 24.0, "Humidity": 30.0, "CO2": 1200.0, "HumidityRatio": 0.004},
        )
        assert status == 200
        assert resp["prediction"] in (0, 1)
        assert 0.0 <= resp["probability"] <= 1.0

        # malformed request (missing + wrong-typed field) → sentinel, stream alive
        status, resp = _post(
            18742, {"Temperature": "oops", "Humidity": 30.0}
        )
        assert status == 200
        assert resp["prediction"] == -1
        assert resp["probability"] == -1.0

        # stream survived: another valid request still answers
        status, resp = _post(
            18742,
            {"Temperature": 21.0, "Humidity": 30.0, "CO2": 500.0, "HumidityRatio": 0.004},
        )
        assert status == 200 and resp["prediction"] in (0, 1)
    finally:
        server.shutdown()
        query.stop()


def test_file_rpc_bus_cleanup(tmp_path):
    """poll_response consumes (deletes) its file; gc_responses sweeps
    orphans past the TTL but leaves fresh files (ADVICE r1)."""
    import json
    import os
    import time

    from big_data_occupancy_detection_spark.serving import FileRpcBus

    bus = FileRpcBus(str(tmp_path / "bus"))
    for rid in ("r1", "r2", "r3"):
        with open(os.path.join(bus.responses_dir, f"{rid}.json"), "w") as f:
            f.write(json.dumps({"request_id": rid, "prediction": 1}))

    assert bus.poll_response("r1", deadline_s=1.0)["request_id"] == "r1"
    assert not os.path.exists(os.path.join(bus.responses_dir, "r1.json"))

    old = os.path.join(bus.responses_dir, "r2.json")
    past = time.time() - 120
    os.utime(old, (past, past))
    assert bus.gc_responses(ttl_s=60.0) == 1
    assert not os.path.exists(old)
    assert os.path.exists(os.path.join(bus.responses_dir, "r3.json"))
