"""HTTP /predict server — the full reference system (SURVEY.md §3.3) in
one process: stdlib HTTP façade + file RPC bus + streaming scorer.

Usage:
    python scripts/serve_predict.py <model_dir> [port] [bus_dir]

POST JSON feature payloads to http://127.0.0.1:<port>/predict; malformed
payloads get the sentinel response (prediction −1), slow responses 504
after the reference's 5 s deadline.
"""

from __future__ import annotations

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_occupancy_detection_spark.serving import (
    FileRpcBus,
    serve,
    start_scoring_query,
)
from big_data_occupancy_detection_spark.session import get_local_session


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: serve_predict.py <model_dir> [port] [bus_dir]")
    model_dir = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    bus_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/occupancy_rpc"

    spark = get_local_session("occupancy-predict-api")
    spark.sparkContext.setLogLevel("WARN")
    from pyspark.ml import PipelineModel

    model = PipelineModel.load(model_dir)
    bus = FileRpcBus(bus_dir)
    query = start_scoring_query(
        spark, model, bus, os.path.join(bus_dir, "checkpoint")
    )
    server = serve(bus, port=port)
    print(f"serving http://127.0.0.1:{port}/predict (bus: {bus_dir})")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        query.awaitTermination()
    finally:
        server.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
