"""Within-session A/B timer for registry queries (verdict r7 items 1-2).

Usage: python scripts/ab_time.py <entry_path> <sf_dir> <q1,q2,...>
       [--clear-pq-cache] [--runs N]

Loads the given ``__spark_entry__.py`` (which self-inserts its repo root
on sys.path, so pointing this at a git-worktree checkout times THAT
revision), runs each named query ``--runs`` times under the same session
shape as tools/driver_sim.py (local[8], stock config), and prints one
JSON line with per-run wall seconds. Run HEAD and the r6-close worktree
back-to-back in the same host session to separate host drift from code
cost (this VM drifts 1.5-2x between sessions — PERF.md)."""
import importlib.util
import json
import shutil
import sys
import tempfile
import time
import os

args = [a for a in sys.argv[1:] if not a.startswith("--")]
entry_path, sf, names = args[0], args[1], args[2].split(",")
runs = 2
for a in sys.argv[1:]:
    if a.startswith("--runs="):
        runs = int(a.split("=")[1])
if "--clear-pq-cache" in sys.argv:
    shutil.rmtree(os.path.join(tempfile.gettempdir(), "bdo_pq_index"),
                  ignore_errors=True)

spec = importlib.util.spec_from_file_location("e", entry_path)
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
qs = m.queries()
out = {"entry": entry_path, "sf": sf, "timings": {}}
for name in names:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = qs[name](spark, sf).collect()
        ts.append(round(time.perf_counter() - t0, 2))
    out["timings"][name] = {"runs_s": ts, "rows": len(rows)}
print(json.dumps(out))
spark.stop()
