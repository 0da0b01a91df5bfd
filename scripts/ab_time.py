"""Within-session A/B timer for registry queries (verdict r7 items 1-2).

Usage: python scripts/ab_time.py <entry_path> <sf_dir> <q1,q2,...>
       [--clear-pq-cache] [--runs N | --runs=N]

Loads the given ``__spark_entry__.py`` (which self-inserts its repo root
on sys.path, so pointing this at a git-worktree checkout times THAT
revision), runs each named query ``--runs`` times under the same session
shape as tools/driver_sim.py (local[8], stock config), and prints one
JSON line with per-run wall seconds. Run HEAD and the r6-close worktree
back-to-back in the same host session to separate host drift from code
cost (this VM drifts 1.5-2x between sessions — PERF.md)."""
import argparse
import importlib.util
import json
import shutil
import tempfile
import time
import os

# argparse (round-9 advice): the hand-rolled parser accepted only
# --runs=N, silently ignored a space-separated value AND leaked the bare
# number into the positional list, shifting every later argument
ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("entry_path")
ap.add_argument("sf")
ap.add_argument("names", help="comma-separated registry query names")
ap.add_argument("--runs", type=int, default=2)
ap.add_argument("--clear-pq-cache", action="store_true")
ns = ap.parse_args()
entry_path, sf, names, runs = ns.entry_path, ns.sf, ns.names.split(","), ns.runs
if ns.clear_pq_cache:
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
