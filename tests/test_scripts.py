"""Smoke tests for the runnable entry-point scripts (reference parity:
eda/main.py + eda_analysis.py, ml/train_model.py)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _occupancy_csv(path, n=400):
    rows = ["id,date,Temperature,Humidity,Light,CO2,HumidityRatio,Occupancy"]
    for i in range(n):
        occ = 1 if i % 4 == 0 else 0
        rows.append(
            f"{i},2015-02-{(i % 27) + 1:02d} {i % 24:02d}:15:00,"
            f"{21.0 + (2.0 if occ else 0.0) + (i % 10) * 0.05:.3f},"
            f"{25.0 + (i % 17) * 0.3:.3f},"
            f"{(400.0 if occ else 80.0) + (i % 5):.1f},"
            f"{(1000.0 if occ else 480.0) + (i % 23) * 8:.1f},"
            f"{0.0035 + (0.0012 if occ else 0.0):.6f},{occ}"
        )
    path.write_text("\n".join(rows))
    return str(path)


def test_run_eda_script(tmp_path):
    csv = _occupancy_csv(tmp_path / "occ.csv")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_eda.py"), csv],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "merged rows: 400" in out.stdout
    assert "class balance" in out.stdout
    assert "occupancy rate by hour" in out.stdout


def test_train_script_lr(tmp_path):
    csv = _occupancy_csv(tmp_path / "occ.csv", n=600)
    out_dir = str(tmp_path / "reports")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "train_occupancy.py"),
            csv, out_dir, "lr", "--no-light",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(os.path.join(out_dir, "metrics_test.csv"))
    assert os.path.exists(os.path.join(out_dir, "occupancy_lr"))
    assert "accuracy=" in out.stdout


def _run_smoke(script, args):
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json as _json

    lines = [
        _json.loads(l)
        for l in out.stdout.splitlines()
        if l.startswith("{")
    ]
    assert lines, out.stdout[-2000:]
    return lines


def test_scale_smoke_text_runs_tiny():
    lines = _run_smoke("scale_smoke_text.py", ["2", "pmi"])
    assert lines[0]["replication"] == 2
    assert any(l.get("op") == "pmi_top_cooccurrence" for l in lines)


def test_scale_smoke_events_runs_tiny():
    lines = _run_smoke("scale_smoke_events.py", ["2", "sliding"])
    assert any(l.get("op") == "sliding_hour_activity" for l in lines)


def test_scale_smoke_tpch_runs_tiny():
    lines = _run_smoke("scale_smoke_tpch.py", ["2", "pricing_summary"])
    assert any(l.get("op") == "pricing_summary" for l in lines)


def test_scale_smoke_ann_vec_runs_tiny():
    lines = _run_smoke("scale_smoke_ann.py", ["2", "brute_vec"])
    assert any(l.get("op") == "brute_force_topk_vectorized" for l in lines)
