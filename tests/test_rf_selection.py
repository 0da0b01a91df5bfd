"""Gates for the RF/no-light CV model-selection reproduction (round 7).

The reference's saved model pins the 3x4x2-grid CV winner at
numTrees=200/maxDepth=25/subsamplingRate=0.8 and the notebook records
"Test AUC: 0.9975 / Test Accuracy: 0.9783" (ml/model_creation_and_
tuning.ipynb cells 8/17 outputs; saved metadata under
ml/models/occupancy_no_light/stages/2_RandomForestClassifier_*/metadata).

What IS reproducible, and gated here from the committed artifact
rf_selection.json (written by scripts/reproduce_rf_selection.py +
scripts/rf_selection_followup.py on the real dataset):

1. The published test metrics: at the reference's exact params with its
   RECORDED RF seed (defaultParamMap.seed = 3543767574895324818), the
   engine's test AUC/accuracy round to the published 0.9975/0.9783.
2. The selection STRUCTURE: the reference's params always land in the
   statistically-tied top cluster (within 1e-4 avg-AUC of the argmax,
   top-5 of 24), and CV decisively rejects the shallow maxDepth=10 tier
   (>1e-3 below) — the decisions CV actually encodes at this data size.

What is NOT reproducible, and why (documented in REFERENCE_PARITY.md):
the exact argmax identity depends on the CrossValidator FOLD seed, which
the reference never recorded (PySpark's HasSeed default is the salted
hash(type(self).__name__); the CV model was not saved). Measured: three
fold seeds give three different winners, all within 6e-05 avg-AUC.

The full 72-fit CV rerun is expensive (~4 min on 32 cores) — opt in with
SPARK_GRAFT_SLOW=1 to regenerate-and-compare live.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "rf_selection.json")
REF_PARAMS = (200, 25, 0.8)

pytestmark = pytest.mark.skipif(
    not os.path.exists(ART), reason="rf_selection.json not committed"
)


def _key(row):
    return (row["numTrees"], row["maxDepth"], row["subsamplingRate"])


def _grid_checks(rows):
    rows = sorted(rows, key=lambda r: -r["avg_auc"])
    ref = next(r for r in rows if _key(r) == REF_PARAMS)
    rank = rows.index(ref) + 1
    # reference params inside the tied top cluster
    assert rank <= 5, (rank, ref)
    assert rows[0]["avg_auc"] - ref["avg_auc"] < 1e-4, (rows[0], ref)
    # the shallow tier is decisively rejected — the selection signal
    # CV actually encodes (not fold-seed noise)
    shallow = [r for r in rows if r["maxDepth"] == 10]
    assert shallow, "grid must include the maxDepth=10 tier"
    assert max(s["avg_auc"] for s in shallow) < ref["avg_auc"] - 1e-3


def test_committed_grid_reproduces_selection_structure():
    art = json.load(open(ART))
    assert len(art["grid"]) == 24  # 3 x 4 x 2
    _grid_checks(art["grid"])
    # the artifact's own argmax matches its recorded winner
    best = max(art["grid"], key=lambda r: r["avg_auc"])
    assert _key(best) == tuple(art["winner"][k] for k in
                               ("numTrees", "maxDepth", "subsamplingRate"))


def test_ref_params_reproduce_published_test_metrics():
    """At the reference's exact saved params + recorded RF seed, the test
    metrics equal the notebook's published outputs at published
    precision (cell 17: 'Test AUC: 0.9975 / Test Accuracy: 0.9783')."""
    art = json.load(open(ART))
    assert art["rf_seed"] == 3543767574895324818
    assert f"{art['ref_param_test_auc']:.4f}" == "0.9975"
    assert f"{art['ref_param_test_accuracy']:.4f}" == "0.9783"
    # the split itself reproduced: notebook cell 8 prints ratio 3.34
    assert f"{art['oversample_ratio']:.2f}" == "3.34"


def test_winner_identity_is_fold_seed_noise_documented():
    """The artifact must carry the multi-fold-seed evidence: every fold
    seed keeps the reference params within 1e-4 of its argmax (tied top
    cluster), while winners themselves may differ."""
    art = json.load(open(ART))
    assert len(art["winner_by_fold_seed"]) >= 2
    for seed, w in art["winner_by_fold_seed"].items():
        assert w["ref_params_rank"] <= 5, (seed, w)
        assert w["ref_params_delta_to_winner"] < 1e-4, (seed, w)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW"),
    reason="72-fit CV rerun; opt in with SPARK_GRAFT_SLOW=1",
)
def test_full_cv_rerun_matches_structure(tmp_path):
    out = str(tmp_path / "rf_live.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "reproduce_rf_selection.py"), out],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    live = json.load(open(out))
    _grid_checks(live["grid"])
    assert f"{live['test_auc']:.4f}" == "0.9975"
    assert f"{live['test_accuracy']:.4f}" == "0.9783"
