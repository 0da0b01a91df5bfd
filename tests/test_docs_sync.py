"""Doc-sync gate: README's registry counts must match the live registry.

Round-1 VERDICT flagged hand-edited counts drifting twice; this pins them.
When you add/remove a registered query or oracle, update README.md's
``plans/`` blurb — this test tells you the right numbers.
"""

from __future__ import annotations

import re
from pathlib import Path

from big_data_occupancy_detection_spark.plans import REGISTRY

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_registry_counts_match():
    text = README.read_text()
    m = re.search(r"(\d+) named queries", text)
    assert m, "README must state '<N> named queries'"
    n_queries = int(m.group(1))
    m = re.search(r"\((\d+) oracles", text)
    assert m, "README must state '(<N> oracles'"
    n_oracles = int(m.group(1))

    actual_q = len(REGISTRY)
    actual_o = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    assert (n_queries, n_oracles) == (actual_q, actual_o), (
        f"README says {n_queries} queries / {n_oracles} oracles but the "
        f"registry has {actual_q} / {actual_o} — update README.md"
    )
