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


COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"

# registry names COVERAGE.md may legitimately mention without implying a
# verification mode ("test:"-style rows); everything cited after an
# "oracle:" / "rows-only" marker is checked against the live registry.
_NAME_RE = re.compile(r"`([a-z0-9_]+)`")


def _coverage_claims() -> list[tuple[str, str, str]]:
    """(claimed_mode, query_name, line) for every oracle:/rows-only claim."""
    claims = []
    for line in COVERAGE.read_text().splitlines():
        for mode, chunk in re.findall(
            r"(oracle|rows-only)[:\s]*((?:`[a-z0-9_]+`(?:,\s*)?)+)", line
        ):
            for name in _NAME_RE.findall(chunk):
                claims.append((mode, name, line))
    return claims


def test_coverage_md_oracle_claims_match_registry():
    """COVERAGE.md's per-query 'oracle:' / 'rows-only' claims must agree
    with the live registry (round-2 VERDICT: `embedding_ivf_topk` drifted
    to rows-only in the doc after gaining a real oracle)."""
    claims = _coverage_claims()
    assert claims, "COVERAGE.md stopped matching the claim pattern"
    checked = 0
    for mode, name, line in claims:
        if name not in REGISTRY:
            continue  # prose mention of a non-query symbol
        has_oracle = REGISTRY[name].oracle is not None
        if mode == "oracle":
            assert has_oracle, (
                f"COVERAGE.md claims `{name}` is oracle-verified but the "
                f"registry has no oracle for it:\n  {line.strip()}"
            )
        else:
            assert not has_oracle, (
                f"COVERAGE.md claims `{name}` is rows-only but the registry "
                f"HAS an oracle — update the doc:\n  {line.strip()}"
            )
        checked += 1
    assert checked >= 10, f"only {checked} COVERAGE.md claims checked"
