"""Query registry — the verified surface of the engine.

Every capability from SURVEY.md §2 (plus the scale extension operators) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame``
callable and, wherever the semantics are ANSI-SQL-expressible, a DuckDB
oracle SQL string computing the identical result (same column names, same
types, same rounding). The driver hash-compares the two at sf0.01.

Conventions that make hash parity work:
- alias every computed column identically in Spark and SQL;
- round floating aggregates (4-6 decimals) on BOTH sides so double
  summation-order differences between engines vanish;
- cast count-like results to BIGINT on both sides (DuckDB ``sum(int)``
  is int128 otherwise);
- deterministic tie-breaks (a unique key) in every top-k / window order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    # DuckDB SQL; or a LAZY zero-arg callable returning SQL-or-None,
    # resolved at oracle_sql_map() time (round 10 — for oracles whose
    # SQL embeds data computed from the corpus, e.g. a served ANN
    # shortlist baked as a VALUES list); or None → rows-only check
    oracle: str | Callable[[], str | None] | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | Callable[[], str | None] | None = None):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql_map() -> dict[str, str]:
    """Resolve the oracle surface: lazy oracles run NOW (they may build
    an index / run a bounded Spark job); one that returns None or raises
    degrades that query to the rows-only check instead of failing the
    whole map."""
    import warnings

    out: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        o = spec.oracle
        if callable(o):
            try:
                o = o()
            except Exception as ex:  # degrade, but NEVER silently:
                # a swallowed failure here would turn an oracle-paired
                # query rows-only and every sweep would keep reporting
                # green while the verification had vanished (r10 review)
                warnings.warn(
                    f"lazy oracle for {name!r} raised "
                    f"{type(ex).__name__}: {ex} — degrading this query "
                    f"to the rows-only check",
                    RuntimeWarning,
                    stacklevel=2,
                )
                o = None
            else:
                if o is None:
                    warnings.warn(
                        f"lazy oracle for {name!r} resolved to None "
                        f"(no active SparkSession or data dir?) — "
                        f"degrading this query to the rows-only check",
                        RuntimeWarning,
                        stacklevel=2,
                    )
        if o is not None:
            out[name] = o
    return out
