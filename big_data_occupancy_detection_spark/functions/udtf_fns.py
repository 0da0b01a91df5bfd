"""Python user-defined table functions (Spark 4 UDTF API surface).

The engine's §2.11 policy stands: NOTHING in the registry/bench hot
paths crosses into Python per row — heavy Python runs through Arrow
(`mapInPandas`/`applyInPandas`, see ext/). UDTFs are exposed because a
complete engine must offer the sanctioned table-function API for the
long tail of row-expanding logic users bring (parsers, custom
generators) that isn't worth a native rewrite. Arrow transfer for
UDTFs (`spark.sql.execution.pythonUDTF.arrow.enabled`) is turned on by
``register_udtfs`` so batches, not rows, cross the boundary.

Usage (SQL lateral form, after ``register_udtfs(spark)``)::

    SELECT d.doc_id, s.*
    FROM documents d, LATERAL split_sentences(d.text) s
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence string, idx int, n_words int")
class SplitSentences:
    """One row per sentence of the input text: terminator-split
    ('.', '!', '?'), trimmed, empties dropped; idx is the 0-based
    sentence position and n_words the whitespace token count."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        import re

        idx = 0
        for raw in re.split(r"[.!?]+", text):
            s = raw.strip()
            if not s:
                continue
            yield s, idx, len(s.split())
            idx += 1


def register_udtfs(spark) -> None:
    """Register the UDTF family for SQL use and enable Arrow transfer."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("split_sentences", SplitSentences)
