"""Arrow-vectorized text folds — the numpy fast paths for the corpus
LM / token-statistics family (the ``ext/similarity_vec.py`` pattern
applied to text).

The pure-Catalyst forms in ``plans/analytics.py`` tokenize with
``regexp_replace``/``split`` and build adjacent pairs with array
expressions — correct and oracle-paired, but the per-token JVM cost
dominates at corpus scale (PERF.md: the 100x text smoke spent most of
its wall in tokenize+pair construction). Here the token work crosses
into Python ONCE per Arrow batch and is vectorized:

- CPython's C regex engine tokenizes each document,
- ``pandas.util.hash_array`` (SipHash with pandas' FIXED default key —
  deterministic across worker processes, unlike builtin ``hash``)
  maps every token to a 64-bit id in one vectorized call,
- adjacent pairs come from numpy index arithmetic over the
  concatenated token array (a token pairs with its successor iff it is
  not its document's last token).

Token STRINGS never leave the Python worker — the stream that crosses
back over Arrow is (doc_id, h1, h2) int64 triples, so every downstream
group/join runs on longs. The hash is internal: results that expose
only counts/scores are hash-independent (64-bit over a web-corpus
vocabulary: collision odds ~|V|²/2⁶⁵, negligible), and the JVM twin is
parity-tested in tests/test_text_vec.py.

Scale shape: ``mapInPandas`` after ``repartition_for_compute`` — the
fold is embarrassingly parallel per batch, holds only its batch in
memory, and never sees the corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import repartition_for_compute

_TOKEN_RE = re.compile(r"[a-z]+")


def hashed_bigram_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, h1, h2) adjacent-token-pair stream with 64-bit token ids.

    Tokenization is the portable ``lower + [^a-z]+ split`` used by every
    text query (so pair COUNTS match the Catalyst fold exactly); ids are
    ``pd.util.hash_array`` values reinterpreted as int64. Documents with
    fewer than two tokens contribute no rows, matching the
    ``size(ts) >= 2`` filter of the expression form.
    """

    def fold(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            toks = [
                _TOKEN_RE.findall(s.lower()) if isinstance(s, str) else []
                for s in pdf[text_col]
            ]
            lens = np.fromiter(
                (len(t) for t in toks), dtype=np.int64, count=len(toks)
            )
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if t]
            )
            h = pd.util.hash_array(flat, categorize=True).view(np.int64)
            # a position i pairs with i+1 iff i is NOT its doc's last
            # token; doc ends sit at cumsum(lens)-1 (empty docs collapse
            # onto the previous end — already invalid, so harmless)
            ends = np.cumsum(lens) - 1
            valid = np.ones(total, dtype=bool)
            valid[ends[lens > 0]] = False
            doc_rep = np.repeat(ids, lens)
            yield pd.DataFrame(
                {
                    id_col: doc_rep[valid],
                    "h1": h[valid],
                    "h2": h[np.flatnonzero(valid) + 1],
                }
            )

    return repartition_for_compute(docs.select(id_col, text_col)).mapInPandas(
        fold, f"{id_col} long, h1 long, h2 long"
    )


def bigram_pairs_jvm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pure-Catalyst twin of :func:`hashed_bigram_pairs` (token ids via
    ``xxhash64`` instead of pandas' SipHash — different id VALUES, same
    pair structure). Kept for parity testing and for engines where the
    Python worker pool is unavailable."""
    ts = F.filter(
        F.split(F.regexp_replace(F.lower(text_col), "[^a-z]+", " "), " "),
        lambda t: t != "",
    )
    hs = F.transform(ts, lambda t: F.xxhash64(t))
    cleanh = docs.select(id_col, hs.alias("hs")).filter(F.size("hs") >= 2)
    pairs = F.arrays_zip(
        F.slice("hs", 1, F.size("hs") - 1).alias("h1"),
        F.slice("hs", 2, F.size("hs") - 1).alias("h2"),
    )
    return cleanh.select(id_col, F.explode(pairs).alias("b")).select(
        id_col, "b.h1", "b.h2"
    )
