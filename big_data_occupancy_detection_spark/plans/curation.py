"""Training-data curation plans: PII redaction, eval-set contamination,
repetition filtering, stratified sampling, sequence packing, export
shuffle.

Beyond-the-reference surface (the reference has no text pipeline;
SURVEY.md §2's LLM-pipeline extension). Every query here is a thin
registry adapter over ``ext.curation`` with a DuckDB oracle that
replays the identical deterministic recipe (md5 sample/shuffle keys,
fixed regex set, fixed thresholds), so the driver hash-compares values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext import curation as C
from ..sources.readers import table
from .registry import register
from .textops import NORM_SQL, TOKENS_SQL, SHINGLES_SQL

_TOKS_CTE = f"toks AS (SELECT doc_id, {TOKENS_SQL} AS t FROM documents)"

# --------------------------------------------------------------------------
# PII redaction. The synthetic corpus contains no PII (verified: zero
# digits/'@'), so the query plants deterministic PII per doc — an email
# always, a phone always, an IPv4 on every third doc — with the SAME
# expression on both engines, then counts and redacts. The operator under
# test (ext.curation.redact_pii / pii_counts) is general.
# --------------------------------------------------------------------------

_PII_EMAIL = C.PII_PATTERNS["email"]
_PII_PHONE = C.PII_PATTERNS["phone"]
_PII_IPV4 = C.PII_PATTERNS["ipv4"]

_PII_SYNTH_SQL = (
    "text || ' mail user' || CAST(doc_id AS VARCHAR) || "
    "'@example.org call +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "CASE WHEN doc_id % 3 = 0 THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END"
)

_PII_ORACLE = f"""
WITH synth AS (SELECT doc_id, {_PII_SYNTH_SQL} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT) AS n_ipv4,
       regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII_EMAIL}', '[EMAIL]', 'g'),
           '{_PII_PHONE}', '[PHONE]', 'g'),
           '{_PII_IPV4}', '[IPV4]', 'g') AS redacted
FROM synth
"""


@register("pii_redaction", oracle=_PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and mask emails / phone numbers / IPv4s per document —
    map-only (regex expressions inside whole-stage codegen, zero
    shuffles), the shape of a pre-training PII scrub pass."""
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail user"),
            did.cast("string"),
            F.lit("@example.org call +1-555-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" ip 10.0."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    (did % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    counts = C.pii_counts("t")
    return synth.select(
        "doc_id",
        counts["n_email"],
        counts["n_phone"],
        counts["n_ipv4"],
        C.redact_pii("t").alias("redacted"),
    )


# --------------------------------------------------------------------------
# Eval-set contamination: fraction of each doc's distinct 3-gram shingles
# found anywhere in the "benchmark" slice (doc_id % 97 == 0).
# --------------------------------------------------------------------------

_CONTAM_ORACLE = f"""
WITH {_TOKS_CTE},
sh AS (SELECT doc_id, {SHINGLES_SQL} AS shingles FROM toks),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0)
SELECT e.doc_id AS doc,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hit,
       round(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS contamination,
       sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE) > 0.2 AS contaminated
FROM ex e LEFT JOIN bench b USING (shingle)
GROUP BY e.doc_id
"""


@register("benchmark_contamination", oracle=_CONTAM_ORACLE)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination check: per-document distinct-shingle overlap with a
    benchmark subset, flagged above 20% — explode + one hash join on the
    shingle + one aggregation back to doc grain."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return C.shingle_contamination(docs, bench, n=3, flag_threshold=0.2)


# --------------------------------------------------------------------------
# Gopher-style repetition filter.
# --------------------------------------------------------------------------

_REP_ORACLE = f"""
WITH {_TOKS_CTE},
ex AS (SELECT doc_id, unnest(t) AS tok FROM toks),
tc AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS top FROM tc GROUP BY 1),
big AS (
  SELECT doc_id, len(t) AS n_tok,
         CASE WHEN len(t) < 2 THEN 0.0
              ELSE round(1.0 - len(list_distinct(list_transform(
                       range(1, len(t)),
                       i -> concat(t[i], ' ', t[i + 1]))))
                   / CAST(len(t) - 1 AS DOUBLE), 6)
         END AS dup_bigram_frac
  FROM toks)
SELECT b.doc_id AS doc,
       CAST(b.n_tok AS BIGINT) AS n_tok,
       round(top.top / CAST(b.n_tok AS DOUBLE), 6) AS top_token_frac,
       b.dup_bigram_frac,
       (top.top / CAST(b.n_tok AS DOUBLE) <= 0.12
        AND b.dup_bigram_frac <= 0.55) AS keep
FROM big b JOIN top USING (doc_id)
"""


@register("repetition_filter", oracle=_REP_ORACLE)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (most-frequent-token fraction,
    duplicate-bigram fraction) with a Gopher-rule keep flag."""
    docs = table(spark, sf_dir, "documents")
    return C.repetition_stats(docs)


# --------------------------------------------------------------------------
# Deterministic stratified sampling: 3 docs per (lang, source) stratum.
# --------------------------------------------------------------------------

_STRAT_ORACLE = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents)
WHERE rk <= 3
"""


@register("stratified_sample_docs", oracle=_STRAT_ORACLE)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota per-(lang, source) sample ranked by a portable md5
    pseudo-random key — replayable data-mixture sampling."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return C.stratified_sample(docs, ["lang", "source"], k=3)


# --------------------------------------------------------------------------
# Concat-and-chunk sequence packing at a 256-token budget.
# --------------------------------------------------------------------------

_PACK_ORACLE = f"""
WITH {_TOKS_CTE},
t2 AS (SELECT doc_id, len(t) AS n_tok FROM toks),
c AS (SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t2)
SELECT doc_id AS doc,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(cum - n_tok AS BIGINT) AS start_offset,
       CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS bin_start,
       CAST(floor((cum - 1) / 256.0) AS BIGINT) AS bin_end
FROM c
"""


@register("pack_training_sequences", oracle=_PACK_ORACLE)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lay documents out contiguously in id order and cut 256-token
    training sequences; the global offset comes from the scalable
    range-partitioned running sum, not a one-task window."""
    docs = table(spark, sf_dir, "documents")
    return C.pack_sequences(docs, budget=256)


# --------------------------------------------------------------------------
# Seeded deterministic export shuffle.
# --------------------------------------------------------------------------

_SHUFFLE_ORACLE = """
SELECT doc_id AS doc,
       row_number() OVER (
         ORDER BY md5('7|' || CAST(doc_id AS VARCHAR)), doc_id) AS shuffle_pos
FROM documents
"""


@register("export_shuffle_order", oracle=_SHUFFLE_ORACLE)
def export_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded, engine-portable global shuffle for training export —
    positions from the scalable global numbering over md5(seed|id)."""
    docs = table(spark, sf_dir, "documents")
    return C.export_shuffle(docs, seed=7)
