"""Scalar/array/generator function-surface plans.

The reference keeps 100% of its expressions in built-in Catalyst functions
(SURVEY.md §2.8/§2.11 — zero UDFs); this module widens that surface to the
function families a general engine must expose, each oracle-verified:

- unpivot/melt (wide→long reshape, the inverse of the pivot in
  ``plans/relational.py:order_status_pivot``);
- higher-order array functions (``transform``/``filter``/``aggregate``) over
  the embeddings table — all JVM-side, no UDF;
- regexp normalization + split + explode word counting over documents;
- ranking-distribution windows (``ntile``/``percent_rank``/``cume_dist``);
- date arithmetic with ``sequence``+``explode`` building a gap-filled
  monthly spine (the generator/lateral family);
- the string-function family (substring/lpad/upper/replace/length/concat).

Scale notes: explode fan-out happens executor-side after the scan projects
only the needed column; the word count is a classic map-side-combine
aggregation; the month spine is ~100 rows built from a 1-row bound
aggregate, then broadcast-joined to the grouped counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import table
from ..functions.rounding import portable_round
from ..operators.generate import explode_fused
from .registry import register


# --------------------------------------------------------------------------
# q72 — unpivot/melt: lineitem's four measures to long format, then one
# grouped profile per measure. DataFrame.unpivot is Catalyst's Expand node
# (same machinery as grouping sets), not a UDF.
# --------------------------------------------------------------------------
@register(
    "lineitem_measures_unpivot",
    oracle="""
    WITH long AS (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    SELECT measure, count(*) AS n,
           CAST(sum(CAST(round(val * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
           (floor(CAST((avg(val)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean,
           round(min(val), 6) AS min_val,
           round(max(val), 6) AS max_val
    FROM long GROUP BY measure
    """,
)
def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        # exact cents: every measure is an exact ≤2-decimal rational and
        # the per-measure total sums the WHOLE table (~2.3e10 for
        # extendedprice at sf0.1 — over the round-4 grain in noise; r10
        # global-money-sum hardening)
        (
            F.sum(F.round(F.col("val") * 100).cast("long")).cast("double")
            / 100.0
        ).alias("total"),
        portable_round(F.avg("val"), 6).alias("mean"),
        F.round(F.min("val"), 6).alias("min_val"),
        F.round(F.max("val"), 6).alias("max_val"),
    )


# --------------------------------------------------------------------------
# q73 — higher-order array functions over embeddings: per-vector dimension,
# positive-component count (filter), L2 norm (transform+aggregate), max
# component — everything stays in Tungsten; elements are cast float→double
# BEFORE arithmetic on both engines so the summation is bit-identical.
# --------------------------------------------------------------------------
@register(
    "embedding_array_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(sqrt(list_aggregate(
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 'sum')), 5) AS l2_norm,
           round(CAST(list_max(embedding) AS DOUBLE), 5) AS max_val
    FROM embeddings
    """,
)
def embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x,
                )
            ),
            5,
        ).alias("l2_norm"),
        F.round(F.array_max("embedding").cast("double"), 5).alias("max_val"),
    )


# --------------------------------------------------------------------------
# q74 — word frequency: lower + regexp normalization + split + explode over
# documents, top-20 by count with a deterministic word tiebreak. The
# explode fans out executor-side; counting is map-side-combined before the
# single small shuffle.
# --------------------------------------------------------------------------
@register(
    "top_words",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(
                   regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("text")
    words = docs.select(
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " ")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q75 — ranking-distribution windows: quartile (ntile), percent_rank and
# cume_dist per order-status partition, totally ordered by (price, key) so
# every rank is deterministic.
# --------------------------------------------------------------------------
@register(
    "order_price_ntiles",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           (floor(CAST((percent_rank() OVER w) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
           (floor(CAST((cume_dist() OVER w) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cum_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def order_price_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        portable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        portable_round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


# --------------------------------------------------------------------------
# q76 — gap-filled monthly spine: sequence(min_month, max_month, 1 month)
# exploded into a calendar spine, left-joined to per-month order aggregates
# with zero fill — the generator + calendar-join shape every reporting
# pipeline needs. The spine derives from a 1-row bound aggregate (scan-only
# min/max), so it costs one tiny job regardless of fact size.
# --------------------------------------------------------------------------
@register(
    "monthly_order_spine",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('month', min(o_orderdate)) AS mn,
             date_trunc('month', max(o_orderdate)) AS mx
      FROM orders),
    spine AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS month FROM bounds),
    counts AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue
      FROM orders GROUP BY 1)
    SELECT s.month,
           coalesce(c.n_orders, 0) AS n_orders,
           coalesce(c.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN counts c ON s.month = c.month
    """,
)
def monthly_order_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("mn"),
        F.date_trunc("month", F.max("o_orderdate")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    counts = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact cents — month-grain money sums are ~1e9 at sf0.1 (r10
        # global-money-sum hardening, see plans.relational.pricing_summary)
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("double") / 100.0
        ).alias("revenue"),
    )
    return spine.join(counts, "month", "left_outer").select(
        "month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


# --------------------------------------------------------------------------
# q77 — string-function family: substring, lpad, upper, literal replace,
# length, concat — pure projection (no shuffle), dialect-portable text.
# --------------------------------------------------------------------------
@register(
    "customer_name_badges",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           concat(substring(c_name, 1, 8), '-',
                  lpad(CAST(c_custkey AS VARCHAR), 10, '0')) AS badge,
           CAST(length(c_name) AS BIGINT) AS name_len,
           replace(c_name, 'Customer#', 'C') AS short_name
    FROM customer
    """,
)
def customer_name_badges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.concat(
            F.substring("c_name", 1, 8),
            F.lit("-"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0"),
        ).alias("badge"),
        F.length("c_name").cast("long").alias("name_len"),
        F.expr("replace(c_name, 'Customer#', 'C')").alias("short_name"),
    )


# --------------------------------------------------------------------------
# q81 — VARIANT semi-structured path (Spark 4): parse the JSON props column
# once into a variant, extract a typed field, aggregate per event type.
# Unlike from_json, variant needs no declared schema and keeps the
# shredded binary form through the plan; try_variant_get degrades to null
# on path/type misses (the same nullable-by-default contract as the
# streaming plane). Oracle uses DuckDB's JSON path extraction.
# --------------------------------------------------------------------------
@register(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           CAST(count(k) AS BIGINT) AS n_k,
           (floor(CAST((avg(k)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS avg_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            portable_round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("long").alias("n_high"),
        )
    )


# --------------------------------------------------------------------------
# Custom connector: the Python DataSource API generator source. A source-
# level correctness gate — every row the connector emits is a pure md5
# function of the row id, so the oracle regenerates the identical table.
# --------------------------------------------------------------------------

_EVENTGEN_ROWS = 5000


def _eventgen_hash(prefix: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{prefix}|' || CAST(i AS VARCHAR)), 1, 15)) "
        "AS BIGINT)"
    )


@register(
    "eventgen_source_scan",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS event_id,
           {_eventgen_hash('u')} % 1000 AS user_id,
           CASE {_eventgen_hash('t')} % 4
             WHEN 0 THEN 'view' WHEN 1 THEN 'click'
             WHEN 2 THEN 'purchase' ELSE 'refund' END AS event_type,
           round(({_eventgen_hash('v')} % 1000000) / 10000.0, 4) AS value
    FROM range({_EVENTGEN_ROWS}) t(i)
    """,
)
def eventgen_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the eventgen custom Python DataSource (partition-parallel
    deterministic generator): the connector itself is the unit under
    test — the oracle regenerates its full output from the row-id hash
    recipe."""
    from ..sources.pyds import register_eventgen

    register_eventgen(spark)
    return (
        spark.read.format("eventgen")
        .option("rows", _EVENTGEN_ROWS)
        .option("parts", 16)
        .load()
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE ... UNION ALL): ancestor-chain
# walk over the deterministic custkey decimal hierarchy (parent = key DIV
# 10) — the classic org-chart recursion. Each node has exactly ONE path
# to its root, so UNION ALL terminates naturally; Spark 4 does not yet
# support deduplicating UNION in recursive CTEs, which rules out cyclic-
# graph closures (the iterative min-label operator in ext.dedup covers
# those).
# --------------------------------------------------------------------------


@register(
    "customer_key_hierarchy",
    oracle="""
    WITH RECURSIVE walk(custkey, anc, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT w.custkey, w.anc // 10, w.depth + 1 FROM walk w WHERE w.anc >= 10
    )
    SELECT custkey,
           CAST(max(depth) AS BIGINT) AS depth,
           CAST(min(anc) AS BIGINT) AS root
    FROM walk GROUP BY custkey
    """,
)
def customer_key_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive ancestor walk (WITH RECURSIVE, Spark 4): every customer
    key climbs its decimal parent chain (k DIV 10) to the single-digit
    root; depth = chain length. One recursion level per digit — bounded,
    duplicate-free, so UNION ALL reaches the fixpoint."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("__cust_hier")
    return spark.sql(
        """
        WITH RECURSIVE walk(custkey, anc, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM __cust_hier
          UNION ALL
          SELECT w.custkey, w.anc DIV 10, w.depth + 1 FROM walk w
          WHERE w.anc >= 10
        )
        SELECT custkey,
               CAST(max(depth) AS BIGINT) AS depth,
               CAST(min(anc) AS BIGINT) AS root
        FROM walk GROUP BY custkey
        """
    )


# --------------------------------------------------------------------------
# BPE merge candidates: corpus-wide adjacent-token-pair frequencies — the
# statistic a tokenizer-training job computes for its first merge round.
# --------------------------------------------------------------------------
@register(
    "bpe_merge_candidates",
    oracle="""
    WITH toks AS (
      SELECT regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> concat(t[i], ' ', t[i + 1]))) AS pair
      FROM toks)
    SELECT pair, CAST(count(*) AS BIGINT) AS freq
    FROM pairs GROUP BY pair
    ORDER BY freq DESC, pair LIMIT 50
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent token pairs by corpus frequency (the BPE merge-
    selection statistic): in-row bigram build, one map-side-combined
    count, TakeOrdered top-k — no shuffle carries raw text."""
    from ..functions.text_fns import tokens

    docs = table(spark, sf_dir, "documents")
    t = tokens("text")
    bigrams = F.expr(
        "transform(slice(__t, 1, size(__t) - 1), (x, i) -> concat(x, ' ', __t[i + 1]))"
    )
    return (
        explode_fused(docs.select(t.alias("__t")), bigrams, "pair", keep=[])
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "pair")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Approximate distinct (HyperLogLog++): the sketch's raw estimate is
# engine-specific by nature (Spark HLL++ vs any oracle's own sketch), so
# the PORTABLE contract — |approx − exact| / exact within the advertised
# error envelope — is what the oracle hash-verifies: the query emits the
# exact count plus a boolean tolerance verdict, both engine-deterministic.
# The raw estimate's tolerance is additionally gated in
# tests/test_curation.py.
# --------------------------------------------------------------------------
_HLL_TOL = 0.05  # rsd=0.02 → 2.5σ envelope; deterministic per dataset


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           true AS approx_ok
    FROM events GROUP BY 1
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approx_count_distinct(user_id) (HLL++, rsd 2%)
    checked in-plan against the exact count — the constant-memory
    cardinality path for 100 TB streams where exact countDistinct
    shuffles every key."""
    ev = table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (
            F.abs(approx.cast("double") - exact) / exact <= F.lit(_HLL_TOL)
        ).alias("approx_ok"),
    )


# --------------------------------------------------------------------------
# Mergeable cardinality sketches (Apache DataSketches HLL): per-group
# sketches that UNION to coarser grains without touching raw data — the
# property that makes sketch rollup trees work at 100 TB (a daily job
# materializes per-(type, day) sketches once; any later grain is a cheap
# sketch union, never a rescan). Raw estimates are sketch-implementation-
# specific, so — like approx_distinct_users above — the oracle verifies
# the portable contract: exact counts per grain, plus a boolean that each
# estimate (including the UNIONED rollup) lands within the error envelope
# of its grain's exact count. The merge property itself (union of
# per-type sketches == direct global sketch) is asserted exactly in
# tests/test_curation.py.
# --------------------------------------------------------------------------
@register(
    "hll_rollup_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS est_ok
    FROM events GROUP BY 1
    UNION ALL
    SELECT 'ALL', count(DISTINCT user_id), true FROM events
    """,
)
def hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    tol = F.lit(_HLL_TOL)
    per_rows = per.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk").cast("double") - F.col("exact_users"))
            / F.col("exact_users")
            <= tol
        ).alias("est_ok"),
    )
    # the rollup row unions the per-type sketches — never rescans raw data —
    # and is checked against the global exact count (computed once here for
    # verification; a production rollup would carry only the sketches)
    global_exact = ev.agg(F.count_distinct("user_id").alias("g")).select("g")
    merged = (
        per.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("ALL").alias("event_type"),
            F.col("g").alias("exact_users"),
            (F.abs(F.col("est").cast("double") - F.col("g")) / F.col("g") <= tol).alias(
                "est_ok"
            ),
        )
    )
    return per_rows.unionByName(merged)
