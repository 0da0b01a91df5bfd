"""Relational operator library (SURVEY.md §2.2/2.4/2.5/2.7).

Each operator is a pure DataFrame→DataFrame function built from Catalyst
expressions — single-pass where the reference made multiple passes, and
distributed where the reference collected to the driver:

- ``null_census``         — per-column null counts in ONE scan
                            (reference: ``eda/eda_analysis.py:35-39``).
- ``describe_stats``      — count/mean/stddev/min/max per numeric column,
                            one scan + unpivot (reference: ``.describe()``,
                            ``eda/eda_analysis.py:48``).
- ``grouped_percentiles`` — exact percentiles per group (reference used
                            driver-side ``approxQuantile``,
                            ``eda/eda_analysis.py:52``; exact form is
                            oracle-comparable and still distributed).
- ``class_weights``       — w_k = total/(K·n_k) computed fully distributed
                            (reference collects counts to the driver,
                            ``ml/train_model.py:150-175`` — a pattern that
                            dies at scale; here it is a tiny agg + window +
                            broadcast join back).
- ``global_row_number``   — deterministic global dense ids WITHOUT the
                            single-task ``Window.orderBy`` hazard
                            (reference: ``eda/merge_datasets.py:65-69``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def null_census(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row; one column per input column holding its null count.

    Single scan, map-side partial aggregation — at 100 TB this is a pure
    scan+combine with no shuffle beyond the final 1-row reduce.
    """
    cols = cols or df.columns
    return df.select(
        [F.sum(F.col(c).isNull().cast("int")).cast("long").alias(c) for c in cols]
    )


def describe_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format describe: (col_name, n, mean, std, min, max) per numeric col.

    One aggregation pass over all columns, then a driver-free unpivot via
    ``stack`` — unlike ``DataFrame.describe`` this has a stable typed schema
    (doubles, not strings) so it can be hash-compared to an oracle.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("double").alias(f"__n_{c}"),
            F.avg(F.col(c)).alias(f"__mean_{c}"),
            F.stddev_samp(F.col(c)).alias(f"__std_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__n_{c}`, `__mean_{c}`, `__std_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n, mean, std, min, max)"
    )


def grouped_percentiles(
    df: DataFrame, group_col: str, value_col: str, probs: list[float]
) -> DataFrame:
    """Exact linear-interpolated percentiles per group (= SQL quantile_cont).

    Uses the built-in ``percentile`` aggregate (JVM-side). Exact percentile
    holds per-group values in memory on the reducer: fine for bounded-
    cardinality value domains / groups; for unbounded 100 TB columns switch
    to ``percentile_approx`` (Greenwald-Khanna, mergeable sketches).
    """
    pcts = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    out = df.groupBy(group_col).agg(pcts.alias("__p"))
    sel = [F.col(group_col)] + [
        F.col("__p")[i].alias(f"p{int(p * 100):02d}") for i, p in enumerate(probs)
    ]
    return out.select(*sel)


# Routing-bounds sampling modulus: the percentile-bounds passes below
# sketch only rows whose deterministic hash lands on residue 0, cutting
# the Greenwald-Khanna insert cost (the dominant CPU of the bounds pass —
# round-10 measurement: acc-1000 sketching the full 14.5M-row Theil-Sen
# slope stream cost ~an order of magnitude more than a plain count agg
# over the same rows) by ~the modulus. Bounds affect ROUTING ONLY — the
# selection/prefix math downstream is exact against real ranks — so a
# sampled sketch changes balance at most, never values. Groups too small
# (or too duplicate-heavy) to land a sampled row fall back to ONE bucket
# via the null-safe left join + `_bounds_bucket`-on-NULL-bounds path —
# the same single-bucket routing a constant-valued group already gets
# from duplicate percentile bounds today.
BOUNDS_SAMPLE_MOD = 16


def _bounds_sample(df: DataFrame, cols: list[str]) -> DataFrame:
    """The deterministic 1/``BOUNDS_SAMPLE_MOD`` routing-bounds sample:
    ``xxhash64`` over the routing-relevant columns, so retries and both
    engines draw the identical sample (never ``rand()`` — SPARK-38388)."""
    h = F.xxhash64(*[F.col(c) for c in cols])
    return df.filter(F.pmod(h, F.lit(BOUNDS_SAMPLE_MOD)) == 0)


def _bounds_bucket(value_col: str, n_buckets: int) -> Column:
    """Bucket index 0..n_buckets-1 by BINARY SEARCH over a sorted
    ``__bnds`` percentile-bounds array column (log2 comparisons per row
    instead of a linear n_buckets-1 fold — at 14.5M rows x 31 bounds the
    linear fold alone cost ~5 s). With duplicate bounds the search may
    land in a different (empty-ranged) bucket than a linear count would —
    harmless wherever the SAME expression routes every pass, which is the
    contract for grouped_exact_median and grouped_cumsum below.
    ``n_buckets`` must be a power of two (validated by callers)."""
    steps, acc = [], n_buckets
    while acc > 1:
        acc //= 2
        steps.append(acc)
    idx = F.lit(0)
    for step in steps:
        probe = F.element_at("__bnds", (idx + F.lit(step)).cast("int"))
        idx = idx + F.when(F.col(value_col) > probe, F.lit(step)).otherwise(
            F.lit(0)
        )
    return idx


def grouped_exact_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 32,
    checkpoint_input: bool = False,
    spread: bool = True,
    bounds_src: DataFrame | None = None,
) -> DataFrame:
    """Exact per-group median of a numeric column WITHOUT a per-group
    single-task sort — the scale path for low-cardinality groups over
    many values (e.g. Theil-Sen's ~3M pairwise slopes per priority,
    where ``row_number().over(partitionBy(group).orderBy(value))``
    funnels each group through one task).

    Single-shuffle bucketed order-statistic selection (round-11 fusion;
    previously the counts pass and the candidates pass each re-executed
    the input lineage — 3 passes over the value space counting bounds):

    1. ``percentile_approx`` bounds per group split values into
       ``n_buckets`` rank ranges (the approximation affects ROUTING
       only, never the result).
    2. The bucketed rows are hash-exchanged ONCE on (group, bucket).
       The count-per-(group, bucket) aggregate and the candidate-bucket
       sort BOTH require exactly that distribution, so they ride the
       same materialized exchange (AQE stage reuse) — the input lineage
       executes once, the counts come for free off the shuffle files,
       and only the bucket(s) holding the two middle order statistics
       (located by a tiny |groups·buckets|-row cumulative window) are
       sorted, bucket-locally, with exact global ranks picked via
       bucket-offset + local row_number.

    The even-n median is the explicit mean of the two middle values —
    engine-portable, unlike interpolated ``quantile_cont`` whose
    ``lo + p·(hi−lo)`` can differ from ``(lo+hi)/2`` in the last ulp.

    Contract: ``value_col`` must be non-null AND non-NaN (drop both
    upstream — NULL has no rank position and engines disagree on NULL
    sort order; NaN routes to bucket 0 in ``_bounds_bucket`` while
    ``orderBy`` sorts it LAST, so a NaN silently shifts the global rank
    of every later bucket and selects the wrong order statistic —
    round-8 advice). Returns ``group_col, n (BIGINT), median (double)``.

    ``bounds_src``: optional cheap routing-only proxy frame carrying the
    same ``(group_col, value_col)`` columns. When given, the percentile
    bounds are sketched over it AS-IS (no further sampling) instead of
    over a 1/``BOUNDS_SAMPLE_MOD`` hash sample of ``df`` — the caller's
    escape hatch when ``df`` is an expensive fan-out whose inputs can be
    subsampled BEFORE the fan-out (Theil-Sen samples days, making the
    bounds join ~mod² cheaper than filtering fanned-out pairs). Bounds
    affect routing only, so any distribution-shaped proxy is correct; a
    group absent from the proxy routes whole into bucket 0 (exact,
    single-window) via the null-safe LEFT join.
    """
    from .partitioning import checkpoint_for_reuse, repartition_for_compute

    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(
            f"n_buckets must be a power of two >= 2 (binary-search bucket "
            f"assignment), got {n_buckets}"
        )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # spread first: the value frame often arrives in 1-5 partitions (e.g.
    # a broadcast-join fan-out keyed by the GROUP — 5 keys = 5 tasks),
    # which would single-task every pass. The input is NOT checkpointed
    # by default: the two reads (bounds sample, bucketed exchange)
    # recompute it, which for the typical cheap fan-out lineage
    # (Theil-Sen's pair join) costs ~1 s/pass — whereas PINNING it is
    # ~300 MB of unreplicated storage at day-grain (scale-INVARIANT, so
    # it hits sf0.01 driver sessions at 1 GiB heap just as hard as
    # sf0.1; the round-7 fuzz OOMed exactly there). Callers with an
    # expensive lineage pass checkpoint_input=True (or bounds_src).
    # ``spread=False`` lets a caller that ALREADY spread its input (e.g.
    # Theil-Sen repartitions the pair-join probe side) skip the
    # repartition_for_compute partition probe: under AQE, ``df.rdd``
    # finalizes the adaptive plan, which MATERIALIZES every broadcast/
    # shuffle stage in the input lineage — a whole extra action per call
    # just to learn the partition count (round-10 job-trace: the probe
    # alone re-built the pair join's broadcast and ran its exchange map
    # stage). The guard itself stays the default for un-spread inputs.
    src = df.select(group_col, value_col)
    if spread:
        src = repartition_for_compute(src)
    if checkpoint_input:
        src = checkpoint_for_reuse(src)
    # Bounds are LAZY since the round-11 fusion: they feed exactly ONE
    # subtree (the bucketing below the shared exchange), whose broadcast
    # materializes once per action and is reused across task retries, so
    # every row of every consumer routes with identical bounds without
    # an eager pin (the pre-fusion shape needed a checkpoint because two
    # separately-planned passes each re-derived the arrival-order-
    # dependent sketch). Sketched over the deterministic hash SAMPLE
    # (round-10): routing-only, see BOUNDS_SAMPLE_MOD; the LEFT join
    # below keeps unsampled groups (bucket 0 — exact, single-window).
    bsrc = (
        bounds_src.select(group_col, value_col)
        if bounds_src is not None
        else _bounds_sample(src, [group_col, value_col])
    )
    bounds = bsrc.groupBy(group_col).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probs]), 1_000
        ).alias("__bnds")
    )
    bucketed = src.join(F.broadcast(bounds), group_col, "left").select(
        group_col,
        value_col,
        _bounds_bucket(value_col, n_buckets).alias("__bkt"),
    )
    # ONE full-data exchange, shared: both the counts aggregate and the
    # candidate window need hash(group, bucket) distribution, so they
    # consume this exchange's shuffle files directly (no second shuffle,
    # no lineage re-execution — AQE materializes the stage once).
    shuffled = bucketed.repartition(group_col, "__bkt")
    # count(value), NOT count(1): identical under the non-null contract,
    # but it keeps value_col in the counts subtree's projection — column
    # pruning would otherwise narrow this side below the exchange to
    # (group, bucket), the two exchange subtrees would no longer
    # canonicalize equal, and AQE's stage cache would run the full-data
    # shuffle TWICE instead of reusing it (measured: no ReusedExchange,
    # duplicated REPARTITION_BY_COL subtrees).
    counts = shuffled.groupBy(group_col, "__bkt").agg(
        F.count(F.col(value_col)).cast("long").alias("__c")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy(group_col)
    info = counts.select(
        group_col,
        "__bkt",
        "__c",
        F.coalesce(F.sum("__c").over(wb), F.lit(0).cast("long")).alias(
            "__off"
        ),
        F.sum("__c").over(wn).cast("long").alias("__n"),
    )
    k1 = F.expr("(__n + 1) DIV 2")
    k2 = F.expr("(__n + 2) DIV 2")
    in_bucket = lambda k: (k > F.col("__off")) & (
        k <= F.col("__off") + F.col("__c")
    )
    sel = info.filter(in_bucket(k1) | in_bucket(k2)).select(
        group_col, "__bkt", "__off", "__n"
    )
    wl = Window.partitionBy(group_col, "__bkt").orderBy(value_col)
    ranked = shuffled.join(F.broadcast(sel), [group_col, "__bkt"]).withColumn(
        "__rank", F.row_number().over(wl).cast("long") + F.col("__off")
    )
    mid = ranked.filter(
        (F.col("__rank") == k1) | (F.col("__rank") == k2)
    )
    return mid.groupBy(group_col).agg(
        F.max("__n").alias("n"),
        F.avg(value_col).alias("median"),
    )


def class_weights(df: DataFrame, label_col: str, num_classes: int = 2) -> DataFrame:
    """Balanced class weights w_k = total / (K * n_k), fully distributed.

    Returns the input with an extra ``class_weight`` column. The per-class
    count table is tiny (K rows): total is computed with an unpartitioned
    window over it (K rows through one task — trivially safe) and the map
    back onto the data is a broadcast join, so nothing ever collects to the
    driver regardless of data size.
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__n_k"))
    w = Window.partitionBy()
    weights = counts.withColumn(
        "class_weight",
        F.sum("__n_k").over(w).cast("double") / (F.lit(num_classes) * F.col("__n_k")),
    ).drop("__n_k")
    return df.join(F.broadcast(weights), on=label_col, how="left")


def global_row_number(
    df: DataFrame, order_cols: list[str], id_col: str = "id"
) -> DataFrame:
    """Dense 1..N ids in a deterministic total order, scalably.

    The naive ``row_number().over(Window.orderBy(...))`` funnels every row
    through ONE task. Here: range-repartition on the order keys (so the
    partition index itself follows the global order), number rows within
    each partition in parallel, then add per-partition offsets computed
    from a tiny (num_partitions-row) aggregate via broadcast join.

    Requires ``order_cols`` to be a unique key for a fully deterministic
    assignment (same contract as the reference's 7-column sort,
    ``eda/merge_datasets.py:65-69``).

    Tradeoff of the eager ``localCheckpoint`` below: it runs a full job at
    DataFrame-construction time (laziness is lost), pins the data
    UNREPLICATED on executors (an executor loss mid-pipeline fails the
    query unrecoverably — acceptable for the short window between
    checkpoint and consumption; rerun on failure), and downstream
    ``explain``/plan-metrics see only the post-checkpoint plan fragment.
    The alternative — deriving bucket ids from value-based range bounds
    (percentile sampling) instead of ``spark_partition_id`` — would stay
    lazy and AQE-stable; adopt it if executor loss during numbering ever
    becomes a real operational concern.
    """
    order_exprs = [F.col(c) for c in order_cols]
    parted = df.repartitionByRange(*order_exprs).sortWithinPartitions(*order_exprs)
    # monotonically_increasing_id = (partition_id << 33) | record_number:
    # its low 33 bits ARE the 0-based within-partition position in sorted
    # order, so no Window.partitionBy(__pid) is needed — which matters
    # because that window would force a SECOND full-data exchange
    # (hashpartitioning(__pid)) right after the range exchange, reshuffling
    # data the range partitioner already co-located. Caps partitions at
    # 2^33 rows (the same practical bound as row_number's int).
    # Eagerly pin the ranged partitioning BEFORE branching: the sizes
    # aggregate below re-reads this same materialized RDD, so __pid means
    # the same partition in both branches. Without the pin, AQE may
    # coalesce the tiny aggregate branch's read of the range shuffle
    # differently from the main branch — the two branches then disagree
    # on partition ids and the inner join on __pid silently drops rows.
    local = (
        parted.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.partitionBy().orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__offset")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (
                F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
                + F.col("__offset")
                + 1
            ).cast("long"),
        )
        .drop("__pid", "__mid", "__offset")
    )


def global_ntile(
    df: DataFrame,
    order_by: list[Column],
    n_tiles: int,
    out_col: str = "tile",
) -> DataFrame:
    """``ntile(n)`` over a global deterministic order WITHOUT the
    single-task ``Window.orderBy`` hazard.

    The naive ``ntile(n).over(Window.orderBy(...))`` plans an
    ``Exchange SinglePartition`` and sorts every row in one task — at
    entity grain on a real warehouse that is billions of rows through
    one core. Here: range-repartition on the order expressions (the
    partition index then follows the global order), number rows within
    each partition in parallel via ``monotonically_increasing_id``'s
    low 33 bits, broadcast-join per-partition offsets plus the global
    row count from one tiny (num_partitions-row) aggregate, and map the
    1-based global position to its tile with ntile's exact quota
    arithmetic: with N rows the first ``N % n`` tiles hold
    ``N div n + 1`` rows, the rest ``N div n`` — bit-identical to the
    window form for any N.

    ``order_by`` may carry ``.desc()`` / ``.asc()`` sort orders and must
    form a unique key (same determinism contract as
    :func:`global_row_number`). The eager ``localCheckpoint`` pins the
    ranged layout before the sizes branch re-reads it — the same
    AQE-branch-consistency requirement documented in
    :func:`global_row_number`.
    """
    parted = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    local = (
        parted.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.partitionBy().orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        sizes.withColumn(
            "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        )
        .withColumn("__n", F.sum("__cnt").over(Window.partitionBy()))
        .select("__pid", "__offset", "__n")
    )
    k = int(n_tiles)
    # __rn ∈ [1, N]; quota split: big = __n DIV k + 1 rows for the first
    # __n % k tiles, small = __n DIV k for the rest. All-integer — no
    # doubles anywhere, so the assignment is exact at any N.
    tile_expr = F.expr(
        f"CAST(IF(__rn <= (__n % {k}) * (__n DIV {k} + 1), "
        f"(__rn - 1) DIV (__n DIV {k} + 1) + 1, "
        f"(__n % {k}) + (__rn - (__n % {k}) * (__n DIV {k} + 1) - 1) "
        f"DIV (__n DIV {k}) + 1) AS INT)"
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "__rn",
            (
                F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
                + F.col("__offset")
                + 1
            ).cast("long"),
        )
        .withColumn(out_col, tile_expr)
        .drop("__pid", "__mid", "__offset", "__n", "__rn")
    )


def grouped_cumsum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_buckets: int = 32,
    checkpoint_input: bool = False,
) -> DataFrame:
    """INCLUSIVE running per-group sum of ``value_col`` in ``order_col``
    order WITHOUT the per-group single-task window — the grouped sibling
    of :func:`global_cumsum`'s numeric branch, for LOW-cardinality groups
    over HIGH-cardinality numeric order keys (e.g. Spearman's per-flag
    price-rank prefix: ``Window.partitionBy(flag)`` funnels ~20M
    value-grain rows through 3 tasks).

    Mechanics: per-group ``percentile_approx`` bounds split the order
    key into ``n_buckets`` ordered ranges (binary-search assignment —
    the bounds affect ROUTING only); the prefix window partitions by
    (group, bucket), so its own hashpartitioning exchange is the ONLY
    full-data shuffle and every bucket prefix-sums in parallel; each
    bucket's exclusive offset (sum of earlier buckets' totals within the
    group) comes from a |groups·buckets|-row window broadcast back. A
    first-cut design used repartitionByRange + partition-id offsets
    instead and was 2x SLOWER than the naive window at the 100x smoke:
    the range sampler re-executes the (unmaterialized) input for
    sampling, and the window's hash exchange re-shuffled what the range
    exchange had just placed.

    Contract: ``(group_col, order_col)`` must be jointly non-null,
    non-NaN and unique (value-grain frames satisfy this by
    construction) — with ties the ROWS-frame prefix inside a bucket
    would be order-dependent, and a NaN order key routes to bucket 0 in
    ``_bounds_bucket`` (NaN > probe is false) while ``orderBy`` sorts
    NaN LAST, shifting every later row's prefix by one (round-8
    advice). ``order_col`` must be numeric (percentile bounds).

    The input is NOT checkpointed by default — same reasoning as
    :func:`grouped_exact_median` (round-8 advice: the Spearman caller
    feeds a ~20M-row-per-flag price grain, a scale-DEPENDENT block whose
    unconditional pin is exactly the pattern that OOMed the 1 GiB fuzz
    sessions); the two reads (bounds sample, bucketed exchange)
    recompute the lineage instead. Callers with an expensive input
    lineage pass ``checkpoint_input=True``.
    """
    from .partitioning import checkpoint_for_reuse

    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(
            f"n_buckets must be a power of two >= 2 (binary-search bucket "
            f"assignment), got {n_buckets}"
        )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    src = checkpoint_for_reuse(df) if checkpoint_input else df
    # bounds LAZY since the round-11 fusion (same reasoning as
    # grouped_exact_median: one consuming subtree below one shared
    # exchange, broadcast materialized once per action — identical
    # routing for every consumer without an eager pin). Sketched over
    # the deterministic hash sample (routing-only, see
    # BOUNDS_SAMPLE_MOD); LEFT join keeps unsampled groups (bucket 0).
    bounds = (
        _bounds_sample(src, [group_col, order_col])
        .groupBy(group_col)
        .agg(
            F.percentile_approx(
                order_col, F.array(*[F.lit(p) for p in probs]), 1_000
            ).alias("__bnds")
        )
    )
    # __bnds dropped right after bucketing: the 31-double bounds array
    # must not ride the full-data window shuffle (the final select used
    # to drop it, relying on column pruning; the explicit projection
    # makes the exchanged row exactly input-width + one int).
    #
    # NOTE on the round-11 single-shuffle fusion: grouped_exact_median
    # and global_cumsum share their one (group, bucket) exchange between
    # the counts/sizes aggregate and the window via AQE stage reuse —
    # possible there because both consumers project the IDENTICAL
    # narrow column set below the exchange. Here the window side must
    # carry every caller payload column (the operator returns all input
    # columns) while the sizes side prunes to (group, order, value), so
    # the two exchange subtrees can never canonicalize equal and a
    # "shared" repartition would really run the full-data shuffle twice
    # (measured on the median before its count(value) fix). The sizes
    # pass therefore stays a map-side partial aggregate over the
    # un-shuffled lineage (tiny exchange of partial rows), and the
    # window keeps its own single full-data exchange — same two-read
    # shape as round 10, minus the eager bounds action.
    bucketed = (
        src.join(F.broadcast(bounds), group_col, "left")
        .withColumn("__bkt", _bounds_bucket(order_col, n_buckets))
        .drop("__bnds")
    )
    sizes = bucketed.groupBy(group_col, "__bkt").agg(
        F.sum(value_col).alias("__tot")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.withColumn(
        "__goff", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select(group_col, "__bkt", "__goff")
    w_local = (
        Window.partitionBy(group_col, "__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.withColumn("__loc", F.sum(value_col).over(w_local))
        .join(F.broadcast(offsets), [group_col, "__bkt"])
        .withColumn(out_col, F.col("__loc") + F.col("__goff"))
        .drop("__bkt", "__loc", "__goff")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
) -> DataFrame:
    """INCLUSIVE running sum of ``value_col`` in a deterministic total
    order, scalably: bucket the order key into ordered ranges, prefix-sum
    inside each bucket in parallel, then add each bucket's exclusive
    offset (the sum of all earlier buckets' totals) via a tiny broadcast
    join. Feeds sequence packing / byte-offset layout jobs where a
    one-task ``Window.orderBy`` running sum would serialize the corpus.

    With a single numeric order key (the common case) the buckets come
    from an ``approx_percentile`` pass, so the prefix window's own
    exchange is the ONLY full-data shuffle; otherwise falls back to
    ``repartitionByRange`` + partition-id buckets (two narrow shuffles).
    Order keys must be non-null and jointly unique."""
    from pyspark.sql import types as T

    order_exprs = [F.col(c) for c in order_cols]
    numeric_key = len(order_cols) == 1 and isinstance(
        df.schema[order_cols[0]].dataType, T.NumericType
    )
    if numeric_key:
        # Single order key: bucket on percentile boundaries so ONE
        # hashpartitioning(__bkt) exchange is the only full-data
        # shuffle — shared by the prefix window AND the sizes aggregate
        # below (both need clustering on __bkt; AQE stage reuse,
        # round-11 fusion: previously sizes re-read the input lineage
        # separately AND the bounds came from a blocking ``.first()``
        # driver action — now they ride in lazily as a broadcast 1-row
        # frame, one fewer serial job per call). repartitionByRange +
        # Window.partitionBy(pid) would shuffle everything twice — the
        # window's required distribution can't see that the range
        # partitioner already co-located the rows. Boundary quality
        # only affects balance, never values.
        key = order_cols[0]
        n_bkt = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        # round UP to a power of two for the binary-search bucket
        # assignment (log2 comparisons/row vs the linear fold this
        # replaced), capped so the probs array stays sketch-sized:
        # past ~4k probs an accuracy-1000 GK sketch emits mostly
        # duplicate bounds anyway (routing-only, balance unaffected
        # by the cap in practice)
        n_bkt = max(int(n_bkt), 2)
        p2 = 2
        while p2 < n_bkt and p2 < 4096:
            p2 *= 2
        n_bkt = p2
        qs = [i / n_bkt for i in range(1, n_bkt)]
        # bounds sketched over the deterministic hash sample (routing-
        # only, see BOUNDS_SAMPLE_MOD); an empty sample yields a NULL
        # bounds array -> element_at probes are NULL -> every row lands
        # in bucket 0, which is exact (single prefix window)
        bounds = _bounds_sample(df, [key]).select(
            F.sort_array(
                F.percentile_approx(F.col(key).cast("double"), qs, 1000)
            ).alias("__bnds")
        )
        bucketed = (
            df.withColumn("__key_d", F.col(key).cast("double"))
            .crossJoin(F.broadcast(bounds))
            .withColumn("__bkt", _bounds_bucket("__key_d", n_bkt))
            .drop("__key_d", "__bnds")
        )
        shuffled = bucketed.repartition("__bkt")
        w_local = (
            Window.partitionBy("__bkt")
            .orderBy(*order_exprs)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = shuffled.withColumn(
            "__local_sum", F.sum(value_col).over(w_local)
        )
        part_key = "__bkt"
    else:
        parted = df.repartitionByRange(*order_exprs).sortWithinPartitions(
            *order_exprs
        )
        # Same branch-consistency pin as global_row_number: __bkt is a
        # runtime partition id, so materialize before the sizes branch
        # re-reads it (AQE must not re-coalesce the two reads differently).
        with_pid = parted.withColumn(
            "__bkt", F.spark_partition_id()
        ).localCheckpoint(eager=True)
        w_local = (
            Window.partitionBy("__bkt")
            .orderBy(*order_exprs)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        local = with_pid.withColumn("__local_sum", F.sum(value_col).over(w_local))
        part_key = "__bkt"
    # sum(when(order IS NOT NULL, value)), not plain sum(value):
    # identical under the non-null order-key contract, but it keeps the
    # order key referenced INSIDE the used aggregate (an unused extra
    # aggregate would just be pruned away), so that — for the narrow
    # (order, value) frames every current caller passes — the sizes
    # subtree below the numeric branch's repartition exchange
    # canonicalizes EQUAL to the window subtree and AQE reuses the one
    # materialized shuffle instead of running a second (pruned)
    # full-data exchange. Callers with extra payload columns should
    # project before calling: the window side must carry every input
    # column, so a wider frame breaks the canonical match and
    # duplicates the shuffle.
    sizes = local.groupBy(part_key).agg(
        F.sum(
            F.when(F.col(order_cols[0]).isNotNull(), F.col(value_col))
        ).alias("__tot")
    )
    w_off = Window.partitionBy().orderBy(part_key).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.withColumn(
        "__offset", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select(part_key, "__offset")
    return (
        local.join(F.broadcast(offsets), part_key)
        .withColumn(out_col, (F.col("__local_sum") + F.col("__offset")).cast("long"))
        .drop(part_key, "__local_sum", "__offset")
    )


def weighted_percentiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    pct_points: list[int],
    out_value: str = "value",
) -> DataFrame:
    """Weighted lower quantiles: for each integer percent ``k`` in
    ``pct_points``, the smallest value whose cumulative weight reaches
    ``k``% of the total weight — e.g. "the price below which 50% of
    shipped QUANTITY falls", the weighted median every BI layer wants
    and Spark has no operator for.

    Contract: ``weight_col`` must be non-negative INTEGERS (pre-scale
    fixed decimals to cents/hundredths) — thresholds then compare in
    exact arithmetic (``cumw * 100 >= k * total`` in decimal(38,0), so
    the ×100 can't overflow a long at 100 TB weight totals), and two
    engines can never disagree on a boundary the way a float
    ``p * total`` could. ``pct_points`` must be integers in 1..100
    (validated). Null values/weights are dropped (SQL aggregate
    semantics). Bound: the running weight itself accumulates in BIGINT,
    so sum(weight) must stay below 2^63 (~9.2e18 — a quintillion cents).

    Scale: the input reduces to distinct-value grain first (one
    map-side-combined agg); the running weight comes from
    :func:`global_cumsum` (range-bucketed prefix sums — never a
    single-task ``Window.orderBy``); the per-percentile pick is a
    broadcast of |pct_points| literals + one min-agg. One full-data
    shuffle total.
    """
    try:
        bad = [
            k
            for k in pct_points
            # bool first: True == int(True) == 1 would pass the range check
            # and silently compute the 1st percentile (round-6 advice)
            if isinstance(k, bool) or k != int(k) or not (1 <= int(k) <= 100)
        ]
    except (TypeError, ValueError):
        raise ValueError(f"pct_points must be integers in 1..100, got {pct_points!r}")
    if bad:
        # pct=0 would silently yield the min value, pct>100 no row at all,
        # and a fractional pct would silently truncate to a DIFFERENT
        # percentile — none is what the caller asked for; fail loudly
        raise ValueError(f"pct_points must be integers in 1..100, got {bad}")
    # eager checkpoint: the reduced frame feeds global_cumsum (data +
    # its bucket-boundary probe) AND the total — without it the source
    # aggregation executes three times. O(|distinct values|) rows.
    g = (
        df.filter(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())
        .groupBy(value_col)
        .agg(F.sum(weight_col).cast("long").alias("__w"))
        .localCheckpoint(eager=True)
    )
    c = global_cumsum(g, [value_col], "__w", out_col="__cumw")
    tot = g.agg(F.sum("__w").alias("__tot"))
    ks = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(int(k)) for k in pct_points])
            ).alias("pct")
        )
    )
    # threshold compare in decimal(38,0): long arithmetic would overflow
    # silently past sum(weight) ~9.2e16 cents and flip the comparison at
    # exactly the 100 TB scale this operator is for (r5 advice). DECIMAL
    # keeps the compare exact to 1e38 and DuckDB's HUGEINT oracle agrees.
    dec = "decimal(38,0)"
    return (
        c.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ks))
        .filter(
            F.col("__cumw").cast(dec) * 100
            >= F.col("pct").cast(dec) * F.col("__tot").cast(dec)
        )
        .groupBy("pct")
        .agg(F.min(value_col).alias(out_value))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: manual salting for when one join key is hot.

    The big side gets a uniform random salt in [0, salt_buckets); the small
    side is replicated once per salt value; the join runs on
    ``on + [salt]`` so a hot key's rows spread across ``salt_buckets``
    reducers instead of one straggler task. Results are identical to the
    plain join — salting only changes physical placement.

    AQE's skew-join split handles most skew automatically; reach for this
    when skew is known ahead of time (a null-heavy foreign key, a
    power-law entity) or when AQE is unavailable (streaming joins).
    """
    salted_big = big.withColumn(
        "__salt", F.floor(F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt_arr", F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).withColumn("__salt", F.explode("__salt_arr")).drop("__salt_arr")
    return salted_big.join(salted_small, on=[*on, "__salt"], how=how).drop("__salt")


def observed(
    df: DataFrame, name: str, metric_cols: dict[str, Column]
) -> tuple[DataFrame, "Observation"]:
    """Attach accumulator-style data-quality metrics to a plan via
    ``DataFrame.observe`` — metrics are collected DURING the action that
    consumes ``df`` (zero extra scans, zero extra jobs), unlike a separate
    ``count()``/``agg()`` which re-reads the input.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER an action has run. The production use is
    row-count / null-count / domain-violation counters piggybacked on every
    pipeline write at 100 TB, where a second validation pass is unaffordable.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    exprs = [expr.alias(alias) for alias, expr in metric_cols.items()]
    return df.observe(obs, *exprs), obs


def quality_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """(check, n_rows, n_violations, violation_rate) — one-pass data-quality
    expectation census: every check is a boolean Column that should hold
    per row; violations are conditional sums inside a SINGLE aggregation
    (one scan however many rules), then stack()-unpivoted to long form.
    The 100 TB version of an expectations suite: no per-rule passes, no
    driver-side row iteration.
    """
    from ..functions.rounding import portable_round

    aggs = [
        F.sum((~c).cast("long")).alias(f"__v{i}")
        for i, (name, c) in enumerate(checks.items())
    ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    # SQL-escape rule names ('' doubling) — a quote in a caller-supplied
    # name must not break (or inject into) the stack() expression
    pairs = ", ".join(
        "'{}', __v{}".format(name.replace("'", "''"), i)
        for i, name in enumerate(checks)
    )
    return row.select(
        F.col("__n").alias("n_rows"),
        F.expr(f"stack({len(checks)}, {pairs}) AS (rule, n_violations)"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        portable_round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    )


def conformance_report(
    df: DataFrame,
    checks: dict[str, Column] | None = None,
    unique: dict[str, list[str]] | None = None,
    fks: dict[str, tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """:func:`quality_checks` plus the two Deequ-style rule classes a
    single-pass predicate census cannot express:

    - **key uniqueness** (``unique``: rule → key columns): violations =
      non-NULL-keyed rows minus distinct keys — one hash shuffle on the
      key with map-side partial aggregation, the same exchange a later
      dedup would pay anyway. NULL-keyed rows are a completeness
      concern, not a uniqueness one (pair with an ``isNotNull`` check).
    - **referential integrity** (``fks``: rule → (child key cols,
      parent frame, parent key cols)): violations = non-NULL-keyed
      child rows with no parent — a LEFT ANTI join that Catalyst
      broadcasts when the parent key set is small and shuffles
      otherwise; NULL child keys are not violations (SQL FK
      semantics).

    Same (rule, n_rows, n_violations, violation_rate) contract as
    :func:`quality_checks`; ``n_rows`` is always the FULL table count,
    so rates are comparable across rule classes. Each unique/fk rule is
    its own scan of the key columns only (column-pruned); the predicate
    rules still share one scan.
    """
    from ..functions.rounding import portable_round

    parts: list[DataFrame] = []
    if checks:
        parts.append(quality_checks(df, checks))
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    for name, cols in (unique or {}).items():
        nn = df
        for c in cols:
            nn = nn.filter(F.col(c).isNotNull())
        viol = nn.agg(
            (F.count(F.lit(1)) - F.count_distinct(*cols)).alias(
                "n_violations"
            )
        )
        parts.append(
            viol.crossJoin(F.broadcast(total)).select(
                F.lit(name).alias("rule"),
                "n_rows",
                "n_violations",
                portable_round(
                    F.col("n_violations") / F.col("n_rows"), 6
                ).alias("violation_rate"),
            )
        )
    for name, (ccols, parent, pcols) in (fks or {}).items():
        child = df.select(*ccols)
        for c in ccols:
            child = child.filter(F.col(c).isNotNull())
        pkeys = parent.select(
            *[F.col(p).alias(c) for c, p in zip(ccols, pcols)]
        )
        viol = child.join(pkeys, on=list(ccols), how="left_anti").agg(
            F.count(F.lit(1)).alias("n_violations")
        )
        parts.append(
            viol.crossJoin(F.broadcast(total)).select(
                F.lit(name).alias("rule"),
                "n_rows",
                "n_violations",
                portable_round(
                    F.col("n_violations") / F.col("n_rows"), 6
                ).alias("violation_rate"),
            )
        )
    if not parts:
        raise ValueError(
            "conformance_report needs at least one rule: pass checks=, "
            "unique=, or fks="
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
