"""Mergeable frequency sketches as plain DataFrames: count-min.

A count-min sketch is a depth×width counter grid; every key increments
one bucket per hash row, and a key's estimate is the MIN of its buckets
(always ≥ the true count — collisions only inflate). Expressed as a
DataFrame aggregation the grid is a (seed, bucket, cnt) table of d·w
rows: the build is ONE map-side-combined groupBy over a depth-way
map-side fan-out (no shuffle grows with key cardinality — the shuffle
carries at most d·w·partitions partial rows), and the result is tiny,
mergeable (union + re-sum) and broadcastable. That is the 100 TB point:
frequency estimation over an unbounded key domain in O(d·w) memory,
where an exact groupBy(key) would shuffle every distinct key.

Hashing is the portable md5-60bit family so a DuckDB oracle rebuilds the
identical grid (Spark's xxhash64 would never hash-match an oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_fns import md5_hash64
from ..operators.partitioning import checkpoint_for_reuse
from ..operators.generate import explode_fused
from ..operators.temporal import replay_guarded

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(key_col, seed_col, width: int):
    return F.pmod(
        md5_hash64(F.concat_ws("|", seed_col.cast("string"), key_col)),
        F.lit(width),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(seed, bucket, cnt) — the count-min grid for ``df[key_col]``.

    Map-side ×depth fan-out, then one combined aggregation into d·w rows.
    Grids over disjoint data merge by union + groupBy-sum (used by the
    streaming twin and by partition-parallel builds).
    """
    keyed = df.select(F.col(key_col).cast("string").alias("__key"))
    fanned = explode_fused(
        keyed,
        F.sequence(F.lit(0), F.lit(depth - 1)),
        "seed",
        keep=["__key"],
    )
    return (
        fanned.select(
            "seed", _bucket(F.col("__key"), F.col("seed"), width).alias("bucket")
        )
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est) — min-over-rows estimate for each candidate key.

    The grid is broadcast (d·w rows); candidates fan out ×depth map-side
    and never shuffle except the final per-key min. At corpus scale the
    candidate set comes from a sample or a prior round — the sketch's
    value is precisely that the FULL key domain never needs to be
    materialized.
    """
    fanned = explode_fused(
        keys.select(F.col(key_col).cast("string").alias("key")),
        F.sequence(F.lit(0), F.lit(depth - 1)),
        "seed",
        keep=["key"],
    ).select("key", "seed", _bucket(F.col("key"), F.col("seed"), width).alias("bucket"))
    return (
        fanned.join(F.broadcast(cms), ["seed", "bucket"], "left_outer")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est, exact) — top-``k`` keys by count-min estimate, with the
    exact count alongside (est ≥ exact always; equality when the key's
    buckets are collision-free). Top-k is orderBy+limit (TakeOrdered), so
    no global sort. The exact column exists to make the overestimate
    bound oracle-checkable; production callers at unbounded cardinality
    drop it and feed candidates from a sample instead of ``distinct()``.
    """
    cms = cms_build(df, key_col, depth, width)
    cands = df.select(F.col(key_col).cast("string").alias("key")).distinct()
    est = cms_estimate(cms, cands, "key", depth, width)
    exact = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.join(exact, "key")
        .orderBy(F.desc("est"), "key")
        .limit(k)
        .select("key", F.col("est").cast("long").alias("est"),
                F.col("exact").cast("long").alias("exact"))
    )


class CmsAccumulator:
    """Streaming count-min state: a bounded d×w counter dict fed by
    DISTRIBUTED per-batch grids (``cms_build`` runs on the cluster; only
    the d·w aggregated rows reach the driver — bounded state is the whole
    point of a sketch, so this is not a driver-side-loop anti-pattern).
    Use with ``foreachBatch``: grids over disjoint batches merge by
    addition, so the accumulated grid after N batches is identical to
    ``cms_build`` over the union of all batches (test-asserted).

    Fixed-size by construction: state is ≤ depth·width cells regardless
    of key cardinality, so no ``max_keys`` cap is needed (unlike the
    per-group ``KmvAccumulator``, whose group axis must be capped).
    """

    def __init__(self, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
        self.depth, self.width = depth, width
        self.grid: dict[tuple[int, int], int] = {}

    def merge_batch(self, batch_df: DataFrame, key_col: str) -> None:
        for r in cms_build(batch_df, key_col, self.depth, self.width).collect():
            k = (r["seed"], r["bucket"])
            self.grid[k] = self.grid.get(k, 0) + r["cnt"]

    def foreach_batch(self, key_col: str):
        """A ``foreachBatch`` function maintaining this accumulator
        (replay-guarded — grid counts are additive, so a batch
        redelivered after a full apply would double-count)."""

        return replay_guarded(
            lambda batch_df, _bid: self.merge_batch(batch_df, key_col)
        )

    def estimate(self, key: str) -> int:
        """Driver-side point estimate — the same md5-60bit bucketing the
        distributed build uses, so estimates agree with ``cms_estimate``.
        Takes the key AS A STRING (same contract, and reason, as
        ``BloomAccumulator.might_contain``)."""
        import hashlib

        if not isinstance(key, str):
            raise TypeError(
                "estimate takes the key as a string — cast it the way "
                "the built key column was cast"
            )
        est = None
        for seed in range(self.depth):
            h = int(
                hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15], 16
            ) % self.width
            c = self.grid.get((seed, h), 0)
            est = c if est is None else min(est, c)
        return est or 0


# ------------------------------------------------------------------ bloom

BLOOM_WORDS = 1 << 10  # 1024 words × 32 bits = 32768-bit default filter
BLOOM_HASHES = 5


def _bloom_probes(df: DataFrame, key_col: str, n_words: int, k: int) -> DataFrame:
    """Fan each row out to its ``k`` probe positions: ``word_idx`` (which
    32-bit word of the bitmap holds the bit) and ``__mask`` (the bit
    inside it, always a non-negative long since bits run 0..31). The
    position family is the portable md5-60bit hash of ``"i|key"`` — the
    same seeding convention as the CMS ``_bucket`` — so a DuckDB oracle
    rebuilds the identical filter bit-for-bit. The depth fan-out is the
    same ``explode_fused`` shape ``cms_build`` uses."""
    m = n_words * 32
    probed = explode_fused(
        df, F.sequence(F.lit(0), F.lit(k - 1)), "__i", keep=None
    ).withColumn(
        "__p",
        F.pmod(
            md5_hash64(
                F.concat_ws("|", F.col("__i").cast("string"), F.col(key_col))
            ),
            F.lit(m),
        ),
    )
    return probed.select(
        "*",
        F.expr("__p div 32").cast("int").alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(__p % 32 AS INT))"
        ).alias("__mask"),
    ).drop("__i", "__p")


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """Distributed Bloom filter build: (word_idx int, word long) — the
    sparse non-zero words of an ``n_words × 32``-bit membership bitmap
    with ``k`` set bits per key.

    The classic ingest pre-screen at 100 TB: a corpus of fingerprints
    folds into a fixed-size bitmap (one map-side-combined ``bit_or``
    groupBy — the shuffle carries at most ``n_words × partitions``
    partial words, NOT the key stream), the bitmap broadcasts, and a
    delta batch discards its definite-new rows without ever joining the
    corpus. No false negatives ever; false-positive rate
    ≈ ``(1 - e^(-k·n/m))^k`` with ``m = 32·n_words`` bits — size
    ``n_words`` ≈ keys/3 for ~1% at k=5 (the bitmap is 4·n_words bytes;
    past broadcast size, shard the key space and build per-shard
    filters). Duplicate keys are free (OR is idempotent), so no
    distinct pass is spent. Mergeable: union two filters' word tables
    and re-``bit_or`` by word_idx.
    """
    # NULL keys never enter the filter: concat_ws silently DROPS a null
    # arg, so a null key would hash as the bare seed string — every null
    # sharing one fingerprint and (worse) aliasing any key whose rendering
    # equals "" (r5 advice). The probe side answers null keys definitively
    # below instead.
    return (
        _bloom_probes(
            df.select(F.col(key_col)).filter(F.col(key_col).isNotNull()),
            key_col,
            n_words,
            k,
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").cast("long").alias("word"))
    )


def bloom_contains(
    bloom: DataFrame,
    df: DataFrame,
    key_col: str,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_HASHES,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership probe: ``df`` plus a boolean ``out_col`` — true iff all
    ``k`` of the key's bits are set in the filter (so false means the
    key is DEFINITELY absent from the built corpus).

    Row-preserving: every input row comes back exactly once (an internal
    monotonic row tag keys the per-row reassembly, so duplicate rows —
    the normal shape of a raw ingest batch — are NOT collapsed). Pass a
    SLIM ``df`` (ids + key): the probe fan-out carries every column
    through a ``k``-way explode and the reassembly groups over all of
    them. The filter side joins broadcast up to 2²¹ words (≤ ~32 MB of
    (int, long) rows); a bigger filter — 10 B keys at 1% FP is ~12 GB —
    falls back to a plain join so Spark shuffles probes to the filter
    on ``word_idx`` instead of collecting it to the driver. Words
    absent from the sparse table are zero either way."""
    tagged = df.withColumn("__row", F.monotonically_increasing_id())
    probed = _bloom_probes(tagged, key_col, n_words, k)
    bloom_side = F.broadcast(bloom) if n_words <= (1 << 21) else bloom
    hit = (
        F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("__mask"))
        != F.lit(0)
    )
    # Null contract (r5 advice): bloom_build never admits null keys, so a
    # null-keyed probe is DEFINITELY absent — answer false instead of
    # letting concat_ws hash it as the bare seed (which would collide all
    # nulls onto one fingerprint and return true once anything aliasing
    # the empty rendering was built in).
    return (
        probed.join(bloom_side, "word_idx", "left")
        .groupBy("__row", *df.columns)
        .agg(F.bool_and(hit).alias("__hit"))
        .select(
            *df.columns,
            (F.col("__hit") & F.col(key_col).isNotNull()).alias(out_col),
        )
    )


def bloom_filter_expr(
    words: dict[int, int],
    key_col,
    n_words: int = BLOOM_WORDS,
    k: int = BLOOM_HASHES,
):
    """MAP-ONLY membership test against a DRIVER-KNOWN bloom word table:
    a boolean Column, true iff all ``k`` of the key's bits are set —
    same probe family (md5-60bit of ``"i|key"``) and therefore the same
    no-false-negative contract as :func:`bloom_contains`, but evaluated
    as a pure Catalyst expression (literal word array + ``element_at`` +
    bit tests), so the probed frame is NEVER exploded, joined, or
    re-grouped. This is the shape for prescreening a scan that must not
    shuffle — e.g. the crawl-frontier seen-set scan, where the filter is
    built from the (small) incoming batch and ridden down the (huge)
    corpus scan (round 9). ``bloom_contains`` stays the right call when
    the FILTER side is big and the probed side is small.

    ``words`` is the sparse {word_idx: word} table from a collected
    ``bloom_build`` (≤ ``n_words`` entries — 1024 longs by default, a
    literal a plan can carry comfortably; size caps apply as in
    ``bloom_build``'s docstring). NULL keys answer false (never built
    in, same contract as ``bloom_contains``).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    dense = [0] * n_words
    for i, w in words.items():
        dense[int(i)] = int(w)
    # ONE array Literal, not F.array(*1024 F.lits): CreateArray with
    # n_words children is a plan node per word and a codegen blow-up;
    # a list passed to F.lit is a single constant reference
    arr = F.lit(dense).cast("array<long>")
    # 1<<(p%32) via a 32-entry literal power table: F.shiftleft needs a
    # literal shift amount, and the SQL-string form can't bind an
    # anonymous expression
    pow2 = F.lit([1 << j for j in range(32)]).cast("array<long>")
    m = n_words * 32
    hit = None
    for i in range(k):
        p = F.pmod(
            md5_hash64(F.concat_ws("|", F.lit(str(i)), key)), F.lit(m)
        )
        word = F.element_at(arr, (p / 32).cast("int") + 1)
        mask = F.element_at(pow2, F.pmod(p, F.lit(32)).cast("int") + 1)
        c = word.bitwiseAND(mask) != 0
        hit = c if hit is None else (hit & c)
    return hit & key.isNotNull()


class BloomAccumulator:
    """Streaming Bloom state: the bounded word dict fed by DISTRIBUTED
    per-batch filters (``bloom_build`` runs on the cluster; only the
    ≤ ``n_words`` aggregated words reach the driver). Use with
    ``foreachBatch`` on a dedup-ingest stream: filters over disjoint
    batches merge by OR, so the accumulated filter after N batches is
    identical to ``bloom_build`` over the union of all batches
    (test-asserted) — the streaming twin of the batch pre-screen, like
    ``CmsAccumulator`` is for count-min.

    Fixed-size by construction: state is ≤ ``n_words`` 64-bit words
    regardless of key cardinality, so no ``max_keys`` cap is needed
    (unlike the per-group ``KmvAccumulator``). The failure axis is
    instead SATURATION (round 10): as keys accumulate, the set-bit fill
    ratio f rises, the false-positive rate ≈ f^k tends to 1, and a
    bloom-prescreened consumer silently degrades — in the crawl-frontier
    bloom-only mode every novel URL would classify duplicate (the crawl
    starves); in exact-rescue mode every row becomes a candidate (every
    batch degenerates to a full seen-set scan). So merges are fill-
    guarded, the same loud-fail contract as ``max_keys``: past
    ``warn_fill`` (default 25% ⇒ fpr ≈ 0.1% at k=5) each merge warns;
    a merge that would push fill past ``max_fill`` (default 50% ⇒ the
    classic optimally-sized-filter operating point, fpr ≈ 3% at k=5)
    raises with the batch NOT applied. Capacity sizing: a filter of
    m = n_words·32 bits holds n keys at fill f ≈ 1 − e^(−k·n/m), i.e.
    n ≈ −(m/k)·ln(1−f); at the 50% ceiling n ≈ 0.14·m ≈ 4.4·n_words —
    size ``n_words`` to ~distinct keys / 4 for headroom.
    """

    def __init__(
        self,
        n_words: int = BLOOM_WORDS,
        k: int = BLOOM_HASHES,
        warn_fill: float = 0.25,
        max_fill: float = 0.5,
    ):
        self.n_words, self.k = n_words, k
        self.warn_fill, self.max_fill = float(warn_fill), float(max_fill)
        self.words: dict[int, int] = {}
        self._set_bits = 0

    def merge_batch(self, batch_df: DataFrame, key_col: str) -> None:
        # stage → guard → commit (the max_keys contract on the bit
        # axis): the prospective fill is computed BEFORE any mutation,
        # so a rejected batch leaves state untouched for the caller to
        # resize/shard and retry.
        staged = {
            int(r["word_idx"]): int(r["word"])
            for r in bloom_build(
                batch_df, key_col, self.n_words, self.k
            ).collect()
        }
        new_bits = self._set_bits + sum(
            ((self.words.get(i, 0) | w) ^ self.words.get(i, 0)).bit_count()
            for i, w in staged.items()
        )
        fill = new_bits / float(self.n_words * 32)
        if fill > self.max_fill:
            raise ValueError(
                f"BloomAccumulator merge would set {new_bits} of "
                f"{self.n_words * 32} bits (fill {fill:.1%} > max_fill "
                f"{self.max_fill:.0%}; fpr ≈ fill^k = {fill ** self.k:.2%}"
                f" and rising) — the filter is saturating and a "
                f"prescreen built from it silently degrades. Resize: "
                f"capacity ≈ −(m/k)·ln(1−max_fill) ≈ "
                f"{int(-self.n_words * 32 / self.k * math.log(1 - self.max_fill))} "
                f"keys at n_words={self.n_words}; grow n_words with the "
                f"accumulated key count (state unchanged: the batch was "
                f"NOT applied)"
            )
        if fill > self.warn_fill:
            import warnings

            warnings.warn(
                f"BloomAccumulator fill {fill:.1%} past warn_fill "
                f"{self.warn_fill:.0%} (fpr ≈ {fill ** self.k:.3%}); "
                f"merges fail loudly at {self.max_fill:.0%} — resize "
                f"n_words before then",
                RuntimeWarning,
                stacklevel=2,
            )
        for i, w in staged.items():
            self.words[i] = self.words.get(i, 0) | w
        self._set_bits = new_bits

    def fill_ratio(self) -> float:
        """Fraction of the m = n_words·32 filter bits currently set."""
        return self._set_bits / float(self.n_words * 32)

    def estimated_fpr(self) -> float:
        """≈ fill^k — the probability an unseen key answers true."""
        return self.fill_ratio() ** self.k

    def foreach_batch(self, key_col: str):
        """A ``foreachBatch`` function maintaining this accumulator
        (replay-guarded for uniformity — OR-ing words is idempotent, so
        redelivery was already harmless here, but every accumulator
        shares one contract)."""

        return replay_guarded(
            lambda batch_df, _bid: self.merge_batch(batch_df, key_col)
        )

    def as_dataframe(self, spark) -> DataFrame:
        """The accumulated filter as the same (word_idx, word) table
        ``bloom_build`` emits — feed it straight to ``bloom_contains``."""
        return spark.createDataFrame(
            sorted(self.words.items()), schema="word_idx int, word long"
        )

    def might_contain(self, key: str) -> bool:
        """Driver-side probe — the same md5-60bit "i|key" positions the
        distributed build sets, so verdicts agree with ``bloom_contains``.
        Takes the key AS A STRING: Python formatting of other types
        diverges from Spark's CAST (``True`` vs ``true``), which would
        probe the wrong bits and fabricate a driver-side false
        negative."""
        import hashlib

        if not isinstance(key, str):
            raise TypeError(
                "might_contain takes the key as a string — cast it the "
                "way the built key column was cast"
            )
        m = self.n_words * 32
        for i in range(self.k):
            p = int(
                hashlib.md5(f"{i}|{key}".encode()).hexdigest()[:15], 16
            ) % m
            if not (self.words.get(p // 32, 0) >> (p % 32)) & 1:
                return False
        return True


# ------------------------------------------------------------------ KMV

KMV_K = 256
KMV_SPACE = 1 << 60  # md5_hash64's range: [0, 2^60)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = KMV_K,
    bucket_shift: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Per-group KMV (k-minimum-values / bottom-k theta) sketch: the ``k``
    smallest distinct 60-bit key hashes per group, the sketch family whose
    estimates COMPOSE under set algebra — union/intersection/Jaccard of
    group cardinalities from k-row summaries, the set operations HLL
    sketches cannot answer (:func:`hll` only merges by union).

    Returns ``(sketch, counts)``: ``sketch`` = (g, h, r) with r = 1..k in
    hash order; ``counts`` = (g, n_distinct) — the EXACT per-group distinct
    count, free from the prune's bucket table.

    100 TB shape: one map-side-combined distinct on (group, hash) — the
    only fact-sized exchange — then a DETERMINISTIC two-level prune before
    the rank window: bucket = h div 2^bucket_shift (1024 buckets), per-group
    cumulative bucket counts find the first bucket where the running count
    reaches k, and only rows at-or-below that cutoff bucket (≈ k + one
    bucket's worth, NOT the group's millions of distincts) enter the sort.
    The prune is exact — the k smallest values all live at-or-below the
    cutoff bucket by construction — so the oracle can skip it and rank
    everything. Hashing is the portable md5-60bit family: estimates are
    engine-reproducible bit-for-bit (uniformity within [0, 2^60) is what
    the estimator needs; do NOT swap in xxhash64 here — its signed full
    int64 range breaks the (k-1)·M/h_k estimator's M).
    """
    d = (
        df.filter(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            md5_hash64(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    # the distinct pass feeds BOTH the bucket-count table and the survivor
    # filter — materialize it once (the standing two-consumer rule)
    b = checkpoint_for_reuse(
        d.withColumn("b", F.expr(f"h div {1 << bucket_shift}"))
    )
    bc = b.groupBy("g", "b").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut = (
        bc.withColumn("c", F.sum("n").over(wcum))
        .groupBy("g")
        .agg(
            F.min(F.when(F.col("c") >= k, F.col("b"))).alias("cut"),
            F.sum("n").cast("long").alias("n_distinct"),
        )
    )
    # feeds both the survivor filter and the caller's estimates
    cut = checkpoint_for_reuse(cut)
    surv = b.join(F.broadcast(cut.select("g", "cut")), "g").filter(
        F.col("cut").isNull() | (F.col("b") <= F.col("cut"))
    )
    wr = Window.partitionBy("g").orderBy("h")
    sketch = (
        surv.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") <= k)
        .select("g", "h", "r")
    )
    return sketch, cut.select("g", "n_distinct")


def kmv_distinct_estimate(
    sketch: DataFrame, counts: DataFrame, k: int = KMV_K
) -> DataFrame:
    """(g, n_distinct, est): the KMV cardinality estimator — exact when the
    group has ≤ k distincts (the sketch is exhaustive), else
    ``(k-1)·M / h_k`` with h_k the k-th smallest hash (Beyer et al.'s
    unbiased form). All-double arithmetic on identical operands in any
    engine; the constant (k-1)·M is formed once, exactly."""
    hk = sketch.filter(F.col("r") == k).select("g", F.col("h").alias("hk"))
    c = float((k - 1) * KMV_SPACE)
    return counts.join(hk, "g", "left").select(
        "g",
        "n_distinct",
        F.when(
            F.col("n_distinct") <= k, F.col("n_distinct").cast("double")
        )
        .otherwise(F.lit(c) / F.col("hk").cast("double"))
        .alias("est"),
    )


class KmvAccumulator:
    """Streaming KMV state: per-group bottom-k hash sets fed by
    DISTRIBUTED per-batch sketches (``kmv_sketch`` runs on the cluster;
    only ≤ groups·k rows reach the driver — the same bounded-state
    contract as ``CmsAccumulator``/``BloomAccumulator``). Merge is the k
    smallest of the set union, so after N batches the state is identical
    to ``kmv_sketch`` over the union of all batches (test-asserted) —
    bottom-k sketches are mergeable by construction, which is what makes
    them the streaming/set-algebra distinct counter.

    Estimates come from the sketch alone: a group whose set is still
    smaller than k is EXACT (the sketch holds every distinct hash seen);
    past k it is the (k-1)·M/h_k estimator.

    Boundedness: the VALUE side is ≤ k longs per group by construction,
    but the GROUP axis grows one entry per distinct group ever seen —
    ``max_keys`` caps it with a loud failure (round 9, same contract as
    ``KsDriftAccumulator``; the batch is NOT applied), because on
    unbounded group domains (URLs, user ids fed as the group by mistake)
    the driver dict is a slow OOM. (``CmsAccumulator``/``BloomAccumulator``
    need no such cap: their state is a fixed depth×width / n_words table
    regardless of key cardinality.)
    """

    def __init__(self, k: int = KMV_K, max_keys: int = 100_000):
        self.k = k
        self.max_keys = int(max_keys)
        self.state: dict[object, list[int]] = {}
        # groups whose merged hash set EVER exceeded k: only these lost
        # information, so only these may use the biased (k-1)·M/h_k
        # estimator — a group with exactly k true distincts stays exact,
        # matching kmv_distinct_estimate's n_distinct<=k branch
        # (round-6 advice: the twins diverged at the len==k boundary)
        self.truncated: set[object] = set()

    def merge_batch(
        self, batch_df: DataFrame, key_col: str, group_col: str
    ) -> None:
        sk, counts = kmv_sketch(batch_df, key_col, group_col, k=self.k)
        # batch-level truncation happens INSIDE kmv_sketch (a group with
        # >k distincts arrives already trimmed to k rows), so the merged
        # length below can never reveal it — the counts frame's exact
        # per-group n_distinct does (round-7 review). Both collects run
        # BEFORE any state mutation (stage-then-commit): a raise mid-merge
        # must leave state untouched so a foreachBatch retry of the failed
        # batch can't double-apply (round-9, KsDrift contract).
        batch_trunc = {
            r["g"] for r in counts.collect() if r["n_distinct"] > self.k
        }
        sk_rows = sk.collect()
        grown = len(self.state.keys() | {r["g"] for r in sk_rows})
        if grown > self.max_keys:
            raise ValueError(
                f"KmvAccumulator would track {grown} groups, over "
                f"max_keys={self.max_keys} — the group column's "
                f"cardinality is not bounded enough for driver-side "
                f"state; group coarser or raise the cap (state "
                f"unchanged: the batch was NOT applied)"
            )
        self.truncated |= batch_trunc
        touched: set[object] = set()
        for r in sk_rows:
            cur = self.state.setdefault(r["g"], [])
            cur.append(r["h"])
            touched.add(r["g"])
        # re-sort ONLY the groups this batch touched — a full-state sweep
        # is O(total_groups·k log k) per micro-batch (round-6 advice)
        for g in touched:
            merged = sorted(set(self.state[g]))
            if len(merged) > self.k:
                self.truncated.add(g)
            self.state[g] = merged[: self.k]

    def foreach_batch(self, key_col: str, group_col: str):
        """A ``foreachBatch`` function maintaining this accumulator
        (replay-guarded for uniformity — bottom-k set union is
        idempotent, so redelivery was already harmless here, but every
        accumulator shares one contract)."""

        return replay_guarded(
            lambda batch_df, _bid: self.merge_batch(batch_df, key_col, group_col)
        )

    def as_dataframe(self, spark) -> DataFrame:
        """The accumulated state as the same (g, h, r) table
        ``kmv_sketch`` emits."""
        rows = [
            (g, h, i + 1)
            for g, hs in sorted(self.state.items(), key=lambda kv: str(kv[0]))
            for i, h in enumerate(hs)
        ]
        return spark.createDataFrame(rows, schema="g string, h long, r int")

    def estimate(self, group) -> float:
        """Distinct-count estimate for one group: exact while the sketch
        is exhaustive (never truncated — including EXACTLY k distincts),
        the (k-1)·M/h_k estimator once information was lost."""
        hs = self.state.get(group)
        if hs is None:
            return 0.0
        if group not in self.truncated:
            return float(len(hs))
        return (self.k - 1) * KMV_SPACE / hs[-1]
