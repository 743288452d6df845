"""Scale utilities: skew-safe joins and co-located (bucketed) joins.

These are the knobs a 100 TB deployment turns when the default
shuffle-hash/sort-merge plan hits a pathological key distribution.
AQE's skew-join split (on by default in session.py) handles moderate
skew at runtime; :func:`salted_join` is the explicit fallback for the
extreme case — one key owning a double-digit percentage of the fact
table — where even a split partition overwhelms its executor.

No reference counterpart (the reference never joins at scale; its RDD
``leftOuterJoin`` at BlastNFilter.java:172 runs on per-sample data) —
this module exists for the 100 TB design bar.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def broadcast_if_small(
    df: DataFrame, *paths: str, threshold: int = 32 << 20
) -> DataFrame:
    """Size-aware broadcast hint: hint only when the relation's actual
    on-disk footprint is under ``threshold`` bytes.

    An unconditional ``F.broadcast`` on a table that grows with scale
    factor overrides ``autoBroadcastJoinThreshold`` and OOMs at the
    100 TB bar (round-3 ADVICE on q5); but *dropping* the hint entirely
    surrenders to Catalyst's static estimator, whose join-output size
    product inflates a tiny dim-chain (supplier⋈nation⋈region) past the
    threshold and plans a full fact-side shuffle — measured 0.85 s →
    2.8 s on q5 at sf0.1, and AQE's runtime SMJ→BHJ rewrite does not
    recover the map-side shuffle write already paid. This helper does
    what a cost-based optimizer with real table stats would: decide
    from the MEASURED source size, so small-SF runs broadcast and
    large-SF runs shuffle, with no cliff in between.

    ``paths`` are the relation's source files/directories (driver-side
    listing — local FS and DFS mounts; on an object store, substitute
    catalog statistics). Unknown paths mean unknown size: no hint, let
    Spark decide. The default threshold is 32 MB — comfortably within a
    multi-GB executor while covering dims that static estimation
    misjudges; the hint only ever *adds* broadcast, so the failure mode
    of a stale size is a too-large broadcast bounded by the real file
    size at plan time, not unbounded growth.
    """
    if not paths:
        return df  # no size evidence at all -> never hint
    total = 0
    for p in paths:
        if os.path.isdir(p):
            total += sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(p)
                for f in fs
            )
        elif os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            return df
    return F.broadcast(df) if total < threshold else df


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    The fact table's join key is suffixed with a uniform salt in
    [0, n_salts); the dim side is exploded ×n_salts so every salted key
    finds its match. A key that owned one shuffle partition now spreads
    over ``n_salts`` partitions; the dim side grows ×n_salts, so use
    this when dim ≪ fact (the usual skew shape: huge fact, modest dim,
    one hot key).

    The salt is derived deterministically from the fact row's content
    (``pmod(hash(salt_cols or all fact columns), n_salts)``), never
    ``rand()``: a random salt is only stable per partition layout, so a
    stage retry or non-deterministic upstream ordering could reassign
    salts mid-shuffle and drop or duplicate rows. Content-hashing is
    retry-safe.

    Limitation: *identical* fact rows hash to the same salt, so a hot
    key consisting of exact duplicate rows (a common real skew shape —
    e.g. replayed events) still lands on one (key, salt) partition and
    the mitigation degrades to an unsalted join. When the fact side can
    carry duplicates, pass ``salt_cols`` naming a high-cardinality
    per-row disambiguator (a stable row id, a file offset, a batch
    sequence number) to restore spreading; absent any such column,
    deduplicate upstream or aggregate the duplicates before joining.

    Only ``inner`` and ``left`` joins are supported: a right/full outer
    join would emit each unmatched dim row ``n_salts`` times (the explode
    replicates it under every salt and none of the copies match).

    Output columns = fact columns + dim columns minus the dim's join key
    (same shape as ``fact.join(dim, key, how)``).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "right/full outer would duplicate unmatched dim rows ×n_salts"
        )
    salt_src = salt_cols if salt_cols else fact.columns
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    joined = f.join(d, on=[key, "__salt"], how=how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a table bucketed+sorted by its join key, so future joins
    on ``key`` between co-bucketed tables skip the shuffle entirely
    (SortMergeJoin over pre-sorted buckets, zero Exchange — asserted in
    tests/test_scale_plans.py).

    This is the 100 TB answer to a fact-fact join both of whose sides
    are reused across queries: pay the shuffle once at write time,
    amortize it over every subsequent join/aggregation on the key.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    # A fresh in-memory metastore can leave an orphaned managed-table
    # location on disk from a previous session, and saveAsTable refuses
    # to create over it (LOCATION_ALREADY_EXISTS). Clear local-FS
    # leftovers; on a cluster the persistent metastore never orphans a
    # location, so the DROP above is the whole story.
    if path is None:
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            import shutil

            leftover = os.path.join(wh.path, table_name.lower())
            if os.path.exists(leftover):
                shutil.rmtree(leftover)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    tie_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase top-k per group for LOW-cardinality groups at scale.

    A plain ``row_number() OVER (PARTITION BY group)`` funnels every row
    of a group through one task's sort — with 3 groups and 100 TB, three
    tasks do all the work. Phase 1 ranks within (group, salt) buckets —
    ``n_salts``× the parallelism — and keeps each bucket's top-k (any
    global top-k row is necessarily top-k in its bucket); phase 2 ranks
    the ≤ k·n_salts survivors per group, a trivially small sort.

    ``tie_cols`` must make the ordering total (deterministic results).
    Equality with the single-window plan is asserted in
    tests/test_scale_plans.py. At moderate scale the extra shuffle costs
    more than it saves (measured +8% at sf0.1) — reach for this when a
    group's rows exceed one executor's sort budget, not before.
    """
    salt = F.pmod(F.hash(*tie_cols), F.lit(n_salts))
    from pyspark.sql import Window as W

    w1 = W.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    cand = (
        df.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = W.partitionBy(*group_cols).orderBy(*order_cols)
    return cand.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k)


def hamilton_allocate(
    src: DataFrame, budget: int, key_col: str = "source", weight_col: str = "toks"
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    ``budget`` across the rows of ``src`` proportionally to
    ``weight_col``, in integers, awarding the rounding leftovers to the
    largest remainders (ties broken by ``key_col``) — quotas sum
    EXACTLY to the budget. Backs catalog ``docs_mixture_allocation``;
    see its docstring for the scale rationale (everything here runs on
    the already-aggregated per-key frame)."""
    tot = src.agg(F.sum(weight_col).cast("long").alias("__t"))
    alloc = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("base_quota", F.expr(f"({budget} * {weight_col}) div __t"))
        .withColumn("rem", F.expr(f"({budget} * {weight_col}) % __t"))
    )
    w_rank = W.orderBy(F.col("rem").desc(), key_col)
    w_all = W.partitionBy()
    return (
        alloc.withColumn("rem_rank", F.row_number().over(w_rank))
        .withColumn(
            "leftover",
            F.lit(budget) - F.sum("base_quota").over(w_all).cast("long"),
        )
        .select(
            key_col,
            F.col(weight_col).cast("long").alias(weight_col),
            F.col("base_quota").cast("long").alias("base_quota"),
            (
                F.col("base_quota")
                + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long").alias("quota"),
        )
    )


def reset_size_stats(df):
    """Rebuild ``df`` over its own physical RDD so the logical plan is a
    FRESH ``LogicalRDD`` carrying NO inherited statistics.

    Why this exists (r13, found by a §7.3 driver thread dump): since
    Spark preserves the origin plan's statistics through
    ``checkpoint``/``localCheckpoint`` (the checkpointed LogicalRDD
    copies ``originStats``), Catalyst's ``sizeInBytes`` — a product
    over join children — COMPOUNDS across checkpoint boundaries. An
    iterative self-join (pointer doubling, CC label propagation)
    SQUARES the estimate every round, so its BigInteger digit count
    doubles per round and survives every truncate_lineage call:
    measured 4 → 2,927 digits in 9 self-join hops, after which each
    join-planning stats evaluation spends minutes in
    ``BigInteger.multiply`` (Karatsuba/Toom-Cook frames in the driver
    thread dump — the "analysis-shaped" one-core stall that blocked
    the r12 boruvka-contraction prototype). Stripping the stats resets
    the frame to ``defaultSizeInBytes``, which is exactly what a
    checkpoint yielded BEFORE stats propagation existed.

    Trade-off: the stripped frame loses any honest small-size estimate
    too, so joins against it will not AUTO-broadcast — use it from
    ITERATIVE LOOPS (where the inherited estimate is a many-round join
    product, i.e. garbage, and the joins already planned as SMJ), not
    from one-shot checkpoints whose consumers rely on auto-broadcast;
    call sites that need a broadcast add the explicit hint. Falls back
    to the input unchanged when the JVM internals are unavailable
    (Spark Connect)."""
    try:
        from pyspark.sql import DataFrame as _DF

        jdf = df._jdf
        jspark = df.sparkSession._jsparkSession
        rdd = jdf.queryExecution().toRdd()
        njdf = jspark.internalCreateDataFrame(rdd, jdf.schema(), False)
        return _DF(njdf, df.sparkSession)
    except Exception:
        return df


def truncate_lineage(df, eager: bool = True, reliable: bool = False):
    """Checkpoint ``df`` to truncate lineage.

    ``reliable=False`` (the default) always uses ``localCheckpoint``:
    executor-local blocks that are freed when the frame is
    unreferenced. This is the right store for INTRA-QUERY plan dedup
    (the minhash signature table, the n-gram table, bloom candidate
    frames) — the data is consumed within one job and persisting it to
    a checkpoint directory would leak files: Spark never deletes
    reliable-checkpoint files unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` is set
    BEFORE the session starts, and even then only on GC of the RDD.

    ``reliable=True`` upgrades to RELIABLE ``checkpoint`` when the
    session has a checkpoint directory configured
    (``spark.sparkContext.setCheckpointDir`` — a distributed-FS path
    on a real cluster). Pass it from ITERATIVE-LOOP call sites only
    (graph.py's label propagation / PageRank / BFS), where surviving
    executor loss mid-iteration is worth the file lifecycle cost; on a
    long-lived cluster session either set ``cleanCheckpoints`` or
    periodically clear the checkpoint dir.

    On the reliable path the frame is PERSISTED before checkpointing
    and released after: ``DataFrame.checkpoint(eager=True)`` computes
    the plan once for the eager materialization and AGAIN to write the
    RDD to the checkpoint dir unless its blocks are cached, so an
    unpersisted eager reliable checkpoint doubles every iterative
    round's compute on a dir-configured cluster. (The per-round-eager
    cadence A/Bs quoted in graph.py were measured on the
    localCheckpoint fallback, where materialization and storage are the
    same pass; the persist below is what makes those wins carry over to
    the reliable path.)

    Falls back to ``localCheckpoint`` when the JVM checkpoint-dir
    probe is unavailable (e.g. Spark Connect has no ``sc._jsc``)."""
    if reliable:
        try:
            sc = df.sparkSession.sparkContext
            if sc._jsc.sc().getCheckpointDir().isDefined():
                if not eager:
                    # persist-before-lazy-checkpoint: when the first
                    # action materializes the frame, the checkpoint
                    # write job reads the cached blocks instead of
                    # recomputing the plan (the same double-compute
                    # hazard the eager branch below guards). No paired
                    # unpersist exists on the lazy path — blocks are
                    # reclaimed by the ContextCleaner when the frame is
                    # dereferenced, the localCheckpoint lifecycle.
                    return df.persist().checkpoint(eager=False)
                cached = df.persist()
                try:
                    return cached.checkpoint(eager=True)
                finally:
                    # the checkpoint files carry the data from here on
                    cached.unpersist()
        except Exception:
            pass
    return df.localCheckpoint(eager=eager)


def _adaptive_ranged(
    df: DataFrame,
    order: list,
    stat_exprs: list,
    num_partitions: int | None,
    target_rows_per_range: int,
):
    """Shared scaffold for :func:`two_phase_rank` and
    :func:`two_phase_prefix_agg`: range-partition ``df`` over
    ``order``, checkpoint (freezing the partitioning — range sampling
    is not otherwise stable across jobs), and collect ONE stats row
    per range (``stat_exprs`` must include ``count(*) AS c``). The
    range count is data-adaptive: the first pass ranges over
    ``defaultParallelism``; if its (free) size collect shows an honest
    range exceeding ``target_rows_per_range`` rows, the frame
    re-ranges at ``ceil(total/target)`` — FROM THE FIRST CHECKPOINT,
    not the source ``df``, so the upstream plan (joins, aggregates)
    never executes twice; the first checkpoint's storage is the only
    cost of the second pass. Returns ``(ranged frame with __pid,
    {pid: stats Row})``."""
    spark = df.sparkSession

    def _pass(src: DataFrame, p: int):
        # r12: LAZY checkpoint + the stats collect as the materializing
        # action (the CC convergence-count fuse) — the collect is a
        # FULL action (one aggregate row per partition consumes every
        # partition), so the partitioning freezes at the same point the
        # old eager checkpoint froze it, one job cheaper per pass
        # (tools/ab_ranged_lazyckpt.py).
        ranged = truncate_lineage(
            src.repartitionByRange(p, *order).withColumn(
                "__pid", F.spark_partition_id()
            ),
            eager=False,
            reliable=True,
        )
        stats = {
            r["__pid"]: r
            for r in ranged.groupBy("__pid").agg(*stat_exprs).collect()
        }
        return ranged, stats

    floor_p = max(int(spark.sparkContext.defaultParallelism), 1)
    ranged, stats = _pass(df, num_partitions or floor_p)
    if num_partitions is None:
        total_rows = sum(r["c"] for r in stats.values())
        need = max(floor_p, -(-total_rows // max(target_rows_per_range, 1)))
        if need > floor_p:
            ranged, stats = _pass(ranged.drop("__pid"), need)
    return ranged, stats


def two_phase_rank(
    df: DataFrame,
    order: list,
    rank_col: str = "rn",
    num_partitions: int | None = None,
    target_rows_per_range: int = 4_000_000,
) -> tuple[DataFrame, int]:
    """EXACT global ``row_number`` over ``order`` without a global
    window — the distributed two-phase sort rank.

    Phase 1: ``repartitionByRange`` spreads the rows over ORDERED,
    non-overlapping ranges; the frame is checkpointed so both phases
    see the same frozen partitioning (range sampling is not otherwise
    stable across jobs). Phase 2: each range ranks ITSELF with a
    partitioned window, and the global rank adds per-range row-count
    offsets — a partition-count-sized driver collect (control plane,
    the t-digest/BAM-dictionary pattern), never a data-sized
    single-partition sort.

    The range count is sized by DATA, not cores (round-10 verdict
    item): a first pass ranges over ``defaultParallelism`` and its
    (free) size collect yields the total row count; if any honest
    range would then exceed ``target_rows_per_range`` rows, the frame
    is re-ranged at ``ceil(total / target)`` partitions before
    ranking. On a laptop-scale input the first ranging is final (one
    pass, the pre-r11 plan unchanged); at 100 TB the second ranging
    caps each in-range sort at a per-executor-sized chunk instead of
    input/``defaultParallelism`` (3 TB/range at 32 cores). Pass
    ``num_partitions`` to pin the count explicitly (skips the
    adaptive step).

    ``order`` must be a TOTAL order (append a unique tiebreak column),
    or ranks at range boundaries are nondeterministic. Returns
    ``(frame with rank_col, total row count)`` — the count is free
    (it is the sum of the offsets) and exact-ntile/cume-dist callers
    always need it. Ranks are partition-layout-independent, so the
    adaptive re-range cannot change results.

    Used by docs_sorted_neighborhood, window_ntile_cume and
    events_rfm_segments; at 100 TB this is the honest replacement for
    every data-sized ``W.orderBy(...)`` rank in the catalog."""
    spark = df.sparkSession
    ranged, stats = _adaptive_ranged(
        df, order, [F.count("*").alias("c")], num_partitions,
        target_rows_per_range,
    )
    sizes = {pid: r["c"] for pid, r in stats.items()}
    offs, total = [], 0
    for pid in sorted(sizes):
        offs.append((pid, total))
        total += sizes[pid]
    off_df = spark.createDataFrame(offs or [], "__pid int, __off long")
    rn_in = F.row_number().over(W.partitionBy("__pid").orderBy(*order))
    out = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(rank_col, (rn_in + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )
    return out, total


def two_phase_prefix_agg(
    df: DataFrame,
    order: list,
    value_col: str,
    out_col: str,
    agg: str = "sum",
    inclusive: bool = True,
    num_partitions: int | None = None,
    target_rows_per_range: int = 4_000_000,
) -> DataFrame:
    """EXACT global running SUM or MAX over ``order`` without a global
    window — :func:`two_phase_rank`'s sibling for cumulative
    aggregates (running revenue share, sweep-line concurrency, skyline
    dominance), sharing its structure: repartitionByRange freezes
    ordered, non-overlapping ranges (checkpointed — range sampling is
    not otherwise stable across jobs); each range runs the cumulative
    window WITHIN itself; and the cross-range carry-in is computed
    driver-side from one per-range total per partition (a
    partition-count-sized collect, control plane) and broadcast back.
    Both sum and max are associative, so carry-in ∘ within-range prefix
    == the global prefix, bit-exactly for integer inputs.

    ``inclusive=False`` gives the STRICT prefix (rows before the
    current row only — the skyline's "strictly cheaper" frame): the
    within-range window ends at -1 PRECEDING and the first row of each
    range takes the bare carry-in (NULL in range 0 — i.e. no
    predecessor, surfaced as NULL exactly like an empty window frame).

    ``order`` must be a TOTAL order for per-row determinism (same
    contract as two_phase_rank); for ``inclusive=False`` with a RANGE
    frame semantics (exclude ties, not just the current row), order by
    the DISTINCT frame key (pre-aggregate ties first — equal keys are
    never split across ranges, so cross-range carry-ins stay exact).
    Range count is data-adaptive exactly as in two_phase_rank."""
    if agg not in ("sum", "max"):
        raise ValueError(f"two_phase_prefix_agg supports sum/max, got {agg!r}")
    spark = df.sparkSession
    fn = F.sum(value_col) if agg == "sum" else F.max(value_col)
    ranged, stats = _adaptive_ranged(
        df, order, [fn.alias("t"), F.count("*").alias("c")],
        num_partitions, target_rows_per_range,
    )
    # exclusive carry-in per range: everything aggregated BEFORE it
    offs, carry = [], None
    for pid in sorted(stats):
        offs.append((pid, carry))
        t = stats[pid]["t"]
        if t is not None:
            if carry is None:
                carry = t
            elif agg == "sum":
                carry = carry + t
            else:
                carry = max(carry, t)
    # integral sums widen to bigint (Spark's integral-sum result type,
    # and the Python-side carry can exceed the input width); max — and
    # fractional sums — keep the input type (max's carry is one of the
    # values; double sums stay double)
    vtype = dict(df.dtypes)[value_col]
    if agg == "sum" and vtype in ("tinyint", "smallint", "int", "bigint"):
        vtype = "bigint"
    off_df = spark.createDataFrame(offs or [], f"__pid int, __off {vtype}")
    end = 0 if inclusive else -1
    win = (
        W.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, end)
    )
    within = (F.sum(value_col) if agg == "sum" else F.max(value_col)).over(win)
    if agg == "sum":
        combined = F.when(
            within.isNull(), F.col("__off")
        ).otherwise(within + F.coalesce(F.col("__off"), F.lit(0)))
    else:
        combined = F.greatest(
            within, F.col("__off")
        )  # greatest ignores NULLs unless both are NULL
    return (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, combined)
        .drop("__pid", "__off")
    )


def exact_ntile(rn: Column, n: int, k: int) -> Column:
    """SQL-standard ``ntile(k)`` from a precomputed global rank: with
    ``n`` rows, the first ``n mod k`` buckets hold ``n div k + 1`` rows
    and the rest ``n div k`` — the exact sizing Spark's and DuckDB's
    window ntile both implement, so a rank-derived ntile hash-matches a
    window-derived one. ``n`` is a driver-side int (two_phase_rank's
    total), so every divisor below is a Python literal and the floors
    are exactly-rounded integer divisions."""
    q, r = divmod(n, k)
    if q == 0:  # fewer rows than buckets: row i is bucket i
        return rn.cast("long")
    thr = r * (q + 1)
    return (
        F.when(rn <= thr, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - thr - 1) / q) + 1)
        .cast("long")
    )


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for ``df``'s optimized plan — a
    driver-side, zero-job number (for parquet scans it is the on-disk
    file footprint propagated through the operators). Returns ``None``
    when the internal API is unavailable (e.g. Spark Connect)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _segscan_small_bytes() -> int:
    """Input-size threshold (bytes, est.) below which the segmented
    scan's scaffold is pure overhead and the plain keyed window already
    meets the SAME per-task bound the scan enforces: with
    ``target_rows_per_range`` = 4M rows at ~256 B/row ≈ 1 GiB, an input
    estimated under this many bytes cannot put more rows in one window
    task — even if a single key owns ALL of it — than one segmented
    range is allowed to hold. Env-overridable so a cluster deployment
    can re-derive it from its executor sizing (and so tests/verification
    can force the segmented path everywhere with ``=0``)."""
    return int(os.environ.get("SPARK_GRAFT_SEGSCAN_SMALL_BYTES", str(1 << 30)))


def _spread_small_bytes() -> int:
    """Input-size bound (bytes, est.) under which :func:`spread_scan`
    re-spreads a scan. Default 256 MiB: Spark's file-split packing
    floors each split at ``spark.sql.files.openCostInBytes`` (4 MiB),
    so an input under ~cores x 4 MiB plans to a handful of scan tasks
    (a single small parquet file with one row group plans to ONE), and
    the whole map stage above it — explodes, shingling, hashing —
    runs serially no matter how many cores the session has. Below this
    bound one round-robin exchange of the base rows is strictly
    bounded (<= 256 MiB crosses the wire once) and unlocks full map
    parallelism; above it, the split planner already spreads the scan
    and the exchange would be a data-sized payload shuffle — so the
    helper is a no-op. Env-overridable per deployment."""
    return int(os.environ.get("SPARK_GRAFT_SPREAD_SMALL_BYTES", str(1 << 28)))


def spread_scan(df: DataFrame, num: int | None = None) -> DataFrame:
    """Scale-adaptive scan spreading (r12 optimization, guide §2.5
    input-skew / §6 small-files): round-robin repartition ``df`` to
    ``num`` (default ``defaultParallelism``) partitions when its
    Catalyst size estimate is under :func:`_spread_small_bytes`,
    else return it unchanged.

    Use on the SOURCE frame of a heavy map stage (position explodes,
    shingling, per-row hashing), after any pushable filters — placing
    it above the scan would block predicate pushdown. Only safe where
    downstream aggregation is partition-order-insensitive (integer
    sums/counts/min/max, distinct) or deterministically re-sorted —
    float accumulation order changes with partitioning.

    Frames whose size Catalyst cannot estimate (the MaxValue sentinel
    on createDataFrame/RDD inputs, or no estimate at all) are left
    unchanged — unknown means possibly huge, and the failure mode of
    not spreading is slow, never wrong."""
    est = _plan_size_bytes(df)
    if est is None or est > _spread_small_bytes():
        return df
    return df.repartition(num or df.sparkSession.sparkContext.defaultParallelism)


class KeyedRanges:
    """Distributed SEGMENTED scan over ``(key, order)`` — the per-KEY
    sibling of :func:`two_phase_rank`/:func:`two_phase_prefix_agg`, for
    windows of the shape ``W.partitionBy(key).orderBy(*order)`` whose
    key distribution cannot be trusted (round-12 skew tier: a per-user
    window puts a bot user's entire history in ONE task — a 1B-row
    single-task sort at 100 TB; the global-window audit never saw it
    because partitioned windows are not global).

    Construction: ``repartitionByRange`` over ``(key, *order)`` via the
    same adaptive scaffold as the global two-phase family — a HOT key
    is thereby SPLIT across adjacent ranges (the very thing
    ``W.partitionBy(key)`` can never do), each range bounded by
    ``target_rows_per_range`` regardless of the key histogram. Because
    ranges are contiguous in the total order, at most ONE key straddles
    each range boundary, so every cross-range correction is
    partition-count-sized: one (first-row, last-row) stats struct per
    range, collected once at construction (the t-digest/BAM-dictionary
    control-plane pattern).

    Two primitives cover the lag/cumsum window family:

    - :meth:`lag_col` — exact per-key ``lag(col)``: within-range lag
      over ``W.partitionBy(__pid, key)``, plus the previous range's
      last row (always the global predecessor) carried in for the
      first row of each range that continues its predecessor's key.
    - :meth:`prefix_sum` — exact per-key running sum: within-range
      keyed cumulative sum, plus a driver-chained carry for each
      range's FIRST key (tail totals per range come from one tiny agg
      job over the frozen frame, ≤ one row per range). The carry
      chains through ranges wholly owned by one key
      (``first_key == last_key``), so a key spanning N ranges is
      handled for any N.

    Both corrections touch only rows whose key equals the range's
    first key; all other rows take the within-range value unchanged —
    results are bit-identical to the single-task window formulation
    (twin-tested in tests/test_scale_plans.py).

    ``order`` must make ``(key, *order)`` a total order (same contract
    as two_phase_rank). ``carry_cols`` names every column whose value
    :meth:`lag_col` will need from boundary rows.

    Scale-adaptive (r12 optimization): when ``num_partitions`` is not
    pinned and the input's Catalyst size estimate is under
    :func:`_segscan_small_bytes`, construction skips the scaffold
    entirely and every method emits the plain
    ``W.partitionBy(key).orderBy(*order)`` formulation — the exact
    definitional twin the segmented path is tested against, so results
    are identical by construction. Below that bound the window path
    already satisfies the segmented scan's per-task row bound even
    under total skew (the whole input is smaller than one permitted
    range), so the scaffold's ~3 extra input passes buy nothing.
    Setting ``SPARK_GRAFT_SEGSCAN_SMALL_BYTES=0`` forces the segmented
    path everywhere (verification); passing ``num_partitions`` pins it
    per call site (tests, skew smokes)."""

    def __init__(
        self,
        df: DataFrame,
        key: str,
        order: list,
        carry_cols: tuple = (),
        num_partitions: int | None = None,
        target_rows_per_range: int = 4_000_000,
    ) -> None:
        self.key, self.order = key, list(order)
        cols = [key, *self.order]
        cols += [c for c in carry_cols if c not in cols]
        self._edge_cols = list(cols)
        self._dtypes = dict(df.dtypes)
        self._schema = df.schema
        # Scale-adaptive path choice (r12, guide §1.2/§2): the scaffold
        # (range-sampling pass + checkpoint + stats collect) costs ~3
        # passes over the input before the first window runs. Below the
        # small-bytes bound a plain keyed window satisfies the identical
        # per-task row bound (see _segscan_small_bytes), and every
        # method's small formulation IS the definitional window twin the
        # segmented path is tested against — bit-identical by
        # construction. ``num_partitions`` pins the segmented path
        # unconditionally (tests, skew smokes); an unavailable estimate
        # falls back to segmented (wrong-toward-slow, never wrong at
        # scale).
        if num_partitions is None:
            est = _plan_size_bytes(df)
            self._small = est is not None and est <= _segscan_small_bytes()
        else:
            self._small = False
        if self._small:
            self.frame = df
            self._pids, self._first, self._last = [], {}, {}
            return
        edge = F.struct(*[F.col(c) for c in cols])
        self.frame, stats = _adaptive_ranged(
            df,
            [key, *self.order],
            [F.count("*").alias("c"), F.min(edge).alias("first"),
             F.max(edge).alias("last")],
            num_partitions,
            target_rows_per_range,
        )
        self._pids = sorted(stats)
        self._first = {p: stats[p]["first"] for p in self._pids}
        self._last = {p: stats[p]["last"] for p in self._pids}

    def _win(self):
        if self._small:
            return W.partitionBy(self.key).orderBy(*self.order)
        return W.partitionBy("__pid", self.key).orderBy(*self.order)

    def lag_col(
        self, frame: DataFrame, col: str, out_col: str, offset: int = 1
    ) -> DataFrame:
        """Exact per-key ``lag(col, offset)`` as ``out_col`` (NULL for
        each key's first ``offset`` rows) — single-column wrapper over
        :meth:`lags`."""
        return self.lags(frame, [(col, out_col, offset)])

    def lags(
        self, frame: DataFrame, specs: list
    ) -> DataFrame:
        """Exact per-key lags for MANY columns/offsets in one pass —
        ``specs`` is ``[(col, out_col, offset), ...]``. All window
        expressions share one Window node (one sort); the boundary
        substitutions apply as at most TWO broadcast joins (one merged
        table for offset-1 specs keyed on the range's first-row
        identity, one for deeper specs keyed on (range, within-key
        rank)). Deep offsets run ONE bounded job on the checkpointed
        base frame collecting each range's last ``max(offset)`` tail
        rows (window partition <= range size, <= max(offset) rows per
        range collected), chained driver-side through ranges wholly
        owned by the boundary key — so every boundary structure stays
        partition-count-sized control plane.

        Deep (offset > 1) specs must name columns of the CHECKPOINTED
        construction frame (the boundary values come from it); offset-1
        specs may lag any column carried in ``carry_cols``. ``frame``
        must carry ``__pid`` and the same rows as :attr:`frame`."""
        from pyspark.sql.types import IntegerType, StructField, StructType

        spark = frame.sparkSession
        for c, o, off in specs:
            if off < 1:
                raise ValueError(f"lag offset must be >= 1, got {off}")
        shallow = [s for s in specs if s[2] == 1]
        deep = [s for s in specs if s[2] > 1]
        for c, _o, _f in shallow:
            if c not in self._edge_cols:
                # fail deterministically at call time — without this, a
                # missing carry_col only crashes when some range happens
                # to continue a key (partition-layout-dependent)
                raise ValueError(
                    f"lag of {c!r} needs it in carry_cols (edge stats "
                    f"carry {self._edge_cols})"
                )
        if self._small:
            # plain keyed window — the definitional twin of the
            # segmented formulation (same validation so misuse fails
            # identically on both paths)
            base_cols = set(self.frame.columns)
            for c, _o, off in deep:
                if c not in base_cols:
                    raise ValueError(
                        f"deep lag (offset {off}) needs a column of the "
                        f"construction frame, got derived column {c!r}"
                    )
            return frame.select(
                *frame.columns,
                *[
                    F.lag(c, off).over(self._win()).alias(out)
                    for c, out, off in specs
                ],
            )
        kt_t = self._field_type(self.key)

        # one Window node: every within-range lag plus (if needed) the
        # within-key rank, all over the same spec
        sel = list(frame.columns)
        sel += [
            F.lag(c, off).over(self._win()).alias(f"__w_{out}")
            for c, out, off in specs
        ]
        if deep:
            sel.append(F.row_number().over(self._win()).alias("__ern"))
        cur = frame.select(*sel)

        if shallow:
            rows = []
            for i, p in enumerate(self._pids):
                prev = self._last[self._pids[i - 1]] if i else None
                cont = (
                    prev is not None
                    and prev[self.key] == self._first[p][self.key]
                )
                rows.append(
                    tuple(self._first[p][c] for c in [self.key, *self.order])
                    + (p,)
                    + tuple(
                        prev[c] if cont else None for c, _o, _f in shallow
                    )
                )
            st = StructType()
            for c in [self.key, *self.order]:
                st = st.add(StructField(f"__e_{c}", self._field_type(c), True))
            st = st.add(StructField("__epid", IntegerType(), True))
            for c, out, _off in shallow:
                st = st.add(StructField(f"__bv_{out}", self._field_type(c), True))
            b = spark.createDataFrame(rows, st)
            on_edge = F.col("__epid").isNotNull()
            cur = cur.join(
                F.broadcast(b),
                [cur["__pid"] == b["__epid"]]
                + [
                    cur[c].eqNullSafe(b[f"__e_{c}"])
                    for c in [self.key, *self.order]
                ],
                "left",
            )
            for c, out, _off in shallow:
                # substitute ONLY on the range's true first row (matched
                # on the full (key, order) identity, not a NULL probe —
                # the lagged column may legitimately hold NULLs)
                cur = cur.withColumn(
                    out,
                    F.when(on_edge, F.col(f"__bv_{out}")).otherwise(
                        F.col(f"__w_{out}")
                    ),
                )
            cur = cur.drop(
                "__epid",
                *[f"__e_{c}" for c in [self.key, *self.order]],
                *[f"__bv_{out}" for _c, out, _f in shallow],
            )

        if deep:
            base_cols = set(self.frame.columns)
            for c, _o, off in deep:
                if c not in base_cols:
                    raise ValueError(
                        f"deep lag (offset {off}) needs a column of the "
                        f"construction frame, got derived column {c!r}"
                    )
            maxoff = max(off for _c, _o, off in deep)
            dcols = sorted({c for c, _o, _f in deep})
            lk_df = spark.createDataFrame(
                [(p, self._last[p][self.key]) for p in self._pids],
                StructType(
                    [
                        StructField("__pid", IntegerType()),
                        StructField("__lk", kt_t),
                    ]
                ),
            )
            # ONE bounded job on the checkpointed base: each range\'s
            # last maxoff tail-segment rows, most recent first
            w_desc = W.partitionBy("__pid").orderBy(
                *[F.col(c).desc() for c in self.order]
            )
            collected = (
                self.frame.join(F.broadcast(lk_df), "__pid")
                .filter(F.col(self.key).eqNullSafe(F.col("__lk")))
                .select(
                    "__pid",
                    *dcols,
                    F.row_number().over(w_desc).alias("__r"),
                )
                .filter(F.col("__r") <= maxoff)
                .collect()
            )
            tails: dict[int, list] = {}
            for r in sorted(collected, key=lambda x: (x["__pid"], x["__r"])):
                tails.setdefault(r["__pid"], []).append(r)
            chain: dict[int, list] = {}
            carry: dict[int, list] = {}
            for i, p in enumerate(self._pids):
                if i:
                    q = self._pids[i - 1]
                    cont = (
                        self._last[q][self.key] == self._first[p][self.key]
                    )
                    carry[p] = chain[q] if cont else []
                else:
                    carry[p] = []
                whole = self._first[p][self.key] == self._last[p][self.key]
                ext = carry[p] if whole else []
                chain[p] = (tails.get(p, []) + ext)[:maxoff]
            # lookup rows: the rn-th row of a range continuing its
            # boundary key takes chain position offset - rn for each
            # deep spec (0 = most recent predecessor before the range)
            rows = []
            for p in self._pids:
                vals = carry[p]
                for rn in range(1, maxoff + 1):
                    vr = []
                    for c, _out, off in deep:
                        idx = off - rn
                        vr.append(
                            vals[idx][c]
                            if 0 <= idx < len(vals)
                            else None
                        )
                    rows.append(
                        (p, rn, self._first[p][self.key]) + tuple(vr)
                    )
            st = StructType(
                [
                    StructField("__dpid", IntegerType()),
                    StructField("__drn", IntegerType()),
                    StructField("__dfk", kt_t, True),
                ]
            )
            for c, out, _off in deep:
                st = st.add(StructField(f"__dv_{out}", self._field_type(c), True))
            b2 = spark.createDataFrame(rows, st)
            on_deep = F.col("__dpid").isNotNull()
            cur = cur.join(
                F.broadcast(b2),
                (cur["__pid"] == b2["__dpid"])
                & (cur["__ern"] == b2["__drn"])
                & cur[self.key].eqNullSafe(b2["__dfk"]),
                "left",
            )
            for _c, out, off in deep:
                # substitute only while the within-key rank is inside
                # THIS spec's offset — a deeper sibling spec's lookup
                # row (rank <= maxoff) must not clobber a shallower
                # spec's correct within-range value
                cur = cur.withColumn(
                    out,
                    F.when(
                        on_deep & (F.col("__ern") <= F.lit(off)),
                        F.col(f"__dv_{out}"),
                    ).otherwise(F.col(f"__w_{out}")),
                )
            cur = cur.drop(
                "__dpid",
                "__drn",
                "__dfk",
                "__ern",
                *[f"__dv_{out}" for _c, out, _f in deep],
            )
        return cur.drop(*[f"__w_{out}" for _c, out, _f in specs])


    def _edge_schema(self, val_name: str, val_col: str) -> "object":
        from pyspark.sql.types import StructField, StructType, IntegerType

        base = StructType()
        for c in [self.key, *self.order]:
            base = base.add(StructField(f"__e_{c}", self._field_type(c), True))
        base = base.add(StructField("__epid", IntegerType(), True))
        base = base.add(StructField(val_name, self._field_type(val_col), True))
        return base

    def _field_type(self, col: str):
        for f in self._schema.fields:
            if f.name == col:
                return f.dataType
        from pyspark.sql.types import LongType

        return LongType()

    def lead_col(self, frame: DataFrame, col: str, out_col: str) -> DataFrame:
        """Exact per-key ``lead(col)`` as ``out_col`` (NULL for each
        key's true last row) — the mirror of :meth:`lag_col`: the
        boundary value for a range's LAST row comes from the NEXT
        range's first row when that range continues the same key."""
        spark = frame.sparkSession
        if col not in self._edge_cols:
            raise ValueError(
                f"lead of {col!r} needs it in carry_cols (edge stats "
                f"carry {self._edge_cols})"
            )
        if self._small:
            return frame.withColumn(out_col, F.lead(col).over(self._win()))
        rows = []
        for i, p in enumerate(self._pids):
            nxt = self._first[self._pids[i + 1]] if i + 1 < len(self._pids) else None
            cont = nxt is not None and nxt[self.key] == self._last[p][self.key]
            rows.append(
                tuple(self._last[p][c] for c in [self.key, *self.order])
                + (p, nxt[col] if cont else None)
            )
        b = spark.createDataFrame(rows, self._edge_schema("__nv", col))
        within = F.lead(col).over(self._win())
        on_edge = F.col("__epid").isNotNull()
        return (
            frame.join(
                F.broadcast(b),
                [frame["__pid"] == b["__epid"]]
                + [frame[c].eqNullSafe(b[f"__e_{c}"]) for c in [self.key, *self.order]],
                "left",
            )
            .withColumn(out_col, F.when(on_edge, F.col("__nv")).otherwise(within))
            .drop("__epid", "__nv", *[f"__e_{c}" for c in [self.key, *self.order]])
        )

    def prefix_sum(
        self, frame: DataFrame, value_col: str, out_col: str, inclusive: bool = True
    ) -> DataFrame:
        """Exact per-key running sum of ``value_col`` as ``out_col``.
        ``frame`` must carry ``__pid``, the key/order columns and the
        same rows as :attr:`frame` — typically the output of
        :meth:`lag_col` plus derived columns, so the tail totals see
        the SAME corrected values the scan sums. ``inclusive=False``
        gives the strict prefix (NULL on each key's first row — the
        empty-frame convention, matching ``rowsBetween(.., -1)``)."""
        return self._prefix_agg(frame, value_col, out_col, "sum", inclusive)

    def prefix_max(
        self, frame: DataFrame, value_col: str, out_col: str, inclusive: bool = True
    ) -> DataFrame:
        """Exact per-key running max of ``value_col`` as ``out_col`` —
        the keyed high-water mark (watermark audits, drawdowns).
        ``inclusive=False`` excludes the current row (NULL on each
        key's first row)."""
        return self._prefix_agg(frame, value_col, out_col, "max", inclusive)

    def _prefix_agg(
        self,
        frame: DataFrame,
        value_col: str,
        out_col: str,
        agg: str,
        inclusive: bool,
    ) -> DataFrame:
        from pyspark.sql.types import IntegerType, StructField, StructType

        fn = F.sum if agg == "sum" else F.max
        if self._small:
            if value_col not in frame.columns:
                raise ValueError(
                    f"prefix aggregate column {value_col!r} not in frame"
                )
            end = 0 if inclusive else -1
            within = fn(value_col).over(
                self._win().rowsBetween(W.unboundedPreceding, end)
            )
            return frame.withColumn(out_col, within)
        spark = frame.sparkSession
        if frame is not self.frame:
            # the tail-totals job and the caller's consumption would
            # otherwise EACH execute the derived plan (lag windows,
            # boundary joins, flag projections) — checkpoint once, both
            # passes read the blocks, freed when the result is dropped
            frame = truncate_lineage(frame, eager=False)
        kt_t = self._field_type(self.key)
        lk_df = spark.createDataFrame(
            [(p, self._last[p][self.key]) for p in self._pids],
            StructType(
                [StructField("__pid", IntegerType()), StructField("__lk", kt_t)]
            ),
        )
        # per-range tail aggregate over the boundary key — ALWAYS the
        # full (inclusive) segment: it feeds the NEXT range's carry
        tails = {
            r["__pid"]: r["t"]
            for r in frame.join(F.broadcast(lk_df), "__pid")
            .filter(F.col(self.key).eqNullSafe(F.col("__lk")))
            .groupBy("__pid")
            .agg(fn(value_col).alias("t"))
            .collect()
        }
        rows, carry = [], {}
        for i, p in enumerate(self._pids):
            if i:
                q = self._pids[i - 1]
                cont = self._last[q][self.key] == self._first[p][self.key]
                carry_in = carry[q] if cont else None
            else:
                carry_in = None
            rows.append((p, self._first[p][self.key], carry_in))
            whole = self._first[p][self.key] == self._last[p][self.key]
            t = tails.get(p)
            vals = [v for v in (t, carry_in if whole else None) if v is not None]
            if agg == "sum":
                carry[p] = sum(vals) if vals else None
            else:
                carry[p] = max(vals) if vals else None
        ft = dict(frame.dtypes)
        if value_col not in ft:
            raise ValueError(
                f"prefix aggregate column {value_col!r} not in frame"
            )
        vt = ft[value_col]
        if agg == "sum" and vt in ("tinyint", "smallint", "int", "bigint"):
            vt = "bigint"  # sum widens; the carry can exceed input width
        from pyspark.sql.types import _parse_datatype_string

        b = spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField("__pid", IntegerType()),
                    StructField("__fk", kt_t),
                    StructField("__ci", _parse_datatype_string(vt), True),
                ]
            ),
        )
        end = 0 if inclusive else -1
        within = fn(value_col).over(
            self._win().rowsBetween(W.unboundedPreceding, end)
        )
        if agg == "sum":
            combined = F.when(within.isNull(), F.col("__ci")).otherwise(
                within + F.coalesce(F.col("__ci"), F.lit(0))
            )
        else:
            combined = F.when(within.isNull(), F.col("__ci")).otherwise(
                F.greatest(within, F.col("__ci"))
            )
        return (
            frame.join(F.broadcast(b), "__pid")
            .withColumn(
                out_col,
                F.when(F.col(self.key).eqNullSafe(F.col("__fk")), combined).otherwise(
                    within
                ),
            )
            .drop("__fk", "__ci")
        )

    def prefix_last(self, frame: DataFrame, value_col: str, out_col: str) -> DataFrame:
        """Exact per-key ``last(value_col, ignorenulls=True)`` over the
        cumulative frame (forward fill / as-of carry) as ``out_col``:
        NULL until the key's first non-null observation, then the most
        recent non-null at or before each row. The carry per range is
        the chain's most recent non-null for the boundary key — a
        range whose tail segment is all-NULL passes the incoming carry
        through (when the whole range belongs to that key), so fills
        survive arbitrarily long NULL gaps spanning many ranges."""
        from pyspark.sql.types import IntegerType, StructField, StructType

        if self._small:
            return frame.withColumn(
                out_col,
                F.last(value_col, ignorenulls=True).over(
                    self._win().rowsBetween(W.unboundedPreceding, W.currentRow)
                ),
            )
        spark = frame.sparkSession
        if frame is not self.frame:
            frame = truncate_lineage(frame, eager=False)  # see _prefix_agg
        lk = [(p, self._last[p][self.key]) for p in self._pids]
        kt_t = self._field_type(self.key)
        lk_df = spark.createDataFrame(
            lk,
            StructType(
                [StructField("__pid", IntegerType()), StructField("__lk", kt_t)]
            ),
        )
        # last non-null in each range's tail segment, by full order —
        # max_by over the non-null rows (deterministic: order is total)
        tails = {
            r["__pid"]: r["t"]
            for r in frame.join(F.broadcast(lk_df), "__pid")
            .filter(
                F.col(self.key).eqNullSafe(F.col("__lk"))
                & F.col(value_col).isNotNull()
            )
            .groupBy("__pid")
            .agg(
                F.max_by(
                    value_col, F.struct(*[F.col(c) for c in self.order])
                ).alias("t")
            )
            .collect()
        }
        rows, carry = [], {}
        for i, p in enumerate(self._pids):
            if i:
                q = self._pids[i - 1]
                cont = self._last[q][self.key] == self._first[p][self.key]
                carry_in = carry[q] if cont else None
            else:
                carry_in = None
            rows.append((p, self._first[p][self.key], carry_in))
            whole = self._first[p][self.key] == self._last[p][self.key]
            t = tails.get(p)
            carry[p] = t if t is not None else (carry_in if whole else None)
        b = spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField("__pid", IntegerType()),
                    StructField("__fk", kt_t),
                    StructField(
                        "__ci",
                        next(
                            f.dataType
                            for f in frame.schema.fields
                            if f.name == value_col
                        ),
                        True,
                    ),
                ]
            ),
        )
        within = F.last(value_col, ignorenulls=True).over(
            self._win().rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            frame.join(F.broadcast(b), "__pid")
            .withColumn(
                out_col,
                F.when(
                    F.col(self.key).eqNullSafe(F.col("__fk")),
                    F.coalesce(within, F.col("__ci")),
                ).otherwise(within),
            )
            .drop("__fk", "__ci")
        )
