"""Structured Streaming surface (SURVEY.md §2.11, §7.6).

The reference is batch-only; these are the capability extension over the
``events`` stream table, following stock Spark semantics: event-time
windows + watermark late-data handling, with ``availableNow`` used by the
test harness to drain a bounded source through the *streaming* engine.

Batch/stream parity: each helper takes ANY events-shaped DataFrame —
batch (``catalog.table``) or streaming (:func:`read_event_stream`) — and
builds the identical logical plan; Spark plans it as an incremental
stateful query when the source is streaming. The batch halves are
hash-checked against DuckDB in :mod:`virapipe_spark.queries.streaming`;
the streaming halves are asserted equal to their batch twins in
``tests/test_streaming.py`` — the strongest check available for an
engine DuckDB can't mirror.

Scale: windowed aggregations shuffle by (window, key) — state store size
is bounded by watermark horizon x key cardinality, not stream length.
``session_window`` state merges per user; skewed users are the one risk
(a power user's session chain lives on one partition) — mitigate with a
session-key salt upstream if a key exceeds state budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the events stream (TESTDATA.md; ts kept as a proper
#: timestamp — parquet fixtures written by tests use micros).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over a parquet directory of events. File sources
    are replayable and support exactly-once with checkpointing.
    ``max_files_per_trigger`` bounds each micro-batch (availableNow
    honors it, splitting a bounded drain into several batches — how the
    outer-join test advances the watermark mid-drain)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "1 day"
) -> DataFrame:
    """Per-(window, event_type) count + value sum over tumbling windows.

    On a stream, the watermark bounds state: windows older than
    ``watermark`` behind max event time finalize and evict."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 days",
    slide: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )


def session_aggregate(
    events: DataFrame, gap: str = "12 hours", watermark: str = "1 day"
) -> DataFrame:
    """Session windows: events of one user separated by < ``gap`` merge
    into one session (``F.session_window`` — stateful merge on a stream;
    the gap-and-cumsum batch formulation lives in
    queries/streaming.py:sessionize_events with a DuckDB oracle)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def interval_join(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "click",
    interval: str = "4 hours",
    watermark: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition —
    the canonical attribution join (every ``right_type`` event matched
    to the same user's earlier ``left_type`` events within
    ``interval``). The one §2.11 stateful operator family previously
    uncovered: two *streams* joining each other, not a stream against a
    static side.

    On streams, BOTH sides carry watermarks and the time-range
    predicate lets Spark bound join state: a buffered view row can be
    dropped once the watermark passes ``view_ts + interval`` (stock
    stream-stream join semantics). On batch frames the identical plan
    is an equi-join on user_id with the range as a join-time filter —
    candidate volume is per-user views x clicks, bounded by activity
    density; if one user's activity explodes, the bucketed
    decomposition (queries/streaming.py:events_range_join) is the batch
    escape hatch. gap_us is an integer micros difference — exact on
    both engines.

    ``how="left_outer"`` adds the unmatched-attribution rows (a view
    with NO click in its window emits once, with null click columns).
    On streams this is the semantics watermarks exist for: the null
    row for a buffered view can only be emitted once the watermark
    proves no matching click can still arrive (view_ts + interval +
    watermark delay) — so outer results trail the inner ones by the
    watermark horizon, and the engine's no-data final microbatch
    flushes the tail when a bounded source drains (asserted in
    tests/test_streaming.py::TestStreamBatchParity::
    test_stream_interval_left_outer)."""
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if events.isStreaming:
        left = left.withWatermark("view_ts", watermark)
        right = right.withWatermark("click_ts", watermark)
    cond = (
        (left["user_id"] == right["r_user_id"])
        & (right["click_ts"] >= left["view_ts"])
        & (
            right["click_ts"]
            <= left["view_ts"] + F.expr(f"INTERVAL {interval}")
        )
    )
    return left.join(right, cond, how).select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


def enrich_with_dim(events: DataFrame, dim: DataFrame, cond) -> DataFrame:
    """Stream-static enrichment join: each event row decorated with its
    matching row from a STATIC dimension table. On a stream Spark
    re-evaluates the static side per micro-batch (picking up dim
    updates between batches) and needs no watermark — stream-static
    inner joins are stateless. The dim is broadcast (dimension tables
    are small by definition here; for a large dim, pre-bucket both
    sides instead). Batch frames take the identical plan."""
    return events.join(F.broadcast(dim), cond)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total held in explicit keyed state,
    re-emitted (update mode) whenever a batch touches the user.

    This is the plug-point for stateful logic the built-in windowed aggs
    can't express (per-key custom accumulators, decaying counters,
    cross-batch sequence detection). Streaming-only — the batch twin is
    a plain ``groupBy(user_id).agg(...)``, asserted equal in
    tests/test_streaming.py.

    Scale: state lives in the executor state store partitioned by
    user_id — size = live keys × state row, independent of stream
    length. Arrow batches cross the Python boundary once per (partition,
    trigger). Use timeouts (here NoTimeout; TTL via
    ``GroupStateTimeout``) to evict dead keys on unbounded key spaces.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact deduplication — the ingest-time half of the dedup
    family (the batch half is catalog ``docs_exact_dedup``): drop
    repeated keys as records arrive, keeping the first occurrence.

    On a stream this is ``dropDuplicatesWithinWatermark``: the state
    store holds each key only until the watermark passes it, so state
    is bounded by (arrival-rate × watermark horizon), not stream
    lifetime — the property that makes ingest dedup viable forever. A
    duplicate arriving later than the watermark horizon is NOT caught
    (that is the contract); catch stragglers downstream with the batch
    dedup over the sink.

    On a batch frame the same call degrades to ``dropDuplicates`` —
    parity asserted in tests/test_streaming.py."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))


def drain_available_now(
    sdf: DataFrame, name: str, timeout_sec: int = 120, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion on currently-available
    data (``trigger(availableNow=True)``) into an in-memory table and
    return it as a batch DataFrame. Test/dev harness only — production
    sinks are parquet/kafka with checkpointing."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout — a silently partial
        # memory table would make parity tests flaky with misleading
        # diffs, so fail loudly instead.
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"availableNow drain of {name!r} did not finish "
                f"within {timeout_sec}s"
            )
    finally:
        q.stop()
    return sdf.sparkSession.table(name)


def foreach_batch_idempotent_sink(
    sdf: DataFrame, path: str, checkpoint_dir: str, timeout_sec: int = 120
) -> None:
    """Effectively-once micro-batch sink over plain parquet — the
    production write path for streams when no transactional table
    format is available: ``foreachBatch`` hands each micro-batch to a
    batch writer that overwrites an EPOCH-KEYED subdirectory
    (``path/epoch=<id>``), so a replayed epoch (driver restart between
    write and offset commit) overwrites its own partial output instead
    of appending duplicates. Idempotent writes + checkpointed source
    offsets = effectively-once end to end; readers see the union via
    partition discovery over ``epoch=*``.

    Scale: the writer inside foreachBatch is a normal distributed
    batch write (one file per partition, no driver data path);
    checkpoint state is offsets only. Epoch directories accrete — at
    100 TB compact them periodically with the same idempotent pattern
    (rewrite N epochs into one, then atomically swap), or use a
    transactional format where available.
    """

    def _write_epoch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    q = (
        sdf.writeStream.foreachBatch(_write_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"availableNow foreachBatch sink to {path!r} did not "
                f"finish within {timeout_sec}s"
            )
    finally:
        q.stop()


def stateful_user_profile_tws(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``transformWithStateInPandas`` —
    the Spark 4.x arbitrary-state API superseding
    ``applyInPandasWithState`` (:func:`stateful_user_totals` keeps the
    legacy shape for comparison): per-user running maximum value (in
    integer cents) plus distinct-event-type count, held in a typed
    ``ValueState`` and a ``MapState`` (the map IS the distinct set —
    per-key point lookups instead of deserializing a whole set blob
    per trigger, which is the API's scale win over the legacy
    single-row state).

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``) — transformWithState is built on
    its column-family support; the test harness sets it on the
    session. EXECUTION additionally needs the python ``protobuf``
    package (the API's state-server driver worker imports it), which
    this sandbox lacks — so the parity test env-gates on it (same
    policy as the JPEG/MP3 codecs) while the plan-analysis test always
    runs. Batch twin: ``groupBy(user_id).agg(max(cents),
    count_distinct(event_type))``, asserted equal in
    tests/test_streaming.py.

    Scale: state is partitioned by user_id in the executor state
    stores; the map adds one entry per (user, event_type) — bounded by
    live keys x type vocabulary, independent of stream length. TTL is
    available per state (ttlDurationMs) for unbounded key spaces."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("max_cents", T.LongType()),
            T.StructField("n_types", T.LongType()),
        ]
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._mx = handle.getValueState("mx", "max_cents BIGINT")
            self._seen = handle.getMapState("seen", "t STRING", "one INT")

        def handleInputRows(self, key, rows, timerValues):
            mx = self._mx.get()[0] if self._mx.exists() else None
            for pdf in rows:
                cents = (pdf["value"] * 100).round().astype("int64")
                batch_max = int(cents.max())
                mx = batch_max if mx is None else max(mx, batch_max)
                for t in pdf["event_type"].dropna().unique():
                    if not self._seen.containsKey((str(t),)):
                        self._seen.updateValue((str(t),), (1,))
            self._mx.update((mx,))
            n_types = sum(1 for _ in self._seen.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "max_cents": [mx],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        Profile(), out_schema, "Update", "None"
    )


def incremental_tdigest_sink(
    sdf: DataFrame,
    digest_path: str,
    checkpoint_dir: str,
    shards: int = 8,
    timeout_sec: int = 120,
) -> None:
    """Incremental QUANTILE state over a stream — the streaming half of
    the t-digest family (the batch half is catalog
    ``events_tdigest_daily_merge``): each micro-batch builds per-(day,
    shard) digests from ITS OWN rows and appends them to an
    epoch-keyed digest table; readers answer any date-range percentile
    by merging the relevant digest rows (tdigest.merge — associative
    and deterministic), so the stream never re-scans history and the
    state per epoch is a handful of ~100-centroid rows, not events.

    This is the foreach_batch_idempotent_sink pattern applied to
    SKETCH state: epoch-keyed overwrite makes replays idempotent, and
    because merge() is child-order-independent the reader's answer is
    identical no matter how epochs interleaved. Parity vs the batch
    build is asserted in tests/test_streaming.py.

    Scale: per micro-batch one (day, shard) applyInPandas whose input
    is pre-aggregated to (distinct value, multiplicity) JVM-side —
    the round-12 batch-entry fix applied here too: applyInPandas
    delivers each whole group as ONE pandas batch (no record/byte cap),
    so an availableNow BACKFILL micro-batch over deep history would
    otherwise hand Python day-volume/shards rows at once. The digest
    table accretes tiny rows (compact with the same idempotent rewrite
    when epochs pile up)."""
    import pandas as pd

    from virapipe_spark import tdigest as td
    from pyspark.sql import functions as F

    def _digest_epoch(df: DataFrame, epoch_id: int) -> None:
        day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
        src = (
            df.select(
                day.cast("long").alias("day"),
                F.pmod(F.hash("user_id"), F.lit(shards))
                .cast("int")
                .alias("shard"),
                "value",
            )
            .groupBy("day", "shard", "value")
            .agg(F.count("*").cast("double").alias("w"))
        )

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            m, w = td.build_weighted(
                pdf["value"].to_numpy(), pdf["w"].to_numpy()
            )
            return pd.DataFrame(
                {
                    "day": [int(pdf["day"].iloc[0])],
                    "shard": [int(pdf["shard"].iloc[0])],
                    "means": [m.tolist()],
                    "weights": [w.tolist()],
                }
            )

        out = src.groupBy("day", "shard").applyInPandas(
            build,
            "day long, shard int, means array<double>, weights array<double>",
        )
        out.write.mode("overwrite").parquet(f"{digest_path}/epoch={epoch_id}")

    q = (
        sdf.writeStream.foreachBatch(_digest_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"availableNow t-digest sink to {digest_path!r} did not "
                f"finish within {timeout_sec}s"
            )
    finally:
        q.stop()


def read_merged_quantiles(
    spark, digest_path: str, targets: tuple[float, ...] = (0.5, 0.9, 0.99)
):
    """Reader side of incremental_tdigest_sink: merge ALL stored digest
    rows (across epochs, days, shards) into one digest and return
    [(p, estimate)] — the constant-time percentile answer the sink
    maintains. Digest rows are tiny; this collect is sketch-sized
    control plane (like a BAM header), never event data."""
    import numpy as np

    from virapipe_spark import tdigest as td

    rows = spark.read.parquet(digest_path).collect()
    m, w = td.merge(
        [(np.array(r["means"]), np.array(r["weights"])) for r in rows]
    )
    return [(p, td.quantile(m, w, p)) for p in targets]
