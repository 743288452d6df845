"""Structured Streaming tests: drain a bounded parquet source through the
streaming engine (availableNow) and assert the results equal the batch
twin of the same plan — the strongest oracle available for streaming."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from virapipe_spark import streaming as vs


def _ts(day: int, hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, minute)


#: Two users; u1 has two sessions on day 1 (split by a >2h gap) and one
#: on day 2; u2 one session. A late event (day 1, after day-2 events in
#: file order) exercises watermark tolerance under availableNow (all data
#: in one batch -> nothing droppable).
EVENT_ROWS = [
    (1, _ts(1, 9, 0), 1, "click", 1.0, "{}"),
    (2, _ts(1, 9, 30), 1, "view", 2.0, "{}"),
    (3, _ts(1, 14, 0), 1, "click", 3.0, "{}"),   # new session (4.5h gap)
    (4, _ts(2, 10, 0), 1, "purchase", 4.0, "{}"),
    (5, _ts(1, 11, 0), 2, "click", 5.0, "{}"),
    (6, _ts(1, 12, 30), 2, "error", 6.0, "{}"),
    (7, _ts(1, 9, 45), 1, "view", 7.0, "{}"),    # late arrival for u1 s1
]


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    df = spark.createDataFrame(EVENT_ROWS, vs.EVENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events")


@pytest.fixture(scope="module")
def batch_events(spark, events_dir):
    return spark.read.schema(vs.EVENTS_SCHEMA).parquet(events_dir)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestStreamBatchParity:
    def test_tumbling(self, spark, events_dir, batch_events):
        stream = vs.read_event_stream(spark, events_dir)
        assert stream.isStreaming
        got = vs.drain_available_now(
            vs.tumbling_counts(stream, window="1 day"), "t_tumble"
        )
        want = vs.tumbling_counts(batch_events, window="1 day")
        cols = ["w_start", "event_type", "n", "total"]
        assert _rows(got, *cols) == _rows(want, *cols)
        # sanity: day-1 clicks = events 1 (u1 9:00), 3 (u1 14:00), 5 (u2 11:00)
        day1_clicks = [
            r for r in got.collect()
            if r["event_type"] == "click" and r["w_start"].day == 1
        ]
        assert day1_clicks[0]["n"] == 3

    def test_sliding(self, spark, events_dir, batch_events):
        stream = vs.read_event_stream(spark, events_dir)
        got = vs.drain_available_now(
            vs.sliding_counts(stream, window="2 days", slide="1 day"), "t_slide"
        )
        want = vs.sliding_counts(batch_events, window="2 days", slide="1 day")
        assert _rows(got, "w_start", "n") == _rows(want, "w_start", "n")
        # every event appears in exactly 2 windows
        assert sum(r["n"] for r in got.collect()) == 2 * len(EVENT_ROWS)

    def test_session_window(self, spark, events_dir, batch_events):
        stream = vs.read_event_stream(spark, events_dir)
        got = vs.drain_available_now(
            vs.session_aggregate(stream, gap="2 hours"), "t_sess"
        )
        want = vs.session_aggregate(batch_events, gap="2 hours")
        cols = ["user_id", "session_start", "n_events", "total"]
        assert _rows(got, *cols) == _rows(want, *cols)
        # u1: sessions {9:00-9:45 x3 incl. late event}, {14:00}, {day2};
        # u2: one session (11:00 + 12:30 within 2h gap)
        per_user = {
            (r["user_id"], r["session_start"]): r["n_events"] for r in got.collect()
        }
        assert per_user[(1, _ts(1, 9, 0))] == 3
        assert len([k for k in per_user if k[0] == 1]) == 3
        assert len([k for k in per_user if k[0] == 2]) == 1

    def test_stateful_user_totals(self, spark, events_dir, batch_events):
        """applyInPandasWithState running totals == batch groupBy agg."""
        stream = vs.read_event_stream(spark, events_dir)
        got = vs.drain_available_now(
            vs.stateful_user_totals(stream), "t_state", output_mode="update"
        )
        # update mode re-emits a user's latest row each batch it appears
        # in; keep the final (max n_events) row per user
        latest = {}
        for r in got.collect():
            if r["user_id"] not in latest or r["n_events"] > latest[r["user_id"]]["n_events"]:
                latest[r["user_id"]] = r
        want = {
            r["user_id"]: r
            for r in batch_events.groupBy("user_id")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
            .collect()
        }
        assert set(latest) == set(want)
        for uid, r in latest.items():
            assert r["n_events"] == want[uid]["n_events"]
            assert r["total"] == pytest.approx(want[uid]["total"])

    def test_stream_static_enrich(self, spark, events_dir, batch_events):
        """Stream-static inner join is stateless (no watermark needed);
        the static dim broadcasts and parity with the batch twin is
        exact."""
        dim = spark.createDataFrame(
            [(1, "gold"), (2, "basic")], ["dim_user", "tier"]
        )
        stream = vs.read_event_stream(spark, events_dir)
        got = vs.drain_available_now(
            vs.enrich_with_dim(
                stream, dim, F.col("user_id") == F.col("dim_user")
            ),
            "t_enrich",
            output_mode="append",
        )
        want = vs.enrich_with_dim(
            batch_events, dim, F.col("user_id") == F.col("dim_user")
        )
        cols = ["event_id", "tier"]
        assert _rows(got, *cols) == _rows(want, *cols)
        assert got.count() == len(EVENT_ROWS)  # every fixture user is 1 or 2

    def test_stream_interval_join(self, spark, events_dir, batch_events):
        """Stream-stream inner join with watermarks on BOTH sides and an
        event-time range condition; parity with the batch twin. With a
        6h interval the two u1 views (9:30, 9:45) each match the 14:00
        click; u2 has clicks but no views."""
        stream = vs.read_event_stream(spark, events_dir)
        assert stream.isStreaming
        got = vs.drain_available_now(
            vs.interval_join(stream, interval="6 hours"),
            "t_sjoin",
            output_mode="append",
        )
        want = vs.interval_join(batch_events, interval="6 hours")
        cols = ["user_id", "view_id", "click_id", "gap_us"]
        assert _rows(got, *cols) == _rows(want, *cols)
        assert got.count() == 2

    def test_stream_dedup(self, spark, tmp_path_factory):
        """dropDuplicatesWithinWatermark drops re-sent events; parity
        with the batch dropDuplicates twin."""
        d = tmp_path_factory.mktemp("dup_events")
        dup_rows = EVENT_ROWS + EVENT_ROWS[:3]  # first 3 events re-sent
        df = spark.createDataFrame(dup_rows, vs.EVENTS_SCHEMA)
        df.coalesce(1).write.mode("overwrite").parquet(str(d / "events"))
        stream = vs.read_event_stream(spark, str(d / "events"))
        got = vs.drain_available_now(
            vs.stream_dedup(stream), "t_dedup", output_mode="append"
        )
        batch = spark.read.schema(vs.EVENTS_SCHEMA).parquet(str(d / "events"))
        want = vs.stream_dedup(batch)
        assert got.count() == len(EVENT_ROWS)
        assert sorted(r["event_id"] for r in got.collect()) == sorted(
            r["event_id"] for r in want.collect()
        )

    def test_watermark_present_on_stream_plan(self, spark, events_dir):
        stream = vs.read_event_stream(spark, events_dir)
        agg = vs.tumbling_counts(stream, window="1 day", watermark="3 hours")
        assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


class TestBatchSessionizeMatchesSessionWindow:
    def test_lag_cumsum_equals_session_window(self, spark, batch_events):
        """The catalog's lag+cumsum sessionization and F.session_window
        produce identical sessions for gap semantics < vs <=."""
        from virapipe_spark.queries.streaming import sessionize_events  # noqa: F401
        from pyspark.sql import Window as W

        gap_us = 2 * 3_600_000_000
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        g = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        flagged = batch_events.withColumn(
            "new_s", F.when(g.isNull() | (g >= gap_us), 1).otherwise(0)
        )
        wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        sess = flagged.withColumn("sid", F.sum("new_s").over(wsum))
        lagged = sess.groupBy("user_id", "sid").agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
        )
        sw = vs.session_aggregate(batch_events, gap="2 hours")
        assert _rows(lagged, "user_id", "session_start", "n_events") == _rows(
            sw, "user_id", "session_start", "n_events"
        )


class TestHllDailyMerge:
    def test_merged_sketch_estimate_within_bound(self, spark):
        """The weekly merged-HLL estimate must certify itself against
        the ride-along exact count (within_5pct true for every week),
        and the estimate must be deterministic across runs."""
        from virapipe_spark import catalog

        catalog.load_all()
        sf = "/root/testdata/sf0.001"
        out = catalog.QUERIES["events_hll_daily_merge"](spark, sf).collect()
        assert out and all(r["within_5pct"] for r in out)
        assert all(r["exact_users"] > 0 for r in out)
        est = {r["week"]: r["est_users"] for r in out}
        out2 = catalog.QUERIES["events_hll_daily_merge"](spark, sf).collect()
        assert {r["week"]: r["est_users"] for r in out2} == est


class TestForeachBatchSink:
    def test_effectively_once_across_restart_and_replay(
        self, spark, events_dir, batch_events, tmp_path_factory
    ):
        """Three contracts of the idempotent epoch sink: (1) the sink's
        union equals the source exactly; (2) re-running against the
        same checkpoint (restart with no new data) adds nothing; (3) a
        replayed epoch (the crash-between-write-and-commit case)
        overwrites rather than duplicates."""
        from virapipe_spark.streaming import foreach_batch_idempotent_sink

        out = str(tmp_path_factory.mktemp("fbsink") / "out")
        ckpt = str(tmp_path_factory.mktemp("fbsink") / "ckpt")
        stream = spark.readStream.schema(vs.EVENTS_SCHEMA).parquet(events_dir)

        foreach_batch_idempotent_sink(stream, out, ckpt)
        got = spark.read.parquet(out).drop("epoch")
        assert _rows(got, "event_id") == _rows(batch_events, "event_id")

        # (2) restart with the same checkpoint: offsets are committed,
        # so no epoch re-fires and the output is unchanged
        stream2 = spark.readStream.schema(vs.EVENTS_SCHEMA).parquet(events_dir)
        foreach_batch_idempotent_sink(stream2, out, ckpt)
        again = spark.read.parquet(out).drop("epoch")
        assert _rows(again, "event_id") == _rows(batch_events, "event_id")

        # (3) simulate epoch replay: rewriting epoch 0's data directly
        # must leave the union identical (overwrite, not append).
        # Materialize first — Spark cannot lazily read the path it is
        # overwriting.
        epoch0_df = spark.read.parquet(f"{out}/epoch=0")
        replay = spark.createDataFrame(
            epoch0_df.collect(), epoch0_df.schema
        )
        replay.write.mode("overwrite").parquet(f"{out}/epoch=0")
        replayed = spark.read.parquet(out).drop("epoch")
        assert _rows(replayed, "event_id") == _rows(batch_events, "event_id")


class TestTransformWithState:
    def test_tws_plan_analyzes_with_typed_output(self, spark, batch_events):
        """The transformWithStateInPandas plan must analyze to the
        declared (user_id, max_cents, n_types) schema regardless of
        environment — the Spark-side plumbing is real even where the
        Python worker dependency is absent."""
        out = vs.stateful_user_profile_tws(batch_events)
        assert out.schema.simpleString() == (
            "struct<user_id:bigint,max_cents:bigint,n_types:bigint>"
        )

    def test_tws_user_profile_matches_batch(self, spark, events_dir, batch_events):
        """transformWithStateInPandas (ValueState + MapState) running
        per-user max/distinct-type profile == batch groupBy agg.
        Execution needs the python protobuf package (the
        transformWithState driver worker imports it) and the RocksDB
        state store provider; skipped honestly where protobuf is not
        installed — same env-gate policy as the JPEG/MP3 codecs."""
        pytest.importorskip(
            "google.protobuf",
            reason="transformWithState python worker needs protobuf",
        )
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            stream = vs.read_event_stream(spark, events_dir)
            got = vs.drain_available_now(
                vs.stateful_user_profile_tws(stream),
                "t_tws",
                output_mode="update",
            )
            latest = {}
            for r in got.collect():
                cur = latest.get(r["user_id"])
                if (
                    cur is None
                    or r["n_types"] > cur["n_types"]
                    or r["max_cents"] > cur["max_cents"]
                ):
                    latest[r["user_id"]] = r
            want = {
                r["user_id"]: r
                for r in batch_events.groupBy("user_id")
                .agg(
                    F.max(F.round(F.col("value") * 100).cast("long")).alias(
                        "max_cents"
                    ),
                    F.countDistinct("event_type").alias("n_types"),
                )
                .collect()
            }
            assert set(latest) == set(want)
            for uid, r in latest.items():
                assert r["max_cents"] == want[uid]["max_cents"]
                assert r["n_types"] == want[uid]["n_types"]
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )


class TestStreamIntervalOuter:
    def test_stream_interval_left_outer(self, spark, tmp_path):
        """Stream-stream LEFT OUTER interval join == batch twin. Outer
        null rows only emit once the watermark PROVES no match can
        arrive — a single-batch drain emits nothing (state awaits the
        horizon), so the source is split into per-file micro-batches
        (maxFilesPerTrigger=1) with a later flush file whose event
        advances the watermark past every view's expiry; the nulls for
        both unmatched views must then flush mid-drain. This IS the
        semantic difference between inner and outer stream-stream
        joins, exercised rather than worked around."""
        d = tmp_path / "ev"
        d.mkdir()
        main = spark.createDataFrame(EVENT_ROWS, vs.EVENTS_SCHEMA)
        main.coalesce(1).write.mode("overwrite").parquet(str(d / "f1"))
        # the flush rows must SURVIVE the view/click filters: the
        # watermark is computed on the post-filter event-time columns,
        # so a filtered-out event advances nothing (found the hard way —
        # a "noise" flush event left the watermark at day 1 forever).
        # A self-matching view+click pair advances both sides and adds
        # one matched row the batch twin also produces.
        flush = spark.createDataFrame(
            [
                (98, _ts(5, 12, 0), 9, "view", 0.0, "{}"),
                (99, _ts(5, 12, 30), 9, "click", 0.0, "{}"),
            ],
            vs.EVENTS_SCHEMA,
        )
        flush.coalesce(1).write.mode("overwrite").parquet(str(d / "f2"))
        # one directory, two files, lexicographic arrival order f1 < f2
        import shutil, glob, os

        for sub in ("f1", "f2"):
            src = glob.glob(str(d / sub / "*.parquet"))[0]
            shutil.copy(src, str(d / f"{sub}.parquet"))
            shutil.rmtree(str(d / sub))
        stream = vs.read_event_stream(spark, str(d), max_files_per_trigger=1)
        got = vs.drain_available_now(
            vs.interval_join(
                stream, interval="1 hour", watermark="2 hours", how="left_outer"
            ),
            "t_ivl_outer",
            output_mode="append",
        )
        batch = spark.read.schema(vs.EVENTS_SCHEMA).parquet(str(d))
        want = vs.interval_join(
            batch, interval="1 hour", watermark="2 hours", how="left_outer"
        )
        cols = ["user_id", "view_id", "click_id", "gap_us"]
        assert _rows(got, *cols) == _rows(want, *cols)
        nulls = [r for r in got.collect() if r["click_id"] is None]
        assert {r["view_id"] for r in nulls} == {2, 7}
        matched = [r for r in got.collect() if r["click_id"] is not None]
        assert [(r["view_id"], r["click_id"]) for r in matched] == [(98, 99)]


class TestTdigestDailyMerge:
    def test_merged_digest_rank_within_tol_and_deterministic(self, spark):
        """The weekly merged-t-digest percentile estimates must certify
        themselves against the ride-along exact rank (within_tol true
        for every (week, p)), and the estimates must be deterministic
        across runs — the digest sorts values and merges sort
        centroids, so partition order cannot move the output."""
        from virapipe_spark import catalog

        catalog.load_all()
        sf = "/root/testdata/sf0.001"
        out = catalog.QUERIES["events_tdigest_daily_merge"](spark, sf).collect()
        assert out and all(r["within_tol"] for r in out)
        assert {r["p"] for r in out} == {0.5, 0.9, 0.99}
        assert all(r["sketch_rows"] >= 1 for r in out)
        est = {(r["week"], r["p"]): r["est_value"] for r in out}
        out2 = catalog.QUERIES["events_tdigest_daily_merge"](spark, sf).collect()
        assert {(r["week"], r["p"]): r["est_value"] for r in out2} == est


class TestIncrementalTdigestSink:
    def test_stream_digests_answer_quantiles_with_no_mass_lost(
        self, spark, tmp_path_factory
    ):
        """Multi-batch drain (maxFilesPerTrigger=1 over 4 files) builds
        per-epoch digest rows; the reader's merged answer must (a)
        conserve total mass exactly across epochs, (b) hit true ranks
        within the entry's tolerance, (c) be identical on re-read
        (merge is child-order-independent), and (d) be idempotent
        under an epoch replay (overwrite, not append)."""
        import numpy as np

        from virapipe_spark import streaming as vs
        from virapipe_spark import tdigest as td

        d = tmp_path_factory.mktemp("tdigest_stream")
        rng = np.random.default_rng(77)
        base = 1_700_000_000
        rows = []
        for i in range(400):
            rows.append(
                (
                    i,
                    __import__("datetime").datetime.fromtimestamp(
                        base + (i % 3) * 86400 + i
                    ),
                    i % 17,
                    "click",
                    float(rng.lognormal(3, 1)),
                    "{}",
                )
            )
        src = str(d / "events")
        spark.createDataFrame(rows, vs.EVENTS_SCHEMA).repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        stream = vs.read_event_stream(spark, src, max_files_per_trigger=1)
        digest_path = str(d / "digests")
        vs.incremental_tdigest_sink(
            stream, digest_path, str(d / "ckpt"), shards=4
        )
        stored = spark.read.parquet(digest_path)
        assert stored.select("epoch").distinct().count() > 1  # multi-batch
        # (a) mass conservation
        total_w = sum(
            sum(r["weights"]) for r in stored.collect()
        )
        assert total_w == 400
        # (b) rank accuracy
        vals = np.sort(np.array([r[4] for r in rows]))
        got = vs.read_merged_quantiles(spark, digest_path)
        for p, est in got:
            lo = np.searchsorted(vals, est, "left") / len(vals)
            hi = np.searchsorted(vals, est, "right") / len(vals)
            assert max(lo - p, p - hi, 0.0) <= 0.02, (p, est)
        # (c) deterministic re-read
        assert vs.read_merged_quantiles(spark, digest_path) == got
        # (d) replaying an epoch's write is idempotent (materialize
        # first — a lazy self-overwrite would read its own target)
        epoch0_rows = spark.read.parquet(f"{digest_path}/epoch=0").collect()
        spark.createDataFrame(
            epoch0_rows,
            "day long, shard int, means array<double>, weights array<double>",
        ).write.mode("overwrite").parquet(f"{digest_path}/epoch=0")
        assert vs.read_merged_quantiles(spark, digest_path) == got
