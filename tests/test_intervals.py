"""Interval overlap join: golden semantics, bin-dedup property,
random-data equivalence with the naive theta join, and the plan shape
that makes it scale (equi-join, no cartesian)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from virapipe_spark.intervals import coverage, merge_overlapping, overlap_join


def _pairs(df, ka="id_a", kb="id_b"):
    return sorted((r[ka], r[kb]) for r in df.collect())


class TestOverlapJoin:
    def test_golden_inclusive_semantics(self, spark):
        a = spark.createDataFrame(
            [("g1", "chr1", 100, 200), ("g2", "chr1", 500, 600),
             ("g3", "chr2", 100, 200)],
            ["id", "seqid", "start", "end"],
        )
        b = spark.createDataFrame(
            [("r1", "chr1", 150, 160),   # inside g1
             ("r2", "chr1", 200, 300),   # touches g1 at base 200 (inclusive!)
             ("r3", "chr1", 201, 300),   # adjacent, no overlap
             ("r4", "chr1", 90, 700),    # spans g1 and g2
             ("r5", "chr2", 150, 150),   # point interval inside g3
             ("r6", "chr3", 100, 200)],  # wrong sequence
            ["id", "seqid", "start", "end"],
        )
        got = _pairs(overlap_join(a, b, bin_size=50))
        assert got == [
            ("g1", "r1"), ("g1", "r2"), ("g1", "r4"),
            ("g2", "r4"), ("g3", "r5"),
        ]

    def test_multi_bin_pair_appears_once(self, spark):
        # overlap spans many bins at bin_size=10 -> still exactly 1 row
        a = spark.createDataFrame([("g", "c", 1, 95)], ["id", "seqid", "start", "end"])
        b = spark.createDataFrame([("r", "c", 5, 90)], ["id", "seqid", "start", "end"])
        out = overlap_join(a, b, bin_size=10)
        assert out.count() == 1

    def test_malformed_interval_dropped(self, spark):
        a = spark.createDataFrame([("g", "c", 50, 40)], ["id", "seqid", "start", "end"])
        b = spark.createDataFrame([("r", "c", 1, 100)], ["id", "seqid", "start", "end"])
        assert overlap_join(a, b, bin_size=10).count() == 0

    def test_random_equivalence_with_theta_join(self, spark):
        rng = random.Random(42)
        mk = lambda n, tag: [
            (f"{tag}{i}", rng.choice(["c1", "c2"]), s, s + rng.randint(0, 120))
            for i in range(n)
            for s in [rng.randint(1, 500)]
        ]
        a = spark.createDataFrame(mk(40, "a"), ["id", "seqid", "start", "end"])
        b = spark.createDataFrame(mk(40, "b"), ["id", "seqid", "start", "end"])
        fast = _pairs(overlap_join(a, b, bin_size=64))
        aa, bb = a.alias("x"), b.alias("y")
        naive = sorted(
            (r["ia"], r["ib"])
            for r in aa.join(
                bb,
                (F.col("x.seqid") == F.col("y.seqid"))
                & (F.col("x.start") <= F.col("y.end"))
                & (F.col("y.start") <= F.col("x.end")),
            )
            .select(F.col("x.id").alias("ia"), F.col("y.id").alias("ib"))
            .collect()
        )
        assert fast == naive and len(naive) > 20

    def test_plan_is_equi_join_not_cartesian(self, spark):
        a = spark.createDataFrame(
            [("g", "c", 1, 10)], ["id", "seqid", "start", "end"]
        )
        b = spark.createDataFrame(
            [("r", "c", 5, 15)], ["id", "seqid", "start", "end"]
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            p = overlap_join(a, b)._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in p
            assert "BroadcastNestedLoopJoin" not in p
            assert "SortMergeJoin" in p  # keyed on (seqid, bin)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestMergeOverlapping:
    def test_golden(self, spark):
        df = spark.createDataFrame(
            [("c1", 1, 10), ("c1", 5, 20), ("c1", 20, 30),   # one span 1-30
             ("c1", 32, 40),                                  # gap of 1 -> separate
             ("c2", 1, 5)],
            ["seqid", "start", "end"],
        )
        got = sorted(
            (r["seqid"], r["start"], r["end"], r["n_merged"])
            for r in merge_overlapping(df).collect()
        )
        assert got == [("c1", 1, 30, 3), ("c1", 32, 40, 1), ("c2", 1, 5, 1)]

    def test_gap_merges_bookended(self, spark):
        df = spark.createDataFrame(
            [("c1", 1, 10), ("c1", 11, 20)], ["seqid", "start", "end"]
        )
        assert merge_overlapping(df).count() == 2
        assert merge_overlapping(df, gap=1).count() == 1

    def test_contained_interval(self, spark):
        # second interval entirely inside the first; running-max (not
        # lag) semantics must still bridge to the third
        df = spark.createDataFrame(
            [("c1", 1, 100), ("c1", 10, 20), ("c1", 90, 150)],
            ["seqid", "start", "end"],
        )
        got = merge_overlapping(df).collect()
        assert len(got) == 1 and got[0]["end"] == 150

    def test_random_equivalence(self, spark):
        rng = random.Random(7)
        rows = [
            ("c", s, s + rng.randint(0, 30))
            for _ in range(60)
            for s in [rng.randint(1, 300)]
        ]
        df = spark.createDataFrame(rows, ["seqid", "start", "end"])
        got = sorted(
            (r["start"], r["end"]) for r in merge_overlapping(df).collect()
        )
        # python reference
        exp = []
        for s, e in sorted((s, e) for _, s, e in rows):
            if exp and s <= exp[-1][1]:
                exp[-1][1] = max(exp[-1][1], e)
            else:
                exp.append([s, e])
        assert got == [tuple(x) for x in exp]


class TestCoverage:
    def test_golden_bins(self, spark):
        df = spark.createDataFrame(
            [("c1", 0, 999), ("c1", 500, 2500), ("c2", 1000, 1001)],
            ["seqid", "start", "end"],
        )
        got = {
            (r["seqid"], r["bin_start"]): r["n_intervals"]
            for r in coverage(df, bin_size=1000).collect()
        }
        assert got == {
            ("c1", 0): 2, ("c1", 1000): 1, ("c1", 2000): 1, ("c2", 1000): 1,
        }


class TestSubtract:
    def test_subtract_golden(self, spark):
        """bedtools-subtract semantics on a hand example: covering,
        splitting, edge-touching, and untouched cases."""
        from virapipe_spark.intervals import subtract

        a = spark.createDataFrame(
            [
                ("a1", "c1", 100, 200),  # split by [120,140] and [160,170]
                ("a2", "c1", 300, 320),  # fully covered by [290, 330]
                ("a3", "c1", 400, 450),  # untouched
                ("a4", "c2", 100, 200),  # other sequence: b on c1 ignored
                ("a5", "c1", 500, 520),  # b overlaps the left edge
            ],
            "id STRING, seqid STRING, start LONG, end LONG",
        )
        b = spark.createDataFrame(
            [
                ("b1", "c1", 120, 130),
                ("b2", "c1", 125, 140),  # merges with b1 -> [120,140]
                ("b3", "c1", 160, 170),
                ("b4", "c1", 290, 330),
                ("b5", "c1", 490, 505),
            ],
            "id STRING, seqid STRING, start LONG, end LONG",
        )
        got = sorted(
            tuple(r)
            for r in subtract(a, b).select(
                "id", "seqid", "seg_start", "seg_end"
            ).collect()
        )
        assert got == sorted(
            [
                ("a1", "c1", 100, 119),
                ("a1", "c1", 141, 159),
                ("a1", "c1", 171, 200),
                ("a3", "c1", 400, 450),
                ("a4", "c2", 100, 200),
                ("a5", "c1", 506, 520),
            ]
        )
