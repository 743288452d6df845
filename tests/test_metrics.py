"""Assembly metrics: N50 golden cases (incl. the textbook example),
python-reference equivalence on random lengths, and GC content."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from virapipe_spark.metrics import assembly_stats, gc_content


def _one(df, col):
    return df.select(col.alias("v")).first()["v"]


class TestGcContent:
    def test_golden(self, spark):
        df = spark.createDataFrame(
            [("GCGC", "ATAT", "GCAT", "gcat", "GCNN", "")],
            "a string, b string, c string, d string, e string, f string",
        )
        assert _one(df, gc_content("a")) == 1.0
        assert _one(df, gc_content("b")) == 0.0
        assert _one(df, gc_content("c")) == 0.5
        assert _one(df, gc_content("d")) == 0.5   # case-insensitive
        assert _one(df, gc_content("e")) == 0.5   # N dilutes the denominator
        assert _one(df, gc_content("f")) is None  # empty -> null


class TestAssemblyStats:
    def _stats(self, spark, lengths):
        df = spark.createDataFrame([(n,) for n in lengths], "len long")
        return assembly_stats(df, length_col="len").first()

    def test_textbook_n50(self, spark):
        # lengths 50,40,30,20,10: total 150, half 75; cum 50,90 -> N50=40
        r = self._stats(spark, [10, 30, 50, 20, 40])
        assert r["n50"] == 40
        assert r["n_contigs"] == 5 and r["total_bp"] == 150
        assert r["max_len"] == 50 and r["mean_len"] == 30.0

    def test_single_contig_dominates(self, spark):
        assert self._stats(spark, [100, 5, 5, 5])["n50"] == 100

    def test_random_matches_python_reference(self, spark):
        rng = random.Random(3)
        lens = [rng.randint(1, 500) for _ in range(200)]
        got = self._stats(spark, lens)["n50"]
        total = sum(lens)
        cum = 0
        for length in sorted(lens, reverse=True):
            cum += length
            if cum * 2 >= total:
                expected = length
                break
        assert got == expected

    def test_from_sequence_column(self, spark):
        df = spark.createDataFrame(
            [("c1", "A" * 30), ("c2", "A" * 20), ("c3", "A" * 10)],
            ["id", "sequence"],
        )
        r = assembly_stats(df).first()
        assert r["n50"] == 30 and r["total_bp"] == 60


class TestObservation:
    def test_observed_metrics_ride_the_action(self, spark):
        """observe() accumulates metrics during the consuming action —
        one scan yields both the result and the telemetry; values match
        an explicit (second-pass) aggregate."""
        from virapipe_spark.metrics import observed

        df = spark.range(100).withColumn(
            "v", (F.col("id") % 10).cast("double")
        )
        inst, obs = observed(
            df.filter(F.col("id") % 2 == 0),
            "stage1",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").alias("v_sum"),
        )
        out = inst.groupBy().agg(F.count("*").alias("n")).collect()
        assert out[0]["n"] == 50
        got = obs.get
        assert got["n_rows"] == 50
        assert got["v_sum"] == 200.0
