"""Golden + property tests for the genomics scalar layer
(virapipe_spark.functions, SURVEY.md §2.8)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from virapipe_spark import functions as vf
from tests import fixtures


@pytest.fixture(scope="module")
def reads(spark):
    return fixtures.reads_df(spark).cache()


def _one(df, col):
    return df.select(col.alias("v")).first()["v"]


class TestQuality:
    def test_quality_bytes(self, spark):
        df = spark.createDataFrame([("I#J",)], "quality string")
        assert _one(df, vf.quality_bytes("quality")) == [73, 35, 74]

    def test_avg_quality_golden(self, spark):
        # 'IIIII#####' = 5*73 + 5*35 -> 54.0
        df = spark.createDataFrame([("IIIII#####",)], "quality string")
        assert _one(df, vf.avg_quality("quality")) == pytest.approx(54.0)

    def test_avg_quality_empty_is_null(self, spark):
        df = spark.createDataFrame([("",)], "quality string")
        assert _one(df, vf.avg_quality("quality")) is None

    def test_low_quality_count(self, spark):
        df = spark.createDataFrame([("IIIII#####",)], "quality string")
        assert _one(df, vf.low_quality_count("quality", 40)) == 5
        assert _one(df, vf.low_quality_count("quality", 35)) == 0  # strict <

    def test_filters_on_fixture(self, reads):
        # avg>50 keeps everything except the all-'#' read (avg 35.0)
        kept = reads.filter(vf.avg_quality_pass("quality", 50.0))
        assert kept.count() == 7
        # low-q filter: <3 bytes below 40 drops both S3 reads (10 and 5)
        kept2 = reads.filter(vf.low_quality_pass("quality", 40, 3))
        assert kept2.count() == 6

    def test_pair_drop_semantics(self, reads):
        # The reference drops the whole pair if either mate fails
        # (FastqFilter.java:109-120): group by key, require min(pass).
        per_pair = (
            reads.withColumn("ok", vf.avg_quality_pass("quality", 50.0))
            .groupBy("key", "xpos")
            .agg(F.min("ok").alias("pair_ok"))
        )
        failed = per_pair.filter(~F.col("pair_ok"))
        assert failed.count() == 1  # only the S3 pair


class TestSequence:
    def test_reverse_complement_golden(self, spark):
        df = spark.createDataFrame([("ATGAAATTTGGGTAA",)], "sequence string")
        assert _one(df, vf.reverse_complement("sequence")) == "TTACCCAAATTTCAT"

    def test_reverse_complement_lowercase_and_n(self, spark):
        df = spark.createDataFrame([("acgtn",)], "sequence string")
        assert _one(df, vf.reverse_complement("sequence")) == "NACGT"

    @given(st.text(alphabet="ACGTN", min_size=0, max_size=40))
    @settings(max_examples=20, deadline=None)
    def test_reverse_complement_involution(self, s):
        # pure-Python mirror of the Column expression: revcomp(revcomp(s)) == s
        comp = str.maketrans("ATCGN", "TAGCN")
        assert s.translate(comp)[::-1].translate(comp)[::-1] == s

    def test_reverse_complement_involution_spark(self, spark):
        df = spark.createDataFrame([("ACGTNACGTN",)], "sequence string")
        twice = vf.reverse_complement(vf.reverse_complement("sequence"))
        assert _one(df, twice) == "ACGTNACGTN"

    def test_kmers_full_slide(self, spark):
        # len 5, k 3 -> 3 kmers; the reference's loop would emit only 1
        df = spark.createDataFrame([("ACGTA",)], "sequence string")
        assert _one(df, vf.kmers("sequence", 3)) == ["ACG", "CGT", "GTA"]

    def test_kmers_short_sequence_empty(self, spark):
        df = spark.createDataFrame([("AC",)], "sequence string")
        assert _one(df, vf.kmers("sequence", 3)) == []

    def test_kmers_exact_length(self, spark):
        df = spark.createDataFrame([("ACG",)], "sequence string")
        assert _one(df, vf.kmers("sequence", 3)) == ["ACG"]

    def test_codons_frames(self, spark):
        df = spark.createDataFrame([("ATGAAATTTGGGTAA",)], "sequence string")
        assert _one(df, vf.codons("sequence", 0)) == ["ATG", "AAA", "TTT", "GGG", "TAA"]
        assert _one(df, vf.codons("sequence", 1)) == ["TGA", "AAT", "TTG", "GGT"]
        assert _one(df, vf.codons("sequence", 2)) == ["GAA", "ATT", "TGG", "GTA"]

    def test_codons_bad_frame(self):
        with pytest.raises(ValueError):
            vf.codons("sequence", 3)


class TestNames:
    def test_sample_id(self, reads):
        ids = sorted(
            r["s"] for r in reads.select(vf.sample_id("key").alias("s")).distinct().collect()
        )
        assert ids == ["S1", "S2", "S3"]

    def test_mate_suffix(self, reads):
        df = reads.select(
            vf.mate_suffix("key", F.col("read") == 1).alias("m"), "read"
        )
        assert df.filter(F.col("m").endswith("/1")).count() == 4
        assert df.filter(F.col("m").endswith("/2")).count() == 4

    def test_fwd_rev_predicates(self, spark):
        df = spark.createDataFrame(
            [("r1 1:N:0:1",), ("r1 2:N:0:1",), ("r2/1",), ("r2/2",)], "key string"
        )
        assert df.filter(vf.is_forward_read("key")).count() == 2
        assert df.filter(vf.is_reverse_read("key")).count() == 2

    def test_fasta_fastq_format(self, spark):
        df = spark.createDataFrame([("c1", "ACGT", "IIII")], "id string, seq string, q string")
        assert _one(df, vf.fasta_record("id", "seq")) == ">c1\nACGT"
        assert _one(df, vf.fastq_record("id", "seq", "q")) == "@c1\nACGT\n+\nIIII"


class TestSam:
    def test_sam_field_extraction(self, spark):
        df = spark.createDataFrame([(l,) for l in fixtures.SAM_LINES], "line string")
        rows = df.select(
            vf.sam_field("line", "qname").alias("qname"),
            vf.sam_field("line", "flag").alias("flag"),
            vf.sam_field("line", "seq").alias("seq"),
            vf.sam_field("line", "qual").alias("qual"),
        ).collect()
        assert [r["qname"] for r in rows] == ["r1", "r2", "r3"]
        assert [r["flag"] for r in rows] == [0, 4, 77]
        assert [r["seq"] for r in rows] == ["ACGT", "TTTT", "GGCC"]

    def test_sam_unmapped_flag(self, spark):
        df = spark.createDataFrame([(0,), (4,), (77,), (141,)], "flag int")
        got = [r[0] for r in df.select(vf.sam_unmapped("flag")).collect()]
        assert got == [False, True, True, True]  # 77 & 141 include 0x4


class TestReadQC:
    """Round-4 QC scalars: sliding-window trim point and DUST-style
    low-complexity score (catalog-entry candidates for the next round's
    correctness window)."""

    def test_trim_point_keeps_clean_read(self, spark):
        df = spark.createDataFrame([("IIIIIIII",)], "q string")
        assert _one(df, vf.trim_point_sliding("q", window=4, min_avg=60)) == 8

    def test_trim_point_cuts_at_first_failing_window(self, spark):
        # 'IIII!!!!': window starts 1..5 average [73, 63, 53, 43, 33];
        # first window below 60 starts at position 3 -> keep 2 bytes
        df = spark.createDataFrame([("IIII!!!!",)], "q string")
        assert _one(df, vf.trim_point_sliding("q", window=4, min_avg=60)) == 2

    def test_trim_point_discards_all_bad(self, spark):
        df = spark.createDataFrame([("!!!!",)], "q string")
        assert _one(df, vf.trim_point_sliding("q", window=4, min_avg=60)) == 0

    def test_trim_point_short_read_kept_whole(self, spark):
        df = spark.createDataFrame([("!!",)], "q string")
        assert _one(df, vf.trim_point_sliding("q", window=4, min_avg=60)) == 2

    def test_trim_point_null_and_empty_quality(self, spark):
        """r11 review: the let-bound rewrite crashed on NULL quality
        (INVALID_INDEX_OF_ZERO via the descending start sequence over
        an empty byte array) where the old code returned NULL; the
        explicit isNull branch restores the contract. Empty string
        stays 0 (shorter than a window: kept whole)."""
        df = spark.createDataFrame([(None,), ("",)], "q string")
        got = [
            r["t"]
            for r in df.select(
                vf.trim_point_sliding("q", window=4, min_avg=60).alias("t")
            ).collect()
        ]
        assert got == [None, 0]

    def test_dust_extremes(self, spark):
        df = spark.createDataFrame([("AAAAAA", "ACGT", "AAA", "AA")],
                                   "rep string, div string, one string, short string")
        assert _one(df, vf.dust_score("rep")) == 1.0   # single repeated 3-mer
        assert _one(df, vf.dust_score("div")) == 0.0   # all 3-mers distinct
        assert _one(df, vf.dust_score("one")) == 0.0   # one k-mer: no pairs
        assert _one(df, vf.dust_score("short")) is None  # shorter than k

    def test_dust_matches_reference_formula(self, spark):
        from collections import Counter

        s = "ACGTACGTAAAACGT"
        grams = [s[i:i + 3] for i in range(len(s) - 2)]
        n = len(grams)
        expected = sum(c * (c - 1) for c in Counter(grams).values()) / (n * (n - 1))
        df = spark.createDataFrame([(s,)], "s string")
        assert abs(_one(df, vf.dust_score("s")) - expected) < 1e-12

    def test_dust_bounded_property(self, spark):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=15, deadline=None)
        @given(st.text(alphabet="ACGT", min_size=3, max_size=40))
        def prop(s):
            df = spark.createDataFrame([(s,)], "s string")
            v = _one(df, vf.dust_score("s"))
            assert 0.0 <= v <= 1.0

        prop()


class TestUdtf:
    def test_sentence_splitter_lateral_parity(self, spark):
        """UDTF lateral expansion == built-in split+posexplode pipeline
        (the JVM path catalog queries actually use); covers the Spark 4
        table-function API: typed multi-row output, SQL LATERAL, and
        the DataFrame lateralJoin surface."""
        from virapipe_spark.functions import sentence_splitter_udtf

        Split = sentence_splitter_udtf()
        spark.udtf.register("split_sentences", Split)
        df = spark.createDataFrame(
            [(1, "One. Two! Three?"), (2, "  no terminator"), (3, None)],
            ["id", "text"],
        )
        df.createOrReplaceTempView("t_udtf")
        got = spark.sql(
            "SELECT t.id, s.idx, s.sentence, s.n_chars "
            "FROM t_udtf t, LATERAL split_sentences(t.text) s"
        ).collect()
        rows = {(r["id"], r["idx"]): (r["sentence"], r["n_chars"]) for r in got}
        assert rows == {
            (1, 0): ("One.", 4),
            (1, 1): ("Two!", 4),
            (1, 2): ("Three?", 6),
            (2, 0): ("no terminator", 13),
        }
        # null text expands to zero rows, not a null row
        assert not [k for k in rows if k[0] == 3]
