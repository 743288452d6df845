"""Golden + property tests for six-frame ORF translation
(virapipe_spark.orf; reference ORF.scala / Protein_RDD.scala)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from virapipe_spark import orf
from tests import fixtures


class TestScanFrame:
    def test_simple_orf(self):
        # ATG AAA TTT GGG TAA -> MKFG, stop incl. in DNA span
        got = orf.scan_frame("ATGAAATTTGGGTAA", min_length=6)
        assert got == [(0, 15, "MKFG")]

    def test_min_length_excludes(self):
        assert orf.scan_frame("ATGAAATTTGGGTAA", min_length=16) == []

    def test_no_stop_no_orf(self):
        assert orf.scan_frame("ATGAAATTTGGG", min_length=3) == []

    def test_alternative_starts(self):
        for start in ("ATG", "TTG", "GTG", "CTG"):
            got = orf.scan_frame(start + "TAA", min_length=3)
            assert len(got) == 1, start

    def test_out_of_frame_start_ignored(self):
        # start codon at offset 1 is not in this frame
        assert orf.scan_frame("CATGAAATAA", min_length=3) == []

    def test_overlapping_start_suppressed(self):
        # second ATG inside the first ORF must not re-emit
        # ATG ATG TAA -> one ORF (0,9); inner ATG at 3 < last_end
        got = orf.scan_frame("ATGATGTAA", min_length=3)
        assert got == [(0, 9, "MM")]

    def test_adjacent_start_suppressed(self):
        # an ORF starting exactly at the previous ORF's end is suppressed
        # (reference ORF.scala:100 uses strict start > tmp_end)
        s = "ATGTAA" + "ATGTGA"
        got = orf.scan_frame(s, min_length=3)
        assert got == [(0, 6, "M")]

    def test_two_disjoint_orfs(self):
        # a gap codon between the ORFs makes the second start > last_end
        s = "ATGTAA" + "CCC" + "ATGTGA"
        got = orf.scan_frame(s, min_length=3)
        assert got == [(0, 6, "M"), (9, 15, "M")]

    def test_n_codon_breaks_translation(self):
        assert orf.scan_frame("ATGNNNTAA", min_length=3) == []


class TestSixFrames:
    def test_forward_and_reverse_mirror(self):
        seq = "ATGAAATTTGGGTAA"
        fwd = orf.orfs_for_sequence("c", seq, 6)
        rev = orf.orfs_for_sequence("c", orf.reverse_complement_py(seq), 6)
        fwd_prot = sorted(o["protein"] for o in fwd)
        rev_prot = sorted(o["protein"] for o in rev)
        assert fwd_prot == rev_prot  # 6-frame scan is strand-symmetric

    @given(st.text(alphabet="ACGT", min_size=0, max_size=60))
    @settings(max_examples=25, deadline=None)
    def test_strand_symmetry_property(self, seq):
        a = sorted(o["protein"] for o in orf.orfs_for_sequence("x", seq, 9))
        b = sorted(
            o["protein"]
            for o in orf.orfs_for_sequence("x", orf.reverse_complement_py(seq), 9)
        )
        assert a == b

    def test_frame_offsets(self):
        # pad by 1 => same ORF appears in frame 2
        seq = "C" + "ATGAAATTTGGGTAA"
        got = [
            o for o in orf.orfs_for_sequence("c", seq, 6)
            if o["strand"] == "forw" and o["protein"] == "MKFG"
        ]
        assert got and got[0]["frame"] == 2


class TestSparkIntegration:
    @pytest.fixture(scope="class")
    def orfs_df(self, spark):
        return orf.orf_expand(
            fixtures.contigs_df(spark), "id", "sequence", min_length=6
        ).cache()

    def test_golden_contigs(self, orfs_df):
        rows = orfs_df.collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["id"], []).append(r)
        # k141_1 carries MKFG forward; k141_2 (its revcomp) carries it on rev
        k1 = [r for r in by_id["k141_1"] if r["protein"] == "MKFG"]
        assert any(r["strand"] == "forw" and r["frame"] == 1 for r in k1)
        k2 = [r for r in by_id.get("k141_2", []) if r["protein"] == "MKFG"]
        assert any(r["strand"] == "rev" for r in k2)
        # ORF-free contigs yield nothing
        assert "k141_3" not in by_id and "k141_4" not in by_id

    def test_protein_fasta_format(self, orfs_df):
        lines = [r["value"] for r in orf.protein_fasta(orfs_df).collect()]
        assert any(l.startswith(">k141_1_forw_1_1\n") for l in lines)

    def test_codon_histogram(self, spark, orfs_df):
        hist = {r["codon"]: r["n"] for r in orf.codon_histogram(orfs_df).collect()}
        # MKFG*: ATG AAA TTT GGG TAA appears on k141_1 fwd and k141_2 rev
        assert hist["ATG"] >= 2 and hist["TAA"] >= 2
        assert all(len(c) == 3 for c in hist)
