"""Named tool-stage factories (virapipe_spark.tools) with pure-Python
doubles — the harness never shells out (SURVEY §7.5)."""

from __future__ import annotations

from virapipe_spark import tools
from tests import fixtures


class TestBlastN:
    def test_double_roundtrip(self, spark):
        def fake_blastn(fasta_text: str) -> str:
            out = []
            for line in fasta_text.splitlines():
                if line.startswith(">"):
                    cid = line[1:].split()[0]
                    out.append(
                        f"{cid}\tCM0001.1\t97.5\t100\t2\t0\t1\t100\t500\t599\t1e-50\t180.0"
                    )
            return "\n".join(out) + "\n"

        contigs = fixtures.contigs_df(spark)
        stage = tools.blastn("nt", runner=fake_blastn)
        hits = stage(contigs)
        rows = hits.collect()
        assert len(rows) == contigs.count()
        r = rows[0]
        assert r["pident"] == 97.5 and r["bitscore"] == 180.0
        assert hits.schema == stage.schema

    def test_malformed_lines_skipped(self, spark):
        stage = tools.blastn("nt", runner=lambda _: "short\tline\n\n")
        assert stage(fixtures.contigs_df(spark)).count() == 0


class TestHmmsearch:
    def test_double(self, spark):
        def fake_hmm(fasta_text: str) -> str:
            lines = ["# comment header"]
            for line in fasta_text.splitlines():
                if line.startswith(">"):
                    cid = line[1:].split()[0]
                    lines.append(f"{cid} - PF00001 acc 1e-10 42.5 rest")
            return "\n".join(lines) + "\n"

        hits = tools.hmmsearch("pfam.hmm", runner=fake_hmm)(
            fixtures.contigs_df(spark)
        )
        rows = {r["target"]: r for r in hits.collect()}
        assert len(rows) == 4
        assert all(r["score"] == 42.5 for r in rows.values())


class TestBwaAlign:
    def test_double_produces_typed_alignments(self, spark):
        def fake_bwa(fastq_text: str) -> str:
            out = ["@HD\tVN:1.6"]
            for i, line in enumerate(fastq_text.splitlines()):
                if line.startswith("@") and i % 4 == 0:
                    name = line[1:]
                    # every second read unmapped
                    flag = 4 if hash(name) % 2 else 0
                    out.append(
                        f"{name}\t{flag}\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII"
                    )
            return "\n".join(out) + "\n"

        reads = fixtures.reads_df(spark)
        aln = tools.bwa_align("ref.idx", runner=fake_bwa)(reads)
        rows = aln.collect()
        assert len(rows) == reads.count()
        assert {r["readUnmapped"] for r in rows} <= {True, False}
        assert all(r["bases"] == "ACGT" for r in rows)


class TestMegahit:
    def test_double_assembles_contigs(self, spark):
        def fake_megahit(fastq_text: str) -> str:
            n = sum(1 for l in fastq_text.splitlines() if l.startswith("@"))
            return f">k141_1 len=10\nACGTACGTAC\n>k141_2 len=6\nTTGGCC\nAATT\n# reads={n}\n"

        reads = fixtures.reads_df(spark).coalesce(1)
        contigs = tools.megahit_assemble(runner=fake_megahit)(reads)
        rows = {r["id"]: r["sequence"] for r in contigs.collect()}
        assert rows["k141_1"] == "ACGTACGTAC"
        # multi-line sequence concatenated; trailing record flushed by
        # the sentinel even with trailing junk after it
        assert rows["k141_2"] == "TTGGCC" + "AATT"


# ---------------------------------------------------------------------------
# Real-binary smokes (r8 VERDICT item 6): the ONLY tests allowed to shell
# out, and only when the tool is actually on PATH — this container ships
# none of them, so each skips with a reason here, but on a host with the
# bioinformatics stack installed the subprocess leg of ExternalTool gets
# exercised against the genuine argv at least once.
# ---------------------------------------------------------------------------

import shutil
import subprocess


def _require(*names: str) -> None:
    import pytest

    missing = [n for n in names if shutil.which(n) is None]
    if missing:
        pytest.skip(f"real binaries not installed: {', '.join(missing)}")


def _ref_seq(n: int = 300) -> str:
    import random

    return "".join(random.Random(0).choice("ACGT") for _ in range(n))


class TestRealBinaries:
    def test_real_blastn_smoke(self, spark, tmp_path):
        """makeblastdb a 300 bp pseudo-random reference, then run the
        REAL blastn stage over a contig copied verbatim from it — a
        hit is guaranteed (dust off), and it must parse into typed
        BLAST_HITS rows."""
        _require("blastn", "makeblastdb")
        ref = _ref_seq()
        fa = tmp_path / "ref.fa"
        fa.write_text(f">ref1\n{ref}\n")
        subprocess.run(
            ["makeblastdb", "-in", str(fa), "-dbtype", "nucl",
             "-out", str(tmp_path / "db")],
            check=True, capture_output=True,
        )
        contigs = spark.createDataFrame(
            [("c1", ref[50:150])], "id string, sequence string"
        )
        hits = tools.blastn(
            str(tmp_path / "db"), extra_args=["-dust", "no"]
        )(contigs).collect()
        assert hits and hits[0]["qseqid"] == "c1"
        assert hits[0]["pident"] == 100.0 and hits[0]["length"] >= 100

    def test_real_bwa_smoke(self, spark, tmp_path):
        """bwa index + the REAL `bwa mem -p` stage over one proper
        read pair drawn from the reference; both mates must come back
        mapped with their bases intact."""
        _require("bwa")
        comp = str.maketrans("ACGT", "TGCA")
        ref = _ref_seq()
        fa = tmp_path / "ref.fa"
        fa.write_text(f">ref1\n{ref}\n")
        subprocess.run(
            ["bwa", "index", str(fa)], check=True, capture_output=True
        )
        r1, r2 = ref[60:160], ref[140:240].translate(comp)[::-1]
        reads = spark.createDataFrame(
            [("p1/1", r1, "I" * 100), ("p1/2", r2, "I" * 100)],
            "key string, sequence string, quality string",
        ).coalesce(1)
        rows = tools.bwa_align(str(fa))(reads).collect()
        assert len(rows) >= 2
        assert all(not r["readUnmapped"] for r in rows)
        assert {r["bases"] for r in rows if r["bases"]} & {r1, r2}

    def test_real_hmmsearch_smoke(self, spark, tmp_path):
        """hmmbuild a single-sequence profile, then the REAL hmmsearch
        stage over contigs carrying that very protein — the tblout leg
        must parse into (target, query, evalue, score) rows."""
        _require("hmmsearch", "hmmbuild")
        prot = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ"
        msa = tmp_path / "seed.fa"
        msa.write_text(f">seed1\n{prot}\n")
        subprocess.run(
            ["hmmbuild", "--amino", str(tmp_path / "p.hmm"), str(msa)],
            check=True, capture_output=True,
        )
        contigs = spark.createDataFrame(
            [("t1", prot)], "id string, sequence string"
        )
        rows = tools.hmmsearch(str(tmp_path / "p.hmm"))(contigs).collect()
        assert rows and rows[0]["target"] == "t1"
        assert rows[0]["score"] > 0
