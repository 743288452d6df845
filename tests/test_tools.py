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
