"""End-to-end mirror of the reference's WHOLE pipeline
(scripts/virapipe.sh:38-63): a user of ViraPipe runs

  decompress -> interleave/filter -> normalize -> assemble (MegaHit)
  -> blastn -> taxonomy+threshold filter -> write

as 7 spark-submit programs chained through HDFS. This test runs the
same chain as ONE lazy DataFrame pipeline on this engine, with the
external binaries replaced by deterministic doubles (the harness never
shells out), and asserts row flow at every stage boundary.
"""

from __future__ import annotations

import glob
import gzip
import os

from pyspark.sql import functions as F

from virapipe_spark import functions as vf
from virapipe_spark import io as vio
from virapipe_spark import tools
from virapipe_spark.pipeline import Pipeline

FASTQ_GZ_TEXT = """\
@S1:12:FCA123:1:1101:1000:2000 1:N:0:ACGTACGT
ATGAAATTTGGGTAAACG
+
IIIIIIIIIIIIIIIIII
@S1:12:FCA123:1:1101:1000:2000 2:N:0:ACGTACGT
CGTTTACCCAAATTTCAT
+
IIIIIIIIIIIIIIHHHH
@S2:12:FCA123:1:1102:1500:2500 1:N:0:TTTTCCCC
ATGCCCGGGAAATAAGGG
+
JJJJJJJJJJJJJJJJJJ
@S2:12:FCA123:1:1102:1500:2500 2:N:0:TTTTCCCC
CCCTTATTTCCCGGGCAT
+
JJJJJJJJJJJJJJJJII
@S3:12:FCA123:2:1103:1700:2700 1:N:0:GGGGAAAA
ACGTNACGTNACGTNACG
+
##################
@S3:12:FCA123:2:1103:1700:2700 2:N:0:GGGGAAAA
CGTNACGTNACGTNACGT
+
######IIII########
"""


def fake_megahit(fastq_text: str) -> str:
    """Deterministic 'assembly': one contig per input read pair,
    concatenating the pair's sequences (enough to carry real bases to
    the blast stage)."""
    seqs: dict[str, list[str]] = {}
    lines = fastq_text.splitlines()
    for i in range(0, len(lines) - 3, 4):
        name = lines[i][1:].split()[0].split("/")[0]
        seqs.setdefault(name, []).append(lines[i + 1])
    out = []
    for n, (name, parts) in enumerate(sorted(seqs.items()), start=1):
        out.append(f">k141_{n} reads={len(parts)}")
        out.append("".join(parts))
    return "\n".join(out) + "\n"


def fake_blastn(fasta_text: str) -> str:
    """Deterministic 'blastn': contigs containing the k141_1 ORF get a
    strong viral hit; others get a weak hit below the 70/70 threshold."""
    out = []
    cid = None
    for line in fasta_text.splitlines():
        if line.startswith(">"):
            cid = line[1:].split()[0]
        elif cid:
            if "ATGAAATTTGGG" in line:
                qend = len(line)
                out.append(
                    f"{cid}\tNC_001.1\t95.0\t{qend}\t1\t0\t1\t{qend}\t500\t{500+qend}\t1e-40\t150.0"
                )
            else:
                out.append(
                    f"{cid}\tNC_999.9\t50.0\t5\t3\t1\t1\t5\t10\t15\t0.5\t20.0"
                )
            cid = None
    return "\n".join(out) + "\n"


def test_full_virapipe_chain(spark, tmp_path):
    # --- stage 0: compressed FASTQ lands (Decompress.java is a no-op
    # for us: Spark reads .gz transparently)
    fq = tmp_path / "sample.fastq.gz"
    with gzip.open(fq, "wt") as f:
        f.write(FASTQ_GZ_TEXT)
    reads = vio.read_fastq(spark, str(fq))
    assert reads.count() == 6

    pipe = Pipeline()

    # --- stage 1: quality filter (FastqFilter pattern: drop the pair if
    # either mate fails avg quality)
    @pipe.stage("quality_filter")
    def quality_filter(df):
        passed = df.withColumn("ok", vf.avg_quality_pass("quality", 40.0))
        pair_ok = passed.groupBy("key").agg(
            F.min(F.col("ok").cast("int")).alias("pair_ok")
        )
        return (
            df.join(pair_ok, "key")
            .filter(F.col("pair_ok") == 1)
            .drop("pair_ok")
        )

    # --- stage 2: dedup by read identity (FastqFilter.java:88-94)
    @pipe.stage("dedup")
    def dedup(df):
        return df.dropDuplicates(["key", "read"])

    # --- stage 3: digital normalization (NormalizeRDD shape; band wide
    # open at this fixture size)
    @pipe.stage("normalize")
    def normalize(df):
        km = df.select(
            "key", "read", F.explode(vf.kmers("sequence", 4)).alias("kmer")
        )
        keep = (
            km.groupBy("kmer")
            .agg(F.count("*").alias("c"), F.min("key").alias("rep"))
            .filter(F.col("c") < 100)
            .select(F.col("rep").alias("key"))
            .distinct()
        )
        return df.join(keep, "key", "left_semi")

    # --- stage 4: assemble (MegaHit double) — checkpointed like the
    # reference's HDFS hand-off
    assemble = tools.megahit_assemble(runner=fake_megahit)
    pipe.stages.append(
        type(pipe.stages[0])(
            "assemble", lambda df: assemble(df), str(tmp_path / "contigs_ckpt")
        )
    )

    # --- stage 5: blastn (double)
    blast = tools.blastn("viral_db", runner=fake_blastn)

    @pipe.stage("blastn")
    def run_blast(df):
        hits = blast(df)
        # BlastNFilter pattern: left join contigs to hits, keep contigs
        # whose best hit clears overlap+identity (float semantics)
        joined = df.join(hits, df["id"] == hits["qseqid"], "left_outer")
        overlap = (
            (F.col("qend") - F.col("qstart") + 1)
            / F.length(df["sequence"])
            * 100
        )
        return (
            joined.filter(
                F.col("qseqid").isNull()  # no-hit contigs always kept
                | ((overlap > 70) & (F.col("pident") > 70))
            )
            .select(df["id"], df["sequence"], "pident")
        )

    result = pipe.run(reads)

    # the checkpoint materialized (reference directory contract)
    assert glob.glob(os.path.join(str(tmp_path / "contigs_ckpt"), "*.parquet"))

    rows = {r["id"]: r for r in result.collect()}
    # S3's pair failed quality -> 2 surviving pairs -> 2 contigs;
    # k141_1 (S1, carries the ORF) clears the blast threshold,
    # k141_2 (S2) has only the weak hit -> dropped
    assert set(rows) == {"k141_1"}
    assert rows["k141_1"]["pident"] == 95.0

    # --- stage 6: write the surviving contigs as FASTA (SplitFasta /
    # BlastNFilter.java:194 output contract) and round-trip them
    out = str(tmp_path / "survivors_fasta")
    vio.write_fasta(result.select("id", "sequence"), out)
    back = vio.read_fasta(spark, out)
    assert back.count() == 1
    assert back.first()["id"] == "k141_1"
