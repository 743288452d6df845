"""Deterministic in-memory genomic fixtures (FIXTURES.md tables 1-4).

Small, hand-auditable rows — golden tests assert exact values, so
everything here is constructed, never random.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from virapipe_spark import schemas

#: Mate-paired FASTQ reads: keys appear exactly twice (read=1/2), plus one
#: duplicated pair (key S1:..:1000:2000 appears 4x) and one low-quality read.
READ_ROWS = [
    # key, start, end, pos, sequence, quality, instrument, runNumber,
    # flowcellId, lane, tile, xpos, ypos, read, filterPassed, controlNumber,
    # indexSequence
    ("S1:12:FCA123:1:1101:1000:2000", 0, 0, 0, "ACGTACGTAC", "IIIIIIIIII",
     "M00001", 12, "FCA123", 1, 1101, 1000, 2000, 1, True, 0, "ACGTACGT"),
    ("S1:12:FCA123:1:1101:1000:2000", 0, 0, 0, "GTACGTACGT", "IIIIIHHHHH",
     "M00001", 12, "FCA123", 1, 1101, 1000, 2000, 2, True, 0, "ACGTACGT"),
    # duplicate of the pair above (same key, different tile coords encoded
    # in x/y only) — exercises dedup-by-key
    ("S1:12:FCA123:1:1101:1000:2000", 0, 0, 0, "ACGTACGTAC", "IIIIIIIIII",
     "M00001", 12, "FCA123", 1, 1101, 1001, 2001, 1, True, 0, "ACGTACGT"),
    ("S1:12:FCA123:1:1101:1000:2000", 0, 0, 0, "GTACGTACGT", "IIIIIHHHHH",
     "M00001", 12, "FCA123", 1, 1101, 1001, 2001, 2, True, 0, "ACGTACGT"),
    # second sample, normal pair
    ("S2:12:FCA123:1:1102:1500:2500", 0, 0, 0, "TTGGCCAATT", "JJJJJJJJJJ",
     "M00001", 12, "FCA123", 1, 1102, 1500, 2500, 1, True, 0, None),
    ("S2:12:FCA123:1:1102:1500:2500", 0, 0, 0, "AATTGGCCAA", "JJJJJJJJII",
     "M00001", 12, "FCA123", 1, 1102, 1500, 2500, 2, True, 0, None),
    # low-quality pair member ('#' = ASCII 35) — fails avg-quality filters
    ("S3:12:FCA123:2:1103:1700:2700", 0, 0, 0, "ACGTNACGTN", "##########",
     "M00001", 12, "FCA123", 2, 1103, 1700, 2700, 1, False, 0, "TTTTCCCC"),
    ("S3:12:FCA123:2:1103:1700:2700", 0, 0, 0, "CCGGTTAACC", "IIIII#####",
     "M00001", 12, "FCA123", 2, 1103, 1700, 2700, 2, True, 0, "TTTTCCCC"),
]

#: Contigs: c1 holds a forward ORF (ATG...TAA), c2 its reverse complement
#: (so the ORF appears on the reverse strand), c3 is ORF-free, c4 is short.
CONTIG_ROWS = [
    ("k141_1", "ATGAAATTTGGGTAA"),            # ATG AAA TTT GGG TAA -> MKFG*
    ("k141_2", "TTACCCAAATTTCAT"),            # revcomp of k141_1
    ("k141_3", "CCCCCCCCCCCCCCC"),            # no start codon
    ("k141_4", "ACGT"),                       # too short for most ops
]

#: BLAST hits (outfmt 6): k141_1 has 2 hits (one above, one below the
#: 70/70 overlap+identity threshold), k141_3 one weak hit, k141_2/4 none.
BLAST_ROWS = [
    ("k141_1", "CM000001.1", 95.5, 12, 1, 0, 1, 12, 500, 511, 1e-30, 120.0),
    ("k141_1", "CM000002.1", 60.0, 5, 2, 1, 2, 6, 100, 104, 1e-3, 45.0),
    ("k141_3", "CM000003.1", 71.0, 4, 1, 0, 1, 4, 10, 13, 1e-2, 40.0),
]

#: Alignments: one mapped pair, one unmapped pair (flags as booleans,
#: matching the MyAlignment reduction).
ALIGNMENT_ROWS = [
    ("S1:12:FCA123:1:1101:1000:2000", 100, "chr1", 10, "ACGTACGTAC", "10M",
     False, False),
    ("S1:12:FCA123:1:1101:1000:2000", 160, "chr1", 10, "GTACGTACGT", "10M",
     False, False),
    ("S3:12:FCA123:2:1103:1700:2700", 0, "*", 10, "ACGTNACGTN", "*",
     True, False),
    ("S3:12:FCA123:2:1103:1700:2700", 0, "*", 10, "CCGGTTAACC", "*",
     True, False),
]

#: Raw SAM lines for the line-splitter functions (11 mandatory columns).
SAM_LINES = [
    "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tIIII",
    "r2\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\t####",
    "r3\t77\t*\t0\t0\t*\t*\t0\t0\tGGCC\tJJJJ",
]


def reads_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(READ_ROWS, schemas.READS)


def contigs_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(CONTIG_ROWS, schemas.CONTIGS)


def blast_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(BLAST_ROWS, schemas.BLAST_HITS)


def alignments_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ALIGNMENT_ROWS, schemas.ALIGNMENTS)
