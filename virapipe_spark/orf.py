"""Six-frame ORF translation (SURVEY.md §2.8 `dna2orf`/`dnaOrfGenerator`).

The one genuinely stateful scalar operation in the reference
(ORF.scala:43-165): scanning a reading frame for open reading frames is
an imperative loop over codons, out of reach of Catalyst built-ins — so
it runs as an Arrow-batched pandas UDF (the engine's only Python UDF).

Semantics implemented are the reference's *intended* ones; its as-written
bugs are documented in QUIRKS.md and deliberately not reproduced:

- reverse complement keeps the final base (ORF.scala:36-38 drops it);
- frames 2/3 are ``seq[1:]`` / ``seq[2:]`` (ORF.scala:151-156 also
  truncates the tail);
- preserved behaviors: alternative start codons ATG/TTG/GTG/CTG, ORF ends
  at the first in-frame stop (stop included in the DNA span, excluded
  from the protein), minimum length measured on the DNA span, ORFs
  lacking a stop codon are not emitted, and later start codons inside an
  already-emitted ORF are suppressed (ORF.scala:90-118 ``start >
  tmp_end``).

Scale: the UDF is a black box to Catalyst — predicate pushdown stops at
its boundary, so callers must place filters (length, quality, dedup)
*before* :func:`orf_expand` (SURVEY §4.3). Within the UDF, work is
Arrow-batched and per-partition; no state crosses rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Standard genetic code (codon -> amino acid, '*' = stop). Public
#: knowledge; same table as ORF.scala:58-75.
CODON2AA = {
    "ATA": "I", "ATC": "I", "ATT": "I", "ATG": "M",
    "ACA": "T", "ACC": "T", "ACG": "T", "ACT": "T",
    "AAC": "N", "AAT": "N", "AAA": "K", "AAG": "K",
    "AGC": "S", "AGT": "S", "AGA": "R", "AGG": "R",
    "CTA": "L", "CTC": "L", "CTG": "L", "CTT": "L",
    "CCA": "P", "CCC": "P", "CCG": "P", "CCT": "P",
    "CAC": "H", "CAT": "H", "CAA": "Q", "CAG": "Q",
    "CGA": "R", "CGC": "R", "CGG": "R", "CGT": "R",
    "GTA": "V", "GTC": "V", "GTG": "V", "GTT": "V",
    "GCA": "A", "GCC": "A", "GCG": "A", "GCT": "A",
    "GAC": "D", "GAT": "D", "GAA": "E", "GAG": "E",
    "GGA": "G", "GGC": "G", "GGG": "G", "GGT": "G",
    "TCA": "S", "TCC": "S", "TCG": "S", "TCT": "S",
    "TTC": "F", "TTT": "F", "TTA": "L", "TTG": "L",
    "TAC": "Y", "TAT": "Y", "TAA": "*", "TAG": "*",
    "TGC": "C", "TGT": "C", "TGA": "*", "TGG": "W",
}

START_CODONS = ("ATG", "TTG", "GTG", "CTG")

_COMPLEMENT = str.maketrans("ATCGN", "TAGCN")

#: One row per ORF produced by orf_expand.
ORF_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("strand", T.StringType()),     # 'forw' | 'rev'
        T.StructField("frame", T.IntegerType()),      # 1 | 2 | 3
        T.StructField("orf_nr", T.IntegerType()),     # 1-based per (id,strand,frame)
        T.StructField("start", T.IntegerType()),      # 0-based within the frame
        T.StructField("end", T.IntegerType()),        # exclusive, incl. stop codon
        T.StructField("protein", T.StringType()),     # stop '*' trimmed
        T.StructField("dna", T.StringType()),         # incl. stop codon
    ]
)


def reverse_complement_py(seq: str) -> str:
    """Pure-Python full-length reverse complement (the Column version is
    functions.reverse_complement)."""
    return seq.upper().translate(_COMPLEMENT)[::-1]


def scan_frame(seq: str, min_length: int) -> list[tuple[int, int, str]]:
    """Scan ONE reading frame (``seq`` already offset) left to right.

    Returns ``(start, end, protein)`` spans: start at ATG/TTG/GTG/CTG,
    end exclusive after the first in-frame stop, ``end - start >=
    min_length``, overlapping later starts suppressed.

    Boundary semantics match the reference exactly (ORF.scala:100
    ``start > tmp_end`` — strict): a new ORF starting at the previous
    ORF's exact end position is suppressed too, except that the first
    emitted ORF of a frame has no such constraint (ORF.scala:95
    ``nrorf == 0`` branch).
    """
    n = len(seq)
    orfs: list[tuple[int, int, str]] = []
    last_end = 0
    i = 0
    while i + 3 <= n:
        if seq[i : i + 3] in START_CODONS and (not orfs or i > last_end):
            protein = []
            j = i
            while j + 3 <= n:
                aa = CODON2AA.get(seq[j : j + 3])
                if aa is None:  # codon with N etc. — reference skips silently
                    break
                if aa == "*":
                    if (j + 3) - i >= min_length:
                        orfs.append((i, j + 3, "".join(protein)))
                        last_end = j + 3
                    break
                protein.append(aa)
                j += 3
        i += 3
    return orfs


def orfs_for_sequence(id_: str, seq: str, min_length: int) -> list[dict]:
    """All ORFs in all 6 frames (3 forward + 3 on the reverse
    complement) — `dnaOrfGenerator` (ORF.scala:125-165)."""
    seq = (seq or "").upper()
    out: list[dict] = []
    for strand, s in (("forw", seq), ("rev", reverse_complement_py(seq))):
        for frame in (1, 2, 3):
            sub = s[frame - 1 :]
            for nr, (start, end, protein) in enumerate(
                scan_frame(sub, min_length), start=1
            ):
                out.append(
                    {
                        "id": id_,
                        "strand": strand,
                        "frame": frame,
                        "orf_nr": nr,
                        "start": start,
                        "end": end,
                        "protein": protein,
                        "dna": sub[start:end],
                    }
                )
    return out


def orf_expand(
    df: DataFrame,
    id_col: str = "id",
    seq_col: str = "sequence",
    min_length: int = 30,
) -> DataFrame:
    """Explode each (id, sequence) row into one row per ORF (6 frames).

    ``mapInPandas``: Arrow-batched, schema-pinned, executor-parallel.
    Catalyst cannot see inside — apply row filters BEFORE this call.
    """
    fields = [f.name for f in ORF_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for id_, seq in zip(pdf[id_col], pdf[seq_col]):
                rows.extend(orfs_for_sequence(id_, seq, min_length))
            yield pd.DataFrame(rows, columns=fields)

    return df.select(id_col, seq_col).mapInPandas(gen, ORF_SCHEMA)


def protein_fasta(orfs: DataFrame) -> DataFrame:
    """ORF rows -> protein FASTA lines, header
    ``>id_strand_frame_nr`` (ORF.scala:101, Protein_RDD.scala:59-66)."""
    return orfs.select(
        F.format_string(
            ">%s_%s_%d_%d\n%s",
            F.col("id"),
            F.col("strand"),
            F.col("frame"),
            F.col("orf_nr"),
            F.col("protein"),
        ).alias("value")
    )


def codon_histogram(orfs: DataFrame) -> DataFrame:
    """64-codon usage histogram over ORF DNA (Codondict.scala:9-55) —
    back in built-in land: explode + hash aggregate, no UDF."""
    from virapipe_spark.functions import codons

    return (
        orfs.select(F.explode(codons("dna", 0)).alias("codon"))
        .groupBy("codon")
        .agg(F.count("*").alias("n"))
    )
