"""Explicit StructType schemas for the four reference record types.

The reference infers these by reflection over JavaBeans
(``createDataFrame(rdd, MyRead.class)`` — reference
``SQLQueryFastq.java:91``, ``SQLQueryBAM.java:68``,
``SQLQueryBlast.java:99``); here they are declared once, explicitly.
All types are primitives + nullable, matching the boxed-Java semantics
(nulls per field are legal — reference ``SQLQueryBlast.java:81-92``).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: FASTQ sequenced read — fields of the ``MyRead`` bean
#: (reference ``MyRead.java:12-28``). Paired-end mates share ``key`` and
#: carry ``read`` = 1 / 2; the reference pairs them positionally instead.
READS = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("start", T.LongType(), True),
        T.StructField("end", T.LongType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("quality", T.StringType(), True),
        T.StructField("instrument", T.StringType(), True),
        T.StructField("runNumber", T.IntegerType(), True),
        T.StructField("flowcellId", T.StringType(), True),
        T.StructField("lane", T.IntegerType(), True),
        T.StructField("tile", T.IntegerType(), True),
        T.StructField("xpos", T.IntegerType(), True),
        T.StructField("ypos", T.IntegerType(), True),
        T.StructField("read", T.IntegerType(), True),
        T.StructField("filterPassed", T.BooleanType(), True),
        T.StructField("controlNumber", T.IntegerType(), True),
        T.StructField("indexSequence", T.StringType(), True),
    ]
)

#: SAM/BAM alignment — fields of the ``MyAlignment`` bean
#: (reference ``MyAlignment.java:12-19``); the full SAM flag word is
#: reduced to two booleans exactly as the reference does.
ALIGNMENTS = T.StructType(
    [
        T.StructField("readName", T.StringType(), True),
        T.StructField("start", T.IntegerType(), True),
        T.StructField("referenceName", T.StringType(), True),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("bases", T.StringType(), True),
        T.StructField("cigar", T.StringType(), True),
        T.StructField("readUnmapped", T.BooleanType(), True),
        T.StructField("duplicateRead", T.BooleanType(), True),
    ]
)

#: BLAST tabular hit (outfmt 6) — ``BlastRecord.java:14-25``; column
#: order documented at ``BlastRecord.java:12-13``.
BLAST_HITS = T.StructType(
    [
        T.StructField("qseqid", T.StringType(), True),
        T.StructField("sseqid", T.StringType(), True),
        T.StructField("pident", T.DoubleType(), True),
        T.StructField("length", T.IntegerType(), True),
        T.StructField("mismatch", T.IntegerType(), True),
        T.StructField("gapopen", T.IntegerType(), True),
        T.StructField("qstart", T.LongType(), True),
        T.StructField("qend", T.LongType(), True),
        T.StructField("sstart", T.LongType(), True),
        T.StructField("send", T.LongType(), True),
        T.StructField("evalue", T.DoubleType(), True),
        T.StructField("bitscore", T.DoubleType(), True),
    ]
)

#: FASTA contig — id = first word of the ``>`` header line, sequence =
#: concatenated remaining lines (reference ``BlastNFilter.java:163-170``).
CONTIGS = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
    ]
)

#: Default temp-view name for the generic SQL surface (reference default
#: ``-tablename records`` — ``SQLQueryFastq.java:29,65,92``).
DEFAULT_TABLE = "records"
