"""Readers and writers for the reference's file formats (SURVEY.md §2.1-2.2).

Readers produce DataFrames with the explicit schemas of
:mod:`virapipe_spark.schemas`; writers are thin, format-preserving wrappers
over ``df.write``. Compressed inputs (``.gz``/``.bz2``) work through every
text-based reader transparently — Spark sniffs the codec by extension, the
same behavior the reference implements by hand with
``CompressionCodecFactory`` (Decompress.java:113-126).

Scale notes are inline per reader; the common theme: parallelism comes
from *many files* (the reference's own layout — one FASTQ pair per sample,
hundreds of samples) and from splittable uncompressed text. Nothing here
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from virapipe_spark import schemas
from virapipe_spark.functions import fasta_record, fastq_record, sam_field


def scratch_tag(spark: SparkSession, sf_dir: str) -> str:
    """8-hex tag keyed on (sf_dir, Spark applicationId) — the shared
    namespace for fixture scratch paths and scratch table names."""
    import hashlib

    appid = spark.sparkContext.applicationId
    return hashlib.md5(f"{sf_dir}:{appid}".encode()).hexdigest()[:8]


def scratch_dir(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Deterministic per-application scratch path for round-trip
    fixture writes (the catalog entries that exercise a writer+reader
    pair under the correctness gate).

    Keyed on (sf_dir, applicationId): repeated invocations within a
    session — bench reps, oracle checks — overwrite ONE directory
    instead of leaking a fresh mkdtemp per call (round-3 ADVICE), while
    concurrent sessions (a driver round beside a local bench/pytest
    run) get disjoint trees, so one session's ``mode="overwrite"``
    delete can never race another session's still-lazy read of the same
    files. The leak is bounded to one directory per application,
    reclaimed by normal /tmp hygiene. Local-mode assumption: the path
    must be visible to driver AND executors (true in local mode, where
    these fixture-writing entries run; a cluster deployment would point
    at a DFS scratch root instead)."""
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"vp_scratch_{scratch_tag(spark, sf_dir)}", name
    )


# ---------------------------------------------------------------------------
# FASTQ
# ---------------------------------------------------------------------------

#: Illumina read-name pattern: instrument:run:flowcell:lane:tile:x:y and the
#: optional comment "read:filter:control:index" (hadoop-bam parses the same
#: fields into SequencedFragment; projected at SQLQueryFastq.java:71-89).
_ILLUMINA_NAME = r"^([^:\s]+):(\d+):([^:\s]+):(\d+):(\d+):(\d+):(\d+)"
_ILLUMINA_COMMENT = r"\s([12]):([YN]):(\d+):(\S+)"


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """Read FASTQ (globs ok) into the ``reads`` schema (§1.1 row 1).

    The reference delegates stanza assembly to hadoop-bam's
    ``FastqInputFormat`` (SQLQueryFastq.java:69). Pure-Spark equivalent,
    fully DataFrame-native (no RDD hop — Catalyst/AQE stay engaged):

    1. ``spark.read.text`` (splittable; codec-transparent) plus the file
       source's ``_metadata`` columns (file path, block start offset);
    2. a gap-free per-file line index, built WITHOUT shuffling the data:
       per-(file, block) line counts aggregate map-side into one tiny
       row per ~128 MB scan block; a cumulative sum over each file's
       block list yields every block's base line number; broadcast-joined
       back, ``idx = block base + (monotonic id − block's min id)`` —
       valid because a block's rows are contiguous and consecutively
       numbered inside their scan partition, and deterministic because
       the id derives from the scan partition layout, which is fixed by
       the file listing (safe under task retry, unlike ids minted after
       a shuffle);
    3. ``groupBy(file, line_idx div 4)`` pivots the 4 stanza lines into
       one row, then Illumina-header parsing with ``regexp_extract``.

    Scale: the only full-data shuffle is the stanza pivot itself — the
    same cost class as the reference's own repartition stages
    (RepartitionFastq). The block-stats pass ships one row per block.
    Stanza grouping is per-file, so multi-file globs never interleave
    records across files.
    """
    from pyspark.sql import Window as W

    lines = (
        spark.read.text(path)
        .select(
            "value",
            F.col("_metadata.file_path").alias("__file"),
            F.col("_metadata.file_block_start").alias("__block"),
        )
        .withColumn("__mono", F.monotonically_increasing_id())
    )
    blocks = lines.groupBy("__file", "__block").agg(
        F.count("*").alias("__cnt"), F.min("__mono").alias("__mono0")
    )
    wf = W.partitionBy("__file").orderBy("__block")
    bases = blocks.select(
        "__file",
        "__block",
        "__mono0",
        (F.sum("__cnt").over(wf) - F.col("__cnt")).alias("__base"),
    )
    indexed = lines.join(F.broadcast(bases), ["__file", "__block"]).withColumn(
        "idx", F.col("__base") + (F.col("__mono") - F.col("__mono0"))
    )
    stanza = indexed.withColumn("stanza", F.col("idx") - (F.col("idx") % 4))
    line_of = F.col("idx") % 4

    def _line(n: int) -> Column:
        return F.max(F.when(line_of == n, F.col("value")))

    raw = stanza.groupBy("__file", "stanza").agg(
        _line(0).alias("header"),
        _line(1).alias("sequence"),
        _line(3).alias("quality"),
    )
    name = F.regexp_replace(F.col("header"), r"^@", "")

    def _part(pat: str, i: int, typ: str = "string") -> Column:
        v = F.regexp_extract(name, pat, i)
        c = F.when(v != "", v).cast(typ)
        return c

    return raw.select(
        name.alias("key"),
        F.lit(0).cast("long").alias("start"),
        F.lit(0).cast("long").alias("end"),
        F.lit(0).cast("long").alias("pos"),
        F.col("sequence"),
        F.col("quality"),
        _part(_ILLUMINA_NAME, 1).alias("instrument"),
        _part(_ILLUMINA_NAME, 2, "int").alias("runNumber"),
        _part(_ILLUMINA_NAME, 3).alias("flowcellId"),
        _part(_ILLUMINA_NAME, 4, "int").alias("lane"),
        _part(_ILLUMINA_NAME, 5, "int").alias("tile"),
        _part(_ILLUMINA_NAME, 6, "int").alias("xpos"),
        _part(_ILLUMINA_NAME, 7, "int").alias("ypos"),
        _part(_ILLUMINA_COMMENT, 1, "int").alias("read"),
        F.when(F.regexp_extract(name, _ILLUMINA_COMMENT, 2) == "N", True)
        .when(F.regexp_extract(name, _ILLUMINA_COMMENT, 2) == "Y", False)
        .alias("filterPassed"),
        _part(_ILLUMINA_COMMENT, 3, "int").alias("controlNumber"),
        _part(_ILLUMINA_COMMENT, 4).alias("indexSequence"),
    )


def write_fastq(df: DataFrame, path: str, mode: str = "error") -> None:
    """DataFrame(key, sequence, quality) -> 4-line FASTQ text.

    Writes the *actual* read name; the reference writes the literal
    string ``"key"`` for every record (SQLQueryFastq.java:117 — bug,
    QUIRKS.md).
    """
    df.select(
        fastq_record("key", "sequence", "quality").alias("value")
    ).write.mode(mode).text(path)


# ---------------------------------------------------------------------------
# FASTA
# ---------------------------------------------------------------------------


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Read ``>``-delimited FASTA into ``contigs(id, sequence)``.

    The reference sets ``textinputformat.record.delimiter='>'``
    (SplitFasta.java:41-43); Spark ≥3 exposes the same splittable record
    reader via ``lineSep``. id = first word of the header line, sequence =
    remaining lines concatenated (BlastNFilter.java:163-170); empty and
    headerless records dropped (FastaFilter.java:64-65).
    """
    recs = spark.read.text(path, lineSep=">")
    lines = F.split(F.regexp_replace(F.col("value"), "\r", ""), "\n")
    header = F.element_at(lines, 1)
    seq = F.concat_ws("", F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))))
    return (
        recs.filter(F.trim(F.col("value")) != "")
        .select(
            F.split(F.trim(header), r"\s+").getItem(0).alias("id"),
            seq.alias("sequence"),
        )
        .filter((F.length("id") > 0) & (F.length("sequence") > 0))
    )


def write_fasta(df: DataFrame, path: str, mode: str = "error") -> None:
    """DataFrame(id, sequence) -> FASTA text (BlastNFilter.java:194)."""
    df.select(fasta_record("id", "sequence").alias("value")).write.mode(mode).text(
        path
    )


# ---------------------------------------------------------------------------
# BLAST tabular (outfmt 6)
# ---------------------------------------------------------------------------


def read_blast(spark: SparkSession, path: str) -> DataFrame:
    """Read 12-column tab-separated BLAST output into ``blast_hits``.

    The reference splits and casts field-by-field with per-field null
    tolerance (SQLQueryBlast.java:74-97); ``spark.read.csv`` in PERMISSIVE
    mode has exactly those semantics, JVM-side, with column pruning.
    """
    return spark.read.csv(
        path, sep="\t", schema=schemas.BLAST_HITS, mode="PERMISSIVE"
    )


def write_blast_tab(df: DataFrame, path: str, sep: str = "\t", mode: str = "error") -> None:
    """Column-ordered TSV/CSV of blast hits — the reference hand-formats
    lines because Spark-2 ``df.write().csv`` "prints columns in wrong
    order" (comment at SQLQueryBlast.java:115); an explicit select pins
    the documented outfmt-6 order (BlastRecord.java:12-13)."""
    cols = [f.name for f in schemas.BLAST_HITS.fields]
    df.select(*cols).write.mode(mode).csv(path, sep=sep)


# ---------------------------------------------------------------------------
# SAM (text) -> typed alignments
# ---------------------------------------------------------------------------


def read_sam(spark: SparkSession, path: str) -> DataFrame:
    """Read SAM text into the ``alignments`` schema.

    Header lines (``@``-prefixed) are dropped; malformed fields go null
    (permissive casts), matching the reference's silent tolerance
    (HDFSWriter.java:109-128). The full flag word is reduced to the two
    booleans of ``MyAlignment`` (readUnmapped=0x4, duplicateRead=0x400 —
    MyAlignment.java:12-19).
    """
    lines = spark.read.text(path).filter(~F.col("value").startswith("@"))
    flag = sam_field("value", "flag")
    return lines.select(
        sam_field("value", "qname").alias("readName"),
        sam_field("value", "pos").alias("start"),
        sam_field("value", "rname").alias("referenceName"),
        F.length(sam_field("value", "seq")).cast("int").alias("length"),
        sam_field("value", "seq").alias("bases"),
        sam_field("value", "cigar").alias("cigar"),
        (flag.bitwiseAND(F.lit(4)) != 0).alias("readUnmapped"),
        (flag.bitwiseAND(F.lit(1024)) != 0).alias("duplicateRead"),
    )


def read_vcf(spark: SparkSession, path: str) -> DataFrame:
    """Read VCF (Variant Call Format v4.x) text into typed variant rows
    — a standard genomics source BEYOND the reference's inventory
    (VCFv4 spec is public; the reference stops at FASTQ/FASTA/SAM/BLAST).

    Schema: ``chrom pos(int) id ref alt qual(double) filter
    info(map<string,string>) samples(array<string>)``. ``##`` meta lines
    and the ``#CHROM`` header are dropped; '.' placeholders go null in
    id/qual/filter; multi-allelic ALT stays one comma-joined string (use
    ``explode(split(alt, ','))`` to normalize — a DataFrame op, not a
    reader concern); INFO parses to a map with flag-style keys (no '=')
    mapped to ``"true"``; FORMAT+genotype columns ride as a raw string
    array since their shape is header-dependent.

    Same scale shape as every text reader here: splittable line scan,
    all parsing is codegen'd string/map expressions, malformed fields
    null out permissively (the SAM reader's convention)."""
    lines = spark.read.text(path).filter(
        (~F.col("value").startswith("#")) & (F.length(F.trim(F.col("value"))) > 0)
    )
    f = F.split(F.col("value"), "\t")

    def fld(i: int) -> Column:
        return F.element_at(f, i)

    def null_dot(c: Column) -> Column:
        return F.when(c == ".", F.lit(None)).otherwise(c)

    info = F.map_from_entries(
        F.transform(
            F.split(fld(8), ";"),
            lambda kv: F.struct(
                F.split(kv, "=")[0].alias("key"),
                F.coalesce(
                    F.element_at(F.split(kv, "="), 2), F.lit("true")
                ).alias("value"),
            ),
        )
    )
    return lines.select(
        fld(1).alias("chrom"),
        fld(2).cast("int").alias("pos"),
        null_dot(fld(3)).alias("id"),
        fld(4).alias("ref"),
        fld(5).alias("alt"),
        null_dot(fld(6)).cast("double").alias("qual"),
        null_dot(fld(7)).alias("filter"),
        F.when(null_dot(fld(8)).isNotNull(), info)
        .otherwise(F.lit(None))
        .alias("info"),
        F.when(
            F.size(f) > 8, F.slice(f, 9, F.size(f) - 8)
        ).otherwise(F.array().cast("array<string>")).alias("samples"),
    )


def read_gff(spark: SparkSession, path: str) -> DataFrame:
    """Read GFF3 annotation text into typed feature rows — the second
    beyond-the-reference genomics source beside :func:`read_vcf` (GFF3
    spec is public).

    Schema: ``seqid source type start(int) end(int) score(double)
    strand phase(int) attributes(map<string,string>)``. ``#`` comment /
    directive lines are dropped; '.' placeholders null out in
    source/score/strand/phase; the column-9 ``key=value;...`` attribute
    string parses to a map (standard keys: ID, Parent, Name). Parent
    resolution (feature hierarchies) is a DataFrame self-join on
    ``attributes['Parent'] == attributes['ID']`` — an equi-join, not a
    reader concern. Splittable line scan, codegen-only parsing,
    permissive nulls — the house reader convention."""
    lines = spark.read.text(path).filter(
        (~F.col("value").startswith("#")) & (F.length(F.trim(F.col("value"))) > 0)
    )
    f = F.split(F.col("value"), "\t")

    def fld(i: int) -> Column:
        return F.element_at(f, i)

    def null_dot(c: Column) -> Column:
        return F.when(c == ".", F.lit(None)).otherwise(c)

    attrs = F.map_from_entries(
        F.transform(
            F.filter(F.split(fld(9), ";"), lambda kv: F.length(kv) > 0),
            lambda kv: F.struct(
                F.split(kv, "=")[0].alias("key"),
                F.coalesce(F.element_at(F.split(kv, "="), 2), F.lit("")).alias(
                    "value"
                ),
            ),
        )
    )
    return lines.select(
        fld(1).alias("seqid"),
        null_dot(fld(2)).alias("source"),
        fld(3).alias("type"),
        fld(4).cast("int").alias("start"),
        fld(5).cast("int").alias("end"),
        null_dot(fld(6)).cast("double").alias("score"),
        null_dot(fld(7)).alias("strand"),
        null_dot(fld(8)).cast("int").alias("phase"),
        F.when(null_dot(fld(9)).isNotNull(), attrs)
        .otherwise(F.lit(None))
        .alias("attributes"),
    )


def read_bed(spark: SparkSession, path: str) -> DataFrame:
    """Read BED interval text (UCSC BED spec, public) into typed rows —
    the third beyond-the-reference genomics source beside
    :func:`read_vcf` / :func:`read_gff`, feeding the intervals.py
    operators directly.

    Schema: ``chrom start(long,0-based) end(long,exclusive) name
    score(int) strand``; columns beyond the first three are optional
    per the spec, so missing trailing fields and '.' placeholders null
    out (BED3 files yield null name/score/strand). ``track``/
    ``browser``/``#`` header lines are dropped. Splittable line scan,
    codegen-only parsing, permissive nulls — the house reader
    convention."""
    lines = spark.read.text(path).filter(
        (~F.col("value").startswith("#"))
        & (~F.col("value").startswith("track"))
        & (~F.col("value").startswith("browser"))
        & (F.length(F.trim(F.col("value"))) > 0)
    )
    f = F.split(F.col("value"), "\t")

    def fld(i: int) -> Column:
        # F.get is 0-based and yields NULL past the last field, ANSI-safe
        # for the spec's optional trailing columns (element_at would
        # raise INVALID_ARRAY_INDEX on a BED3 line under ANSI mode)
        return F.get(f, i - 1)

    def null_dot(c: Column) -> Column:
        return F.when(c == ".", F.lit(None)).otherwise(c)

    return lines.select(
        fld(1).alias("chrom"),
        fld(2).cast("long").alias("start"),
        fld(3).cast("long").alias("end"),
        null_dot(fld(4)).alias("name"),
        null_dot(fld(5)).cast("int").alias("score"),
        null_dot(fld(6)).alias("strand"),
    )


def sam_to_fastq(alignments: DataFrame) -> DataFrame:
    """SAM/BAM records -> FASTQ-shaped rows (SamToFastq.java:47-68).

    Returns (key, sequence, quality) rows ready for :func:`write_fastq`.
    The reference suffixes ``/1``/``/2`` by the first-of-pair flag; the
    typed ``alignments`` table has no flag word, so mates are numbered by
    their order within each readName (deterministic window, not file
    order — SURVEY §7.5 non-determinism note). Any 3rd+ alignment of a
    read (supplementary/secondary) is dropped rather than mislabeled
    ``/2`` — the reference's flag test would exclude those too.

    ``MyAlignment`` carries no base qualities (MyAlignment.java:12-19),
    so quality is a placeholder run of ``I`` (Phred 40) matching the
    sequence length — valid FASTQ, clearly synthetic.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("readName").orderBy("start", "bases")
    rn = F.row_number().over(w)
    return (
        alignments.withColumn("__mate", rn)
        .filter(F.col("__mate") <= 2)
        .select(
            F.concat(
                F.col("readName"),
                F.when(F.col("__mate") == 1, F.lit("/1")).otherwise(F.lit("/2")),
            ).alias("key"),
            F.col("bases").alias("sequence"),
            F.repeat(F.lit("I"), F.length("bases")).alias("quality"),
        )
    )


def write_sam(
    df: DataFrame, path: str, header: list[str] | None = None, mode: str = "error"
) -> None:
    """SAM text write with per-file header injection
    (HDFSWriter.java:62-91,247-262).

    The reference's ``KeyIgnoringBAMOutputFormat`` subclass writes the
    broadcast header into EVERY output file so each part is independently
    a valid SAM; mirrored here by prepending the header lines to each
    partition (``mapInPandas`` — partitions map 1:1 to output files, and
    the header is a tiny Python list captured by closure, the same role
    as the reference's broadcast variable). The flag word is rebuilt from
    the two booleans the typed schema keeps (0x4 unmapped, 0x400
    duplicate — MyAlignment.java:12-19); untracked SAM columns write as
    their ``*``/0 placeholders. BAM binary encoding is external-tool
    territory (SURVEY §2.2).
    """
    flag = (
        F.when(F.col("readUnmapped"), F.lit(4)).otherwise(F.lit(0))
        + F.when(F.col("duplicateRead"), F.lit(1024)).otherwise(F.lit(0))
    )
    line = F.concat_ws(
        "\t",
        F.col("readName"),
        flag.cast("string"),
        F.coalesce(F.col("referenceName"), F.lit("*")),
        F.coalesce(F.col("start").cast("string"), F.lit("0")),
        F.lit("255"),
        F.coalesce(F.col("cigar"), F.lit("*")),
        F.lit("*"),
        F.lit("0"),
        F.lit("0"),
        F.coalesce(F.col("bases"), F.lit("*")),
        F.lit("*"),
    )
    body = df.select(line.alias("value"))
    hdr = list(header or ())
    if hdr:
        import pandas as pd

        def prepend(batches):
            emitted = False
            for pdf in batches:
                if not emitted:
                    yield pd.DataFrame({"value": hdr})
                    emitted = True
                yield pdf
            if not emitted:
                yield pd.DataFrame({"value": hdr})

        body = body.mapInPandas(prepend, schema="value string")
    body.write.mode(mode).text(path)


# ---------------------------------------------------------------------------
# Generic sinks
# ---------------------------------------------------------------------------


def write_parquet(df: DataFrame, path: str, mode: str = "error") -> None:
    """Result persistence (SQLQueryFastq.java:108)."""
    df.write.mode(mode).parquet(path)


def write_csv_ordered(
    df: DataFrame, path: str, columns: list[str], sep: str = ",", mode: str = "error"
) -> None:
    """CSV/TSV with an explicit, pinned column order
    (SQLQueryBlast.java:113-121)."""
    df.select(*columns).write.mode(mode).csv(path, sep=sep)


def write_text(df: DataFrame, path: str, mode: str = "error") -> None:
    """Single-string-column text write (BlastN.java:152-154)."""
    df.write.mode(mode).text(path)


def write_grouped(
    df: DataFrame, path: str, group_col: str, fmt: str = "parquet", mode: str = "error"
) -> None:
    """One output directory per group key — the idiomatic replacement for
    the reference's manual per-sample ``FSDataOutputStream`` loop
    (FastqGroupper.java:71-109). ``partitionBy`` keeps the write fully
    distributed: each task writes only its groups, no driver fan-out, and
    downstream reads get partition pruning on ``group_col`` for free."""
    df.write.mode(mode).partitionBy(group_col).format(fmt).save(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    mode: str = "overwrite",
) -> dict:
    """Small-file compaction — the table-maintenance pass every 100 TB
    lake needs (streaming sinks, per-partition grouped writes, and
    incremental ingests all fragment: thousands of KB-sized files turn
    a scan into a task-scheduling and NameNode/liststatus bottleneck).
    Rewrites ``src`` into ``dst`` with file count chosen from the
    MEASURED on-disk footprint (the broadcast_if_small discipline):
    n_files = ceil(total_bytes / target_bytes), applied via
    ``coalesce`` — a shuffle-free narrow repack; data order within
    files may change task assignment but no row is dropped or
    duplicated (the caller's round-trip check is the contract).

    Returns {"files_before", "bytes_before", "files_after"} so the
    maintenance job can log the shrink. Local-FS listing (the
    scratch_dir stance); a cluster deployment lists the DFS instead."""
    import math
    import os

    files_before = 0
    bytes_before = 0
    for r, _, fs in os.walk(src):
        for f in fs:
            if f.endswith(".parquet"):
                files_before += 1
                bytes_before += os.path.getsize(os.path.join(r, f))
    n = max(1, math.ceil(bytes_before / target_bytes))
    spark.read.parquet(src).coalesce(n).write.mode(mode).parquet(dst)
    files_after = sum(
        1
        for r, _, fs in os.walk(dst)
        for f in fs
        if f.endswith(".parquet")
    )
    return {
        "files_before": files_before,
        "bytes_before": bytes_before,
        "files_after": files_after,
    }
