"""Named external-tool stages — the reference's four program patterns as
ready-made :class:`~virapipe_spark.pipeline.ExternalTool` factories.

A ViraPipe user reaches for ``Align`` / ``Assemble`` / ``BlastN`` /
``HMMSearch`` by name (scripts/virapipe.sh:38-63); these factories give
those names a Spark-native home. Each builds the formatting/parsing
glue around the generic process-per-batch plug-point; the binary itself
is NOT bundled — pass ``runner=`` a pure-Python double in tests (the
correctness harness never shells out, SURVEY §7.5), or leave it None in
production where the argv runs once per Arrow batch.

Scale notes common to all four: place every pushable filter BEFORE the
tool stage (the black box hides predicates from Catalyst); batch size —
``spark.sql.execution.arrow.maxRecordsPerBatch`` — is the
spawn-amortization knob (the reference amortizes per partition,
AlignInterleaved.java:67-140; per Arrow batch is the same cost model).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import types as T

from virapipe_spark import schemas
from virapipe_spark.pipeline import ExternalTool


def _fasta_row(row: dict) -> str:
    return f">{row['id']}\n{row['sequence']}\n"


def _fastq_row(row: dict) -> str:
    return f"@{row['key']}\n{row['sequence']}\n+\n{row.get('quality', '')}\n"


def _parse_blast_line(line: str) -> tuple | None:
    """outfmt-6 line -> BLAST_HITS tuple, null-safe per field
    (SQLQueryBlast.java:74-97's tolerance)."""
    parts = line.rstrip("\n").split("\t")
    if len(parts) < 12:
        return None

    def _f(i: int, typ: type):
        try:
            return typ(parts[i])
        except (ValueError, IndexError):
            return None

    return (
        parts[0],
        parts[1],
        _f(2, float),
        _f(3, int),
        _f(4, int),
        _f(5, int),
        _f(6, int),
        _f(7, int),
        _f(8, int),
        _f(9, int),
        _f(10, float),
        _f(11, float),
    )


def _parse_sam_line(line: str) -> tuple | None:
    """SAM body line -> ALIGNMENTS tuple (headers skipped; malformed ->
    nulls, HDFSWriter.java:109-128)."""
    if not line or line.startswith("@"):
        return None
    f = line.split("\t")
    if len(f) < 11:
        return None

    def _i(s: str):
        try:
            return int(s)
        except ValueError:
            return None

    flag = _i(f[1]) or 0
    return (
        f[0],
        _i(f[3]),
        None if f[2] == "*" else f[2],
        len(f[9]) if f[9] != "*" else None,
        None if f[9] == "*" else f[9],
        None if f[5] == "*" else f[5],
        bool(flag & 0x4),
        bool(flag & 0x400),
    )


def blastn(
    db: str, extra_args: list[str] | None = None, runner: Callable[[str], str] | None = None
) -> ExternalTool:
    """``blastn`` over contigs(id, sequence) -> BLAST_HITS rows
    (BlastN.java:104-145: FASTA on stdin, ``-outfmt 6`` on stdout)."""
    argv = ["blastn", "-db", db, "-outfmt", "6", *(extra_args or [])]
    return ExternalTool(argv, _fasta_row, _parse_blast_line, schemas.BLAST_HITS, runner)


def hmmsearch(
    hmm_db: str, runner: Callable[[str], str] | None = None
) -> ExternalTool:
    """``hmmsearch`` over contigs -> (target, query, evalue, score)
    per-domain hit rows (HMMSearch.java:82-163: FASTA on stdin, tabular
    stdout; '#'-comment lines skipped)."""
    schema = T.StructType(
        [
            T.StructField("target", T.StringType(), True),
            T.StructField("query", T.StringType(), True),
            T.StructField("evalue", T.DoubleType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )

    def parse(line: str) -> tuple | None:
        if not line or line.startswith("#"):
            return None
        f = line.split()
        if len(f) < 6:
            return None
        try:
            return (f[0], f[2], float(f[4]), float(f[5]))
        except ValueError:
            return None

    # -o /dev/null: without it the human-readable report shares stdout
    # with --tblout and its score lines parse as bogus rows (their
    # fields pass the len>=6 + float checks) ahead of the tblout rows.
    return ExternalTool(
        ["hmmsearch", "-o", "/dev/null", "--tblout", "/dev/stdout", hmm_db, "-"],
        _fasta_row,
        parse,
        schema,
        runner,
    )


def bwa_align(
    index: str, runner: Callable[[str], str] | None = None
) -> ExternalTool:
    """``bwa mem`` over reads(key, sequence, quality) -> typed
    ALIGNMENTS rows (the AlignInterleaved.java:67-140 pattern —
    interleaved FASTQ in, SAM lines out; the reference drives libbwa
    over JNI per partition, here the process runs per Arrow batch)."""
    return ExternalTool(
        ["bwa", "mem", "-p", index, "-"],
        _fastq_row,
        _parse_sam_line,
        schemas.ALIGNMENTS,
        runner,
    )


def megahit_assemble(
    runner: Callable[[str], str] | None = None,
) -> ExternalTool:
    """MegaHit assembly over reads -> contigs(id, sequence)
    (Assemble.java:106-174: FASTQ via stdin, contig FASTA back). The
    reference runs one assembly per input FILE (per-sample); feed this
    stage a single sample's reads, or repartition by sample first so a
    batch is sample-pure."""

    def parse_fasta_pairs() -> Callable[[str], tuple | None]:
        state: dict = {"id": None, "seq": []}

        def parse(line: str) -> tuple | None:
            if line.startswith(">"):
                prev = None
                if state["id"] is not None and state["seq"]:
                    prev = (state["id"], "".join(state["seq"]))
                head = line[1:].split()
                state["id"] = head[0] if head else None  # bare '>' = flush
                state["seq"] = []
                return prev
            stripped = line.strip()
            if state["id"] is not None and stripped and not stripped.startswith("#"):
                state["seq"].append(stripped)
            return None

        return parse

    # NOTE: line-by-line FASTA parsing is stateful; the final record of
    # each batch is emitted via the sentinel the runner/tool must print
    # ("" line at EOF is enough because ExternalTool feeds whole batches).
    class _MegahitTool(ExternalTool):
        def _run(self, text: str) -> str:
            out = super()._run(text)
            return out if out.endswith("\n>") else out + "\n>"  # flush sentinel

    return _MegahitTool(
        ["megahit", "--12", "/dev/stdin", "-o", "/dev/stdout"],
        _fastq_row,
        parse_fasta_pairs(),
        schemas.CONTIGS,
        runner,
    )
