"""Pipeline runner + ExternalTool plug-point tests (SURVEY.md §7.4-7.5):
a 3-stage mini-virapipe (quality filter -> dedup -> fake aligner) over the
reads fixture, with a deterministic pure-Python tool double."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from virapipe_spark import functions as vf
from virapipe_spark.pipeline import ExternalTool, Pipeline, Stage
from tests import fixtures

#: Output schema of the fake aligner (SAM-ish subset).
ALN_SCHEMA = T.StructType(
    [
        T.StructField("qname", T.StringType()),
        T.StructField("flag", T.IntegerType()),
        T.StructField("seq", T.StringType()),
    ]
)


def fake_aligner(fasta_text: str) -> str:
    """Deterministic BWA double: 'aligns' a read iff its sequence starts
    with 'A' (flag 0), else emits it unmapped (flag 4)."""
    out = []
    for rec in fasta_text.split(">"):
        if not rec.strip():
            continue
        header, seq = rec.split("\n", 1)
        seq = seq.strip()
        flag = 0 if seq.startswith("A") else 4
        out.append(f"{header}\t{flag}\t{seq}")
    return "\n".join(out) + "\n"


def test_three_stage_pipeline(spark, tmp_path):
    reads = fixtures.reads_df(spark)

    align = ExternalTool(
        argv=["bwa-placeholder"],  # never exec'd: runner double injected
        format_row=lambda r: f">{r['key']}/{r['read']}\n{r['sequence']}\n",
        parse_line=lambda l: tuple(
            (lambda p: (p[0], int(p[1]), p[2]))(l.split("\t"))
        )
        if l.strip()
        else None,
        schema=ALN_SCHEMA,
        runner=fake_aligner,
    )

    ckpt = str(tmp_path / "dedup_ckpt")
    pipe = Pipeline(
        [
            Stage("quality", lambda df: df.filter(vf.avg_quality_pass("quality", 50.0))),
            Stage(
                "dedup",
                lambda df: df.dropDuplicates(["key", "read"]),
                checkpoint=ckpt,
            ),
            Stage("align", align),
        ]
    )
    out = pipe.run(reads)
    rows = {r["qname"]: r for r in out.collect()}

    # quality stage drops the S3 pair member with avg 35 (1 read of 8);
    # dedup collapses the duplicated S1 pair (8 -> 7 -> 5 unique key/read)
    assert len(rows) == 5
    # checkpoint materialized
    assert spark.read.parquet(ckpt).count() == 5
    # fake aligner semantics: A-starting sequences mapped
    s1_fwd = rows["S1:12:FCA123:1:1101:1000:2000/1"]
    assert s1_fwd["flag"] == 0 and s1_fwd["seq"].startswith("A")
    s2_rev = rows["S2:12:FCA123:1:1102:1500:2500/2"]
    assert s2_rev["flag"] == 0  # AATTGGCCAA starts with A


def test_stage_decorator_registration(spark):
    pipe = Pipeline()

    @pipe.stage("only")
    def _only(df):
        return df.select("key")

    out = pipe.run(fixtures.reads_df(spark))
    assert out.columns == ["key"] and out.count() == 8


def test_external_tool_subprocess_path(spark):
    """Real subprocess path with a universally-present tool (cat)."""
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    tool = ExternalTool(
        argv=["cat"],
        format_row=lambda r: f"{r['v']}\n",
        parse_line=lambda l: (l.upper(),),
        schema=T.StructType([T.StructField("u", T.StringType())]),
    )
    got = sorted(r["u"] for r in tool(df).collect())
    assert got == ["A", "B"]
