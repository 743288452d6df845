"""A/B harness for docs_boilerplate_coverage's covered-token count.

Shape A (shipped first): every boilerplate gram hit explodes its 3
covered token positions, then a global distinct over (doc_id, tp)
before the per-doc count — the distinct shuffles the exploded rows.

Shape B: treat each hit as the interval [pos, pos+2] and compute the
per-doc union length by gaps-and-islands (one window partitioned by
doc: running max of interval end; a new island starts when pos jumps
past it) — no 3x explode, no distinct; shuffle volume is the raw hit
rows, partitioned by doc.

Usage: python tools/ab_boiler.py [sf_dir] [reps]
Winner recorded in SCALE.md and shipped in extensions.py.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from virapipe_spark.catalog import table
from virapipe_spark.queries.extensions import _BOILER_MIN_DOCS
from virapipe_spark.session import session


def _hits(spark: SparkSession, sf_dir: str):
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    grams = d.filter(F.size("toks") >= 3).select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', toks[i - 1], toks[i], toks[i + 1]))"
            )
        ).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    boiler = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BOILER_MIN_DOCS)
        .select("gram")
    )
    tot = d.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return grams, boiler, tot


def _finish(tot: DataFrame, covered: DataFrame) -> DataFrame:
    nb = F.coalesce(F.col("n_boiler_tokens"), F.lit(0)).cast("long")
    return tot.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        nb.alias("n_boiler_tokens"),
        F.round(nb / F.col("n_tokens").cast("double"), 4).alias("boiler_ratio"),
        (nb * 10 <= F.col("n_tokens") * 3).alias("keep"),
    )


def shape_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams, boiler, tot = _hits(spark, sf_dir)
    covered = (
        grams.join(boiler, "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 2)).alias("tp"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler_tokens"))
    )
    return _finish(tot, covered)


def shape_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams, boiler, tot = _hits(spark, sf_dir)
    hits = grams.join(boiler, "gram").select(
        "doc_id", "pos", (F.col("pos") + 2).alias("iv_end")
    )
    wo = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("iv_end").over(wo.rowsBetween(W.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "new_island",
        (prev_end.isNull() | (F.col("pos") > prev_end)).cast("long"),
    )
    islands = flagged.withColumn(
        "isl",
        F.sum("new_island").over(wo.rowsBetween(W.unboundedPreceding, 0)),
    )
    covered = (
        islands.groupBy("doc_id", "isl")
        .agg((F.max("iv_end") - F.min("pos") + 1).alias("ilen"))
        .groupBy("doc_id")
        .agg(F.sum("ilen").alias("n_boiler_tokens"))
    )
    return _finish(tot, covered)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = session(app_name="ab_boiler")
    shapes = {"A_explode_distinct": shape_a, "B_interval_union": shape_b}
    # equivalence first — a faster wrong answer is no answer
    rows = {
        n: sorted(map(tuple, fn(spark, sf_dir).collect()))
        for n, fn in shapes.items()
    }
    assert rows["A_explode_distinct"] == rows["B_interval_union"], "shapes disagree"
    times = {n: [] for n in shapes}
    for _ in range(reps):
        for n, fn in shapes.items():
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[n].append(time.time() - t0)
    for n, ts in times.items():
        print(
            f"{n}: median {statistics.median(ts):.3f}s "
            f"[{', '.join(f'{t:.3f}' for t in ts)}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
