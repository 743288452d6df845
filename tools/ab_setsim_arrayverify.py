"""Interleaved A/B: docs_setsim_prefix verification as the pre-r12
explode-join-aggregate vs the r12 array form.

A (old): candidates join sets twice (doc_a side explodes to
pair-count x set-size intermediate rows), groupBy(doc_a, doc_b) counts
the overlap, then TWO more joins re-attach sizes.

B (new, production): one groupBy folds each doc's shingles into an
array (sizes project from it shuffle-free), na/nb ride the candidate
rows, and verification is two doc_id equi-joins + a per-pair
array_intersect — no explode-sized intermediate, no pair-count
aggregate shuffle, no size join-backs.

Protocol: same-session interleaved reps, median decides; equality
asserted on the full output first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.extensions import _shingles
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
T = 0.5


def build_old(spark):
    sets = _shingles(spark, SF).select("doc_id", "s").distinct()
    sets = truncate_lineage(sets, eager=False)
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
    freq = sets.groupBy("s").agg(F.count("*").alias("cnt"))
    w_doc = W.partitionBy("doc_id").orderBy("cnt", "s")
    prefix = (
        sets.join(freq, "s")
        .withColumn("rn", F.row_number().over(w_doc))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.col("n") * T) + 1)
        .select("doc_id", "s", "n")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            (F.col("b.n") >= F.col("a.n") * T)
            & (F.col("a.n") >= F.col("b.n") * T)
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    common = (
        cand.join(sets.alias("ta"), F.col("doc_a") == F.col("ta.doc_id"))
        .join(
            sets.alias("tb"),
            (F.col("doc_b") == F.col("tb.doc_id"))
            & (F.col("ta.s") == F.col("tb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("union_n", F.col("sa.n") + F.col("sb.n") - F.col("common"))
        .filter(F.col("common") * 1.0 / F.col("union_n") >= T)
        .select(
            "doc_a",
            "doc_b",
            "common",
            "union_n",
            F.round(F.col("common") * 1.0 / F.col("union_n"), 4).alias(
                "jaccard"
            ),
        )
    )


def build_new(spark):
    return catalog.QUERIES["docs_setsim_prefix"](spark, SF)


def main():
    import __spark_entry__  # noqa: F401 (registers the full catalog)

    spark = session(app_name="ab_setsim_arrayverify")
    for b in (build_old, build_new):
        b(spark).write.format("noop").mode("overwrite").save()
    cols = ["doc_a", "doc_b"]
    a = build_old(spark).orderBy(*cols).collect()
    b = build_new(spark).orderBy(*cols).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "variants differ!"
    times = {"old": [], "new": []}
    for _ in range(7):
        for name, b in (("old", build_old), ("new", build_new)):
            t0 = time.perf_counter()
            b(spark).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name in ("old", "new"):
        xs = sorted(round(t, 3) for t in times[name])
        print(f"setsim {name}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
