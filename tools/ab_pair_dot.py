"""Interleaved A/B: embed-family per-pair cosine verify — interpreted
HOF dot (zip_with+aggregate, pre-r13) vs the vectorized exact-int64
numpy dot per Arrow batch (extensions._arrow_pair_dot, r13; VERDICT_r12
next-round #5, guide §4.2).

The float work (divide by the norm product, round, threshold) stays in
the SAME Spark expressions in both variants, so output equality is
exact integer equality of the dots — asserted on the full output of
both entries first. Old variants are inlined verbatim from the r12
commit; new variants are the live catalog entries.

RESULT (r13, this tool, sf0.1, interleaved x7): SPLIT —
  embed_semdedup_verdicts: HOF 3.912 s vs Arrow 2.124 s (1.84x, every
    order statistic lower; cell-sized candidate volume ~250k pairs)
    -> Arrow KEPT in the entry.
  embed_cosine_neardup: HOF 2.076 s vs Arrow 2.465 s (every order
    statistic higher; sign-bucket blocking leaves few pairs, the
    boundary round trip outweighs the HOF) -> reverted to HOF; this
    case's old==new here compares HOF against itself after the revert.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.extensions import (
    _LSH_DIMS,
    _NEARDUP_COS,
    _SEMDEDUP_COS,
    _cosine,
    _ivf_assign_scored,
    _quantized,
)
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_cosine_neardup(spark):
    qdf = _quantized(spark, SF)

    def bucket(side):
        return F.concat(
            *[
                F.when(F.element_at(F.col(f"{side}.q"), d) >= 0, F.lit("1"))
                .otherwise(F.lit("0"))
                for d in _LSH_DIMS
            ]
        )

    a, b = qdf.alias("a"), qdf.alias("b")
    return (
        a.join(
            b,
            (bucket("a") == bucket("b"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(_cosine("a", "b"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= _NEARDUP_COS)
    )


def old_semdedup(spark):
    assign = _ivf_assign_scored(spark, SF).filter(F.col("crn") == 1).select(
        "vec_id", "q", "qnorm", "cid"
    )
    a, b = assign.alias("a"), assign.alias("b")
    drops = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(_cosine("a", "b") >= _SEMDEDUP_COS)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return assign.join(drops, "vec_id", "left").select(
        "vec_id", "cid", F.col("__drop").isNull().alias("keep")
    )


def main():
    catalog.load_all()
    spark = session(app_name="ab_pair_dot", shuffle_partitions=32)
    cases = {
        "cosine_neardup": (
            lambda: old_cosine_neardup(spark),
            lambda: catalog.QUERIES["embed_cosine_neardup"](spark, SF),
        ),
        "semdedup": (
            lambda: old_semdedup(spark),
            lambda: catalog.QUERIES["embed_semdedup_verdicts"](spark, SF),
        ),
    }
    for name, (old, new) in cases.items():
        a = sorted(map(tuple, old().collect()))
        b = sorted(map(tuple, new().collect()))
        assert a == b and a, f"{name} diverges: old={len(a)} new={len(b)}"
        print(f"{name}: {len(a)} rows identical", flush=True)
    for name, (old, new) in cases.items():
        times = {"old(hof)": [], "new(arrow)": []}
        fns = {"old(hof)": old, "new(arrow)": new}
        for rep in range(7):
            for k, fn in fns.items():
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                times[k].append(time.perf_counter() - t0)
        for k, xs in times.items():
            xs = sorted(round(t, 3) for t in xs)
            print(
                f"{name} {k}: {xs} -> median {statistics.median(xs):.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
