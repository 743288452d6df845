"""Interleaved A/B: the IVF coarse assignment as crossJoin+window vs
the r12 array form (`extensions._ivf_assign_scored`).

A (old): corpus crossJoin 8 centroid ROWS (8x row inflation, each row
carrying the 64-long q array), then Exchange+Sort+Window on vec_id to
rank cells — a corpus-sized shuffle per consumer.

B (new): ONE broadcast row holding the (cid, cq) struct array; per-row
transform scores all C cells, array_sort on (-dot, cid) (identical
tie-break to row_number OVER (ORDER BY dot DESC, cid)), slice nprobe,
posexplode — zero shuffle, same C-dots-per-vector compute bound.

Driven end-to-end through the embed_knn_ivf pipeline (_ivf_topk shape).
Protocol: interleaved same-session reps, median decides; equality
asserted on the full (query_id, neighbor_id, cosine, rn) output first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W, functions as F

from virapipe_spark.queries.extensions import (
    _IVF_C,
    _IVF_PROBE,
    _N_QUERIES,
    _TOP_K,
    _cosine,
    _ivf_assign_scored,
    _quantized,
)
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def assign_old(spark) -> DataFrame:
    """The pre-r12 crossJoin+window form, verbatim."""
    qdf = _quantized(spark, SF)
    cent = qdf.filter(F.col("vec_id") < _IVF_C).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    dot_c = F.aggregate(
        F.zip_with(F.col("q"), F.col("cq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wc = W.partitionBy("vec_id").orderBy(F.col("__dot").desc(), "cid")
    return (
        qdf.crossJoin(F.broadcast(cent))
        .withColumn("__dot", dot_c)
        .withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= F.lit(max(_IVF_PROBE, 1)))
        .select("vec_id", "q", "qnorm", "cid", "crn")
    )


def topk(assign_scored: DataFrame, hint: bool) -> DataFrame:
    """_ivf_topk's consumer shape over a given assignment; ``hint``
    mirrors the r12 explicit probes broadcast (the old window form's
    estimates already planned a broadcast without it)."""
    assign = assign_scored.filter(F.col("crn") == 1).select(
        "vec_id", "q", "qnorm", "cid"
    )
    probes = assign_scored.filter(
        (F.col("vec_id") < _N_QUERIES) & (F.col("crn") <= _IVF_PROBE)
    ).select("vec_id", "q", "qnorm", "cid")
    if hint:
        probes = F.broadcast(probes)
    a, b = probes.alias("a"), assign.alias("b")
    scored = a.join(
        b,
        (F.col("a.cid") == F.col("b.cid"))
        & (F.col("b.vec_id") != F.col("a.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(_cosine("a", "b"), 6).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _TOP_K
    )


def build(spark, new: bool) -> DataFrame:
    if new:
        return topk(_ivf_assign_scored(spark, SF), hint=True)
    return topk(assign_old(spark), hint=False)


def main():
    spark = session(app_name="ab_ivf_arrayassign")
    for variant in (False, True):
        build(spark, variant).write.format("noop").mode("overwrite").save()
    cols = ["query_id", "neighbor_id", "rn"]
    a = build(spark, False).orderBy(*cols).collect()
    b = build(spark, True).orderBy(*cols).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], "variants differ!"
    times = {False: [], True: []}
    for _ in range(7):
        for variant in (False, True):
            t0 = time.perf_counter()
            build(spark, variant).write.format("noop").mode("overwrite").save()
            times[variant].append(time.perf_counter() - t0)
    for variant, name in ((False, "window"), (True, "array")):
        xs = sorted(round(t, 3) for t in times[variant])
        print(f"ivf_topk {name}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
