"""Interleaved A/B: embed_kmeans_lloyd's assignment as interpreted
HOFs vs the r12 Arrow-batch numpy argmin (extensions._lloyd_train_assign).

A (old): per corpus row, transform(cents: C centroid structs) x
(zip_with + aggregate over 64 dims) — ~C*2*64 interpreted lambda
evaluations per row outside whole-stage codegen, three times (two
training passes + the final assignment), with the centroid row riding
via a broadcast crossJoin and lazily checkpointed per-iteration
centroid tables.

B (new, production): centroids are collected per iteration (C x dims
longs, control-plane — the PQ-codebook pattern) and each task argmins
its Arrow batches with exact-int64 numpy; np.argmin's first-minimum
over cid-ascending centroids equals the old array_min(struct(dist,
cid)) tie-break. The UPDATE (rounded mean) stays in Spark, so trained
centroids are bit-identical by construction.

Protocol: same-session interleaved reps, median decides; equality
asserted on the full output first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401  (registers the catalog)
from pyspark.sql import DataFrame, functions as F

from virapipe_spark import catalog
from virapipe_spark.queries import extensions as ext
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_old(spark):
    """The pre-r12 HOF Lloyd, verbatim."""
    qdf = ext._quantized(spark, SF).select("vec_id", "q")

    def centroid_row(cm: DataFrame) -> DataFrame:
        return truncate_lineage(
            cm.groupBy().agg(
                F.collect_list(F.struct("cid", "c")).alias("cents")
            ),
            eager=False,
        )

    def assign(cents_row: DataFrame) -> DataFrame:
        scored = F.transform(
            F.col("cents"),
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with("q", s["c"], lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                s["cid"].alias("cid"),
            ),
        )
        return qdf.crossJoin(F.broadcast(cents_row)).select(
            "vec_id", "q", F.array_min(scored)["cid"].alias("cid")
        )

    def update(assigned: DataFrame) -> DataFrame:
        lf = assigned.select("cid", F.posexplode("q").alias("pos", "v"))
        cm = lf.groupBy("cid", "pos").agg(
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("cv")
        )
        return cm.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s["cv"],
            ).alias("c")
        )

    c0 = centroid_row(
        qdf.filter(F.col("vec_id") < ext._KM_C).select(
            F.col("vec_id").alias("cid"), F.col("q").alias("c")
        )
    )
    c1 = centroid_row(update(assign(c0)))
    c2_tbl = truncate_lineage(update(assign(c1)), eager=False)
    final = assign(centroid_row(c2_tbl))
    norms = c2_tbl.select(
        "cid",
        F.aggregate(
            F.transform("c", lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("c_norm2"),
    )
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .join(norms, "cid")
        .select("cid", "n_members", "sum_vec_id", "c_norm2")
    )


def main():
    spark = session(app_name="ab_kmeans_arrow")
    builds = {
        "old": lambda: build_old(spark),
        "new": lambda: catalog.QUERIES["embed_kmeans_lloyd"](spark, SF),
    }
    for b in builds.values():
        b().write.format("noop").mode("overwrite").save()
    a = [tuple(r) for r in builds["old"]().orderBy("cid").collect()]
    n = [tuple(r) for r in builds["new"]().orderBy("cid").collect()]
    assert a == n, f"variants differ!\nold={a}\nnew={n}"
    times = {k: [] for k in builds}
    for _ in range(9):
        for k, b in builds.items():
            t0 = time.perf_counter()
            b().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"kmeans {k}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
