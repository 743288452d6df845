"""Interleaved A/B: embed_knn_pq's encode pass as nested interpreted
HOFs vs the r12 Arrow-batch numpy argmin (extensions.embed_knn_pq).

A (old): per corpus row, transform(sequence(1,M)) x transform(cbs: K
codewords) x aggregate(sequence over D dims) — ~M*K*D interpreted
lambda evaluations per row, outside whole-stage codegen, with the
codebook riding every row via the cbrow crossJoin.

B (new, production): each task encodes its Arrow batches with
vectorized exact-int64 numpy against the driver-collected codebook;
np.argmin's first-minimum tie-break equals the old array_min struct
(min d, then min k) because codewords are k-ascending.

Protocol: same-session interleaved reps, median decides; equality
asserted on the full output first. Measured (sf0.1, local[32], x9):
old 3.033 s median, new 1.984 s — and the unchanged oracle hash at
sf0.01 + sf0.1 pins the tie-break equivalence.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401  (registers the catalog)
from pyspark.sql import Window as W, functions as F

from virapipe_spark import catalog
from virapipe_spark.queries import extensions as ext
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_old(spark):
    qdf = ext._quantized(spark, SF)
    cbrow = ext._pq_codebook_row(qdf)

    def codes_col():
        return F.transform(
            F.sequence(F.lit(1), F.lit(ext._PQ_M)),
            lambda m: F.array_min(
                F.transform(
                    F.col("cbs"),
                    lambda c: F.struct(
                        ext._pq_block_dist(F.col("q"), c["cq"], m).alias("d"),
                        c["k"].alias("k"),
                    ),
                )
            )["k"],
        )

    assign = ext._ivf_assign_scored(spark, SF)
    cand = (
        assign.filter(F.col("crn") == 1)
        .crossJoin(F.broadcast(cbrow))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cid").alias("bcid"),
            codes_col().alias("bcodes"),
        )
    )
    probes = (
        assign.filter(
            (F.col("vec_id") < ext._N_QUERIES)
            & (F.col("crn") <= ext._IVF_PROBE)
        )
        .crossJoin(F.broadcast(cbrow))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("q").alias("aq"),
            "cid",
            "cbs",
        )
    )
    adc = F.aggregate(
        F.sequence(F.lit(1), F.lit(ext._PQ_M)),
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + ext._pq_block_dist(
            F.col("aq"),
            F.element_at(
                F.col("cbs"),
                (F.element_at(F.col("bcodes"), m) + 1).cast("int"),
            )["cq"],
            m,
        ),
    )
    wa = W.partitionBy("query_id").orderBy("adc", "neighbor_id")
    short = (
        F.broadcast(probes)
        .join(
            cand,
            (F.col("cid") == F.col("bcid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("adc", adc)
        .withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= ext._PQ_SHORT)
        .select("query_id", "neighbor_id")
    )
    qdf2 = ext._quantized(spark, SF)
    b = qdf2.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("bq"),
        F.col("qnorm").alias("bnorm"),
    )
    a = qdf2.filter(F.col("vec_id") < ext._N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("aq"),
        F.col("qnorm").alias("anorm"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("aq"), F.col("bq"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    wr = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        b.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(a), "query_id")
        .withColumn(
            "cosine",
            F.round(dot.cast("double") / (F.col("anorm") * F.col("bnorm")), 6),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= ext._TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def main():
    spark = session(app_name="ab_pq_encode")
    builds = {
        "old": lambda: build_old(spark),
        "new": lambda: catalog.QUERIES["embed_knn_pq"](spark, SF),
    }
    for b in builds.values():
        b().write.format("noop").mode("overwrite").save()
    a = [tuple(r) for r in builds["old"]().orderBy("query_id", "rn").collect()]
    n = [tuple(r) for r in builds["new"]().orderBy("query_id", "rn").collect()]
    assert a == n, "variants differ!"
    times = {k: [] for k in builds}
    for _ in range(9):
        for k, b in builds.items():
            t0 = time.perf_counter()
            b().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"pq-encode {k}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
