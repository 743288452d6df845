"""Interleaved A/B: graph_pagerank with vs without a lazy
localCheckpoint on the co-purchase edge list.

The edge subtree (pair self-join + support aggregate + symmetrize) is
consumed 3x per 2-iteration run (degree table + each iteration's
contrib join). Recompute pays the pair shuffle thrice; checkpoint pays
one materialization + reads. Protocol: interleaved same-session reps,
median decides (SCALE.md noise rules).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from virapipe_spark import catalog
from virapipe_spark.graph import pagerank
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark, materialize: bool):
    li = (
        catalog.table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    und = (
        _order_pair_counts(li)
        .filter(F.col("support") >= 2)
        .select("pa", "pb")
    )
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    if materialize:
        edges = edges.localCheckpoint(eager=False)
    return pagerank(edges, iterations=2)


def main():
    spark = session(app_name="ab_pagerank")
    for variant in (False, True):
        build(spark, variant).write.format("noop").mode("overwrite").save()
    a_rows = build(spark, False).orderBy("node").collect()
    b_rows = build(spark, True).orderBy("node").collect()
    assert [tuple(r) for r in a_rows] == [tuple(r) for r in b_rows], "variants differ!"
    times = {False: [], True: []}
    for _ in range(7):
        for variant in (False, True):
            t0 = time.perf_counter()
            build(spark, variant).write.format("noop").mode("overwrite").save()
            times[variant].append(time.perf_counter() - t0)
    print("recompute medians:", sorted(times[False]), "->", statistics.median(times[False]))
    print("checkpoint medians:", sorted(times[True]), "->", statistics.median(times[True]))
    spark.stop()


if __name__ == "__main__":
    main()
