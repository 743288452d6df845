"""Interleaved A/B: the co-purchase pair stage as a self-join vs the
r12 basket rewrite (`relational._order_pair_counts`).

A (old): lineitem.distinct() self-joined on l_orderkey with pa < pb,
then groupBy(pa, pb).count — shuffles the key table twice (both join
sides) plus the distinct, inflating to basket-squared rows before the
pair aggregate's map side.

B (new): groupBy(l_orderkey).collect_set baskets (per-order dedup rides
the same shuffle), map-side pair expansion from the array, partial
counts into the pair aggregate — two data-sized exchanges, no join.

Driven end-to-end through graph_pagerank (the bench's consumer) and,
for the raw line-pair grain, through the support>=2 edge count.
Protocol: interleaved same-session reps, median decides (SCALE.md
noise rules); equality asserted on the full output first.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from virapipe_spark import catalog
from virapipe_spark.graph import pagerank
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pairs_old(li: DataFrame) -> DataFrame:
    """The pre-r12 self-join form, verbatim."""
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count("*").alias("support"))
    )


def build_pagerank(spark, new: bool):
    li = catalog.table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    if new:
        und = _order_pair_counts(li, distinct_parts=True)
    else:
        und = pairs_old(li.distinct())
    und = und.filter(F.col("support") >= 2).select("pa", "pb")
    edges = und.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(und.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    edges = truncate_lineage(edges, eager=False)
    return pagerank(edges, iterations=2)


def build_rawgrain(spark, new: bool):
    """Raw line-pair grain (triangle-count/mst input shape)."""
    li = catalog.table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    fn = _order_pair_counts if new else pairs_old
    return fn(li).filter(F.col("support") >= 2)


def run(label, build, spark, reps=7):
    for variant in (False, True):
        build(spark, variant).write.format("noop").mode("overwrite").save()
    a = build(spark, False).orderBy(*build(spark, False).columns).collect()
    b = build(spark, True).orderBy(*build(spark, True).columns).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], f"{label}: variants differ!"
    times = {False: [], True: []}
    for _ in range(reps):
        for variant in (False, True):
            t0 = time.perf_counter()
            build(spark, variant).write.format("noop").mode("overwrite").save()
            times[variant].append(time.perf_counter() - t0)
    for variant, name in ((False, "selfjoin"), (True, "baskets")):
        xs = sorted(round(t, 3) for t in times[variant])
        print(f"{label} {name}: {xs} -> median {statistics.median(xs):.3f}")


def main():
    spark = session(app_name="ab_pairs_baskets")
    run("pagerank(distinct-grain)", build_pagerank, spark)
    run("edges(raw-grain)", build_rawgrain, spark)


if __name__ == "__main__":
    main()
