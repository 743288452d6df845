"""Interleaved A/B: the r12 basket edge-build port for the six graph
entries that still used the lineitem self-join (euler, kcore,
label_propagation, sssp, densest_subgraph, assortativity).

A (old): lineitem self-joined on l_orderkey with pa < pb, then
groupBy(pa, pb) count — the key table shuffles twice (both join sides)
and inflates to basket-squared rows before the pair aggregate's map
side (plus the callers' own .distinct() where they used one).

B (new): `relational._order_pair_counts` — one
groupBy(l_orderkey).collect_list/set shuffle builds the basket,
pairs expand map-side from the array, partial counts bound the second
exchange by the pair domain.

Driven END-TO-END through graph_euler_check's composition (raw grain,
support >= 2 — the heaviest ported caller: CC-doubling + parity
aggregate downstream), so the A/B decides the port, not just the edge
stage. Equality asserted on the full output first; interleaved
same-session reps, median + order statistics decide.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from virapipe_spark import catalog
from virapipe_spark.graph import connected_components_doubling
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def edges_old(li: DataFrame) -> DataFrame:
    a, b = li.alias("x"), li.alias("y")
    return (
        a.join(
            b,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("a"),
            F.col("y.l_partkey").alias("b"),
        )
        .agg(F.count("*").alias("m"))
        .filter(F.col("m") >= 2)
        .select("a", "b")
    )


def edges_new(li: DataFrame) -> DataFrame:
    return (
        _order_pair_counts(li)
        .filter(F.col("support") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )


def euler(spark, new: bool) -> DataFrame:
    li = catalog.table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    und = edges_new(li) if new else edges_old(li)
    und = truncate_lineage(und, reliable=True)
    sym = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    nodes = sym.select(F.col("a").alias("n")).distinct()
    comp = connected_components_doubling(
        und, nodes, node_col="n", label_col="cid"
    )
    deg = sym.groupBy(F.col("a").alias("n")).agg(
        F.count("*").cast("long").alias("d")
    )
    return (
        comp.join(deg, "n")
        .groupBy(F.col("cid").alias("component"))
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            (F.sum("d") / 2).cast("long").alias("n_edges"),
            F.sum(F.when(F.col("d") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_odd"),
        )
    )


def main():
    catalog.load_all()
    spark = session(app_name="ab_edgebuild_ports")
    variants = {
        "old(self-join)": lambda: euler(spark, new=False),
        "new(baskets)": lambda: euler(spark, new=True),
    }
    a = sorted(tuple(r) for r in variants["old(self-join)"]().collect())
    b = sorted(tuple(r) for r in variants["new(baskets)"]().collect())
    assert a == b and a, "outputs differ!"
    print(f"euler components: {len(a)} (identical)")
    times = {k: [] for k in variants}
    for _ in range(7):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"euler {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
