"""Interleaved A/B: boruvka_msf's per-round component minimum — a
row_number() window over (c ORDER BY cost) vs a min(struct(cost, a, b,
oc)) hash aggregate.

Edge costs are UNIQUE by the caller contract (graph_mst_boruvka packs
an id tiebreak into the cost), so the struct minimum — lexicographic,
cost first — selects the IDENTICAL row as rank 1 of the cost order,
while planning as a map-side-combinable partial aggregate instead of
Exchange+Sort+Window (guide §2.2: shuffle partial aggregates, not
sortable rows).

Protocol: same-session interleaved reps on the graph_mst_boruvka
fixture at sf0.01; forest equality asserted first.
"""
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401
from pyspark.sql import DataFrame, Window as W, functions as F

from virapipe_spark.catalog import table
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def boruvka(edges: DataFrame, best_via: str) -> DataFrame:
    """graph.boruvka_msf with the per-round best step switchable."""
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    e = edges.select("a", "b", "cost").persist()
    comp = nodes.select("node", F.col("node").alias("comp"))
    comp = truncate_lineage(comp, eager=False, reliable=True)
    v0 = comp.count()
    hops = max(1, math.ceil(math.log2(max(v0, 2))))
    max_rounds = hops + 2
    chosen_all = None
    done = False
    for rnd in range(max_rounds):
        ca = comp.select(F.col("node").alias("a"), F.col("comp").alias("ca"))
        cb = comp.select(F.col("node").alias("b"), F.col("comp").alias("cb"))
        e2 = (
            e.join(ca, "a").join(cb, "b").filter(F.col("ca") != F.col("cb"))
            .persist()
        )
        if e2.isEmpty():
            e2.unpersist()
            done = True
            break
        cand = e2.select(
            F.col("ca").alias("c"), "cost", "a", "b", F.col("cb").alias("oc")
        ).union(
            e2.select(
                F.col("cb").alias("c"), "cost", "a", "b", F.col("ca").alias("oc")
            )
        )
        if best_via == "window":
            best = (
                cand.withColumn(
                    "__rn",
                    F.row_number().over(W.partitionBy("c").orderBy("cost")),
                )
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            m = F.min(F.struct("cost", "a", "b", "oc")).alias("m")
            best = (
                cand.groupBy("c")
                .agg(m)
                .select(
                    "c",
                    F.col("m.cost").alias("cost"),
                    F.col("m.a").alias("a"),
                    F.col("m.b").alias("b"),
                    F.col("m.oc").alias("oc"),
                )
            )
        best = truncate_lineage(best, reliable=True)
        picked = best.select("a", "b", "cost").distinct()
        chosen_all = picked if chosen_all is None else chosen_all.union(picked)
        p0 = best.select(F.col("c"), F.col("oc"))
        mirror = p0.select(F.col("c").alias("mc"), F.col("oc").alias("moc"))
        p = (
            p0.join(mirror, p0["oc"] == mirror["mc"], "left")
            .select(
                "c",
                F.when(
                    (F.col("moc") == F.col("c")) & (F.col("c") < F.col("oc")),
                    F.col("c"),
                )
                .otherwise(F.col("oc"))
                .alias("t"),
            )
        )
        hops_rnd = max(1, hops - rnd)
        for _hop in range(hops_rnd):
            p = truncate_lineage(p, eager=False)
            nxt = p.select(F.col("c").alias("jc"), F.col("t").alias("jt"))
            p = p.join(nxt, p["t"] == nxt["jc"], "left").select(
                "c", F.coalesce("jt", "t").alias("t")
            )
        comp_new = comp.join(p, comp["comp"] == p["c"], "left").select(
            "node", F.coalesce("t", "comp").alias("comp")
        )
        comp_new = truncate_lineage(comp_new, eager=False, reliable=True)
        comp_new.count()
        e2.unpersist()
        comp = comp_new
    assert done or chosen_all is not None
    e.unpersist()
    if chosen_all is None:
        return edges.select("a", "b", "cost").limit(0)
    return truncate_lineage(chosen_all, reliable=True)


def mst_edges(spark):
    from virapipe_spark.queries.relational import _order_pair_counts

    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    und = _order_pair_counts(li).filter(F.col("support") >= 2)
    e = und.select(
        F.col("pa").alias("a"),
        F.col("pb").alias("b"),
        (
            F.expr("1000000 div support") * F.lit(17179869184).cast("long")
            + F.col("pa") * 131072
            + F.col("pb")
        )
        .cast("long")
        .alias("cost"),
    )
    return truncate_lineage(e, reliable=True)


def main():
    spark = session(app_name="ab_boruvka_minstruct")
    e = mst_edges(spark).persist()
    e.count()
    builds = {
        "window": lambda: boruvka(e, "window"),
        "minstruct": lambda: boruvka(e, "minstruct"),
    }
    a = sorted(tuple(r) for r in builds["window"]().collect())
    n = sorted(tuple(r) for r in builds["minstruct"]().collect())
    assert a == n and a, "forests differ!"
    times = {k: [] for k in builds}
    for _ in range(5):
        for k, b in builds.items():
            t0 = time.perf_counter()
            b().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"boruvka {k}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
