"""Interleaved A/B: boruvka_msf's contraction — FIXED worst-case
pointer-doubling hop count (ceil(log2 V) - rnd lazy self-joins, all
materialized in one deep-plan job) vs ADAPTIVE doubling that hops in
small batches and stops when a convergence count shows no pointer
moved.

Profiling (sf0.01, this round): contract+count is 2.5 -> 0.8 s/round
and DOMINATES every round, while the true pointer-tree depth shrinks
to 1-2 hops by round 4 — the fixed bound materializes up to 11 chained
self-joins where 2 suffice. The adaptive form pays one count job per
batch (which is also the materializer, the CC-fuse pattern) and is
EXACT by construction: it stops only when an extra hop changes nothing
(fixpoint = fully resolved), replacing the worst-case-bound argument
with a checked one.

Protocol: same-session interleaved reps on the graph_mst_boruvka
fixture; forest equality asserted first.
"""
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__  # noqa: F401
from pyspark.sql import DataFrame, Window as W, functions as F

from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session
from ab_boruvka_minstruct import mst_edges  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
BATCH = 2


def boruvka(edges: DataFrame, adaptive: bool) -> DataFrame:
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
        best = (
            cand.withColumn(
                "__rn", F.row_number().over(W.partitionBy("c").orderBy("cost"))
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
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

        def hop(frame):
            nxt = frame.select(F.col("c").alias("jc"), F.col("t").alias("jt"))
            return frame.join(nxt, frame["t"] == nxt["jc"], "left").select(
                "c",
                F.coalesce("jt", "t").alias("t"),
                (F.coalesce("jt", "t") != F.col("t")).alias("__moved"),
            ).select("c", "t", "__moved")

        if adaptive:
            # batch lazy hops, then one count that BOTH materializes
            # the batch and tests the fixpoint; hop count is bounded by
            # the same ceil(log2 V) as the fixed form
            done_hops = 0
            while done_hops < hops:
                for _ in range(min(BATCH, hops - done_hops)):
                    p = truncate_lineage(p.select("c", "t"), eager=False)
                    p = hop(p)
                    done_hops += 1
                p = truncate_lineage(p, eager=False)
                if p.filter(F.col("__moved")).count() == 0:
                    break
            p = p.select("c", "t")
        else:
            p = p.select("c", "t")
            for _hop in range(max(1, hops - rnd)):
                p = truncate_lineage(p, eager=False)
                p = hop(p).select("c", "t")
        comp_new = comp.join(p, comp["comp"] == p["c"], "left").select(
            "node", F.coalesce("t", "comp").alias("comp")
        )
        comp_new = truncate_lineage(comp_new, eager=False, reliable=True)
        comp_new.count()
        e2.unpersist()
        comp = comp_new
    e.unpersist()
    if chosen_all is None:
        return edges.select("a", "b", "cost").limit(0)
    return truncate_lineage(chosen_all, reliable=True)


def main():
    spark = session(app_name="ab_boruvka_adaptive")
    e = mst_edges(spark).persist()
    e.count()
    builds = {
        "fixed": lambda: boruvka(e, adaptive=False),
        "adaptive": lambda: boruvka(e, adaptive=True),
    }
    a = sorted(tuple(r) for r in builds["fixed"]().collect())
    n = sorted(tuple(r) for r in builds["adaptive"]().collect())
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
