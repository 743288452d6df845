"""Interleaved A/B: boruvka_msf's per-round termination probe.

A (old): e2.persist() + e2.isEmpty() probe (one job), then an EAGER
reliable checkpoint of `best` (a second job) before its three
consumers.

B (new, r12): no separate probe; `best` takes a LAZY reliable
checkpoint whose count() is the materializing FULL action (the CC
convergence-count fuse) — best is empty exactly when e2 is (every
component with a cross edge picks a minimum), so the count doubles as
the termination test. One job per round instead of two.

Fixture: the graph_mst_boruvka co-purchase graph (support >= 2,
bit-packed unique costs). Equality asserted on the full forest first;
interleaved same-session reps, median decides (SCALE.md noise rules).
"""
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W, functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def boruvka(edges: DataFrame, fused: bool) -> DataFrame:
    """boruvka_msf with the r12 probe fuse switchable (fused=False is
    the pre-change shape: isEmpty probe + eager best checkpoint)."""
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
            e.join(ca, "a")
            .join(cb, "b")
            .filter(F.col("ca") != F.col("cb"))
            .persist()
        )
        if not fused and e2.isEmpty():
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
        if fused:
            best = truncate_lineage(best, eager=False, reliable=True)
            if best.count() == 0:
                e2.unpersist()
                done = True
                break
        else:
            best = truncate_lineage(best, reliable=True)
        picked = best.select("a", "b", "cost").distinct()
        chosen_all = (
            picked if chosen_all is None else chosen_all.union(picked)
        )
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

        def _hop_once(frame):
            nxt = frame.select(F.col("c").alias("jc"), F.col("t").alias("jt"))
            return frame.join(nxt, frame["t"] == nxt["jc"], "left").select(
                "c",
                F.coalesce("jt", "t").alias("t"),
                (F.coalesce("jt", "t") != F.col("t")).alias("__moved"),
            )

        done_hops = 0
        while done_hops < hops:
            for _hop in range(min(2, hops - done_hops)):
                p = truncate_lineage(p.select("c", "t"), eager=False)
                p = _hop_once(p)
                done_hops += 1
            p = truncate_lineage(p, eager=False)
            if p.filter(F.col("__moved")).count() == 0:
                break
        p = p.select("c", "t")
        comp_new = comp.join(p, comp["comp"] == p["c"], "left").select(
            "node", F.coalesce("t", "comp").alias("comp")
        )
        comp_new = truncate_lineage(comp_new, eager=False, reliable=True)
        comp_new.count()
        e2.unpersist()
        comp = comp_new
    assert done or chosen_all is None, "did not converge"
    e.unpersist()
    if chosen_all is None:
        return edges.select("a", "b", "cost").limit(0)
    return truncate_lineage(chosen_all, reliable=True)


def build_edges(spark) -> DataFrame:
    li = catalog.table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    und = _order_pair_counts(li).filter(F.col("support") >= 2)
    return und.select(
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


def main():
    spark = session(app_name="ab_boruvka_probe_fuse")
    e = truncate_lineage(build_edges(spark), reliable=True).persist()
    e.count()
    variants = {
        "old(isEmpty+eager)": lambda: boruvka(e, fused=False),
        "new(count-fuse)": lambda: boruvka(e, fused=True),
    }
    a = sorted(tuple(r) for r in variants["old(isEmpty+eager)"]().collect())
    b = sorted(tuple(r) for r in variants["new(count-fuse)"]().collect())
    assert a == b and a, "forests differ!"
    print(f"forest rows: {len(a)}")
    times = {k: [] for k in variants}
    for _ in range(5):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"boruvka {k}: {xs} -> median {statistics.median(xs):.3f}")


if __name__ == "__main__":
    main()
