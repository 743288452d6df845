"""Interleaved A/B: Borůvka with EDGE-LIST CONTRACTION.

STATUS (r12 session 4): CORRECTNESS PROVEN, TIMING UNRESOLVED — the
equality assert passed (forests identical, 1,884 rows at sf0.01), but
the timed-rep loop stalled after the equality phase with the driver
JVM spinning ONE core for >1 h (Catalyst-analysis-shaped, not
executor work; box also under intermittent external load that
session). The contraction is NOT ported to graph.boruvka_msf; this
tool is the design record and the starting point for the next
optimization round — resolve the repeated-execution stall (suspects:
accumulated lazy-localCheckpoint block lineage across reps, or an
analysis blowup in the rebuilt-e chain) before re-measuring.

A (old): the committed graph.boruvka_msf — every round re-joins the
FULL original edge list against the full vertex→component table (two
V-sized relabel joins + the comp_new update join + its count).

B (new, prototype): the edge list itself contracts each round —
edges carry their CURRENT component endpoints (ca, cb) beside the
original payload (a, b, cost); after picking, endpoints relabel
through the pointer forest (joins against the PICKED-component-sized
root table, not V-sized comp), self-edges drop, and multi-edges
dedupe to the min-cost representative per component pair. The frame
the next round touches shrinks geometrically — at 100 TB later
rounds touch a vanishing fraction of E instead of all of it, and the
V-sized comp table disappears entirely.

Equivalence argument (checked by the full-forest assert): Borůvka
picks per component the minimum outgoing edge; the pair-dedup keeps
the minimum-cost edge per component pair, which can never remove any
component's overall minimum (costs are UNIQUE, so min-of-pair-mins =
global min per component); the pointer forest and adaptive doubling
are copied verbatim from the committed loop.
"""
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W, functions as F

from virapipe_spark import catalog
from virapipe_spark.graph import boruvka_msf
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def boruvka_contract(edges: DataFrame) -> DataFrame:
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    v0 = nodes.count()
    if v0 == 0:
        return edges.select("a", "b", "cost").limit(0)
    hops = max(1, math.ceil(math.log2(max(v0, 2))))
    max_rounds = hops + 2
    e = edges.select(
        F.col("a").alias("ca"), F.col("b").alias("cb"), "a", "b", "cost"
    )
    e = truncate_lineage(e, eager=False, reliable=True)
    chosen_all = None
    done = False
    for rnd in range(max_rounds):
        if e.count() == 0:
            done = True
            break
        cand = e.select(
            F.col("ca").alias("c"), "cost", "a", "b", F.col("cb").alias("oc")
        ).union(
            e.select(
                F.col("cb").alias("c"), "cost", "a", "b",
                F.col("ca").alias("oc"),
            )
        )
        best = (
            cand.withColumn(
                "__rn", F.row_number().over(W.partitionBy("c").orderBy("cost"))
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        best = truncate_lineage(best, eager=False, reliable=True)
        best.count()
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
        # relabel the CONTRACTED edge list through the root table and
        # dedupe multi-edges to the min-cost representative per pair
        pa = p.select(F.col("c").alias("ca"), F.col("t").alias("ta"))
        pb = p.select(F.col("c").alias("cb"), F.col("t").alias("tb"))
        e = (
            e.join(pa, "ca", "left")
            .join(pb, "cb", "left")
            .select(
                F.coalesce("ta", "ca").alias("nca"),
                F.coalesce("tb", "cb").alias("ncb"),
                "a",
                "b",
                "cost",
            )
            .filter(F.col("nca") != F.col("ncb"))
            .groupBy("nca", "ncb")
            .agg(F.min(F.struct("cost", "a", "b")).alias("m"))
            .select(
                F.col("nca").alias("ca"),
                F.col("ncb").alias("cb"),
                F.col("m.a").alias("a"),
                F.col("m.b").alias("b"),
                F.col("m.cost").alias("cost"),
            )
        )
        e = truncate_lineage(e, eager=False, reliable=True)
    if not done and e.count() != 0:
        raise RuntimeError("boruvka_contract did not converge")
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
    catalog.load_all()
    spark = session(app_name="ab_boruvka_contract")
    e = truncate_lineage(build_edges(spark), reliable=True).persist()
    e.count()
    variants = {
        "old(full-relabel)": lambda: boruvka_msf(e.select("a", "b", "cost")),
        "new(contracted)": lambda: boruvka_contract(e),
    }
    a = sorted(tuple(r) for r in variants["old(full-relabel)"]().collect())
    b = sorted(tuple(r) for r in variants["new(contracted)"]().collect())
    assert a == b and a, f"forests differ! old={len(a)} new={len(b)}"
    print(f"forest rows: {len(a)} (identical)")
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
