"""Interleaved A/B: Borůvka EDGE-LIST CONTRACTION (r13, ported into
graph.boruvka_msf) vs the pre-r13 full-relabel loop (inlined below,
verbatim from the r12 commit).

STATUS (r13): PORTED. The r12 prototype proved the forest
output-identical but its timed-rep loop stalled under ambient load;
this tool now times the COMMITTED implementation against the old
shape, prints per-rep progress (so a stall is attributable to a rep,
not the harness), and finishes with a per-round edge-frame trace from
an instrumented twin of the contraction — the geometric-shrink
evidence VERDICT_r12 asked for.

old (pre-r13): every round re-joins the FULL original edge list
against the full vertex→component table (two V-sized relabel joins +
the comp_new update join + its count).

new (graph.boruvka_msf since r13): the edge list itself contracts each
round — endpoints relabel through the pointer forest, self-edges drop,
multi-edges dedupe to the min-cost representative per component pair.
Later rounds touch a geometrically shrinking frame; the V-sized comp
table is gone.

Equivalence: pair-dedup keeps the min-cost edge per component pair,
which can never remove any component's overall minimum (costs UNIQUE),
so picked sets match round-for-round; asserted row-identical below.
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
from virapipe_spark.scale import reset_size_stats, truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPS = int(os.environ.get("AB_REPS", "5"))


def boruvka_full_relabel(
    edges: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """Verbatim pre-r13 graph.boruvka_msf (r12 final form) — the A/B
    baseline."""
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    e = edges.select("a", "b", "cost").persist()
    comp = nodes.select("node", F.col("node").alias("comp"))
    comp = truncate_lineage(comp, eager=False, reliable=True)
    v0 = comp.count()
    if v0 == 0:
        e.unpersist()
        return e.limit(0)
    hops = max(1, math.ceil(math.log2(max(v0, 2))))
    if max_rounds is None:
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
        cand = e2.select(
            F.col("ca").alias("c"), "cost", "a", "b", F.col("cb").alias("oc")
        ).union(
            e2.select(
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
        if best.count() == 0:
            e2.unpersist()
            done = True
            break
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
    if not done:
        ca = comp.select(F.col("node").alias("a"), F.col("comp").alias("ca"))
        cb = comp.select(F.col("node").alias("b"), F.col("comp").alias("cb"))
        left = (
            e.join(ca, "a").join(cb, "b").filter(F.col("ca") != F.col("cb"))
        )
        if not left.isEmpty():
            raise RuntimeError(
                f"boruvka_full_relabel did not converge after {max_rounds}"
            )
    if chosen_all is not None:
        chosen_all = truncate_lineage(chosen_all, reliable=True)
    e.unpersist()
    if chosen_all is None:
        return edges.select("a", "b", "cost").limit(0)
    return chosen_all


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


def trace_contraction(edges: DataFrame) -> None:
    """Instrumented twin of the committed contraction loop: prints the
    contracted edge-frame size and the picked-component count per round
    (each an EXTRA count the committed loop does not pay) — the
    geometric-shrink receipt VERDICT_r12 asked for."""
    e = edges.select(
        F.col("a").alias("ca"), F.col("b").alias("cb"), "a", "b", "cost"
    ).filter(F.col("ca") != F.col("cb"))
    e = reset_size_stats(truncate_lineage(e, eager=False, reliable=True))
    n_e = e.count()
    hops = max(1, math.ceil(math.log2(max(2 * n_e, 2))))
    print(f"round trace: e0={n_e} edges")
    for rnd in range(hops + 2):
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
        best = reset_size_stats(
            truncate_lineage(best, eager=False, reliable=True)
        )
        n_best = best.count()
        if n_best == 0:
            print(f"  round {rnd}: converged")
            return
        p0 = best.select(F.col("c"), F.col("oc"))
        mirror = p0.select(F.col("c").alias("mc"), F.col("oc").alias("moc"))
        p = p0.join(mirror, p0["oc"] == mirror["mc"], "left").select(
            "c",
            F.when(
                (F.col("moc") == F.col("c")) & (F.col("c") < F.col("oc")),
                F.col("c"),
            )
            .otherwise(F.col("oc"))
            .alias("t"),
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
                p = reset_size_stats(
                    truncate_lineage(p.select("c", "t"), eager=False)
                )
                p = _hop_once(p)
                done_hops += 1
            p = reset_size_stats(truncate_lineage(p, eager=False))
            if p.filter(F.col("__moved")).count() == 0:
                break
        p = p.select("c", "t")
        pa = p.select(F.col("c").alias("ca"), F.col("t").alias("ta"))
        pb = p.select(F.col("c").alias("cb"), F.col("t").alias("tb"))
        nca = F.coalesce("ta", "ca")
        ncb = F.coalesce("tb", "cb")
        e = (
            e.join(pa, "ca", "left")
            .join(pb, "cb", "left")
            .select(
                F.least(nca, ncb).alias("nca"),
                F.greatest(nca, ncb).alias("ncb"),
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
        e = reset_size_stats(truncate_lineage(e, eager=False, reliable=True))
        print(
            f"  round {rnd}: picked-components={n_best} "
            f"contracted-edges={e.count()}",
            flush=True,
        )


def main():
    catalog.load_all()
    spark = session(app_name="ab_boruvka_contract")
    e = truncate_lineage(build_edges(spark), reliable=True).persist()
    print(f"edges: {e.count()} rows at {SF}", flush=True)
    variants = {
        "old(full-relabel)": lambda: boruvka_full_relabel(
            e.select("a", "b", "cost")
        ),
        "new(contracted)": lambda: boruvka_msf(e.select("a", "b", "cost")),
    }
    a = sorted(tuple(r) for r in variants["old(full-relabel)"]().collect())
    b = sorted(tuple(r) for r in variants["new(contracted)"]().collect())
    assert a == b and a, f"forests differ! old={len(a)} new={len(b)}"
    print(f"forest rows: {len(a)} (identical)", flush=True)
    times = {k: [] for k in variants}
    for rep in range(REPS):
        for k, v in variants.items():
            t0 = time.perf_counter()
            v().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[k].append(dt)
            print(f"  rep {rep} {k}: {dt:.3f}s", flush=True)
    for k, xs in times.items():
        xs = sorted(round(t, 3) for t in xs)
        print(f"boruvka {k}: {xs} -> median {statistics.median(xs):.3f}")
    trace_contraction(e.select("a", "b", "cost"))


if __name__ == "__main__":
    main()
