"""Interleaved A/B: the CC convergence-count fuse applied to the two
remaining eager-checkpoint + isEmpty iterative loops.

A (old): per round/hop an EAGER reliable checkpoint (one job) plus an
isEmpty() probe (a second job, cheap on cached blocks but still a
scheduling round-trip).

B (new, r12): LAZY checkpoint whose count() is the materializing FULL
action and doubles as the emptiness probe — one job per round.

Covers graph_harmonic_centrality's frontier BFS (16-hop cap) and
graph_mis_luby's active-set shrink (10-round cap), loops copied
verbatim with the flag switchable. Equality asserted on full outputs
first; interleaved same-session reps, median + order statistics decide.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from virapipe_spark import catalog
from virapipe_spark.queries.relational import _order_pair_counts
from virapipe_spark.scale import truncate_lineage
from virapipe_spark.session import session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def build_sym(spark):
    li = catalog.table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    e = (
        _order_pair_counts(li)
        .filter(F.col("support") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    e = truncate_lineage(e, reliable=True)
    return e.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(e.select(F.col("b").alias("src"), F.col("a").alias("dst")))


def harmonic(sym, fused: bool):
    roots = (
        sym.select(F.col("src").alias("s")).distinct().orderBy("s").limit(4)
    )
    dist = truncate_lineage(
        roots.select(
            "s", F.col("s").alias("node"), F.lit(0).cast("long").alias("d")
        ),
        reliable=True,
    )
    frontier = dist
    for h in range(1, 17):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select(
                "s",
                F.col("dst").alias("node"),
                F.lit(h).cast("long").alias("d"),
            )
            .distinct()
        )
        stepped = nxt.join(dist, ["s", "node"], "left_anti")
        if fused:
            frontier = truncate_lineage(stepped, eager=False, reliable=True)
            if frontier.count() == 0:
                break
        else:
            frontier = truncate_lineage(stepped, reliable=True)
            if frontier.isEmpty():
                break
        dist = dist.unionAll(frontier)
    return dist.groupBy(F.col("s").alias("source")).agg(
        (F.count("*") - 1).cast("long").alias("n_reached"),
        F.max("d").cast("long").alias("max_dist"),
    )


def mis(sym, fused: bool, rounds: int = 10):
    nodes = sym.select(F.col("src").alias("node")).distinct().select(
        "node",
        (
            F.conv(
                F.substring(F.md5(F.col("node").cast("string")), 1, 10),
                16,
                10,
            ).cast("long")
            * 1048576
            + F.col("node")
        ).alias("pri"),
    )
    active = truncate_lineage(nodes, reliable=True)
    out = None
    for r in range(1, rounds + 1):
        nb = (
            active.join(sym, active["node"] == sym["src"])
            .select(F.col("dst").alias("node2"), "node")
            .join(
                active.select(
                    F.col("node").alias("node2"), F.col("pri").alias("p2")
                ),
                "node2",
            )
            .groupBy("node")
            .agg(F.min("p2").alias("mn"))
        )
        cand = truncate_lineage(
            active.join(nb, "node", "left")
            .filter(F.col("mn").isNull() | (F.col("pri") < F.col("mn")))
            .select("node"),
            reliable=True,
        )
        misr = cand.select("node", F.lit(r).cast("long").alias("rnd"))
        out = misr if out is None else out.unionAll(misr)
        removed = cand.unionAll(
            cand.join(sym, cand["node"] == sym["src"]).select(
                F.col("dst").alias("node")
            )
        ).distinct()
        stepped = active.join(removed, "node", "left_anti")
        if fused:
            active = truncate_lineage(stepped, eager=False, reliable=True)
            if active.count() == 0:
                break
        else:
            active = truncate_lineage(stepped, reliable=True)
            if active.isEmpty():
                break
    return out


def main():
    catalog.load_all()
    spark = session(app_name="ab_frontier_fuse")
    sym = build_sym(spark).persist()
    sym.count()
    for label, fn in (("harmonic", harmonic), ("mis", mis)):
        a = sorted(tuple(r) for r in fn(sym, fused=False).collect())
        b = sorted(tuple(r) for r in fn(sym, fused=True).collect())
        assert a == b and a, f"{label} outputs differ!"
        print(f"{label}: {len(a)} rows (identical)")
        times = {"old(eager+isEmpty)": False, "new(count-fuse)": True}
        res = {k: [] for k in times}
        for _ in range(5):
            for k, fused in times.items():
                t0 = time.perf_counter()
                fn(sym, fused=fused).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[k].append(time.perf_counter() - t0)
        for k, xs in res.items():
            xs = sorted(round(t, 3) for t in xs)
            print(f"{label} {k}: {xs} -> median {statistics.median(xs):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
